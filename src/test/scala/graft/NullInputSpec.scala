package graft

import org.apache.spark.sql.functions._

/** Dirty-data totality: nullify ~10% of every column in every table
  * (deterministic per-row hash, not rand(), so failures reproduce) and
  * run every catalog query. Results may legitimately contain nulls/fewer
  * rows; what they must not do is throw — null text, null timestamps,
  * null embeddings, and null keys all occur in real corpora.
  */
class NullInputSpec extends SparkSpec {

  private lazy val dirtyDir: String = {
    val dir = tmpDir("dirty-tables")
    val tables = Seq("region", "nation", "customer", "supplier", "part",
      "orders", "lineitem", "events", "documents", "embeddings")
    tables.foreach { name =>
      val src = spark.read.parquet(s"/root/testdata/sf0.001/$name.parquet")
      val dirtied = src.select(src.columns.zipWithIndex.map { case (c, i) =>
        // ~10% nulls, deterministic in (column index, row content)
        when(pmod(hash(col(c), lit(i)), lit(10)) === 0, lit(null))
          .otherwise(col(c)).as(c)
      }.toIndexedSeq: _*)
      dirtied.write.mode("overwrite").parquet(s"$dir/$name.parquet")
    }
    dir.toString
  }

  test("all queries are total on 10%-null tables") {
    val failures = Queries.all.flatMap { q =>
      try {
        q.run(spark, dirtyDir).collect()
        None
      } catch {
        case scala.util.control.NonFatal(e) =>
          Some(q.name -> s"${e.getClass.getSimpleName}: ${String.valueOf(e.getMessage).take(160)}")
      }
    }
    assert(failures.isEmpty, failures.mkString("\n"))
  }
}
