package graft

/** Every query must be total on empty input: a 100 TB job routinely sees
  * empty partitions, empty date slices, or a table with no admitted files
  * (the reference's own empty-input probe, loan_spark_etl.py:157-160).
  * Every catalog query (SparkEntry.queries) runs against schema-identical EMPTY copies of
  * the testdata tables and must return cleanly (0+ rows, no throw).
  */
class EmptyInputSpec extends SparkSpec {

  private lazy val emptyDir: String = {
    val dir = tmpDir("empty-tables")
    val tables = Seq("region", "nation", "customer", "supplier", "part",
      "orders", "lineitem", "events", "documents", "embeddings")
    tables.foreach { name =>
      val src = spark.read.parquet(s"/root/testdata/sf0.001/$name.parquet")
      src.limit(0).write.mode("overwrite").parquet(s"$dir/$name.parquet")
    }
    dir.toString
  }

  test("all queries are total on empty tables") {
    val failures = Queries.all.flatMap { q =>
      try {
        q.run(spark, emptyDir).collect() // force full execution
        None
      } catch {
        case scala.util.control.NonFatal(e) =>
          Some(q.name -> s"${e.getClass.getSimpleName}: ${e.getMessage.take(120)}")
      }
    }
    assert(failures.isEmpty, failures.mkString("\n"))
  }
}
