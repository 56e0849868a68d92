package graft

import org.apache.spark.sql.functions._

import graft.functions.HeavyHitters.misraGries
import graft.ops.TextOps

/** Contract for the Misra–Gries heavy-hitters aggregate
  * ([[graft.functions.MisraGriesAgg]]) and the q83 sketched exact top-k
  * built on it: exact counts when the vocabulary fits the capacity, the
  * mergeable-summaries error bound when it doesn't, survival of every
  * above-threshold term under any partitioning, and end-to-end equality
  * with the direct full-vocabulary top-k (q21).
  */
class TopKSketchSpec extends SparkSpec {

  private lazy val implicits = spark.implicits
  import implicits._

  private def sketchMap(df: org.apache.spark.sql.DataFrame,
      capacity: Int): Map[String, Long] =
    df.agg(misraGries(col("w"), capacity).as("s"))
      .select(explode(col("s")).as("e"))
      .select(col("e.term"), col("e.est"))
      .collect()
      .map(r => r.getString(0) -> r.getLong(1))
      .toMap

  test("capacity >= distinct terms: sketch is the exact count map") {
    val words = Seq.fill(7)("a") ++ Seq.fill(4)("b") ++ Seq.fill(2)("c") ++ Seq("d")
    val df = words.toDF("w").repartition(5)
    val m = sketchMap(df, capacity = 16)
    assert(m === Map("a" -> 7L, "b" -> 4L, "c" -> 2L, "d" -> 1L))
  }

  test("over-capacity skewed stream: bound holds and heavy terms survive, any partitioning") {
    // 4 heavy terms + a 200-term tail, N = 4*500 + 200*3 = 2600
    val heavy = (0 until 4).flatMap(i => Seq.fill(500)(s"heavy_$i"))
    val tail = (0 until 200).flatMap(i => Seq.fill(3)(s"tail_$i"))
    val rnd = new scala.util.Random(7)
    val words = rnd.shuffle(heavy ++ tail)
    val n = words.size.toLong
    for (parts <- Seq(1, 3, 17)) {
      val df = words.toDF("w").repartition(parts)
      val cap = 16
      val m = sketchMap(df, cap)
      val bound = n / (cap + 1) // 152
      // every term with true count > N/(cap+1) is present
      (0 until 4).foreach { i =>
        assert(m.contains(s"heavy_$i"), s"heavy_$i missing at parts=$parts")
      }
      // undercount bound: true - est <= N/(cap+1)
      m.foreach { case (t, est) =>
        val truth = if (t.startsWith("heavy_")) 500L else 3L
        assert(est <= truth, s"$t overcounted: $est > $truth")
        assert(truth - est <= bound, s"$t bound broken: $truth - $est > $bound")
      }
      assert(m.size <= cap)
    }
  }

  test("q83 equals the direct exact top-k even with a tight capacity") {
    val docs = Queries.t(spark, "/root/testdata/sf0.001", "documents")
    val exact = SparkEntry.queries("q21_word_topk")(spark, "/root/testdata/sf0.001")
      .collect().toSeq
    val sketched = TextOps.topKWordsSketched(docs, k = 20, capacity = 64)
      .collect().toSeq
    assert(sketched === exact)
    val repart = TextOps.topKWordsSketched(docs.repartition(13), k = 20, capacity = 64)
      .collect().toSeq
    assert(repart === exact)
  }

  test("q83 falls back to the direct aggregate when the corpus is too flat for the capacity") {
    // 300 words, each exactly 4 times: N=1200, capacity 16 ->
    // threshold 70 > every count, so the sketch guarantee CANNOT hold
    // and the operator must take the exact fallback path
    val flat = (0 until 300).map(i => (i.toLong, Seq.fill(4)(f"w$i%03d").mkString(" ")))
      .toDF("doc_id", "text")
    val got = TextOps.topKWordsSketched(flat, k = 20, capacity = 16).collect().toSeq
    val exact = flat.select(explode(split(col("text"), " ")).as("word"))
      .groupBy("word").agg(count(lit(1)).as("cnt"))
      .orderBy(desc("cnt"), asc("word")).limit(20).collect().toSeq
    assert(got === exact)
    assert(got.map(_.getString(0)) === (0 until 20).map(i => f"w$i%03d"))
  }

  test("q83 is total on empty and null-text input") {
    val empty = Seq.empty[(Long, String)].toDF("doc_id", "text")
    assert(TextOps.topKWordsSketched(empty).collect().isEmpty)
    val nulls = Seq((1L, null.asInstanceOf[String]), (2L, "x y x")).toDF("doc_id", "text")
    val out = TextOps.topKWordsSketched(nulls).collect()
    assert(out.map(r => r.getString(0) -> r.getLong(1)).toMap === Map("x" -> 2L, "y" -> 1L))
  }

  test("sketch aggregate distributes as partial+merge (no single-point update)") {
    val docs = Queries.t(spark, "/root/testdata/sf0.001", "documents")
    val words = docs.select(explode(split(col("text"), " ")).as("w")).repartition(8)
    val agg = words.agg(misraGries(col("w"), 128).as("s"))
    agg.collect()
    val plan = agg.queryExecution.executedPlan.toString
    // ObjectHashAggregate with a partial stage: the sketch rides Spark's
    // two-phase aggregation, state bounded per partition
    assert(plan.contains("ObjectHashAggregate"), plan)
    assert(plan.contains("partial_misra_gries") || plan.contains("partial"), plan)
  }

  test("q112 per-group: equals the exact per-lang top-k on the real corpus") {
    val docs = Queries.t(spark, "/root/testdata/sf0.001", "documents")
    val got = TextOps.topKWordsPerGroup(docs, k = 10, capacity = 512)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3))).toSeq
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("lang")).orderBy(desc("cnt"), asc("word"))
    val exact = docs.filter(col("lang").isNotNull && col("text").isNotNull)
      .select(col("lang"), explode(split(col("text"), " ")).as("word"))
      .groupBy("lang", "word").agg(count(lit(1)).as("cnt"))
      .withColumn("rnk", row_number().over(w).cast("long"))
      .filter(col("rnk") <= 10).orderBy("lang", "rnk")
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3))).toSeq
    assert(got === exact)
    assert(got.nonEmpty)
  }

  test("q112 per-group: tiny capacity still exact via the per-lang fallback") {
    // capacity 4 on a skewed vocab: the guard must fail and the exact
    // fallback must carry the answer for every lang
    val docs = Queries.t(spark, "/root/testdata/sf0.001", "documents")
    val a = TextOps.topKWordsPerGroup(docs, k = 10, capacity = 4).collect().toSeq
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3)))
    val b = TextOps.topKWordsPerGroup(docs, k = 10, capacity = 512).collect().toSeq
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3)))
    assert(a === b)
  }

  test("q112 is total on empty input") {
    val empty = Seq.empty[(Long, String, String)].toDF("doc_id", "text", "lang")
    assert(TextOps.topKWordsPerGroup(empty).collect().isEmpty)
  }
}
