package graft

import org.apache.spark.sql.functions._

import graft.ops.{Clusters, ScaleJoins, TextOps}

/** Randomized property checks (fixed seeds — deterministic runs) pitting
  * the distributed implementations against simple driver-side oracles on
  * adversarial inputs the curated corpora don't produce: dense multi-
  * component graphs, self-loops, repeated/empty tokens, null-heavy skewed
  * aggregation inputs.
  */
class RandomizedSpec extends SparkSpec {

  import spark.implicits._

  /** Driver-side union-find with min-label semantics (the oracle for
    * [[Clusters.connectedComponents]]).
    */
  private def unionFind(edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      val p = parent.getOrElse(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    edges.foreach { case (a, b) =>
      parent.getOrElseUpdate(a, a); parent.getOrElseUpdate(b, b)
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    parent.keys.map(k => k -> find(k)).toMap
  }

  test("connectedComponents matches union-find on random graphs (6 seeds)") {
    for (seed <- 1 to 6) {
      val rnd = new scala.util.Random(seed)
      val n = 1 + rnd.nextInt(40)
      val m = rnd.nextInt(60)
      // self-loops and duplicate edges allowed — CC must tolerate both
      val edges = Seq.fill(m)((rnd.nextInt(n).toLong, rnd.nextInt(n).toLong))
      if (edges.nonEmpty) {
        val got = Clusters.connectedComponents(
          edges.toDF("a", "b"), maxIter = 50, reliable = Some(false))
          .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
        val want = unionFind(edges)
        assert(got == want, s"seed=$seed n=$n m=$m: $got vs $want")
      }
    }
  }

  test("simhashColumn == batch simhash on adversarial random texts") {
    val rnd = new scala.util.Random(7)
    val vocab = Vector("a", "bb", "ccc", "tok", "x1", "µ", "", "longtokenlongtoken")
    val docs = (0 until 60).map { i =>
      val t = Seq.fill(1 + rnd.nextInt(12))(vocab(rnd.nextInt(vocab.size))).mkString(" ")
      (i.toLong, t)
    }.toDF("doc_id", "text")
    val batch = TextOps.simhash(docs).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val perRow = docs.select(col("doc_id"), TextOps.simhashColumn(col("text")).as("fp"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(perRow == batch)
  }

  test("salted aggregates match plain aggregates on skewed null-heavy data (3 seeds)") {
    for (seed <- 1 to 3) {
      val rnd = new scala.util.Random(seed)
      val rows = (0 until 500).map { _ =>
        // 80% of rows pile onto one hot key with a low-cardinality value —
        // the exact shape the row-based salt must spread
        val k = if (rnd.nextInt(5) > 0) "hot" else s"k${rnd.nextInt(5)}"
        val v: Option[Double] =
          if (rnd.nextInt(10) == 0) None else Some(rnd.nextInt(3).toDouble)
        (k, v)
      }
      val df = rows.toDF("k", "v")
      def sumOpt(r: org.apache.spark.sql.Row): Option[Double] =
        if (r.isNullAt(1)) None else Some(r.getDouble(1)) // all-null key sums to null
      val plainSC = df.groupBy("k").agg(sum("v"), count("v")).collect()
        .map(r => (r.getString(0), sumOpt(r), r.getLong(2))).toSet
      val saltSC = ScaleJoins.saltedSumCount(df, "k", "v", 7).collect()
        .map(r => (r.getString(0), sumOpt(r), r.getLong(2))).toSet
      assert(saltSC == plainSC, s"seed=$seed sum/count")
      val plainD = df.groupBy("k").agg(count_distinct(col("v"))).collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
      val saltD = ScaleJoins.saltedDistinctCount(df, "k", "v", 7).collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(saltD == plainD, s"seed=$seed distinct")
    }
  }
}
