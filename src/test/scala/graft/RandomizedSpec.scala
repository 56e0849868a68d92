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

  test("Misra-Gries bound holds on random skewed streams (8 seeds x random capacity/partitioning)") {
    for (seed <- 1 to 8) {
      val rnd = new scala.util.Random(seed)
      val vocab = 10 + rnd.nextInt(300)
      // zipf-ish: term i appears ~ vocab/(i+1) times
      val words = (0 until vocab).flatMap(i =>
        Seq.fill(1 + vocab / (i + 1))(s"t$i"))
      val shuffled = rnd.shuffle(words)
      val truth = shuffled.groupBy(identity).view.mapValues(_.size.toLong).toMap
      val n = shuffled.size.toLong
      val cap = 4 + rnd.nextInt(60)
      val parts = 1 + rnd.nextInt(16)
      val got = shuffled.toDF("w").repartition(parts)
        .agg(graft.functions.HeavyHitters.misraGries(col("w"), cap).as("s"))
        .select(explode(col("s")).as("e")).select(col("e.term"), col("e.est"))
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      val bound = n / (cap + 1)
      assert(got.size <= cap, s"seed=$seed size ${got.size} > cap $cap")
      got.foreach { case (t, est) =>
        assert(est <= truth(t), s"seed=$seed $t overcounted")
        assert(truth(t) - est <= bound, s"seed=$seed $t bound broken")
      }
      truth.foreach { case (t, c) =>
        if (c > bound) assert(got.contains(t), s"seed=$seed heavy $t evicted (c=$c > $bound)")
      }
    }
  }

  test("sketched top-k equals driver-side exact top-k on random streams (6 seeds)") {
    for (seed <- 10 to 15) {
      val rnd = new scala.util.Random(seed)
      val vocab = 5 + rnd.nextInt(150)
      val words = (0 until vocab).flatMap(i =>
        Seq.fill(1 + rnd.nextInt(1 + vocab / (i + 1)))(s"t$i"))
      val docs = rnd.shuffle(words).grouped(7).zipWithIndex
        .map { case (g, i) => (i.toLong, g.mkString(" ")) }.toSeq
        .toDF("doc_id", "text")
      val k = 1 + rnd.nextInt(10)
      val cap = 4 + rnd.nextInt(40) // often too small — fallback must fire
      val got = graft.ops.TextOps.topKWordsSketched(docs, k, cap)
        .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
      val exact = docs.select(explode(split(col("text"), " ")).as("word"))
        .groupBy("word").agg(count(lit(1)).as("cnt"))
        .orderBy(desc("cnt"), asc("word")).limit(k)
        .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
      assert(got == exact, s"seed=$seed k=$k cap=$cap")
    }
  }

  /** Driver-side greedy merge fold — the published BPE apply, one merge
    * at a time over the whole symbol list (the oracle for
    * [[TextOps.bpeEncodeWords]]' literal-replace representation).
    */
  private def refEncode(word: String, merges: Seq[(String, String)]): Seq[String] =
    merges.foldLeft(word.map(_.toString): Seq[String]) { case (syms, (a, b)) =>
      syms.foldLeft(Vector.empty[String]) { (acc, x) =>
        if (acc.nonEmpty && acc.last == a && x == b)
          acc.dropRight(1) :+ (a + b)
        else acc :+ x
      }
    }

  test("bpeEncodeWords matches the driver-side greedy fold on random words and merge chains (6 seeds)") {
    for (seed <- 20 to 25) {
      val rnd = new scala.util.Random(seed)
      val alphabet = "ab" + (if (rnd.nextBoolean()) "c" else "")
      def word() = (0 until 1 + rnd.nextInt(12))
        .map(_ => alphabet(rnd.nextInt(alphabet.length))).mkString
      val words = Seq.fill(12)(word()).distinct
      // adversarial merge chains over a tiny alphabet: self-merges
      // (a,a), chains onto merged symbols (aa,b), repeats — drawn from
      // symbols reachable at each step so later merges can actually fire
      var reachable = alphabet.map(_.toString).toVector
      val merges = (0 until 1 + rnd.nextInt(6)).map { _ =>
        val a = reachable(rnd.nextInt(reachable.size))
        val b = reachable(rnd.nextInt(reachable.size))
        reachable :+= (a + b)
        (a, b)
      }
      val docs = words.zipWithIndex.map { case (w, i) => (i.toLong, w) }
        .toDF("doc_id", "text")
      val got = TextOps.bpeEncodeWords(docs, merges)
        .collect().map(r => r.getString(0) -> r.getSeq[String](2).toList).toMap
      words.foreach { w =>
        val want = refEncode(w, merges).toList
        assert(got(w) == want,
          s"seed=$seed word=$w merges=$merges: ${got(w)} vs $want")
      }
    }
  }
}
