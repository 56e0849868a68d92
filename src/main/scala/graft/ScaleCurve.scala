package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scale-curve harness for the dedup family: synthesizes deterministic
  * N× replicas of the sf0.1 documents/embeddings corpus and times the
  * three at-scale dedup shapes on each, so the "linear in theory" claims
  * (q68 bucket-min clusters, guarded full-corpus pairs, CC over pair
  * graphs) become a measured growth curve instead of one scale point.
  *
  * Replication is structure-preserving and cross-replica independent:
  *
  *   - documents: replica r rotates the lowercase alphabet by r
  *     (`translate`), so every token changes but token EQUALITY within a
  *     replica is preserved — each replica has exactly the original
  *     corpus's shingle-similarity structure, while shingle sets across
  *     replicas are disjoint (no cross-replica near-dups). Near-dup pair
  *     and cluster counts therefore scale exactly linearly by
  *     construction, and measured runtime growth is attributable to the
  *     engine, not to changing similarity density.
  *   - embeddings: replica r circularly shifts vector components by r.
  *     Dot products and norms are permutation-invariant, so intra-replica
  *     cosine structure is EXACT; cross-replica cosines are the cosine of
  *     a vector with a rotated unrelated vector — noise far below the
  *     near-dup threshold.
  *
  * Ids offset by `r × (max_id + 1)`. Everything is a deterministic
  * function of (base row, replica index): re-runs produce byte-identical
  * corpora, no wall-clock or RNG at synthesis time.
  *
  * Usage: `runMain graft.ScaleCurve [baseSfDir workDir f1 f2 ...]`
  * (defaults: /root/testdata/sf0.1 /tmp/graft-scale 1 2 5 10). Emits one
  * markdown table row per (factor, operator) plus a JSON line.
  */
object ScaleCurve {

  private val Lower = "abcdefghijklmnopqrstuvwxyz"
  private val Upper = Lower.toUpperCase
  private val Digit = "0123456789"

  /** N× documents: alphabet-rotated replicas, ids offset per replica.
    * Lower/upper/digit classes each rotate (the tokenizer lowercases, and
    * pure-digit tokens would otherwise survive across replicas and leak
    * cross-replica similarity).
    */
  def scaleDocuments(docs: DataFrame, factor: Int): DataFrame = {
    // the letter rotation has period 26: replica 26 would reuse rotation
    // 0 and leak cross-replica near-dups (observed: a 30x run merged 4
    // replica pairs into shared clusters). Hard-stop inside the period.
    require(factor <= 26, s"scaleDocuments supports factors up to 26, got $factor")
    // the DIGIT rotation's period is only 10: replicas r and r+10 map
    // digits identically, so a token containing ONLY digits would leak
    // across those replica pairs (any letter in the token separates it,
    // since letter rotations are distinct for all r < 26). Cheap to rule
    // out outright rather than reason about: require the corpus has no
    // pure-digit tokens when the factor exceeds the digit period.
    if (factor > 10) {
      val leaky = docs
        .select(explode(split(col("text"), " ")).as("t"))
        .filter(col("t").rlike("^[0-9]+$"))
        .limit(1).count()
      require(leaky == 0,
        s"factor $factor > 10 needs a corpus with no pure-digit tokens " +
          "(digit rotation period is 10) — found at least one")
    }
    val stride = docs.agg(max("doc_id")).head().getLong(0) + 1
    def rot(s: String, r: Int): String = s.drop(r % s.length) + s.take(r % s.length)
    (0 until factor).map { r =>
      val from = Lower + Upper + Digit
      val to = rot(Lower, r) + rot(Upper, r) + rot(Digit, r)
      docs.select(
        (col("doc_id") + lit(r * stride)).as("doc_id"),
        (if (r == 0) col("text") else translate(col("text"), from, to)).as("text"),
        col("lang"), col("source"), col("n_chars"))
    }.reduce(_.union(_))
  }

  /** N× embeddings: component-rotated replicas, ids offset per replica.
    * The rotation's period is the vector dimensionality — replica `dim`
    * would reuse shift 0 and be an EXACT duplicate of replica 0 — so the
    * factor is bounded by the measured dim of the corpus.
    */
  def scaleEmbeddings(emb: DataFrame, factor: Int): DataFrame = {
    val dim = emb.select(size(col("embedding")).as("d")).agg(min("d")).head().getInt(0)
    require(factor <= dim,
      s"scaleEmbeddings supports factors up to the vector dim ($dim), got $factor")
    val stride = emb.agg(max("vec_id")).head().getLong(0) + 1
    val dimCol = size(col("embedding"))
    (0 until factor).map { r =>
      val shifted =
        if (r == 0) col("embedding")
        else concat(
          slice(col("embedding"), lit(r + 1), dimCol - lit(r)),
          slice(col("embedding"), lit(1), lit(r)))
      emb.select(
        (col("vec_id") + lit(r * stride)).as("vec_id"),
        shifted.as("embedding"),
        col("label"))
    }.reduce(_.union(_))
  }

  def main(args: Array[String]): Unit = {
    val base = args.lift(0).getOrElse("/root/testdata/sf0.1")
    val work = args.lift(1).getOrElse("/tmp/graft-scale")
    val factors =
      if (args.length > 2) args.drop(2).map(_.toInt).toSeq else Seq(1, 2, 5, 10)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    sys.env.get("SPARK_GRAFT_CHECKPOINT_DIR")
      .foreach(spark.sparkContext.setCheckpointDir)
    spark.sparkContext.setLogLevel("WARN")

    def loadavg(): String =
      try scala.io.Source.fromFile("/proc/loadavg").mkString.trim.split(" ").take(3).mkString(" ")
      catch { case scala.util.control.NonFatal(_) => "" }

    // one synthesized corpus per factor, reused across runs; BOTH tables
    // must exist to skip (a run killed between the two writes would
    // otherwise leave the factor dir half-synthesized forever)
    factors.foreach { f =>
      val dir = s"$work/x$f"
      val complete = Seq("documents", "embeddings")
        .forall(t => new java.io.File(s"$dir/$t.parquet/_SUCCESS").exists())
      if (!complete) {
        scaleDocuments(Queries.t(spark, base, "documents"), f)
          .repartition(math.max(4, f * 4))
          .write.mode("overwrite").parquet(s"$dir/documents.parquet")
        scaleEmbeddings(Queries.t(spark, base, "embeddings"), f)
          .repartition(math.max(4, f * 4))
          .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
      }
    }

    final case class Measure(factor: Int, op: String, sec: Double, rows: Long)
    def time(op: String, f: Int)(mk: => DataFrame)(
        rowsOf: DataFrame => Long): Measure = {
      spark.catalog.clearCache()
      val t0 = System.nanoTime()
      mk.write.format("noop").mode("overwrite").save()
      val sec = (System.nanoTime() - t0) / 1e9
      // the size column re-runs the pipeline untimed (noop caches nothing);
      // it documents that OUTPUT grows linearly, not just runtime
      val rows = rowsOf(mk)
      Measure(f, op, sec, rows)
    }

    val loadBefore = loadavg()
    // untimed warmup of ALL THREE measured operators at the smallest
    // factor: absorbs codegen/JIT for each, so the smallest timed point
    // doesn't carry one-time compilation the larger points skip (which
    // would fake sub-linearity)
    locally {
      val d = Queries.t(spark, s"$work/x${factors.min}", "documents")
      val e = Queries.t(spark, s"$work/x${factors.min}", "embeddings")
      graft.ops.NearDup.lshDedupClusters(d).write.format("noop").mode("overwrite").save()
      graft.ops.NearDup.lshNearDupPairs(d, sliceMax = None, hotBandMax = Some(64L))
        .write.format("noop").mode("overwrite").save()
      graft.ops.Clusters.embedDupClusters(e).write.format("noop").mode("overwrite").save()
    }
    val results = factors.flatMap { f =>
      val dir = s"$work/x$f"
      def docs = Queries.t(spark, dir, "documents")
      def emb = Queries.t(spark, dir, "embeddings")
      Seq(
        // rows = keepers = number of clusters (total output is trivially n)
        time("q68_clusters_linear", f)(graft.ops.NearDup.lshDedupClusters(docs))(
          _.filter(col("keep")).count()),
        time("pairs_full_guarded", f)(
          graft.ops.NearDup.lshNearDupPairs(docs, sliceMax = None, hotBandMax = Some(64L)))(
          _.count()),
        time("q64_embed_cc", f)(graft.ops.Clusters.embedDupClusters(emb))(_.count()))
    }
    val loadAfter = loadavg()

    // Locale.ROOT: f-interpolators use the default locale, which can
    // emit comma decimals and corrupt the JSON artifact
    def fmt(v: Double, d: Int): String =
      String.format(java.util.Locale.ROOT, s"%.${d}f", v)
    println("| factor | operator | seconds | output rows |")
    println("|---|---|---|---|")
    results.foreach { m =>
      println(s"| ${m.factor}x | ${m.op} | ${fmt(m.sec, 2)} | ${m.rows} |")
    }
    val json = results.map { m =>
      s"""{"factor":${m.factor},"op":"${m.op}","sec":${fmt(m.sec, 3)},"rows":${m.rows}}"""
    }.mkString("[", ",", "]")
    val line =
      s"""{"scale_curve":$json,"load_before":"$loadBefore","load_after":"$loadAfter","base":"$base"}"""
    java.nio.file.Files.writeString(java.nio.file.Paths.get("SCALE_CURVE.json"), line + "\n")
    println(line)
    spark.stop()
  }
}
