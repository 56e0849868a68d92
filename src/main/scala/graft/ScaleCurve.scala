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

  /** N× embeddings: component-rotated replicas, ids offset per replica. */
  def scaleEmbeddings(emb: DataFrame, factor: Int): DataFrame = {
    val stride = emb.agg(max("vec_id")).head().getLong(0) + 1
    val dim = size(col("embedding"))
    (0 until factor).map { r =>
      val shifted =
        if (r == 0) col("embedding")
        else concat(
          slice(col("embedding"), lit(r % 64 + 1), dim - lit(r % 64)),
          slice(col("embedding"), lit(1), lit(r % 64)))
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

    // one synthesized corpus per factor, reused across runs
    factors.foreach { f =>
      val dir = s"$work/x$f"
      if (!new java.io.File(s"$dir/documents.parquet").exists()) {
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
    // untimed warmup at the smallest factor: absorbs codegen/JIT
    locally {
      val d = Queries.t(spark, s"$work/x${factors.min}", "documents")
      graft.ops.NearDup.lshDedupClusters(d).write.format("noop").mode("overwrite").save()
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

    println("| factor | operator | seconds | output rows |")
    println("|---|---|---|---|")
    results.foreach { m =>
      println(f"| ${m.factor}x | ${m.op} | ${m.sec}%.2f | ${m.rows} |")
    }
    val json = results.map { m =>
      f"""{"factor":${m.factor},"op":"${m.op}","sec":${m.sec}%.3f,"rows":${m.rows}}"""
    }.mkString("[", ",", "]")
    val line =
      s"""{"scale_curve":$json,"load_before":"$loadBefore","load_after":"$loadAfter","base":"$base"}"""
    java.nio.file.Files.writeString(java.nio.file.Paths.get("SCALE_CURVE.json"), line + "\n")
    println(line)
    spark.stop()
  }
}
