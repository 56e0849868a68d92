package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Near-duplicate detection operators for document corpora, designed for the
  * 100 TB path: MinHash signatures + LSH banding turn the quadratic
  * all-pairs similarity join into (a) one narrow map-side signature pass,
  * (b) an equi-join on small band keys, (c) exact verification on candidate
  * pairs only.
  *
  * Every step is deterministic and uses only arithmetic/functions available
  * identically in DuckDB, so the driver's oracle can replicate the SAME
  * algorithm and hash-compare the output ([[oracleSql]]).
  *
  * Hash design (public-knowledge, standard MinHash construction —
  * Broder '97 resemblance sketches):
  *   - token → 28-bit integer x: first 7 hex digits of md5(token).
  *     md5 is bit-identical across engines; 28 bits keeps every product
  *     a_i*x below 2^56 (no 64-bit overflow in either engine).
  *   - hash family: h_i(x) = (a_i * x + b_i) mod p, p = 2^31-1 (Mersenne
  *     prime), a_i ∈ [1, 2^28], b_i ∈ [0, 2^28) derived from md5("a:i") /
  *     md5("b:i") at build time and inlined as literals on BOTH engines.
  *   - signature: K per-doc min(h_i) aggregates — a codegen'd hash
  *     aggregate with map-side partials, not an interpreted lambda.
  *   - banding: bands of r=2 rows; candidates share (band, m_{2b}, m_{2b+1}).
  */
object NearDup {

  /** 2^31-1 — modulus of the universal hash family. */
  val P = 2147483647L

  /** Number of min-hashes (K) and bands; r = K / Bands = 2 rows per band.
    * P(candidate | jaccard = s) = 1 - (1 - s^2)^32: ≈1e-4 miss at s=0.5,
    * ≈0.99998 hit at s=0.6.
    */
  val K = 64
  val Bands = 32

  /** (a_i, b_i) of the hash family, reproducibly derived from md5 so the
    * same literals can be embedded in the DuckDB oracle text.
    */
  val seeds: IndexedSeq[(Long, Long)] = {
    def h7(s: String): Long = {
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8"))
      java.lang.Long.parseLong(d.map("%02x".format(_)).mkString.substring(0, 7), 16)
    }
    (0 until K).map(i => (h7(s"a:$i") + 1L, h7(s"b:$i")))
  }

  /** Distinct whitespace tokens per document: (doc_id, toks array). */
  def tokens(docs: DataFrame, idCol: String = "doc_id", textCol: String = "text"): DataFrame =
    docs.select(col(idCol), array_distinct(split(col(textCol), " ")).as("toks"))

  /** 28-bit token hash — codegen'd builtins only (md5 → conv → cast). */
  private def tokenHash(tok: Column): Column =
    conv(substring(md5(tok.cast("binary")), 1, 7), 16, 10).cast("long")

  /** Per-doc MinHash signature: (doc_id, m0 .. m{K-1}).
    * One explode + one hash aggregate: at scale this is a map-side partial
    * min per (doc, i) followed by a final min — no interpreted lambdas.
    */
  def signatures(tok: DataFrame): DataFrame = {
    val hashed = tok
      .select(col("doc_id"), explode(col("toks")).as("tok"))
      .select(col("doc_id"), tokenHash(col("tok")).as("x"))
    val aggs = seeds.zipWithIndex.map { case ((a, b), i) =>
      min((col("x") * a + b) % P).as(s"m$i")
    }
    hashed.groupBy("doc_id").agg(aggs.head, aggs.tail: _*)
  }

  /** Explode a signature frame into (doc_id, band, k1, k2) band keys. */
  def bands(sig: DataFrame): DataFrame = {
    val bandStructs = (0 until Bands).map { b =>
      struct(lit(b).as("band"), col(s"m${2 * b}").as("k1"), col(s"m${2 * b + 1}").as("k2"))
    }
    sig
      .select(col("doc_id"), explode(array(bandStructs: _*)).as("bk"))
      .select(col("doc_id"), col("bk.band").as("band"), col("bk.k1").as("k1"), col("bk.k2").as("k2"))
  }

  /** Candidate pairs (doc_a < doc_b, doc_a restricted by `slicePred`),
    * verified with exact Jaccard ≥ `threshold`. Output:
    * (doc_a, doc_b, jaccard) ordered.
    *
    * The slice side is broadcast when bounded; at full scale the same plan
    * becomes a shuffle equi-join on the band keys — fingerprints, never
    * document bodies, cross the wire. AQE splits skewed band buckets.
    */
  def lshNearDupPairs(
      docs: DataFrame,
      sliceMax: Long = 100L,
      threshold: Double = 0.5): DataFrame = {
    // Both `tok` and `bk` are consumed more than once (tok: signatures + the
    // two verification attaches; bk: both sides of the candidate self-join).
    // Persist them so each lineage is computed exactly once — without this the
    // 64-min-hash aggregate runs twice and tokenization three times. Sizes are
    // bounded: bk is 4 longs × Bands per doc, tok is the token sets
    // (fingerprint-scale, not corpus-scale). At cluster scale the same frames
    // are the ones you would materialize to storage between stages.
    val tok = tokens(docs).persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val bk = bands(signatures(tok)).persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val cand = bk
      .join(
        broadcast(
          bk.filter(col("doc_id") < sliceMax)
            .select(col("doc_id").as("doc_a"), col("band"), col("k1"), col("k2"))),
        Seq("band", "k1", "k2"))
      .filter(col("doc_a") < col("doc_id"))
      .select(col("doc_a"), col("doc_id").as("doc_b"))
      .distinct()
    cand
      .join(tok.select(col("doc_id").as("doc_a"), col("toks").as("ta")), "doc_a")
      .join(tok.select(col("doc_id").as("doc_b"), col("toks").as("tb")), "doc_b")
      .withColumn(
        "jaccard",
        round(
          size(array_intersect(col("ta"), col("tb"))).cast("double") /
            size(array_union(col("ta"), col("tb"))),
          4))
      .filter(col("jaccard") >= threshold)
      .select(col("doc_a"), col("doc_b"), col("jaccard"))
      .orderBy("doc_a", "doc_b")
  }

  /** DuckDB SQL replicating [[lshNearDupPairs]] exactly (same constants,
    * same arithmetic), for the driver's oracle compare.
    */
  def oracleSql(sliceMax: Long = 100L, threshold: Double = 0.5): String = {
    val minCols = seeds.zipWithIndex
      .map { case ((a, b), i) => s"min((x*$a+$b)%$P) AS m$i" }
      .mkString(",\n    ")
    val sigList = (0 until K).map(i => s"m$i").mkString("[", ", ", "]")
    s"""WITH tok AS (
       |  SELECT doc_id, list_distinct(string_split(text, ' ')) AS toks
       |  FROM documents),
       |tx AS (
       |  SELECT doc_id, CAST(list_reduce(
       |    list_transform(range(1, 8),
       |      i -> instr('0123456789abcdef', substr(md5(tok), i, 1)) - 1),
       |    (acc, v) -> acc * 16 + v) AS BIGINT) AS x
       |  FROM (SELECT doc_id, unnest(toks) AS tok FROM tok)),
       |mins AS (
       |  SELECT doc_id,
       |    $minCols
       |  FROM tx GROUP BY doc_id),
       |bands AS (
       |  SELECT doc_id, b, sig[2*b+1] AS k1, sig[2*b+2] AS k2
       |  FROM (SELECT doc_id, $sigList AS sig FROM mins),
       |       (SELECT unnest(range(0, $Bands)) AS b)),
       |cand AS (
       |  SELECT DISTINCT a.doc_id AS doc_a, c.doc_id AS doc_b
       |  FROM bands a JOIN bands c
       |    ON a.b = c.b AND a.k1 = c.k1 AND a.k2 = c.k2 AND a.doc_id < c.doc_id
       |  WHERE a.doc_id < $sliceMax),
       |ver AS (
       |  SELECT doc_a, doc_b,
       |    round(CAST(len(list_intersect(ta.toks, tb.toks)) AS DOUBLE)
       |      / len(list_distinct(list_concat(ta.toks, tb.toks))), 4) AS jaccard
       |  FROM cand
       |  JOIN tok ta ON ta.doc_id = doc_a
       |  JOIN tok tb ON tb.doc_id = doc_b)
       |SELECT doc_a, doc_b, jaccard FROM ver
       |WHERE jaccard >= $threshold ORDER BY doc_a, doc_b""".stripMargin
  }
}
