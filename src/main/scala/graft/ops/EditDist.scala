package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Bounded edit-distance near-dup — the character-level member of the
  * dedup family: all pairs with Levenshtein distance ≤ `d`, exactly.
  *
  * Where it sits: q20 (exact whole-doc), q84 (exact cross-doc spans) and
  * q25/q30/q35 (token/bit/embedding similarity) all miss the "same doc,
  * a handful of character typos/edits" case — token shingles shift
  * across an inserted character, SimHash bits flip, but the edit
  * distance stays tiny. The reference keeps one canonical copy per
  * file content (drive_auto_compress_email.py:85-111); this is that
  * contract under small character-level noise.
  *
  * Candidate generation is PassJoin (Li, Deng, Wang, Feng 2011,
  * "PASS-JOIN: A Partition-based Method for Similarity Joins") — a
  * LOSSLESS filter, so the brute-force DuckDB oracle matches exactly:
  * split each indexed string into k = d+1 segments; if ed(a,b) ≤ d, an
  * optimal alignment spends ≤ d edits across the k segments, so at
  * least one segment has ZERO edits and appears VERBATIM in the other
  * string, shifted by at most the edits before it (≤ d). Each doc
  * therefore probes, for every candidate partner length L in
  * [len-d, len], every segment slot i and every start within ±d of the
  * segment's home position — O(k·d²) short substrings per doc,
  * independent of corpus size. (PassJoin's multi-match-aware substring
  * selection tightens the ±d window further; the simple window is
  * already lossless, which is what the oracle equality relies on.)
  *
  * Scale shape: segments and probe substrings are generated MAP-SIDE
  * (codegen'd sequence/transform over the row's own text — no join, no
  * explode of the corpus against anything global); the candidate join
  * is an equi-join on `xxhash64(L, i, segment)` so NO substring text
  * ever shuffles (the q20 digest discipline — a 64-bit hash collision
  * can only ADD a candidate, and the exact verify kills it); the verify
  * is Spark's bounded `levenshtein(a, b, d)` — O(d·len) per pair, not
  * O(len²), and -1 past the threshold so no wasted full DP. Docs
  * shorter than k characters cannot form k non-empty segments, so a
  * separate brute leg pairs them against the (constant-length-bounded)
  * docs within the length window — pairs there have length ≤ 2d, both
  * legs disjoint (main-path pairs both have length ≥ k = d+1 > the
  * short side of any brute pair).
  *
  * Output: (doc_i, doc_j, ed) with doc_i < doc_j, one row per
  * qualifying pair. Null texts pair with nothing.
  */
object EditDist {

  /** All pairs with levenshtein(text_i, text_j) ≤ d, via lossless
    * PassJoin candidates + bounded-DP verify.
    */
  def editDistPairs(docs: DataFrame, d: Int = 4): DataFrame = {
    require(d >= 1, s"edit-distance bound must be >= 1, got $d")
    val k = d + 1 // segments per indexed string (pigeonhole count)

    val base0 = docs
      .filter(col("text").isNotNull)
      .select(col("doc_id"), col("text"), length(col("text")).as("len"))

    // ---- main path: strings with at least k characters ----------------
    // Spread the probe/segment maps across every core: the per-row
    // substring windows are higher-order-function expressions — evaluated
    // interpreted, not codegen'd — and a small corpus arrives as ONE scan
    // partition. The partition count is EXPLICIT (defaultParallelism):
    // repartition by expression alone lets AQE coalesce the tiny shuffle
    // back to a single partition (measured: 1 partition, 6.6 s of q97's
    // 7.9 s serialized on one task; explicit width → 0.5 s), and this
    // map is CPU-bound, not bytes-bound, so byte-targeted coalescing is
    // exactly wrong here. Both branches reuse the one exchange.
    val longs = base0.filter(col("len") >= k)
      .repartition(docs.sparkSession.sparkContext.defaultParallelism, col("doc_id"))

    // Segment geometry for a length-L string, fixed by L alone so the
    // probe side can recompute it for every candidate partner length:
    // base = L div k, rem = L mod k; segments 0..k-rem-1 have length
    // `base`, the last `rem` have `base+1`; start(i) = i*base +
    // max(0, i-(k-rem)). All closed-form integer arithmetic.
    // `/` on ints is double division in the DSL; the numerator is an
    // exact multiple of k, so the quotient is integral — cast back.
    def segBase(l: Column): Column = ((l - pmod(l, lit(k))) / k).cast("int")
    def segRem(l: Column): Column = pmod(l, lit(k)).cast("int")
    def segStart(l: Column, i: Column): Column =
      (i * segBase(l) + greatest(lit(0), i - (lit(k) - segRem(l)))).cast("int")
    def segLen(l: Column, i: Column): Column =
      (segBase(l) + when(i >= lit(k) - segRem(l), 1).otherwise(0)).cast("int")

    // Index side: each long doc emits its k segments, keyed by
    // hash(L, slot, segment-text) — the text itself never shuffles.
    val segs = longs
      .select(
        col("doc_id").as("s_id"), col("len").as("s_len"),
        explode(transform(
          sequence(lit(0), lit(d)),
          i => xxhash64(
            col("len"), i,
            col("text").substr(
              (segStart(col("len"), i) + 1).cast("int"),
              segLen(col("len"), i).cast("int"))))).as("kh"))

    // Probe side: for each candidate partner length L in [len-d, len]
    // (never below k — shorter partners live in the brute leg), each
    // segment slot, each start within ±d of the slot's home position.
    // The probe rows are FLAT LONGS, not structs: (L, slot) are already
    // inside the xxhash64 key, so carrying them as struct fields only
    // paid interpreted struct allocation + field-wise array_distinct
    // comparison per element (measured 1.4× on the probe map); window
    // duplicates survive to the candidate join, where the pair-level
    // distinct() collapses them anyway.
    val probes = longs
      .select(
        col("doc_id").as("p_id"), col("len").as("p_len"),
        explode(flatten(flatten(transform(
          sequence(greatest(lit(k), col("len") - d), col("len")),
          bigL => {
            val l = bigL.cast("int")
            transform(
              sequence(lit(0), lit(d)),
              i => {
                val st = segStart(l, i)
                val ln = segLen(l, i)
                transform(
                  sequence(
                    greatest(lit(0), st - d),
                    least(col("len").cast("int") - ln, st + d)),
                  p => xxhash64(l, i, col("text").substr((p + 1).cast("int"), ln.cast("int"))))
              })
          })))).as("kh"))

    // The longer string probes the shorter's segments; equal lengths tie
    // to the smaller doc_id, so every unordered pair joins exactly once.
    // kh equality implies the probe targeted this segment's (length,
    // slot, text) — up to a 64-bit collision, which can only ADD a
    // candidate the exact verify kills — so s_len <= p_len needs no
    // separate length column on the probe side.
    val mainCand = segs
      .join(probes, Seq("kh"))
      .filter(
        col("s_len") < col("p_len") ||
          (col("s_len") === col("p_len") && col("s_id") < col("p_id")))
      .select(
        least(col("s_id"), col("p_id")).as("doc_i"),
        greatest(col("s_id"), col("p_id")).as("doc_j"))

    // ---- brute leg: strings shorter than k characters ------------------
    // Any partner within the length window has length ≤ (k-1)+d = 2d, so
    // both sides are constant-length-bounded; join on exact candidate
    // length (exploded), never a cartesian.
    val shorts = base0.filter(col("len") < k)
      .select(col("doc_id").as("s_id"), col("len").as("s_len"))
    val shortPartners = base0.filter(col("len") <= 2 * d)
      .select(
        col("doc_id").as("p_id"), col("len").as("p_len"),
        explode(sequence(greatest(lit(0), col("len") - d), col("len"))).as("cl"))
    val shortCand = shorts
      .join(shortPartners, col("s_len") === col("cl"))
      .filter(
        col("s_len") < col("p_len") ||
          (col("s_len") === col("p_len") && col("s_id") < col("p_id")))
      .select(
        least(col("s_id"), col("p_id")).as("doc_i"),
        greatest(col("s_id"), col("p_id")).as("doc_j"))

    // ---- exact verify ---------------------------------------------------
    val texts = base0.select(col("doc_id"), col("text"))
    mainCand.union(shortCand)
      .distinct()
      .join(texts.select(col("doc_id").as("doc_i"), col("text").as("t_i")), Seq("doc_i"))
      .join(texts.select(col("doc_id").as("doc_j"), col("text").as("t_j")), Seq("doc_j"))
      .select(
        col("doc_i"), col("doc_j"),
        levenshtein(col("t_i"), col("t_j"), d).cast("long").as("ed"))
      .filter(col("ed") >= 0)
      .orderBy("doc_i", "doc_j")
  }

  /** DuckDB SQL replicating [[editDistPairs]] — deliberately the
    * brute-force form (length window + full Levenshtein), which the
    * lossless PassJoin filter must reproduce exactly.
    */
  def editDistPairsOracleSql(d: Int = 4): String =
    s"""SELECT a.doc_id AS doc_i, b.doc_id AS doc_j,
       |  CAST(levenshtein(a.text, b.text) AS BIGINT) AS ed
       |FROM documents a JOIN documents b
       |  ON a.doc_id < b.doc_id
       | AND abs(length(a.text) - length(b.text)) <= $d
       |WHERE levenshtein(a.text, b.text) <= $d
       |ORDER BY doc_i, doc_j""".stripMargin
}
