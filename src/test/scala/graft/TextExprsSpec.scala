package graft

import org.apache.spark.sql.functions._

import graft.functions.TextFunctions.rollingFingerprint
import graft.ops.TextOps.{FingerprintB, FingerprintK, FingerprintP}

/** Contract for the native [[graft.functions.RollingMinFingerprint]]:
  * identical values to the higher-order codepoint-array pipeline it
  * replaced (exact integer arithmetic — equality is exact, not
  * tolerance), matching edge semantics, SQL-name resolution.
  */
class TextExprsSpec extends SparkSpec {

  private lazy val docs =
    Queries.t(spark, "/root/testdata/sf0.001", "documents")

  test("native fingerprint equals the HOF codepoint pipeline on real docs") {
    val k = FingerprintK
    val pows = (0 until k).map { j =>
      var p = 1L
      (0 until (k - 1 - j)).foreach(_ => p = p * FingerprintB % FingerprintP)
      p
    }
    val terms = pows.zipWithIndex.map { case (pw, j) =>
      s"coalesce(try_element_at(codes, i + $j), 0L) * ${pw}L"
    }.mkString(" + ")
    val hof = docs
      .select(col("doc_id"),
        expr("transform(split(text, ''), c -> cast(ascii(c) as long))").as("codes"))
      .select(col("doc_id"), expr(
        s"""array_min(transform(
           |  sequence(1, greatest(size(codes) - ${k - 1}, 1)),
           |  i -> ($terms) % $FingerprintP))""".stripMargin).as("fp"))
    val native = docs.select(col("doc_id"),
      rollingFingerprint(col("text"), k, FingerprintB, FingerprintP).as("fp"))
    assert(hof.exceptAll(native).count() === 0)
    assert(native.exceptAll(hof).count() === 0)
    assert(native.count() > 0)
  }

  test("edge semantics: empty text, text shorter than k, null text") {
    import spark.implicits._
    val df = Seq(
      (0L, ""),        // codes = [0] -> fp = 0 (single zero-padded window)
      (1L, "ab"),      // shorter than k: one window, zero-padded tail
      (2L, "abcdefgh") // exactly k chars: one full window
    ).toDF("doc_id", "text")
      .unionByName(Seq((3L, Option.empty[String])).toDF("doc_id", "text"))
    val out = df.select(col("doc_id"),
      rollingFingerprint(col("text"), FingerprintK, FingerprintB, FingerprintP).as("fp"))
      .orderBy("doc_id").collect()
    assert(out(0).getLong(1) === 0L)
    // "ab": codes [97, 98], window sum = 97*B^7 + 98*B^6 mod P
    val b = FingerprintB
    val pow6 = { var p = 1L; (0 until 6).foreach(_ => p = p * b % FingerprintP); p }
    val pow7 = pow6 * b % FingerprintP
    assert(out(1).getLong(1) === (97L * pow7 + 98L * pow6) % FingerprintP)
    assert(!out(2).isNullAt(1))
    assert(out(3).isNullAt(1)) // null text -> null fingerprint
  }

  test("SQL name rolling_fingerprint resolves through GraftExtensions") {
    val viaSql = spark.sql("SELECT rolling_fingerprint('hello world') AS fp")
      .head.getLong(0)
    val viaCol = spark.range(1).select(
      rollingFingerprint(lit("hello world"), FingerprintK, FingerprintB, FingerprintP)
        .as("fp")).head.getLong(0)
    assert(viaSql === viaCol)
  }
}
