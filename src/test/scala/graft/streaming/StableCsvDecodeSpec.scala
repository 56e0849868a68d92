package graft.streaming

import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

import graft.SparkSpec

/** Cell-decode semantics of the StableCsvSource, pinned to Spark-CSV
  * parity: strings preserve their exact bytes — an unquoted empty field
  * is null (nullValue) while a quoted `""` is the empty string
  * (emptyValue); unparsable cells null the FIELD (PERMISSIVE default)
  * instead of failing the task, or throw under mode=FAILFAST;
  * timestamps accept ISO instants, offset datetimes, and zoneless SQL
  * forms (resolved in UTC); unsupported column types are rejected at
  * construction, never silently nulled.
  */
class StableCsvDecodeSpec extends SparkSpec {

  private def conv(raw: String, dt: DataType, failFast: Boolean = false): Any =
    StableCsvSource.convert(raw, dt, failFast)

  test("strings: exact bytes preserved; null and empty are distinct values") {
    assert(conv("  ", StringType) == UTF8String.fromString("  "),
      "a whitespace-only string is a VALUE, not null (Spark CSV parity)")
    assert(conv(" x ", StringType) == UTF8String.fromString(" x "))
    // the parser maps an unquoted empty field to null BEFORE convert();
    // a quoted "" arrives as the empty string and must stay one
    assert(conv("", StringType) == UTF8String.fromString(""),
      "a quoted empty field is the empty string, not null")
    assert(conv(null, StringType) == null)
  }

  test("permissive default: an unparsable cell nulls the field only") {
    assert(conv("abc", LongType) == null)
    assert(conv("1.5", LongType) == null, "a double in a Long column nulls, not crashes")
    assert(conv("12x", DoubleType) == null)
    assert(conv("not-a-date", DateType) == null)
    assert(conv("maybe", BooleanType) == null)
    // valid values still parse
    assert(conv(" 42 ", LongType) == 42L, "non-string types trim before parsing")
    assert(conv("1.5", DoubleType) == 1.5)
  }

  test("mode=FAILFAST throws on the first unparsable cell") {
    val e = intercept[IllegalArgumentException](conv("abc", LongType, failFast = true))
    assert(e.getMessage.contains("FAILFAST"))
    assert(conv("42", LongType, failFast = true) == 42L)
  }

  test("timestamps: ISO instant, offset datetime, and zoneless SQL form in UTC") {
    val utcMidnight = 1704067200000000L // 2024-01-01T00:00:00Z in micros
    assert(conv("2024-01-01T00:00:00Z", TimestampType) == utcMidnight)
    assert(conv("2024-01-01 00:00:00", TimestampType) == utcMidnight,
      "the zoneless SQL form resolves in UTC, not the JVM default zone")
    // +02:00 means two hours EARLIER in UTC
    assert(conv("2024-01-01T02:00:00+02:00", TimestampType) == utcMidnight,
      "offset datetimes must honor their zone offset")
    assert(conv("2024-01-01 02:00:00+02:00", TimestampType) == utcMidnight)
    assert(conv("2024-13-01 99:00:00", TimestampType) == null, "permissive nulls bad timestamps")
  }

  test("unsupported column types are rejected at construction, not nulled per row") {
    val bad = StructType(Seq(StructField("d", DecimalType(10, 2))))
    val e = intercept[IllegalArgumentException](StableCsvSource.validateSchema(bad))
    assert(e.getMessage.contains("unsupported type"))
    intercept[IllegalArgumentException] {
      new StableCsvMicroBatchStream(bad,
        Map("path" -> tmpDir("dec-in").toString), tmpDir("dec-ckpt").toString)
    }
  }

  test("oversized cell mid-file: PERMISSIVE nulls the field, every other row survives") {
    // a cell over maxCharsPerColumn must follow the per-cell contract
    // (null the FIELD), not abort univocity and kill the whole query —
    // the parser runs unlimited and the bound is enforced post-parse
    val schema = StructType(Seq(
      StructField("loan_id", LongType),
      StructField("name", StringType),
      StructField("amount", DoubleType)))
    val in = tmpDir("big-in"); val out = tmpDir("big-out"); val ckpt = tmpDir("big-ckpt")
    val huge = "x" * ((1 << 20) + 5) // just over the 1 MiChar default
    writeFile(in, "loan_big.csv",
      s"loan_id,name,amount\n1,before,10.5\n2,$huge,20.5\n3,after,30.5\n")
      .toFile.setLastModified(System.currentTimeMillis() - 60000)
    val df = StreamingEtl.stableCsvStream(
      spark, in.toString, schema, java.time.Duration.ofSeconds(1))
    val q = df.writeStream
      .format("parquet").option("path", out.toString)
      .option("checkpointLocation", ckpt.toString)
      .outputMode("append")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    val rows = spark.read.schema(schema).parquet(out.toString)
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getDouble(2)))
      .sortBy(_._1)
      .toSeq
    assert(rows == Seq((1L, "before", 10.5), (2L, null, 20.5), (3L, "after", 30.5)),
      s"the oversized cell must null only its field and the rows around it must survive: " +
        rows.map { case (a, b, c) => (a, Option(b).map(_.take(20)), c) })
  }

  test("runaway cell past the parser hard cap: file truncated at the record, query survives") {
    // tier 2 of the cell-length defense: a cell beyond 8x the limit
    // (floor 4 MiChar) trips univocity's own cap — unrecoverable
    // mid-file, so PERMISSIVE drops the REST OF THAT FILE (logged) but
    // the rows before it, and the query itself, survive. This is the
    // unterminated-quote / multi-GB-cell memory bound: without the
    // parser cap the whole cell would buffer on-heap before tier 1
    // could null it.
    val schema = StructType(Seq(
      StructField("loan_id", LongType),
      StructField("name", StringType)))
    val in = tmpDir("cap-in"); val out = tmpDir("cap-out"); val ckpt = tmpDir("cap-ckpt")
    val runaway = "z" * ((1 << 22) + 100) // past the 4 MiChar floor
    writeFile(in, "loan_cap.csv",
      s"loan_id,name\n1,first\n2,$runaway\n3,after\n")
      .toFile.setLastModified(System.currentTimeMillis() - 60000)
    val df = StreamingEtl.stableCsvStream(
      spark, in.toString, schema, java.time.Duration.ofSeconds(1),
      maxCharsPerColumn = 1024)
    val q = df.writeStream
      .format("parquet").option("path", out.toString)
      .option("checkpointLocation", ckpt.toString)
      .outputMode("append")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination() // must NOT throw
    val rows = spark.read.schema(schema).parquet(out.toString)
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(rows == Set((1L, "first")),
      s"rows before the runaway record survive; the file truncates there: $rows")
  }

  test("parser hard cap: 8x with 4 MiChar floor, 64 MiChar eager ceiling, lazy beyond") {
    // the eager univocity buffer is char[hardCap]; without the ceiling a
    // limit just under the lazy threshold would 8x to ~1 GiB per open
    // reader — the ceiling bounds the worst configurable case at 128 MB
    import StableCsvSource.parserHardCap
    assert(parserHardCap(0) == -1 && parserHardCap(-5) == -1, "non-positive: unlimited lazy")
    assert(parserHardCap(1 << 20) == 1 << 23, "default 1 MiChar limit -> 8 MiChar cap (16 MB)")
    assert(parserHardCap(1024) == 1 << 22, "tiny limits keep the 4 MiChar floor")
    assert(parserHardCap((1 << 26) - 1) == 1 << 26,
      "just under the lazy threshold: ceiling binds (128 MB eager), NOT ~1 GiB")
    assert(parserHardCap(1 << 24) == 1 << 26, "8x above the ceiling clamps to it")
    assert(parserHardCap(1 << 26) == 1 << 26, "at the threshold the cap equals the limit")
    assert(parserHardCap((1 << 26) + 1) == -1, "above the threshold: lazy, user's bound")
    // every finite cap still dominates its limit (tier-2 sits at/above tier-1)
    Seq(1, 1 << 10, 1 << 20, 1 << 23, 1 << 25, 1 << 26).foreach { lim =>
      assert(parserHardCap(lim) >= lim, s"cap must be >= limit for $lim")
    }
  }

  test("oversized cell under mode=FAILFAST fails the query") {
    val schema = StructType(Seq(
      StructField("loan_id", LongType),
      StructField("name", StringType)))
    val in = tmpDir("bigf-in"); val out = tmpDir("bigf-out"); val ckpt = tmpDir("bigf-ckpt")
    writeFile(in, "loan_bigf.csv", s"loan_id,name\n1,${"y" * 64}\n")
      .toFile.setLastModified(System.currentTimeMillis() - 60000)
    val df = StreamingEtl.stableCsvStream(
      spark, in.toString, schema, java.time.Duration.ofSeconds(1),
      failFast = true, maxCharsPerColumn = 16)
    val q = df.writeStream
      .format("parquet").option("path", out.toString)
      .option("checkpointLocation", ckpt.toString)
      .outputMode("append")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    val e = intercept[org.apache.spark.sql.streaming.StreamingQueryException](q.awaitTermination())
    def chain(t: Throwable): Seq[Throwable] =
      Iterator.iterate(t)(_.getCause).takeWhile(_ != null).take(20).toSeq
    assert(chain(e).exists(c =>
      c.getMessage != null && c.getMessage.contains("maxCharsPerColumn")),
      s"expected the FAILFAST oversized-cell error in the cause chain: ${e.getMessage}")
  }

  test("streaming end-to-end: malformed cells null their fields; good rows unaffected") {
    val schema = StructType(Seq(
      StructField("loan_id", LongType),
      StructField("name", StringType),
      StructField("amount", DoubleType)))
    val in = tmpDir("dec2-in"); val out = tmpDir("dec2-out"); val ckpt = tmpDir("dec2-ckpt")
    writeFile(in, "loan_m.csv",
      "loan_id,name,amount\n1,good,10.5\n2,bad,notanumber\nxx,worse,3.25\n" +
        "3,\"\",7.0\n4,,8.0\n") // quoted empty = "", unquoted empty = null
      .toFile.setLastModified(System.currentTimeMillis() - 60000)
    val df = StreamingEtl.stableCsvStream(
      spark, in.toString, schema, java.time.Duration.ofSeconds(1))
    val q = df.writeStream
      .format("parquet").option("path", out.toString)
      .option("checkpointLocation", ckpt.toString)
      .outputMode("append")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    val rows = spark.read.schema(schema).parquet(out.toString)
      .collect()
      .map(r => (if (r.isNullAt(0)) null else r.getLong(0),
        r.getString(1),
        if (r.isNullAt(2)) null else r.getDouble(2)))
      .toSet
    assert(rows == Set((1L, "good", 10.5), (2L, "bad", null), (null, "worse", 3.25),
        (3L, "", 7.0), (4L, null, 8.0)),
      s"permissive decode must null only the malformed field, and keep quoted-empty distinct from null: $rows")
  }
}
