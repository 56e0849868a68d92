package graft.report

import graft.SparkSpec
import graft.ingest.FileIngest.CompressionStats

class SummarySpec extends SparkSpec {

  test("formatSize matches the reference's unit ladder") {
    assert(Summary.formatSize(0L) == "0.00 B")
    assert(Summary.formatSize(1023L) == "1023.00 B")
    assert(Summary.formatSize(1024L) == "1.00 KB")
    assert(Summary.formatSize(1536L) == "1.50 KB")
    assert(Summary.formatSize(5L * 1024 * 1024) == "5.00 MB")
    assert(Summary.formatSize(3L * 1024 * 1024 * 1024) == "3.00 GB")
    assert(Summary.formatSize(2L * 1024 * 1024 * 1024 * 1024) == "2.00 TB")
    assert(Summary.formatSize(1024L * 1024 * 1024 * 1024 * 1024) == "1.00 PB")
  }

  private val stats = Seq(
    CompressionStats("file:/in/loan_a.csv", "loan_a.csv", 2048, 512, 0.25,
      "file:/raw/loan_a.csv", "file:/out/loan_a.csv.gz"),
    CompressionStats("file:/in/loan_b.csv", "loan_b.csv", 1024, 1024, 1.0,
      "file:/raw/loan_b.csv", "file:/out/loan_b.csv.gz"))

  private val aggs = Seq(
    Map[String, Any]("status" -> "APPROVED", "product_type" -> "HOME",
      "branch" -> "KTM", "loan_count" -> 42L, "total_amount" -> 123456.789),
    Map[String, Any]("status" -> "PENDING", "product_type" -> "AUTO",
      "branch" -> "PKR", "loan_count" -> 7L, "total_amount" -> null))

  test("renderHtml: both tables, formatted values, escaped cells") {
    val html = Summary.renderHtml(stats, aggs, runTime = "2026-08-12 10:00:00",
      source = "/data/incoming<scan>")
    // compression table values
    assert(html.contains("loan_a.csv"))
    assert(html.contains("2.00 KB"))
    assert(html.contains("512.00 B"))
    assert(html.contains("0.250"))
    assert(html.contains("1.000"))
    // aggregate table values: count verbatim, amount 2dp, null amount -> 0.00
    assert(html.contains("APPROVED"))
    assert(html.contains("42"))
    assert(html.contains("123456.79"))
    assert(html.contains("0.00"))
    // header metadata + escaping
    assert(html.contains("Processed <b>2</b> file(s)"))
    assert(html.contains("/data/incoming&lt;scan&gt;"))
    assert(!html.contains("<scan>"))
  }

  test("renderHtml: no aggregates section when summary is empty") {
    val html = Summary.renderHtml(stats, Seq.empty)
    assert(html.contains("File Compression Summary"))
    assert(!html.contains("Loan Aggregates"))
  }

  test("renderHtml: missing aggregate keys fall back like the reference") {
    val html = Summary.renderHtml(Seq.empty, Seq(Map[String, Any]("loan_count" -> 1L)))
    // status/product_type/branch default to "-" (drive_auto_compress_email.py:390-392)
    assert(html.contains("<td>-</td>"))
  }
}
