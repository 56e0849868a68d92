package graft.report

import graft.ingest.FileIngest.CompressionStats

/** The pipeline's human-facing report surface: human-readable byte
  * formatting and the two-table HTML summary (compression stats + top loan
  * segments) — the reference DAG's `_format_size` and
  * `_send_summary_email` rendering (drive_auto_compress_email.py:342-350,
  * 353-517). SMTP delivery stays out of engine scope (connector); this
  * module produces the exact HTML payload a mailer would send.
  */
object Summary {

  /** Human-readable size: 1024-based units, two decimals — the reference's
    * `_format_size` (drive_auto_compress_email.py:342-350): "1.00 KB",
    * "1.50 MB", falling through to PB.
    */
  def formatSize(bytesCount: Long): String = {
    var v = bytesCount.toDouble
    val units = Seq("B", "KB", "MB", "GB", "TB")
    for (u <- units) {
      if (v < 1024) return f"$v%.2f $u"
      v /= 1024.0
    }
    f"$v%.2f PB"
  }

  /** The report's subject line — the reference's email subject
    * (drive_auto_compress_email.py:365). The `[Loan ETL]` tag is fixed
    * there too; only the trailing pipeline/DAG id varies, which is what
    * `pipeline` stands in for (the reference hard-codes its dag_id).
    */
  def subject(fileCount: Int, pipeline: String = "loan-etl"): String =
    s"[Loan ETL] $fileCount file(s) processed – $pipeline"

  private def esc(s: String): String =
    s.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")

  private val th = """border:1px solid #dddddd; padding:6px;"""

  /** Render the full HTML report: file-compression table plus, when
    * aggregate rows are present, the "top segments by loan_count" table
    * (drive_auto_compress_email.py:371-447). `aggregates` rows are the
    * key→value maps produced by `Aggregates.latestSummary`; missing keys
    * render as "-" / 0 exactly like the reference's `.get(...)` defaults
    * (drive_auto_compress_email.py:390-395).
    */
  def renderHtml(
      processed: Seq[CompressionStats],
      aggregates: Seq[Map[String, Any]] = Seq.empty,
      runTime: String = "",
      source: String = ""): String = {

    val compressionRows = processed.map { s =>
      s"""      <tr>
         |        <td>${esc(s.filename)}</td>
         |        <td style="text-align:right;">${formatSize(s.originalSize)}</td>
         |        <td style="text-align:right;">${formatSize(s.compressedSize)}</td>
         |        <td style="text-align:right;">${f"${s.compressionRatio}%.3f"}</td>
         |        <td style="font-size:11px;"><code>${esc(s.rawPath)}</code></td>
         |        <td style="font-size:11px;"><code>${esc(s.compressedPath)}</code></td>
         |      </tr>""".stripMargin
    }.mkString("\n")

    val aggTable =
      if (aggregates.isEmpty) ""
      else {
        val rows = aggregates.map { a =>
          def str(k: String) = esc(a.getOrElse(k, "-").toString)
          val loanCount = a.getOrElse("loan_count", 0L)
          val totalAmount = a.get("total_amount").flatMap(Option(_)) match {
            case Some(v: Number) => f"${v.doubleValue()}%.2f"
            case _               => "0.00"
          }
          s"""      <tr>
             |        <td>${str("status")}</td>
             |        <td>${str("product_type")}</td>
             |        <td>${str("branch")}</td>
             |        <td style="text-align:right;">$loanCount</td>
             |        <td style="text-align:right;">$totalAmount</td>
             |      </tr>""".stripMargin
        }.mkString("\n")
        s"""  <h3 style="margin:24px 0 8px 0; font-size:16px;">Loan Aggregates</h3>
           |  <p style="margin:0 0 8px 0; font-size:13px;">Top segments by <b>loan_count</b> from the latest ETL run.</p>
           |  <table style="border-collapse:collapse; width:100%; font-size:13px;">
           |    <thead>
           |      <tr style="background-color:#f5f5f5;">
           |        <th style="$th text-align:left;">Status</th>
           |        <th style="$th text-align:left;">Product Type</th>
           |        <th style="$th text-align:left;">Branch</th>
           |        <th style="$th text-align:right;">Loan Count</th>
           |        <th style="$th text-align:right;">Total Amount</th>
           |      </tr>
           |    </thead>
           |    <tbody>
           |$rows
           |    </tbody>
           |  </table>""".stripMargin
      }

    s"""<div style="font-family:system-ui,sans-serif; font-size:14px; color:#333333;">
       |  <h2 style="margin:0 0 4px 0; font-size:18px;">Loan ETL – Processing Summary</h2>
       |  <p style="margin:0 0 12px 0;">Processed <b>${processed.size}</b> file(s).</p>
       |  <table style="margin:0 0 12px 0; font-size:13px;">
       |    <tr><td style="padding-right:16px;"><b>Run time:</b></td><td>${esc(runTime)}</td></tr>
       |    <tr><td style="padding-right:16px;"><b>Source:</b></td><td><code>${esc(source)}</code></td></tr>
       |  </table>
       |  <h3 style="margin:16px 0 8px 0; font-size:16px;">File Compression Summary</h3>
       |  <table style="border-collapse:collapse; width:100%; font-size:13px;">
       |    <thead>
       |      <tr style="background-color:#f5f5f5;">
       |        <th style="$th text-align:left;">Filename</th>
       |        <th style="$th text-align:right;">Original Size</th>
       |        <th style="$th text-align:right;">Compressed Size</th>
       |        <th style="$th text-align:right;">Compression Ratio</th>
       |        <th style="$th text-align:left;">Raw Object</th>
       |        <th style="$th text-align:left;">Compressed Object</th>
       |      </tr>
       |    </thead>
       |    <tbody>
       |$compressionRows
       |    </tbody>
       |  </table>
       |$aggTable
       |</div>""".stripMargin
  }
}
