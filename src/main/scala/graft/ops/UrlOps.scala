package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** URL canonicalization and host/domain keys — the CCNet/C4 crawl
  * discipline: a crawl corpus names the same page many ways (scheme and
  * host case, default ports, fragments, tracking params, query-param
  * order), and every downstream host-level operation (per-domain caps,
  * URL-level exact dedup, PageRank vertex ids) needs ONE canonical name
  * per page first.
  *
  * Rules (the published subset — scheme+host are case-insensitive per
  * RFC 3986, the rest is the C4/CCNet cleaning recipe):
  *   - scheme and host lowercased; path and query case preserved
  *     (paths are case-sensitive);
  *   - fragment stripped (never sent to the server);
  *   - userinfo stripped (user:pass@host, RFC 3986 §3.2.1): two URLs
  *     differing only in credentials are one page, and credentials must
  *     not persist into canonical keys;
  *   - default port stripped (:80 on http, :443 on https); any other
  *     explicit port kept;
  *   - query params: empties and `utm_*` tracking params dropped, the
  *     rest sorted (param order is almost never semantic; sorting makes
  *     `?a=1&b=2` and `?b=2&a=1` one key); an emptied query drops its
  *     `?`;
  *   - empty path becomes `/` (http://x.com and http://x.com/ are the
  *     same resource).
  *
  * `domain` is the registered domain under a public-suffix snapshot:
  * the last TWO host labels, except when those two labels are
  * themselves a multi-label public suffix ([[multiLabelSuffixes]] — the
  * ccSLD subset of the public suffix list: co.uk, com.au, ne.jp, …), in
  * which case the last THREE labels are the registered domain. So
  * `bbc.co.uk` keys as `bbc.co.uk` (not the whole `co.uk` registry) and
  * `news.bbc.co.uk` joins `www.bbc.co.uk` under one quota — the
  * host-level dedup/cap/PageRank-vertex key.
  *
  * Scale shape: pure per-row codegen'd string ops — a map at any corpus
  * size, no shuffle, no UDF. RE2-compatible regexes only, and the
  * suffix set is ONE literal IN-list both engines share, so the DuckDB
  * oracle replays every rule exactly.
  */
object UrlOps {

  /** Multi-label public suffixes (ccSLDs) under which the registered
    * domain is three labels, not two — a curated snapshot of the
    * publicly documented country-code second-level registries (the
    * publicsuffix.org convention; the full PSL is a superset with the
    * same semantics). One shared literal: the Spark `isin` and the
    * DuckDB `IN` list are both generated from THIS sequence, so the two
    * engines cannot disagree on membership.
    */
  val multiLabelSuffixes: Seq[String] = Seq(
    // United Kingdom
    "co.uk", "org.uk", "ac.uk", "gov.uk", "me.uk", "net.uk", "ltd.uk",
    "plc.uk", "sch.uk", "nhs.uk",
    // Australia
    "com.au", "net.au", "org.au", "edu.au", "gov.au", "id.au", "asn.au",
    // Japan
    "co.jp", "ne.jp", "or.jp", "ac.jp", "ad.jp", "go.jp", "gr.jp", "lg.jp",
    // Brazil
    "com.br", "net.br", "org.br", "gov.br", "edu.br",
    // New Zealand
    "co.nz", "net.nz", "org.nz", "govt.nz", "ac.nz",
    // South Africa
    "co.za", "org.za", "net.za", "gov.za", "ac.za", "web.za",
    // China
    "com.cn", "net.cn", "org.cn", "gov.cn", "edu.cn", "ac.cn",
    // India
    "co.in", "net.in", "org.in", "ac.in", "edu.in", "gov.in", "res.in",
    // Korea
    "co.kr", "ne.kr", "or.kr", "go.kr", "ac.kr",
    // Mexico / Argentina / Turkey / Singapore / Hong Kong / Taiwan
    "com.mx", "gob.mx", "org.mx", "net.mx", "edu.mx",
    "com.ar", "com.tr", "com.sg", "com.hk", "com.tw",
    // Indonesia / Thailand / Malaysia / Philippines / Vietnam
    "co.id", "or.id", "ac.id", "go.id",
    "co.th", "or.th", "ac.th", "go.th",
    "com.my", "com.ph", "com.vn",
    // Ukraine / Israel / Egypt / Saudi Arabia / Pakistan
    "com.ua", "in.ua", "org.ua", "co.il", "org.il", "ac.il",
    "com.eg", "com.sa", "com.pk")

  /** [[multiLabelSuffixes]] as the DuckDB IN-list literal. */
  private[graft] val multiLabelSuffixesSql: String =
    multiLabelSuffixes.map(s => s"'$s'").mkString("(", ", ", ")")

  /** Registered domain of a lowercased `host` Column under the
    * public-suffix snapshot: last three labels when the last two are a
    * multi-label suffix (and a third exists), last two otherwise. A host
    * that IS a bare multi-label suffix (`co.uk`) has no registrant —
    * it falls back to itself, one degenerate key per registry.
    */
  def registeredDomain(host: Column): Column = {
    val last2 = regexp_extract(host, "([^.]+\\.[^.]+)$", 1)
    val last3 = regexp_extract(host, "([^.]+\\.[^.]+\\.[^.]+)$", 1)
    when(last2.isin(multiLabelSuffixes: _*) && last3 =!= "", last3)
      .otherwise(last2)
  }

  /** Attach (canon_url, host, domain) to `urls` from its `urlCol`.
    * Total over dirty input: a null or empty URL coalesces to '' and
    * canonicalizes to EMPTY-STRING host/domain with the `":///"`
    * canon_url skeleton (pinned by UrlOpsSpec — one degenerate key, not
    * a null that silently drops from keyed aggregates); a URL with no
    * scheme keeps rest-parsing semantics (scheme '').
    */
  def canonicalize(urls: DataFrame, urlCol: String = "url"): DataFrame = {
    val u = coalesce(col(urlCol), lit(""))
    val nofrag = regexp_replace(u, "#.*$", "")
    val scheme = lower(regexp_extract(nofrag, "^([A-Za-z][A-Za-z0-9+.-]*)://", 1))
    val rest = regexp_replace(nofrag, "^[A-Za-z][A-Za-z0-9+.-]*://", "")
    // userinfo (user:pass@host — RFC 3986 §3.2.1) stripped before the
    // port split: a crawl frontier occasionally carries it, and leaving
    // it in would fragment the host/domain keys and break the port
    // detection (the ':' of user:pass wins the regex otherwise). The
    // strip is GREEDY ('^.*@'): RFC 3986 / WHATWG place the host after
    // the LAST '@' of the authority, so a dirty 'http://a@b@c.com/'
    // keys host as 'c.com', not 'b@c.com'
    val hostport = regexp_replace(
      lower(regexp_extract(rest, "^([^/?]*)", 1)), "^.*@", "")
    val host = regexp_replace(hostport, ":[0-9]+$", "")
    val port = regexp_extract(hostport, ":([0-9]+)$", 1)
    val pathq = regexp_replace(rest, "^[^/?]*", "")
    val path0 = regexp_extract(pathq, "^([^?]*)", 1)
    val path = when(path0 === "", lit("/")).otherwise(path0)
    val params = sort_array(filter(
      split(regexp_extract(pathq, "\\?(.*)$", 1), "&"),
      p => p =!= "" && !startswith(p, lit("utm_"))))
    val keepPort = port =!= "" &&
      !(scheme === "http" && port === "80") &&
      !(scheme === "https" && port === "443")
    urls.withColumn("canon_url",
      concat(
        scheme, lit("://"), host,
        when(keepPort, concat(lit(":"), port)).otherwise(lit("")),
        path,
        when(size(params) > 0, concat(lit("?"), array_join(params, "&")))
          .otherwise(lit(""))))
      .withColumn("host", host)
      .withColumn("domain", registeredDomain(host))
  }

  /** Deterministic raw-URL synthesis for q156 (the q147 dirtied-fact
    * discipline — the testdata has no URL column, so the query mints the
    * messy forms a crawl frontier actually holds): mixed scheme/host
    * case, default and non-default ports, tracking params, unsorted
    * queries, fragments. Host varies by subdomain (www/news) while the
    * registered domain is a function of `source` and a rotating TLD —
    * including ccSLD forms (.co.uk, .com.au, .ne.jp, .co.jp, .com.br)
    * so the public-suffix path of [[registeredDomain]] is exercised by
    * the q156/q159 oracles, not just the spec fixtures.
    */
  def syntheticUrl(docId: Column, source: Column): Column =
    concat(
      element_at(
        array(lit("HTTP://"), lit("https://"), lit("HTTPS://"), lit("http://")),
        (docId % 4 + 1).cast("int")),
      when(docId % 2 === 0, lit("WWW.")).otherwise(lit("News.")),
      upper(source),
      element_at(
        array(lit(".COM"), lit(".CO.UK"), lit(".COM.AU"), lit(".NE.JP"),
          lit(".ORG"), lit(".CO.JP"), lit(".COM.BR")),
        (docId % 7 + 1).cast("int")),
      element_at(array(lit(":80"), lit(":443"), lit(":8080")),
        (docId % 3 + 1).cast("int")),
      lit("/Articles/"), docId.cast("string"),
      when(docId % 2 === 0, lit("/?utm_source=feed&b=2&a=1"))
        .otherwise(lit("?z=9&m=0")),
      lit("#sec-"), (docId % 5).cast("string"))

  /** The [[syntheticUrl]] expression in DuckDB SQL (over documents).
    * Single line: this snippet is interpolated into stripMargin'd SQL
    * builders, and a line-leading `||` would be eaten as a margin. */
  private[graft] val syntheticUrlSql: String =
    "CASE doc_id % 4 WHEN 0 THEN 'HTTP://' WHEN 1 THEN 'https://' " +
      "WHEN 2 THEN 'HTTPS://' ELSE 'http://' END || " +
      "CASE WHEN doc_id % 2 = 0 THEN 'WWW.' ELSE 'News.' END || " +
      "upper(source) || " +
      "CASE doc_id % 7 WHEN 0 THEN '.COM' WHEN 1 THEN '.CO.UK' " +
      "WHEN 2 THEN '.COM.AU' WHEN 3 THEN '.NE.JP' WHEN 4 THEN '.ORG' " +
      "WHEN 5 THEN '.CO.JP' ELSE '.COM.BR' END || " +
      "CASE doc_id % 3 WHEN 0 THEN ':80' WHEN 1 THEN ':443' ELSE ':8080' END || " +
      "'/Articles/' || doc_id || " +
      "CASE WHEN doc_id % 2 = 0 THEN '/?utm_source=feed&b=2&a=1' ELSE '?z=9&m=0' END || " +
      "'#sec-' || (doc_id % 5)"

  /** The canonicalization pipeline in DuckDB SQL: CTEs producing
    * (doc_id, url, canon_url, host, domain) from [[syntheticUrlSql]] —
    * shared by the q156 and q159 oracles. */
  private def canonCtesSql: String =
    s"""u AS (
       |  SELECT doc_id, n_chars, $syntheticUrlSql AS url
       |  FROM documents),
       |c0 AS (
       |  SELECT doc_id, n_chars, url,
       |    lower(regexp_extract(regexp_replace(url, '#.*$$', ''),
       |      '^([A-Za-z][A-Za-z0-9+.-]*)://', 1)) AS scheme,
       |    regexp_replace(regexp_replace(url, '#.*$$', ''),
       |      '^[A-Za-z][A-Za-z0-9+.-]*://', '') AS rest
       |  FROM u),
       |c1 AS (
       |  SELECT doc_id, n_chars, url, scheme,
       |    regexp_replace(lower(regexp_extract(rest, '^([^/?]*)', 1)),
       |      '^.*@', '') AS hostport,
       |    regexp_replace(rest, '^[^/?]*', '') AS pathq
       |  FROM c0),
       |c2 AS (
       |  SELECT doc_id, n_chars, url, scheme,
       |    regexp_replace(hostport, ':[0-9]+$$', '') AS host,
       |    regexp_extract(hostport, ':([0-9]+)$$', 1) AS port,
       |    CASE WHEN regexp_extract(pathq, '^([^?]*)', 1) = '' THEN '/'
       |         ELSE regexp_extract(pathq, '^([^?]*)', 1) END AS path,
       |    list_sort(list_filter(
       |      string_split(regexp_extract(pathq, '\\?(.*)$$', 1), '&'),
       |      x -> x <> '' AND NOT starts_with(x, 'utm_'))) AS params
       |  FROM c1),
       |canon AS (
       |  SELECT doc_id, n_chars, url,
       |    scheme || '://' || host ||
       |    CASE WHEN port <> '' AND NOT (scheme = 'http' AND port = '80')
       |              AND NOT (scheme = 'https' AND port = '443')
       |         THEN ':' || port ELSE '' END || path ||
       |    CASE WHEN len(params) > 0
       |         THEN '?' || array_to_string(params, '&') ELSE '' END
       |      AS canon_url,
       |    host,
       |    CASE WHEN regexp_extract(host, '([^.]+\\.[^.]+)$$', 1)
       |              IN $multiLabelSuffixesSql
       |          AND regexp_extract(host, '([^.]+\\.[^.]+\\.[^.]+)$$', 1) <> ''
       |         THEN regexp_extract(host, '([^.]+\\.[^.]+\\.[^.]+)$$', 1)
       |         ELSE regexp_extract(host, '([^.]+\\.[^.]+)$$', 1)
       |    END AS domain
       |  FROM c2)""".stripMargin

  /** DuckDB oracle for q156: [[canonicalize]] over [[syntheticUrl]]. */
  def canonicalizeOracleSql: String =
    s"""WITH $canonCtesSql
       |SELECT doc_id, url, canon_url, host, domain
       |FROM canon ORDER BY doc_id""".stripMargin

  /** Per-domain document cap (q159): [[canonicalize]]'s `domain` key
    * feeding [[TrainPipe.stratifiedTopK]] — the common-crawl per-domain
    * cap, now keyed on the REGISTERED domain (www.x.com and news.x.com
    * count against one quota) instead of the corpus's source label.
    * Output: (doc_id, domain, n_chars, rk), domain asc / rk asc.
    */
  def domainCap(docs: DataFrame, k: Int = 10, shards: Int = 8): DataFrame = {
    val withDomain = canonicalize(
      docs.withColumn("url", syntheticUrl(col("doc_id"), col("source"))))
      .select(col("doc_id"), col("domain"), col("n_chars"))
    TrainPipe.stratifiedTopK(withDomain, k, shards, by = "domain")
  }

  /** DuckDB oracle for [[domainCap]]: the canon CTEs + the stratified
    * two-phase top-k replayed on the domain key. */
  def domainCapOracleSql(k: Int = 10, shards: Int = 8): String =
    s"""WITH $canonCtesSql,
       |t AS (
       |  SELECT doc_id, domain, n_chars,
       |    ${TrainPipe.duckHex7("'topk:' || doc_id")} % $shards AS shard
       |  FROM canon),
       |p1 AS (
       |  SELECT *, row_number() OVER (
       |    PARTITION BY domain, shard
       |    ORDER BY n_chars DESC, doc_id ASC) AS r1
       |  FROM t),
       |p2 AS (
       |  SELECT doc_id, domain, n_chars, row_number() OVER (
       |    PARTITION BY domain ORDER BY n_chars DESC, doc_id ASC) AS rk
       |  FROM p1 WHERE r1 <= $k)
       |SELECT doc_id, domain, n_chars, CAST(rk AS BIGINT) AS rk
       |FROM p2 WHERE rk <= $k
       |ORDER BY domain, rk""".stripMargin
}
