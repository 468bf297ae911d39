package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** URL canonicalization + host/registrable-domain extraction + URL-level
  * dedup — the crawl-curation pass every web-scale training pipeline runs
  * before content dedup (the same page crawled as `HTTPS://WWW.X.COM:443/a/`
  * and `https://x.com/a?utm_source=feed` must collapse BEFORE paying for
  * text hashing). Beyond the reference surface (it has no URL functions);
  * the operators here are row-local regex projections — codegen'd, zero
  * shuffle — and the dedup mark is one shuffle on the canonical key,
  * exactly the d01 arrangement.
  *
  * Cross-engine contract: every regex is RE2-compatible (no lookaround),
  * and every regexp_replace is anchored or single-match, so Spark's
  * replace-all and DuckDB's replace-first agree; the paired `*Sql`
  * renderers below emit the identical chain for the oracle (the Sampling
  * discipline).
  *
  * Canonical form: scheme+authority lowercased, query + fragment dropped
  * (the aggressive variant standard in crawl dedup — tracking params make
  * per-key query allowlists a data problem, not an algorithm), default
  * ports (:80 http, :443 https) stripped, leading `www.` stripped,
  * trailing slashes stripped. Registrable domain is approximate: common
  * two-part public suffixes are recognized; a full PSL is a data file to
  * swap in, not a different algorithm.
  */
object UrlOps {

  private val SchemeHost = "^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*"
  private val TwoPartTld =
    "(co|com|org|net|ac|gov|edu)\\.(uk|au|jp|br|in|cn|nz|za|kr|mx|il|id)"
  private val HostPat = "^[a-zA-Z][a-zA-Z0-9+.-]*://([^/?#]*@)?([^/:?#]+)"

  // ------------------------------------------------------ canonical URL
  def urlCanonicalize(u: Column): Column = {
    // scheme://authority lowercased, the rest byte-preserved (paths are
    // case-sensitive per RFC 3986; scheme/host are not)
    val lowered = concat(lower(regexp_extract(u, s"($SchemeHost)", 1)),
      regexp_replace(u, SchemeHost, ""))
    val noQf = regexp_replace(lowered, "[?#].*", "")
    val noPort = regexp_replace(regexp_replace(noQf,
      "^(https://[^/:]+):443(/|$)", "$1$2"),
      "^(http://[^/:]+):80(/|$)", "$1$2")
    val noWww = regexp_replace(noPort, "^([a-z][a-z0-9+.-]*://)www\\.", "$1")
    regexp_replace(noWww, "/+$", "")
  }

  /** DuckDB rendering of the identical chain over SQL expression `u`. */
  def urlCanonicalizeSql(u: String): String = {
    val lowered = s"lower(regexp_extract($u, '($SchemeHost)', 1)) || " +
      s"regexp_replace($u, '$SchemeHost', '')"
    val noQf = s"regexp_replace($lowered, '[?#].*', '')"
    val noPort = "regexp_replace(regexp_replace(" + noQf +
      ", '^(https://[^/:]+):443(/|$)', '\\1\\2'), " +
      "'^(http://[^/:]+):80(/|$)', '\\1\\2')"
    val noWww = s"regexp_replace($noPort, '^([a-z][a-z0-9+.-]*://)www\\.', '\\1')"
    s"regexp_replace($noWww, '/+$$', '')"
  }

  // ------------------------------------------------- host + domain
  /** Lowercased host (authority minus userinfo/port); '' when `u` has no
    * scheme://host shape. */
  def urlHost(u: Column): Column = lower(regexp_extract(u, HostPat, 2))

  def urlHostSql(u: String): String =
    s"lower(regexp_extract($u, '$HostPat', 2))"

  /** Approximate registrable domain: last 2 labels, or last 3 when the
    * host ends in a recognized two-part suffix; a label-less host (e.g.
    * `localhost`) returns itself. */
  def registrableDomain(u: Column): Column = {
    val host = urlHost(u)
    val three = regexp_extract(host, "([^.]+\\." + TwoPartTld + ")$", 1)
    val two = regexp_extract(host, "([^.]+\\.[^.]+)$", 1)
    when(three =!= "", three).when(two =!= "", two).otherwise(host)
  }

  def registrableDomainSql(u: String): String = {
    val host = urlHostSql(u)
    val three = s"regexp_extract($host, '([^.]+\\.$TwoPartTld)$$', 1)"
    val two = s"regexp_extract($host, '([^.]+\\.[^.]+)$$', 1)"
    s"CASE WHEN $three != '' THEN $three WHEN $two != '' THEN $two ELSE $host END"
  }

  // ------------------------------------------------------- URL dedup
  /** Per-row canonical URL + registrable domain + keeper mark (the
    * min-id row per canonical URL survives — rerun-stable, engine-free).
    * One shuffle on the canonical key; everything else is projection. */
  def urlDedupMark(df: DataFrame, urlCol: String, idCol: String): DataFrame =
    df.withColumn("url_canon", urlCanonicalize(col(urlCol)))
      .withColumn("domain", registrableDomain(col(urlCol)))
      .withColumn("keeper", col(idCol) ===
        min(col(idCol)).over(Window.partitionBy(col("url_canon"))))
      .select(col(idCol), col("url_canon"), col("domain"), col("keeper"))

  /** Oracle for [[urlDedupMark]]: `fromSql` must yield (`idCol`, `urlCol`). */
  def urlDedupMarkSql(fromSql: String, urlCol: String, idCol: String): String = {
    val canon = urlCanonicalizeSql(urlCol)
    s"""WITH rows0 AS ($fromSql),
        marked AS (SELECT $idCol,
                          $canon AS url_canon,
                          ${registrableDomainSql(urlCol)} AS domain
                   FROM rows0)
        SELECT $idCol, url_canon, domain,
               $idCol = min($idCol) OVER (PARTITION BY url_canon) AS keeper
        FROM marked"""
  }
}
