package graft.pipelines

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** URL / domain curation operators for web-scale corpora — the steps a
  * crawl pipeline runs before content-level dedup: canonicalize URLs
  * (so trivially-different links stop looking like distinct documents),
  * extract the registered domain, and cap documents per domain (one
  * spammy site must not dominate a training mixture).
  *
  * Everything is regex/array column expressions (no UDFs, scan-side, no
  * shuffle except the per-domain cap's partitioned window), using only
  * portable regex constructs so Java's engine and the oracle's RE2
  * match identical spans.
  */
object Web {

  /** Canonicalized URL:
    *  - fragment dropped;
    *  - scheme and host lowercased;
    *  - default ports (:80, :443) dropped;
    *  - trailing slashes on the path dropped;
    *  - `utm_*` tracking parameters removed (other params keep their
    *    original order — full param sorting is a policy choice left to
    *    the caller).
    * Inputs without a `scheme://` shape pass through lowercased.
    */
  def normalizeUrl(url: Column): Column = {
    val noFrag = regexp_replace(url, "#.*$", "")
    val scheme = lower(regexp_extract(noFrag,
      "^([A-Za-z][A-Za-z0-9+.-]*)://", 1))
    val host = lower(regexp_extract(noFrag,
      "^[A-Za-z][A-Za-z0-9+.-]*://([^/?]+)", 1))
    val hostNoPort = regexp_replace(host, ":(80|443)$", "")
    val path = regexp_extract(noFrag,
      "^[A-Za-z][A-Za-z0-9+.-]*://[^/?]+([^?]*)", 1)
    val pathNorm = regexp_replace(path, "/+$", "")
    val query = regexp_extract(noFrag, "\\?(.*)$", 1)
    val kept = filter(split(query, "&"),
      p => !(p.rlike("^utm_") || p === ""))
    val queryNorm = array_join(kept, "&")
    when(scheme === "", lower(noFrag))
      .otherwise(concat(scheme, lit("://"), hostNoPort, pathNorm,
        when(queryNorm === "", lit(""))
          .otherwise(concat(lit("?"), queryNorm))))
  }

  /** Lowercased host of a URL (port dropped). */
  def urlHost(url: Column): Column =
    regexp_replace(
      lower(regexp_extract(url, "^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]+)", 1)),
      ":[0-9]+$", "")

  /** Registered domain approximation: the last two dot-labels of the
    * host (`www.news.example.com` → `example.com`). Real deployments
    * plug in the public-suffix list; the operator shape (extract → group
    * → cap) is the scalable part.
    */
  def registeredDomain(url: Column): Column = {
    val h = urlHost(url)
    when(h.rlike("[^.]+\\.[^.]+$"),
      regexp_extract(h, "([^.]+\\.[^.]+)$", 1)).otherwise(h)
  }

  /** Keep at most `maxDocs` rows per domain, by `order` (ties must be
    * broken by a unique column for determinism). The window partitions
    * by domain, so per-domain state is partition-local — no global sort,
    * and hot domains are exactly the rows the cap discards.
    */
  def capPerDomain(df: DataFrame, domain: Column, order: Seq[Column],
                   maxDocs: Int): DataFrame =
    df.withColumn("domain_rank",
        row_number().over(Window.partitionBy(domain).orderBy(order: _*)))
      .filter(col("domain_rank") <= maxDocs)
}
