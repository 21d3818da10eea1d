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
    *  - the scheme's OWN default port dropped (`:80` for http, `:443`
    *    for https — an explicit `http://host:443` names a different
    *    resource and survives);
    *  - trailing slashes on the path dropped;
    *  - `utm_*` tracking parameters removed.
    * With `strict = false` (the default, and the oracle-mirrored mode)
    * remaining params keep their original order and percent-escapes are
    * untouched. With `strict = true`, percent-escapes of UNRESERVED
    * characters (RFC 3986 §2.3: ALPHA / DIGIT / `-._~`) are decoded and
    * the surviving params are sorted — `%7Euser` and `~user`, and any
    * two orderings of the same param set, canonicalize identically.
    * Reserved escapes (`%2F`, `%3D`, …) are left alone in both modes:
    * decoding them changes URL structure.
    * Inputs without a `scheme://` shape pass through lowercased.
    */
  def normalizeUrl(url: Column, strict: Boolean = false): Column = {
    val noFrag = regexp_replace(url, "#.*$", "")
    val scheme = lower(regexp_extract(noFrag,
      "^([A-Za-z][A-Za-z0-9+.-]*)://", 1))
    // userinfo ("user:pass@host") is dropped BEFORE the port strip —
    // crawl URLs carry it, and leaving it in would both leak
    // credentials into canonical keys and defeat host equality
    val host = lower(regexp_replace(
      regexp_extract(noFrag, "^[A-Za-z][A-Za-z0-9+.-]*://([^/?]+)", 1),
      "^[^/]*@", ""))
    val hostNoPort =
      when(scheme === "http", regexp_replace(host, ":80$", ""))
        .when(scheme === "https", regexp_replace(host, ":443$", ""))
        .otherwise(host)
    val path0 = regexp_extract(noFrag,
      "^[A-Za-z][A-Za-z0-9+.-]*://[^/?]+([^?]*)", 1)
    val path = {
      val p = regexp_replace(path0, "/+$", "")
      if (strict) pctDecodeUnreserved(p) else p
    }
    val query = regexp_extract(noFrag, "\\?(.*)$", 1)
    // strict mode decodes BEFORE the utm filter — "utm%5Fsource" must
    // be recognized and removed like "utm_source", or two encodings of
    // one URL would strict-canonicalize differently
    val rawParams = split(query, "&")
    val params =
      if (strict) transform(rawParams, pctDecodeUnreserved(_))
      else rawParams
    val kept0 = filter(params, p => !(p.rlike("^utm_") || p === ""))
    val kept = if (strict) array_sort(kept0) else kept0
    val queryNorm = array_join(kept, "&")
    when(scheme === "", lower(noFrag))
      .otherwise(concat(scheme, lit("://"), hostNoPort, path,
        when(queryNorm === "", lit(""))
          .otherwise(concat(lit("?"), queryNorm))))
  }

  /** Decode `%XX` escapes of RFC 3986 unreserved characters only
    * (ALPHA / DIGIT / `-._~`); every other escape — and every malformed
    * `%` — passes through byte-for-byte. Pure array/string expressions:
    * split on `%`, then each fragment's leading two chars decide
    * (valid-hex ∧ unreserved code point) → decode, else re-attach `%`.
    */
  private[pipelines] def pctDecodeUnreserved(s: Column): Column = {
    val parts = split(s, "%", -1)
    val head = element_at(parts, 1)
    val rest = slice(parts, lit(2), greatest(size(parts) - 1, lit(0)))
    val decoded = transform(rest, p => {
      val hex = substring(p, 1, 2)
      val code = conv(hex, 16, 10).cast("int")
      val unreserved =
        (code >= 65 && code <= 90) || (code >= 97 && code <= 122) ||
          (code >= 48 && code <= 57) || code.isin(45, 46, 95, 126)
      when(hex.rlike("^[0-9A-Fa-f]{2}$") && unreserved,
        concat(call_function("char", code), p.substr(lit(3), length(p))))
        .otherwise(concat(lit("%"), p))
    })
    concat(head, array_join(decoded, ""))
  }

  /** Lowercased host of a URL (port dropped). An input without a
    * `scheme://` prefix is treated as a bare host-and-path (`bbc.co.uk/
    * news` → `bbc.co.uk`) — a crawl frontier is full of scheme-less
    * links, and collapsing them all into one "" domain would let
    * [[capPerDomain]] silently discard them as a single site.
    */
  def urlHost(url: Column): Column = {
    val withScheme =
      regexp_extract(url, "^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]+)", 1)
    val bare = regexp_extract(url, "^([^/?#]+)", 1)
    regexp_replace(
      regexp_replace(
        lower(when(withScheme =!= "", withScheme).otherwise(bare)),
        "^[^/]*@", ""), // userinfo (to the LAST @)
      ":[0-9]+$", "")
  }

  /** Registered (registrable) domain per the public-suffix algorithm:
    * one label more than the longest matching public suffix, over the
    * full bundled [[PublicSuffixes]] list — `news.bbc.co.uk` →
    * `bbc.co.uk`, `a.github.io` → `a.github.io`, while
    * `www.news.example.com` → `example.com`. Tiers are data-driven up
    * to [[PublicSuffixes.maxK]] labels (the real list reaches 5 —
    * `x.s3.dualstack.ap-south-1.amazonaws.com` keeps all six labels);
    * exception rules outrank everything per the PSL algorithm
    * (`a.b.kawasaki.jp` → `b.kawasaki.jp` by wildcard, but
    * `a.city.kawasaki.jp` → `city.kawasaki.jp` by `!city.kawasaki.jp`).
    * Unknown TLDs use the PSL default `*` rule (last label is the
    * suffix); a host that IS a public suffix (or empty) returns
    * unchanged.
    *
    * Executed by the `graft_registered_domain` native expression
    * ([[graft.expressions.Domains.RegisteredDomain]]): the suffix
    * tables are JVM-singleton state loaded from the jar's bundled
    * resource, so the task closure carries one tree node — the earlier
    * all-literal `InSet` cascade serialized the ~9.6k suffixes into
    * every task binary (~1 MB) of every domain-touching stage, which a
    * 100k-task stage pays in scheduler and network time. Scan-side and
    * driver-free either way; the oracle mirror
    * [[registeredDomainSql]] interpolates the same rule tables.
    */
  def registeredDomain(url: Column): Column = {
    graft.expressions.GraftFunctions.register(
      org.apache.spark.sql.SparkSession.active)
    call_function("graft_registered_domain", urlHost(url))
  }

  /** The [[registeredDomain]] suffix match rendered as DuckDB SQL over
    * host expression `host`, against the SAME [[PublicSuffixes]] tables
    * — interpolated into oracle twins so Spark and the oracle share one
    * suffix snapshot by construction. Each tier's literal list appears
    * exactly once (the suffix label count k is computed in a single
    * CASE and consumed by one slice).
    */
  def registeredDomainSql(host: String): String = {
    import PublicSuffixes.{sqlList => L}
    def lastK(k: Int): String =
      s"array_to_string(string_split($host, '.')[-$k:], '.')"
    val n = s"len(string_split($host, '.'))"
    val excArms = PublicSuffixes.excTiers.map { t =>
      s"""WHEN $n >= $t AND list_contains(
         |    ${L(PublicSuffixes.exceptions(t))}, ${lastK(t)})
         |    THEN ${t - 1}""".stripMargin
    }
    val sufArms = (PublicSuffixes.maxK to 2 by -1).flatMap { t =>
      val ps = PublicSuffixes.plain(t)
      val ws = PublicSuffixes.wildParents(t - 1)
      val hits = Seq(
        if (ps.nonEmpty) Some(s"list_contains(${L(ps)}, ${lastK(t)})")
        else None,
        if (ws.nonEmpty)
          Some(s"list_contains(${L(ws)}, ${lastK(t - 1)})")
        else None).flatten
      if (hits.isEmpty) None
      else Some(
        s"""WHEN $n >= $t AND (${hits.mkString("\n    OR ")})
           |    THEN $t""".stripMargin)
    }
    val kCase =
      s"""CASE
         |  ${(excArms ++ sufArms).mkString("\n  ")}
         |  ELSE 1 END""".stripMargin
    s"""CASE
       |  WHEN regexp_matches($host,
       |    '^[0-9]+\\.[0-9]+\\.[0-9]+\\.[0-9]+$$') THEN $host
       |  ELSE array_to_string(string_split($host, '.')[
       |    (- least($n, ($kCase) + 1)):], '.')
       |  END""".stripMargin
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

  /** CCNet-style per-domain boilerplate line removal: a line is
    * boilerplate when it appears in ≥ `minDocs` documents AND in at
    * least `maxFrac` of its domain's documents (navigation bars, cookie
    * banners, copyright footers — the lines a template stamps onto
    * every page of a site). Every occurrence of a boilerplate line is
    * dropped; documents keep their remaining lines in order (a document
    * that was ALL boilerplate survives as an empty string).
    *
    * Plan shape (the scalable formulation): explode lines once, count
    * each line ONCE PER DOCUMENT (`dropDuplicates`) into per-(domain,
    * line) document frequencies, join the per-domain doc totals on
    * `_domain` — deliberately WITHOUT a `broadcast()` hint: the totals
    * frame is one row per domain, which on a real crawl is 10⁷–10⁸
    * rows, far past broadcast size. The join key is already `docFreq`'s
    * shuffle key so the sort-merge/shuffle-hash join costs no extra
    * shuffle of the big side, and AQE still converts to broadcast at
    * runtime when the domain count is genuinely small. Then remove via
    * LEFT ANTI join on (domain, line) and reassemble with an
    * order-preserving `collect_list(struct(pos, line))` + `array_sort`
    * per document. Both shuffles key on (domain, line) / doc id — no
    * per-domain line dictionary ever materializes on the driver or in
    * one task, so a mega-domain costs parallel partitions, not memory.
    *
    * Output: the input row (id, domain) plus `clean_text`.
    */
  def removeBoilerplateLines(df: DataFrame, id: Column, domain: Column,
                             text: Column, minDocs: Int = 5,
                             maxFrac: Double = 0.5): DataFrame = {
    val base = df.select(id.as("_id"), domain.as("_domain"), text.as("_t"))
    val lines = base
      .select(col("_id"), col("_domain"),
        posexplode(split(col("_t"), "\n", -1)).as(Seq("_pos", "_line")))
    val docFreq = lines
      .dropDuplicates("_id", "_domain", "_line")
      .groupBy("_domain", "_line").agg(count(lit(1)).as("_n"))
    val domainDocs = base.groupBy("_domain")
      .agg(count(lit(1)).as("_docs"))
    val boiler = docFreq
      .join(domainDocs, "_domain")
      .filter(col("_n") >= minDocs &&
        col("_n").cast("double") / col("_docs").cast("double") >= maxFrac)
      .select("_domain", "_line")
    // group AND re-join on (id, domain): ids are only assumed unique
    // WITHIN a domain (per-shard/per-site ids are common), so grouping
    // by id alone could interleave two sites' documents
    val kept = lines.join(boiler, Seq("_domain", "_line"), "left_anti")
      .groupBy("_id", "_domain")
      .agg(array_join(
        transform(array_sort(collect_list(struct(col("_pos"), col("_line")))),
          x => x.getField("_line")), "\n").as("clean_text"))
    base.select(col("_id"), col("_domain"))
      .join(kept, Seq("_id", "_domain"), "left")
      .select(col("_id").as("doc_id"), col("_domain").as("domain"),
        coalesce(col("clean_text"), lit("")).as("clean_text"))
  }

  /** Parse raw robots.txt content into the `(domain, agent, prefix,
    * allow)` rules relation [[robotsAllowed]] consumes — the ingest
    * half of the robots story (RFC 9309 §2.1/§2.2 line grammar):
    * comments strip at `#`, directive names match case-insensitively,
    * CONSECUTIVE `User-agent` lines form one group whose following
    * `Allow`/`Disallow` rules apply to every named agent, the next
    * `User-agent` after a rule starts a new group, and an empty-value
    * `Disallow:` contributes no rule (it means "no restriction", not
    * "disallow everything"). Agent names normalize to lowercase
    * (matching is case-insensitive); rule values keep their case
    * (paths are case-sensitive).
    *
    * Scale shape: one `split`+`posexplode` per file, two
    * domain-partitioned windows (the group-start lag and the running
    * group id), one group-keyed self-join of agents × rules — robots
    * files are KB-sized, so per-file work is trivial and the operator
    * streams over any number of domains.
    */
  def parseRobotsTxt(df: DataFrame, domain: Column,
                     txt: Column): DataFrame =
    robotsLines(df, domain, txt)
      .filter(col("_kind") === "ua").select(col("_d"), col("_grp"),
        lower(col("_val")).as("agent"))
      .join(robotsLines(df, domain, txt)
          .filter(col("_kind").isin("allow", "disallow") &&
            col("_val") =!= "")
          .select(col("_d"), col("_grp"), col("_val").as("prefix"),
            (col("_kind") === "allow").as("allow")),
        Seq("_d", "_grp"))
      .select(col("_d").as("domain"), col("agent"), col("prefix"),
        col("allow"))

  /** Per-agent crawl delay from robots.txt (`Crawl-delay` is
    * non-standard but ubiquitous): the MINIMUM delay named for the
    * agent across its groups — the conservative read a polite crawler
    * takes. Unparsable values are ignored.
    */
  def robotsCrawlDelays(df: DataFrame, domain: Column,
                        txt: Column): DataFrame =
    robotsLines(df, domain, txt)
      .filter(col("_kind") === "ua").select(col("_d"), col("_grp"),
        lower(col("_val")).as("agent"))
      .join(robotsLines(df, domain, txt)
          .filter(col("_kind") === "delay" &&
            col("_val").cast("double").isNotNull)
          .select(col("_d"), col("_grp"),
            col("_val").cast("double").as("_delay")),
        Seq("_d", "_grp"))
      .groupBy(col("_d").as("domain"), col("agent"))
      .agg(min(col("_delay")).as("crawl_delay_sec"))

  /** Parse sitemap XML into crawl-frontier rows — the companion ingest
    * to [[parseRobotsTxt]] (sitemaps.org protocol): `<urlset>` entries
    * yield kind `url` with their `<loc>` and optional `<lastmod>`;
    * `<sitemapindex>` entries yield kind `sitemap` (the fetcher
    * recurses on those). Pure chained regex column expressions —
    * non-greedy `(?s)` block extraction then per-block field pulls, so
    * the parse is scan-side with no shuffle and mirrors term-for-term
    * in the oracle (RE2-safe: no backreferences). Tolerates
    * whitespace inside tags; entries without a `<loc>` are dropped
    * (nothing to fetch).
    */
  def parseSitemap(df: DataFrame, domain: Column, xml: Column): DataFrame = {
    def blocks(tag: String) =
      regexp_extract_all(xml, lit(s"(?s)<$tag>.*?</$tag>"), lit(0))
    def entry(kind: String, tag: String) =
      df.select(domain.as("domain"),
          explode(blocks(tag)).as("_b"))
        .select(col("domain"), lit(kind).as("kind"),
          trim(regexp_extract(col("_b"), "(?s)<loc>\\s*(.*?)\\s*</loc>", 1))
            .as("loc"),
          when(col("_b").rlike("(?s)<lastmod>"),
            trim(regexp_extract(col("_b"),
              "(?s)<lastmod>\\s*(.*?)\\s*</lastmod>", 1)))
            .otherwise(lit(null)).as("lastmod"))
        .filter(col("loc") =!= "")
    entry("url", "url").unionByName(entry("sitemap", "sitemap"))
  }

  /** Shared robots.txt line classifier: comment-stripped non-empty
    * directive lines with their running user-agent GROUP id (a `ua`
    * line starts a new group unless the previous directive line was
    * also `ua` — RFC 9309's consecutive-agent-lines rule).
    */
  private def robotsLines(df: DataFrame, domain: Column,
                          txt: Column): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("_d").orderBy("_ln")
    df.select(domain.as("_d"),
        posexplode(split(txt, "\n")).as(Seq("_ln", "_raw")))
      .withColumn("_line", trim(regexp_replace(col("_raw"), "#.*$", "")))
      .filter(col("_line") =!= "")
      .withColumn("_kind",
        when(lower(col("_line")).rlike("^user-agent\\s*:"), "ua")
          .when(lower(col("_line")).rlike("^allow\\s*:"), "allow")
          .when(lower(col("_line")).rlike("^disallow\\s*:"), "disallow")
          .when(lower(col("_line")).rlike("^crawl-delay\\s*:"), "delay")
          .otherwise("other"))
      .filter(col("_kind") =!= "other")
      .withColumn("_val",
        trim(expr("substring(_line, instr(_line, ':') + 1)")))
      .withColumn("_newgrp",
        (col("_kind") === "ua" &&
          coalesce(lag(col("_kind"), 1).over(w) =!= "ua", lit(true)))
          .cast("int"))
      .withColumn("_grp", sum(col("_newgrp")).over(w))
  }

  /** RFC 9309 percent-decoding for robots matching: every `%XX` escape
    * decodes to its octet EXCEPT `%2F` (an encoded slash is distinct
    * from a path separator — RFC 9309 §2.2.2), which is preserved,
    * case-normalized to `%2F`; a stray `%` stays literal. Built from
    * tokenize → hex → unhex → decode so the identical construction
    * runs in the SQL oracle (which has no URL decoder); decoded bytes
    * must form valid UTF-8 — both engines agree on the valid case,
    * and robots paths in the wild are ASCII-dominated.
    */
  def percentDecode(s: Column): Column = {
    val toks = regexp_extract_all(s, lit("%[0-9A-Fa-f]{2}|%|[^%]+"),
      lit(0))
    val hexed = transform(toks, t =>
      when(upper(t) === "%2F", lit("253246")) // hex("%2F"), kept encoded
        .when(t.rlike("^%[0-9A-Fa-f]{2}$"), upper(substring(t, 2, 2)))
        .otherwise(hex(t)))
    decode(unhex(concat_ws("", hexed)), "UTF-8")
  }

  /** Anchored regex equivalent of an RFC 9309 path pattern: `*`
    * matches any character run, a TRAILING `$` anchors at end-of-path,
    * every literal segment is percent-decoded then regex-escaped. The
    * specials are read from the RAW pattern (so an encoded `%24` stays
    * a literal dollar) and the output uses only `^`, `$`, `.*` and
    * escaped literals — a fragment Java regex and RE2 interpret
    * identically, so the oracle matches byte-for-byte.
    */
  def robotsPatternRegex(pattern: Column): Column = {
    val anchored = pattern.endsWith("$")
    val body = when(anchored,
      substr(pattern, lit(1), length(pattern) - 1)).otherwise(pattern)
    val esc = transform(split(body, "\\*", -1), s0 =>
      regexp_replace(percentDecode(s0),
        "([\\.\\[\\]\\{\\}\\(\\)\\+\\?\\^\\$\\|\\\\])", "\\\\$1"))
    concat(lit("^"), array_join(esc, ".*"),
      when(anchored, lit("$")).otherwise(lit("")))
  }

  /** Robots-exclusion evaluation, RFC 9309 rule matching: patterns may
    * use `*` (any character run) and a trailing `$` (end anchor), both
    * sides are percent-decoded (`%2F` preserved) before comparison,
    * and for each (domain, path) the most specific match — most octets
    * in the decoded pattern — decides; on an exact length tie the
    * LEAST restrictive (allow) rule wins; a path matching no rule is
    * allowed. The crawl-frontier filter that runs before any fetch.
    *
    * Scale shape: one key join on domain (rules tables are small per
    * domain — AQE broadcasts a genuinely small rule set, otherwise the
    * shuffle is keyed and the per-row fan-out is bounded by
    * rules-per-domain), one doc-partitioned window for the argmax,
    * one left join back for the no-rule default. Pattern→regex
    * compilation is a scan-side column expression on the (small) rules
    * side of the join. No driver state.
    *
    * `rules` columns: `(domain, prefix, allow)`. Returns the input
    * keys plus `allowed`.
    */
  def robotsAllowed(df: DataFrame, id: Column, domain: Column,
                    path: Column, rules: DataFrame): DataFrame = {
    val base = df.select(id.as("_id"), domain.as("_domain"),
      path.as("_path"))
    val r = rules.select(col("domain").as("_domain"),
      robotsPatternRegex(col("prefix")).as("_regex"),
      octet_length(percentDecode(col("prefix"))).as("_plen"),
      col("allow").as("_allow"))
    val verdict = base
      .withColumn("_pdec", percentDecode(col("_path")))
      .join(r, "_domain")
      .filter(regexp_like(col("_pdec"), col("_regex")))
      .withColumn("_rk", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy("_id")
          .orderBy(col("_plen").desc, col("_allow").desc)))
      .filter(col("_rk") === 1)
      .select(col("_id"), col("_allow"))
    base.join(verdict, Seq("_id"), "left")
      .select(col("_id").as("doc_id"), col("_domain").as("domain"),
        col("_path").as("path"),
        coalesce(col("_allow"), lit(true)).as("allowed"))
  }

  /** HTML → text extraction — step one of any web-corpus pipeline
    * (what trafilatura/jusText do before any quality gate can run),
    * reduced to the deterministic core: drop `<script>`/`<style>`
    * payloads and comments wholesale, strip remaining tags, decode the
    * common entities, collapse whitespace. Pure chained
    * `regexp_replace`/`replace` column expressions — codegen'd,
    * scan-side, no shuffle, mirrorable term-for-term in the oracle.
    *
    * RE2-parity constraints (the oracle engine has no backreferences):
    * script and style blocks are matched by SEPARATE non-greedy
    * patterns rather than one `<(script|style)>.*?</\1>`; whitespace
    * collapses via the `[\s\x0B]` class both engines agree on.
    * Entity decoding is the literal five XML entities plus `&nbsp;`
    * and decimal `&#NN;` is left as-is — a full HTML5 entity table is
    * data, not logic, and belongs in a resource like the PSL if ever
    * needed.
    */
  def htmlToText(html: Column): Column = {
    val noScript = regexp_replace(html,
      "(?is)<script[^>]*>.*?</script>", " ")
    val noStyle = regexp_replace(noScript,
      "(?is)<style[^>]*>.*?</style>", " ")
    val noComment = regexp_replace(noStyle, "(?s)<!--.*?-->", " ")
    val noTags = regexp_replace(noComment, "<[^>]+>", " ")
    val decoded = Seq("&lt;" -> "<", "&gt;" -> ">", "&quot;" -> "\"",
      "&#39;" -> "'", "&nbsp;" -> " ", "&amp;" -> "&")
      .foldLeft(noTags) { case (c, (e, r)) => replace(c, lit(e), lit(r)) }
    trim(regexp_replace(decoded, "[\\s\\x0B]+", " "))
  }
}
