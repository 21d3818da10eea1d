package graft.pipelines

import scala.util.Try

/** The Public Suffix List (publicsuffix.org) — the registry-controlled
  * suffixes under which users register domains — parsed at load from
  * the bundled snapshot `src/main/resources/graft/public_suffix_list
  * .dat` (the Mozilla-published list as shipped by the OS `publicsuffix`
  * package; MPL 2.0, attribution retained in the file header). A
  * last-two-label "registered domain" approximation merges every
  * `*.co.uk` site into one domain, so a per-domain cap would discard
  * nearly all UK content as one site; suffix-aware extraction is what
  * makes [[Web.capPerDomain]] usable on real crawl URLs.
  *
  * Rule forms per the PSL format, grouped by label count so the
  * matcher probes one literal set per (tier, form):
  *  - plain rules (`co.uk`, `s3.dualstack.ap-south-1.amazonaws.com`) —
  *    [[plain]], tiers 2..[[maxK]] (1-label plains are dropped: they
  *    decide exactly what the PSL default `*` rule already decides);
  *  - wildcard rules `*.parent` — [[wildParents]] holds the parent,
  *    keyed by PARENT label count (suffix = parent + 1 labels);
  *  - exception rules `!host` — [[exceptions]]; an exception match
  *    means the suffix is the rule minus its leftmost label.
  *
  * IDN entries are stored in BOTH the list's Unicode form and the
  * punycode (`xn--`) form via JDK `java.net.IDN`, so hosts arriving in
  * either encoding match. Everything is data for Catalyst `InSet`
  * probes / DuckDB `list_contains` — no UDF, no join, scan-side.
  */
object PublicSuffixes {

  private def labelCount(s: String): Int = s.count(_ == '.') + 1

  /** Unicode entries doubled with their punycode form (distinct; a
    * pure-ASCII entry maps to itself and is not duplicated).
    */
  private def withAscii(xs: Vector[String]): Vector[String] =
    (xs ++ xs.filter(_.exists(_ > 127))
      .flatMap(u => Try(java.net.IDN.toASCII(u)).toOption)).distinct

  private val (plainByK, wildByParentK, excByK) = {
    val in = getClass.getResourceAsStream("/graft/public_suffix_list.dat")
    require(in != null, "bundled graft/public_suffix_list.dat missing")
    val src = scala.io.Source.fromInputStream(in, "UTF-8")
    val rules =
      try src.getLines().map(_.trim)
        .filter(l => l.nonEmpty && !l.startsWith("//")).toVector
      finally src.close()
    val exc = rules.filter(_.startsWith("!")).map(_.substring(1))
    val wild = rules.filter(_.startsWith("*.")).map(_.substring(2))
    val plain = rules.filterNot(r => r.startsWith("!") || r.startsWith("*."))
      .filter(labelCount(_) >= 2) // 1-label plains ≡ the default * rule
    (withAscii(plain).groupBy(labelCount),
      withAscii(wild).groupBy(labelCount),
      withAscii(exc).groupBy(labelCount))
  }

  /** Plain public suffixes with `k` labels. */
  def plain(k: Int): Seq[String] = plainByK.getOrElse(k, Vector.empty)

  /** Parents of wildcard rules with `p` labels (suffix = p+1 labels). */
  def wildParents(p: Int): Seq[String] =
    wildByParentK.getOrElse(p, Vector.empty)

  /** Exception rules with `k` labels (match ⇒ suffix has k−1 labels). */
  def exceptions(k: Int): Seq[String] = excByK.getOrElse(k, Vector.empty)

  /** Longest suffix label count any rule can produce. */
  val maxK: Int =
    (plainByK.keySet ++ wildByParentK.keySet.map(_ + 1)).max

  /** Exception tiers, longest first (exceptions outrank every other
    * matching rule in the PSL algorithm).
    */
  val excTiers: Seq[Int] = excByK.keys.toSeq.sorted.reverse

  // hash-set views for the per-row matcher ([[registeredDomainOf]]) —
  // object state, so the ~9.6k strings live once per executor JVM
  // (loaded from the jar's resource) and NEVER ride a task closure
  private val plainSets = plainByK.map { case (k, v) => k -> v.toSet }
  private val wildSets = wildByParentK.map { case (k, v) => k -> v.toSet }
  private val excSets = excByK.map { case (k, v) => k -> v.toSet }

  private val ipv4 =
    java.util.regex.Pattern.compile("[0-9]+\\.[0-9]+\\.[0-9]+\\.[0-9]+")

  /** The registered (registrable) domain of a lowercased `host`, by the
    * PSL longest-match algorithm — the imperative twin of
    * [[Web.registeredDomainSql]]'s CASE cascade, consulted by the
    * `graft_registered_domain` native expression. Semantics (kept in
    * lock-step with the SQL mirror, which interpolates the SAME rule
    * tables): exception tiers longest-first decide k = tier−1; else the
    * longest tier with a plain-suffix or wildcard-parent hit decides
    * k = tier; else the PSL default `*` rule (k = 1). Result = last
    * min(n, k+1) labels. IPv4 literals and hosts that ARE a suffix (or
    * empty) return unchanged.
    */
  def registeredDomainOf(host: String): String = {
    if (ipv4.matcher(host).matches()) return host
    val labels = host.split("\\.", -1)
    val n = labels.length
    // suf(k) = last k labels joined — one backward pass, probed per tier
    // (sized to cover exception tiers too, should one ever exceed maxK)
    val top = math.min(n, math.max(maxK, excTiers.headOption.getOrElse(0)))
    val suf = new Array[String](top + 1)
    var i = 1
    while (i <= top) {
      suf(i) =
        if (i == 1) labels(n - 1) else labels(n - i) + "." + suf(i - 1)
      i += 1
    }
    var k = 0
    val excIt = excTiers.iterator
    while (k == 0 && excIt.hasNext) {
      val t = excIt.next()
      if (t <= top && excSets(t).contains(suf(t))) k = t - 1
    }
    if (k == 0) {
      var t = math.min(top, maxK)
      while (k == 0 && t >= 2) {
        if (plainSets.get(t).exists(_.contains(suf(t))) ||
            wildSets.get(t - 1).exists(_.contains(suf(t - 1)))) k = t
        t -= 1
      }
      if (k == 0) k = 1
    }
    val m = math.min(n, k + 1)
    if (m == n) host else suf(m)
  }

  /** Render a suffix set as a DuckDB list literal (entries are domain
    * labels — lowercase, no quotes/backslashes to escape).
    */
  def sqlList(xs: Seq[String]): String =
    xs.map(s => s"'$s'").mkString("[", ", ", "]")
}
