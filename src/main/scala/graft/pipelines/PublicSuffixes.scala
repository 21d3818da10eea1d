package graft.pipelines

/** Trimmed static snapshot of the Public Suffix List (publicsuffix.org)
  * — the registry-controlled suffixes under which users register
  * domains. A last-two-label "registered domain" approximation merges
  * every `*.co.uk` site into one domain, so a per-domain cap would
  * discard nearly all UK content as one site; suffix-aware extraction
  * is what makes [[Web.capPerDomain]] usable on real crawl URLs.
  *
  * The snapshot covers the common ccTLD second-level registries plus
  * the highest-traffic private-registry suffixes (github.io,
  * blogspot.com, …). It is deliberately a code literal, not a fetched
  * file: the full list is a data-refresh concern, while the OPERATOR —
  * longest-suffix match via broadcast-able literal sets, no UDF — is
  * the part that has to scale. Unknown TLDs fall back to the PSL's
  * default `*` rule (the last label is the suffix).
  *
  * Rule forms mirrored from the PSL format:
  *  - plain rules, grouped by label count ([[plain2]], [[plain3]]);
  *  - wildcard rules `*.tld` ([[wildcardParents]] holds the parent);
  *  - exception rules `!host` ([[exceptions]]).
  */
object PublicSuffixes {

  /** Two-label public suffixes (`co.uk` ⇒ `bbc.co.uk` is registrable). */
  val plain2: Seq[String] = Seq(
    // ICANN ccTLD second-level registries
    "co.uk", "org.uk", "me.uk", "ac.uk", "gov.uk", "net.uk", "sch.uk",
    "nhs.uk", "police.uk", "plc.uk", "ltd.uk",
    "com.au", "net.au", "org.au", "edu.au", "gov.au", "asn.au", "id.au",
    "co.nz", "net.nz", "org.nz", "govt.nz", "ac.nz", "school.nz",
    "geek.nz", "gen.nz", "kiwi.nz", "maori.nz",
    "co.za", "org.za", "net.za", "gov.za", "ac.za", "web.za",
    "co.jp", "ne.jp", "or.jp", "go.jp", "ac.jp", "ad.jp", "ed.jp",
    "gr.jp", "lg.jp",
    "co.kr", "ne.kr", "or.kr", "go.kr", "ac.kr", "re.kr", "pe.kr",
    "mil.kr", "hs.kr", "ms.kr", "es.kr", "sc.kr",
    "com.cn", "net.cn", "org.cn", "gov.cn", "edu.cn", "ac.cn", "mil.cn",
    "com.tw", "net.tw", "org.tw", "edu.tw", "gov.tw", "idv.tw",
    "com.hk", "net.hk", "org.hk", "edu.hk", "gov.hk", "idv.hk",
    "com.sg", "net.sg", "org.sg", "edu.sg", "gov.sg", "per.sg",
    "co.in", "net.in", "org.in", "firm.in", "gen.in", "ind.in", "ac.in",
    "edu.in", "res.in", "gov.in", "mil.in", "nic.in",
    "com.br", "net.br", "org.br", "gov.br", "edu.br", "mil.br",
    "art.br", "blog.br", "eco.br", "emp.br", "eng.br",
    "com.mx", "net.mx", "org.mx", "edu.mx", "gob.mx",
    "com.ar", "net.ar", "org.ar", "edu.ar", "gob.ar", "int.ar",
    "mil.ar", "tur.ar",
    "com.co", "net.co", "org.co", "edu.co", "gov.co", "mil.co", "nom.co",
    "com.pe", "net.pe", "org.pe", "edu.pe", "gob.pe", "mil.pe", "nom.pe",
    "com.tr", "net.tr", "org.tr", "edu.tr", "gov.tr", "mil.tr",
    "k12.tr", "av.tr", "bel.tr", "biz.tr", "dr.tr", "gen.tr", "info.tr",
    "name.tr", "tel.tr", "web.tr",
    "co.il", "net.il", "org.il", "ac.il", "gov.il", "idf.il", "k12.il",
    "muni.il",
    "com.ru", "net.ru", "org.ru", "msk.ru", "spb.ru",
    "com.ua", "net.ua", "org.ua", "edu.ua", "gov.ua", "in.ua", "kiev.ua",
    "com.pl", "net.pl", "org.pl", "edu.pl", "gov.pl", "info.pl",
    "waw.pl", "biz.pl",
    "co.th", "net.th", "or.th", "ac.th", "go.th", "in.th", "mi.th",
    "co.id", "net.id", "or.id", "ac.id", "go.id", "web.id", "sch.id",
    "my.id", "biz.id",
    "com.my", "net.my", "org.my", "edu.my", "gov.my", "mil.my", "name.my",
    "com.ph", "net.ph", "org.ph", "edu.ph", "gov.ph", "mil.ph", "ngo.ph",
    "com.vn", "net.vn", "org.vn", "edu.vn", "gov.vn", "int.vn", "ac.vn",
    "biz.vn", "info.vn", "name.vn", "pro.vn", "health.vn",
    "com.sa", "net.sa", "org.sa", "edu.sa", "gov.sa", "med.sa", "pub.sa",
    "sch.sa",
    "co.ae", "net.ae", "org.ae", "ac.ae", "gov.ae", "mil.ae", "sch.ae",
    "com.eg", "net.eg", "org.eg", "edu.eg", "gov.eg", "eun.eg", "mil.eg",
    "name.eg", "sci.eg",
    "com.ng", "net.ng", "org.ng", "edu.ng", "gov.ng", "name.ng",
    "sch.ng", "mobi.ng", "mil.ng", "i.ng",
    "co.ke", "or.ke", "ne.ke", "go.ke", "ac.ke", "sc.ke", "me.ke",
    "mobi.ke", "info.ke",
    "com.gh", "edu.gh", "gov.gh", "org.gh", "mil.gh",
    "com.es", "nom.es", "org.es", "gob.es", "edu.es",
    "asso.fr", "com.fr", "gouv.fr", "nom.fr", "prd.fr", "tm.fr",
    "com.pt", "edu.pt", "gov.pt", "int.pt", "net.pt", "nome.pt",
    "org.pt", "publ.pt",
    "com.gr", "edu.gr", "net.gr", "org.gr", "gov.gr",
    "com.ro", "org.ro", "tm.ro", "nt.ro", "nom.ro", "info.ro", "rec.ro",
    "arts.ro", "firm.ro", "store.ro", "www.ro",
    "co.hu", "info.hu", "org.hu", "priv.hu", "sport.hu", "tm.hu",
    "ac.at", "co.at", "gv.at", "or.at",
    "co.ve", "com.ve", "net.ve", "org.ve", "edu.ve", "gob.ve",
    "gob.cl", "gov.cl", "mil.cl",
    "com.uy", "edu.uy", "gub.uy", "mil.uy", "net.uy", "org.uy",
    "com.bo", "edu.bo", "gob.bo", "int.bo", "org.bo", "net.bo",
    "com.ec", "info.ec", "net.ec", "fin.ec", "med.ec", "pro.ec",
    "org.ec", "edu.ec", "gob.ec", "gov.ec", "mil.ec",
    "com.py", "coop.py", "edu.py", "gov.py", "mil.py", "net.py", "org.py",
    "com.do", "edu.do", "gob.do", "gov.do", "mil.do", "net.do", "org.do",
    "com.gt", "edu.gt", "gob.gt", "ind.gt", "mil.gt", "net.gt", "org.gt",
    "com.pk", "net.pk", "edu.pk", "org.pk", "fam.pk", "biz.pk", "web.pk",
    "gov.pk", "gob.pk", "gok.pk", "gon.pk", "gop.pk", "gos.pk",
    "com.bd", "edu.bd", "ac.bd", "gov.bd", "net.bd", "org.bd", "mil.bd",
    "com.lk", "org.lk", "edu.lk", "ngo.lk", "soc.lk", "web.lk",
    "ltd.lk", "assn.lk", "grp.lk", "hotel.lk", "ac.lk", "gov.lk",
    "sch.lk", "net.lk", "int.lk",
    "com.np", "edu.np", "gov.np", "mil.np", "net.np", "org.np",
    "com.kh", "edu.kh", "gov.kh", "mil.kh", "net.kh", "org.kh", "per.kh",
    "com.mm", "net.mm", "org.mm", "edu.mm", "gov.mm", "mil.mm",
    // private-registry suffixes (operators hosting user subdomains)
    "github.io", "githubusercontent.com", "gitlab.io", "bitbucket.io",
    "blogspot.com", "wordpress.com", "herokuapp.com", "appspot.com",
    "firebaseapp.com", "web.app", "netlify.app", "vercel.app", "now.sh",
    "pages.dev", "workers.dev", "azurewebsites.net", "cloudfront.net",
    "fly.dev", "onrender.com", "glitch.me", "repl.co", "surge.sh",
    "neocities.org", "readthedocs.io", "wixsite.com", "myshopify.com",
    "ngrok.io", "deno.dev", "pythonanywhere.com", "hf.space")

  /** Three-label public suffixes. */
  val plain3: Seq[String] = Seq(
    "blogspot.co.uk", "blogspot.com.au", "blogspot.co.nz",
    "blogspot.co.za", "blogspot.com.br", "blogspot.com.ar",
    "blogspot.co.il", "blogspot.com.tr", "s3.amazonaws.com")

  /** Parents of wildcard rules `*.tld`: every two-label host under these
    * TLDs is itself a public suffix (`foo.ck` ⇒ `bar.foo.ck` is the
    * registrable domain).
    */
  val wildcardParents: Seq[String] =
    Seq("bd", "ck", "er", "fj", "fk", "kh", "mm", "np", "pg")

  /** Exception rules `!host`: carved OUT of a wildcard (`!www.ck` ⇒
    * `www.ck` is a registrable domain, not a suffix).
    */
  val exceptions: Seq[String] = Seq("www.ck")

  /** Render a suffix set as a DuckDB list literal, so the oracle SQL
    * twin matches against the identical table.
    */
  def sqlList(xs: Seq[String]): String =
    xs.map(s => s"'$s'").mkString("[", ", ", "]")
}
