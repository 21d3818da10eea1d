package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.pipelines.Web

/** URL canonicalization + per-domain capping. */
class WebSpec extends AnyFunSuite {
  import TestSpark.spark
  import spark.implicits._

  test("normalizeUrl collapses trivially-different links") {
    val urls = Seq(
      "HTTPS://WWW.Example.COM:443/a/b/",
      "https://www.example.com/a/b",
      "https://www.example.com/a/b#frag",
      "https://www.example.com/a/b?utm_source=x&utm_medium=y",
      "https://www.example.com/a/b?ref=1&utm_source=x",
      "http://example.com:80/",
      "not a url AT ALL")
    val got = urls.toDF("url")
      .select(Web.normalizeUrl($"url").as("n")).as[String].collect()
    assert(got(0) === "https://www.example.com/a/b")
    assert(got(1) === "https://www.example.com/a/b")
    assert(got(2) === "https://www.example.com/a/b")
    assert(got(3) === "https://www.example.com/a/b")
    assert(got(4) === "https://www.example.com/a/b?ref=1")
    assert(got(5) === "http://example.com")
    assert(got(6) === "not a url at all")
  }

  test("registeredDomain takes the last two host labels") {
    val got = Seq(
      "https://www.news.example.com/x",
      "https://example.com/y",
      "https://localhost/z")
      .toDF("url")
      .select(Web.registeredDomain($"url").as("d")).as[String].collect()
    assert(got.toSeq === Seq("example.com", "example.com", "localhost"))
  }

  test("capPerDomain keeps the first N per domain, deterministically") {
    val df = (1L to 10L).map(i => (i, s"d${i % 2}.com")).toDF("id", "domain")
    val got = Web.capPerDomain(df, $"domain", Seq($"id".asc), maxDocs = 3)
      .orderBy("domain", "id").select("id", "domain", "domain_rank")
      .collect()
    assert(got.length === 6)
    assert(got.map(_.getLong(0)).toSeq === Seq(2L, 4L, 6L, 1L, 3L, 5L))
    assert(got.map(_.getInt(2)).max === 3)
  }
}
