package graft

import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite
import graft.ops.Url

/** URL canonicalization convention — each aliasing source folds, and
  * already-canonical URLs pass through unchanged.
  */
class UrlSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def canon(u: String): String =
    Seq(u).toDF("u").select(Url.canonicalizeUrl(col("u"))).head().getString(0)

  test("scheme and host fold case; path case is preserved") {
    assert(canon("HTTPS://Example.COM/Docs/A") === "https://example.com/Docs/A")
  }

  test("www. prefix and default ports strip") {
    assert(canon("https://www.example.com/a") === "https://example.com/a")
    assert(canon("https://example.com:443/a") === "https://example.com/a")
    assert(canon("http://example.com:80/a") === "http://example.com/a")
    // non-default port survives
    assert(canon("http://example.com:8080/a") === "http://example.com:8080/a")
    // www embedded mid-host survives
    assert(canon("https://nowww.example.com/a") === "https://nowww.example.com/a")
  }

  test("fragments drop, trailing slash runs strip") {
    assert(canon("https://example.com/a#sec-2") === "https://example.com/a")
    assert(canon("https://example.com/a///") === "https://example.com/a")
    assert(canon("https://example.com/") === "https://example.com")
  }

  test("query params: utm_ and empties drop, the rest sort; bare ? drops") {
    assert(canon("https://example.com/a?b=2&a=1") === "https://example.com/a?a=1&b=2")
    assert(canon("https://example.com/a?utm_source=x&a=1") === "https://example.com/a?a=1")
    assert(canon("https://example.com/a?utm_source=x") === "https://example.com/a")
    assert(canon("https://example.com/a?") === "https://example.com/a")
    // utm must be a PREFIX match on the param, not a LIKE wildcard
    assert(canon("https://example.com/a?utmx=1") === "https://example.com/a?utmx=1")
  }

  test("blocklist drops hosts and subdomains on dot boundaries only") {
    val df = Seq(
      (1L, "https://WWW.Bad.example/x"),
      (2L, "https://sub.bad.example/x"),
      (3L, "https://notbad.example/x"),
      (4L, "https://good.example:443/x")
    ).toDF("id", "url")
    val kept = Url.filterBlockedHosts(df, "url", Seq("bad.example"))
      .select("id").collect().map(_.getLong(0)).toSet
    assert(kept === Set(3L, 4L)) // www.+case and subdomain blocked; prefix-similar host survives
    assert(Seq(Tuple1("https://WWW.A.B:443/p?q=1")).toDF("url")
      .select(Url.hostOf(col("url"))).head().getString(0) === "a.b")
  }

  test("aliased fetches collapse to one key, distinct resources do not") {
    val df = Seq(
      (1L, "https://WWW.Example.com/a?b=2&a=1"),
      (2L, "https://example.com:443/a/?a=1&b=2&utm_campaign=z"),
      (3L, "https://example.com/a?a=1&b=2#frag"),
      (4L, "https://example.com/b?a=1&b=2")
    ).toDF("id", "url")
    val out = Url.dedupByUrl(df, "id", "url")
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(out === Map(
      "https://example.com/a?a=1&b=2" -> ((3L, 1L)),
      "https://example.com/b?a=1&b=2" -> ((1L, 4L))))
  }

  test("capPerHost: at most k per canonical host, seed-stable, layout-independent") {
    val rows = (0L until 40L).map(i =>
      (i, s"https://${if (i % 2 == 0) "WWW.Big.com" else "small.org"}/p/$i"))
    val df = rows.toDF("id", "url")
    val a = Url.capPerHost(df.repartition(7), "id", "url", k = 5, seed = 1L)
      .select("id").collect().map(_.getLong(0)).toSet
    val b = Url.capPerHost(df.repartition(2), "id", "url", k = 5, seed = 1L)
      .select("id").collect().map(_.getLong(0)).toSet
    assert(a === b)           // layout cannot move a row in or out
    assert(a.size === 10)     // 5 from each of the two hosts
    assert(a.count(_ % 2 == 0) === 5 && a.count(_ % 2 == 1) === 5)
    // a different seed draws a different committee (same sizes)
    val c = Url.capPerHost(df, "id", "url", k = 5, seed = 2L)
      .select("id").collect().map(_.getLong(0)).toSet
    assert(c.size === 10)
    assert(c != a)
  }
}
