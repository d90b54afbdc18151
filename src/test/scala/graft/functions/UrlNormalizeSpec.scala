package graft.functions

import graft.SparkTestBase
import org.scalatest.funsuite.AnyFunSuite

/** Goldens for the RFC 3986 §6 syntax-based canonicalizer
  * (functions.url_normalize) — every rule exercised one at a time plus the
  * malformed-input contract (NULL, never a throw). */
class UrlNormalizeSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark
  import spark.implicits._

  private def norm(urls: String*): Seq[Option[String]] =
    urls.toDF("url")
      .select(url_normalize($"url"))
      .collect().toSeq.map(r => if (r.isNullAt(0)) None else Some(r.getString(0)))

  test("scheme and host lowercase; path case preserved") {
    assert(norm("HTTP://Example.COM/Path/To?X=1") ==
      Seq(Some("http://example.com/Path/To?X=1")))
  }

  test("fragment dropped") {
    assert(norm("https://a.com/x#sec-2", "https://a.com/x#?fake=query") ==
      Seq(Some("https://a.com/x"), Some("https://a.com/x")))
  }

  test("default ports dropped, others kept, cross-scheme defaults kept") {
    assert(norm(
      "http://a.com:80/x", "https://a.com:443/x",
      "http://a.com:443/x", "https://a.com:80/x",
      "http://a.com:8080/x") ==
      Seq(Some("http://a.com/x"), Some("https://a.com/x"),
        Some("http://a.com:443/x"), Some("https://a.com:80/x"),
        Some("http://a.com:8080/x")))
  }

  test("trailing host dot stripped; empty path becomes /") {
    assert(norm("http://a.com.", "http://a.com.:8080", "http://a.com?x=1") ==
      Seq(Some("http://a.com/"), Some("http://a.com:8080/"),
        Some("http://a.com/?x=1")))
  }

  test("tracking params dropped, remainder sorted, empty query dropped") {
    assert(norm(
      "http://a.com/p?utm_source=x&b=2&a=1",
      "http://a.com/p?z=1&utm_campaign=c&y=",
      "http://a.com/p?gclid=abc",
      "http://a.com/p?fbclid=1&msclkid=2&utm_x=3",
      "http://a.com/p?",
      "http://a.com/p?&&a=1&&") ==
      Seq(Some("http://a.com/p?a=1&b=2"),
        Some("http://a.com/p?y=&z=1"),
        Some("http://a.com/p"),
        Some("http://a.com/p"),
        Some("http://a.com/p"),
        Some("http://a.com/p?a=1")))
  }

  test("params named like tracking prefixes but distinct are kept") {
    // utm (no underscore), gclid2, xfbclid: none match the anchored list
    assert(norm("http://a.com/p?utm=1&gclid2=2&xfbclid=3") ==
      Seq(Some("http://a.com/p?gclid2=2&utm=1&xfbclid=3")))
  }

  test("duplicate keys survive the sort deterministically") {
    assert(norm("http://a.com/p?a=2&a=10&a=1") ==
      Seq(Some("http://a.com/p?a=1&a=10&a=2")))
  }

  test("malformed inputs degrade to NULL") {
    assert(norm("not-a-url", "", "/relative/path", "//proto-relative.com/x") ==
      Seq(None, None, None, None))
  }

  test("null input stays null") {
    val got = Seq[Option[String]](None).toDF("url")
      .select(url_normalize($"url")).collect()
    assert(got(0).isNullAt(0))
  }

  test("idempotent: normalizing a normalized url is identity") {
    val inputs = Seq(
      "HTTP://Example3.COM.:80/A/b5?utm_source=x&b=2&a=1#f",
      "https://A.com:443?z=1&y=2",
      "http://h.com:8081/p/q?b&a")
    val once = norm(inputs: _*).map(_.get)
    assert(norm(once: _*).map(_.get) == once)
  }
}
