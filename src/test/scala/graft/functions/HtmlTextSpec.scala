package graft.functions

import graft.SparkTestBase
import graft.corpus.SyntheticCorpus
import graft.dedup.DedupPipeline
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class HtmlTextSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark
  import spark.implicits._

  private def x(html: String): String =
    HtmlTextExpr.extract(html.getBytes("UTF-8")).toString

  test("tags strip to word separators; whitespace collapses; ends trim") {
    assert(x("<p>Hello <b>world</b></p>") == "Hello world")
    assert(x("<p>a</p><p>b</p>") == "a b")
    assert(x("<p>  a\t\n b </p>") == "a b")
    assert(x("") == "")
    assert(x("plain text, no markup") == "plain text, no markup")
  }

  test("script and style raw content is skipped, traps included") {
    // '<' inside script, a quoted "</p>" inside script, '>' in a quoted attr
    assert(x("""<script>if(1<2){var s="</p>";}</script>ok""") == "ok")
    assert(x("<style>p{color:red}</style>a") == "a")
    assert(x("<SCRIPT>x=1;</ScRiPt>done") == "done")
    assert(x("<script src=\"a.js\">var y;</script>tail") == "tail")
    // unterminated raw-text element swallows the rest
    assert(x("a<script>never closed") == "a")
    assert(x("<body data-x='q>r'>z</body>") == "z")
  }

  test("comments and doctype are removed; unterminated forms are safe") {
    // a comment is NOT a word separator (matches rendering: a<!--x-->b → ab)
    assert(x("a<!-- <p>hidden</p> -->b") == "ab")
    assert(x("a <!-- x --> b") == "a b")
    assert(x("<!DOCTYPE html><p>c</p>") == "c")
    assert(x("a<!-- open") == "a")
    assert(x("a<div") == "a")
  }

  test("entities: named, numeric, hex, malformed stay literal") {
    assert(x("a&amp;b") == "a&b")
    assert(x("&lt;c&gt; &quot;d&apos;") == "<c> \"d'")
    assert(x("e&nbsp;&nbsp;f") == "e f")
    assert(x("&#65;&#x42;") == "AB")
    assert(x("&bogus; &amp &#; &#xZZ; &#xD800;") ==
      "&bogus; &amp &#; &#xZZ; &#xD800;")
    // decoded '<' is text, not a new tag
    assert(x("&lt;p&gt;kept&lt;/p&gt;") == "<p>kept</p>")
  }

  test("hardening: literal '<', unquoted attrs, raw-text close boundaries") {
    // HTML5: '<' before a non-name char is text, not a swallowed tag
    assert(x("5 < 10 and x > 3") == "5 < 10 and x > 3")
    assert(x("i <3 u") == "i <3 u")
    assert(x("a<") == "a<")
    assert(x("</") == "</")
    assert(x("</3 x>y") == "y") // '</'+non-letter = bogus comment to '>'
    // apostrophe inside an UNQUOTED attribute value must not open a quote
    assert(x("<a title=don't>click</a> more") == "click more")
    assert(x("<a href = \"x>y\">z</a>") == "z")
    // '</script' closes only before ws, '/', '>' or EOF
    assert(x("""<script>var s="</script_tag>";x();</script>real""") == "real")
    // short comments are complete, not unterminated
    assert(x("a<!-->b") == "ab")
    assert(x("a<!--->b") == "ab")
    // signed numeric entities stay literal (browser behavior)
    assert(x("&#+65; &#x+41;") == "&#+65; &#x+41;")
    // ampersands with no ';' within 10 chars stay literal (and the scan is
    // bounded, so amp-heavy query strings can't go quadratic)
    assert(x("?a=1&b=2&c=3 done; yes") == "?a=1&b=2&c=3 done; yes")
  }

  test("nxs_html_text column: codegen path, null passthrough") {
    val df = Seq(
      Some("<html><body><h1>T</h1><p>body &amp; soul</p></body></html>"),
      None)
      .toDF("h")
      .select(nxs_html_text(when($"h".isNotNull, encode($"h", "UTF-8"))).as("t"))
    val got = df.collect()
    assert(got(0).getString(0) == "T body & soul")
    assert(got(1).isNullAt(0))
  }

  test("dedup pipeline clusters html-only pages identically to text pages") {
    val corpus = SyntheticCorpus.pages(spark,
      SyntheticCorpus.Config(nClusters = 120)).cache()
    val baseline = DedupPipeline.clusters(corpus)
      .select("url", "cluster_id").as[(String, Long)].collect().toMap
    // move half the pages to html-only: minimal wrap whose extraction is
    // exactly the original text (render() emits single-spaced text), so the
    // clustering must be byte-identical through the coalesce fallback
    val htmlOnly = corpus.withColumn("pick", abs(xxhash64($"url")) % 2 === 0)
      .withColumn("html",
        when($"pick", encode(
          concat(lit("<html><head><script>var z=1;</script></head><body><p>"),
            $"text", lit("</p></body></html>")), "UTF-8")))
      .withColumn("text", when(!$"pick", $"text"))
      .drop("pick")
    val nHtmlOnly = htmlOnly.where($"text".isNull && $"html".isNotNull).count()
    assert(nHtmlOnly > 0, "fixture must actually exercise the fallback")
    val got = DedupPipeline.clusters(htmlOnly)
      .select("url", "cluster_id").as[(String, Long)].collect().toMap
    assert(got == baseline)
    corpus.unpersist()
  }
}
