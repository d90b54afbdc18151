package graft.functions

import org.scalacheck.Gen
import org.scalatest.funsuite.AnyFunSuite

/** Fuzz/property coverage for the hand-rolled HTML extractor — the one
  * parser in the engine that faces arbitrary bytes from the wild web
  * (Common-Crawl html columns carry truncated pages, mis-declared
  * charsets, raw binary). Invariants checked on every input:
  *
  *   1. never throws, for ANY byte array (including invalid UTF-8);
  *   2. whitespace is fully normalized: the output contains none of the
  *      collapse class except single ' ' separators — no doubles, no
  *      leading/trailing space, no tabs/newlines/NBSP;
  *   3. output never exceeds the decoded input in chars (every construct
  *      — tag strip, entity decode, collapse — is non-expanding).
  *
  * Plus a structural differential: for generated pages whose text
  * fragments are separated by real tags (incl. script/style blocks with
  * trap content), the extraction equals the fragments joined by single
  * spaces. Fixed seeds keep runs deterministic (same pattern as
  * KernelPropertiesSpec). */
class HtmlTextFuzzSpec extends AnyFunSuite {

  private def x(bytes: Array[Byte]): String =
    HtmlTextExpr.extract(bytes).toString
  private def xs(html: String): String = x(html.getBytes("UTF-8"))

  private def forAll[A](gen: Gen[A], n: Int = 200)(f: A => Unit): Unit =
    graft.SeededGen.forAll(gen, n)(f)

  // Mirrors HtmlTextExpr.isWs (the collapse class) — kept in sync by the
  // "collapse class chars never survive" assertions below.
  private val wsClass = Set(' ', '\t', '\n', '\r', '\f', '\u000B', '\u00A0')

  private def checkInvariants(input: Array[Byte]): Unit = {
    val out = x(input) // invariant 1: must not throw
    val decoded = new String(input, java.nio.charset.StandardCharsets.UTF_8)
    assert(out.length <= decoded.length,
      s"output longer than input: ${out.length} > ${decoded.length}")
    assert(!out.startsWith(" ") && !out.endsWith(" "), s"untrimmed: [$out]")
    assert(!out.contains("  "), s"double space: [$out]")
    out.foreach { c =>
      assert(c == ' ' || !wsClass.contains(c),
        s"uncollapsed whitespace U+${c.toInt.toHexString} in [$out]")
    }
  }

  test("arbitrary bytes: no throw, normalized whitespace, bounded output") {
    val bytesGen = Gen.choose(0, 300)
      .flatMap(n => Gen.listOfN(n, Gen.choose(Byte.MinValue, Byte.MaxValue)))
      .map(_.toArray)
    forAll(bytesGen)(checkInvariants)
  }

  test("markup-soup strings: no throw, normalized whitespace") {
    val piece: Gen[String] = Gen.oneOf(
      Gen.oneOf("<", ">", "</", "<!", "<!--", "-->", "<!-->", "&", ";",
        "=", "\"", "'", " ", "\t\n", "\u00A0", "</scr", "<script>",
        "</script>", "<style>", "<p ", "<a href=", "<3", "<p", "<-"),
      Gen.oneOf("&amp;", "&lt;", "&#65;", "&#x41;", "&#xD800;", "&#0;",
        "&#+65;", "&#999999999;", "&#xFFFFFFFFF;", "&nope;", "&#;", "&#x;"),
      Gen.alphaNumStr.map(_.take(8)),
      Gen.oneOf("päge", "文字", "😀", "�"))
    val soup = Gen.choose(0, 40)
      .flatMap(n => Gen.listOfN(n, piece)).map(_.mkString)
    forAll(soup)(s => checkInvariants(s.getBytes("UTF-8")))
  }

  test("mutated well-formed pages: no throw, normalized whitespace") {
    val page = "<!DOCTYPE html><html><head><title>T&amp;t</title>" +
      "<script>if(a<b){s=\"</p>\";}</script><style>p{x:1}</style></head>" +
      "<body class='m&in'><p>Hello <b>world</b> &#65;&#x42;</p>" +
      "<!-- c --><div data-q=\"a>b\">tail &nbsp; end</div></body></html>"
    val mutation: Gen[String => String] = Gen.oneOf(
      Gen.choose(0, page.length).map(k => (s: String) => s.take(k)),
      Gen.choose(0, page.length).map(k => (s: String) => s.drop(k)),
      Gen.zip(Gen.choose(0, page.length), Gen.choose(0, 255)).map {
        case (k, b) => (s: String) =>
          s.take(k) + b.toChar + s.drop(math.min(k + 1, s.length))
      },
      Gen.zip(Gen.choose(0, page.length), Gen.choose(0, page.length)).map {
        case (a, b) => (s: String) => // delete the [min, max) range
          s.take(math.min(a, b)) + s.drop(math.max(a, b))
      })
    val mutated = Gen.choose(1, 4)
      .flatMap(n => Gen.listOfN(n, mutation))
      .map(ms => ms.foldLeft(page)((s, m) => m(s)))
    forAll(mutated)(s => checkInvariants(s.getBytes("UTF-8")))
  }

  test("differential: tag-separated fragments join with single spaces") {
    val word: Gen[String] = Gen.choose(1, 10).flatMap(n =>
      Gen.listOfN(n, Gen.alphaNumChar).map(_.mkString))
    val separator: Gen[String] = Gen.oneOf(
      Gen.const("<p>"), Gen.const("</div>"), Gen.const("<br/>"),
      Gen.const("<a href=\"x?a=1&b=2\">"), Gen.const("<td data-x='q>r'>"),
      Gen.const("<script>var s=\"</p>\"; if(1<2){}</script>"),
      Gen.const("<style>p{color:red}</style>"),
      Gen.const("<SPAN CLASS=UNQUOTED>"))
    val pageAndExpected: Gen[(String, String)] = Gen.choose(1, 12).flatMap {
      n =>
        Gen.listOfN(n, Gen.zip(word, separator)).map { parts =>
          val html = parts.map { case (w, sep) => w + sep }.mkString
          (html, parts.map(_._1).mkString(" "))
        }
    }
    forAll(pageAndExpected, n = 300) { case (html, expected) =>
      assert(xs(html) == expected, s"for html [$html]")
    }
  }

  test("differential: comments between fragments do not separate words") {
    val word: Gen[String] = Gen.choose(1, 6).flatMap(n =>
      Gen.listOfN(n, Gen.alphaChar).map(_.mkString))
    val gen = Gen.zip(word, word).map { case (a, b) =>
      (s"$a<!-- <p>hidden</p> -->$b", a + b)
    }
    forAll(gen, n = 50) { case (html, expected) =>
      assert(xs(html) == expected)
    }
  }
}
