package graft.search

import org.scalacheck.Gen
import org.scalatest.funsuite.AnyFunSuite

/** Fuzz/property coverage for the query front end — the parser that faces
  * arbitrary USER input (the reference accepts any bytes over its HTTP
  * surface; here any string reaches `QueryParser.parse`). Invariants:
  *
  *   1. `parse` is total: for ANY string it returns Left/Right, never
  *      throws (the internal fail() raises IllegalArgumentException, which
  *      parse catches — anything else escaping is a bug);
  *   2. syntax errors carry the reference's `syntax error near L:C`
  *      position format (query.c:47-58) or one of the two documented
  *      whole-query messages;
  *   3. pathological nesting hits the 100-level NXS_QUERY_RLIMIT as a Left,
  *      not a StackOverflowError.
  *
  * Plus a differential: random expression TREES rendered to query syntax
  * re-parse to the identical tree (quoting, precedence, and the AND NOT
  * fusion all survive a round trip). Fixed seeds keep runs deterministic
  * (same pattern as HtmlTextFuzzSpec). */
class QueryParserFuzzSpec extends AnyFunSuite {

  private def forAll[A](gen: Gen[A], n: Int = 300)(f: A => Unit): Unit =
    graft.SeededGen.forAll(gen, n)(f)

  private def assertTotal(q: String): Unit =
    QueryParser.parse(q) match {
      case Right(_) => ()
      case Left(msg) =>
        assert(msg != null && msg.nonEmpty, s"empty error for [$q]")
        assert(msg == "empty query" ||
          msg.startsWith("syntax error near ") ||
          msg.contains("nesting limit"),
          s"unexpected error shape for [$q]: $msg")
    }

  test("operator soup: parse is total with well-shaped errors") {
    val piece: Gen[String] = Gen.oneOf(
      Gen.oneOf("AND", "and", "OR", "or", "NOT", "not", "&", "|",
        "(", ")", "((", "))", "\"", "\"\"", "\"a b", " ", "\n", "\t"),
      Gen.alphaNumStr.map(_.take(6)),
      Gen.oneOf("täöken", "文字", "a&b", "x|y", "q(r", "\"quoted str\""))
    val soup = Gen.choose(0, 25)
      .flatMap(n => Gen.listOfN(n, piece)).map(_.mkString(" "))
    forAll(soup)(assertTotal)
  }

  test("arbitrary char strings: parse is total") {
    val anyChar = Gen.frequency(
      8 -> Gen.choose(32.toChar, 126.toChar),
      1 -> Gen.oneOf('\n', '\t', '\r', '\f'),
      1 -> Gen.choose(160.toChar, 0x2fff.toChar))
    val s = Gen.choose(0, 60)
      .flatMap(n => Gen.listOfN(n, anyChar)).map(_.mkString)
    forAll(s)(assertTotal)
  }

  test("deep nesting fails with the reference's limit, not a stack overflow") {
    val q = "(" * 150 + "x" + ")" * 150
    QueryParser.parse(q) match {
      case Left(msg) => assert(msg.contains("nesting limit"))
      case Right(_) => fail("150-level nesting must exceed the 100 cap")
    }
    // under the cap parses fine
    val ok = "(" * 90 + "x" + ")" * 90
    assert(QueryParser.parse(ok) == Right(QToken("x")))
  }

  // --- differential: render a random tree, re-parse, compare -------------

  private val reserved = Set("and", "or", "not")
  private val word: Gen[String] = Gen.choose(1, 8)
    .flatMap(n => Gen.listOfN(n, Gen.alphaNumChar).map(_.mkString))
    .suchThat(w => !reserved.contains(w.toLowerCase))
  private val leaf: Gen[QExpr] = Gen.oneOf(
    word.map(QToken.apply),
    Gen.zip(word, word).map { case (a, b) => QToken(s"$a $b") }) // quoted

  private def tree(depth: Int): Gen[QExpr] =
    if (depth <= 0) leaf
    else Gen.frequency(
      2 -> leaf,
      2 -> Gen.zip(tree(depth - 1), tree(depth - 1))
        .map { case (l, r) => QAnd(l, r) },
      2 -> Gen.zip(tree(depth - 1), tree(depth - 1))
        .map { case (l, r) => QOr(l, r) },
      1 -> Gen.zip(tree(depth - 1), tree(depth - 1))
        .map { case (l, r) => QAndNot(l, r) })

  /** Fully parenthesized concrete syntax — unambiguous regardless of
    * precedence; tokens with spaces are quoted. */
  private def render(e: QExpr): String = e match {
    case QToken(v) => if (v.exists(" \t\n()".contains(_))) s""""$v"""" else v
    case QAnd(l, r) => s"(${render(l)} AND ${render(r)})"
    case QOr(l, r) => s"(${render(l)} OR ${render(r)})"
    case QAndNot(l, r) => s"(${render(l)} AND NOT ${render(r)})"
  }

  test("differential: rendered trees re-parse to the identical tree") {
    forAll(Gen.choose(0, 5).flatMap(tree), n = 400) { t =>
      val q = render(t)
      QueryParser.parse(q) match {
        case Right(parsed) => assert(parsed == t, s"for query [$q]")
        case Left(err) => fail(s"render produced unparsable [$q]: $err")
      }
      // leaves() enumerates exactly the generated leaf values, in order
      def expectedLeaves(e: QExpr): Seq[String] = e match {
        case QToken(v) => Seq(v)
        case QAnd(l, r) => expectedLeaves(l) ++ expectedLeaves(r)
        case QOr(l, r) => expectedLeaves(l) ++ expectedLeaves(r)
        case QAndNot(l, r) => expectedLeaves(l) ++ expectedLeaves(r)
      }
      assert(QueryParser.leaves(t) == expectedLeaves(t))
    }
  }

  test("differential: operator symbols & and | parse like the keywords") {
    forAll(Gen.zip(word, word, word), n = 100) { case (a, b, c) =>
      val kw = QueryParser.parse(s"$a AND $b OR $c")
      val sym = QueryParser.parse(s"$a & $b | $c")
      assert(kw.isRight && kw == sym)
    }
  }
}
