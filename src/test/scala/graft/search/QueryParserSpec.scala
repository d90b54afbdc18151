package graft.search

import org.scalatest.funsuite.AnyFunSuite

/** Goldens ported from /root/reference/src/tests/t_queryparser.c:27-121. */
class QueryParserSpec extends AnyFunSuite {

  private def repr(q: String): Either[String, String] =
    QueryParser.parse(q).map(QueryParser.repr)

  test("t_queryparser goldens") {
    assert(repr("A") == Right("`A`"))
    assert(repr("(A OR B) AND C") == Right("(AND (OR `A` `B`) `C`)"))
    assert(repr("A OR (B AND C)") == Right("(OR `A` (AND `B` `C`))"))
    assert(repr("A OR B AND C") == Right("(OR `A` (AND `B` `C`))"))
    assert(repr("A and not B") == Right("(NOT `A` `B`)"))
    assert(repr(" \"sp ace\" OR 'quo\\'te' OR ąžuolas OR " +
      "🇬🇧🇺🇸 AND Київ OR (1 AND NOT (  2   OR   3 ))") ==
      Right("(OR (OR (OR (OR `sp ace` `quo\\'te`) `ąžuolas`) " +
        "(AND `🇬🇧🇺🇸` `Київ`)) (NOT `1` (OR `2` `3`)))"))
    assert(repr("A\nand\nB") == Right("(AND `A` `B`)"))
  }

  test("syntax errors") {
    assert(repr("a AND").isLeft)
    assert(repr("a b OR (c OR d) AND (e").isLeft)
    assert(repr("").isLeft)
    assert(repr(")").isLeft)
  }

  test("implicit OR juxtaposition at top level") {
    assert(repr("a b") == Right("(OR `a` `b`)"))
    assert(repr("a b c") == Right("(OR (OR `a` `b`) `c`)"))
  }

  test("single-char operators") {
    assert(repr("a & b") == Right("(AND `a` `b`)"))
    assert(repr("a | b") == Right("(OR `a` `b`)"))
    // runs containing & are free-form strings (re2c longest match)
    assert(repr("a&b") == Right("`a&b`"))
  }

  test("nesting limit") {
    val deep = "(" * 120 + "a" + ")" * 120
    assert(repr(deep).isLeft)
    val ok = "(" * 50 + "a" + ")" * 50
    assert(repr(ok) == Right("`a`"))
  }
}
