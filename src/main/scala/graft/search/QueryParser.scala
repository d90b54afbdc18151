package graft.search

/**
 * Query language front end — same token set, precedence, and implicit-OR
 * semantics as the reference's re2c lexer + lemon grammar:
 *   - operators: AND|'&', OR|'|', NOT (case-insensitive keywords),
 *     parentheses (/root/reference/src/query/scan.re:64-66,96-100)
 *   - quoted strings keep escapes raw (scan.re:106-111 strndup's the raw
 *     span between the quotes)
 *   - free-form strings: any run without whitespace/parens (scan.re:76)
 *   - precedence NOT > AND > OR, left-assoc; `A AND NOT B` is the binary
 *     and-not operator; top-level juxtaposition is implicit OR
 *     (/root/reference/src/query/grammar.y:66-99)
 *   - nesting capped at 100 like NXS_QUERY_RLIMIT
 *     (/root/reference/src/query/search.c:69-70)
 *   - syntax errors report line:offset plus up-to-50-chars context in the
 *     reference's format `syntax error near L:C: "tok ..."`
 *     (/root/reference/src/query/query.c:47-58: line from the lexer's line
 *     counter, offset = byte offset of the token within its line)
 */
sealed trait QExpr
final case class QToken(value: String) extends QExpr
final case class QAnd(l: QExpr, r: QExpr) extends QExpr
final case class QOr(l: QExpr, r: QExpr) extends QExpr
final case class QAndNot(l: QExpr, r: QExpr) extends QExpr

object QueryParser {

  sealed trait Tok
  case object TAnd extends Tok
  case object TOr extends Tok
  case object TNot extends Tok
  case object TOpen extends Tok
  case object TClose extends Tok
  final case class TStr(v: String, quoted: Boolean) extends Tok

  /** Token + its source position (1-based line, 0-based offset within the
    * line, absolute char index — mirroring query_set_error's
    * `token - cur_line` arithmetic). */
  final case class PTok(tok: Tok, line: Int, col: Int, start: Int)

  private val ws = " \t\f\r\n"

  /** Position-tracked lexer. */
  def lexPos(q: String): Either[String, List[PTok]] = {
    val out = scala.collection.mutable.ListBuffer.empty[PTok]
    var i = 0
    var line = 1
    var lineStart = 0
    val n = q.length
    while (i < n) {
      val c = q.charAt(i)
      if (c == '\n') { line += 1; i += 1; lineStart = i }
      else if (ws.indexOf(c) >= 0) i += 1
      else if (c == '(') { out += PTok(TOpen, line, i - lineStart, i); i += 1 }
      else if (c == ')') { out += PTok(TClose, line, i - lineStart, i); i += 1 }
      else {
        val tokLine = line
        val tokCol = i - lineStart
        val tokStart = i
        // candidate 1: quoted string (only if it starts with a quote)
        var quotedEnd = -1
        if (c == '\'' || c == '"') {
          var j = i + 1
          var closed = false
          while (j < n && !closed) {
            val cj = q.charAt(j)
            if (cj == '\\' && j + 1 < n) j += 2
            else if (cj == c) { closed = true }
            else j += 1
          }
          if (closed) quotedEnd = j + 1
        }
        // candidate 2: free-form run (no whitespace/parens)
        var ffEnd = i
        while (ffEnd < n && ws.indexOf(q.charAt(ffEnd)) < 0 &&
               q.charAt(ffEnd) != '(' && q.charAt(ffEnd) != ')') ffEnd += 1
        // re2c: longest match wins; tie -> earlier rule (quoted)
        val tok =
          if (quotedEnd >= ffEnd && quotedEnd > i) {
            val t = TStr(q.substring(i + 1, quotedEnd - 1), quoted = true)
            // quoted strings may span lines: keep line:offset accounting
            // honest for every token after them
            var k = i
            while (k < quotedEnd) {
              if (q.charAt(k) == '\n') { line += 1; lineStart = k + 1 }
              k += 1
            }
            i = quotedEnd
            t
          } else {
            val run = q.substring(i, ffEnd)
            i = ffEnd
            run match {
              case "&" => TAnd
              case "|" => TOr
              case _ if run.equalsIgnoreCase("and") => TAnd
              case _ if run.equalsIgnoreCase("or") => TOr
              case _ if run.equalsIgnoreCase("not") => TNot
              case _ => TStr(run, quoted = false)
            }
          }
        out += PTok(tok, tokLine, tokCol, tokStart)
      }
    }
    Right(out.toList)
  }

  /** Position-free view (compat). */
  def lex(q: String): Either[String, List[Tok]] = lexPos(q).map(_.map(_.tok))

  private final class P(val query: String, var toks: List[PTok]) {
    var depth = 0
    var last: Option[PTok] = None
    def peek: Option[PTok] = toks.headOption
    def next(): PTok = {
      val h = toks.head; toks = toks.tail; last = Some(h); h
    }

    /** Reference error shape (query.c:56-57): line:offset + up to 50 chars
      * of context from the offending token. */
    def fail(at: Option[PTok]): Nothing = {
      val (line, col, start) = at.orElse(last)
        .map(p => (p.line, p.col, p.start))
        .getOrElse((1, query.length, query.length))
      val ctx = query.substring(math.min(start, query.length)).take(50)
      throw new IllegalArgumentException(
        s"""syntax error near $line:$col: "$ctx ..."""")
    }
    def fail(msg: String): Nothing = throw new IllegalArgumentException(msg)

    // precedence: OR=1, AND=2
    def parseExpr(minPrec: Int): QExpr = {
      depth += 1
      if (depth > 100) fail("query nesting limit reached (100 levels)")
      var left = parsePrimary()
      var done = false
      while (!done) {
        peek.map(_.tok) match {
          case Some(TOr) if minPrec <= 1 =>
            next(); left = QOr(left, parseExpr(2))
          case Some(TAnd) if minPrec <= 2 =>
            next()
            peek.map(_.tok) match {
              case Some(TNot) => next(); left = QAndNot(left, parseExpr(3))
              case _ => left = QAnd(left, parseExpr(3))
            }
          case _ => done = true
        }
      }
      depth -= 1
      left
    }

    def parsePrimary(): QExpr = peek.map(_.tok) match {
      case Some(TStr(v, _)) => next(); QToken(v)
      case Some(TOpen) =>
        next()
        val e = parseExpr(0)
        peek.map(_.tok) match {
          case Some(TClose) => next(); e
          case _ => fail(peek)
        }
      case _ => fail(peek)
    }

    /** Top level: expr_list — juxtaposed exprs fold into OR
      * (grammar.y:81-84). */
    def parseQuery(): QExpr = {
      var root = parseExpr(0)
      while (peek.isDefined) {
        peek.map(_.tok) match {
          case Some(TStr(_, _)) | Some(TOpen) =>
            root = QOr(root, parseExpr(0))
          case _ => fail(peek)
        }
      }
      root
    }
  }

  def parse(q: String): Either[String, QExpr] =
    lexPos(q).flatMap { toks =>
      if (toks.isEmpty) Left("empty query")
      else
        try Right(new P(q, toks).parseQuery())
        catch { case e: IllegalArgumentException => Left(e.getMessage) }
    }

  /** IR dump in the reference's t_queryparser format:
    * `(AND (OR `A` `B`) `C`)` (t_queryparser.c:155-177). */
  def repr(e: QExpr): String = e match {
    case QToken(v) => s"`$v`"
    case QAnd(l, r) => s"(AND ${repr(l)} ${repr(r)})"
    case QOr(l, r) => s"(OR ${repr(l)} ${repr(r)})"
    case QAndNot(l, r) => s"(NOT ${repr(l)} ${repr(r)})"
  }

  /** All leaf values (pre-pipeline). */
  def leaves(e: QExpr): Seq[String] = e match {
    case QToken(v) => Seq(v)
    case QAnd(l, r) => leaves(l) ++ leaves(r)
    case QOr(l, r) => leaves(l) ++ leaves(r)
    case QAndNot(l, r) => leaves(l) ++ leaves(r)
  }
}
