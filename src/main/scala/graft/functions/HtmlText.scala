package graft.functions

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

object HtmlTextExpr {
  // Whitespace for the collapse pass: the ASCII class plus NBSP (the decode
  // target of &nbsp;/&#160;). Deliberately NOT Character.isWhitespace — the
  // oracle re-derives the collapse in RE2 ([ \t\n\r\f\v\x{00A0}]) and the
  // two definitions must agree character-for-character.
  @inline private def isWs(c: Char): Boolean =
    c == ' ' || c == '\t' || c == '\n' || c == '\r' || c == '\f' ||
      c == '\u000B' || c == '\u00A0'

  private val Named = java.util.Map.of(
    "amp", "&", "lt", "<", "gt", ">", "quot", "\"", "apos", "'",
    "nbsp", " ")

  @inline private def isHexDigit(c: Char): Boolean =
    (c >= '0' && c <= '9') || (c >= 'a' && c <= 'f') || (c >= 'A' && c <= 'F')

  /** Decode the entity starting at `i` (s(i)=='&'). Returns (text, advance);
    * anything unrecognized stays literal ("&", 1) — the browser-compatible
    * fallback, and the only deterministic choice for malformed input. The
    * ';' search is BOUNDED to 10 chars up front (not scan-then-reject), so
    * ampersand-heavy non-entity text — '?a=1&b=2' query strings, raw binary
    * in the html column — stays O(1) per '&' instead of O(n). Digit strings
    * are validated char-by-char: Integer.parseInt alone would accept a
    * leading '+' ('&#+65;'), which every browser leaves literal. */
  private def decodeEntity(s: String, i: Int): (String, Int) = {
    var semi = -1
    var j = i + 1
    val lim = math.min(s.length, i + 11)
    while (j < lim && semi < 0) { if (s.charAt(j) == ';') semi = j else j += 1 }
    if (semi < 0) return ("&", 1)
    val body = s.substring(i + 1, semi)
    val adv = semi - i + 1
    if (body.length >= 2 && body.charAt(0) == '#') {
      val hex = body.charAt(1) == 'x' || body.charAt(1) == 'X'
      val digits = if (hex) body.substring(2) else body.substring(1)
      val valid = digits.nonEmpty &&
        (if (hex) digits.forall(isHexDigit)
         else digits.forall(c => c >= '0' && c <= '9'))
      if (!valid) return ("&", 1)
      try {
        val cp = Integer.parseInt(digits, if (hex) 16 else 10)
        if (cp <= 0 || cp > 0x10FFFF ||
            (cp >= 0xD800 && cp <= 0xDFFF)) ("&", 1)
        else (new String(Character.toChars(cp)), adv)
      } catch { case _: NumberFormatException => ("&", 1) }
    } else {
      val named = Named.get(body)
      if (named != null) (named, adv) else ("&", 1)
    }
  }

  /** First index of `needle` (already lowercase) in `s` at or after `from`,
    * matching ASCII case-insensitively; -1 if absent. */
  private def indexOfIgnoreCase(s: String, needle: String, from: Int): Int = {
    val n = s.length - needle.length
    var i = math.max(from, 0)
    while (i <= n) {
      var j = 0
      while (j < needle.length &&
        Character.toLowerCase(s.charAt(i + j)) == needle.charAt(j)) j += 1
      if (j == needle.length) return i
      i += 1
    }
    -1
  }

  @inline private def isAsciiLetter(c: Char): Boolean =
    (c >= 'a' && c <= 'z') || (c >= 'A' && c <= 'Z')

  /** Does '<' at `i` start markup (tag / markup declaration / processing
    * instruction / bogus comment)? HTML5 treats '<' followed by anything
    * else — a digit, space, '3', end-of-input — as literal text. '</' with
    * a non-letter next ('</3') is a bogus comment, which parseTag's
    * skip-to-'>' already implements; only '</' at end-of-input is text. */
  private def startsMarkup(s: String, i: Int): Boolean = {
    if (i + 1 >= s.length) return false
    val c = s.charAt(i + 1)
    isAsciiLetter(c) || c == '!' || c == '?' ||
      (c == '/' && i + 2 < s.length)
  }

  /** Parse the tag starting at `i` (s(i)=='<'): lowercased element name,
    * index just past the closing '>', and whether it is a close tag. A '>'
    * inside a QUOTED attribute value does not end the tag; quote state only
    * opens where an attribute value starts (right after '='), so an
    * apostrophe inside an unquoted value — `title=don't` — stays inert
    * (HTML5: unquoted values end at whitespace or '>'). An unterminated tag
    * swallows the rest of the input, like every practical extractor. */
  private def parseTag(s: String, i: Int): (String, Int, Boolean) = {
    var j = i + 1
    val closing = j < s.length && s.charAt(j) == '/'
    if (closing) j += 1
    val nameStart = j
    while (j < s.length && Character.isLetterOrDigit(s.charAt(j))) j += 1
    val name = s.substring(nameStart, j).toLowerCase
    var quote: Char = 0
    var afterEq = false
    while (j < s.length) {
      val c = s.charAt(j)
      if (quote != 0) { if (c == quote) quote = 0 }
      else if (c == '>') return (name, j + 1, closing)
      else if (c == '=') afterEq = true
      else if ((c == '"' || c == '\'') && afterEq) { quote = c; afterEq = false }
      else if (!isWs(c)) afterEq = false
      j += 1
    }
    (name, s.length, closing)
  }

  /** Static entry shared by interpreted eval and codegen. */
  def extract(bytes: Array[Byte]): UTF8String = {
    val s = new String(bytes, java.nio.charset.StandardCharsets.UTF_8)
    val n = s.length
    val out = new java.lang.StringBuilder(math.min(n, 1 << 16))
    var pendingSpace = false
    def emit(c: Char): Unit =
      if (isWs(c)) { if (out.length > 0) pendingSpace = true }
      else {
        if (pendingSpace) { out.append(' '); pendingSpace = false }
        out.append(c)
      }
    var i = 0
    while (i < n) {
      val c = s.charAt(i)
      if (c == '<') {
        if (s.startsWith("<!--", i)) {
          // '<!-->' and '<!--->' are complete (empty) comments per HTML5 —
          // searching '-->' from i+4 would miss their overlapping ends and
          // swallow the rest of the document
          if (s.startsWith(">", i + 4)) i += 5
          else if (s.startsWith("->", i + 4)) i += 6
          else {
            val e = s.indexOf("-->", i + 4) // comment; unterminated -> EOF
            i = if (e < 0) n else e + 3
          }
        } else if (!startsMarkup(s, i)) {
          emit(c); i += 1 // HTML5: '<' before a non-name char is text
        } else {
          val (name, after, closing) = parseTag(s, i)
          i = after
          if (out.length > 0) pendingSpace = true // tags separate words
          if (!closing && (name == "script" || name == "style")) {
            // raw-text elements: skip to the matching close tag; '<' and
            // quoted "</p>" strings inside do not end them, and per HTML5
            // '</script' only closes when followed by whitespace, '/', '>'
            // or EOF — '</script_tag>' inside a JS string does not
            val close = "</" + name
            var k = indexOfIgnoreCase(s, close, i)
            while (k >= 0 && k + close.length < n && {
                val d = s.charAt(k + close.length)
                !(isWs(d) || d == '/' || d == '>')
              }) k = indexOfIgnoreCase(s, close, k + 1)
            if (k < 0) i = n
            else {
              val gt = s.indexOf('>', k)
              i = if (gt < 0) n else gt + 1
            }
          }
        }
      } else if (c == '&') {
        val (text, adv) = decodeEntity(s, i)
        var t = 0
        while (t < text.length) { emit(text.charAt(t)); t += 1 }
        i += adv
      } else { emit(c); i += 1 }
    }
    UTF8String.fromString(out.toString)
  }
}

/** `nxs_html_text(html)` → string — deterministic text extraction from an
  * HTML byte column (input_hint's `html: binary`): strips comments, tags
  * (quote-aware), and `<script>`/`<style>` raw content, decodes named
  * (amp/lt/gt/quot/apos/nbsp) and numeric (&#d; / &#xH;) entities, and
  * collapses whitespace runs to single spaces with the ends trimmed. The
  * Common-Crawl ingest step the reference never needed (it is handed text,
  * /root/reference/src/core/nxs.c:490-549) but a webtext pipeline does:
  * pages carrying only html flow through `coalesce(text,
  * nxs_html_text(html))` into the same tokenizer (DedupPipeline.signatures). */
case class HtmlTextExpr(child: Expression)
  extends UnaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[org.apache.spark.sql.graft.bridge.AbstractType] =
    Seq(BinaryType)
  override def dataType: DataType = StringType
  override def prettyName: String = "nxs_html_text"

  override def nullSafeEval(html: Any): Any =
    HtmlTextExpr.extract(html.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.HtmlTextExpr.extract($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
