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

  /** Decode the entity starting at `i` (s(i)=='&'). Returns (text, advance);
    * anything unrecognized stays literal ("&", 1) — the browser-compatible
    * fallback, and the only deterministic choice for malformed input. */
  private def decodeEntity(s: String, i: Int): (String, Int) = {
    val semi = s.indexOf(';', i + 1)
    if (semi < 0 || semi > i + 10) return ("&", 1)
    val body = s.substring(i + 1, semi)
    val adv = semi - i + 1
    if (body.length >= 2 && body.charAt(0) == '#') {
      val hex = body.charAt(1) == 'x' || body.charAt(1) == 'X'
      val digits = if (hex) body.substring(2) else body.substring(1)
      if (digits.isEmpty) return ("&", 1)
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

  /** Parse the tag starting at `i` (s(i)=='<'): lowercased element name,
    * index just past the closing '>' (quote-aware — a '>' inside a quoted
    * attribute value does not end the tag), and whether it is a close tag.
    * An unterminated tag swallows the rest of the input, like every
    * practical extractor. */
  private def parseTag(s: String, i: Int): (String, Int, Boolean) = {
    var j = i + 1
    val closing = j < s.length && s.charAt(j) == '/'
    if (closing) j += 1
    val nameStart = j
    while (j < s.length && Character.isLetterOrDigit(s.charAt(j))) j += 1
    val name = s.substring(nameStart, j).toLowerCase
    var quote: Char = 0
    while (j < s.length) {
      val c = s.charAt(j)
      if (quote != 0) { if (c == quote) quote = 0 }
      else if (c == '"' || c == '\'') quote = c
      else if (c == '>') return (name, j + 1, closing)
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
          val e = s.indexOf("-->", i + 4) // comment; unterminated -> EOF
          i = if (e < 0) n else e + 3
        } else {
          val (name, after, closing) = parseTag(s, i)
          i = after
          if (out.length > 0) pendingSpace = true // tags separate words
          if (!closing && (name == "script" || name == "style")) {
            // raw-text elements: skip to the matching close tag; '<' and
            // quoted "</p>" strings inside do not end them
            val k = indexOfIgnoreCase(s, "</" + name, i)
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
