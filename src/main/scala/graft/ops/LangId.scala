package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.graft.bridge
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/**
 * Heuristic language identification: Unicode-script detection for the CJK
 * family (zh / ja / ko separated: kana ⇒ Japanese, Hangul ⇒ Korean, Han
 * alone ⇒ Chinese) + function-word profiles for en / de / fr / es (the
 * classic n-gram/stopword-profile approach — Cavnar & Trenkle 1994 style,
 * collapsed to unigram function words, which dominate at paragraph length).
 * Unknown → "und". Contract: ONLY these 8 labels; it is a cheap corpus
 * triage heuristic, not a general language detector.
 *
 * Every step is deliberately expressible in plain SQL (fixed char windows,
 * script counts, profile-word counts, deterministic argmax) so the DuckDB
 * oracle for q_lang_id re-derives the prediction independently.
 */
object LangId {
  // Profile order IS the tie-break order (first wins ties).
  val profiles: Seq[(String, Set[String])] = Seq(
    "en" -> Set("the", "and", "of", "to", "is", "in", "that", "it", "for",
      "was", "with", "are", "this", "have", "not"),
    "de" -> Set("der", "die", "das", "und", "ist", "nicht", "ein", "eine",
      "mit", "für", "von", "auf", "sich", "dass", "ich"),
    "fr" -> Set("le", "la", "les", "et", "est", "un", "une", "des", "que",
      "pour", "dans", "qui", "pas", "sur", "avec"),
    "es" -> Set("el", "la", "los", "las", "y", "es", "un", "una", "que",
      "por", "para", "con", "del", "se", "no"))

  /** Chars examined for script detection / word profiles (SQL: left(text, N)). */
  val HeadChars = 4000
  /** Max words fed to the profiles (SQL: list_slice(words, 1, N)). */
  val MaxWords = 500

  def predict(text: String): String = {
    if (text == null || text.isEmpty) return "und"
    // Head window counted in CODE POINTS to match SQL left(text, 4000)
    // (DuckDB counts characters, not UTF-16 units).
    val headEnd = {
      var i = 0; var cp = 0
      while (i < text.length && cp < HeadChars) {
        i += Character.charCount(text.codePointAt(i)); cp += 1
      }
      i
    }
    val head = text.substring(0, headEnd)
    var han = 0; var kana = 0; var hangul = 0; var total = 0
    var i = 0
    while (i < head.length) {
      val c = head.codePointAt(i)
      total += 1
      val s = Character.UnicodeScript.of(c)
      if (s == Character.UnicodeScript.HAN) han += 1
      else if (s == Character.UnicodeScript.HIRAGANA ||
        s == Character.UnicodeScript.KATAKANA) kana += 1
      else if (s == Character.UnicodeScript.HANGUL) hangul += 1
      i += Character.charCount(c)
    }
    if ((han + kana + hangul) * 10 >= total && han + kana + hangul > 0) {
      if (kana > 0) return "ja"
      if (hangul > han) return "ko"
      return "zh"
    }
    val words = head.toLowerCase(java.util.Locale.ROOT)
      .split("[^\\p{L}']+").iterator.take(MaxWords)
    val counts = new java.util.HashMap[String, Int]()
    words.foreach { w =>
      profiles.foreach { case (lang, set) =>
        if (set.contains(w)) counts.merge(lang, 1, (a, b) => a + b)
      }
    }
    var best = "und"; var bestN = 0
    profiles.foreach { case (lang, _) =>
      val n = counts.getOrDefault(lang, 0)
      if (n > bestN) { best = lang; bestN = n } // strict > ⇒ first-listed wins ties
    }
    best
  }

  def predictUtf8(s: UTF8String): UTF8String =
    UTF8String.fromString(predict(s.toString))

  def predictCol(c: Column): Column = bridge.column(LangIdExpr(bridge.expression(c)))
}

case class LangIdExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def prettyName: String = "lang_id"
  override def nullSafeEval(s: Any): Any =
    LangId.predictUtf8(s.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.ops.LangId.predictUtf8($c)")
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
