package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.graft.bridge
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/**
 * Heuristic language identification: CJK script detection + function-word
 * profiles (the classic n-gram/stopword-profile approach — Cavnar & Trenkle
 * 1994 style, collapsed to unigram function words, which dominate at
 * paragraph length). Pure deterministic Scala inside a codegen'd expression.
 */
object LangId {
  private val profiles: Seq[(String, Set[String])] = Seq(
    "en" -> Set("the", "and", "of", "to", "is", "in", "that", "it", "for",
      "was", "with", "are", "this", "have", "not"),
    "de" -> Set("der", "die", "das", "und", "ist", "nicht", "ein", "eine",
      "mit", "für", "von", "auf", "sich", "dass", "ich"),
    "fr" -> Set("le", "la", "les", "et", "est", "un", "une", "des", "que",
      "pour", "dans", "qui", "pas", "sur", "avec"),
    "es" -> Set("el", "la", "los", "las", "y", "es", "un", "una", "que",
      "por", "para", "con", "del", "se", "no"))

  def predict(text: String): String = {
    if (text == null || text.isEmpty) return "und"
    var cjk = 0; var total = 0
    var i = 0
    while (i < text.length && total < 4000) {
      val c = text.charAt(i)
      if (!Character.isWhitespace(c)) {
        total += 1
        val b = Character.UnicodeScript.of(c)
        if (b == Character.UnicodeScript.HAN || b == Character.UnicodeScript.HIRAGANA ||
            b == Character.UnicodeScript.KATAKANA || b == Character.UnicodeScript.HANGUL)
          cjk += 1
      }
      i += 1
    }
    if (total > 0 && cjk * 10 >= total) return "zh"
    val words = text.toLowerCase.split("[^\\p{L}']+").iterator.take(500)
    val counts = new java.util.HashMap[String, Int]()
    words.foreach { w =>
      profiles.foreach { case (lang, set) =>
        if (set.contains(w)) counts.merge(lang, 1, (a, b) => a + b)
      }
    }
    var best = "en"; var bestN = 0
    profiles.foreach { case (lang, _) =>
      val n = counts.getOrDefault(lang, 0)
      if (n > bestN) { best = lang; bestN = n }
    }
    if (bestN == 0) "und" else best
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
