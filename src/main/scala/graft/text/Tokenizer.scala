package graft.text

import com.ibm.icu.text.{BreakIterator, RuleBasedBreakIterator}
import com.ibm.icu.util.ULocale

import scala.collection.mutable.ArrayBuffer

/**
 * UAX-29 word segmentation, mirroring the reference tokenizer
 * (/root/reference/src/core/tokenizer.c:234-302): ICU `UBRK_WORD` break
 * iteration with the locale taken from the `lang` param (:265-266), skipping
 * segments whose rule status is `UBRK_WORD_NONE` (punctuation/whitespace,
 * :280-282).
 *
 * icu4j `BreakIterator`s are stateful → one per (thread, locale), reused
 * across rows (the reference likewise reuses one iterator per call and one
 * filter context per pipeline, src/core/filters.c:125-178).
 */
object Tokenizer {
  private val iterators: ThreadLocal[java.util.HashMap[String, BreakIterator]] =
    ThreadLocal.withInitial(() => new java.util.HashMap[String, BreakIterator]())

  private def iteratorFor(lang: String): BreakIterator = {
    val cache = iterators.get()
    var it = cache.get(lang)
    if (it == null) {
      // `lang` is untrusted corpus data: clear-on-full bounds the per-thread
      // map under garbage-cardinality lang columns (same discipline as every
      // other per-row cache — cfgCache, memo, planeCache); real langs
      // re-enter on their next row.
      if (cache.size >= MaxCachedLangs) cache.clear()
      it = BreakIterator.getWordInstance(new ULocale(lang))
      cache.put(lang, it)
    }
    it
  }

  private val MaxCachedLangs = 64

  /** The per-thread word iterator for `lang` — exposed so the expression
    * hot path (NxsTokenizeExpr) can drive boundary iteration directly and
    * memoize filter results by (text, start, end) REGION instead of
    * allocating one substring per token (the dominant allocation of the
    * signature scan). Thread-local; callers must not retain it. */
  private[graft] def wordIterator(lang: String): RuleBasedBreakIterator =
    iteratorFor(lang).asInstanceOf[RuleBasedBreakIterator]

  /** Raw word segments (pre-filter), in document order, duplicates kept. */
  def segments(text: String, lang: String): Array[String] = {
    if (text == null || text.isEmpty) return Array.empty
    val it = iteratorFor(lang).asInstanceOf[RuleBasedBreakIterator]
    it.setText(text)
    val out = new ArrayBuffer[String](16)
    var start = it.first()
    var end = it.next()
    while (end != BreakIterator.DONE) {
      // The reference skips only rule status == UBRK_WORD_NONE (exact 0),
      // tokenizer.c:280-282 — not the whole [WORD_NONE, WORD_NONE_LIMIT) range.
      if (it.getRuleStatus != BreakIterator.WORD_NONE) {
        out += text.substring(start, end)
      }
      start = end
      end = it.next()
    }
    out.toArray
  }
}
