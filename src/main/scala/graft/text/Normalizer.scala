package graft.text

import com.ibm.icu.text.{Normalizer2, Transliterator}

/**
 * Unicode normalization, mirroring the reference's "normalizer" filter
 * (/root/reference/src/core/filters_builtin.c:54-76):
 *   (a) NFKC_Casefold (lowercase + NFKC compatibility normalization in one
 *       operation, ICU `unorm2_getNFKCCasefoldInstance`,
 *       /root/reference/src/utils/utf8.c:268-325), then
 *   (b) diacritic substitution via the ICU transform rule
 *       "NFKD; [:Nonspacing Mark:] Remove; Latin-ASCII; NFKC"
 *       (/root/reference/src/utils/utf8.c:30-31,217-260).
 *
 * icu4j `Normalizer2` instances are immutable and thread-safe;
 * `Transliterator` is NOT thread-safe, hence the ThreadLocal. One instance
 * per executor thread, reused across all rows (mirrors the reference's
 * per-pipeline reusable contexts, src/core/filters.c:125-178).
 */
object Normalizer {
  private val NfkdRule = "NFKD; [:Nonspacing Mark:] Remove; Latin-ASCII; NFKC"

  private val nfkcCasefold: Normalizer2 = Normalizer2.getNFKCCasefoldInstance

  private val translit: ThreadLocal[Transliterator] =
    ThreadLocal.withInitial(() => Transliterator.getInstance(NfkdRule))

  /** NFKC_Casefold: lowercases and applies NFKC. */
  def nfkcCaseFold(s: String): String = nfkcCasefold.normalize(s)

  /** Strip diacritics + Latinize (reference `utf8_subs_diacritics`). */
  def subsDiacritics(s: String): String = translit.get().transliterate(s)

  /** True iff every char is ASCII (< 0x80). */
  private def isAscii(s: String): Boolean = {
    var i = 0
    while (i < s.length) { if (s.charAt(i) >= 0x80) return false; i += 1 }
    true
  }

  /** True iff ASCII and already fully casefolded (no uppercase A–Z). */
  private def isLowerAscii(s: String): Boolean = {
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c >= 0x80 || (c >= 'A' && c <= 'Z')) return false
      i += 1
    }
    true
  }

  /** The full "normalizer" filter: casefold then diacritic substitution.
    *
    * ASCII fast path: on pure-ASCII input NFKC_Casefold is exactly
    * `toLowerCase` (ASCII has no compatibility decompositions and casefold =
    * simple lowercase there) and the transliteration rule is the identity
    * (no marks to remove, Latin-ASCII is a no-op on ASCII, NFKD/NFKC are
    * identities). Web-scale corpora are overwhelmingly ASCII tokens, and the
    * rule-based transliteration engine costs ~10-50 µs/token — this path is
    * the single hottest branch of the whole pipeline. */
  def normalize(s: String): String = {
    if (isLowerAscii(s)) s
    else if (isAscii(s)) {
      val out = new Array[Char](s.length)
      var i = 0
      while (i < s.length) {
        val c = s.charAt(i)
        out(i) = if (c >= 'A' && c <= 'Z') (c + 32).toChar else c
        i += 1
      }
      new String(out)
    } else subsDiacritics(nfkcCaseFold(s))
  }
}
