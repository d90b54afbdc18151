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

  /** The full "normalizer" filter: casefold then diacritic substitution. */
  def normalize(s: String): String = subsDiacritics(nfkcCaseFold(s))
}
