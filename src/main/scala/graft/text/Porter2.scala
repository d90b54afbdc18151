package graft.text

/**
 * Porter2 (Snowball "english") stemmer, implemented from the published
 * algorithm description (https://snowballstem.org/algorithms/english/stemmer.html).
 *
 * The reference engine applies a Snowball stemmer as the last stage of its
 * token filter pipeline (see /root/reference/src/core/filters_builtin.c:206-245,
 * which calls libstemmer's `sb_stemmer_stem` with lang from params). No
 * Snowball jar is available offline, so this is a from-scratch pure-Scala
 * implementation of the same published algorithm; parity is pinned by the
 * fixture suite in Porter2Spec.
 *
 * Thread-safe (no shared mutable state); intended to be called from inside
 * codegen'd Catalyst expressions, so it allocates minimally.
 */
object Porter2 {

  private val exceptional: Map[String, String] = Map(
    "skis" -> "ski", "skies" -> "sky",
    "dying" -> "die", "lying" -> "lie", "tying" -> "tie",
    "idly" -> "idl", "gently" -> "gentl", "ugly" -> "ugli",
    "early" -> "earli", "only" -> "onli", "singly" -> "singl",
    "sky" -> "sky", "news" -> "news", "howe" -> "howe",
    "atlas" -> "atlas", "cosmos" -> "cosmos", "bias" -> "bias",
    "andes" -> "andes")

  // Invariant after step 1a.
  private val exceptional1a: Set[String] =
    Set("inning", "outing", "canning", "herring", "earring",
      "proceed", "exceed", "succeed")

  private val doubles =
    Array("bb", "dd", "ff", "gg", "mm", "nn", "pp", "rr", "tt")

  @inline private def isVowel(c: Char): Boolean =
    c == 'a' || c == 'e' || c == 'i' || c == 'o' || c == 'u' || c == 'y'

  @inline private def isVowelY(c: Char): Boolean = // vowel with marked Y excluded
    c == 'a' || c == 'e' || c == 'i' || c == 'o' || c == 'u' || c == 'y'

  /** Stem a single lowercase word. Input is assumed to already be
    * lower-cased by the normalizer stage (as in the reference pipeline). */
  def stem(wordIn: String): String = {
    if (wordIn.length <= 2) return wordIn
    var w = wordIn

    // Remove a leading apostrophe, normalize curly apostrophes like Snowball.
    w = w.replace('’', '\'')
    if (w.startsWith("'")) w = w.substring(1)
    if (w.length <= 2) return w

    exceptional.get(w) match {
      case Some(s) => return s
      case None =>
    }

    // Mark consonant-y: set initial y, or y after a vowel, to 'Y'.
    val sb = new StringBuilder(w)
    if (sb.nonEmpty && sb.charAt(0) == 'y') sb.setCharAt(0, 'Y')
    var i = 1
    while (i < sb.length) {
      if (sb.charAt(i) == 'y' && isVowel(sb.charAt(i - 1))) sb.setCharAt(i, 'Y')
      i += 1
    }
    w = sb.toString

    // Step 0: remove longest of ' , 's , 's' suffixes.
    if (w.endsWith("'s'")) w = w.dropRight(3)
    else if (w.endsWith("'s")) w = w.dropRight(2)
    else if (w.endsWith("'")) w = w.dropRight(1)

    // R1 / R2 computation (with exceptional prefixes).
    def computeR1(s: String): Int = {
      if (s.startsWith("gener")) return 5
      if (s.startsWith("commun")) return 6
      if (s.startsWith("arsen")) return 5
      var j = 0
      // after the first non-vowel following a vowel
      while (j < s.length && !isVowel(s.charAt(j))) j += 1
      while (j < s.length && isVowel(s.charAt(j))) j += 1
      if (j < s.length) j + 1 else s.length
    }
    def regionFrom(s: String, start: Int): Int = {
      var j = start
      while (j < s.length && !isVowel(s.charAt(j))) j += 1
      while (j < s.length && isVowel(s.charAt(j))) j += 1
      if (j < s.length) j + 1 else s.length
    }
    def r1(s: String): Int = computeR1(s)
    def r2(s: String): Int = regionFrom(s, computeR1(s))

    @inline def hasVowel(s: String, from: Int, until: Int): Boolean = {
      var j = from
      while (j < until) { if (isVowel(s.charAt(j))) return true; j += 1 }
      false
    }

    // Short syllable at position of the vowel `vi` (the syllable's vowel):
    // either (non-vowel, vowel, non-vowel not w/x/Y) or (vowel at pos 0,
    // followed by non-vowel).
    def endsWithShortSyllable(s: String): Boolean = {
      val n = s.length
      if (n >= 3) {
        val c2 = s.charAt(n - 1); val v = s.charAt(n - 2); val c1 = s.charAt(n - 3)
        if (!isVowel(c1) && isVowel(v) && !isVowel(c2) &&
            c2 != 'w' && c2 != 'x' && c2 != 'Y') return true
      }
      if (n == 2 && isVowel(s.charAt(0)) && !isVowel(s.charAt(1))) return true
      false
    }
    def isShortWord(s: String): Boolean =
      endsWithShortSyllable(s) && r1(s) >= s.length

    // ---- Step 1a ----
    if (w.endsWith("sses")) w = w.dropRight(2)
    else if (w.endsWith("ied") || w.endsWith("ies")) {
      w = if (w.length > 4) w.dropRight(2) else w.dropRight(1)
    } else if (w.endsWith("ss") || w.endsWith("us")) {
      // nothing
    } else if (w.endsWith("s")) {
      // delete if the preceding word part contains a vowel not immediately
      // before the s
      if (hasVowel(w, 0, w.length - 2)) w = w.dropRight(1)
    }

    if (exceptional1a.contains(w)) return unmark(w)

    // ---- Step 1b ----
    val r1pos = r1(w)
    if (w.endsWith("eedly")) {
      if (w.length - 5 >= r1pos) w = w.dropRight(3)
    } else if (w.endsWith("eed")) {
      if (w.length - 3 >= r1pos) w = w.dropRight(1)
    } else {
      var matched: Int = -1
      if (w.endsWith("ingly") || w.endsWith("edly")) matched = if (w.endsWith("ingly")) 5 else 4
      else if (w.endsWith("ing")) matched = 3
      else if (w.endsWith("ed")) matched = 2
      if (matched > 0) {
        val stemPart = w.dropRight(matched)
        if (hasVowel(stemPart, 0, stemPart.length)) {
          w = stemPart
          if (w.endsWith("at") || w.endsWith("bl") || w.endsWith("iz")) w = w + "e"
          else if (doubles.exists(w.endsWith(_))) w = w.dropRight(1)
          else if (isShortWord(w)) w = w + "e"
        }
      }
    }

    // ---- Step 1c ----
    // replace suffix y or Y by i if preceded by a non-vowel which is not
    // the first letter of the word
    if (w.length > 2) {
      val last = w.charAt(w.length - 1)
      if ((last == 'y' || last == 'Y') && !isVowel(w.charAt(w.length - 2)))
        w = w.dropRight(1) + "i"
    }

    // ---- Step 2 (search for the longest among, act if in R1) ----
    {
      val p1 = r1(w)
      // ordered by length desc so first match is the longest
      val subs: List[(String, String => Option[String])] = List(
        ("ization", s => Some(s.dropRight(7) + "ize")),
        ("ational", s => Some(s.dropRight(7) + "ate")),
        ("fulness", s => Some(s.dropRight(4))),
        ("ousness", s => Some(s.dropRight(4))),
        ("iveness", s => Some(s.dropRight(4))),
        ("tional", s => Some(s.dropRight(2))),
        ("biliti", s => Some(s.dropRight(6) + "ble")),
        ("lessli", s => Some(s.dropRight(2))),
        ("entli", s => Some(s.dropRight(2))),
        ("ation", s => Some(s.dropRight(5) + "ate")),
        ("alism", s => Some(s.dropRight(3))),
        ("aliti", s => Some(s.dropRight(3))),
        ("ousli", s => Some(s.dropRight(2))),
        ("iviti", s => Some(s.dropRight(5) + "ive")),
        ("fulli", s => Some(s.dropRight(2))),
        ("enci", s => Some(s.dropRight(1) + "e")),
        ("anci", s => Some(s.dropRight(1) + "e")),
        ("abli", s => Some(s.dropRight(1) + "e")),
        ("izer", s => Some(s.dropRight(1))),
        ("ator", s => Some(s.dropRight(2) + "e")),
        ("alli", s => Some(s.dropRight(2))),
        ("bli", s => Some(s.dropRight(1) + "e")),
        ("ogi", s => if (s.length >= 4 && s.charAt(s.length - 4) == 'l')
                       Some(s.dropRight(1)) else None),
        ("li", s => if (s.length >= 3 && "cdeghkmnrt".indexOf(s.charAt(s.length - 3)) >= 0)
                      Some(s.dropRight(2)) else None))
      var done = false
      val it = subs.iterator
      while (it.hasNext && !done) {
        val (suf, fn) = it.next()
        if (w.endsWith(suf)) {
          done = true // longest suffix found; act only if in R1
          if (w.length - suf.length >= p1) fn(w).foreach(nw => w = nw)
        }
      }
    }

    // ---- Step 3 ----
    {
      val p1 = r1(w); val p2 = r2(w)
      if (w.endsWith("ational")) { if (w.length - 7 >= p1) w = w.dropRight(7) + "ate" }
      else if (w.endsWith("tional")) { if (w.length - 6 >= p1) w = w.dropRight(2) }
      else if (w.endsWith("alize")) { if (w.length - 5 >= p1) w = w.dropRight(3) }
      else if (w.endsWith("icate") || w.endsWith("iciti")) { if (w.length - 5 >= p1) w = w.dropRight(3) }
      else if (w.endsWith("ative")) { if (w.length - 5 >= p1 && w.length - 5 >= p2) w = w.dropRight(5) }
      else if (w.endsWith("ical")) { if (w.length - 4 >= p1) w = w.dropRight(2) }
      else if (w.endsWith("ness")) { if (w.length - 4 >= p1) w = w.dropRight(4) }
      else if (w.endsWith("ful")) { if (w.length - 3 >= p1) w = w.dropRight(3) }
    }

    // ---- Step 4 (act if in R2) ----
    {
      val p2 = r2(w)
      val suffixes = List("ement", "ance", "ence", "able", "ible", "ment",
        "ant", "ent", "ism", "ate", "iti", "ous", "ive", "ize", "ion",
        "al", "er", "ic")
      var done = false
      val it = suffixes.iterator
      while (it.hasNext && !done) {
        val suf = it.next()
        if (w.endsWith(suf)) {
          done = true
          if (w.length - suf.length >= p2) {
            if (suf == "ion") {
              if (w.length >= 4) {
                val pre = w.charAt(w.length - 4)
                if (pre == 's' || pre == 't') w = w.dropRight(3)
              }
            } else w = w.dropRight(suf.length)
          }
        }
      }
    }

    // ---- Step 5 ----
    {
      val p1 = r1(w); val p2 = r2(w)
      if (w.endsWith("e")) {
        if (w.length - 1 >= p2) w = w.dropRight(1)
        else if (w.length - 1 >= p1 && !endsWithShortSyllable(w.dropRight(1)))
          w = w.dropRight(1)
      } else if (w.endsWith("l")) {
        if (w.length - 1 >= p2 && w.length >= 2 && w.charAt(w.length - 2) == 'l')
          w = w.dropRight(1)
      }
    }

    unmark(w)
  }

  @inline private def unmark(w: String): String =
    if (w.indexOf('Y') >= 0) w.replace('Y', 'y') else w
}
