package graft.functions

/**
 * Open-addressing memo of token-filter results keyed by a REGION of the
 * document string: `get(s, start, end, hash)` probes with the region's
 * chars directly, so the memo-hit path — the overwhelming majority under
 * Zipfian web-text token frequencies — allocates NOTHING. The previous
 * java.util.HashMap[String, AnyRef] form required one `substring` per
 * token just to probe, ~10 KB of short-lived garbage per document, which
 * made GC the dominant cost of the signature scan (141 s of a 264 s-task
 * stage measured in r7; see OPTIMIZATION_r07.md).
 *
 * Semantics match the HashMap it replaces: bounded at `maxEntries` with
 * clear-on-full (hot tokens re-enter on their next occurrence), one memo
 * per (thread, PipelineConfig). Not thread-safe — thread-local use only.
 *
 * Region hash: the caller computes `h = 31·h + c` over the region chars
 * (String.hashCode-compatible) and passes it in, so a stored key's cached
 * `String.hashCode` equals the probe hash — insertion and probe agree
 * without recomputation. Linear probing over a power-of-two table
 * (finalizer-spread index), growing by rehash up to 2×maxEntries slots.
 */
final class TokenMemo(maxEntries: Int) {
  private var cap = 1 << 10 // power of two
  private var keys = new Array[String](cap)
  private var vals = new Array[AnyRef](cap)
  private var n = 0

  def size: Int = n

  @inline private def idx(h: Int, c: Int): Int =
    (h ^ (h >>> 16)) & (c - 1)

  /** The memoized value for the region, or null when absent. */
  def get(s: String, start: Int, end: Int, h: Int): AnyRef = {
    val len = end - start
    var i = idx(h, cap)
    while (true) {
      val k = keys(i)
      if (k == null) return null
      if (k.length == len && k.hashCode == h && k.regionMatches(0, s, start, len))
        return vals(i)
      i = (i + 1) & (cap - 1)
    }
    null // unreachable
  }

  /** Insert a value for `key` (the materialized region; its hashCode is the
    * probe hash). Clear-on-full at maxEntries, mirroring the HashMap form. */
  def put(key: String, value: AnyRef): Unit = {
    if (n >= maxEntries) clear()
    else if (2 * (n + 1) > cap && cap < 2 * maxEntries) grow()
    insert(key, value)
    n += 1
  }

  private def insert(key: String, value: AnyRef): Unit = {
    var i = idx(key.hashCode, cap)
    while (keys(i) != null) i = (i + 1) & (cap - 1)
    keys(i) = key
    vals(i) = value
  }

  private def grow(): Unit = {
    val ok = keys; val ov = vals
    cap = cap << 1
    keys = new Array[String](cap)
    vals = new Array[AnyRef](cap)
    var i = 0
    while (i < ok.length) {
      if (ok(i) != null) insert(ok(i), ov(i))
      i += 1
    }
  }

  def clear(): Unit = {
    java.util.Arrays.fill(keys.asInstanceOf[Array[AnyRef]], null)
    java.util.Arrays.fill(vals, null)
    n = 0
  }
}
