package graft.text

/**
 * By-name registry for user token filters — the engine's extension point,
 * equivalent to the reference's per-token Lua filter slot
 * (/root/reference/src/core/filters_lua.c:74-289, docs/lua-filters-api.md:
 * 19-50): a registered filter sees each token after the preceding pipeline
 * stages and returns Some(replacement) (MUTATION) or None (DISCARD), exactly
 * the reference's filter verdicts (filters.c:199-219).
 *
 * A filter participates in the pipeline as a `custom:<name>` entry in the
 * filter list (e.g. `Seq("normalizer", "custom:ascii_digits", "stemmer")`),
 * which makes it reachable from EVERY surface that takes a filter list:
 * the plain-Scala pipeline, the distributed Catalyst path
 * (`nxs_tokenize_filters` serializes only the CSV string; executors resolve
 * the name against this registry), index builds (the name is part of the
 * config fingerprint / persisted params), and query preparation
 * (Searcher.prepare runs query leaves through the same config).
 *
 * Registration contract (the Spark analogue of the reference loading the Lua
 * script per index open): register under a stable name ONCE per JVM before
 * any query runs — in an object initializer shipped in the application jar,
 * or an executor-startup hook — and never re-register a name with different
 * behavior mid-session (results are memoized per config; a behavior change
 * under the same name would serve stale tokens, just as editing a Lua script
 * under a running reference server would). Unknown names fail fast at first
 * use with the registered-names list.
 */
object CustomFilters {
  private val registry =
    new java.util.concurrent.ConcurrentHashMap[String, String => Option[String]]()

  val Prefix = "custom:"

  /** Register `f` under `name` (referenced as `custom:<name>` in filter
    * lists). Idempotent for the same name; re-registering replaces. */
  def register(name: String, f: String => Option[String]): Unit = {
    // Names travel through filter CSVs, stage fingerprints, and the
    // persisted params.json — keep them to a safe identifier charset.
    require(name.nonEmpty && name.forall(c =>
        c.isLetterOrDigit || c == '_' || c == '-' || c == '.'),
      s"filter name must be [A-Za-z0-9_.-]+: '$name'")
    registry.put(name, f)
    ()
  }

  /** Resolve a registered filter; fails fast with the known names so a
    * missing executor-side registration is an error, not a silent
    * pass-through. */
  def resolve(name: String): String => Option[String] = {
    val f = registry.get(name)
    if (f == null)
      throw new IllegalArgumentException(
        s"custom filter '$name' is not registered on this JVM " +
          s"(registered: ${registeredNames.mkString(", ")}); register it " +
          "in an object initializer shipped with the application jar")
    f
  }

  def registeredNames: Seq[String] = {
    import scala.jdk.CollectionConverters._
    registry.keySet().asScala.toSeq.sorted
  }
}
