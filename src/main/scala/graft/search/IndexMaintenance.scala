package graft.search

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Index maintenance — the reference's mutation surface re-expressed as
 * relational operations over the SearchIndex relations. These are in-memory
 * VIEWS (fast path for a live session); the durable form — committed
 * postings deltas, persisted term-id assignments, tombstone markers,
 * replayed at open exactly like the reference's dtmap/terms re-sync — is
 * `IndexStore.addDocs` / `IndexStore.removeDocs` / `IndexStore.openIndex`.
 *
 * Surface:
 *
 *  - document delete (S7): the reference tombstones a doc by zeroing its
 *    doc_id in place and appending a `(doc_id, 0)` marker, then decrementing
 *    the doc/token counters and per-term totals
 *    (/root/reference/src/index/dtmap.c:546-655). Relationally a tombstone
 *    set + LEFT ANTI JOIN at read, with stats recomputed from the surviving
 *    postings — an Iceberg-style delete-file pattern. The anti-join is a
 *    broadcast join whenever the tombstone set is small (the common case),
 *    so deletes never reshuffle the postings table.
 *
 *  - incremental add (S4/S5 sync): the reference appends new term/doc
 *    blocks and re-syncs (/root/reference/src/index/terms.c:320-414,
 *    dtmap.c:246-355). Relationally: tokenize only the new docs, union the
 *    postings, and merge the aggregates by key — the merge is a hash-agg on
 *    the (small) delta side, never a rescan of the existing index.
 *
 *  - JSON response sink (S9): `{"results":[{"doc_id":..,"score":..}],
 *    "count":n}` exactly as /root/reference/src/core/results.c:152-220
 *    builds it (descending score order preserved from the top-k sort).
 */
object IndexMaintenance {

  /** S7 — delete documents. `tombstones` must have a `doc_id` column.
    * Returns a new index view with the docs removed and counters
    * decremented; the underlying postings are filtered lazily (anti-join),
    * per-term stats recomputed only for terms the deleted docs touched. */
  def remove(idx: SearchIndex, tombstones: DataFrame): SearchIndex = {
    val tomb = broadcast(tombstones.select("doc_id").distinct())
    val postings = idx.postings.join(tomb, Seq("doc_id"), "left_anti")

    // Only terms present in deleted docs change; merge the decrements into
    // the existing termStats instead of re-aggregating the full postings.
    val removedPost = idx.postings.join(tomb, Seq("doc_id"), "left_semi")
    val decrements = removedPost
      .groupBy("term")
      .agg(count(lit(1)).as("d_df"), sum("cnt").as("d_total"))
    // term_id is preserved: the reference never reuses or compacts ids on
    // delete (terms stay interned, /root/reference/src/index/terms.c) — so
    // fully-deleted terms are KEPT as df=0 rows. A later re-add of the term
    // then finds it already interned and keeps its id; queries on a df=0
    // term return empty via the (absent) postings, exactly like the
    // reference's still-interned-but-unreferenced term.
    val termStats = idx.termStats
      .join(broadcast(decrements), Seq("term"), "left")
      .select(col("term"), col("term_id"),
        (col("df") - coalesce(col("d_df"), lit(0L))).as("df"),
        (col("total") - coalesce(col("d_total"), lit(0L))).as("total"))

    val docStats = idx.docStats.join(tomb, Seq("doc_id"), "left_anti")
    val removed = idx.docStats.join(tomb, Seq("doc_id"), "left_semi")
      .agg(coalesce(count(lit(1)), lit(0L)),
        coalesce(sum("dl"), lit(0L))).collect()(0)
    SearchIndex(postings, docStats, termStats,
      idx.docCount - removed.getLong(0), idx.tokenCount - removed.getLong(1),
      idx.pipeline, algo = idx.algo) // mutation views keep the index's algo
  }

  /** S4/S5 — incremental add of `newDocs(doc_id, text)`. Docs whose ids are
    * already indexed are rejected, mirroring nxs_index_add's duplicate-id
    * error (/root/reference/src/core/nxs.c:498-511). */
  def add(idx: SearchIndex, newDocs: DataFrame): SearchIndex = {
    val existingIds = idx.docStats.select("doc_id")
    val fresh = newDocs.join(existingIds, Seq("doc_id"), "left_anti")
    val delta = SearchIndex.build(fresh, idx.pipeline)

    val postings = idx.postings.unionByName(delta.postings)
    val docStats = idx.docStats.unionByName(delta.docStats)
    // Merge stats by term; ids: existing terms keep theirs, genuinely new
    // terms get the next dense ids in the delta's own first-seen order —
    // the relational form of the reference's append-and-assign
    // (/root/reference/src/index/terms.c:226-235).
    val maxId = idx.termStats.agg(coalesce(max("term_id"), lit(0L)))
      .collect()(0).getLong(0)
    val newTerms = delta.termStats
      .join(idx.termStats.select("term"), Seq("term"), "left_anti")
      .select(col("term"), col("term_id").as("delta_id"))
    // Dense follow-on ids in the delta's own first-seen order, two-phase
    // (no single-partition window — see SearchIndex.withDenseIds).
    val newIds = SearchIndex.withDenseIds(newTerms, Seq("delta_id"), "rk", base = maxId)
      .select(col("term"), (lit(maxId) + col("rk")).as("new_id"))
    val merged = idx.termStats
      .withColumnRenamed("term_id", "old_id")
      .join(delta.termStats
          .select(col("term"), col("df").as("d_df"), col("total").as("d_total")),
        Seq("term"), "full_outer")
      .join(newIds, Seq("term"), "left")
      .withColumn("term_id", coalesce(col("old_id"), col("new_id")))
    val termStats = merged
      .select(col("term"), col("term_id"),
        (coalesce(col("df"), lit(0L)) + coalesce(col("d_df"), lit(0L))).as("df"),
        (coalesce(col("total"), lit(0L)) + coalesce(col("d_total"), lit(0L))).as("total"))
    SearchIndex(postings, docStats, termStats,
      idx.docCount + delta.docCount, idx.tokenCount + delta.tokenCount,
      idx.pipeline,
      // the delta's build() cached three plans; keep their handles so the
      // merged index's unpersist() actually releases them
      cached = idx.cached ++ delta.cached,
      algo = idx.algo)
  }

  /** S9 — JSON response in the reference wire shape
    * (results.c:152-220): results already sorted descending by the top-k. */
  def toJsonResponse(results: DataFrame): String = {
    val rows = results.select("doc_id", "score").collect()
    val items = rows.map { r =>
      val score = String.format(java.util.Locale.ROOT, "%.6f",
        Double.box(r.getDouble(1)))
      s"""{"doc_id":${r.getLong(0)},"score":$score}"""
    }
    s"""{"results":[${items.mkString(",")}],"count":${rows.length}}"""
  }
}
