package graft.search

import graft.tables.StageStore
import graft.text.PipelineConfig
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/**
 * Durable search index — the reference's index lifecycle (append to
 * nxsterms.db / nxsdtmap.db under an atomic header publish, re-sync on open;
 * /root/reference/src/index/terms.c:155-414, dtmap.c:246-544) re-expressed
 * as committed StageStore tables:
 *
 *   postings   (doc_id, term, cnt, first_pos) — the doc-term map (S5)
 *   doc_stats  (doc_id, dl)                   — per-doc counters
 *   term_stats (term, term_id, df, total)     — the interned terms file (S3)
 *   index_stats(doc_count, token_count)       — the dtmap header counters
 *
 * Each table is parquet + an atomically-published manifest (StageStore), so
 * a killed build resumes at the first uncommitted stage, and reopening after
 * a crash — or from a different session — reads the committed tables without
 * touching the corpus: the relational analogue of the reference's mmap
 * re-sync. A pipeline-config change fingerprints differently and rebuilds;
 * stage lineage invalidates downstream tables automatically.
 */
object IndexStore {

  private def fp(cfg: PipelineConfig): String =
    s"lang=${cfg.lang}|filters=${cfg.filters.mkString(",")}|sw=${cfg.stopwordsEnabled}"

  /** Build-or-resume the index under `root`. `docs` is only evaluated for
    * stages that are not already committed. */
  def buildOrOpen(docs: => org.apache.spark.sql.DataFrame, cfg: PipelineConfig,
      spark: SparkSession, root: String): SearchIndex = {
    val store = new StageStore(spark, root)
    val f = fp(cfg)
    val postings = store.runStage("postings", f) {
      SearchIndex.postingsOf(docs, cfg)
    }
    val docStats = store.runStage("doc_stats", f, inputs = Seq("postings")) {
      SearchIndex.docStatsOf(postings)
    }
    val termStats = store.runStage("term_stats", f, inputs = Seq("postings")) {
      SearchIndex.termStatsOf(postings)
    }
    val statsDf = store.runStage("index_stats", f, inputs = Seq("doc_stats")) {
      docStats.agg(count(lit(1)).as("doc_count"),
        coalesce(sum("dl"), lit(0L)).as("token_count"))
    }
    val stats = statsDf.collect()(0)
    SearchIndex(postings.drop("first_pos"), docStats, termStats,
      stats.getLong(0), stats.getLong(1), cfg)
  }
}
