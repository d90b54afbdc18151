package graft.search

import graft.functions._
import graft.text.PipelineConfig
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * The reference's index, as three relations + two scalars
 * (SURVEY.md §1.2): terms interning and the doc-term map
 * (/root/reference/src/index/terms.c, dtmap.c) become `termStats` and
 * `postings`; the dtmap header counters doc_count/token_count
 * (/root/reference/src/index/storage.h:112-118) become `docCount` /
 * `tokenCount`. The reverse term→docs bitmap is not materialized — it IS
 * the postings relation keyed by term (a semi-join replaces
 * roaring64_bitmap lookup).
 *
 * At cluster scale: postings/termStats/docStats are plain hash
 * aggregations off one tokenize scan (map-side partial agg), written as
 * partitioned tables; term dictionary joins are broadcastable.
 */
final case class SearchIndex(
    postings: DataFrame,   // (doc_id, term, cnt)
    docStats: DataFrame,   // (doc_id, dl)
    termStats: DataFrame,  // (term, df, total)
    docCount: Long,
    tokenCount: Long,
    pipeline: PipelineConfig)

object SearchIndex {

  /** Build from docs(doc_id, text). One tokenize pass, three aggregates. */
  def build(docs: DataFrame, cfg: PipelineConfig): SearchIndex = {
    val tokenized = docs
      .select(col("doc_id"),
        nxs_tokenize_filters(col("text"), lit(cfg.lang), cfg.filters,
          cfg.stopwordsEnabled).as("tokens"))
      .select(col("doc_id"), explode(col("tokens")).as("term"))
    val postings = tokenized
      .groupBy("doc_id", "term").agg(count(lit(1)).as("cnt"))
      .cache()
    val docStats = postings
      .groupBy("doc_id").agg(sum("cnt").as("dl"))
      .cache()
    val termStats = postings
      .groupBy("term")
      .agg(count(lit(1)).as("df"), sum("cnt").as("total"))
      .cache()
    val (docCount, tokenCount) = {
      val r = docStats.agg(count(lit(1)), coalesce(sum("dl"), lit(0L))).collect()(0)
      (r.getLong(0), r.getLong(1))
    }
    SearchIndex(postings, docStats, termStats, docCount, tokenCount, cfg)
  }
}
