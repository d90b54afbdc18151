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
    termStats: DataFrame,  // (term, term_id, df, total)
    docCount: Long,
    tokenCount: Long,
    pipeline: PipelineConfig)

object SearchIndex {

  /** Build from docs(doc_id, text). One tokenize pass, three aggregates.
    *
    * Term interning (reference A3, /root/reference/src/index/terms.c:226-235
    * assigns ids 1..N in insertion order): `term_id` is the dense first-seen
    * rank — ordered by (first doc containing the term, first position within
    * that doc), the batch equivalent of the reference's sequential
    * append order. The rank is a global row_number window: fine because the
    * term DICTIONARY is orders of magnitude smaller than the corpus (and the
    * reference itself caps ids at u32); if a corpus ever produced a
    * dictionary too large for one partition, swap to a two-phase
    * per-partition-offset rank. */
  def build(docs: DataFrame, cfg: PipelineConfig): SearchIndex = {
    val postings = postingsOf(docs, cfg).cache()
    val docStats = docStatsOf(postings).cache()
    val termStats = termStatsOf(postings).cache()
    val (docCount, tokenCount) = {
      val r = docStats.agg(count(lit(1)), coalesce(sum("dl"), lit(0L))).collect()(0)
      (r.getLong(0), r.getLong(1))
    }
    SearchIndex(postings.drop("first_pos"), docStats, termStats,
      docCount, tokenCount, cfg)
  }

  /** Postings with the per-(doc, term) first occurrence position kept
    * (consumed by termStatsOf's interning, dropped from the public index). */
  def postingsOf(docs: DataFrame, cfg: PipelineConfig): DataFrame =
    docs
      .select(col("doc_id"),
        posexplode(nxs_tokenize_filters(col("text"), lit(cfg.lang), cfg.filters,
          cfg.stopwordsEnabled)).as(Seq("pos", "term")))
      .groupBy("doc_id", "term")
      .agg(count(lit(1)).as("cnt"), min("pos").as("first_pos"))

  def docStatsOf(postings: DataFrame): DataFrame =
    postings.groupBy("doc_id").agg(sum("cnt").as("dl"))

  def termStatsOf(postings: DataFrame): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("first_seen.doc_id"), col("first_seen.first_pos"))
    postings
      .groupBy("term")
      .agg(count(lit(1)).as("df"), sum("cnt").as("total"),
        min(struct(col("doc_id"), col("first_pos"))).as("first_seen"))
      .withColumn("term_id", row_number().over(w).cast("long"))
      .select("term", "term_id", "df", "total")
  }
}
