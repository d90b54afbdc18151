package graft

import graft.ops.{RelationalOps, TrainingOps}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` spans the engine surface: the reference's index/query math
  * (postings, term/doc stats, TF-IDF, BM25, boolean algebra, top-k), the
  * dedup family (exact, MinHash/LSH, SimHash, n-gram Jaccard, winnowing),
  * similarity search (brute-force + LSH ANN), text analysis (lang-id,
  * quality, token counts, fingerprints), and event windowing/sessionization.
  * Every SQL-expressible query has a DuckDB oracle in `oracleSql` with
  * matching column names; the rest are rows-only checks whose semantics are
  * pinned by the ScalaTest suites instead. */
object SparkEntry {

  /** Flagship: full near-dup pipeline (MinHash/LSH + SimHash + winnowing +
    * connected components) over the documents table at sf=0.001. */
  def entry(spark: SparkSession): DataFrame = {
    functions.registerAll(spark)
    TrainingOps.minhashDedup(spark, "/root/testdata/sf0.001")
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // reference index/search math (DuckDB-verified on split tokens)
    "q_postings" -> ((s, d) => RelationalOps.splitPostings(s, d)),
    "q_term_stats" -> ((s, d) => RelationalOps.termStats(s, d)),
    "q_doc_stats" -> ((s, d) => RelationalOps.docStats(s, d)),
    "q_tfidf" -> ((s, d) => RelationalOps.tfidf(s, d)),
    "q_bm25" -> ((s, d) => RelationalOps.bm25(s, d)),
    "q_search_bool" -> ((s, d) => RelationalOps.searchBool(s, d)),
    "q_topk_docs" -> ((s, d) => RelationalOps.topkDocs(s, d)),
    "q_lang_dist" -> ((s, d) => RelationalOps.langDist(s, d)),
    // dedup family
    "q_exact_dedup" -> ((s, d) => TrainingOps.exactDedup(s, d)),
    "q_ngram_jaccard" -> ((s, d) => TrainingOps.ngramJaccard(s, d)),
    "q_minhash_dedup" -> ((s, d) => TrainingOps.minhashDedup(s, d)),
    "q_simhash_pairs" -> ((s, d) => TrainingOps.simhashDedup(s, d)),
    "q_winnow_dups" -> ((s, d) => TrainingOps.winnowDups(s, d)),
    // similarity search
    "q_embed_cosine" -> ((s, d) => TrainingOps.embedCosineAdjacent(s, d)),
    "q_embed_topk" -> ((s, d) => TrainingOps.embedTopK(s, d)),
    "q_ann_lsh" -> ((s, d) => TrainingOps.annLsh(s, d)),
    // text analysis
    "q_quality" -> ((s, d) => TrainingOps.qualityScore(s, d)),
    "q_token_count" -> ((s, d) => TrainingOps.tokenCount(s, d)),
    "q_lang_id" -> ((s, d) => TrainingOps.langId(s, d)),
    "q_fingerprints" -> ((s, d) => TrainingOps.fingerprints(s, d)),
    "q_nxs_postings" -> ((s, d) => RelationalOps.nxsPostings(s, d)),
    // events
    "q_events_hourly" -> ((s, d) => TrainingOps.eventsHourly(s, d)),
    "q_events_sessions" -> ((s, d) => TrainingOps.eventsSessions(s, d)))

  private val POSTINGS =
    """SELECT doc_id, term, count(*) AS cnt
      |FROM (SELECT doc_id, unnest(string_split(lower(text), ' ')) AS term
      |      FROM documents) t
      |WHERE term <> '' GROUP BY doc_id, term""".stripMargin

  def oracleSql: Map[String, String] = Map(
    "q_postings" -> POSTINGS,
    "q_term_stats" ->
      s"""WITH post AS ($POSTINGS)
         |SELECT term, count(*) AS df, CAST(sum(cnt) AS BIGINT) AS total
         |FROM post GROUP BY term""".stripMargin,
    "q_doc_stats" ->
      s"""WITH post AS ($POSTINGS)
         |SELECT doc_id, CAST(sum(cnt) AS BIGINT) AS dl,
         |       count(*) AS n_distinct
         |FROM post GROUP BY doc_id""".stripMargin,
    "q_tfidf" ->
      s"""WITH post AS ($POSTINGS),
         |stats AS (SELECT term, count(*) AS df FROM post GROUP BY term),
         |n AS (SELECT count(*) AS n FROM documents)
         |SELECT p.doc_id,
         |       round(sum(ln(p.cnt + 1) * (ln(n.n / s.df) + 1)), 4) AS score
         |FROM post p JOIN stats s ON p.term = s.term CROSS JOIN n
         |WHERE p.term IN ('spark', 'hash', 'join')
         |GROUP BY p.doc_id""".stripMargin,
    "q_bm25" ->
      s"""WITH post AS ($POSTINGS),
         |stats AS (SELECT term, count(*) AS df FROM post GROUP BY term),
         |dls AS (SELECT doc_id, CAST(sum(cnt) AS BIGINT) AS dl
         |        FROM post GROUP BY doc_id),
         |g AS (SELECT (SELECT count(*) FROM documents) AS n,
         |             (SELECT CAST(sum(cnt) AS BIGINT) FROM post) AS tc)
         |SELECT p.doc_id,
         |       round(sum((ln(p.cnt + 1) /
         |             (ln(p.cnt + 1) + 1.2 * (0.25 + 0.75 * d.dl /
         |              CAST(g.tc // g.n AS DOUBLE)))) *
         |             ln((g.n - s.df + 0.5) / (s.df + 0.5) + 1)), 4) AS score
         |FROM post p JOIN stats s ON p.term = s.term
         |JOIN dls d ON p.doc_id = d.doc_id CROSS JOIN g
         |WHERE p.term IN ('spark', 'hash', 'join')
         |GROUP BY p.doc_id""".stripMargin,
    "q_search_bool" ->
      s"""WITH post AS ($POSTINGS)
         |SELECT DISTINCT doc_id FROM post p1 WHERE p1.term = 'spark'
         |AND EXISTS (SELECT 1 FROM post p2 WHERE p2.doc_id = p1.doc_id
         |            AND p2.term IN ('hash', 'join'))
         |AND NOT EXISTS (SELECT 1 FROM post p3 WHERE p3.doc_id = p1.doc_id
         |            AND p3.term = 'slow')""".stripMargin,
    "q_topk_docs" ->
      """SELECT doc_id, n_chars FROM documents
        |ORDER BY n_chars DESC, doc_id LIMIT 10""".stripMargin,
    "q_lang_dist" -> "SELECT lang, count(*) AS n FROM documents GROUP BY lang",
    "q_exact_dedup" ->
      """SELECT min(doc_id) AS keep_id, count(*) AS n_copies
        |FROM documents GROUP BY text""".stripMargin,
    "q_ngram_jaccard" ->
      s"""WITH toks AS (SELECT DISTINCT doc_id, term FROM ($POSTINGS)),
         |counts AS (SELECT doc_id, count(*) AS n FROM toks GROUP BY doc_id),
         |inter AS (SELECT a.doc_id AS doc_id, count(*) AS inter
         |          FROM toks a JOIN toks b
         |          ON a.doc_id + 1 = b.doc_id AND a.term = b.term
         |          GROUP BY a.doc_id)
         |SELECT ca.doc_id AS doc_a,
         |       round(CAST(coalesce(i.inter, 0) AS DOUBLE) /
         |             (ca.n + cb.n - coalesce(i.inter, 0)), 4) AS jaccard
         |FROM counts ca JOIN counts cb ON ca.doc_id + 1 = cb.doc_id
         |LEFT JOIN inter i ON ca.doc_id = i.doc_id""".stripMargin,
    "q_embed_cosine" ->
      """SELECT a.vec_id AS vec_id,
        |       round(list_cosine_similarity(
        |         CAST(a.embedding AS DOUBLE[]),
        |         CAST(b.embedding AS DOUBLE[])), 4) AS cos
        |FROM embeddings a JOIN embeddings b ON a.vec_id + 1 = b.vec_id""".stripMargin,
    "q_embed_topk" ->
      """WITH scored AS (
        |  SELECT p.vec_id AS probe_id, e.vec_id AS vec_id,
        |         round(list_cosine_similarity(
        |           CAST(e.embedding AS DOUBLE[]),
        |           CAST(p.embedding AS DOUBLE[])), 4) AS cos
        |  FROM embeddings e JOIN embeddings p
        |  ON p.vec_id < 5 AND e.vec_id <> p.vec_id),
        |ranked AS (
        |  SELECT probe_id, vec_id, cos,
        |         CAST(row_number() OVER (PARTITION BY probe_id
        |             ORDER BY cos DESC, vec_id) AS INT) AS rank
        |  FROM scored)
        |SELECT probe_id, vec_id, cos, rank FROM ranked WHERE rank <= 3""".stripMargin,
    "q_quality" ->
      s"""WITH toks AS (SELECT doc_id, term FROM ($POSTINGS_RAW) WHERE term <> '')
         |SELECT doc_id, count(*) AS n_tokens,
         |       count(DISTINCT term) AS n_distinct,
         |       round(avg(length(term)), 4) AS mean_tok_len,
         |       round(CAST(sum(CASE WHEN term IN ('the','a','of','to','and',
         |         'in','is','for','with','on') THEN 1 ELSE 0 END) AS DOUBLE)
         |         / count(*), 4) AS stopword_ratio
         |FROM toks GROUP BY doc_id""".stripMargin,
    "q_token_count" ->
      s"""WITH toks AS (SELECT doc_id, term FROM ($POSTINGS_RAW) WHERE term <> '')
         |SELECT doc_id, count(*) AS ws_tokens,
         |       CAST(sum(CAST(ceil(length(term) / 4.0) AS BIGINT)) AS BIGINT)
         |         AS bpe_est
         |FROM toks GROUP BY doc_id""".stripMargin,
    "q_events_hourly" ->
      """SELECT date_trunc('hour', ts) AS hour, event_type,
        |       count(*) AS n, round(sum(value), 2) AS total_value
        |FROM events GROUP BY 1, 2""".stripMargin,
    "q_events_sessions" ->
      """WITH flagged AS (
        |  SELECT user_id, ts,
        |         CASE WHEN lag(ts) OVER w IS NULL
        |              OR date_diff('second', lag(ts) OVER w, ts) > 1800
        |              THEN 1 ELSE 0 END AS new_session
        |  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts)),
        |sess AS (
        |  SELECT user_id,
        |         CAST(sum(new_session) OVER (PARTITION BY user_id ORDER BY ts
        |           ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_idx
        |  FROM flagged)
        |SELECT user_id, max(session_idx) AS n_sessions,
        |       count(*) AS n_events
        |FROM sess GROUP BY user_id""".stripMargin)

  /** Raw token stream (duplicates kept) for per-doc stats. */
  private val POSTINGS_RAW =
    """SELECT doc_id, unnest(string_split(lower(text), ' ')) AS term
      |FROM documents""".stripMargin
}
