package graft

import graft.ops.{RelationalOps, TrainingOps}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` spans the engine surface: the reference's index/query math
  * (postings, term/doc stats, TF-IDF, BM25, boolean algebra, top-k), the
  * dedup family (exact, MinHash/LSH batch AND incremental, SimHash with the
  * exact over-cap star model + its block-stats observability, n-gram
  * Jaccard, winnowing star edges + anchor-extended span evidence),
  * similarity search (brute-force, sign-LSH, IVF top-k), text analysis
  * (html extraction, lang-id, quality, token counts, fingerprints), event
  * windowing/sessionization, and multimodal frame decode — every query but
  * one carries a DuckDB oracle in `oracleSql` (matching column names), plus
  * q_video_frames as the documented rows-only case (ImageIO decode is not
  * SQL-expressible; its math is pinned by MultimodalSpec's JDK
  * independent-decode oracles instead).
  * Queries whose math is directly SQL-expressible are recomputed from
  * the input tables; the signature-based ones (minhash/simhash/winnow/ann/
  * nxs-postings/fingerprints) are verified from dumped signature primitives
  * (see Verify.writeOracleDumps) with all downstream logic — pair
  * predicates, band collisions, star edges, connected components —
  * re-derived independently in SQL. */
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
    "q_fuzzy_resolve" -> ((s, d) => RelationalOps.fuzzyResolve(s, d)),
    // dedup family
    "q_url_normalize" -> ((s, d) => TrainingOps.urlCanonical(s, d)),
    "q_exact_dedup" -> ((s, d) => TrainingOps.exactDedup(s, d)),
    "q_ngram_jaccard" -> ((s, d) => TrainingOps.ngramJaccard(s, d)),
    "q_minhash_dedup" -> ((s, d) => TrainingOps.minhashDedup(s, d)),
    "q_incremental_dedup" -> ((s, d) => TrainingOps.incrementalDedup(s, d)),
    "q_simhash_pairs" -> ((s, d) => TrainingOps.simhashDedup(s, d)),
    "q_simhash_block_stats" -> ((s, d) => TrainingOps.simhashBlockStats(s, d)),
    "q_winnow_dups" -> ((s, d) => TrainingOps.winnowDups(s, d)),
    "q_winnow_spans" -> ((s, d) => TrainingOps.winnowSpans(s, d)),
    // similarity search
    "q_embed_cosine" -> ((s, d) => TrainingOps.embedCosineAdjacent(s, d)),
    "q_embed_topk" -> ((s, d) => TrainingOps.embedTopK(s, d)),
    // tau lowered for the query only: this testdata's max pairwise cosine is
    // ~0.51 (no near-duplicate vectors planted), so the honest op default
    // (0.7) would be trivially empty here
    "q_ann_lsh" -> ((s, d) => TrainingOps.annLsh(s, d, tau = 0.3)),
    "q_embed_ivf_topk" -> ((s, d) => TrainingOps.embedIvfTopK(s, d)),
    // text analysis
    "q_html_extract" -> ((s, d) => TrainingOps.htmlExtract(s, d)),
    "q_pii_scrub" -> ((s, d) => TrainingOps.piiScrub(s, d)),
    "q_repetition" -> ((s, d) => TrainingOps.repetitionStats(s, d)),
    "q_decontaminate" -> ((s, d) => TrainingOps.decontaminate(s, d)),
    "q_quality" -> ((s, d) => TrainingOps.qualityScore(s, d)),
    "q_token_count" -> ((s, d) => TrainingOps.tokenCount(s, d)),
    "q_lang_id" -> ((s, d) => TrainingOps.langId(s, d)),
    "q_fingerprints" -> ((s, d) => TrainingOps.fingerprints(s, d)),
    "q_nxs_postings" -> ((s, d) => RelationalOps.nxsPostings(s, d)),
    "q_nation_revenue" -> ((s, d) => RelationalOps.nationRevenue(s, d)),
    // events
    "q_events_hourly" -> ((s, d) => TrainingOps.eventsHourly(s, d)),
    "q_events_sessions" -> ((s, d) => TrainingOps.eventsSessions(s, d)),
    // multimodal — ROWS-ONLY by design (no oracleSql entry): the per-frame
    // dHash runs through the JDK's ImageIO GIF codec, which no SQL engine
    // re-derives; its math is pinned instead by MultimodalSpec's
    // independent-decode oracles (GIF→PNG re-encode path, brute-force
    // Hamming equality for the pair machinery). The query itself is fully
    // deterministic: synthesized animated GIFs over the first 40 doc_ids.
    "q_video_frames" -> ((s, d) => graft.ops.MultimodalOps.videoFrameHashes(
      graft.ops.MultimodalOps.withSynthGif(
        TrainingOps.documents(s, d).select("doc_id")
          .orderBy("doc_id").limit(40), nFrames = 5))))

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
    // most-popular term within levenshtein <= 2 per probe — the oracle
    // scans the dictionary directly; Spark resolves via the symmetric-
    // delete equi-join (same result, bounded access path)
    "q_fuzzy_resolve" ->
      s"""WITH post AS ($POSTINGS),
         |stats AS (SELECT term, count(*) AS df, CAST(sum(cnt) AS BIGINT) AS total
         |          FROM post GROUP BY term),
         |probes(qtok) AS (VALUES ('sprk'), ('jion'), ('hsah'), ('mergee'),
         |                        ('zzzzzzz')),
         |cand AS (SELECT p.qtok, s.term, s.total
         |         FROM probes p JOIN stats s
         |           ON levenshtein(p.qtok, s.term) <= 2)
         |SELECT qtok, term FROM (
         |  SELECT qtok, term,
         |         row_number() OVER (PARTITION BY qtok
         |                            ORDER BY total DESC, term) AS rn
         |  FROM cand) WHERE rn = 1""".stripMargin,
    "q_nation_revenue" ->
      """SELECT r_name, n_name,
        |       round(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,4)) *
        |             CAST((1 - l_discount) AS DECIMAL(18,4))) AS DOUBLE), 2)
        |         AS revenue,
        |       count(*) AS n_items
        |FROM customer
        |JOIN orders ON c_custkey = o_custkey
        |JOIN lineitem ON o_orderkey = l_orderkey
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY r_name, n_name""".stripMargin,
    "q_exact_dedup" ->
      """SELECT min(doc_id) AS keep_id, count(*) AS n_copies
        |FROM documents GROUP BY text""".stripMargin,
    // Re-derives BOTH the messy-URL synthesis and the RFC 3986 §6
    // normalization (pct-escapes/fragment/case/userinfo/default-port/
    // trailing-dot/empty-path/tracking-params/param-sort) — see
    // functions.url_normalize and pct_normalize.
    "q_url_normalize" ->
      """WITH u AS (
        |  SELECT doc_id,
        |    (CASE WHEN doc_id % 2 = 0 THEN 'HTTP' ELSE 'https' END) || '://' ||
        |    (CASE WHEN doc_id % 9 = 0 THEN 'uSeR:p@' ELSE '' END) ||
        |    'Example' || CAST(doc_id % 7 AS VARCHAR) || '.COM' ||
        |    (CASE WHEN doc_id % 11 = 0 THEN '.' ELSE '' END) ||
        |    (CASE WHEN doc_id % 5 = 0 THEN ':80' WHEN doc_id % 5 = 1 THEN ':443'
        |          WHEN doc_id % 5 = 2 THEN ':8080' ELSE '' END) ||
        |    (CASE WHEN doc_id % 3 = 0 THEN ''
        |          ELSE '/A/b' || CAST(doc_id % 13 AS VARCHAR) END) ||
        |    (CASE WHEN doc_id % 8 = 0 AND doc_id % 3 <> 0
        |          THEN '%7Ea%2f%4B%zz%25' ELSE '' END) ||
        |    (CASE WHEN doc_id % 4 = 0 THEN '?utm_source=x&b=2&a=1'
        |          WHEN doc_id % 4 = 1 THEN '?z=1&utm_campaign=c&y='
        |          WHEN doc_id % 4 = 2 THEN '?gclid=abc' ELSE '' END) ||
        |    (CASE WHEN doc_id % 6 = 0 THEN '#sec-2' ELSE '' END) AS url_raw
        |  FROM documents),
        |pct AS (
        |  SELECT doc_id, url_raw,
        |    parts[1] || coalesce(array_to_string(list_transform(parts[2:], x ->
        |      CASE WHEN NOT regexp_matches(upper(substring(x,1,2)), '^[0-9A-F]{2}$')
        |           THEN '%' || x
        |           WHEN (upper(substring(x,1,2)) BETWEEN '41' AND '5A')
        |             OR (upper(substring(x,1,2)) BETWEEN '61' AND '7A')
        |             OR (upper(substring(x,1,2)) BETWEEN '30' AND '39')
        |             OR upper(substring(x,1,2)) IN ('2D','2E','5F','7E')
        |           THEN decode(from_hex(upper(substring(x,1,2)))) || substring(x,3)
        |           ELSE '%' || upper(substring(x,1,2)) || substring(x,3) END),
        |      ''), '') AS upct
        |  FROM (SELECT doc_id, url_raw, string_split(url_raw, '%') AS parts
        |        FROM u)),
        |q AS (
        |  SELECT doc_id, url_raw,
        |    lower(regexp_extract(pre, '^([A-Za-z][A-Za-z0-9+.-]*)://', 1)) AS scheme,
        |    regexp_extract(pre, '^[^:/?#]+://([^/?#]*)', 1) AS auth,
        |    regexp_extract(pre, '^[^:/?#]+://[^/?#]*([^?]*)', 1) AS raw_path,
        |    regexp_extract(pre, '\?(.*)$', 1) AS rawq
        |  FROM (SELECT doc_id, url_raw,
        |          regexp_extract(upct, '^[^#]*', 0) AS pre FROM pct)),
        |r AS (
        |  SELECT doc_id, url_raw, scheme,
        |    regexp_extract(auth, '^(.*@)', 1) AS userinfo,
        |    regexp_replace(regexp_replace(
        |      lower(regexp_replace(auth, '^.*@', '')), ':[0-9]+$', ''),
        |      '\.$', '') AS host,
        |    regexp_extract(lower(regexp_replace(auth, '^.*@', '')),
        |      ':([0-9]+)$', 1) AS port,
        |    CASE WHEN raw_path = '' THEN '/' ELSE raw_path END AS path,
        |    array_to_string(list_sort(list_filter(string_split(rawq, '&'),
        |      x -> x <> '' AND NOT regexp_matches(x,
        |             '^(utm_[^=&]*|gclid|fbclid|msclkid)(=|$)'))), '&') AS qs
        |  FROM q)
        |SELECT doc_id, url_raw,
        |  CASE WHEN scheme = '' THEN NULL ELSE
        |    scheme || '://' || userinfo || host ||
        |    (CASE WHEN port <> '' AND NOT (scheme = 'http' AND port = '80')
        |               AND NOT (scheme = 'https' AND port = '443')
        |          THEN ':' || port ELSE '' END) ||
        |    path ||
        |    (CASE WHEN qs <> '' THEN '?' || qs ELSE '' END)
        |  END AS url_norm
        |FROM r""".stripMargin,
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
    // Refined-IVF oracle: re-derives BOTH Lloyd iterations value-for-value
    // (assignment on 4-decimal-rounded cosines, 6-decimal-rounded per-cell
    // coordinate means, empty cells keep their centroid — see
    // TrainingOps.lloydCentroids), then the same probe-cell ranking and
    // in-cell top-k. range(1, 65): the testdata embeddings are 64-dim.
    // cents0 re-derives TrainingOps.sampleInit: lowest-16 rows of the
    // overflow-safe LCG hash of vec_id (seed 42), cell = 0-based rank.
    "q_embed_ivf_topk" ->
      s"""WITH cents0 AS (
         |  SELECT CAST(row_number() OVER (ORDER BY
         |           ((vec_id % 2147483647) * 1103515245 + 42) % 2147483648,
         |           vec_id) AS BIGINT) - 1 AS cell,
         |         CAST(embedding AS DOUBLE[]) AS cvec
         |  FROM embeddings
         |  QUALIFY row_number() OVER (ORDER BY
         |    ((vec_id % 2147483647) * 1103515245 + 42) % 2147483648,
         |    vec_id) <= 16),
         |${lloydIterSql(1)},
         |${lloydIterSql(2)},
         |assign AS (
         |  SELECT vec_id, cell FROM (
         |    SELECT e.vec_id, c.cell,
         |           row_number() OVER (PARTITION BY e.vec_id
         |             ORDER BY round(list_cosine_similarity(
         |               CAST(e.embedding AS DOUBLE[]), c.cvec), 4) DESC, c.cell) AS rn
         |    FROM embeddings e CROSS JOIN cents2 c)
         |  WHERE rn = 1),
         |probes AS (SELECT vec_id AS probe_id, CAST(embedding AS DOUBLE[]) AS pvec
         |           FROM embeddings WHERE vec_id < 5),
         |probecells AS (
         |  SELECT probe_id, pvec, cell FROM (
         |    SELECT p.probe_id, p.pvec, c.cell,
         |           row_number() OVER (PARTITION BY p.probe_id
         |             ORDER BY round(list_cosine_similarity(p.pvec, c.cvec), 4) DESC,
         |                      c.cell) AS crn
         |    FROM probes p CROSS JOIN cents2 c)
         |  WHERE crn <= 4),
         |scored AS (
         |  SELECT pc.probe_id, a.vec_id,
         |         round(list_cosine_similarity(
         |           CAST(e.embedding AS DOUBLE[]), pc.pvec), 4) AS cos
         |  FROM probecells pc JOIN assign a USING (cell)
         |  JOIN embeddings e ON e.vec_id = a.vec_id
         |  WHERE a.vec_id <> pc.probe_id)
         |SELECT probe_id, vec_id, cos, rank FROM (
         |  SELECT probe_id, vec_id, cos,
         |         CAST(row_number() OVER (PARTITION BY probe_id
         |           ORDER BY cos DESC, vec_id) AS INT) AS rank
         |  FROM scored) WHERE rank <= 3""".stripMargin,
    // Closed-form expected extraction of the deterministic page wrap built
    // in TrainingOps.htmlExtract — the whitespace class matches
    // HtmlTextExpr.isWs character-for-character.
    "q_html_extract" ->
      """SELECT doc_id,
        |  CASE WHEN text IS NULL THEN NULL
        |       ELSE trim(concat('T! Doc ', doc_id, ' ',
        |         trim(regexp_replace(text,
        |              '[ \t\n\r\f\v\x{00A0}]+', ' ', 'g')))) END AS extracted
        |FROM documents""".stripMargin,
    // Re-derives the PII synthesis AND the scrub with the IDENTICAL
    // RE2-compatible patterns (TrainingOps.EmailRe/Ipv4Re/PhoneRe) — Java
    // and RE2 agree on these constructs including greediness.
    "q_pii_scrub" ->
      """WITH p AS (
        |  SELECT doc_id,
        |    coalesce(text, '') || ' contact user' ||
        |    CAST(doc_id % 50 AS VARCHAR) || '@mail' ||
        |    CAST(doc_id % 7 AS VARCHAR) || '.example.com' ||
        |    (CASE WHEN doc_id % 3 = 0 THEN ' from 10.0.' ||
        |       CAST(doc_id % 256 AS VARCHAR) || '.' ||
        |       CAST((doc_id * 7) % 256 AS VARCHAR) ELSE '' END) ||
        |    (CASE WHEN doc_id % 4 = 0 THEN ' call +1 555 00' ||
        |       CAST(doc_id % 10 AS VARCHAR) || ' 12 34' ELSE '' END) AS t
        |  FROM documents)
        |SELECT doc_id,
        |  regexp_replace(regexp_replace(regexp_replace(t,
        |    '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
        |    '\b(\d{1,3}\.){3}\d{1,3}\b', '<IP>', 'g'),
        |    '\+?\d[\d ()-]{7,}\d', '<PHONE>', 'g') AS scrubbed,
        |  CAST(len(regexp_extract_all(t,
        |    '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS INT)
        |    AS n_emails,
        |  CAST(len(regexp_extract_all(t,
        |    '\b(\d{1,3}\.){3}\d{1,3}\b')) AS INT) AS n_ips,
        |  CAST(len(regexp_extract_all(t,
        |    '\+?\d[\d ()-]{7,}\d')) AS INT) AS n_phones
        |FROM p""".stripMargin,
    // Benchmark decontamination re-derived end to end: the same whitespace
    // tokens, 13-token windows via 1-based inclusive list slices, the same
    // doc_id % 49 benchmark slice, distinct-gram semi-join, zero-fill.
    "q_decontaminate" ->
      """WITH toks AS (
        |  SELECT doc_id,
        |    list_filter(string_split(lower(text), ' '), x -> x <> '') AS parts
        |  FROM documents WHERE text IS NOT NULL),
        |grams AS (
        |  SELECT DISTINCT doc_id, g FROM (
        |    SELECT doc_id,
        |      unnest(list_transform(generate_series(1, len(parts) - 12),
        |        i -> array_to_string(parts[i:i+12], ' '))) AS g
        |    FROM toks)),
        |bench AS (SELECT DISTINCT g FROM grams WHERE doc_id % 49 = 0),
        |hits AS (
        |  SELECT doc_id, count(*) AS n_hits
        |  FROM grams WHERE g IN (SELECT g FROM bench)
        |  GROUP BY doc_id)
        |SELECT d.doc_id,
        |  coalesce(h.n_hits, 0) AS n_hits,
        |  coalesce(h.n_hits, 0) > 0 AS contaminated
        |FROM documents d LEFT JOIN hits h ON d.doc_id = h.doc_id""".stripMargin,
    // Gopher-family repetition stats re-derived via list_zip of the token
    // list with its own tail — same whitespace split as the quality oracle.
    "q_repetition" ->
      """WITH toks AS (
        |  SELECT doc_id,
        |    list_filter(string_split(lower(text), ' '), x -> x <> '') AS parts
        |  FROM documents WHERE text IS NOT NULL),
        |bg AS (
        |  SELECT doc_id, z[1] || ' ' || z[2] AS bigram
        |  FROM (SELECT doc_id, unnest(list_zip(parts, parts[2:])) AS z
        |        FROM toks)
        |  WHERE z[2] IS NOT NULL),
        |cnts AS (
        |  SELECT doc_id, bigram, count(*) AS cnt FROM bg GROUP BY 1, 2)
        |SELECT doc_id, CAST(sum(cnt) AS BIGINT) AS n_bigrams,
        |  round(CAST(max(cnt) AS DOUBLE) / sum(cnt), 4) AS top_bigram_frac,
        |  round(CAST(sum(CASE WHEN cnt >= 2 THEN cnt ELSE 0 END) AS DOUBLE)
        |    / sum(cnt), 4) AS dup_bigram_frac
        |FROM cnts GROUP BY doc_id""".stripMargin,
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
        |FROM sess GROUP BY user_id""".stripMargin) ++ oracleSql2

  /** One Lloyd-iteration CTE block: assignment against cents(i-1) on
    * 4-decimal cosines (ties to lowest cell), per-(cell, dim) mean rounded
    * to 6 decimals, list re-assembled in dim order, empty cells inheriting
    * the previous centroid. Mirrors TrainingOps.lloydCentroids exactly. */
  private def lloydIterSql(i: Int): String =
    s"""a$i AS (SELECT vec_id, cell FROM (
       |    SELECT e.vec_id, c.cell,
       |           row_number() OVER (PARTITION BY e.vec_id
       |             ORDER BY round(list_cosine_similarity(
       |               CAST(e.embedding AS DOUBLE[]), c.cvec), 4) DESC,
       |             c.cell) AS rn
       |    FROM embeddings e CROSS JOIN cents${i - 1} c) WHERE rn = 1),
       |m$i AS (SELECT a.cell, i.i AS i,
       |               round(avg(e.embedding[CAST(i.i AS INT)]), 6) AS v
       |        FROM a$i a JOIN embeddings e USING (vec_id)
       |        CROSS JOIN range(1, 65) i(i)
       |        GROUP BY a.cell, i.i),
       |mv$i AS (SELECT cell, list(v ORDER BY i) AS mvec FROM m$i GROUP BY cell),
       |cents$i AS (SELECT c.cell, coalesce(m.mvec, c.cvec) AS cvec
       |            FROM cents${i - 1} c LEFT JOIN mv$i m USING (cell))""".stripMargin

  /** Raw token stream (duplicates kept) for per-doc stats. */
  private val POSTINGS_RAW =
    """SELECT doc_id, unnest(string_split(lower(text), ' ')) AS term
      |FROM documents""".stripMargin

  // ---- oracles over the Verify-dumped support tables (/tmp/graft_oracle,
  // see Verify.writeOracleDumps). DuckDB can't recompute ICU tokenization or
  // xxhash64 (pinned by the reference-ported golden suites), so the token /
  // hash / signature PRIMITIVES are dumped and everything downstream — pair
  // predicates, star edges, band collisions, connected components, bit-vote
  // assembly — is re-derived independently in SQL. ----

  private val SIGS = "read_parquet('/tmp/graft_oracle/dedup_sigs/*.parquet')"
  private val ANN_BUCKETS = "read_parquet('/tmp/graft_oracle/ann_buckets/*.parquet')"

  /** 16 LSH bands collide iff the corresponding 8-slot sig slices are equal
    * (xxhash64 band-key collisions only ever ADD candidates, which the
    * Jaccard filter then removes — the slice test is the exact semantics). */
  private val BAND_MATCH = (0 until 16)
    .map(i => s"a.sig[${i * 8 + 1}:${i * 8 + 8}] = b.sig[${i * 8 + 1}:${i * 8 + 8}]")
    .mkString(" OR ")

  private def langProfileSql: Map[String, String] = Map(
    "en" -> "'the','and','of','to','is','in','that','it','for','was','with','are','this','have','not'",
    "de" -> "'der','die','das','und','ist','nicht','ein','eine','mit','für','von','auf','sich','dass','ich'",
    "fr" -> "'le','la','les','et','est','un','une','des','que','pour','dans','qui','pas','sur','avec'",
    "es" -> "'el','la','los','las','y','es','un','una','que','por','para','con','del','se','no'")

  /** Band collisions (sig-slice equality), exact Jaccard, and connected
    * components re-derived from dumped signatures — shared by the
    * from-scratch (q_minhash_dedup) and incremental (q_incremental_dedup)
    * cluster queries, which must agree value-for-value. */
  private val MINHASH_CLUSTERS_SQL: String =
    s"""WITH RECURSIVE s AS (SELECT doc_id, sig, shingles FROM $SIGS),
         |cand AS (
         |  SELECT a.doc_id AS src, b.doc_id AS dst,
         |         len(list_intersect(a.shingles, b.shingles)) AS inter,
         |         len(a.shingles) + len(b.shingles) AS tot
         |  FROM s a JOIN s b ON a.doc_id < b.doc_id
         |  WHERE ($BAND_MATCH)),
         |edges AS (
         |  SELECT src, dst FROM cand
         |  WHERE tot - inter > 0
         |    AND CAST(inter AS DOUBLE) / (tot - inter) >= 0.85),
         |und AS (SELECT src AS a, dst AS b FROM edges
         |        UNION SELECT dst, src FROM edges),
         |reach(a, b) AS (
         |  SELECT a, b FROM und
         |  UNION
         |  SELECT r.a, u.b FROM reach r JOIN und u ON r.b = u.a),
         |comp AS (
         |  SELECT d.doc_id,
         |         least(d.doc_id, coalesce(min(r.b), d.doc_id)) AS cluster_id
         |  FROM s d LEFT JOIN reach r ON r.a = d.doc_id
         |  GROUP BY d.doc_id)
         |SELECT doc_id, cluster_id,
         |       row_number() OVER (PARTITION BY cluster_id
         |                          ORDER BY CAST(doc_id AS VARCHAR)) = 1 AS is_champion
         |FROM comp""".stripMargin

  def oracleSql2: Map[String, String] = Map(
    "q_nxs_postings" ->
      s"""SELECT doc_id, term, count(*) AS cnt
         |FROM (SELECT doc_id, unnest(tokens) AS term FROM $SIGS)
         |GROUP BY doc_id, term""".stripMargin,
    // Models simhashDedup's EXACT semantics, hot buckets included: blocks
    // re-derived from the dumped fingerprints; buckets <= 16 members emit
    // all verified pairs, over-cap buckets emit verified min<->member star
    // pairs only (see TrainingOps.simhashDedup contract).
    "q_simhash_pairs" ->
      s"""WITH s AS (SELECT doc_id, simhash FROM $SIGS),
         |b AS (SELECT doc_id, simhash, CAST(r.i AS INT) AS block,
         |             (simhash >> CAST(r.i * 16 AS INT)) & 65535 AS bval
         |      FROM s CROSS JOIN range(4) r(i)),
         |stats AS (SELECT block, bval, min(doc_id) AS mn, count(*) AS sz
         |          FROM b GROUP BY block, bval HAVING count(*) > 1),
         |small AS (
         |  SELECT x.doc_id AS src, y.doc_id AS dst
         |  FROM b x JOIN b y USING (block, bval)
         |  JOIN stats st USING (block, bval)
         |  WHERE st.sz <= 16 AND x.doc_id < y.doc_id
         |    AND bit_count(xor(x.simhash, y.simhash)) <= 3),
         |star AS (
         |  SELECT st.mn AS src, x.doc_id AS dst
         |  FROM b x JOIN stats st USING (block, bval)
         |  JOIN s smn ON smn.doc_id = st.mn
         |  WHERE st.sz > 16 AND x.doc_id <> st.mn
         |    AND bit_count(xor(x.simhash, smn.simhash)) <= 3)
         |SELECT DISTINCT src, dst
         |FROM (SELECT * FROM small UNION ALL SELECT * FROM star)""".stripMargin,
    "q_simhash_block_stats" ->
      s"""WITH s AS (SELECT doc_id, simhash FROM $SIGS),
         |b AS (SELECT doc_id, CAST(r.i AS INT) AS block,
         |             (simhash >> CAST(r.i * 16 AS INT)) & 65535 AS bval
         |      FROM s CROSS JOIN range(4) r(i)),
         |g AS (SELECT block, bval, count(*) AS sz
         |      FROM b GROUP BY block, bval HAVING count(*) > 1)
         |SELECT block, count(*) AS n_buckets, CAST(sum(sz) AS BIGINT) AS members,
         |       CAST(sum(CASE WHEN sz > 16 THEN 1 ELSE 0 END) AS BIGINT) AS over_cap,
         |       CAST(max(sz) AS BIGINT) AS max_sz
         |FROM g GROUP BY block""".stripMargin,
    "q_winnow_dups" ->
      s"""WITH f AS (SELECT doc_id, unnest(winnow_fps20) AS fp FROM $SIGS),
         |stats AS (SELECT fp, min(doc_id) AS mn, count(*) AS sz
         |          FROM f GROUP BY fp HAVING count(*) > 1)
         |SELECT DISTINCT s.mn AS src, f.doc_id AS dst
         |FROM f JOIN stats s USING (fp) WHERE f.doc_id <> s.mn""".stripMargin,
    // Anchor-extend span evidence: delta-grouped positioned anchors, split
    // into runs at anchor gaps > win (winnowing guarantees an anchor per
    // win-position window inside one true run), + exact token-hash
    // extension — re-derived 1:1 (see TrainingOps.winnowSpans; win=11).
    "q_winnow_spans" ->
      s"""WITH fp AS (SELECT doc_id, unnest(winnow_pos20, recursive := true)
         |            FROM $SIGS),
         |fd AS (SELECT DISTINCT doc_id, fp FROM fp),
         |stats AS (SELECT fp, min(doc_id) AS mn FROM fd
         |          GROUP BY fp HAVING count(*) > 1),
         |pairs AS (SELECT DISTINCT s.mn AS src, fd.doc_id AS dst
         |          FROM fd JOIN stats s USING (fp) WHERE fd.doc_id <> s.mn),
         |anch AS (
         |  SELECT p.src, p.dst, fa.pos AS pos_a, fa.pos - fb.pos AS delta
         |  FROM pairs p
         |  JOIN fp fa ON fa.doc_id = p.src
         |  JOIN fp fb ON fb.doc_id = p.dst AND fb.fp = fa.fp),
         |lagd AS (
         |  SELECT src, dst, delta, pos_a,
         |         lag(pos_a) OVER (PARTITION BY src, dst, delta
         |                          ORDER BY pos_a) AS prev
         |  FROM anch),
         |runs AS (
         |  SELECT src, dst, delta, pos_a,
         |         sum(CASE WHEN prev IS NULL OR pos_a - prev > 11
         |                  THEN 1 ELSE 0 END)
         |           OVER (PARTITION BY src, dst, delta ORDER BY pos_a
         |                 ROWS UNBOUNDED PRECEDING) AS run_id
         |  FROM lagd),
         |g AS (SELECT src, dst, delta, run_id,
         |             min(pos_a) AS min_a, max(pos_a) AS max_a
         |      FROM runs GROUP BY src, dst, delta, run_id),
         |t AS (SELECT g.*, g.min_a - g.delta AS min_b, g.max_a - g.delta AS max_b,
         |             sa.token_hashes AS th_a, sb.token_hashes AS th_b
         |      FROM g JOIN $SIGS sa ON sa.doc_id = g.src
         |             JOIN $SIGS sb ON sb.doc_id = g.dst),
         |e AS (
         |  SELECT src, dst,
         |    (max_a - min_a) + 20 +
         |    CASE WHEN least(min_a, min_b) >= 1 THEN
         |      coalesce(list_min(list_filter(range(1, least(min_a, min_b) + 1),
         |        x -> th_a[min_a - x + 1] <> th_b[min_b - x + 1])) - 1,
         |        least(min_a, min_b)) ELSE 0 END +
         |    CASE WHEN least(len(th_a) - (max_a + 20),
         |                    len(th_b) - (max_b + 20)) >= 1 THEN
         |      coalesce(list_min(list_filter(
         |        range(1, least(len(th_a) - (max_a + 20),
         |                       len(th_b) - (max_b + 20)) + 1),
         |        x -> th_a[max_a + 20 + x] <> th_b[max_b + 20 + x])) - 1,
         |        least(len(th_a) - (max_a + 20), len(th_b) - (max_b + 20)))
         |      ELSE 0 END
         |    AS span
         |  FROM t)
         |SELECT src, dst, CAST(max(span) AS INT) AS span_tokens
         |FROM e GROUP BY src, dst""".stripMargin,
    "q_minhash_dedup" -> MINHASH_CLUSTERS_SQL,
    // Incremental ingest must land on the SAME clusters as the from-scratch
    // run — one oracle serves both (see TrainingOps.incrementalDedup).
    "q_incremental_dedup" -> MINHASH_CLUSTERS_SQL,
    "q_ann_lsh" ->
      s"""WITH b AS (SELECT vec_id, bucket_key FROM $ANN_BUCKETS),
         |stats AS (SELECT bucket_key, min(vec_id) AS mn, count(*) AS sz
         |          FROM b GROUP BY bucket_key HAVING count(*) > 1),
         |small AS (SELECT bucket_key FROM stats WHERE sz <= 16),
         |sp AS (SELECT x.vec_id AS src, y.vec_id AS dst
         |       FROM b x JOIN b y USING (bucket_key) JOIN small USING (bucket_key)
         |       WHERE x.vec_id < y.vec_id),
         |star AS (SELECT s.mn AS src, b.vec_id AS dst
         |         FROM b JOIN stats s USING (bucket_key)
         |         WHERE s.sz > 16 AND b.vec_id <> s.mn),
         |cand AS (SELECT DISTINCT src, dst
         |         FROM (SELECT * FROM sp UNION ALL SELECT * FROM star)),
         |scored AS (
         |  SELECT c.src AS id_a, c.dst AS id_b,
         |         list_cosine_similarity(CAST(ea.embedding AS DOUBLE[]),
         |                                CAST(eb.embedding AS DOUBLE[])) AS cos_raw
         |  FROM cand c
         |  JOIN embeddings ea ON ea.vec_id = c.src
         |  JOIN embeddings eb ON eb.vec_id = c.dst)
         |SELECT id_a, id_b, round(cos_raw, 4) AS cos
         |FROM scored WHERE cos_raw >= 0.3""".stripMargin,
    "q_fingerprints" ->
      s"""WITH t AS (SELECT doc_id, unnest(token_hashes) AS h FROM $SIGS),
         |bits AS (
         |  SELECT doc_id, r.b AS b,
         |         sum(CASE WHEN (h >> r.b) & 1 = 1 THEN 1 ELSE -1 END) AS vote
         |  FROM t CROSS JOIN range(64) r(b) GROUP BY doc_id, r.b),
         |sh AS (
         |  SELECT doc_id,
         |         CAST(sum(CASE WHEN vote > 0 THEN
         |           CASE WHEN b = 63 THEN -9223372036854775807 - 1
         |                ELSE (1::BIGINT << CAST(b AS INT)) END ELSE 0 END) AS BIGINT)
         |           AS simhash
         |  FROM bits GROUP BY doc_id)
         |SELECT d.doc_id, coalesce(sh.simhash, 0) AS simhash,
         |       CAST(len(d.winnow_fps8) AS INT) AS n_fingerprints
         |FROM $SIGS d LEFT JOIN sh ON sh.doc_id = d.doc_id""".stripMargin,
    "q_lang_id" ->
      s"""WITH d AS (
         |  SELECT doc_id, lang, text, left(coalesce(text, ''), 4000) AS head
         |  FROM documents),
         |feat AS (
         |  SELECT doc_id, lang, text,
         |    length(head) AS total,
         |    length(head) - length(regexp_replace(head, '\\p{Han}', '', 'g')) AS han,
         |    length(head) - length(regexp_replace(head, '[\\p{Hiragana}\\p{Katakana}]', '', 'g')) AS kana,
         |    length(head) - length(regexp_replace(head, '\\p{Hangul}', '', 'g')) AS hangul,
         |    list_slice(regexp_split_to_array(lower(head), '[^\\p{L}'']+'), 1, 500) AS words
         |  FROM d),
         |cnt AS (
         |  SELECT doc_id, lang, text, total, han, kana, hangul,
         |    len(list_filter(words, w -> w IN (${langProfileSql("en")}))) AS c_en,
         |    len(list_filter(words, w -> w IN (${langProfileSql("de")}))) AS c_de,
         |    len(list_filter(words, w -> w IN (${langProfileSql("fr")}))) AS c_fr,
         |    len(list_filter(words, w -> w IN (${langProfileSql("es")}))) AS c_es
         |  FROM feat)
         |SELECT doc_id, lang,
         |  CASE WHEN text IS NULL THEN NULL
         |    WHEN total = 0 THEN 'und'
         |    WHEN (han + kana + hangul) * 10 >= total AND han + kana + hangul > 0 THEN
         |      CASE WHEN kana > 0 THEN 'ja' WHEN hangul > han THEN 'ko' ELSE 'zh' END
         |    WHEN c_en = 0 AND c_de = 0 AND c_fr = 0 AND c_es = 0 THEN 'und'
         |    WHEN c_en >= c_de AND c_en >= c_fr AND c_en >= c_es THEN 'en'
         |    WHEN c_de >= c_fr AND c_de >= c_es THEN 'de'
         |    WHEN c_fr >= c_es THEN 'fr'
         |    ELSE 'es' END AS pred_lang
         |FROM cnt""".stripMargin)
}
