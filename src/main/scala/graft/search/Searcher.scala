package graft.search

import graft.text.TextPipeline
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Query execution: the reference's bitmap set algebra + ranking + top-k
 * (/root/reference/src/query/search.c:118-271), re-expressed as relational
 * algebra that Catalyst plans:
 *   leaf      → postings semi-selected by term  (bitmap copy)
 *   AND       → left-semi join on doc_id        (and_inplace)
 *   OR        → union + distinct                (or_inplace)
 *   AND NOT   → left-anti join on doc_id        (andnot_inplace)
 *   score     → sum over matching query terms per doc (results.c:128-150)
 *   top-k     → ORDER BY score DESC LIMIT k = TakeOrderedAndProject
 *               (the distributed form of the reference's capped min-heap,
 *               src/algo/heap.c:58-221)
 *
 * Unresolved query terms are trimmed before execution
 * (tokenizer.c:181-191) — Catalyst's PropagateEmptyRelation then collapses
 * the affected AND branches, the relational analogue of the reference's
 * empty-bitmap short-circuit.
 */
object Searcher {

  sealed trait Algo
  case object TfIdf extends Algo
  case object Bm25 extends Algo   // the reference default (nxs_impl.h:40)
  /** Sentinel default for `search`: score with the index's own persisted
    * algo (params.json carries filters, lang, AND algo — the reference's
    * params.db triple, /root/reference/src/core/params.c:159-198 — and the
    * reference scores a reopened index with ITS algo, not the caller's). */
  case object IndexDefault extends Algo

  final case class Prepared(
      root: QExpr,
      resolved: Map[String, String]) // leaf value -> resolved index term

  /** Leaf preparation: run each leaf through the same filter pipeline as
    * indexing — as ONE token, no word-break (query.c:99-104 calls
    * tokenize_value, not tokenize) — then TRIM unresolved terms, with
    * optional fuzzy fallback to the most popular term within Levenshtein
    * distance <= 2 (tokenizer.c:160-199; idxterm_fuzzysearch
    * idxterm.c:210-249; tolerance index.h:26). */
  def prepare(idx: SearchIndex, root: QExpr, fuzzy: Boolean): Prepared = {
    val leafVals = QueryParser.leaves(root).distinct
    val piped: Map[String, Option[String]] =
      leafVals.map(v => v -> TextPipeline.filterToken(v, idx.pipeline)).toMap
    val tokens = piped.values.flatten.toSeq.distinct
    if (tokens.isEmpty) return Prepared(root, Map.empty)

    val present: Set[String] = idx.termStats
      .where(col("term").isin(tokens: _*))
      .select("term").collect().map(_.getString(0)).toSet

    // Fuzzy fallback for ALL unresolved tokens in ONE job: probe the
    // persisted variant table when the index carries one that matches the
    // dictionary, else derive the candidates on the fly (same values).
    val unresolvedToks = tokens.filterNot(present)
    val fuzzyResolved: Map[String, String] =
      if (!fuzzy || unresolvedToks.isEmpty) Map.empty
      else {
        val cand = idx.fuzzyVariants match {
          case Some(v) => fuzzyProbe(v, unresolvedToks)
          case None => fuzzyCandidates(idx.termStats, unresolvedToks)
        }
        cand.collect().map(r => r.getString(0) -> r.getString(1)).toMap
      }

    val resolved = piped.collect {
      case (leaf, Some(tok)) if present(tok) => leaf -> tok
      case (leaf, Some(tok)) if fuzzyResolved.contains(tok) =>
        leaf -> fuzzyResolved(tok)
    }
    Prepared(root, resolved)
  }

  /** Fuzzy tolerance (edits) and the code-point length cap of the
    * symmetric-delete keyspace. Tokens longer than FuzzyMaxLen resolve
    * exactly only — the deletion neighborhood is O(L²) keys per term
    * (~2k hashes at 64), and 64 code points already covers compound words
    * and identifiers that survive tokenization; the reference's own
    * tolerance targets query terms (bounded levenshtein 2,
    * /root/reference/src/index/idxterm.c:210-249). */
  val FuzzyTolerance = graft.functions.DeleteVariantsExpr.DefaultTolerance
  val FuzzyMaxLen = graft.functions.DeleteVariantsExpr.DefaultMaxLen

  /** Most-popular in-dictionary term within Levenshtein distance <= 2 of
    * each unresolved query token, as (qtok, term) — one row per qtok.
    *
    * Access path: an EQUI-JOIN on symmetric-delete neighborhood hashes
    * (SymSpell; see DeleteVariantsExpr for the completeness argument) — the
    * relational analogue of the reference's BK-tree metric-ball bound
    * (/root/reference/src/algo/bktree.c:160-275). The per-term work is
    * generating its ~L²/2 deletion-variant hashes and probing the broadcast
    * hash table of the query tokens' variants; the bounded levenshtein runs
    * only on hash-matched candidates, never per (term × token). The variant
    * generation depends only on termStats, so at dictionary scale it
    * amortizes: materialize `term_stats × delete_variants` once per index
    * generation and this becomes a pure probe. */
  def fuzzyCandidates(termStats: DataFrame,
      unresolvedToks: Seq[String]): DataFrame =
    resolveMostPopular(
      termStats
        .select(col("term"), col("total"),
          explode(graft.functions.delete_variants(
            col("term"), FuzzyTolerance, FuzzyMaxLen)).as("vh"))
        .join(broadcast(queryVariants(termStats.sparkSession, unresolvedToks)),
          Seq("vh")))

  /** The query tokens' (qtok, variant hash) pairs — computed once per
    * resolve; tiny, broadcast. */
  private def queryVariantPairs(toks: Seq[String]): Seq[(String, Long)] =
    toks.flatMap { t =>
      graft.functions.DeleteVariantsExpr
        .hashArray(t, FuzzyTolerance, FuzzyMaxLen).map(h => (t, h))
    }

  private def queryVariants(spark: org.apache.spark.sql.SparkSession,
      toks: Seq[String]): DataFrame = {
    import spark.implicits._
    queryVariantPairs(toks).toDF("qtok", "vh")
  }

  /** Shared resolution tail for both candidate sources: exact bounded
    * levenshtein on hash-matched (qtok, term) pairs, then the most-popular
    * pick (total desc, term asc). Keeping this in one place is what makes
    * probe == derive hold by construction. */
  private def resolveMostPopular(cand: DataFrame): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("qtok").orderBy(col("total").desc, col("term"))
    cand
      .where(levenshtein(col("term"), col("qtok"), FuzzyTolerance) >= 0)
      .select("qtok", "term", "total").distinct()
      .withColumn("rn", row_number().over(w))
      .where(col("rn") === 1)
      .select("qtok", "term")
  }

  /** Fuzzy resolution against a PERSISTED variant table (vh, term, total) —
    * the probe form of fuzzyCandidates: the query tokens' variant hashes
    * filter the table at the scan (vh-sorted row groups + bloom filters
    * prune at rest; IndexStore writes both), then the same bounded
    * levenshtein + most-popular pick. Values identical to the derive path
    * by construction — both join the same complete candidate keyspace. */
  def fuzzyProbe(variants: DataFrame,
      unresolvedToks: Seq[String]): DataFrame = {
    val pairs = queryVariantPairs(unresolvedToks)
    val spark = variants.sparkSession
    import spark.implicits._
    val qv = pairs.toDF("qtok", "vh")
    val hashes = pairs.map(_._2).distinct
    // A ~2k-literal IN bloats the plan/codegen and the pushed parquet
    // predicate (several long unresolved tokens → multi-thousand literals),
    // so the isin scan filter is capped: past the cap the broadcast
    // equi-join alone resolves (same rows) and scan pruning falls back to
    // the vh bloom filter + row-group stats that the stage writes anyway.
    val probed =
      if (hashes.size <= MaxIsinHashes)
        variants.where(col("vh").isin(hashes: _*)) // pushed to the scan
      else variants
    resolveMostPopular(probed.join(broadcast(qv), Seq("vh")))
  }

  /** Cap on the vh IN-list pushed into the variant-stage scan. */
  private[search] val MaxIsinHashes = 512

  /** Evaluate the boolean algebra to the matching doc set. */
  private def evalDocs(idx: SearchIndex, p: Prepared, e: QExpr): DataFrame = {
    val spark = idx.postings.sparkSession
    def empty = idx.postings.select("doc_id").limit(0)
    e match {
      case QToken(v) =>
        p.resolved.get(v) match {
          case Some(term) =>
            idx.postings.where(col("term") === term).select("doc_id")
          case None => empty
        }
      case QAnd(l, r) =>
        evalDocs(idx, p, l).join(evalDocs(idx, p, r), Seq("doc_id"), "left_semi")
      case QOr(l, r) =>
        evalDocs(idx, p, l).unionByName(evalDocs(idx, p, r)).distinct()
      case QAndNot(l, r) =>
        evalDocs(idx, p, l).join(evalDocs(idx, p, r), Seq("doc_id"), "left_anti")
    }
  }

  /** Per-(doc, term) score column. BM25 constants and the *integer* average
    * document length division replicate /root/reference/src/algo/ranking.c
    * (k=1.2, b=0.75 :141-142; adl integer division :163). */
  private def scoreCol(idx: SearchIndex, algo: Algo): Column = algo match {
    // guard the degenerate idx.algo == IndexDefault (a hand-built
    // SearchIndex could carry the sentinel): fall to the reference default
    // rather than recursing forever
    case IndexDefault =>
      scoreCol(idx, if (idx.algo == IndexDefault) Bm25 else idx.algo)
    case TfIdf =>
      // tf = ln(cnt+1); idf = ln(N/df) + 1   (ranking.c:90-91)
      (log(col("cnt") + 1) *
        (log(lit(idx.docCount.toDouble) / col("df")) + 1)).as("score")
    case Bm25 =>
      val k = 1.2; val b = 0.75
      val adl = (idx.tokenCount / idx.docCount).toDouble // integer division!
      val tf = log(col("cnt") + 1)
      val tfBm25 = tf / (tf + lit(k) * (lit(1 - b) + lit(b) * col("dl") / lit(adl)))
      val idf = log((lit(idx.docCount.toDouble) - col("df") + 0.5) / (col("df") + 0.5) + 1)
      (tfBm25 * idf).as("score")
  }

  /** Full search: returns (doc_id, score), descending, capped at `limit`
    * (default 1000 = NXS_DEFAULT_RESULTS_LIMIT, nxs_impl.h:39). With no
    * explicit `algo` the index's own persisted algo scores (IndexDefault —
    * a TF-IDF-built index reopened without config scores TF-IDF). */
  def search(idx: SearchIndex, query: String, algo: Algo = IndexDefault,
      limit: Int = 1000, fuzzy: Boolean = true): Either[String, DataFrame] =
    QueryParser.parse(query).map { root =>
      val p = prepare(idx, root, fuzzy)
      val queryTerms = p.resolved.values.toSeq.distinct
      // docCount == 0 happens with a live dictionary: fully-deleted terms
      // stay interned (df=0) after every doc is removed — resolve succeeds
      // but there is nothing to score (and the BM25 adl would divide 0/0)
      if (queryTerms.isEmpty || idx.docCount == 0) {
        idx.postings.select(col("doc_id"), lit(0.0).as("score")).limit(0)
      } else {
        val docs = evalDocs(idx, p, root)
        // score every query term present in a matching doc, sum per doc
        // (search.c:236-271, results.c:128-150)
        idx.postings
          .where(col("term").isin(queryTerms: _*))
          .join(docs, Seq("doc_id"), "left_semi")
          .join(broadcast(idx.termStats.where(col("term").isin(queryTerms: _*))),
            Seq("term"))
          .join(idx.docStats, Seq("doc_id"))
          .select(col("doc_id"), scoreCol(idx, algo))
          .groupBy("doc_id").agg(sum("score").as("score"))
          .orderBy(col("score").desc, col("doc_id"))
          .limit(limit)
      }
    }
}
