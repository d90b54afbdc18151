package graft.search

import graft.SparkTestBase
import graft.text.TextPipeline
import org.scalatest.funsuite.AnyFunSuite

/** Scoring goldens ported verbatim from
  * /root/reference/src/tests/t_scoring.c:16-158 (tolerance 1e-4 per
  * helpers.c:215) and query-logic goldens from t_querylogic.c:16-56.
  * Like the reference tests, the index is built with the default filter
  * pipeline but no stopword list on disk (fresh basedir ⇒ stopword filter
  * is a pass-through). */
class SearcherSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark
  import spark.implicits._

  private def buildIndex(docs: Seq[(Long, String)]): SearchIndex =
    SearchIndex.build(docs.toDF("doc_id", "text"), TextPipeline.noStopwords)

  private def run(idx: SearchIndex, q: String, algo: Searcher.Algo):
      Map[Long, Double] =
    Searcher.search(idx, q, algo).fold(
      e => fail(s"query [$q] failed: $e"),
      df => df.as[(Long, Double)].collect().toMap)

  private def checkCase(docs: Seq[(Long, String)], query: String,
      expected: Seq[(Long, Double, Double)]): Unit = {
    val idx = buildIndex(docs)
    for ((algo, idx2) <- Seq(Searcher.TfIdf -> 0, Searcher.Bm25 -> 1)) {
      val got = run(idx, query, algo)
      assert(got.size == expected.size,
        s"[$query/$algo] result count ${got.size} != ${expected.size}: $got")
      expected.foreach { case (id, tfidf, bm25) =>
        val exp = if (idx2 == 0) tfidf else bm25
        assert(got.contains(id), s"[$query/$algo] doc $id missing")
        assert(math.abs(got(id) - exp) < 1e-4,
          f"[$query/$algo] doc $id score ${got(id)}%.6f != $exp%.6f")
      }
    }
  }

  private val docs1 = Seq(
    1L -> "The quick brown fox jumped over the lazy dog",
    2L -> "Once upon a time there were three little foxes")

  test("t_scoring case 1: basic score") {
    checkCase(docs1, "dog", Seq((1L, 1.1736, 0.253785)))
  }

  test("t_scoring case 2: equal scores across docs") {
    checkCase(docs1, "fox", Seq(
      (1L, 0.693147, 0.066754), (2L, 0.693147, 0.066754)))
  }

  test("t_scoring case 3: multi-term sum") {
    checkCase(docs1, "fox dog", Seq(
      (1L, 1.1736 + 0.693147, 0.253785 + 0.066754),
      (2L, 0.693147, 0.066754)))
  }

  test("t_scoring case 4: TF weighting") {
    checkCase(Seq(1L -> "cat dog rat", 2L -> "cat cat dog"), "cat", Seq(
      (1L, 0.693147, 0.066754), (2L, 1.098612, 0.087140)))
  }

  test("t_scoring case 5: term variety") {
    checkCase(Seq(
      1L -> "cat cat dog dog", 2L -> "dog dog cat cat",
      3L -> "cat dog rat cow", 4L -> "cat dog rat bat"),
      "cat dog rat cow", Seq(
        (1L, 2.197225, 0.100713), (2L, 2.197225, 0.100713),
        (3L, 4.213948, 0.771754), (4L, 2.559895, 0.330938)))
  }

  test("t_scoring case 6: TF saturation") {
    checkCase(Seq(
      1L -> "aa aa aa aa aa aa aa aa aa aa aa aa aa aa aa aa aa aa aa aa",
      2L -> "aa aa aa aa aa aa aa aa aa aa bb bb bb bb bb bb bb bb bb bb",
      3L -> "aa bb bb bb bb bb bb bb bb bb bb bb bb bb bb bb bb bb bb bb"),
      "aa", Seq(
        (1L, 3.044523, 0.095780), (2L, 2.397895, 0.088995),
        (3L, 0.693147, 0.048890)))
  }

  test("t_scoring case 7: doc length normalization (BM25)") {
    checkCase(Seq(
      1L -> ("This is a very long document about the cats " +
             "All kind of cats including the tabby and other cats"),
      2L -> "cats cats cats",
      3L -> "cats cats dogs"),
      "cats", Seq(
        (1L, 1.386294, 0.048411), (2L, 1.386294, 0.091469),
        (3L, 1.098612, 0.084499)))
  }

  private val logicDocs = Seq(
    1L -> "Textbook about Erlang in Linux environment",
    2L -> "Unix Shell scripting textbook",
    3L -> "Erlang and Python examples",
    4L -> "Textbook about Python using Linux and Windows",
    5L -> "All but NOT: Textbook Erlang Python Shell Linux Unix Java",
    6L -> "All keywords: Textbook Erlang Python Shell Linux Unix")

  test("t_querylogic: unused term -> empty") {
    val idx = buildIndex(logicDocs)
    assert(run(idx, "non-existant-term", Searcher.Bm25).isEmpty)
  }

  test("t_querylogic: single term") {
    val idx = buildIndex(logicDocs)
    assert(run(idx, "unix", Searcher.Bm25).keySet == Set(2L, 5L, 6L))
  }

  test("t_querylogic: composite boolean query") {
    val idx = buildIndex(logicDocs)
    val q = "textbook AND (Erlang OR Python OR Shell) AND " +
      "(Linux OR Unix) AND NOT (Windows OR Java)"
    assert(run(idx, q, Searcher.Bm25).keySet == Set(1L, 2L, 6L))
    assert(run(idx, q, Searcher.TfIdf).keySet == Set(1L, 2L, 6L))
  }

  test("fuzzy resolve: tolerance 2, most-popular wins") {
    // 'unxi' is distance 2 from 'unix'
    val idx = buildIndex(logicDocs)
    assert(run(idx, "unxi", Searcher.Bm25).keySet == Set(2L, 5L, 6L))
    // fuzzy off -> no results
    val r = Searcher.search(idx, "unxi", Searcher.Bm25, fuzzy = false)
      .toOption.get.count()
    assert(r == 0)
  }

  test("fuzzy resolve is an equi-join on deletion-neighborhood keys, not BNLJ") {
    val idx = buildIndex(logicDocs)
    val df = Searcher.fuzzyCandidates(idx.termStats, Seq("unxi", "documnt"))
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
    assert(plan.contains("BroadcastHashJoin") || plan.contains("SortMergeJoin"),
      plan)
    // resolution values unchanged from the scan-based path
    val got = df.collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(got("unxi") == "unix", got)
    // symmetric-delete edge: full 2-substitution on a 2-cp token still found
    // iff a dictionary term is within distance 2 (empty-variant bucket)
  }

  test("limit caps results (top-k)") {
    val idx = buildIndex(logicDocs)
    val top = Searcher.search(idx, "textbook", Searcher.Bm25, limit = 2)
      .toOption.get.collect()
    assert(top.length == 2)
    // scores descending
    assert(top(0).getDouble(1) >= top(1).getDouble(1))
  }

  test("top-k plan uses TakeOrderedAndProject") {
    val idx = buildIndex(logicDocs)
    val df = Searcher.search(idx, "textbook", Searcher.Bm25, limit = 5).toOption.get
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), plan)
  }

  test("custom registry filter applies at indexing AND query preparation") {
    // the reference's Lua-filter story: the same user filter runs inside
    // indexing and inside query prepare (filters_lua.c:74-289)
    graft.text.CustomFilters.register("brit_search",
      s => Some(if (s == "colour") "color" else s))
    val cfg = graft.text.PipelineConfig(
      filters = Seq("normalizer", "custom:brit_search", "stemmer"),
      stopwordsEnabled = false)
    val idx = SearchIndex.build(
      Seq(1L -> "the color is red", 2L -> "nothing else").toDF("doc_id", "text"),
      cfg)
    // query leaf "Colour" must resolve through the custom filter to the
    // indexed term — exact resolve, no fuzzy assist
    val got = Searcher.search(idx, "Colour", Searcher.Bm25, fuzzy = false)
      .fold(e => fail(e), df => df.as[(Long, Double)].collect().toMap)
    assert(got.keySet == Set(1L), got)
  }
}
