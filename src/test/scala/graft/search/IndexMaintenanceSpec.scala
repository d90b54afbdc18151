package graft.search

import graft.SparkTestBase
import graft.text.TextPipeline
import org.scalatest.funsuite.AnyFunSuite

/** Delete (tombstone) semantics mirror
  * /root/reference/src/tests/t_index_remove.c: a removed doc disappears from
  * results, counters decrement, and re-adding the same id is rejected while
  * present (nxs.c:498-511). Incremental add mirrors the terms/dtmap sync
  * path (terms.c:320-414): stats after add(idx, d2) == stats of
  * build(d1 ∪ d2). */
class IndexMaintenanceSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark
  import spark.implicits._

  private val base = Seq(
    1L -> "cats eat fish",
    2L -> "dogs eat meat",
    3L -> "cats and dogs play")

  private def build(docs: Seq[(Long, String)]): SearchIndex =
    SearchIndex.build(docs.toDF("doc_id", "text"), TextPipeline.noStopwords)

  private def searchIds(idx: SearchIndex, q: String): Set[Long] =
    Searcher.search(idx, q).fold(e => fail(e),
      _.select("doc_id").as[Long].collect().toSet)

  test("remove tombstones a doc: gone from results, counters decremented") {
    val idx = build(base)
    assert(searchIds(idx, "cats") == Set(1L, 3L))
    val idx2 = IndexMaintenance.remove(idx, Seq(1L).toDF("doc_id"))
    assert(searchIds(idx2, "cats") == Set(3L))
    assert(idx2.docCount == idx.docCount - 1)
    assert(idx2.tokenCount == idx.tokenCount - 3)
    // term only present in the removed doc STAYS INTERNED at df=0 — the
    // reference never reuses or compacts term ids on delete (terms.c); a
    // query on it just finds no postings
    val fishBefore = idx.termStats.where("term = 'fish'")
      .select("term_id").as[Long].collect().head
    val fishRow = idx2.termStats.where("term = 'fish'")
      .select("term_id", "df").as[(Long, Long)].collect()
    assert(fishRow.toSeq == Seq((fishBefore, 0L)))
    assert(searchIds(idx2, "fish") == Set.empty[Long])
    // shared term df decremented, not dropped
    val catRow = idx2.termStats.where("term = 'cat'")
      .select("df").as[Long].collect()
    assert(catRow.toSeq == Seq(1L))
  }

  test("fully-deleted term keeps its interned id across delete/re-add") {
    val idx = build(base)
    val fishId = idx.termStats.where("term = 'fish'")
      .select("term_id").as[Long].collect().head
    val removed = IndexMaintenance.remove(idx, Seq(1L).toDF("doc_id"))
    val readded = IndexMaintenance.add(removed,
      Seq(7L -> "fish swim").toDF("doc_id", "text"))
    val after = readded.termStats.where("term = 'fish'")
      .select("term_id", "df").as[(Long, Long)].collect()
    assert(after.toSeq == Seq((fishId, 1L)))
    assert(searchIds(readded, "fish") == Set(7L))
  }

  test("incremental add equals full rebuild; duplicate ids rejected") {
    val extra = Seq(4L -> "fish play in water", 1L -> "duplicate id ignored")
    val idx = build(base)
    val added = IndexMaintenance.add(idx, extra.toDF("doc_id", "text"))
    val full = build(base :+ (4L -> "fish play in water"))
    assert(added.docCount == full.docCount)
    assert(added.tokenCount == full.tokenCount)
    // full tuple including term_id: incremental interning must assign the
    // SAME dense first-seen ids as a from-scratch rebuild over base ∪ extra
    val a = added.termStats.orderBy("term")
      .as[(String, Long, Long, Long)].collect()
    val f = full.termStats.orderBy("term")
      .as[(String, Long, Long, Long)].collect()
    assert(a.toSeq == f.toSeq)
    // doc 1 keeps its ORIGINAL text (duplicate add rejected)
    assert(searchIds(added, "duplicate") == Set.empty[Long])
  }

  test("remove then re-add the same id succeeds (t_index_remove.c flow)") {
    val idx = build(base)
    val removed = IndexMaintenance.remove(idx, Seq(2L).toDF("doc_id"))
    val readded = IndexMaintenance.add(removed,
      Seq(2L -> "dogs eat meat").toDF("doc_id", "text"))
    assert(searchIds(readded, "dogs") == Set(2L, 3L))
    assert(readded.docCount == idx.docCount)
    assert(readded.tokenCount == idx.tokenCount)
  }

  test("json response matches the reference wire shape (results.c:152-220)") {
    val idx = build(base)
    val res = Searcher.search(idx, "cats").fold(e => fail(e), identity)
    val json = IndexMaintenance.toJsonResponse(res)
    assert(json.matches(
      """\{"results":\[(\{"doc_id":\d+,"score":\d+\.\d{6}\},?)+\],"count":2\}"""))
  }
}
