package graft.functions

import graft.SparkTestBase
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class BoundedBucketAggSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark
  import spark.implicits._

  test("complete membership under the cap, true min/count over it") {
    val cap = 4
    val rows =
      (1 to 3).map(i => ("small", i.toLong, i.toLong * 10)) ++
        (1 to 9).map(i => ("big", 10L - i, i.toLong)) // min doc_id = 1, aux 9
    val out = rows.toDF("k", "doc_id", "aux")
      .groupBy("k")
      .agg(graft.functions.bounded_bucket(col("doc_id"), col("aux"), cap).as("g"))
      .select(col("k"), col("g.sz"), col("g.mn"), col("g.mn_aux"),
        size(col("g.members")).as("n_members"), col("g.members"))
      .collect().map(r => r.getString(0) -> r).toMap

    val small = out("small")
    assert(small.getLong(1) == 3 && small.getLong(2) == 1 && small.getLong(3) == 10)
    assert(small.getInt(4) == 3) // complete: sz <= cap
    val big = out("big")
    assert(big.getLong(1) == 9)
    assert(big.getLong(2) == 1 && big.getLong(3) == 9) // true min even if trimmed
    assert(big.getInt(4) == cap + 1) // bounded
  }

  test("members survive reduce-side merge into an empty buffer (r7 inline-member regression)") {
    // The final aggregation merges deserialized partials into a FRESH empty
    // buffer; with the r7 inline-first-member layout, a multi-member partial
    // merged into an empty buffer pre-allocates the arrays before member 0
    // is appended — a first cut wrote member 0 to the inline fields anyway
    // and idAt(0) then read a zeroed array slot (phantom doc_id 0, caught by
    // the dedup oracles). Force multi-member partials with a repartition so
    // every map partition produces >= 2 members for the key.
    val cap = 16
    val rows = (1 to 6).map(i => ("k", 100L + i, i.toLong))
    val members = rows.toDF("k", "doc_id", "aux")
      .repartition(2) // 2 partials, each multi-member
      .groupBy("k")
      .agg(graft.functions.bounded_bucket(col("doc_id"), col("aux"), cap).as("g"))
      .select(explode(col("g.members")).as("m"))
      .select(col("m.doc_id"), col("m.aux"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    assert(members == (1 to 6).map(i => (100L + i, i.toLong)))
  }

  test("bounded under repartitioned partial aggregation") {
    val cap = 8
    val df = spark.range(10000).select(lit("k").as("k"), col("id").as("doc_id"),
      lit(0L).as("aux")).repartition(32)
    val r = df.groupBy("k")
      .agg(graft.functions.bounded_bucket(col("doc_id"), col("aux"), cap).as("g"))
      .select(col("g.sz"), col("g.mn"), size(col("g.members"))).collect()(0)
    assert(r.getLong(0) == 10000 && r.getLong(1) == 0 && r.getInt(2) == cap + 1)
  }
}
