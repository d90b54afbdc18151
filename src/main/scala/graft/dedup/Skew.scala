package graft.dedup

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Explicit skew-handling helpers (north_rule: "salted repartitioning for
 * hot-domain skew"). Web corpora are Zipf-distributed by domain — parked
 * domains and boilerplate templates put 10^6+ pages behind single keys.
 *
 * Layered defense used by the pipeline:
 *  1. Candidate generation emits star edges per bucket (O(s), never O(s²)),
 *     so a hot bucket can't explode pair counts — see DedupPipeline.
 *  2. All bucket aggregations are algebraic (min/count) ⇒ Spark's partial
 *     aggregation already combines map-side; residual reduce-side skew is
 *     bounded by the mapper count, not the key count.
 *  3. AQE skew-join splitting handles oversized join partitions at runtime.
 *  4. For non-algebraic aggregations or when AQE is unavailable, the salted
 *     two-phase shapes below spread one hot key over `s` reducers.
 */
object Skew {

  /** Deterministic salt in [0, s) derived from `distributor` (any column
    * that varies within a hot key, e.g. url). No rand(): replay-stable. */
  def salt(distributor: Column, s: Int): Column =
    pmod(xxhash64(distributor), lit(s)).cast("int")

  /** Salted two-phase aggregation: groupBy(key, salt).agg(partials) then
    * groupBy(key).agg(merge). Caller supplies algebraic partial/merge pairs;
    * e.g. min/min, count/sum. */
  def saltedAgg(df: DataFrame, key: Column, distributor: Column, s: Int,
      partials: Seq[Column], merges: Seq[Column]): DataFrame =
    df.groupBy(key.as("k"), salt(distributor, s).as("_salt"))
      .agg(partials.head, partials.tail: _*)
      .groupBy(col("k"))
      .agg(merges.head, merges.tail: _*)

  /** Salted equi-join of a skewed fact against a dimension: the fact side
    * gets a deterministic salt, the dimension is replicated `s` times so
    * every (key, salt) bucket finds its row. Use when one join key carries
    * a large share of the fact rows and broadcast isn't possible. */
  def saltedJoin(fact: DataFrame, dim: DataFrame, key: String,
      distributor: Column, s: Int): DataFrame = {
    val saltedFact = fact.withColumn("_salt", salt(distributor, s))
    val repl = dim.withColumn("_salt",
      explode(array((0 until s).map(lit): _*)))
    saltedFact.join(repl, Seq(key, "_salt")).drop("_salt")
  }
}
