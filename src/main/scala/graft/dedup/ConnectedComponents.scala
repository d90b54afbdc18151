package graft.dedup

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Connected components on an edge DataFrame — iterative minimum-label
 * propagation, pure DataFrame algebra (no RDDs).
 *
 * Each iteration: every node adopts the min component id among itself and
 * its neighbors (one shuffle for the message join + one for the min-agg).
 * Iterations run until a fixpoint, with `localCheckpoint` per round to cut
 * the growing lineage (north_rule: checkpointed CC iterations).
 *
 * Scale note: the candidate-generation stages emit *star* edges per bucket
 * (bucket-min ↔ member), so component diameter is bounded by a small
 * constant (a path min↔a, min↔b across buckets has length 2). Label
 * propagation therefore converges in ~O(log star-chain) ≈ 3–6 rounds even
 * at 10^12 docs — the pathological long-path case that motivates
 * large-star/small-star (Kiveris et al., "Connected Components in MapReduce
 * and Beyond") cannot arise from our edge generator. The convergence check
 * is a cheap count of changed labels with AQE-planned joins.
 */
object ConnectedComponents {

  /** @param edges DataFrame with (src: long, dst: long)
    * @return (id: long, comp: long) for every node appearing in edges;
    *         comp = min node id of the component. */
  def run(edges: DataFrame, maxIter: Int = 25): DataFrame = {
    val spark = edges.sparkSession
    val e = edges.select(col("src"), col("dst"))
      .where(col("src") =!= col("dst"))
      .distinct()
      .localCheckpoint(true)

    // Symmetric adjacency (both directions) — one relation reused each round.
    val adj = e.unionByName(e.select(col("dst").as("src"), col("src").as("dst")))
      .localCheckpoint(true)
    org.apache.spark.sql.graft.bridge.unpersistCheckpoint(e)

    var labels = adj.select(col("src").as("id")).distinct()
      .withColumn("comp", col("id"))
      .localCheckpoint(true)

    // Convergence check: labels only ever decrease, so the exact decimal sum
    // of comp over all nodes strictly decreases until fixpoint — comparing
    // sums per round is one narrow aggregate over the (checkpointed) labels
    // relation, much cheaper than the join-and-count-diffs alternative.
    def labelSum(df: DataFrame): java.math.BigDecimal =
      df.agg(coalesce(sum(col("comp").cast("decimal(38,0)")),
          lit(java.math.BigDecimal.ZERO))).collect()(0)
        .getDecimal(0)

    var prevSum = labelSum(labels)
    var iter = 0
    var converged = false
    while (iter < maxIter && !converged) {
      // (a) neighbor-min: each edge forwards the src's current comp to dst
      val msgs = adj
        .join(labels.withColumnRenamed("id", "src"), "src")
        .groupBy(col("dst").as("id"))
        .agg(min("comp").as("nbr_comp"))
      val stepped = labels
        .join(msgs, Seq("id"), "left")
        .select(col("id"),
          least(col("comp"), coalesce(col("nbr_comp"), col("comp"))).as("comp"))
      // (b) pointer jumping: comp <- comp(comp). Labels only decrease, so
      // comp(comp) <= comp; this doubles the propagation horizon per round
      // (hash-to-min style), giving O(log diameter) convergence instead of
      // O(diameter).
      val parents = stepped
        .select(col("id").as("comp"), col("comp").as("pcomp"))
      val next = stepped
        .join(parents, Seq("comp"), "left")
        .select(col("id"), coalesce(col("pcomp"), col("comp")).as("comp"))
        .localCheckpoint(true)
      val nextSum = labelSum(next)
      // `next` is materialized (eager checkpoint): release the superseded
      // iterate's blocks now rather than waiting for driver GC.
      org.apache.spark.sql.graft.bridge.unpersistCheckpoint(labels)
      labels = next
      converged = nextSum.compareTo(prevSum) == 0
      prevSum = nextSum
      iter += 1
    }
    org.apache.spark.sql.graft.bridge.unpersistCheckpoint(adj)
    labels
  }
}
