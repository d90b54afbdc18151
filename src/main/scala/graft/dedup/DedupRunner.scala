package graft.dedup

import graft.tables.StageStore
import org.apache.spark.sql.DataFrame

/**
 * Checkpointed end-to-end dedup run (north_rule: "resumable from checkpoint
 * with per-partition lineage + metrics"). Each stage commits parquet + a
 * manifest through StageStore; a killed run resumes at the first
 * uncommitted stage; a config change (different fingerprint) invalidates
 * downstream stages automatically via lineage fingerprints.
 */
object DedupRunner {

  def fingerprint(cfg: DedupConfig): String =
    s"w${cfg.shingleW}k${cfg.minhashK}b${cfg.bands}r${cfg.rowsPerBand}" +
      s"t${cfg.tau}h${cfg.simhashMaxHamming}a${cfg.winnowA}" +
      s"win${cfg.winnowWindow}s${cfg.seed}" +
      s"m${cfg.runMinhash}sh${cfg.runSimhash}wn${cfg.runWinnow}"

  /** pages → clusters, checkpointed under `ckptRoot`. */
  def run(pages: DataFrame, cfg: DedupConfig, ckptRoot: String): DataFrame = {
    val store = new StageStore(pages.sparkSession, ckptRoot)
    val fp = fingerprint(cfg)

    val sigs = store.runStage("signatures", fp) {
      DedupPipeline.signatures(pages, cfg)
    }
    // Bucket-population diagnostics (over-cap buckets fall back to star
    // edges; surfacing the count makes that recall trade observable).
    store.runStage("bucket_stats", fp, inputs = Seq("signatures")) {
      DedupPipeline.bucketStats(sigs, cfg)
    }
    val edges = store.runStage("edges", fp, inputs = Seq("signatures")) {
      DedupPipeline.edges(sigs, cfg)
    }
    val labels = store.runStage("cc_labels", fp, inputs = Seq("edges")) {
      ConnectedComponents.run(edges)
    }
    store.runStage("clusters", fp, inputs = Seq("signatures", "cc_labels")) {
      import org.apache.spark.sql.functions._
      val docs = sigs.select("url", "doc_id", "warc_ts")
      val labeled = docs
        .join(labels.withColumnRenamed("id", "doc_id"), Seq("doc_id"), "left")
        .withColumn("cluster_id", coalesce(col("comp"), col("doc_id")))
        .drop("comp")
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("cluster_id").orderBy(col("warc_ts"), col("url"))
      labeled
        .withColumn("is_champion", row_number().over(w) === 1)
        .select("url", "doc_id", "cluster_id", "is_champion")
    }
  }
}
