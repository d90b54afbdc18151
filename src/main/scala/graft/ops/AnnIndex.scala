package graft.ops

import graft.tables.StageStore
import org.apache.spark.sql.{DataFrame, SparkSession}

/**
 * Durable ANN index state — the Lloyd-refined IVF coarse quantizer
 * persisted as a committed StageStore stage, the ANN analogue of the
 * search index's durable tables: the refinement runs once per corpus
 * generation, is published under an atomic manifest (the same publish
 * discipline as the reference's atomic header publish,
 * /root/reference/src/index/terms.c:302-305), and every query session
 * reopens the committed table instead of re-clustering. A killed build
 * resumes; a rebuild with identical (nCells, iters) is a no-op read; a
 * parameter change fingerprints differently and recomputes.
 */
object AnnIndex {

  val CentroidsStage = "ivf_centroids"

  /** Build-or-open the refined centroid table (cell, cvec: array<double>)
    * under `root`. `embeddings` is only evaluated when the stage is not
    * already committed with this (nCells, iters) fingerprint. */
  def buildOrOpenCentroids(spark: SparkSession, root: String,
      embeddings: => DataFrame, nCells: Int = 16, iters: Int = 2): DataFrame =
    // the fingerprint names the init scheme: a persisted selection-init
    // (pre-r6) quantizer must invalidate, not silently serve, once the
    // sampled init landed
    new StageStore(spark, root).runStage(CentroidsStage,
      s"nCells=$nCells|iters=$iters|r6mean|init=sample42") {
      TrainingOps.lloydCentroids(embeddings, nCells, iters)
    }

  /** IVF top-k served from the PERSISTED quantizer (never re-clusters —
    * the stage must already be committed with these params). */
  def topK(spark: SparkSession, root: String, embeddings: DataFrame,
      nCells: Int = 16, iters: Int = 2,
      nprobeCells: Int = 4, nProbes: Int = 5, k: Int = 3): DataFrame =
    TrainingOps.ivfTopKFrom(embeddings,
      buildOrOpenCentroids(spark, root, sys.error(
        s"no committed $CentroidsStage under $root — build first"): DataFrame,
        nCells, iters),
      nprobeCells, nProbes, k)
}
