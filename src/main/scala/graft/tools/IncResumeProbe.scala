package graft.tools

import graft.dedup.{DedupConfig, IncrementalDedup}
import org.apache.spark.sql.SparkSession

/** Diagnostic probe: resume a half-ingested delta batch of the BENCH
  * incremental store (Bench.scala's `incremental_delta_ingest` state) with
  * full stack traces — the bench's error handling only prints
  * `getMessage`, which is null for unboxing NPEs and some Spark aborts.
  *
  * Usage: IncResumeProbe <storeRoot> <nClusters> <batchId|compact|clusters>
  * (batchId `delta_<off>` re-derives its pages from the offset, like the
  * bench's own crashed-batch recovery; `compact` folds the store;
  * `clusters` materializes the full resolve.)
  */
object IncResumeProbe {
  def main(args: Array[String]): Unit = {
    val root = args(0)
    val nClusters = args(1).toInt
    val batchId = args(2)
    val spark = SparkSession.builder()
      .master(sys.env.getOrElse("SPARK_GRAFT_MASTER", "local[8]"))
      .appName("inc-resume-probe")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.functions.registerAll(spark)

    val store = new IncrementalDedup(spark, root, DedupConfig())
    try {
      batchId match {
        case "compact" =>
          val ids = store.compact()
          println(s"OK: compacted to ${ids.mkString(",")}")
        case "clusters" =>
          println(s"OK: ${store.clusters().count()} cluster rows")
        case _ =>
          // addBatch is a WRITE path: the resumed batch's pages must be
          // byte-identical to what the crashed bench derived, so this MUST
          // be Bench's own derivation, never a local copy of it.
          val off = batchId.stripPrefix("delta_").toLong
          val labels = store.addBatch(batchId, graft.Bench.deltaPages(spark, nClusters, off))
          println(s"OK: ${labels.count()} labels")
      }
    } catch {
      case e: Throwable =>
        println(s"FAILED: ${e.getClass.getName}: ${e.getMessage}")
        e.printStackTrace()
        sys.exit(1)
    }
    spark.stop()
  }
}
