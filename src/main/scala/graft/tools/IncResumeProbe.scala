package graft.tools

import graft.corpus.SyntheticCorpus
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
    import spark.implicits._

    val store = new IncrementalDedup(spark, root, DedupConfig())
    val cCfg = SyntheticCorpus.Config(nClusters = nClusters)
    try {
      batchId match {
        case "compact" =>
          val ids = store.compact()
          println(s"OK: compacted to ${ids.mkString(",")}")
        case "clusters" =>
          println(s"OK: ${store.clusters().count()} cluster rows")
        case _ =>
          val off = batchId.stripPrefix("delta_").toLong
          def pages = spark.range(off, off + 600)
            .flatMap(c => (0 until SyntheticCorpus.sizeOf(cCfg, c))
              .map(m => SyntheticCorpus.pageOf(cCfg, c, m)))
            .toDF()
          val labels = store.addBatch(batchId, pages)
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
