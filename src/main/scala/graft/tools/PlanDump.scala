package graft.tools

import graft.dedup.{DedupConfig, DedupPipeline}
import graft.ops.{RelationalOps, TrainingOps}
import org.apache.spark.sql.{DataFrame, SparkSession}

import java.nio.file.{Files, Paths}

/** Dev tool (r7 optimization round): writes `.explain("formatted")` output
  * for every bench query (and the dedup pipeline's inner stages) to
  * plans/r07/<name>_<suffix>.txt — the before/after plan evidence the
  * optimization round commits alongside OPTIMIZATION_r07.md.
  *
  * Usage: runMain graft.tools.PlanDump <suffix> [sfDir]
  *
  * NOTE on the dedup plans: clustersFromSigs materializes intermediates
  * through local checkpoints, so one end-to-end explain would collapse to a
  * scan over checkpoint blocks. The inner relations (signatures, bucketed
  * aggregate, verify join, resolve) are therefore dumped separately, each
  * built on an UN-materialized parent where that keeps the plan readable. */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val suffix = args.headOption.getOrElse("before")
    val sfDir = if (args.length > 1) args(1) else
      sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.files.maxPartitionBytes", (2L << 20).toString)
      .config("spark.sql.files.openCostInBytes", (64L << 10).toString)
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.functions.registerAll(spark)
    val out = Paths.get("plans", "r07")
    Files.createDirectories(out)

    def dump(name: String, df: => DataFrame): Unit =
      try {
        val plan = df.queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode)
        Files.writeString(out.resolve(s"${name}_$suffix.txt"), plan)
        println(s"[plandump] $name ok")
      } catch { case e: Throwable =>
        println(s"[plandump] $name FAILED: $e")
      }

    val corpus = "/tmp/graft_scale_corpus/c400000"
    val cfg = DedupConfig()
    val benchDocs = TrainingOps.documents(spark, sfDir)

    // dedup pipeline inner stages (the headline's physical shape)
    if (new java.io.File(s"$corpus/_SUCCESS").exists()) {
      val sigsPlan = DedupPipeline.signatures(spark.read.parquet(corpus), cfg)
      dump("dedup_signatures", sigsPlan)
      // candidate/verify stages on an un-materialized signatures parent:
      // same operators as the real run, readable lineage
      dump("dedup_edges", DedupPipeline.edges(
        DedupPipeline.signatures(spark.read.parquet(corpus), cfg), cfg))
    }

    dump("tokenize_scan", spark.read.parquet(corpus)
      .select(org.apache.spark.sql.functions.explode(
        graft.functions.nxs_tokenize(org.apache.spark.sql.functions.col("text")))))
    dump("minhash_dedup_docs", TrainingOps.minhashDedup(spark, sfDir))
    dump("index_build_postings", graft.search.SearchIndex.postingsOf(
      benchDocs, graft.text.TextPipeline.default))
    dump("relational_bm25", RelationalOps.bm25(spark, sfDir))
    dump("embed_topk", TrainingOps.embedTopK(spark, sfDir, nProbes = 20))
    dump("ann_lsh", TrainingOps.annLsh(spark, sfDir))
    dump("events_sessions", TrainingOps.eventsSessions(spark, sfDir))
    dump("events_hourly", TrainingOps.eventsHourly(spark, sfDir))
    dump("exact_dedup", TrainingOps.exactDedup(spark, sfDir))
    dump("quality", TrainingOps.qualityScore(spark, sfDir))
    dump("token_count", TrainingOps.tokenCount(spark, sfDir))
    dump("repetition", TrainingOps.repetitionStats(spark, sfDir))
    dump("decontaminate", TrainingOps.decontaminate(spark, sfDir))
    dump("pii_scrub", TrainingOps.piiScrub(spark, sfDir))
    dump("winnow_spans", TrainingOps.winnowSpans(spark, sfDir))
    dump("embed_ivf_topk", TrainingOps.embedIvfTopK(spark, sfDir))
    dump("ngram_jaccard", TrainingOps.ngramJaccard(spark, sfDir))
    dump("fingerprints", TrainingOps.fingerprints(spark, sfDir))
    dump("nation_revenue", RelationalOps.nationRevenue(spark, sfDir))
    spark.stop()
  }
}
