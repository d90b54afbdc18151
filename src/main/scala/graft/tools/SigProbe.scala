package graft.tools

import graft.dedup.{DedupConfig, DedupPipeline}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev probe: where does signature-stage time go inside Spark? */
object SigProbe {
  def main(args: Array[String]): Unit = {
    val path = args.headOption.getOrElse("/tmp/graft_probe/c50000")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.files.maxPartitionBytes", (2L << 20).toString)
      .config("spark.sql.files.openCostInBytes", (64L << 10).toString)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val pages = spark.read.parquet(path)
    println(s"input partitions: ${pages.rdd.getNumPartitions}")

    def t(name: String)(f: => Any): Unit = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[sig] $name%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s  ($r)")
    }

    import graft.functions._
    val tok = nxs_tokenize(col("text"), coalesce(col("lang"), lit("en")))

    t("scan only")(pages.agg(sum(length(col("text")))).collect()(0).get(0))
    t("tokenize")(pages.select(size(tok).as("n")).agg(sum("n")).collect()(0).get(0))
    t("tokenize (2nd)")(pages.select(size(tok).as("n")).agg(sum("n")).collect()(0).get(0))

    val cfg = DedupConfig()
    val sigs = DedupPipeline.signatures(pages, cfg)
    t("signatures no-cache") {
      sigs.select(size(col("sig")).as("a"), size(col("shingles")).as("b"),
        size(col("winnow_fps")).as("c"))
        .agg(sum(col("a") + col("b") + col("c"))).collect()(0).get(0)
    }
    t("signatures cache+count") { val s2 = sigs.cache(); s2.count() }
    println("=== executed plan (signatures) ===")
    println(sigs.queryExecution.executedPlan.toString.take(4000))
    spark.stop()
  }
}
