package graft.tools

import graft.dedup.{DedupConfig, DedupPipeline}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev experiment: how should the signatures relation be materialized?
  * Columnar DataFrame cache vs localCheckpoint (UnsafeRow blocks) vs no
  * materialization, for both the build cost and the downstream consumer
  * (edges) cost. Not library surface. */
object CacheExp {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toInt).getOrElse(30000)
    val cores = args.lift(1).map(_.toInt).getOrElse(32)
    val spark = SparkSession.builder().master(s"local[$cores]")
      .config("spark.sql.shuffle.partitions", cores.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.files.maxPartitionBytes", (2L << 20).toString)
      .config("spark.sql.files.openCostInBytes", (64L << 10).toString)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val p = s"/tmp/graft_scale_corpus/c$n"
    if (!new java.io.File(s"$p/_SUCCESS").exists())
      graft.corpus.SyntheticCorpus.pages(spark,
        graft.corpus.SyntheticCorpus.Config(nClusters = n))
        .write.mode("overwrite").parquet(p)
    val pages = spark.read.parquet(p)
    val cfg = DedupConfig()

    def t[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[exp] $name%-32s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      r
    }
    def clear(): Unit = {
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(true))
    }

    // warmup JIT on a full pass
    DedupPipeline.signatures(pages, cfg)
      .agg(sum(size(col("shingles")) + size(col("sig")) +
        size(col("winnow_fps"))), sum(bit_count(col("simhash")))).collect()

    t("sigs compute only (no mat)") {
      DedupPipeline.signatures(pages, cfg)
        .agg(sum(size(col("shingles")) + size(col("sig")) +
          size(col("winnow_fps"))), sum(bit_count(col("simhash")))).collect()
    }
    val cached = t("sigs cache+count") {
      val s = DedupPipeline.signatures(pages, cfg).cache(); s.count(); s
    }
    t("edges(all) from cache") {
      DedupPipeline.edges(cached, cfg).count()
    }
    clear()
    val ckpt = t("sigs localCheckpoint(eager)") {
      DedupPipeline.signatures(pages, cfg).localCheckpoint(true)
    }
    t("edges(all) from checkpoint") {
      DedupPipeline.edges(ckpt, cfg).count()
    }
    clear()
    spark.stop()
  }
}
