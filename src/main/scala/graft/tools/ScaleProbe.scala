package graft.tools

import graft.corpus.SyntheticCorpus
import graft.dedup.{DedupConfig, DedupPipeline}
import org.apache.spark.sql.SparkSession

/** Dev probe: timed full-pipeline runs at a given (corpus, cores, spark-conf
  * overrides) point — the experiment harness behind the shuffle-partitioning
  * and AQE choices baked into Bench/ScalingBench. Not library surface.
  *
  * Usage: ScaleProbe <nClusters> <cores> <runs> [k=v ...]
  */
object ScaleProbe {
  def main(args: Array[String]): Unit = {
    val n = args(0).toInt
    val cores = args(1).toInt
    val runs = args(2).toInt
    val extra = args.drop(3).map(_.split("=", 2)).map(a => (a(0), a(1)))
    var b = SparkSession.builder().master(s"local[$cores]")
      .config("spark.sql.shuffle.partitions", cores.toString)
      .config("spark.sql.adaptive.enabled", "true")
      // Partition coalescing collapses the CPU-heavy-but-byte-light stages
      // of this pipeline (pair joins over hashes) to a handful of
      // partitions, serializing them regardless of core count. Skew-join
      // splitting (the AQE feature the design depends on) stays on.
      .config("spark.sql.adaptive.coalescePartitions.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.files.maxPartitionBytes", (2L << 20).toString)
      .config("spark.sql.files.openCostInBytes", (64L << 10).toString)
    extra.foreach { case (k, v) => b = b.config(k, v) }
    val spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val p = s"/tmp/graft_scale_corpus/c$n"
    if (!new java.io.File(s"$p/_SUCCESS").exists())
      SyntheticCorpus.pages(spark, SyntheticCorpus.Config(nClusters = n))
        .write.mode("overwrite").parquet(p)
    val docs = spark.read.parquet(p).count()

    def clear(): Unit = {
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(true))
    }
    def once(): Double = {
      val t0 = System.nanoTime()
      DedupPipeline.clusters(spark.read.parquet(p), DedupConfig()).count()
      val t = (System.nanoTime() - t0) / 1e9
      clear()
      t
    }
    once() // warmup
    val ts = (1 to runs).map(_ => once())
    val med = ts.sorted.apply(runs / 2)
    println(f"[scaleprobe] n=$n docs=$docs cores=$cores conf=${extra.map(e => e._1 + "=" + e._2).mkString(",")} " +
      f"median=$med%.2f s (${docs / med}%.0f docs/s) runs=${ts.map(t => f"$t%.2f").mkString(",")}")
    spark.stop()
  }
}
