package graft.tools

import graft.corpus.SyntheticCorpus
import graft.dedup._
import org.apache.spark.sql.SparkSession

/** Dev experiment: does raising
  * `spark.sql.objectHashAggregate.sortBased.fallbackThreshold` (default 128
  * rows) speed the fused edge generation? The bounded-bucket membership
  * aggregate is a TypedImperativeAggregate, so it plans as
  * ObjectHashAggregate — and with millions of distinct bucket keys the
  * 128-row default means BOTH the partial and final sides abandon hashing
  * almost immediately and external-sort the whole bucketed relation by key.
  *
  * Paired protocol (host throttle drifts on minute timescales): alternate
  * A (default) / B (high threshold) runs back-to-back, report per-pair
  * ratios and medians. Usage: AggExp [nClusters] [pairs] [thresholdB]. */
object AggExp {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toInt).getOrElse(200000)
    val pairs = args.lift(1).map(_.toInt).getOrElse(3)
    val thrB = args.lift(2).map(_.toInt).getOrElse(1 << 22)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "false")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.files.maxPartitionBytes", (2L << 20).toString)
      .config("spark.sql.files.openCostInBytes", (64L << 10).toString)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val sc = spark.sparkContext
    val cfg = DedupConfig()

    val p = s"/tmp/graft_probe/c$n"
    if (!new java.io.File(s"$p/_SUCCESS").exists())
      SyntheticCorpus.pages(spark, SyntheticCorpus.Config(nClusters = n))
        .write.mode("overwrite").parquet(p)
    val sigs = DedupPipeline.signatures(spark.read.parquet(p), cfg)
      .localCheckpoint(true) // shared input for every run — NEVER unpersisted
    println(s"[aggexp] docs=${sigs.count()} thresholdB=$thrB")
    val keep = sc.getPersistentRDDs.keySet

    def run(thr: Int): Double = {
      spark.conf.set(
        "spark.sql.objectHashAggregate.sortBased.fallbackThreshold", thr.toString)
      val t0 = System.nanoTime()
      val e = DedupPipeline.edges(sigs, cfg).count()
      val t = (System.nanoTime() - t0) / 1e9
      // release only the checkpoints THIS run created (the sigs blocks stay)
      sc.getPersistentRDDs.foreach { case (id, rdd) =>
        if (!keep.contains(id)) rdd.unpersist(true)
      }
      spark.catalog.clearCache()
      println(f"[aggexp] thr=$thr%9d  $t%7.2f s  edges=$e")
      t
    }

    run(128); run(thrB) // untimed warmup of both plans
    val ratios = (1 to pairs).map { i =>
      val a = run(128)
      val b = run(thrB)
      println(f"[aggexp] pair $i: A=$a%.2f B=$b%.2f  B/A=${b / a}%.3f")
      b / a
    }.sorted
    println(f"[aggexp] median B/A = ${ratios(ratios.size / 2)}%.3f (<1 means high threshold wins)")
    spark.stop()
  }
}
