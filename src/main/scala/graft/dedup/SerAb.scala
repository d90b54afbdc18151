package graft.dedup

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev experiment (r7): A/B the Materialize storage form (deserialized
  * MEMORY_AND_DISK vs serialized MEMORY_AND_DISK_SER via the graft.ckpt.ser
  * sysprop) for the pipeline's signature checkpoint + its one big consumer
  * (edgesRaw), alternated in one session so host drift cancels pairwise.
  * Usage: SerAb [nClusters] [pairs]
  */
object SerAb {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toInt).getOrElse(400000)
    val pairs = args.lift(1).map(_.toInt).getOrElse(3)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "false")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.files.maxPartitionBytes", (2L << 20).toString)
      .config("spark.sql.files.openCostInBytes", (64L << 10).toString)
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.functions.registerAll(spark)
    val sc = spark.sparkContext
    val cfg = DedupConfig()
    val p = s"/tmp/graft_scale_corpus/c$n"
    require(new java.io.File(s"$p/_SUCCESS").exists(), s"no corpus at $p")
    val keep = sc.getPersistentRDDs.keySet

    def run(ser: Boolean): (Double, Double, Long) = {
      System.setProperty("graft.ckpt.ser", ser.toString)
      val t0 = System.nanoTime()
      val raw = DedupPipeline.signatures(spark.read.parquet(p), cfg)
      val trimmed = raw
        .withColumn("band_keys", graft.functions.nxs_band_keys(
          col("sig"), cfg.bands, cfg.rowsPerBand, cfg.seed))
        .drop("sig")
      val sigs = Materialize(trimmed)
      val t1 = System.nanoTime()
      val e = DedupPipeline.edges(sigs, cfg).count()
      val t2 = System.nanoTime()
      sc.getPersistentRDDs.foreach { case (id, rdd) =>
        if (!keep.contains(id)) rdd.unpersist(true)
      }
      spark.catalog.clearCache()
      val (ts, te) = ((t1 - t0) / 1e9, (t2 - t1) / 1e9)
      println(f"[serab] ser=$ser  sig=$ts%6.2f s  edges=$te%6.2f s  e=$e")
      (ts, te, e)
    }
    run(false); run(true) // warmup both
    val ratios = (1 to pairs).map { i =>
      val (as, ae, _) = run(false)
      val (bs, be, _) = run(true)
      println(f"[serab] pair $i: A=${as + ae}%.2f B=${bs + be}%.2f  B/A=${(bs + be) / (as + ae)}%.3f")
      (bs + be) / (as + ae)
    }.sorted
    println(f"[serab] median B/A = ${ratios(ratios.size / 2)}%.3f (<1 means SER wins)")
    spark.stop()
  }
}
