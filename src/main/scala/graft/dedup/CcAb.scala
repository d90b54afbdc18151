package graft.dedup


import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev experiment (r7): A/B ConnectedComponents.run fuse values over the
  * REAL pipeline edge relation (materialized once), alternated in one
  * session so host-throttle drift cancels pairwise. Usage:
  *   CcAb [nClusters] [pairs] [fuseA] [fuseB]
  */
object CcAb {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toInt).getOrElse(400000)
    val pairs = args.lift(1).map(_.toInt).getOrElse(3)
    val fuseA = args.lift(2).map(_.toInt).getOrElse(2)
    val fuseB = args.lift(3).map(_.toInt).getOrElse(4)
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

    val raw = DedupPipeline.signatures(spark.read.parquet(p), cfg)
    val trimmed = raw
      .withColumn("band_keys", graft.functions.nxs_band_keys(
        col("sig"), cfg.bands, cfg.rowsPerBand, cfg.seed))
      .drop("sig")
    val sigs = Materialize(trimmed)
    val e = Materialize(DedupPipeline.edgesRaw(sigs, cfg))
    Materialize.release(sigs)
    println(s"[ccab] edges=${e.count()}")
    val keep = sc.getPersistentRDDs.keySet

    def run(fuse: Int): Double = {
      val t0 = System.nanoTime()
      val r = ConnectedComponents.run(e, fuse = fuse).count()
      val t = (System.nanoTime() - t0) / 1e9
      sc.getPersistentRDDs.foreach { case (id, rdd) =>
        if (!keep.contains(id)) rdd.unpersist(true)
      }
      println(f"[ccab] fuse=$fuse  $t%6.2f s  labels=$r")
      t
    }
    run(fuseA); run(fuseB) // warmup both
    val ratios = (1 to pairs).map { i =>
      val a = run(fuseA); val b = run(fuseB)
      println(f"[ccab] pair $i: A(fuse=$fuseA)=$a%.2f B(fuse=$fuseB)=$b%.2f  B/A=${b / a}%.3f")
      b / a
    }.sorted
    println(f"[ccab] median B/A = ${ratios(ratios.size / 2)}%.3f (<1 means fuse=$fuseB wins)")
    spark.stop()
  }
}
