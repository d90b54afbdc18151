package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev probe (r7): isolate ConnectedComponents.run wall on a synthetic
  * star-shaped edge set (the shape our candidate generators emit),
  * materialized first so every timed run reads blocks. Warm JVM, N runs. */
object CcProbe {
  def main(args: Array[String]): Unit = {
    val nEdges = args.headOption.map(_.toInt).getOrElse(600000)
    val runs = if (args.length > 1) args(1).toInt else 3
    val cores = if (args.length > 2) args(2).toInt else 32
    val spark = SparkSession.builder().master(s"local[$cores]")
      .config("spark.sql.shuffle.partitions", cores.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    // ~3-member star clusters + 10% cross-links (diameter ~4)
    val edges = graft.dedup.Materialize(
      spark.range(0, nEdges).select(
        (col("id") / 3).cast("long").as("c"),
        col("id"))
      .select((col("c") * 100).as("src"),
        (col("c") * 100 + pmod(col("id"), lit(3)) + 1).as("dst"))
      .union(spark.range(0, nEdges / 10).select(
        (col("id") * 1000).as("src"), (col("id") * 1000 + 100).as("dst"))))
    edges.count()
    (1 to runs).foreach { i =>
      val t0 = System.nanoTime()
      val n = graft.dedup.ConnectedComponents.run(edges).count()
      println(f"[ccprobe] run$i ${(System.nanoTime() - t0) / 1e9}%.2f s  labels=$n")
    }
    spark.stop()
  }
}
