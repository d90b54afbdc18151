package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev probe (r7): time one named SparkEntry query N times in a
  * Bench-configured session (warmup + raw runs). Usage:
  *   runMain graft.tools.QTime <query> [runs] [sfDir]
  */
object QTime {
  def main(args: Array[String]): Unit = {
    val name = args.headOption.getOrElse("q_bm25")
    val runs = if (args.length > 1) args(1).toInt else 3
    val sfDir = if (args.length > 2) args(2) else
      sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = SparkSession.builder().master(s"local[$cpus]")
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
    val q = graft.SparkEntry.queries(name)
    def clear(): Unit = {
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(true))
    }
    q(spark, sfDir).count(); clear() // warmup
    val ts = (1 to runs).map { _ =>
      val t0 = System.nanoTime()
      val r = q(spark, sfDir).count()
      val t = (System.nanoTime() - t0) / 1e9
      clear()
      (t, r)
    }
    println(f"[qtime] $name rows=${ts.head._2} runs=${
      ts.map(t => f"${t._1}%.3f").mkString(",")}")
  }
}
