package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart}
import org.apache.spark.sql.SparkSession

import scala.collection.mutable

/** Dev probe (r7): job-level attribution of the bench's search_queries
  * entry (3 boolean/ranked searches against a committed index root). */
object SearchProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cores = args.headOption.map(_.toInt).getOrElse(32)
    val spark = SparkSession.builder().master(s"local[$cores]")
      .config("spark.sql.shuffle.partitions", cores.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.files.maxPartitionBytes", (2L << 20).toString)
      .config("spark.sql.files.openCostInBytes", (64L << 10).toString)
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.functions.registerAll(spark)

    case class J(id: Int, desc: String, ms: Long)
    val jobs = mutable.ArrayBuffer.empty[J]
    val starts = mutable.Map.empty[Int, (Long, String)]
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit =
        starts(j.jobId) = (System.nanoTime(),
          Option(j.properties.getProperty("spark.job.description")).getOrElse("") +
            " | " + j.stageInfos.headOption.map(_.name.take(60)).getOrElse(""))
      override def onJobEnd(j: SparkListenerJobEnd): Unit =
        starts.remove(j.jobId).foreach { case (t0, d) =>
          jobs += J(j.jobId, d, (System.nanoTime() - t0) / 1000000)
        }
    })

    val docs = graft.ops.TrainingOps.documents(spark, sfDir)
      .select(org.apache.spark.sql.functions.col("doc_id"),
        org.apache.spark.sql.functions.col("text"))
    val root = java.nio.file.Files.createTempDirectory("graft_searchprobe").toString
    graft.search.IndexStore.buildOrOpen(
      docs, graft.text.TextPipeline.default, spark, root)
    def run(): Long = {
      val idx = graft.search.IndexStore.buildOrOpen(
        sys.error("must not rebuild"), graft.text.TextPipeline.default,
        spark, root)
      Seq("spark AND join", "hash OR merge", "scan AND NOT slow").map { q =>
        spark.sparkContext.setJobDescription(s"search:$q")
        val n = graft.search.Searcher.search(idx, q).toOption.get.count()
        spark.sparkContext.setJobDescription(null)
        n
      }.sum
    }
    run() // warmup
    jobs.clear()
    val t0 = System.nanoTime()
    val n = run()
    val total = (System.nanoTime() - t0) / 1e9
    Thread.sleep(300)
    println(f"[searchprobe] total=$total%.2f s  rows=$n  jobs=${jobs.size}")
    jobs.sortBy(-_.ms).take(20).foreach { j =>
      println(f"[sjob] ${j.ms}%6d ms  id=${j.id}%-4d ${j.desc.take(110)}")
    }
    graft.tables.FsUtil.deleteRecursively(new java.io.File(root))
    spark.stop()
  }
}
