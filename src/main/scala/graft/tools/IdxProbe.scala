package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart}
import org.apache.spark.sql.SparkSession

import scala.collection.mutable

/** Dev probe (r7): where does one durable index build spend its wall?
  * Mirrors graft.Bench's index_build entry (fresh root per run, committed
  * StageStore stages) with per-job wall times rolled up by the
  * stage/JobLabel phase. */
object IdxProbe {
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
            " | " + j.stageInfos.headOption.map(_.name.take(50)).getOrElse(""))
      override def onJobEnd(j: SparkListenerJobEnd): Unit =
        starts.remove(j.jobId).foreach { case (t0, d) =>
          jobs += J(j.jobId, d, (System.nanoTime() - t0) / 1000000)
        }
    })

    def docs = graft.ops.TrainingOps.documents(spark, sfDir)
      .select(org.apache.spark.sql.functions.col("doc_id"),
        org.apache.spark.sql.functions.col("text"))
    def build(): Long = {
      val root = java.nio.file.Files.createTempDirectory("graft_idxprobe").toString
      val idx = graft.search.IndexStore.buildOrOpen(
        docs, graft.text.TextPipeline.default, spark, root)
      val n = idx.docCount
      graft.tables.FsUtil.deleteRecursively(new java.io.File(root))
      n
    }
    build() // warmup
    jobs.clear()
    val t0 = System.nanoTime()
    val n = build()
    val total = (System.nanoTime() - t0) / 1e9
    Thread.sleep(300)
    println(f"[idxprobe] total=$total%.2f s  docs=$n  jobs=${jobs.size}")
    jobs.sortBy(-_.ms).take(20).foreach { j =>
      println(f"[idxjob] ${j.ms}%6d ms  id=${j.id}%-4d ${j.desc.take(110)}")
    }
    jobs.groupBy(_.desc.split(" \\| ").head).toSeq
      .map { case (d, js) => (js.map(_.ms).sum, js.size, d) }
      .sortBy(-_._1).foreach { case (ms, nj, d) =>
        println(f"[idxphase] $ms%6d ms  n=$nj%-3d ${d.take(90)}")
      }
    println(f"[idxprobe] job-ms-sum=${jobs.map(_.ms).sum}")
    spark.stop()
  }
}
