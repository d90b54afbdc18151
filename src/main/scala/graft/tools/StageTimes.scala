package graft.tools

import graft.dedup.{DedupConfig, DedupPipeline}
import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession

import scala.collection.mutable

/** Dev probe: per-stage wall + task-time of one full pipeline run, to find
  * stages whose wall-clock does NOT scale with cores (the fixed-cost tail
  * that kills the 8→32 efficiency). Not library surface. */
object StageTimes {
  def main(args: Array[String]): Unit = {
    val n = args(0).toInt
    val cores = args(1).toInt
    val spark = SparkSession.builder().master(s"local[$cores]")
      .config("spark.sql.shuffle.partitions", cores.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "false")
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

    // warmup
    DedupPipeline.clusters(spark.read.parquet(p), DedupConfig()).count()
    spark.catalog.clearCache()
    spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(true))

    case class S(id: Int, name: String, tasks: Int, wallMs: Long, taskMs: Long,
        details: String)
    val stages = mutable.ArrayBuffer.empty[S]
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
        val i = sc.stageInfo
        val wall = (for {s <- i.submissionTime; c <- i.completionTime} yield c - s).getOrElse(-1L)
        val graft = i.details.linesIterator
          .filter(l => l.contains("graft"))
          .take(2).mkString(" <- ")
        val m = i.taskMetrics
        val io = f"gc=${m.jvmGCTime / 1e3}%.1f cpu=${m.executorCpuTime / 1e9}%.1f " +
          f"sw=${m.shuffleWriteMetrics.bytesWritten / 1e6}%.0fMB " +
          f"sr=${m.shuffleReadMetrics.totalBytesRead / 1e6}%.0fMB"
        stages += S(i.stageId, i.name.takeWhile(_ != '\n').take(60), i.numTasks,
          wall, m.executorRunTime, io + "  " + graft)
      }
    })
    val t0 = System.nanoTime()
    DedupPipeline.clusters(spark.read.parquet(p), DedupConfig()).count()
    val total = (System.nanoTime() - t0) / 1e9
    Thread.sleep(500)
    println(f"[stagetimes] cores=$cores total=$total%.2f s, ${stages.size} stages, " +
      f"wall-sum=${stages.map(_.wallMs).sum / 1e3}%.2f s")
    stages.sortBy(-_.wallMs).take(15).foreach { s =>
      println(f"[stage] id=${s.id}%3d ${s.wallMs / 1e3}%7.2f s wall ${s.taskMs / 1e3}%8.2f s task ${s.tasks}%4d tasks  ${s.details.take(220)}")
    }
    spark.stop()
  }
}
