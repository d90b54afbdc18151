package graft.tools

import graft.dedup.{DedupConfig, IncrementalDedup}
import org.apache.spark.scheduler._
import org.apache.spark.sql.SparkSession

import java.nio.file.{Files, Paths}
import scala.collection.mutable

/** Dev probe: where does one incremental delta-batch ingest spend its
  * wall-clock? Prints per-job wall + the DRIVER GAPS between jobs (plan,
  * commit, manifest, collect overhead) — the delta path is many small
  * stages, so scheduling/planning can dominate compute. Uses the bench
  * store + DELTA_OFFSET protocol (Bench.scala), so a crashed probe batch
  * is resumed by the next bench invocation. Not library surface. */
object DeltaProbe {
  def main(args: Array[String]): Unit = {
    val nClusters = if (args.nonEmpty) args(0).toInt else 400000
    val cores = if (args.length > 1) args(1).toInt else 32
    val spark = SparkSession.builder().master(s"local[$cores]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.files.maxPartitionBytes", (2L << 20).toString)
      .config("spark.sql.files.openCostInBytes", (64L << 10).toString)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.functions.registerAll(spark)

    val incRoot = s"/tmp/graft_scale_corpus/inc_store_c$nClusters"
    require(Files.exists(Paths.get(incRoot, "BATCHES")),
      s"no bench store at $incRoot — run graft.Bench once first")
    val store = new IncrementalDedup(spark, incRoot, DedupConfig())

    case class S(id: Int, name: String, tasks: Int, wallMs: Long, taskMs: Long,
        site: String, io: String, sw: Long)
    val stages = mutable.ArrayBuffer.empty[S]
    val stageToExec = mutable.Map.empty[Int, Long]   // stageId -> sql exec id
    val execDesc = mutable.Map.empty[Long, String]   // exec id -> plan desc
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onOtherEvent(e: SparkListenerEvent): Unit = e match {
        case s: org.apache.spark.sql.execution.ui.SparkListenerSQLExecutionStart =>
          execDesc(s.executionId) = s.physicalPlanDescription
        case _ =>
      }
      override def onJobStart(e: SparkListenerJobStart): Unit = {
        val eid = Option(e.properties)
          .flatMap(p => Option(p.getProperty("spark.sql.execution.id")))
        eid.foreach(id => e.stageIds.foreach(s => stageToExec(s) = id.toLong))
      }
    })
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
        val i = sc.stageInfo
        val wall = (for {s <- i.submissionTime; c <- i.completionTime}
          yield c - s).getOrElse(-1L)
        val graftLines = i.details.linesIterator
          .filter(_.contains("graft")).take(3).map(_.trim).toSeq
        val site =
          if (graftLines.nonEmpty) graftLines.mkString(" <- ")
          else i.details.linesIterator.take(5).map(_.trim).mkString(" <- ")
        val m = i.taskMetrics
        val io = f"gc=${m.jvmGCTime / 1e3}%.1f cpu=${m.executorCpuTime / 1e9}%.1f " +
          f"in=${m.inputMetrics.bytesRead / 1e6}%.0fMB " +
          f"sw=${m.shuffleWriteMetrics.bytesWritten / 1e6}%.0fMB " +
          f"sr=${m.shuffleReadMetrics.totalBytesRead / 1e6}%.0fMB"
        stages += S(i.stageId, i.name.takeWhile(_ != '\n').take(50), i.numTasks,
          wall, m.executorRunTime, site, io,
          m.shuffleWriteMetrics.bytesWritten)
      }
    })

    val offFile = Paths.get(incRoot, "DELTA_OFFSET")
    def nextOff(): Long = {
      // same fallback as Bench.nextDeltaOffset: a store whose delta query
      // never ran has no DELTA_OFFSET file yet
      val cur =
        if (Files.exists(offFile))
          new String(Files.readAllBytes(offFile)).trim.toLong
        else nClusters.toLong
      Files.write(offFile, (cur + graft.Bench.DeltaClusters).toString.getBytes)
      cur
    }

    // one warmup batch (JIT/codegen), then the timed one
    Seq("warmup", "timed").foreach { tag =>
      stages.clear()
      val off = nextOff()
      val t0 = System.nanoTime()
      store.addBatch(s"delta_$off", graft.Bench.deltaPages(spark, nClusters, off))
      spark.read.parquet(s"$incRoot/labels_delta_$off/data").count()
      val total = (System.nanoTime() - t0) / 1e9
      Thread.sleep(300)
      println(f"[$tag] total=$total%.2f s  stages=${stages.size}  " +
        f"stage-wall-sum=${stages.map(_.wallMs).sum / 1e3}%.2f s  " +
        f"task-time-sum=${stages.map(_.taskMs).sum / 1e3}%.2f s")
      if (tag == "timed") {
        // group by call site: where does the wall go?
        stages.groupBy(_.site).toSeq
          .map { case (site, ss) =>
            (site, ss.map(_.wallMs).sum, ss.map(_.taskMs).sum, ss.size) }
          .sortBy(-_._2).take(20).foreach { case (site, w, tt, n) =>
            println(f"  site-wall=${w / 1e3}%7.2f s task=${tt / 1e3}%7.2f s " +
              f"n=$n%3d  ${site.take(150)}")
          }
        println("  --- top stages by task time ---")
        stages.sortBy(-_.taskMs).take(10).foreach { s =>
          println(f"  stage ${s.id}%4d wall=${s.wallMs / 1e3}%6.2f s " +
            f"task=${s.taskMs / 1e3}%6.2f tasks=${s.tasks}%3d ${s.io}  " +
            f"exec=${stageToExec.get(s.id)}  ${s.name}")
        }
        // fattest shuffle writers: print their SQL plan head
        stages.filter(_.sw > 100e6.toLong).sortBy(-_.sw).take(3).foreach { s =>
          println(f"  === stage ${s.id} sw=${s.sw / 1e6}%.0fMB " +
            f"exec=${stageToExec.get(s.id)} plan:")
          stageToExec.get(s.id).flatMap(execDesc.get).foreach { d =>
            println(d.linesIterator.take(40).mkString("\n"))
          }
        }
        // heaviest stages by task time: plan head of their SQL execution
        stages.sortBy(-_.taskMs).take(3).foreach { s =>
          println(f"  === stage ${s.id} task=${s.taskMs / 1e3}%.1fs " +
            f"exec=${stageToExec.get(s.id)} plan:")
          stageToExec.get(s.id).flatMap(execDesc.get).foreach { d =>
            println(d.linesIterator.take(25).mkString("\n"))
          }
        }
      }
    }
    spark.stop()
  }
}
