package graft.dedup

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart}
import org.apache.spark.sql.SparkSession

import scala.collection.mutable

/** Dev probe (r7): one timed delta ingest against the persisted bench
  * store, with per-JOB wall times (the incremental path is many small
  * jobs, so job-level attribution beats stage-level). Mirrors
  * graft.Bench's incremental setup (incSessionOf: AQE coalesce on,
  * shuffle.partitions=8) without touching the bench's own store (copies
  * the delta cursor logic with a distinct offset space). */
object IncProbe {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toInt).getOrElse(400000)
    val cores = if (args.length > 1) args(1).toInt else 32
    val spark0 = SparkSession.builder().master(s"local[$cores]")
      .config("spark.sql.shuffle.partitions", cores.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.files.maxPartitionBytes", (2L << 20).toString)
      .config("spark.sql.files.openCostInBytes", (64L << 10).toString)
      .getOrCreate()
    spark0.sparkContext.setLogLevel("ERROR")
    graft.functions.registerAll(spark0)
    val spark = spark0.newSession()
    spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "true")
    spark.conf.set("spark.sql.shuffle.partitions", "8")
    graft.functions.registerAll(spark)

    val corpusPath = s"/tmp/graft_scale_corpus/c$n"
    val incRoot = s"/tmp/graft_scale_corpus/inc_store_c$n"
    val store = new IncrementalDedup(spark, incRoot, DedupConfig())
    store.checkConfig()
    require(store.incompleteBatch().isEmpty, "store has incomplete batch")
    require(new java.io.File(s"$corpusPath/_SUCCESS").exists(), "no corpus")

    case class J(id: Int, desc: String, startNs: Long, ms: Long)
    val jobs = mutable.ArrayBuffer.empty[J]
    val starts = mutable.Map.empty[Int, (Long, String)]
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit =
        starts(j.jobId) = (System.nanoTime(),
          Option(j.properties.getProperty("spark.job.description")).getOrElse("") +
            " | " + j.stageInfos.headOption.map(_.name.take(50)).getOrElse(""))
      override def onJobEnd(j: SparkListenerJobEnd): Unit =
        starts.remove(j.jobId).foreach { case (t0, d) =>
          jobs += J(j.jobId, d, t0, (System.nanoTime() - t0) / 1000000)
        }
    })

    // offset space disjoint from the bench's DELTA_OFFSET cursor
    val off = 900000000L + (System.currentTimeMillis() / 1000) % 100000 * 1000
    def deltas(o: Long) = graft.Bench.deltaPages(spark, n, o)

    // warmup ingest (JIT) then timed ingest
    store.addBatch(s"probe_w$off", deltas(off))
    jobs.clear()
    val t0 = System.nanoTime()
    store.addBatch(s"probe_t$off", deltas(off + graft.Bench.DeltaClusters))
    val rows = spark.read.parquet(s"$incRoot/labels_probe_t$off/data").count()
    val total = (System.nanoTime() - t0) / 1e9
    Thread.sleep(300)
    println(f"[incprobe] total=$total%.2f s  labelrows=$rows  jobs=${jobs.size}")
    jobs.sortBy(-_.ms).take(30).foreach { j =>
      println(f"[incjob] ${j.ms}%6d ms  id=${j.id}%-4d ${j.desc.take(110)}")
    }
    // roll-up by the setJobDescription phase label (text before " | ")
    jobs.groupBy(_.desc.split(" \\| ").head).toSeq
      .map { case (d, js) => (js.map(_.ms).sum, js.size, d) }
      .sortBy(-_._1).foreach { case (ms, n, d) =>
        println(f"[incphase] $ms%6d ms  n=$n%-3d ${d.take(90)}")
      }
    println(f"[incprobe] job-ms-sum=${jobs.map(_.ms).sum}")
    // driver-gap attribution: idle time between a job's END and the NEXT
    // job's START, blamed on the next job's label (= what the driver was
    // planning/optimizing/committing before launching it). Jobs can
    // overlap (concurrent stage threads); negative gaps are clamped.
    val byStart = jobs.sortBy(_.startNs).toIndexedSeq
    val gapRows = (1 until byStart.length).map { i =>
      val a = byStart(i - 1); val b = byStart(i)
      val gap = (b.startNs - (a.startNs + a.ms * 1000000L)) / 1000000L
      (b.desc.split(" \\| ").head, math.max(0L, gap))
    }
    gapRows.groupBy(_._1).toSeq
      .map { case (d, gs) => (gs.map(_._2).sum, gs.size, d) }
      .sortBy(-_._1).take(15).foreach { case (ms, n, d) =>
        println(f"[incgap] $ms%6d ms  n=$n%-3d ${d.take(90)}")
      }
    println(f"[incprobe] gap-ms-sum=${gapRows.map(_._2).sum}")
  }
}
