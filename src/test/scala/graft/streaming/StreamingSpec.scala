package graft.streaming

import graft.SparkTestBase
import graft.corpus.SyntheticCorpus
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite

import java.nio.file.Files

class StreamingSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark
  import spark.implicits._

  test("streaming page ingest dedups urls (S1 duplicate-id rejection port)") {
    val dir = Files.createTempDirectory("graft_stream_pages").toString
    val pages = SyntheticCorpus.pages(spark, SyntheticCorpus.Config(nClusters = 30))
    // write twice -> duplicate urls across files
    pages.write.mode("append").parquet(dir)
    pages.write.mode("append").parquet(dir)
    val distinctUrls = pages.select("url").distinct().count()

    val q = StreamOps.dedupedPages(spark, dir, pages.schema)
      .writeStream.format("memory").queryName("pages_dedup")
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000)
    val got = spark.sql("SELECT count(*) FROM pages_dedup").collect()(0).getLong(0)
    assert(got == distinctUrls, s"$got != $distinctUrls")
  }

  test("streaming dedup ingest equals batch recluster (foreachBatch + stages)") {
    import graft.dedup.{DedupConfig, DedupPipeline}
    val corpus = SyntheticCorpus.pages(spark,
      SyntheticCorpus.Config(nClusters = 120)).cache()
    val full = DedupPipeline.clusters(corpus)
      .select("doc_id", "cluster_id")
      .as[(Long, Long)].collect().toSet

    // two parquet files -> (at least) two micro-batches via maxFilesPerTrigger
    val srcDir = Files.createTempDirectory("graft_stream_dedup_src").toString
    corpus.where(abs(xxhash64(col("url"))) % 2 === 0)
      .coalesce(1).write.mode("append").parquet(srcDir)
    corpus.where(abs(xxhash64(col("url"))) % 2 === 1)
      .coalesce(1).write.mode("append").parquet(srcDir)

    val root = Files.createTempDirectory("graft_stream_dedup_store").toString
    val ckpt = Files.createTempDirectory("graft_stream_dedup_ckpt").toString
    val stream = spark.readStream.schema(corpus.schema)
      .option("maxFilesPerTrigger", 1).parquet(srcDir)
    val q = StreamOps.dedupIngest(stream, root, DedupConfig(),
      checkpointDir = ckpt)
    try q.processAllAvailable() finally q.stop()

    val inc = new graft.dedup.IncrementalDedup(spark, root)
    assert(inc.batches().size >= 2, inc.batches().toString)
    val got = inc.clusters().select("doc_id", "cluster_id")
      .as[(Long, Long)].collect().toSet
    assert(got == full)
    corpus.unpersist()
  }

  test("streaming ingest: crash redelivery of a batchId is idempotent") {
    import graft.dedup.{DedupConfig, DedupPipeline}
    val corpus = SyntheticCorpus.pages(spark,
      SyntheticCorpus.Config(nClusters = 90)).cache()
    val srcDir = Files.createTempDirectory("graft_stream_redeliver_src").toString
    val root = Files.createTempDirectory("graft_stream_redeliver_store").toString
    val ckpt = Files.createTempDirectory("graft_stream_redeliver_ckpt").toString
    for (p <- 0 until 3)
      corpus.where(abs(xxhash64(col("url"))) % 3 === p)
        .coalesce(1).write.mode("append").parquet(srcDir)

    def runOnce(ckptDir: String): Unit = {
      val stream = spark.readStream.schema(corpus.schema)
        .option("maxFilesPerTrigger", 1).parquet(srcDir)
      val q = StreamOps.dedupIngest(stream, root, DedupConfig(),
        checkpointDir = ckptDir)
      try q.processAllAvailable() finally q.stop()
    }
    runOnce(ckpt)
    val inc = new graft.dedup.IncrementalDedup(spark, root)
    val batches1 = inc.batches()
    assert(batches1.size >= 2, batches1.toString)
    def labels() = inc.clusters().select("doc_id", "cluster_id")
      .as[(Long, Long)].collect().toSet
    val labels1 = labels()

    // Simulate a crash AFTER the source offsets were logged but BEFORE the
    // batch's commit record was written: delete the last commit-log entry.
    // On restart Structured Streaming REDELIVERS that micro-batch with the
    // SAME batchId — the claimed exactly-once composition is that
    // IncrementalDedup.addBatch then resumes/reads its committed stages
    // instead of re-ingesting. The "restarted process" is modeled by
    // copying the doctored checkpoint to a fresh path: Spark 4 keeps a
    // per-JVM guard that treats a commit rewrite under the ORIGINAL path as
    // a concurrent query, which a real post-crash JVM would not have.
    val commitsDir = new java.io.File(s"$ckpt/commits")
    val last = commitsDir.listFiles.map(_.getName)
      .filter(_.forall(_.isDigit)).map(_.toInt).max
    assert(new java.io.File(commitsDir, last.toString).delete())
    // the local FS keeps a Hadoop checksum shadow; a stale one would fail
    // the rewrite as a checksum mismatch rather than exercise redelivery
    new java.io.File(commitsDir, s".$last.crc").delete()
    val ckpt2 = Files.createTempDirectory("graft_stream_redeliver_ckpt2").toString
    def copyDir(src: java.io.File, dst: java.io.File): Unit = {
      dst.mkdirs()
      Option(src.listFiles).foreach(_.foreach { f =>
        val t = new java.io.File(dst, f.getName)
        if (f.isDirectory) copyDir(f, t)
        else { java.nio.file.Files.copy(f.toPath, t.toPath,
          java.nio.file.StandardCopyOption.REPLACE_EXISTING); () }
      })
    }
    copyDir(new java.io.File(ckpt), new java.io.File(ckpt2))
    runOnce(ckpt2) // redelivery of batch `last` with the same batchId

    val inc2 = new graft.dedup.IncrementalDedup(spark, root)
    // no duplicate batch dirs, identical ingest order, identical labels
    assert(inc2.batches() == batches1, inc2.batches().toString)
    assert(labels() == labels1)
    // and the store still equals a from-scratch recluster
    val full = DedupPipeline.clusters(corpus)
      .select("doc_id", "cluster_id").as[(Long, Long)].collect().toSet
    assert(labels1 == full)
    corpus.unpersist()
  }

  test("windowed event counts with watermark match batch aggregation") {
    val dir = Files.createTempDirectory("graft_stream_events").toString
    val events = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
      .withColumn("ts", col("ts").cast("timestamp"))
    events.write.mode("overwrite").parquet(dir)

    val q = StreamOps.windowedEventCounts(
      spark.readStream.schema(events.schema).parquet(dir))
      .writeStream.format("memory").queryName("ev_win")
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000)

    val batch = events
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(col("window.start").as("hour"), col("event_type"), col("n"))
    val streamed = spark.sql("SELECT hour, event_type, n FROM ev_win")
    // append mode emits only windows below the final watermark; every
    // emitted window must match batch exactly
    val mismatches = streamed.as("s")
      .join(batch.as("b"), Seq("hour", "event_type"), "left")
      .where($"s.n" =!= $"b.n").count()
    assert(mismatches == 0)
    assert(streamed.count() > 0)
  }

  test("stateful running user totals via mapGroupsWithState") {
    val dir = Files.createTempDirectory("graft_stream_state").toString
    val events = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    events.write.mode("overwrite").parquet(dir)

    val q = StreamOps.runningUserCounts(
      spark.readStream.schema(events.schema).parquet(dir))
      .writeStream.format("memory").queryName("user_tot")
      .outputMode("update").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000)

    val exp = events.groupBy("user_id").agg(count(lit(1)).as("n"))
      .as[(Long, Long)].collect().toMap
    // last update per user == final total
    val got = spark.sql(
      "SELECT user_id, max(n) AS n FROM user_tot GROUP BY user_id")
      .as[(Long, Long)].collect().toMap
    assert(got == exp)
  }
}
