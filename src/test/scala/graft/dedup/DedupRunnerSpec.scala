package graft.dedup

import graft.SparkTestBase
import graft.corpus.SyntheticCorpus
import org.apache.spark.sql.DataFrame
import org.scalatest.funsuite.AnyFunSuite

/** Checkpointed end-to-end run: kill/restart resume semantics over the
  * whole pipeline INCLUDING the connected-components stage (north_rule:
  * "resumable from checkpoint with per-partition lineage + metrics"). */
class DedupRunnerSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark

  private val cfg = DedupConfig()
  private val corpusCfg = SyntheticCorpus.Config(nClusters = 120)

  private def poisonPages: DataFrame =
    SyntheticCorpus.pages(spark, corpusCfg)
      .filter((_: Any) => throw new IllegalStateException(
        "pages must not be recomputed on resume"))

  test("full resume: committed stages serve a restarted run untouched") {
    val root = java.nio.file.Files.createTempDirectory("dedup_run").toString
    val pages = SyntheticCorpus.pages(spark, corpusCfg)
    val r1 = DedupRunner.run(pages, cfg, root).collect().toSet
    assert(r1.nonEmpty)
    // "restart": new run over the same root; the pages relation throws if
    // any stage actually evaluates it.
    val r2 = DedupRunner.run(poisonPages, cfg, root).collect().toSet
    assert(r2 == r1)
    // metrics table has per-partition rows for every stage incl. CC labels
    val stages = new graft.tables.StageStore(spark, root).metrics()
      .select("stage").distinct().collect().map(_.getString(0)).toSet
    assert(stages == Set("signatures", "bucket_stats", "edges", "cc_labels",
      "clusters"))
  }

  test("partial resume: a lost CC stage recomputes from committed edges") {
    val root = java.nio.file.Files.createTempDirectory("dedup_run2").toString
    val pages = SyntheticCorpus.pages(spark, corpusCfg)
    val r1 = DedupRunner.run(pages, cfg, root).collect().toSet
    // simulate a crash that lost the CC + clusters commits
    for (s <- Seq("cc_labels", "clusters")) {
      java.nio.file.Files.delete(java.nio.file.Paths.get(root, s, "MANIFEST.json"))
    }
    val r2 = DedupRunner.run(poisonPages, cfg, root).collect().toSet
    assert(r2 == r1)
  }

  test("incremental store: partitioned bucket reads prune; compact keeps labels") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val corpus = SyntheticCorpus.pages(spark,
      SyntheticCorpus.Config(nClusters = 150)).cache()
    val root = java.nio.file.Files.createTempDirectory("incstore").toString
    val inc = new IncrementalDedup(spark, root)
    val nb = 5
    val ids = (0 until nb).map(i => s"day$i")
    for (i <- 0 until nb)
      inc.addBatch(ids(i), corpus.where(abs(xxhash64(col("url"))) % nb === i))
    def snap() = inc.clusters()
      .select("doc_id", "cluster_id", "is_champion")
      .as[(Long, Long, Boolean)].collect().toSet
    val before = snap()
    // batch-ingest == from-scratch recluster (5-way split)
    val full = DedupPipeline.clusters(corpus)
      .select("doc_id", "cluster_id", "is_champion")
      .as[(Long, Long, Boolean)].collect().toSet
    assert(before == full)

    // the touched-bucket read is PRUNED AT THE SCAN: a static bpt partition
    // filter on the persisted (hive-partitioned) bucket table, per stage
    val pruned = inc.prunedStoredBuckets(ids.dropRight(1), Seq(1, 2, 3))
    val plan = pruned.queryExecution.executedPlan.toString
    assert("""PartitionFilters: \[[^\]]*bpt""".r.findFirstIn(plan).isDefined, plan)
    // and it actually restricts rows to those partitions
    assert(pruned.count() <
      inc.prunedStoredBuckets(ids.dropRight(1),
        0 until IncrementalDedup.BucketParts).count())

    // compaction collapses the store to one fold; labels byte-identical
    assert(inc.compact().size == 1)
    assert(inc.batches().size == 1)
    assert(snap() == before)
    // the folded bucket stage is still partitioned (reads still prune)
    val plan2 = inc.prunedStoredBuckets(inc.batches(), Seq(1, 2, 3))
      .queryExecution.executedPlan.toString
    assert("""PartitionFilters: \[[^\]]*bpt""".r.findFirstIn(plan2).isDefined, plan2)

    // ingest on the compacted store: an all-duplicate batch is a no-op
    inc.addBatch("day_dup", corpus.where(abs(xxhash64(col("url"))) % nb === 0))
    assert(snap() == before)

    // over-cap observability over the persisted store: stats equal the
    // batch path's derivation from the same signatures
    val fromStore = inc.bucketStats().collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .toSet
    val sigsAll = DedupPipeline.signatures(corpus, DedupConfig())
    val trimmed = sigsAll.withColumn("band_keys",
        graft.functions.nxs_band_keys(col("sig"))).drop("sig")
    val fromSigs = DedupPipeline.bucketStats(trimmed, DedupConfig()).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .toSet
    assert(fromStore == fromSigs)
    corpus.unpersist()
  }

  test("config change invalidates downstream stages (fingerprint lineage)") {
    val root = java.nio.file.Files.createTempDirectory("dedup_run3").toString
    val pages = SyntheticCorpus.pages(spark, corpusCfg)
    DedupRunner.run(pages, cfg, root).count()
    // different tau -> everything recomputes; poisoned pages must now throw
    intercept[Exception] {
      DedupRunner.run(poisonPages, cfg.copy(tau = 0.9), root).count()
    }
  }
}
