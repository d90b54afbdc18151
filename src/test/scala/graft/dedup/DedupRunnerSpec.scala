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
