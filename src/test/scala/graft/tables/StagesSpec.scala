package graft.tables

import graft.SparkTestBase
import graft.corpus.SyntheticCorpus
import graft.dedup.{DedupConfig, DedupRunner}
import org.scalatest.funsuite.AnyFunSuite

import java.nio.file.{Files, Path}
import java.util.Comparator

class StagesSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark
  import spark.implicits._

  private def tmpRoot(): String = {
    val p = Files.createTempDirectory("graft_stages")
    p.toFile.deleteOnExit()
    p.toString
  }

  test("stage commit + resume skips recompute") {
    val root = tmpRoot()
    val store = new StageStore(spark, root)
    var computeCalls = 0
    def runOnce() = store.runStage("s1", "cfgA") {
      computeCalls += 1
      Seq(1, 2, 3).toDF("x")
    }
    assert(runOnce().count() == 3)
    assert(computeCalls == 1)
    assert(runOnce().count() == 3)
    assert(computeCalls == 1) // resumed from manifest, not recomputed
  }

  test("fingerprint change invalidates the stage") {
    val root = tmpRoot()
    val store = new StageStore(spark, root)
    var calls = 0
    store.runStage("s1", "cfgA") { calls += 1; Seq(1).toDF("x") }
    store.runStage("s1", "cfgB") { calls += 1; Seq(1, 2).toDF("x") }
    assert(calls == 2)
    assert(store.runStage("s1", "cfgB") { calls += 1; Seq(1).toDF("x") }
      .count() == 2)
    assert(calls == 2)
  }

  test("upstream fingerprint change invalidates downstream (lineage)") {
    val root = tmpRoot()
    val store = new StageStore(spark, root)
    store.runStage("up", "v1") { Seq(1).toDF("x") }
    var downCalls = 0
    store.runStage("down", "d1", inputs = Seq("up")) {
      downCalls += 1; Seq(1).toDF("y")
    }
    assert(downCalls == 1)
    // same config, same upstream -> resume
    store.runStage("down", "d1", inputs = Seq("up")) {
      downCalls += 1; Seq(1).toDF("y")
    }
    assert(downCalls == 1)
    // upstream recommitted with new fingerprint -> downstream recomputes
    store.runStage("up", "v2") { Seq(1, 2).toDF("x") }
    store.runStage("down", "d1", inputs = Seq("up")) {
      downCalls += 1; Seq(1).toDF("y")
    }
    assert(downCalls == 2)
  }

  test("metrics table records per-partition rows per stage") {
    val root = tmpRoot()
    val store = new StageStore(spark, root)
    store.runStage("m1", "c") { spark.range(100).toDF("x") }
    val m = store.metrics()
    assert(m.columns.toSet == Set("partition_id", "rows", "stage", "run_fingerprint"))
    assert(m.where($"stage" === "m1").agg(org.apache.spark.sql.functions.sum("rows"))
      .collect()(0).getLong(0) == 100)
  }

  test("dedup pipeline kill/restart resume (e2e)") {
    val root = tmpRoot()
    val cfg = DedupConfig()
    val corpus = SyntheticCorpus.pages(spark, SyntheticCorpus.Config(nClusters = 60))
    val first = DedupRunner.run(corpus, cfg, root).collect().toSet

    // "kill" after stage 2: delete downstream commits, keep signatures/edges
    def rmStage(name: String): Unit = {
      val p = Path.of(root, name)
      if (Files.exists(p))
        Files.walk(p).sorted(Comparator.reverseOrder[Path]())
          .forEach(f => Files.delete(f))
    }
    rmStage("cc_labels")
    rmStage("clusters")
    val resumed = DedupRunner.run(corpus, cfg, root).collect().toSet
    assert(resumed == first)

    // full re-run with same config: all stages resume, same result
    val rerun = DedupRunner.run(corpus, cfg, root).collect().toSet
    assert(rerun == first)
  }
}
