package graft.dedup

import graft.SparkTestBase
import graft.corpus.SyntheticCorpus
import graft.functions._
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class ConnectedComponentsSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark
  import spark.implicits._

  /** Union-find oracle. */
  private def ufComponents(edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val parent = scala.collection.mutable.Map.empty[Long, Long]
    def find(x: Long): Long = {
      val p = parent.getOrElseUpdate(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    edges.foreach { case (a, b) =>
      val ra = find(a); val rb = find(b)
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    parent.keys.map(k => k -> find(k)).toMap
  }

  test("CC matches union-find on random graphs") {
    val rnd = new scala.util.Random(7)
    for (trial <- 1 to 3) {
      val n = 200
      val edges = (1 to 300).map(_ => (rnd.nextInt(n).toLong, rnd.nextInt(n).toLong))
        .filter { case (a, b) => a != b }
      val got = ConnectedComponents.run(edges.toDF("src", "dst"))
        .as[(Long, Long)].collect().toMap
      val exp = ufComponents(edges)
      assert(got == exp, s"trial $trial")
    }
  }

  test("CC on long path converges to min") {
    val path = (0L until 40L).sliding(2).map(s => (s(0), s(1))).toSeq
    val got = ConnectedComponents.run(path.toDF("src", "dst"))
      .as[(Long, Long)].collect().toMap
    assert(got.values.toSet == Set(0L))
  }

  test("CC empty edges") {
    val got = ConnectedComponents.run(Seq.empty[(Long, Long)].toDF("src", "dst"))
    assert(got.count() == 0)
  }
}

class DedupPipelineSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark
  import spark.implicits._

  private val cfg = DedupConfig()
  private val corpusCfg = SyntheticCorpus.Config(nClusters = 300)
  private lazy val pages = SyntheticCorpus.pages(spark, corpusCfg).cache()
  private lazy val sigs = DedupPipeline.signatures(pages, cfg).cache()
  private lazy val clusters = DedupPipeline.clusters(pages, cfg).cache()

  test("corpus is deterministic and well-formed") {
    val n = pages.count()
    assert(n > 400)
    assert(pages.select("url").distinct().count() == n)
    val again = SyntheticCorpus.pages(spark, corpusCfg)
    assert(pages.exceptAll(again).count() == 0)
  }

  test("exact duplicates always share a cluster") {
    val truth = SyntheticCorpus.truth(spark, corpusCfg)
      .where($"kind" === "exact")
    val c = clusters.select($"url", $"cluster_id")
    val joined = truth
      .join(c.withColumnRenamed("url", "url_a").withColumnRenamed("cluster_id", "ca"), "url_a")
      .join(c.withColumnRenamed("url", "url_b").withColumnRenamed("cluster_id", "cb"), "url_b")
    val total = joined.count()
    val hit = joined.where($"ca" === $"cb").count()
    assert(total > 0)
    assert(hit == total, s"exact-dup recall $hit/$total")
  }

  test("dup-pair recall >= 0.99 vs brute-force Jaccard oracle") {
    // Oracle: all pairs with exact shingle-Jaccard >= tau (FIXTURES.md §3).
    val sh = sigs.select($"doc_id", $"shingles")
    val pairs = sh.as("a").join(sh.as("b"), $"a.doc_id" < $"b.doc_id")
      .withColumn("inter", size(array_intersect($"a.shingles", $"b.shingles")).cast("double"))
      .withColumn("uni", size($"a.shingles") + size($"b.shingles") - $"inter")
      .where($"uni" > 0 && $"inter" / $"uni" >= cfg.tau)
      .select($"a.doc_id".as("id_a"), $"b.doc_id".as("id_b"))
      .cache()
    val oracleCount = pairs.count()
    assert(oracleCount > 50, s"oracle too small: $oracleCount")

    val c = clusters.select($"doc_id", $"cluster_id")
    val found = pairs
      .join(c.withColumnRenamed("doc_id", "id_a").withColumnRenamed("cluster_id", "ca"), "id_a")
      .join(c.withColumnRenamed("doc_id", "id_b").withColumnRenamed("cluster_id", "cb"), "id_b")
      .where($"ca" === $"cb")
      .count()
    val recall = found.toDouble / oracleCount
    info(f"oracle pairs=$oracleCount found=$found recall=$recall%.4f")
    assert(recall >= 0.99, f"recall $recall%.4f < 0.99 ($found/$oracleCount)")
  }

  test("substring duplicates found by winnowing pass") {
    val truth = SyntheticCorpus.truth(spark, corpusCfg).where($"kind" === "substring")
    val c = clusters.select($"url", $"cluster_id")
    val joined = truth
      .join(c.withColumnRenamed("url", "url_a").withColumnRenamed("cluster_id", "ca"), "url_a")
      .join(c.withColumnRenamed("url", "url_b").withColumnRenamed("cluster_id", "cb"), "url_b")
    val total = joined.count()
    val hit = joined.where($"ca" === $"cb").count()
    assert(total > 0)
    assert(hit.toDouble / total >= 0.95, s"substring recall $hit/$total")
  }

  test("each cluster has exactly one champion") {
    val bad = clusters.groupBy("cluster_id")
      .agg(sum(when($"is_champion", 1).otherwise(0)).as("nch"))
      .where($"nch" =!= 1).count()
    assert(bad == 0)
  }

  test("clusters are replay-stable (determinism)") {
    val again = DedupPipeline.clusters(pages, cfg)
    assert(clusters.exceptAll(again).count() == 0)
  }

  test("hot boilerplate cluster is connected without O(s^2) pairs") {
    val hotUrls = clusters.where($"url".startsWith("https://hot.example.com/p0/"))
    val comps = hotUrls.select("cluster_id").distinct().count()
    assert(comps == 1, s"hot cluster split into $comps components")
  }
}
