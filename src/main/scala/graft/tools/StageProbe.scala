package graft.tools

import graft.corpus.SyntheticCorpus
import graft.dedup._
import org.apache.spark.sql.SparkSession

/** Dev probe: per-stage wall times of the dedup pipeline at a given corpus
  * size. Not part of the library surface. */
object StageProbe {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toInt).getOrElse(4000)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.files.maxPartitionBytes", (2L << 20).toString)
      .config("spark.sql.files.openCostInBytes", (64L << 10).toString)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def t[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[probe] $name%-24s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      r
    }
    val cfg = DedupConfig()
    val pages = t("gen+write") {
      val p = s"/tmp/graft_probe/c$n"
      if (!new java.io.File(s"$p/_SUCCESS").exists())
        SyntheticCorpus.pages(spark, SyntheticCorpus.Config(nClusters = n))
          .write.mode("overwrite").parquet(p)
      spark.read.parquet(p)
    }
    println(s"[probe] docs=${pages.count()}")
    val sigs = t("signatures+cache") {
      val s = DedupPipeline.signatures(pages, cfg).cache(); s.count(); s
    }
    val mh = t("minhash candidates") {
      val e = DedupPipeline.minhashCandidates(sigs, cfg).cache(); println(s"  mh edges=${e.count()}"); e
    }
    t("jaccard verify") {
      println(s"  verified=${DedupPipeline.verifyJaccard(mh, sigs, cfg).count()}")
    }
    t("simhash candidates") {
      println(s"  sh edges=${DedupPipeline.simhashCandidates(sigs, cfg).count()}")
    }
    t("winnow candidates") {
      println(s"  wn edges=${DedupPipeline.winnowCandidates(sigs, cfg).count()}")
    }
    val edges = t("edges(all)") {
      val e = DedupPipeline.edges(sigs, cfg).cache(); println(s"  edges=${e.count()}"); e
    }
    t("cc") {
      println(s"  comps=${ConnectedComponents.run(edges).count()}")
    }
    spark.stop()
  }
}
