package graft.tools

import graft.corpus.SyntheticCorpus
import graft.dedup.{DedupConfig, DedupPipeline}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev probe: are qualified-but-missed pairs explained by the LSH S-curve?
  * Prints observed vs theoretical detection rate per Jaccard bucket. */
object MissProbe {
  def main(args: Array[String]): Unit = {
    val nClusters = args.headOption.map(_.toInt).getOrElse(50000)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.files.maxPartitionBytes", (2L << 20).toString)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val cfg = SyntheticCorpus.Config(nClusters = nClusters)
    val pages = spark.read.parquet(s"/tmp/graft_scale_corpus/c$nClusters")
    val dcfg = DedupConfig()
    val clusters = DedupPipeline.clusters(pages, dcfg)
      .select(col("url"), col("cluster_id")).cache()
    val sigs = DedupPipeline.signatures(pages, dcfg)
      .select(col("url"), col("shingles"))
    val truth = SyntheticCorpus.truth(spark, cfg)
    val j = truth
      .join(sigs.select(col("url").as("url_a"), col("shingles").as("sh_a")), "url_a")
      .join(sigs.select(col("url").as("url_b"), col("shingles").as("sh_b")), "url_b")
      .join(clusters.select(col("url").as("url_a"), col("cluster_id").as("ca")), "url_a")
      .join(clusters.select(col("url").as("url_b"), col("cluster_id").as("cb")), "url_b")
      .withColumn("inter", size(array_intersect(col("sh_a"), col("sh_b"))).cast("double"))
      .withColumn("jac", col("inter") /
        (size(col("sh_a")) + size(col("sh_b")) - col("inter")))
      .where(col("jac") >= 0.80)
      .withColumn("bucket", floor(col("jac") * 50) / 50.0)
      .withColumn("hit", (col("ca") === col("cb")).cast("int"))
      .groupBy("bucket")
      .agg(count(lit(1)).as("pairs"), avg("hit").as("observed"),
        avg(lit(1.0) - pow(lit(1.0) - pow(col("jac"), 8), 16)).as("lsh_theory"))
      .orderBy("bucket")
    j.collect().foreach { r =>
      println(f"[miss] J=${r.getDouble(0)}%.2f pairs=${r.getLong(1)}%6d observed=${r.getDouble(2)}%.4f theory=${r.getDouble(3)}%.4f")
    }
    spark.stop()
  }
}
