package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare.
  *
  * Also writes the ORACLE SUPPORT TABLES to /tmp/graft_oracle (the fixed
  * path SparkEntry.oracleSql references via read_parquet): per-document
  * signature columns (tokens, token hashes, shingles, MinHash sig, SimHash,
  * winnow fingerprints) and the ANN bucket assignments. DuckDB cannot
  * recompute ICU tokenization or xxhash64, so those primitives are dumped
  * (their math is pinned by the reference-ported golden suites); everything
  * DOWNSTREAM of them — band collisions, Jaccard, Hamming predicates, star
  * edges, connected components, bit-vote simhash assembly — is re-derived
  * independently in SQL. */
object Verify {
  val OracleDir = "/tmp/graft_oracle"

  def writeOracleDumps(spark: SparkSession, sfDir: String): Unit = {
    import org.apache.spark.sql.functions._
    import graft.functions._
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    // null text dumps as EMPTY token set (not NULL columns) so ops and
    // oracles agree on text-less documents (singletons / zero fingerprints)
    docs.select(col("doc_id"),
        nxs_tokenize(coalesce(col("text"), lit("")),
          coalesce(col("lang"), lit("en"))).as("tokens"))
      .withColumn("token_hashes", transform(col("tokens"), t => xxhash64(t)))
      .withColumn("shingles", nxs_shingles(col("tokens")))
      .withColumn("sig", nxs_minhash(col("shingles")))
      .withColumn("simhash", nxs_simhash(col("tokens")))
      .withColumn("winnow_fps20", nxs_winnow(col("tokens"), 20, 11))
      .withColumn("winnow_pos20", nxs_winnow_pos(col("tokens"), 20, 11))
      .withColumn("winnow_fps8", nxs_winnow(col("tokens"), 8, 5))
      .coalesce(1).write.mode("overwrite").parquet(s"$OracleDir/dedup_sigs")
    graft.ops.TrainingOps.annBuckets(spark, sfDir)
      .coalesce(1).write.mode("overwrite").parquet(s"$OracleDir/ann_buckets")
  }

  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir) = args
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    try writeOracleDumps(spark, sfDir)
    catch { case e: Throwable =>
      System.err.println(s"[verify] oracle dumps failed: ${e.getMessage}")
    }
    SparkEntry.queries.foreach { case (name, fn) =>
      try fn(spark, sfDir).coalesce(1).write.mode("overwrite")
        .parquet(s"$outDir/$name")
      catch { case e: Throwable =>
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
      }
    }
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    spark.stop()
  }
}
