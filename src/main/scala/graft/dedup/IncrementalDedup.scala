package graft.dedup

import graft.tables.StageStore
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import java.nio.file.{Files, Paths, StandardCopyOption}
import scala.jdk.CollectionConverters._

/**
 * Incremental near-duplicate clustering — the batch-ingest form of
 * DedupPipeline for pipelines that receive the corpus in increments (daily
 * crawls): each batch is signed once, candidate generation touches ONLY the
 * buckets the new documents land in, and the cluster labels are advanced by
 * running connected components over (new verified edges ∪ the previous
 * labels re-expressed as star edges). Nothing re-signs or re-buckets the
 * existing corpus; per-batch cost is O(delta + touched-bucket membership).
 *
 * This mirrors the reference's incremental index add (append new term/doc
 * blocks, re-sync readers — /root/reference/src/index/terms.c:320-414,
 * dtmap.c:246-355) lifted to the dedup layer, with the same commit
 * discipline as the search index: every batch's signature and label tables
 * are StageStore stages (atomic manifest publish, fingerprint lineage), so
 * a killed ingest resumes at the first uncommitted stage and a re-run of an
 * already-committed batch is a no-op read.
 *
 * Semantics vs a from-scratch recluster: EXACTLY equal whenever no candidate
 * bucket exceeds `smallCap` (the common case; equality is what the
 * q_incremental_dedup oracle checks value-for-value). In an over-cap bucket
 * the full run keeps only star edges through the CURRENT bucket-min, while
 * the incremental run also retains previously-found verified pairs whose
 * endpoints met the dup criterion — duplicate links are monotone (never
 * forgotten, never unverified), so incremental clustering can only be
 * strictly MORE connected than a recluster, and only by pairwise-verified
 * edges. The same over-cap observability applies (bucketStats).
 *
 * At cluster scale the stored bucket relation should be a table partitioned
 * by bucket_key so the touched-bucket semi-join prunes partitions; here it
 * is derived from the stored signature columns (band_keys/simhash/
 * winnow_fps), which is one narrow scan of the signature store.
 */
final class IncrementalDedup(spark: SparkSession, root: String,
    cfg: DedupConfig = DedupConfig()) {

  private val store = new StageStore(spark, root)
  private val cfgFp = {
    import cfg._
    s"w=$shingleW|k=$minhashK|b=$bands|r=$rowsPerBand|tau=$tau|d=$simhashMaxHamming|" +
      s"wa=$winnowA|ww=$winnowWindow|seed=$seed|cap=$smallCap|" +
      s"mh=$runMinhash|sh=$runSimhash|wn=$runWinnow"
  }

  private def batchesPath = Paths.get(root, "BATCHES")

  /** Committed batch ids, ingest order. */
  def batches(): Seq[String] =
    if (!Files.exists(batchesPath)) Nil
    else Files.readAllLines(batchesPath).asScala.toSeq.filter(_.nonEmpty)

  private def appendBatch(id: String): Unit = {
    require(!id.contains('\n') && !id.contains('/'), s"bad batch id: $id")
    val all = batches() :+ id
    Files.createDirectories(Paths.get(root))
    val tmp = Paths.get(root, "BATCHES.tmp")
    Files.write(tmp, all.mkString("", "\n", "\n").getBytes)
    Files.move(tmp, batchesPath,
      StandardCopyOption.ATOMIC_MOVE, StandardCopyOption.REPLACE_EXISTING)
  }

  private def sigStage(id: String) = s"sigs_$id"
  private def labelStage(id: String) = s"labels_$id"

  private def readSigs(ids: Seq[String]): Option[DataFrame] =
    ids.map(id => spark.read.parquet(s"$root/${sigStage(id)}/data"))
      .reduceOption(_ unionByName _)

  /** Ingest one batch of pages(url, warc_ts, html, text, lang). Returns the
    * updated labels (doc_id, comp) covering every doc in any duplicate
    * relation so far. Re-running a committed batch id resumes/reads, never
    * recomputes (StageStore fingerprints). Documents whose doc_id is
    * already stored are rejected, like the reference's duplicate-id add. */
  def addBatch(batchId: String, pages: => DataFrame): DataFrame = {
    val prior = {
      val b = batches()
      if (b.contains(batchId)) b.takeWhile(_ != batchId)
      else {
        // A batch whose ingest crashed mid-way is listed but has uncommitted
        // stages; a NEW id on top of it would read missing tables. Fail with
        // the resume instruction instead (re-running the crashed id resumes
        // at its first uncommitted stage — the supported recovery path).
        b.find(id => !Files.exists(
            Paths.get(root, labelStage(id), "MANIFEST.json"))).foreach { bad =>
          throw new IllegalStateException(
            s"batch '$bad' is partially ingested — re-run addBatch(\"$bad\", ...) " +
              "to resume it before ingesting new batches")
        }
        appendBatch(batchId); b
      }
    }
    val priorSigStages = prior.map(sigStage)
    val sigsNew = store.runStage(sigStage(batchId), cfgFp,
      inputs = priorSigStages) {
      val raw = DedupPipeline.signatures(pages, cfg)
      // store the 16 band keys instead of the 128-long sig (same trim as
      // clustersFromSigs — the store is read every subsequent batch)
      val trimmed =
        if (cfg.runMinhash)
          raw.withColumn("band_keys",
            graft.functions.nxs_band_keys(col("sig"), cfg.bands,
              cfg.rowsPerBand, cfg.seed)).drop("sig")
        else raw
      readSigs(prior) match {
        case Some(stored) =>
          trimmed.join(stored.select("doc_id"), Seq("doc_id"), "left_anti")
        case None => trimmed
      }
    }

    val labels = store.runStage(labelStage(batchId), cfgFp,
      inputs = priorSigStages ++ prior.lastOption.map(labelStage).toSeq :+
        sigStage(batchId)) {
      val newEdges = readSigs(prior) match {
        case None => DedupPipeline.edgesRaw(sigsNew, cfg)
        case Some(stored) => deltaEdges(stored, sigsNew)
      }
      val priorLabelEdges = prior.lastOption.map { last =>
        spark.read.parquet(s"$root/${labelStage(last)}/data")
          .where(col("id") =!= col("comp"))
          .select(col("id").as("src"), col("comp").as("dst"))
      }
      val edges = (Seq(newEdges.select("src", "dst")) ++ priorLabelEdges)
        .reduce(_ unionByName _)
      ConnectedComponents.run(edges).select(col("id"), col("comp"))
    }
    labels
  }

  /** Verified edges involving at least one new document: stored bucket rows
    * are read ONLY for buckets some new doc touches (left-semi on the new
    * batch's key set), so per-batch cost scales with the delta, not the
    * corpus. */
  private def deltaEdges(stored: DataFrame, sigsNew: DataFrame): DataFrame = {
    import DedupPipeline.{PassMinhash, PassSimhash, PassWinnow}
    val bNew = DedupPipeline.bucketed(sigsNew, cfg)
    val touched = DedupPipeline.bucketed(stored, cfg)
      .join(bNew.select("pass", "bucket_key").distinct(),
        Seq("pass", "bucket_key"), "left_semi")
    val stream = touched.unionByName(bNew)
    val cand = DedupPipeline.pairsFromBuckets(stream, cfg.smallCap,
      alwaysStarPass = PassWinnow)
    // keep only pairs that involve a new document — old-old pairs in a
    // touched bucket were found when their docs arrived
    val newIds = sigsNew.select("doc_id")
    val candDelta = cand
      .join(broadcast(newIds.withColumnRenamed("doc_id", "src")),
        Seq("src"), "left_semi")
      .unionByName(cand
        .join(broadcast(newIds.withColumnRenamed("doc_id", "dst")),
          Seq("dst"), "left_semi"))
      .distinct()
    val allSigs = stored.unionByName(sigsNew)
    val parts = scala.collection.mutable.ArrayBuffer.empty[DataFrame]
    if (cfg.runMinhash)
      parts += DedupPipeline.verifyJaccard(
        candDelta.where(col("pass") === PassMinhash).select("src", "dst"),
        allSigs, cfg).select("src", "dst")
    if (cfg.runSimhash) {
      val fp = allSigs.select(col("doc_id"), col("simhash"))
      parts += candDelta.where(col("pass") === PassSimhash)
        .select("src", "dst")
        .join(fp.select(col("doc_id").as("src"), col("simhash").as("fp_a")), "src")
        .join(fp.select(col("doc_id").as("dst"), col("simhash").as("fp_b")), "dst")
        .where(bit_count(col("fp_a").bitwiseXOR(col("fp_b"))) <= cfg.simhashMaxHamming)
        .select("src", "dst")
    }
    if (cfg.runWinnow)
      parts += candDelta.where(col("pass") === PassWinnow).select("src", "dst")
    parts.reduce(_ unionByName _)
  }

  /** Current clusters over every ingested document:
    * (url, doc_id, cluster_id, is_champion) — the same resolve as
    * DedupPipeline.clusters (champion = earliest (warc_ts, url)). */
  def clusters(): DataFrame = {
    val ids = batches()
    require(ids.nonEmpty, "no batches ingested")
    val docs = readSigs(ids).get.select("url", "doc_id", "warc_ts")
    val labels = spark.read.parquet(s"$root/${labelStage(ids.last)}/data")
    val labeled = docs
      .join(labels.withColumnRenamed("id", "doc_id"), Seq("doc_id"), "left")
      .withColumn("cluster_id", coalesce(col("comp"), col("doc_id")))
      .drop("comp")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("cluster_id").orderBy(col("warc_ts"), col("url"))
    labeled
      .withColumn("is_champion", row_number().over(w) === 1)
      .select("url", "doc_id", "cluster_id", "is_champion")
  }
}
