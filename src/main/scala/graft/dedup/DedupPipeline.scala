package graft.dedup

import graft.functions._
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Near-duplicate detection pipeline (BASELINE.json → north_rule):
 *
 *   pages ──► signatures ──► MinHash/LSH candidates ──► Jaccard verify ──┐
 *        │                                                               │
 *        ├─► SimHash Hamming-ball candidates ────────────────────────────┤──► edges
 *        │                                                               │
 *        └─► winnowing exact-substring fingerprint matches ──────────────┘
 *                                                              edges ──► connected
 *                                                              components ──► clusters
 *
 * Everything is declarative DataFrame algebra (hash-agg + equi-join only),
 * so Catalyst/AQE own the physical plan. Scale design notes:
 *
 *  - Candidate generation NEVER enumerates O(s²) pairs inside a bucket:
 *    each (band, hash) bucket emits star edges to the bucket's min doc_id
 *    (connectivity-preserving, linear in bucket size). Hot boilerplate
 *    buckets therefore cost O(s), not O(s²). Same for SimHash blocks and
 *    winnow fingerprints.
 *  - Buckets are formed by groupBy on (key, hash) — a map-side-combinable
 *    hash aggregation, the cheapest shuffle shape there is; AQE skew-join
 *    handling and the `graft.dedup.Skew` helpers cover residual skew.
 *  - Verification joins are equi-joins on doc_id against the (narrow)
 *    signatures relation; Jaccard is computed with cardinalities only
 *    (|A∩B| via array_intersect, |A∪B| = |A|+|B|-|A∩B|).
 *
 * Tokenizer semantics are the reference pipeline (tokenize + filters,
 * /root/reference/src/core/tokenizer.c:234-302, filters.c:199-219) via
 * `nxs_tokenize`; the shingle/signature config below is "the reference
 * shingle/signature configuration" pinned by FIXTURES.md.
 */
final case class DedupConfig(
    shingleW: Int = 5,
    minhashK: Int = 128,
    bands: Int = 16,           // bands × rowsPerBand == minhashK
    rowsPerBand: Int = 8,
    tau: Double = 0.85,        // Jaccard accept threshold
    simhashMaxHamming: Int = 3,
    winnowA: Int = 40,         // fingerprint a-gram length (tokens)
    winnowWindow: Int = 21,    // guarantee: shared run >= 60 tokens detected
    seed: Long = 42L,
    runMinhash: Boolean = true,
    runSimhash: Boolean = true,
    runWinnow: Boolean = true) {
  require(bands * rowsPerBand == minhashK, "bands*rowsPerBand must equal k")
}

object DedupPipeline {

  /** Stage 1 — per-document signatures. One narrow projection stage; all
    * heavy lifting happens inside codegen'd expressions. `doc_id` is
    * xxhash64(url); the reference's non-zero-id invariant
    * (/root/reference/src/core/nxs.c:498-501) maps to remapping the
    * (probability 2^-64) hash value 0. */
  def signatures(pages: DataFrame, cfg: DedupConfig): DataFrame = {
    val tokens = nxs_tokenize(col("text"), coalesce(col("lang"), lit("en")))
    pages
      .where(col("text").isNotNull)
      .withColumn("doc_id",
        when(xxhash64(col("url")) === 0L, lit(1L)).otherwise(xxhash64(col("url"))))
      .withColumn("tokens", tokens)
      .withColumn("shingles", nxs_shingles(col("tokens"), cfg.shingleW, cfg.seed))
      .withColumn("sig", nxs_minhash(col("shingles"), cfg.minhashK, cfg.seed))
      .withColumn("simhash", nxs_simhash(col("tokens"), cfg.seed))
      .withColumn("winnow_fps",
        column_winnow(col("tokens"), cfg.winnowA, cfg.winnowWindow, cfg.seed))
      // Keep the signatures relation narrow: every downstream consumer reads
      // it repeatedly (cache scans + shuffles), and text/html are dead weight
      // once the signature columns exist.
      .drop("tokens", "html", "text", "lang")
  }

  private def column_winnow(tokens: Column, a: Int, win: Int, seed: Long): Column = {
    import org.apache.spark.sql.graft.bridge
    bridge.column(WinnowExpr(bridge.expression(tokens), a, win, seed))
  }

  /** Emit star edges (bucket-min doc_id ↔ member) for a bucketed relation.
    * Input must have columns (`key` expr aliased bucket_key, doc_id).
    * Linear in bucket size; preserves intra-bucket connectivity. Correct as
    * the ONLY candidate shape when bucket membership is itself transitive
    * evidence (winnowing: all members share the same fingerprint). The same
    * (src, dst) pair can emerge from several buckets — callers dedup once
    * at the end (edges()), not per pass. */
  private def starEdges(bucketed: DataFrame): DataFrame = {
    // The bucketed relation feeds both the anchor aggregation and the join
    // back; without materialization each side recomputes the explode + key
    // hashing from the signatures cache (the two exchanges differ, so
    // ReuseExchange can't kick in). One eager checkpoint = one pass.
    // The join against anchors is AQE-planned: broadcast when anchors are
    // small, skew-split sort-merge when a hot bucket inflates a partition.
    val b = bucketed.localCheckpoint(true)
    val anchors = b
      .groupBy("bucket_key")
      .agg(min("doc_id").as("src"), count(lit(1)).as("sz"))
      .where(col("sz") > 1)
    b.join(anchors, "bucket_key")
      .where(col("doc_id") =!= col("src"))
      .select(col("src"), col("doc_id").as("dst"))
  }

  /** Candidate pairs for passes with a downstream PAIRWISE verify (Jaccard,
    * Hamming). Star edges alone would lose qualified pairs there: a bucket
    * links (a, b) through the bucket-min, and if verify(min, a) fails the
    * (a, b) link dies even when verify(a, b) would pass. So: buckets of
    * size <= smallCap enumerate exact pairs (bounded O(smallCap²) fan-out,
    * recall-lossless); bigger buckets fall back to star edges — a large
    * bucket under an 8-row MinHash band (or 16-bit SimHash block) means
    * mass near-identical content, where member↔min verification holds, and
    * pair enumeration there would be the O(s²) skew bomb the design
    * forbids. */
  private def candidatePairs(bucketed: DataFrame, smallCap: Int = 16): DataFrame = {
    val b = bucketed.localCheckpoint(true)
    val stats = b.groupBy("bucket_key")
      .agg(min("doc_id").as("mn"), count(lit(1)).as("sz"))
      .where(col("sz") > 1)
    val smallKeys = stats.where(col("sz") <= smallCap).select("bucket_key")
    val bs = b.join(smallKeys, "bucket_key")
    val smallPairs = bs.as("x").join(bs.as("y"),
        col("x.bucket_key") === col("y.bucket_key") &&
          col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("src"), col("y.doc_id").as("dst"))
    val bigEdges = b.join(stats.where(col("sz") > smallCap), "bucket_key")
      .where(col("doc_id") =!= col("mn"))
      .select(col("mn").as("src"), col("doc_id").as("dst"))
    smallPairs.unionByName(bigEdges)
  }

  /** Stage 2a — MinHash/LSH band candidates. Band i's key is
    * xxhash64(band_idx, slice(sig)) — the band index is folded INTO the
    * 64-bit hash, so the shuffle key is one long, not a struct (collisions
    * across bands only add candidates, which Jaccard verification removes).
    * Docs sharing any band collide. */
  def minhashCandidates(sigs: DataFrame, cfg: DedupConfig): DataFrame = {
    val bandCols = (0 until cfg.bands).map { i =>
      xxhash64(lit(i), slice(col("sig"), i * cfg.rowsPerBand + 1, cfg.rowsPerBand))
    }
    val bucketed = sigs
      .select(col("doc_id"), explode(array(bandCols: _*)).as("bucket_key"))
    candidatePairs(bucketed).distinct()
  }

  /** Stage 2b — verify candidates with exact Jaccard >= tau on shingle sets. */
  def verifyJaccard(edges: DataFrame, sigs: DataFrame, cfg: DedupConfig): DataFrame = {
    val s = sigs.select(col("doc_id"), col("shingles"))
    edges
      .join(s.select(col("doc_id").as("src"), col("shingles").as("sh_a")), "src")
      .join(s.select(col("doc_id").as("dst"), col("shingles").as("sh_b")), "dst")
      .withColumn("inter", size(array_intersect(col("sh_a"), col("sh_b"))).cast("double"))
      .withColumn("uni", size(col("sh_a")) + size(col("sh_b")) - col("inter"))
      .withColumn("jaccard",
        when(col("uni") > 0, col("inter") / col("uni")).otherwise(lit(0.0)))
      .where(col("jaccard") >= cfg.tau)
      .select("src", "dst", "jaccard")
  }

  /** Stage 3 — SimHash Hamming-ball candidates: pigeonhole the 64-bit
    * fingerprint into (maxHamming+1) blocks; any pair within distance d
    * shares >= 1 exact block. Verified with bit_count(a^b) <= d. */
  def simhashCandidates(sigs: DataFrame, cfg: DedupConfig): DataFrame = {
    val nBlocks = cfg.simhashMaxHamming + 1
    val width = 64 / nBlocks
    // block index folded into the hash → one-long shuffle key (collisions
    // only add candidates; the bit_count verify below removes them)
    val blockCols = (0 until nBlocks).map { i =>
      xxhash64(lit(i),
        shiftright(col("simhash"), i * width)
          .bitwiseAND(lit((1L << width) - 1)))
    }
    val bucketed = sigs
      .select(col("doc_id"),
        explode(array(blockCols: _*)).as("bucket_key"))
    val sh = sigs.select(col("doc_id"), col("simhash"))
    candidatePairs(bucketed)
      .distinct()
      .join(sh.select(col("doc_id").as("src"), col("simhash").as("h_a")), "src")
      .join(sh.select(col("doc_id").as("dst"), col("simhash").as("h_b")), "dst")
      .where(bit_count(col("h_a").bitwiseXOR(col("h_b"))) <= cfg.simhashMaxHamming)
      .select("src", "dst")
  }

  /** Stage 4 — exact-substring pass: shared winnowing fingerprint ⇒ the two
    * documents share a token run >= winnowA (guaranteed detection for runs
    * >= winnowA + winnowWindow - 1). Fingerprint equality IS the evidence —
    * no re-verification join needed (64-bit collision odds negligible). */
  def winnowCandidates(sigs: DataFrame, cfg: DedupConfig): DataFrame = {
    val bucketed = sigs
      .select(col("doc_id"), explode(col("winnow_fps")).as("bucket_key"))
    starEdges(bucketed)
  }

  /** Full edge set for clustering. */
  def edges(sigs: DataFrame, cfg: DedupConfig): DataFrame = {
    var e: DataFrame = null
    def add(df: DataFrame): Unit = { e = if (e == null) df else e.unionByName(df) }
    if (cfg.runMinhash)
      add(verifyJaccard(minhashCandidates(sigs, cfg), sigs, cfg).select("src", "dst"))
    if (cfg.runSimhash) add(simhashCandidates(sigs, cfg))
    if (cfg.runWinnow) add(winnowCandidates(sigs, cfg))
    e.distinct()
  }

  /** End-to-end: pages → clusters(url, doc_id, cluster_id, is_champion).
    * cluster_id = min doc_id in the component; champion = earliest
    * (warc_ts, url) — deterministic, replay-stable tie-break. */
  def clusters(pages: DataFrame, cfg: DedupConfig = DedupConfig()): DataFrame = {
    val sigs = signatures(pages, cfg)
    sigs.cache()
    val e = edges(sigs, cfg)
    val comps = ConnectedComponents.run(e) // (id, comp)
    // CC materialized the edge set, so the wide cached signatures relation
    // (shingle/sig/fingerprint arrays) has served its purpose — keep only
    // the narrow doc projection and release the cache.
    val docs = sigs.select("url", "doc_id", "warc_ts").localCheckpoint(true)
    sigs.unpersist()
    val labeled = docs
      .join(comps.withColumnRenamed("id", "doc_id"), Seq("doc_id"), "left")
      .withColumn("cluster_id", coalesce(col("comp"), col("doc_id")))
      .drop("comp")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("cluster_id").orderBy(col("warc_ts"), col("url"))
    labeled
      .withColumn("is_champion", row_number().over(w) === 1)
      .select("url", "doc_id", "cluster_id", "is_champion")
  }
}
