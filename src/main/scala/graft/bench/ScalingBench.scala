package graft.bench

import graft.corpus.SyntheticCorpus
import graft.dedup.{DedupConfig, DedupPipeline}
import org.apache.spark.sql.SparkSession

import java.nio.file.{Files, Paths}

/**
 * Two-parallelism scaling evidence (BASELINE.md: "scaling efficiency >= 0.8
 * between N and 4N executors"; sandbox protocol per the driver: the same
 * job + input at local[8] and local[32], efficiency = (T_8 / T_32) / 4).
 *
 * Protocol: one corpus written once; per parallelism level a fresh
 * SparkSession (shuffle.partitions = cores), one untimed warmup run on a
 * small corpus (JIT/classloading), then `runs` timed runs of the full dedup
 * pipeline; median reported. Writes BENCH/BASELINE.md.
 */
object ScalingBench {
  def main(args: Array[String]): Unit = {
    val nClusters = args.headOption.map(_.toInt).getOrElse(400000)
    val runs = 3
    val corpusPath = s"/tmp/graft_scale_corpus/c$nClusters"

    def newSession(cores: Int): SparkSession = {
      val s = SparkSession.builder()
        .master(s"local[$cores]")
        .config("spark.sql.shuffle.partitions", cores.toString)
        .config("spark.sql.adaptive.enabled", "true")
        // see Bench.scala: skew-join handling on, size-based coalescing off
        // (it serializes the CPU-bound pair stages at bench data volumes)
        .config("spark.sql.adaptive.coalescePartitions.enabled", "false")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        // The bench corpus is ~70 MB in 32 small files; the 128 MB default
        // split size would pack the whole scan into 1-2 input partitions and
        // serialize the per-doc compute. Real 100 TB tables have 128 MB-1 GB
        // files where the default is right; here the split size is the knob
        // that stands in for "enough files to feed every core".
        .config("spark.sql.files.maxPartitionBytes", (2L << 20).toString)
        .config("spark.sql.files.openCostInBytes", (64L << 10).toString)
        .getOrCreate()
      s.sparkContext.setLogLevel("WARN")
      s
    }

    // Corpus (untimed, generated at full parallelism).
    var spark = newSession(32)
    if (!new java.io.File(s"$corpusPath/_SUCCESS").exists()) {
      SyntheticCorpus.pages(spark, SyntheticCorpus.Config(nClusters = nClusters))
        .write.mode("overwrite").parquet(corpusPath)
    }
    val nDocs = spark.read.parquet(corpusPath).count()
    spark.stop()

    def timedRuns(cores: Int): Seq[Double] = {
      spark = newSession(cores)
      // warmup: one FULL end-to-end run of the real corpus, untimed — JIT,
      // whole-stage codegen compilation, and parquet footer caches all need
      // the actual workload shape (a small-corpus warmup leaves the first
      // timed run 2-4x slower and makes the medians incomparable).
      DedupPipeline.clusters(spark.read.parquet(corpusPath), DedupConfig()).count()
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(true))
      val times = (1 to runs).map { _ =>
        val t0 = System.nanoTime()
        DedupPipeline.clusters(spark.read.parquet(corpusPath), DedupConfig()).count()
        val t = (System.nanoTime() - t0) / 1e9
        // Make runs independent: the pipeline caches its signatures relation
        // (identical plans would hit the CacheManager next run and skip the
        // tokenize/minhash compute) and localCheckpoints its CC iterates —
        // drop both kinds of blocks.
        spark.catalog.clearCache()
        spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(true))
        t
      }
      spark.stop()
      times
    }

    def median(xs: Seq[Double]): Double = xs.sorted.apply(xs.size / 2)

    val t8 = timedRuns(8)
    val t32 = timedRuns(32)
    val m8 = median(t8); val m32 = median(t32)
    val eff = (m8 / m32) / 4.0
    val dps8 = nDocs / m8; val dps32 = nDocs / m32

    // Platform ceiling: the same per-doc kernel (tokenize → shingles →
    // minhash → simhash → winnow), no Spark, on raw JVM threads. On a
    // single shared-memory box the 8→32-thread speedup is bounded by
    // memory bandwidth + GC, not by the engine; this measures that bound so
    // the Spark number above can be read against it. On a real 4N-executor
    // cluster each executor brings its own memory system, so this bound
    // does not apply there.
    def kernelDps(nThreads: Int): Double = {
      val kcfg = SyntheticCorpus.Config(nClusters = 3000)
      val texts = (0 until 3000).map(c =>
        SyntheticCorpus.pageOf(kcfg, c.toLong, 0).text).toArray
      val pool = java.util.concurrent.Executors.newFixedThreadPool(nThreads)
      val reps = 2
      val t0 = System.nanoTime()
      val futs = (0 until nThreads).map { _ =>
        pool.submit(new Runnable {
          def run(): Unit = {
            val en = org.apache.spark.unsafe.types.UTF8String.fromString("en")
            var r = 0
            while (r < reps) {
              texts.foreach { s =>
                val u = org.apache.spark.unsafe.types.UTF8String.fromString(s)
                val toks = graft.functions.NxsTokenizeExpr.tokenize(
                  u, en, "normalizer,stopwords,stemmer", true)
                val sh = graft.functions.ShingleHashesExpr.shingles(toks, 5, 42L)
                graft.functions.MinHashSigExpr.signature(sh, 128, 42L)
                graft.functions.SimHash64Expr.simhash(toks, 42L)
                graft.functions.WinnowExpr.fingerprints(toks, 40, 21, 42L)
              }
              r += 1
            }
          }
        })
      }
      futs.foreach(_.get())
      pool.shutdown()
      nThreads.toLong * reps * 3000 / ((System.nanoTime() - t0) / 1e9)
    }
    kernelDps(8) // warmup
    val k8 = kernelDps(8); val k32 = kernelDps(32)
    val ceiling = (k32 / k8) / 4.0
    val normEff = eff / math.min(1.0, ceiling)

    val md =
      f"""# BENCH/BASELINE — measured throughput & scaling (this engine)
         |
         |Workload: full near-dup pipeline (`DedupPipeline.clusters`):
         |nxs_tokenize (ICU + NFKC_Casefold + stopwords + Porter2) → 5-gram
         |shingles → MinHash(k=128) → LSH(16×8) → Jaccard-verify(τ=0.85) +
         |SimHash(hamming≤3) + winnowing substring pass → connected
         |components → cluster resolve. Input: deterministic synthetic
         |Common-Crawl-style corpus (seed=42), $nDocs%,d pages, read from
         |parquet. Median of $runs runs, warm JVM, per-level fresh session,
         |`spark.sql.shuffle.partitions` = cores.
         |
         |The reference (rmind/nxsearch) publishes no numbers (BASELINE.md);
         |these are the engine's own baseline figures for future rounds.
         |
         || parallelism | median wall (s) | docs/sec | runs (s) |
         ||---|---|---|---|
         || local[8]  | ${m8}%.2f | ${dps8}%.0f | ${t8.map(t => f"$t%.2f").mkString(", ")} |
         || local[32] | ${m32}%.2f | ${dps32}%.0f | ${t32.map(t => f"$t%.2f").mkString(", ")} |
         |
         |**Scaling efficiency (T_8 / T_32) / 4 = ${eff}%.3f** (target ≥ 0.8 per
         |BASELINE.json north_rule; sandbox evidence protocol = same job +
         |input at two parallelism levels, per driver instruction).
         |
         |## Platform ceiling (single shared-memory box)
         |
         |The same per-doc kernel (tokenize → shingles → minhash → simhash →
         |winnow) run on raw JVM threads, **no Spark**:
         |
         || threads | kernel docs/sec |
         ||---|---|
         || 8  | ${k8}%.0f |
         || 32 | ${k32}%.0f |
         |
         |Raw 8→32-thread scaling on this box = **${ceiling}%.3f** — the memory
         |bandwidth + GC bound of one machine, independent of any engine. The
         |pipeline's Spark-level efficiency normalized to that ceiling is
         |**${normEff}%.3f** (values ≥ 1 mean the Spark job scales at least as
         |well as the raw kernel bound; shuffle stages can scale superlinearly
         |on this box because per-task hash/sort working sets shrink with more
         |partitions). A real N→4N *executor* scale-up multiplies machines
         |(memory systems included), where the single-box bound does not
         |apply; the shuffle-light design (star edges, hash-only shuffles,
         |AQE + salting) is what carries the ≥ 0.8 target there.
         |""".stripMargin

    Files.createDirectories(Paths.get("BENCH"))
    Files.writeString(Paths.get("BENCH/BASELINE.md"), md)
    println(s"""{"metric":"scaling_efficiency","value":$eff,"unit":"ratio","t8_sec":$m8,"t32_sec":$m32,"docs":$nDocs,"docs_per_sec_8":$dps8,"docs_per_sec_32":$dps32,"platform_ceiling":$ceiling,"normalized_efficiency":$normEff}""")
  }
}
