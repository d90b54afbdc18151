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
 * Protocol — designed for a host whose effective CPU drifts ±2x on minute
 * timescales (documented in BENCH/BASELINE.md):
 *   - one corpus written once; one untimed full warmup run (per-JVM JIT);
 *   - `rounds` PAIRED measurements: a local[8] run and a local[32] run
 *     back-to-back (fresh session each, shuffle.partitions = cores), so
 *     each ratio T8_i/T32_i compares runs taken ~2 minutes apart in the
 *     same host-throttle state — medians of independently-pooled runs mix
 *     throttle states and have produced 2x spreads for identical code;
 *   - headline efficiency = median of the pairwise ratios / 4;
 *   - the no-Spark kernel ceiling (same per-doc compute on raw threads) is
 *     measured in the same process as the control for the single-box
 *     memory/GC bound.
 */
object ScalingBench {
  def main(args: Array[String]): Unit = {
    java.util.Locale.setDefault(java.util.Locale.ROOT) // machine-read JSON
    val nClusters = args.headOption.map(_.toInt).getOrElse(400000)
    val rounds = args.lift(1).map(_.toInt).getOrElse(3)
    val corpusPath = s"/tmp/graft_scale_corpus/c$nClusters"

    def newSession(cores: Int): SparkSession = {
      val s = SparkSession.builder()
        .master(s"local[$cores]")
        .config("spark.sql.shuffle.partitions", cores.toString)
        .config("spark.sql.adaptive.enabled", "true")
        // skew-join handling on; size-based coalescing off (it serializes
        // the CPU-bound pair stages at bench data volumes — see Bench.scala)
        .config("spark.sql.adaptive.coalescePartitions.enabled", "false")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        // The bench corpus is small parquet files; the 128 MB default split
        // size would pack the scan into few input partitions and serialize
        // the per-doc compute. Real 100 TB tables have 128 MB-1 GB files
        // where the default is right.
        .config("spark.sql.files.maxPartitionBytes", (2L << 20).toString)
        .config("spark.sql.files.openCostInBytes", (64L << 10).toString)
        .getOrCreate()
      s.sparkContext.setLogLevel("WARN")
      // by-design checkpoint releases log WARN from the rdd package; keep
      // the tail readable for unexpected warnings (see Bench.newSession)
      org.apache.logging.log4j.core.config.Configurator.setLevel(
        "org.apache.spark.rdd", org.apache.logging.log4j.Level.ERROR)
      s
    }

    // Corpus (untimed, generated at full parallelism).
    var spark = newSession(32)
    if (!new java.io.File(s"$corpusPath/_SUCCESS").exists()) {
      SyntheticCorpus.pages(spark, SyntheticCorpus.Config(nClusters = nClusters))
        .write.mode("overwrite").parquet(corpusPath)
    }
    val nDocs = spark.read.parquet(corpusPath).count()

    def clear(s: SparkSession): Unit = {
      s.catalog.clearCache()
      s.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(true))
    }
    def timedRun(s: SparkSession): Double = {
      val t0 = System.nanoTime()
      DedupPipeline.clusters(s.read.parquet(corpusPath), DedupConfig()).count()
      val t = (System.nanoTime() - t0) / 1e9
      clear(s)
      t
    }

    // warmup: one FULL end-to-end run of the real corpus, untimed — JIT,
    // whole-stage codegen compilation, and parquet footer caches all need
    // the actual workload shape. JIT state survives session restarts (same
    // JVM), so one warmup covers every paired run below.
    timedRun(spark)
    spark.stop()

    val pairs = (1 to rounds).map { i =>
      spark = newSession(8)
      val t8 = timedRun(spark)
      spark.stop()
      spark = newSession(32)
      val t32 = timedRun(spark)
      spark.stop()
      System.err.println(f"[scaling] pair $i: t8=$t8%.2f t32=$t32%.2f ratio=${t8 / t32}%.2f")
      (t8, t32)
    }
    def median(xs: Seq[Double]): Double = xs.sorted.apply(xs.size / 2)
    val ratios = pairs.map { case (a, b) => a / b }
    val eff = median(ratios) / 4.0
    val m8 = median(pairs.map(_._1)); val m32 = median(pairs.map(_._2))
    val dps8 = nDocs / m8; val dps32 = nDocs / m32

    // Platform ceiling: the same per-doc kernel (tokenize → shingles →
    // minhash → simhash → winnow), no Spark, on raw JVM threads. On a
    // single shared-memory box the 8→32-thread speedup is bounded by
    // memory bandwidth + GC, not by the engine; this measures that bound so
    // the Spark number above can be read against it. On a real 4N-executor
    // cluster each executor brings its own memory system, so this bound
    // does not apply there.
    def kernelDps(nThreads: Int): Double = KernelControl.dps(nThreads)
    kernelDps(8) // warmup
    val kernelRatios = (1 to rounds).map { _ =>
      val k8 = kernelDps(8); val k32 = kernelDps(32)
      (k8, k32, (k32 / k8) / 4.0)
    }
    val k8 = median(kernelRatios.map(_._1)); val k32 = median(kernelRatios.map(_._2))
    val ceiling = median(kernelRatios.map(_._3))
    val normEff = eff / math.min(1.0, ceiling)

    // rows joined with "\n|" so stripMargin's margin-strip leaves each
    // row's leading table pipe intact
    val pairRows = pairs.zipWithIndex.map { case ((a, b), i) =>
      f"| ${i + 1} | $a%.2f | $b%.2f | ${a / b / 4.0}%.3f |"
    }.mkString("\n|")
    val md =
      f"""# BENCH/BASELINE — measured throughput & scaling (this engine)
         |
         |Workload: full near-dup pipeline (`DedupPipeline.clusters`):
         |nxs_tokenize (ICU + NFKC_Casefold + stopwords + Porter2) → 5-gram
         |shingles → MinHash(k=128) → LSH(16×8) → Jaccard-verify(τ=0.85) +
         |SimHash(hamming≤3) + winnowing substring pass → connected
         |components → cluster resolve. Input: deterministic synthetic
         |Common-Crawl-style corpus (seed=42), $nDocs%,d pages, read from
         |parquet. One untimed warmup, then $rounds PAIRED local[8]/local[32]
         |runs (fresh session per run, `spark.sql.shuffle.partitions` =
         |cores); headline efficiency = median of pairwise (T_8/T_32)/4 —
         |pairing because this sandbox's effective CPU drifts ±2× on minute
         |timescales, which poisons medians of independently pooled runs.
         |
         |The reference (rmind/nxsearch) publishes no numbers (BASELINE.md);
         |these are the engine's own baseline figures for future rounds.
         |
         || pair | T_8 (s) | T_32 (s) | efficiency |
         ||---|---|---|---|
         |$pairRows
         |
         || parallelism | median wall (s) | docs/sec |
         ||---|---|---|
         || local[8]  | ${m8}%.2f | ${dps8}%.0f |
         || local[32] | ${m32}%.2f | ${dps32}%.0f |
         |
         |**Scaling efficiency: median pairwise (T_8 / T_32) / 4 = ${eff}%.3f**
         |(target ≥ 0.8 per BASELINE.json north_rule; sandbox evidence
         |protocol = same job + input at two parallelism levels, per driver
         |instruction).
         |
         |## Platform ceiling (single shared-memory box)
         |
         |The same per-doc kernel (tokenize → shingles → minhash → simhash →
         |winnow) run on raw JVM threads, **no Spark**:
         |
         || threads | kernel docs/sec (median of $rounds) |
         ||---|---|
         || 8  | ${k8}%.0f |
         || 32 | ${k32}%.0f |
         |
         |Raw 8→32-thread scaling on this box = **${ceiling}%.3f** — the memory
         |bandwidth + GC bound of one machine, independent of any engine. The
         |pipeline's Spark-level efficiency normalized to that ceiling is
         |**${normEff}%.3f**. A real N→4N *executor* scale-up multiplies
         |machines (memory systems included), where the single-box bound does
         |not apply; the shuffle-light design (one unified candidate shuffle,
         |star edges, one-long bucket keys, inline SimHash verify, AQE +
         |salting) is what carries the ≥ 0.8 target there.
         |""".stripMargin

    Files.createDirectories(Paths.get("BENCH"))
    // Preserve hand-maintained analysis sections (variance history, recall
    // tables, per-stage attribution) below the marker: only the measured
    // part above it is regenerated.
    val marker = "<!-- preserved -->"
    val out = Paths.get("BENCH/BASELINE.md")
    val tail =
      if (Files.exists(out)) {
        val cur = Files.readString(out)
        val i = cur.indexOf(marker)
        if (i >= 0) cur.substring(i) else ""
      } else ""
    Files.writeString(out, md + (if (tail.nonEmpty) "\n" + tail else ""))
    val json = s"""{"metric":"scaling_efficiency","value":$eff,"unit":"ratio","t8_sec":$m8,"t32_sec":$m32,"docs":$nDocs,"docs_per_sec_8":$dps8,"docs_per_sec_32":$dps32,"platform_ceiling":$ceiling,"normalized_efficiency":$normEff,"pair_ratios":[${ratios.map(r => f"${r / 4.0}%.4f").mkString(",")}]}"""
    Files.writeString(Paths.get("BENCH/scaling.json"), json + "\n")
    println(json)
  }
}
