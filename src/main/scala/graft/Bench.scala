package graft

import graft.bench.{HostControls, KernelControl}
import graft.corpus.SyntheticCorpus
import graft.dedup.{DedupConfig, DedupPipeline}
import graft.ops.{RelationalOps, TrainingOps}
import graft.search.Searcher
import graft.text.TextPipeline
import org.apache.spark.sql.SparkSession

import java.nio.file.{Files, Paths}

/**
 * Headline benchmark — one JSON line per run:
 *   {"metric":"total","value":N,"unit":"sec","queries":{...},"sf":...}
 *
 * Protocol (same family as bench/ScalingBench, the BENCH/BASELINE.md
 * writer): one untimed warmup per query, then the median of
 * `SPARK_GRAFT_BENCH_RUNS` (default 3) timed runs. The JSON summary is
 * printed as a bare stdout line (run is forked with StdoutOutput) AND
 * written to BENCH_SELF.json so the driver's parse cannot miss it.
 *
 * ADJUDICABILITY (r5 lesson: the official artifact carried 2-18x slowdowns
 * its own CPU-kernel controls could not see, while its paired legs ran the
 * same job at clean-window speed — the artifact was internally inconsistent
 * and unreadable as evidence):
 *
 *  1. RAW per-run times + a wall-clock timestamp per run are emitted for
 *     every query (`queries_raw`), not just medians — throttle windows can
 *     be correlated post hoc, and a 3x spread inside one query's runs is
 *     visible instead of averaged away. Any query whose max/min run ratio
 *     exceeds 2 is flagged `storm_suspect` (also summarized top-level).
 *  2. The dedup headline runs ONE FULL RUN PER FRESH SESSION, exactly like
 *     the paired legs — the heavy untimed setup (699k-doc corpus write +
 *     full base-store ingest) happens in its own session that is STOPPED
 *     before the first timed run, so its JVM/session state (block manager,
 *     AQE caches, heap shape) cannot leak into the timed block. The r5
 *     artifact's headline median and its own fresh-session paired legs
 *     disagreed 2.6x; under this protocol they are the same measurement.
 *  3. Non-CPU controls bracket the timed work alongside the CPU kernel:
 *     `bw_gbps` (1 GiB multi-threaded streaming — DRAM bandwidth, the
 *     resource the shuffle stages actually saturate per the r3
 *     attribution) and `io_mbps` (100 MB fsync'd write + read-back — the
 *     page-cache/disk path parquet scans ride). A host whose memory bus or
 *     page cache is contended now shows it in the artifact even when the
 *     cache-resident CPU kernel stays fast.
 *
 * SELF-NORMALIZATION (unchanged from r4/r5): kernel_pre/mid/post bracket
 * the dedup block and the session; `dedup_docs_per_sec_norm` = dedup
 * docs/s ÷ mean(kernel_pre, kernel_mid); `kernel_sustained` (~20 s
 * continuous) separates burst-credit CPU quota throttling from real
 * slowness; `paired_dedup` appends SPARK_GRAFT_BENCH_PAIRS alternating
 * local[8]/local[cpus] fresh-session pairs with the storm-discard rule
 * (pairs where t8 < t_hi are measurement corruption, not data).
 *
 * State hygiene: inter-run clears unpersist ONLY the persistent RDDs the
 * just-finished run created (a snapshot-diff) — clearing the whole context
 * used to kill the incremental store's localCheckpointed blocks (the
 * "lineage truncated" WARN spam in every r4/r5 artifact tail) and was a
 * latent foot-gun for any still-referenced lazy consumer.
 */
object Bench {

  /** Delta-batch shape of the incremental bench store. Shared with
    * tools/IncResumeProbe: addBatch is a WRITE path, so a diagnostic
    * resume of a crashed bench batch must derive byte-identical pages —
    * a drifted copy of this constant/derivation would commit wrong
    * content into the store under the same batch id. */
  val DeltaClusters = 600 // ~1k pages at the corpus cluster-size mix
  def deltaPages(s: SparkSession, nClusters: Int, off: Long)
      : org.apache.spark.sql.DataFrame = {
    import s.implicits._
    val cCfg = SyntheticCorpus.Config(nClusters = nClusters)
    s.range(off, off + DeltaClusters)
      .flatMap(c => (0 until SyntheticCorpus.sizeOf(cCfg, c))
        .map(m => SyntheticCorpus.pageOf(cCfg, c, m)))
      .toDF()
  }

  private def newSession(cores: Int): SparkSession = {
    val s = SparkSession.builder()
      .master(s"local[$cores]")
      .config("spark.sql.shuffle.partitions", cores.toString)
      .config("spark.sql.adaptive.enabled", "true")
      // Coalescing collapses the CPU-heavy-but-byte-light pair stages to a
      // handful of partitions (serializing them); AQE itself stays on — its
      // runtime broadcast conversions are a measured 2x win (ScaleProbe A/B)
      .config("spark.sql.adaptive.coalescePartitions.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      // local bench inputs are small files; keep every core fed (see
      // ScalingBench for rationale — at real file sizes the default is right)
      .config("spark.sql.files.maxPartitionBytes", (2L << 20).toString)
      .config("spark.sql.files.openCostInBytes", (64L << 10).toString)
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    // Releasing a localCheckpointed RDD always logs "lineage truncated ...
    // cannot be recomputed" at WARN from the RDD class itself. Every such
    // release here is BY DESIGN (the pipeline's Materialize.release and the
    // scoped inter-run clear release only state the finished run created —
    // nothing re-reads it), so in bench sessions the rdd package logs at
    // ERROR: the artifact tail stays readable for UNEXPECTED warnings.
    org.apache.logging.log4j.core.config.Configurator.setLevel(
      "org.apache.spark.rdd", org.apache.logging.log4j.Level.ERROR)
    graft.functions.registerAll(s)
    s
  }

  /** Child session for the incremental store: delta ingest is many SMALL
    * stages, so AQE partition coalescing is a win there (the trade-off that
    * is a loss for the big pipeline's byte-light pair stages) and shuffles
    * start delta-sized. */
  private def incSessionOf(s: SparkSession): SparkSession = {
    val inc = s.newSession()
    inc.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "true")
    inc.conf.set("spark.sql.shuffle.partitions", "8")
    graft.functions.registerAll(inc)
    inc
  }

  /** One query's evidence: raw times (seconds) + per-run start timestamps
    * (epoch ms) + the first run's row count. */
  private final case class RunSeries(name: String, raws: Seq[Double],
      ts: Seq[Long], rows: Long) {
    def median: Double =
      if (raws.isEmpty || raws.exists(_ < 0)) -1.0
      else {
        val s = raws.sorted
        if (s.size % 2 == 1) s(s.size / 2)
        else (s(s.size / 2 - 1) + s(s.size / 2)) / 2.0
      }
    /** max/min > 2 inside one query's runs = some runs saw a different
      * host than others; the median is storm-contaminated evidence. */
    def stormSuspect: Boolean =
      raws.size >= 2 && raws.forall(_ > 0) && raws.max / raws.min > 2.0
    def json: String =
      s""""$name":{"runs":[${raws.map(r => f"$r%.3f").mkString(",")}],""" +
        s""""ts_ms":[${ts.mkString(",")}],"rows":$rows,""" +
        s""""storm_suspect":$stormSuspect}"""
  }

  def main(args: Array[String]): Unit = {
    // f"" interpolators format via the DEFAULT locale; a comma-decimal
    // locale would render "12,345" into the machine-read JSON artifact
    java.util.Locale.setDefault(java.util.Locale.ROOT)
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val runs = sys.env.getOrElse("SPARK_GRAFT_BENCH_RUNS", "3").toInt
    val pairedLeg = sys.env.getOrElse("SPARK_GRAFT_BENCH_PAIRED", "1") != "0"
    val kThreads = math.min(cpus, 32)

    // ------------------------------------------------------------------
    // Phase 0 — UNTIMED setup in its own session, stopped before any timed
    // work: corpus parquet, incremental base store, durable search index.
    // ------------------------------------------------------------------
    val setup = newSession(cpus)
    val corpusDir = "/tmp/graft_scale_corpus" // shared with bench/ScalingBench
    // 400k clusters ≈ 699k pages — the BENCH/BASELINE.md corpus, so the
    // reported dedup docs/sec is directly comparable to the baseline.
    val nClusters = sys.env.getOrElse("SPARK_GRAFT_BENCH_CLUSTERS", "400000").toInt
    val corpusPath = s"$corpusDir/c$nClusters"
    if (!new java.io.File(s"$corpusPath/_SUCCESS").exists()) {
      SyntheticCorpus.pages(setup, SyntheticCorpus.Config(nClusters = nClusters))
        .write.mode("overwrite").parquet(corpusPath)
    }
    val corpusDocs = setup.read.parquet(corpusPath).count()

    // Incremental delta-ingest state: a persisted IncrementalDedup store
    // holding the WHOLE bench corpus as its base batch (resumed by
    // fingerprint on later invocations), against which the timed query
    // ingests a fresh ~1k-page delta batch — the per-batch-O(delta) claim,
    // measured against a large stored corpus.
    val incRoot = s"$corpusDir/inc_store_c$nClusters"
    locally {
      val incSession = incSessionOf(setup)
      val incStore = new graft.dedup.IncrementalDedup(incSession, incRoot,
        DedupConfig())
      def deltas(off: Long) = deltaPages(incSession, nClusters, off)
      try {
        // Config probe FIRST: a store pinned under an older config
        // fingerprint passes every healthy-looking setup branch and the
        // mismatch then explodes inside the TIMED delta query. Probing here
        // routes it into this try's rebuild path, untimed.
        incStore.checkConfig()
        val existing = incStore.batches()
        if (existing.isEmpty)
          incStore.addBatch("base", incSession.read.parquet(corpusPath))
        else incStore.incompleteBatch().foreach {
          case id if id.startsWith("delta_") =>
            incStore.addBatch(id, deltas(id.stripPrefix("delta_").toLong))
          case _ => incStore.addBatch("base", incSession.read.parquet(corpusPath))
        }
        if (incStore.batches().size > 8) { incStore.compact(); () }
      } catch { case e: Throwable =>
        // any wedged state (killed earlier bench, format change): rebuild
        // from scratch, still untimed — the bench must never wedge
        System.err.println(s"[bench] incremental store setup failed ($e); rebuilding")
        e.printStackTrace()
        graft.tables.FsUtil.deleteRecursively(new java.io.File(incRoot))
        try incStore.addBatch("base", incSession.read.parquet(corpusPath))
        catch { case e2: Throwable =>
          System.err.println(s"[bench] incremental store rebuild failed: $e2")
        }
      }
    }

    def benchDocs(s: SparkSession) = TrainingOps.documents(s, sfDir)
      .select(org.apache.spark.sql.functions.col("doc_id"),
        org.apache.spark.sql.functions.col("text"))
    // One durable index build (untimed) that search_queries reopens per run.
    val searchIdxRoot = Files.createTempDirectory("graft_bench_idx_base").toString
    graft.search.IndexStore.buildOrOpen(
      benchDocs(setup), TextPipeline.default, setup, searchIdxRoot)
    setup.stop() // nothing of the setup session survives into timed work

    // Deferred temp-dir deletions: registered inside timed closures, DELETED
    // during the (untimed) inter-run state clear — file removal must not
    // count against the measured stage.
    val deferredDeletes = scala.collection.mutable.ArrayBuffer.empty[java.io.File]
    /** Unpersist ONLY the persistent RDDs created since `pre` — the
      * incremental store's (and any other bystander's) checkpoint blocks
      * survive; see the class doc. */
    def scopedClear(s: SparkSession, pre: Set[Int]): Unit = {
      s.catalog.clearCache()
      s.sparkContext.getPersistentRDDs.foreach { case (id, rdd) =>
        if (!pre.contains(id)) rdd.unpersist(true)
      }
      deferredDeletes.foreach(graft.tables.FsUtil.deleteRecursively)
      deferredDeletes.clear()
    }

    // ------------------------------------------------------------------
    // Phase 1 — the dedup headline, one FULL RUN PER FRESH SESSION (the
    // paired-leg protocol), bracketed by CPU + bandwidth controls.
    // ------------------------------------------------------------------
    val kernelPre = KernelControl.dps(kThreads)
    val bwPre = HostControls.bandwidthGBps(kThreads)

    def dedupLeg(cores: Int): (Double, Long) = {
      val s = newSession(cores)
      try {
        val pre = s.sparkContext.getPersistentRDDs.keySet.toSet
        val t0 = System.nanoTime()
        val rows = DedupPipeline
          .clusters(s.read.parquet(corpusPath), DedupConfig()).count()
        val t = (System.nanoTime() - t0) / 1e9
        scopedClear(s, pre)
        (t, rows)
      } finally s.stop()
    }
    val dedupSeries =
      try {
        dedupLeg(cpus) // untimed warmup leg (JIT/codegen state is JVM-wide)
        val legs = (1 to runs).map { _ =>
          val at = System.currentTimeMillis()
          (dedupLeg(cpus), at)
        }
        RunSeries("dedup_pipeline", legs.map(_._1._1), legs.map(_._2),
          legs.head._1._2)
      } catch { case e: Throwable =>
        // the artifact must still emit (with -1 here) when the headline
        // dies — a bench that crashes artifact-less is unadjudicable
        System.err.println(s"[bench] dedup_pipeline failed: $e")
        e.printStackTrace()
        RunSeries("dedup_pipeline", Seq(-1.0),
          Seq(System.currentTimeMillis()), -1L)
      }
    val kernelMid = KernelControl.dps(kThreads)
    val bwMid = HostControls.bandwidthGBps(kThreads)

    // ------------------------------------------------------------------
    // Phase 2 — the remaining queries share one fresh session (their
    // per-query state is small; the heavyweight isolation is for the
    // headline), with scoped clears between runs.
    // ------------------------------------------------------------------
    val spark = newSession(cpus)
    val incSession = incSessionOf(spark)
    val incStore = new graft.dedup.IncrementalDedup(incSession, incRoot,
      DedupConfig())
    def deltas(off: Long) = deltaPages(incSession, nClusters, off)
    // Monotone cluster-id offset so every delta batch (across invocations)
    // has fresh, deterministic content and ids.
    val offFile = java.nio.file.Paths.get(incRoot, "DELTA_OFFSET")
    def nextDeltaOffset(): Long = {
      val cur =
        if (Files.exists(offFile))
          new String(Files.readAllBytes(offFile)).trim.toLong
        else nClusters.toLong
      Files.createDirectories(offFile.getParent)
      Files.write(offFile, (cur + DeltaClusters).toString.getBytes)
      cur
    }

    val benches: Seq[(String, () => Long)] = Seq(
      "tokenize_scan" -> (() =>
        spark.read.parquet(corpusPath)
          .select(org.apache.spark.sql.functions.explode(
            functions.nxs_tokenize(org.apache.spark.sql.functions.col("text"))))
          .count()),
      "minhash_dedup_docs" -> (() => TrainingOps.minhashDedup(spark, sfDir).count()),
      // Delta ingest against the 699k-doc store: signs + buckets + verifies
      // + relabels ONLY the ~1k-page batch (store reads prune by partition /
      // doc_id / comp key sets). The returned full-label view is NOT
      // consumed — the timed work is the committed ingest itself; rows =
      // the delta label stage (tiny).
      "incremental_delta_ingest" -> (() => {
        val off = nextDeltaOffset()
        incStore.addBatch(s"delta_$off", deltas(off))
        incSession.read.parquet(s"$incRoot/labels_delta_$off/data").count()
      }),
      // Production shape: build the DURABLE index once (index_build times
      // the committed-stage build into a fresh root each run), query it
      // many times (search_queries reopens the committed tables — no
      // rebuild, no long-lived .cache()).
      "index_build" -> (() => {
        val root = Files.createTempDirectory("graft_bench_idx").toString
        val idx = graft.search.IndexStore.buildOrOpen(
          benchDocs(spark), TextPipeline.default, spark, root)
        val n = idx.docCount
        deferredDeletes += new java.io.File(root) // cleaned outside the clock
        n
      }),
      "search_queries" -> (() => {
        val idx = graft.search.IndexStore.buildOrOpen(
          sys.error("committed index must not rebuild"), TextPipeline.default,
          spark, searchIdxRoot)
        Seq("spark AND join", "hash OR merge", "scan AND NOT slow")
          .map(q => Searcher.search(idx, q).toOption.get.count()).sum
      }),
      "relational_bm25" -> (() => RelationalOps.bm25(spark, sfDir).count()),
      "embed_topk" -> (() => TrainingOps.embedTopK(spark, sfDir, nProbes = 20).count()),
      "ann_lsh" -> (() => TrainingOps.annLsh(spark, sfDir).count()),
      "events_sessions" -> (() => TrainingOps.eventsSessions(spark, sfDir).count()))

    /** 1 untimed warmup + `runs` timed runs with raw times + timestamps,
      * scoped state clears between runs. */
    def runSeries(name: String, f: () => Long): RunSeries =
      try {
        val pre0 = spark.sparkContext.getPersistentRDDs.keySet.toSet
        f(); scopedClear(spark, pre0) // warmup
        var rows = -1L
        val (raws, ts) = (1 to runs).map { _ =>
          val pre = spark.sparkContext.getPersistentRDDs.keySet.toSet
          val at = System.currentTimeMillis()
          val t0 = System.nanoTime()
          val r = f()
          val t = (System.nanoTime() - t0) / 1e9
          if (rows < 0) rows = r
          scopedClear(spark, pre)
          (t, at)
        }.unzip
        RunSeries(name, raws, ts, rows)
      } catch { case e: Throwable =>
        // Full stack + cause chain: getMessage alone is null for unboxing
        // NPEs and some VM errors, which made a one-off failure
        // undiagnosable from the artifact.
        System.err.println(s"[bench] $name failed: $e")
        e.printStackTrace()
        RunSeries(name, Seq(-1.0), Seq(System.currentTimeMillis()), -1L)
      }

    val series = dedupSeries +: benches.map { case (n, f) => runSeries(n, f) }

    val kernelPost = KernelControl.dps(kThreads)
    val bwPost = HostControls.bandwidthGBps(kThreads)
    val (ioW, ioR) = HostControls.diskMBps()
    // Sustained control: separates burst-credit CPU throttling (short
    // kernel fast, sustained load slow) from real engine slowness on the
    // long queries. Ratio << 1 vs the short kernel = the HOST throttles
    // sustained load; read the wall-clock medians accordingly.
    val kernelSustained = KernelControl.sustainedDps(kThreads)
    val kernel = (kernelPre + kernelPost) / 2.0

    val qs = series.map(s => "\"" + s.name + "\":" + s.median)
      .mkString("{", ",", "}")
    val qsRaw = series.map(_.json).mkString("{", ",", "}")
    val storms = series.filter(_.stormSuspect).map("\"" + _.name + "\"")
      .mkString("[", ",", "]")
    val total = series.map(_.median).filter(_ > 0).sum
    val dedupSec = dedupSeries.median
    val dedupDps = if (dedupSec > 0) corpusDocs / dedupSec else -1.0
    // Normalize the headline against the kernels that BRACKET it (pre/mid),
    // not the whole-session pair.
    val kernelDedup = (kernelPre + kernelMid) / 2.0
    val dedupNorm =
      if (dedupDps > 0 && kernelDedup > 0) dedupDps / kernelDedup else -1.0

    def emit(pairedJson: String): Unit = {
      val json =
        s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,""" +
        s""""sf":"$sfDir","protocol":"median_of_${runs}_fresh_session_headline",""" +
        s""""queries_raw":$qsRaw,"storm_suspect":$storms,""" +
        s""""dedup_corpus_docs":$corpusDocs,"dedup_docs_per_sec":$dedupDps,""" +
        f""""kernel_docs_per_sec":$kernel%.0f,"kernel_pre":$kernelPre%.0f,""" +
        f""""kernel_mid":$kernelMid%.0f,"kernel_post":$kernelPost%.0f,""" +
        f""""kernel_sustained":$kernelSustained%.0f,""" +
        f""""bw_gbps":{"pre":$bwPre%.2f,"mid":$bwMid%.2f,"post":$bwPost%.2f},""" +
        f""""io_mbps":{"write":$ioW%.0f,"read":$ioR%.0f},""" +
        f""""dedup_docs_per_sec_norm":$dedupNorm%.4f,""" +
        f""""dedup_norm_sustained":${
          if (dedupDps > 0 && kernelSustained > 0) dedupDps / kernelSustained
          else -1.0}%.4f""" +
        pairedJson + "}"
      // File first (the channel that cannot be mangled by log prefixes),
      // then the bare stdout line.
      Files.writeString(Paths.get("BENCH_SELF.json"), json + "\n")
      println(json)
    }
    // Emit the main results BEFORE the paired legs: a harness that times
    // out mid-leg still gets a complete artifact (re-emitted with the
    // paired fields appended on completion — a tail parse takes the last
    // line either way).
    emit("")

    // Paired scaling leg: alternating local[8]/local[cpus] dedup runs
    // back-to-back (same throttle window), fresh session each — the same
    // leg the headline now uses. Degenerate below 2x the low leg's cores;
    // the fields name the actual high-leg core count so a non-default
    // SPARK_GRAFT_CPUS cannot be misread as the 8-vs-32 protocol.
    if (pairedLeg && cpus >= 16) {
      spark.stop()
      // Storm-discard rule: the host's burst-credit throttle can flip
      // MID-PAIR, and a pair where the 8-core leg beats the high-core leg
      // (t8 < t_hi) is physically impossible for this job absent a throttle
      // flip — such pairs are measurement corruption, not data, and are
      // discarded rather than averaged. Reported: the median pairwise ratio
      // over the surviving pairs + a paired_consistent flag (false when any
      // pair was discarded — read the ≥5-pair ScalingBench run instead).
      val nPairs = sys.env.getOrElse("SPARK_GRAFT_BENCH_PAIRS", "3").toInt
      // bandwidth readings BRACKETING each pair: the legs run minutes after
      // the main block, and two r6 artifacts showed them inside degraded bus
      // windows — the pair rows must carry their own window evidence, and a
      // single post-pair reading would miss degradation that cleared while
      // the second leg ran. bw0 of pair k+1 is (time-wise) just after bw1 of
      // pair k, so the sequence samples the whole paired block.
      val pairs = (1 to nPairs).map { _ =>
        val bw0 = HostControls.bandwidthGBps(kThreads)
        val t8 = dedupLeg(8)._1
        val tHi = dedupLeg(cpus)._1
        val bw1 = HostControls.bandwidthGBps(kThreads)
        (t8, tHi, bw0, bw1)
      }
      val valid = pairs.filter { case (t8, tHi, _, _) => t8 >= tHi }
      val effs = valid.map { case (t8, tHi, _, _) => (t8 / tHi) / (cpus / 8.0) }.sorted
      // True median: for even survivor counts average the two middles —
      // effs(size/2) alone is the UPPER middle, which overstates the
      // efficiency exactly when a storm pair was discarded (3 → 2 pairs).
      val effMed =
        if (effs.isEmpty) -1.0
        else if (effs.size % 2 == 1) effs(effs.size / 2)
        else (effs(effs.size / 2 - 1) + effs(effs.size / 2)) / 2.0
      val consistent = valid.size == pairs.size
      val pairsJson = pairs.map { case (t8, tHi, bw0, bw1) =>
        f"""{"t8_sec":$t8%.3f,"t_hi_sec":$tHi%.3f,""" +
          f""""bw_pre_gbps":$bw0%.2f,"bw_post_gbps":$bw1%.2f}"""
      }.mkString("[", ",", "]")
      emit(
        f""","paired_dedup":{"pairs":$pairsJson,"cores_hi":$cpus,""" +
        f""""n_pairs":$nPairs,"n_valid":${valid.size},""" +
        f""""efficiency_median":$effMed%.4f,"paired_consistent":$consistent}""")
    } else spark.stop()
  }
}
