package graft.bench

import graft.corpus.SyntheticCorpus
import org.apache.spark.unsafe.types.UTF8String

/**
 * In-process host-speed control: the per-document signature kernel
 * (tokenize → shingles → minhash → simhash → winnow) on raw JVM threads,
 * NO Spark. This sandbox's effective CPU drifts ±2× on minute timescales
 * (BENCH/BASELINE.md), which makes single-session wall-clock numbers
 * unadjudicable across sessions; running this control INSIDE every bench
 * session gives each artifact its own machine-speed yardstick, so a
 * reader can separate engine regressions from host throttle:
 * `docs_per_sec / kernel_docs_per_sec` is stable across throttle states.
 */
object KernelControl {

  /** Aggregate docs/sec of the kernel on `nThreads` threads over a
    * deterministic synthetic corpus. One untimed warmup pass per call. */
  def dps(nThreads: Int, nDocs: Int = 3000, reps: Int = 2): Double = {
    val kcfg = SyntheticCorpus.Config(nClusters = nDocs)
    val texts = (0 until nDocs).map(c =>
      SyntheticCorpus.pageOf(kcfg, c.toLong, 0).text).toArray
    def run(threads: Int, r: Int): Double = {
      val pool = java.util.concurrent.Executors.newFixedThreadPool(threads)
      val t0 = System.nanoTime()
      val futs = (0 until threads).map { _ =>
        pool.submit(new Runnable {
          def run(): Unit = {
            val en = UTF8String.fromString("en")
            var i = 0
            while (i < r) {
              texts.foreach { s =>
                val u = UTF8String.fromString(s)
                val toks = graft.functions.NxsTokenizeExpr.tokenize(
                  u, en, "normalizer,stopwords,stemmer", true)
                val sh = graft.functions.ShingleHashesExpr.shingles(toks, 5, 42L)
                graft.functions.MinHashSigExpr.signature(sh, 128, 42L)
                graft.functions.SimHash64Expr.simhash(toks, 42L)
                graft.functions.WinnowExpr.fingerprints(toks, 40, 21, 42L)
              }
              i += 1
            }
          }
        })
      }
      try futs.foreach(_.get())
      finally pool.shutdownNow() // non-daemon threads must not outlive a failure
      threads.toLong * r * nDocs / ((System.nanoTime() - t0) / 1e9)
    }
    run(nThreads, 1) // warmup (JIT is shared JVM state, cheap re-warm)
    run(nThreads, reps)
  }

  /** Sustained variant: keeps all threads busy for ~`seconds` of continuous
    * work and reports the aggregate docs/sec. The short `dps` control
    * measures burst speed; hosts with burst-credit CPU quotas can run
    * bursts at full speed while throttling sustained load — comparing the
    * two separates that failure mode from engine regressions on
    * long-running queries (observed 2026-08-17: short kernel 134k docs/s
    * while a 4-minute Spark block ran 3× slower, then a 30 s leg fast
    * again). */
  def sustainedDps(nThreads: Int, seconds: Int = 20, nDocs: Int = 3000): Double = {
    val kcfg = SyntheticCorpus.Config(nClusters = nDocs)
    val texts = (0 until nDocs).map(c =>
      SyntheticCorpus.pageOf(kcfg, c.toLong, 0).text).toArray
    val pool = java.util.concurrent.Executors.newFixedThreadPool(nThreads)
    val stopAt = System.nanoTime() + seconds * 1_000_000_000L
    val done = new java.util.concurrent.atomic.AtomicLong(0L)
    val t0 = System.nanoTime()
    val futs = (0 until nThreads).map { _ =>
      pool.submit(new Runnable {
        def run(): Unit = {
          val en = UTF8String.fromString("en")
          while (System.nanoTime() < stopAt) {
            texts.foreach { s =>
              val u = UTF8String.fromString(s)
              val toks = graft.functions.NxsTokenizeExpr.tokenize(
                u, en, "normalizer,stopwords,stemmer", true)
              val sh = graft.functions.ShingleHashesExpr.shingles(toks, 5, 42L)
              graft.functions.MinHashSigExpr.signature(sh, 128, 42L)
              graft.functions.SimHash64Expr.simhash(toks, 42L)
              graft.functions.WinnowExpr.fingerprints(toks, 40, 21, 42L)
            }
            done.addAndGet(nDocs.toLong): Unit
          }
        }
      })
    }
    try futs.foreach(_.get())
    finally pool.shutdownNow()
    done.get() / ((System.nanoTime() - t0) / 1e9)
  }
}
