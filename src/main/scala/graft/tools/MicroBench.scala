package graft.tools

import graft.corpus.SyntheticCorpus
import graft.functions.{MinHashSigExpr, ShingleHashesExpr, SimHash64Expr, WinnowExpr}
import graft.text.{TextPipeline, Tokenizer}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.unsafe.types.UTF8String

/** Dev-only single-thread microbenchmark of the per-document signature
  * pipeline components (no Spark). */
object MicroBench {
  def main(args: Array[String]): Unit = {
    val nDocs = args.headOption.map(_.toInt).getOrElse(2000)
    val cfg = SyntheticCorpus.Config(nClusters = nDocs)
    val texts = (0 until nDocs).map { c =>
      SyntheticCorpus.pageOf(cfg, c.toLong, 0).text
    }.toArray

    def bench(name: String)(f: => Unit): Unit = {
      f // warmup
      f
      val t0 = System.nanoTime()
      f
      val us = (System.nanoTime() - t0) / 1e3 / nDocs
      println(f"[micro] $name%-22s ${us}%8.1f us/doc")
    }

    // threaded scaling probe: same per-doc expression path on N threads
    def threaded(nThreads: Int, reps: Int): Double = {
      val pool = java.util.concurrent.Executors.newFixedThreadPool(nThreads)
      val t0 = System.nanoTime()
      val futs = (0 until nThreads).map { _ =>
        pool.submit(new Runnable {
          def run(): Unit = {
            val en0 = UTF8String.fromString("en")
            var r = 0
            while (r < reps) {
              texts.foreach { t =>
                val u = UTF8String.fromString(t)
                val toks = graft.functions.NxsTokenizeExpr.tokenize(
                  u, en0, "normalizer,stopwords,stemmer", true)
                val sh = ShingleHashesExpr.shingles(toks, 5, 42L)
                MinHashSigExpr.signature(sh, 128, 42L)
                SimHash64Expr.simhash(toks, 42L)
                WinnowExpr.fingerprints(toks, 40, 21, 42L)
              }
              r += 1
            }
          }
        })
      }
      futs.foreach(_.get())
      pool.shutdown()
      val secs = (System.nanoTime() - t0) / 1e9
      nThreads.toLong * reps * nDocs / secs // docs/sec aggregate
    }
    if (args.length > 1 && args(1) == "threads") {
      for (n <- Seq(1, 8, 32)) {
        val dps = threaded(n, 2)
        println(f"[micro] threads=$n%-3d  ${dps}%10.0f docs/sec  (${dps / n}%8.0f per thread)")
      }
      return
    }

    val pcfg = TextPipeline.default
    val u8 = texts.map(UTF8String.fromString)
    val en = UTF8String.fromString("en")
    bench("expr path (full)")(u8.foreach { t =>
      val toks = graft.functions.NxsTokenizeExpr.tokenize(
        t, en, "normalizer,stopwords,stemmer", true)
      val sh = ShingleHashesExpr.shingles(toks, 5, 42L)
      MinHashSigExpr.signature(sh, 128, 42L)
      SimHash64Expr.simhash(toks, 42L)
      WinnowExpr.fingerprints(toks, 40, 21, 42L)
    })
    bench("icu segments")(texts.foreach(t => Tokenizer.segments(t, "en")))
    bench("tokens (full pipe)")(texts.foreach(t => TextPipeline.tokens(t, pcfg)))
    val tokArrays = texts.map { t =>
      val ts = TextPipeline.tokens(t, pcfg)
      new GenericArrayData(ts.map(s => UTF8String.fromString(s): Any))
    }
    bench("shingles w=5")(tokArrays.foreach(a => ShingleHashesExpr.shingles(a, 5, 42L)))
    val shArrays = tokArrays.map(a => ShingleHashesExpr.shingles(a, 5, 42L))
    bench("minhash k=128")(shArrays.foreach(a => MinHashSigExpr.signature(a, 128, 42L)))
    bench("simhash")(tokArrays.foreach(a => SimHash64Expr.simhash(a, 42L)))
    bench("winnow 40/21")(tokArrays.foreach(a => WinnowExpr.fingerprints(a, 40, 21, 42L)))
  }
}
