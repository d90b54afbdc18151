package graft.dedup

import org.apache.spark.sql.SparkSession

/** Dev utility (r7): compact the bench's persisted incremental store to a
  * single fold batch, so repeated IncProbe runs measure a comparable store
  * state (every probe/bench ingest otherwise grows the stage unions). */
object IncCompact {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toInt).getOrElse(400000)
    val spark0 = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark0.sparkContext.setLogLevel("ERROR")
    graft.functions.registerAll(spark0)
    val spark = spark0.newSession()
    spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "true")
    graft.functions.registerAll(spark)
    val store = new IncrementalDedup(spark,
      s"/tmp/graft_scale_corpus/inc_store_c$n", DedupConfig())
    val t0 = System.nanoTime()
    val ids = store.compact()
    println(f"[inccompact] ${(System.nanoTime() - t0) / 1e9}%.1f s -> $ids")
  }
}
