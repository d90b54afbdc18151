package graft.dedup

import graft.SparkTestBase
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class SkewSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark
  import spark.implicits._

  // hot key "h" carries 1000 rows, cold keys one each
  private lazy val df = ((1 to 1000).map(i => ("h", s"u$i", i.toLong)) ++
    (1 to 50).map(i => (s"c$i", s"v$i", i.toLong)))
    .toDF("domain", "url", "v")

  test("salt is deterministic and bounded") {
    val salts = df.select(Skew.salt(col("url"), 8).as("s"))
      .distinct().as[Int].collect().sorted
    assert(salts.forall(s => s >= 0 && s < 8))
    val again = df.select(Skew.salt(col("url"), 8).as("s"))
      .distinct().as[Int].collect().sorted
    assert(salts.toSeq == again.toSeq)
  }

  test("saltedAgg equals plain agg (min + count)") {
    val plain = df.groupBy(col("domain").as("k"))
      .agg(min("v").as("mn"), count(lit(1)).as("n"))
      .orderBy("k").as[(String, Long, Long)].collect()
    val salted = Skew.saltedAgg(df, col("domain"), col("url"), 8,
        partials = Seq(min("v").as("mn_p"), count(lit(1)).as("n_p")),
        merges = Seq(min("mn_p").as("mn"), sum("n_p").as("n")))
      .orderBy("k").as[(String, Long, Long)].collect()
    assert(plain.toSeq == salted.toSeq)
  }

  test("champion resolve on one giant planted cluster (no window skew)") {
    // one mega-cluster of 20k members (every doc labeled to comp=1) plus
    // cold singletons — the parked-domain shape resolveClusters must handle
    // without a single-task window sort. Champion must be the unique
    // (warc_ts, url, doc_id) minimum; every member resolves to the cluster.
    val ts0 = java.sql.Timestamp.valueOf("2020-01-01 00:00:00")
    def ts(i: Int) = new java.sql.Timestamp(ts0.getTime + (i % 97) * 1000L)
    val docs = ((1 to 20000).map(i => (s"u$i", i.toLong, ts(i))) ++
      (1 to 25).map(i => (s"s$i", 100000L + i, ts0)))
      .toDF("url", "doc_id", "warc_ts")
    val labels = (2 to 20000).map(i => (i.toLong, 1L)).toDF("id", "comp")
      .unionByName(Seq((1L, 1L)).toDF("id", "comp"))
    val out = DedupPipeline.resolveClusters(docs, labels)
      .select("url", "doc_id", "cluster_id", "is_champion")
    val rows = out.collect()
    assert(rows.length == 20025)
    val mega = rows.filter(_.getLong(2) == 1L)
    assert(mega.length == 20000)
    // expected champion: min (warc_ts, url, doc_id) — warc_ts cycles mod 97,
    // so the earliest ts bucket is i % 97 == 0, then lexicographic min url
    val expectedChamp = (1 to 20000).map(i => ((ts(i).getTime, s"u$i"), i))
      .minBy(_._1)._2.toLong
    val champs = mega.filter(_.getBoolean(3)).map(_.getLong(1))
    assert(champs.toSeq == Seq(expectedChamp))
    // singletons are their own champion cluster
    val single = rows.filter(_.getLong(2) > 100000L)
    assert(single.length == 25 && single.forall(_.getBoolean(3)))
  }

  test("saltedJoin equals plain join") {
    val dim = Seq(("h", "hot"), ("c1", "cold1"), ("c2", "cold2"))
      .toDF("domain", "label")
    val plain = df.join(dim, "domain")
      .select("url", "label").orderBy("url").as[(String, String)].collect()
    val salted = Skew.saltedJoin(df, dim, "domain", col("url"), 8)
      .select("url", "label").orderBy("url").as[(String, String)].collect()
    assert(plain.toSeq == salted.toSeq)
  }
}
