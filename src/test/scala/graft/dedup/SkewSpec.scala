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
