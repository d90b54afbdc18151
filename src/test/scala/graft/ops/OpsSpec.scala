package graft.ops

import graft.SparkTestBase
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Sanity + semantics checks for the training-data ops on the sf0.001
  * driver tables (the value-level parity with DuckDB is the driver's
  * correctness gate; see SparkEntry.oracleSql). */
class OpsSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark
  import spark.implicits._
  private val dir = "/root/testdata/sf0.001"

  test("entry flagship returns rows") {
    assert(graft.SparkEntry.entry(spark).count() > 0)
  }

  test("all SparkEntry queries run on sf0.001 and every oracle key exists") {
    val qs = graft.SparkEntry.queries
    graft.SparkEntry.oracleSql.keys.foreach { k =>
      assert(qs.contains(k), s"oracleSql key $k missing from queries")
    }
    qs.foreach { case (name, fn) =>
      val df = fn(spark, dir)
      val n = df.count()
      assert(n >= 0, name)
    }
  }

  test("exact dedup keeps one champion per text") {
    val d = TrainingOps.exactDedup(spark, dir)
    val total = d.agg(sum("n_copies")).collect()(0).getLong(0)
    assert(total == TrainingOps.documents(spark, dir).count())
  }

  test("ngram jaccard within [0,1]") {
    val j = TrainingOps.ngramJaccard(spark, dir)
    assert(j.where($"jaccard" < 0 || $"jaccard" > 1).count() == 0)
    assert(j.count() > 0)
  }

  test("embedTopK ranks by cosine desc per probe") {
    val t = TrainingOps.embedTopK(spark, dir, nProbes = 3, k = 5).collect()
    t.groupBy(_.getLong(0)).foreach { case (_, rows) =>
      val byRank = rows.sortBy(_.getInt(3)).map(_.getDouble(2))
      assert(byRank.zip(byRank.tail).forall { case (a, b) => a >= b })
    }
  }

  test("annLsh recalls planted near-duplicate vectors (vs brute force)") {
    // 40 random unit vectors, each with a near-dup copy (cos ≈ 0.997);
    // unrelated pairs have |cos| ~ 1/sqrt(64) ≈ 0.125, far below tau.
    val rnd = new scala.util.Random(11)
    def unit(v: Array[Float]): Array[Float] = {
      val n = math.sqrt(v.map(x => x.toDouble * x).sum).toFloat; v.map(_ / n)
    }
    val rows = (0 until 40).flatMap { i =>
      val base = unit(Array.fill(64)(rnd.nextGaussian().toFloat))
      val near = unit(base.map(x => x + 0.01f * rnd.nextGaussian().toFloat))
      Seq((i.toLong * 2, base), (i.toLong * 2 + 1, near))
    }
    val tmp = java.nio.file.Files.createTempDirectory("annlsh").toString
    rows.toDF("vec_id", "embedding").write.mode("overwrite")
      .parquet(s"$tmp/embeddings.parquet")
    val got = TrainingOps.annLsh(spark, tmp).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    // every returned pair really is above tau (brute-force check)
    val vecs = rows.toMap
    def cos(a: Array[Float], b: Array[Float]): Double =
      a.zip(b).map { case (x, y) => x.toDouble * y }.sum /
        (math.sqrt(a.map(x => x.toDouble * x).sum) * math.sqrt(b.map(x => x.toDouble * x).sum))
    got.foreach { case (a, b) => assert(cos(vecs(a), vecs(b)) >= 0.7) }
    // recall of the planted near-dup pairs (sign-LSH S-curve at
    // 16 bits x 8 tables gives ~0.9998 for cos ~0.997)
    val planted = (0 until 40).map(i => (i.toLong * 2, i.toLong * 2 + 1)).toSet
    val hit = planted.count(got.contains)
    assert(hit >= 36, s"planted near-dup recall $hit/40")
  }

  test("IVF top-k with every cell probed equals brute-force top-k") {
    val ivf = TrainingOps.embedIvfTopK(spark, dir, nCells = 8, nprobeCells = 8,
      nProbes = 3, k = 5).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(3))).toSet
    val bf = TrainingOps.embedTopK(spark, dir, nProbes = 3, k = 5).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(3))).toSet
    assert(ivf == bf)
  }

  test("IVF probing fewer cells returns a subset ranking with full k") {
    val part = TrainingOps.embedIvfTopK(spark, dir, nCells = 8, nprobeCells = 2,
      nProbes = 3, k = 5)
    assert(part.groupBy("probe_id").count().collect().forall(_.getLong(1) <= 5))
    assert(part.count() > 0)
  }

  test("langId detects planted languages") {
    assert(LangId.predict("the cat and the dog are in the house that is red") == "en")
    assert(LangId.predict("der Hund und die Katze sind nicht in dem Haus") == "de")
    assert(LangId.predict("le chat et le chien sont dans la maison") == "fr")
    assert(LangId.predict("el perro y el gato en la casa") == "es")
    assert(LangId.predict("世界你好这是一个测试文档") == "zh")
    assert(LangId.predict("これはテストです。日本語の文書です。") == "ja")
    assert(LangId.predict("안녕하세요 이것은 한국어 테스트 문서입니다") == "ko")
    assert(LangId.predict("") == "und")
    assert(LangId.predict("zzqx bbnm kkpl") == "und")
  }

  test("quality scores bounded") {
    val q = TrainingOps.qualityScore(spark, dir)
    assert(q.where($"stopword_ratio" < 0 || $"stopword_ratio" > 1).count() == 0)
    assert(q.where($"n_distinct" > $"n_tokens").count() == 0)
  }

  test("fingerprints deterministic") {
    val a = TrainingOps.fingerprints(spark, dir).collect().toSet
    val b = TrainingOps.fingerprints(spark, dir).collect().toSet
    assert(a == b)
    assert(a.nonEmpty)
  }
}

class MultimodalSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark
  import spark.implicits._
  private val dir = "/root/testdata/sf0.001"

  private lazy val media =
    MultimodalOps.withFakeMedia(
      TrainingOps.documents(spark, dir).select("doc_id").limit(50)).cache()

  test("decodeMeta parses header per partition") {
    val meta = MultimodalOps.decodeMeta(media).collect()
    assert(meta.length == 50)
    assert(meta.forall(m => m.width >= 16 && m.height >= 16 && m.channels == 3))
    assert(meta.forall(_.n_bytes == 13 + 64))
  }

  test("extractFeatures yields unit vectors of requested dim") {
    val f = MultimodalOps.extractFeatures(media, dim = 8).collect()
    assert(f.forall(_.features.length == 8))
    f.foreach { r =>
      val n = math.sqrt(r.features.map(x => x * x).sum)
      assert(math.abs(n - 1.0) < 1e-3 || n == 0.0)
    }
  }

  test("frameSample emits n frames per blob with increasing offsets") {
    val fr = MultimodalOps.frameSample(media, n = 4).collect()
    assert(fr.length == 50 * 4)
    fr.groupBy(_.doc_id).foreach { case (_, fs) =>
      val offs = fs.sortBy(_.frame_idx).map(_.offset)
      assert(offs.zip(offs.tail).forall { case (a, b) => a <= b })
    }
  }
}
