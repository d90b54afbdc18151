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

  test("piiScrub leaves no matching spans; repetition fractions bounded") {
    import org.apache.spark.sql.functions.col
    val p = TrainingOps.piiScrub(spark, dir)
    // replace-all semantics: no full pattern match survives the scrub
    assert(p.where(col("scrubbed").rlike(TrainingOps.EmailRe) ||
      col("scrubbed").rlike(TrainingOps.Ipv4Re) ||
      col("scrubbed").rlike(TrainingOps.PhoneRe)).count() == 0)
    // the synthesis plants at least one email per doc; counts must see it
    assert(p.where(col("n_emails") < 1).count() == 0)
    assert(p.where(col("scrubbed").contains("<EMAIL>")).count() == p.count())
    val r = TrainingOps.repetitionStats(spark, dir)
    assert(r.count() > 0)
    assert(r.where(col("top_bigram_frac") <= 0 ||
      col("top_bigram_frac") > 1).count() == 0)
    assert(r.where(col("dup_bigram_frac") < 0 ||
      col("dup_bigram_frac") > 1).count() == 0)
    // a doc's top bigram is itself duplicated whenever it REPEATS (max
    // cnt >= 2 <=> top_frac > 1/n_bigrams requires the n_bigrams >= 2
    // guard: a single-bigram doc has top=1.0 with nothing duplicated)
    assert(r.where(col("n_bigrams") >= 2 &&
      col("top_bigram_frac") > lit(0.5) &&
      col("dup_bigram_frac") < col("top_bigram_frac")).count() == 0)
  }

  test("decontaminate flags benchmark docs and their near-dups only") {
    import org.apache.spark.sql.functions.col
    val d = TrainingOps.decontaminate(spark, dir)
    // every benchmark-slice doc LONG ENOUGH TO HAVE A 13-GRAM self-flags
    // (a shorter doc has no windows and correctly cannot be contaminated)
    val longBench = TrainingOps.documents(spark, dir)
      .where(col("doc_id") % 49 === 0 && col("text").isNotNull &&
        size(filter(split(lower(col("text")), " "), t => t =!= "")) >= 13)
      .select("doc_id")
    assert(d.join(longBench, "doc_id").where(!col("contaminated"))
      .count() == 0)
    // flagged docs all have positive hit counts; unflagged all zero
    assert(d.where(col("contaminated") =!= (col("n_hits") > 0)).count() == 0)
    // output covers the whole table (zero-filled left join)
    assert(d.count() == TrainingOps.documents(spark, dir).count())
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

/** Lloyd-refined IVF: deterministic refinement quality + the persisted
  * quantizer stage (build-once, open-everywhere — the ANN analogue of the
  * durable search index). */
class AnnIvfSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark
  import org.apache.spark.sql.functions._
  import spark.implicits._

  // Planted corpus: 8 well-separated clusters in dim 16, 25 members each.
  // vec_id = m * 8 + c, so the first 8 ids (the selection init) are one per
  // cluster but are each an OUTLIER member (large perturbation) — the
  // regime where selection centroids misrank borders and Lloyd means fix it.
  private val dim = 16; private val nClusters = 8; private val members = 25
  private def center(c: Int, j: Int): Float =
    (((c * 17 + j * 13) % 11) - 5) * 0.4f
  private lazy val vecs: Seq[(Long, Array[Float])] =
    (for (m <- 0 until members; c <- 0 until nClusters) yield {
      val i = m * nClusters + c
      val scale = if (m == 0) 0.8f else 0.05f
      (i.toLong,
        Array.tabulate(dim)(j => center(c, j) + (((i * 7 + j * 3) % 5) - 2) * scale))
    }).toSeq
  private lazy val e = vecs.toDF("vec_id", "embedding")

  private def cosR(a: Array[Float], b: Array[Float]): Double = {
    var dot = 0.0; var na = 0.0; var nb = 0.0
    for (j <- 0 until dim) {
      dot += a(j).toDouble * b(j); na += a(j).toDouble * a(j); nb += b(j).toDouble * b(j)
    }
    BigDecimal(dot / math.sqrt(na * nb))
      .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
  }

  /** Brute-force top-k per probe, same ranking as the op (rounded cos desc,
    * vec_id asc). */
  private def bruteTop(p: Long, k: Int): Seq[Long] = {
    val pv = vecs.find(_._1 == p).get._2
    vecs.filter(_._1 != p)
      .map { case (id, v) => (id, cosR(pv, v)) }
      .sortBy { case (id, c) => (-c, id) }.take(k).map(_._1)
  }

  private def recall(cents: org.apache.spark.sql.DataFrame): Double = {
    val k = 5
    val got = graft.ops.TrainingOps
      .ivfTopKFrom(e, cents, nprobeCells = 2, nProbes = 8, k = k)
      .select("probe_id", "vec_id").as[(Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    (0L until 8L).map { p =>
      val truth = bruteTop(p, k).toSet
      got.getOrElse(p, Set.empty).intersect(truth).size.toDouble / k
    }.sum / 8
  }

  private def objective(cents: org.apache.spark.sql.DataFrame): Double =
    e.join(broadcast(cents))
      .withColumn("ccos", graft.functions.vec_cosine_d(
        col("embedding").cast("array<double>"), col("cvec")))
      .groupBy("vec_id").agg(max("ccos").as("m"))
      .agg(sum("m")).collect()(0).getDouble(0)

  test("refined centroids: objective/recall >= unrefined; sampled init >= selection init") {
    // default = sampled init (TrainingOps.sampleInit), unrefined vs refined
    val unref = graft.ops.TrainingOps.lloydCentroids(e, nClusters, iters = 0)
    val ref = graft.ops.TrainingOps.lloydCentroids(e, nClusters, iters = 2)
    assert(objective(ref) >= objective(unref) - 1e-6)
    val (rUnref, rRef) = (recall(unref), recall(ref))
    assert(rRef >= rUnref, s"refined $rRef < unrefined $rUnref")
    assert(rRef >= 0.9, s"refined recall $rRef")
    // the old first-nCells selection init under the SAME refinement: the
    // sampled init must not regress it (r5 VERDICT next #6 criterion)
    val sel0 = e.where(col("vec_id") < nClusters)
      .select(col("vec_id").as("cell"),
        col("embedding").cast("array<double>").as("cvec"))
    val rSelRef = recall(graft.ops.TrainingOps.lloydRefine(e, sel0, 2))
    assert(rRef >= rSelRef, s"sampled-init $rRef < selection-init $rSelRef")
  }

  test("persisted quantizer: build commits, reopen never re-clusters") {
    val root = java.nio.file.Files.createTempDirectory("annidx").toString
    val c1 = graft.ops.AnnIndex
      .buildOrOpenCentroids(spark, root, e, nCells = 8, iters = 2)
      .orderBy("cell").as[(Long, Seq[Double])].collect().toSeq
    val c2 = graft.ops.AnnIndex.buildOrOpenCentroids(spark, root,
        { fail("centroids must not recompute on reopen"); null },
        nCells = 8, iters = 2)
      .orderBy("cell").as[(Long, Seq[Double])].collect().toSeq
    assert(c1 == c2)
    // the persisted quantizer serves top-k without touching the refinement
    val topk = graft.ops.AnnIndex.topK(spark, root, e, nCells = 8, iters = 2,
      nprobeCells = 2, nProbes = 4, k = 3)
    assert(topk.count() == 12)
  }
}

/** The plans the 100 TB design depends on: parquet scans must prune to the
  * projected columns and push comparison filters into the source. */
class ScanPlanSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark
  private val dir = "/root/testdata/sf0.001"

  test("parquet scan pushes filters and prunes columns") {
    import org.apache.spark.sql.functions._
    val df = TrainingOps.documents(spark, dir)
      .where(col("doc_id") > 100)
      .select("doc_id", "n_chars")
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters:") &&
      plan.contains("GreaterThan(doc_id,100)"), plan)
    // ReadSchema must NOT include the wide text column
    val read = plan.linesIterator.find(_.contains("ReadSchema")).getOrElse("")
    assert(read.contains("doc_id") && read.contains("n_chars") &&
      !read.contains("text"), read)
  }

  test("dimension joins in nationRevenue broadcast, facts do not") {
    val plan = RelationalOps.nationRevenue(spark, dir)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan)
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

  test("WAV decode agrees with the JDK's javax.sound decoder (real codec)") {
    val rows = MultimodalOps.decodeWav(
      MultimodalOps.withSynthWav(
        TrainingOps.documents(spark, dir).select("doc_id").limit(20))).collect()
    assert(rows.length == 20)
    rows.foreach { r =>
      // independent oracle: the JDK's own WAV reader on the same bytes
      val bytes = MediaCodecs.synthWav(r.doc_id,
        nFrames = r.n_frames.toInt,
        freqHz = 200.0 + (graft.corpus.SyntheticCorpus.mix(r.doc_id) >>> 32) % 2000,
        amp = 0.2 + ((graft.corpus.SyntheticCorpus.mix(r.doc_id) >>> 12) & 0xff) / 512.0)
      val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(bytes))
      val fmt = ais.getFormat
      assert(fmt.getSampleRate.toInt == r.sample_rate)
      assert(fmt.getChannels == r.channels)
      assert(fmt.getSampleSizeInBits == r.bits)
      assert(ais.getFrameLength == r.n_frames)
      // sine at amplitude A has RMS A/sqrt(2)
      val amp = 0.2 + ((graft.corpus.SyntheticCorpus.mix(r.doc_id) >>> 12) & 0xff) / 512.0
      assert(math.abs(r.rms - amp / math.sqrt(2)) < 0.01, s"rms ${r.rms} vs $amp")
      assert(r.peak <= amp + 0.01 && r.peak > amp * 0.95)
    }
  }

  test("BMP decode agrees with the JDK's ImageIO decoder (real codec)") {
    val rows = MultimodalOps.decodeBmp(
      MultimodalOps.withSynthBmp(
        TrainingOps.documents(spark, dir).select("doc_id").limit(20))).collect()
    assert(rows.length == 20)
    rows.foreach { r =>
      val m = graft.corpus.SyntheticCorpus.mix(r.doc_id + 7)
      val bytes = MediaCodecs.synthBmp(r.doc_id,
        width = 16 + (m & 0x1f).toInt, height = 16 + ((m >>> 8) & 0x1f).toInt)
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
      assert(img.getWidth == r.width && img.getHeight == r.height)
      var (sr, sg, sb) = (0.0, 0.0, 0.0)
      for (y <- 0 until img.getHeight; x <- 0 until img.getWidth) {
        val rgb = img.getRGB(x, y)
        sr += (rgb >> 16) & 0xff; sg += (rgb >> 8) & 0xff; sb += rgb & 0xff
      }
      val n = img.getWidth.toDouble * img.getHeight
      assert(math.abs(sr / n - r.mean_r) < 1e-9)
      assert(math.abs(sg / n - r.mean_g) < 1e-9)
      assert(math.abs(sb / n - r.mean_b) < 1e-9)
    }
  }

  test("image near-dup: identical images pair up via dHash Hamming pass") {
    // 10 distinct images, each duplicated under a second doc_id -> each
    // duplicate pair is within Hamming 0 and must be found; distinct
    // images are far apart with overwhelming probability
    val imgs = (0L until 10L).flatMap { i =>
      val bytes = MediaCodecs.synthBmp(i, 32, 24)
      Seq((i, bytes), (i + 100L, bytes))
    }
    val df = imgs.toDF("doc_id", "image")
    val pairs = MultimodalOps.imageNearDupPairs(df)
      .as[(Long, Long)].collect().toSet
    assert((0L until 10L).forall(i => pairs.contains((i, i + 100L))), pairs.toString)
    // dHash sanity: equal bytes -> equal hash; different seeds -> different
    val h0 = MediaCodecs.dhash(MediaCodecs.synthBmp(1, 32, 24))
    assert(h0 == MediaCodecs.dhash(MediaCodecs.synthBmp(1, 32, 24)))
    assert(h0 != MediaCodecs.dhash(MediaCodecs.synthBmp(2, 32, 24)))
  }

  test("JPEG via the JDK ImageIO codec: near-dup pairs over synthesized JPEGs") {
    import java.awt.image.BufferedImage
    // deterministic structured images (smooth gradients + a seed-placed
    // block) so the perceptual hash is stable under JPEG's lossy encode
    def baseImage(seed: Long, w: Int = 64, h: Int = 64): BufferedImage = {
      val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
      val m = graft.corpus.SyntheticCorpus.mix(seed)
      // seed-dependent 2D sinusoid: frequencies/phase differ per base, so
      // distinct bases land far apart in dHash space, while the smooth
      // large-amplitude gradients survive JPEG loss + a brightness shift
      val fa = 1 + (m & 7).toInt; val fb = 1 + ((m >>> 8) & 7).toInt
      val phase = ((m >>> 16) & 0xff) / 40.0
      for (y <- 0 until h; x <- 0 until w) {
        val v = (128 + 110 * math.sin((x * fa + y * fb) / 6.0 + phase)).toInt
        img.setRGB(x, y, (v << 16) | (v << 8) | v)
      }
      img
    }
    def jpeg(img: BufferedImage): Array[Byte] = {
      val bos = new java.io.ByteArrayOutputStream()
      assert(javax.imageio.ImageIO.write(img, "jpg", bos))
      bos.toByteArray
    }
    def brighten(img: BufferedImage, d: Int): BufferedImage = {
      val out = new BufferedImage(img.getWidth, img.getHeight,
        BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until img.getHeight; x <- 0 until img.getWidth) {
        val v = math.min(255, (img.getRGB(x, y) & 0xff) + d)
        out.setRGB(x, y, (v << 16) | (v << 8) | v)
      }
      out
    }
    // 8 bases; each under two doc_ids: the original JPEG and a re-encoded,
    // slightly brightened variant (dHash gradients are brightness-shift
    // tolerant; JPEG loss perturbs few bits) -> planted near-dup pairs
    val rows = (0L until 8L).flatMap { i =>
      val img = baseImage(i)
      Seq((i, jpeg(img)), (i + 100L, jpeg(brighten(img, 3))))
    }
    val df = rows.toDF("doc_id", "image")
    val pairs = MultimodalOps.imageNearDupPairs(df, maxHamming = 3)
      .as[(Long, Long)].collect().toSet
    assert((0L until 8L).forall(i => pairs.contains((i, i + 100L))),
      pairs.toString)
    // no cross-base pair qualifies
    assert(pairs.forall { case (a, b) => b - a == 100L }, pairs.toString)
    // decoder-independence of the hash: the SAME pixels through the BMP
    // byte decoder vs re-encoded LOSSLESSLY as PNG and decoded by ImageIO
    // must give the SAME 64 bits (a sniffed 'BM' self-compare would be a
    // tautology — this crosses the two decoder paths for real)
    val bmp = MediaCodecs.synthBmp(5, 32, 24)
    val asPng = {
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bmp))
      val bos = new java.io.ByteArrayOutputStream()
      assert(javax.imageio.ImageIO.write(img, "png", bos))
      bos.toByteArray
    }
    assert(MediaCodecs.dhashImage(asPng) == MediaCodecs.dhash(bmp))
  }

  test("animated GIF: real per-frame decode, planted near-dup frames found") {
    val gifs = MultimodalOps.withSynthGif(
      TrainingOps.documents(spark, dir).select("doc_id").limit(8),
      nFrames = 6).cache()
    val hashes = MultimodalOps.videoFrameHashes(gifs).collect()
      .map(r => ((r.getLong(0), r.getInt(1)), r.getLong(2))).toMap
    assert(hashes.size == 8 * 6)
    // cross-path consistency: frame 0 == the single-image dHash of the blob
    val raw = gifs.select("doc_id", "media").collect()
      .map(r => (r.getLong(0), r.getAs[Array[Byte]](1)))
    raw.foreach { case (id, bytes) =>
      assert(MediaCodecs.dhashImage(bytes) == hashes((id, 0)))
    }
    // independent decode oracle: re-encode every GIF frame as PNG (the JDK's
    // ImageIO GIF reader + PNG writer — a different container path) and the
    // dHash of the PNG must equal the frame hash
    raw.take(3).foreach { case (id, bytes) =>
      val iis = javax.imageio.ImageIO.createImageInputStream(
        new java.io.ByteArrayInputStream(bytes))
      val reader = javax.imageio.ImageIO.getImageReaders(iis).next()
      reader.setInput(iis)
      val n = reader.getNumImages(true)
      assert(n == 6, s"doc $id frame count $n")
      (0 until n).foreach { i =>
        val img = reader.read(i)
        val bos = new java.io.ByteArrayOutputStream()
        assert(javax.imageio.ImageIO.write(img, "png", bos))
        assert(MediaCodecs.dhashImage(bos.toByteArray) == hashes((id, i)),
          s"doc $id frame $i")
      }
      reader.dispose(); iis.close()
    }
    // frame-level near-dup: the machinery's output must EQUAL brute force
    // over all frames (pigeonhole candidates are complete for d <= max)
    val maxHamming = 8
    val ids = hashes.keys.toSeq.sorted
    val expected = (for {
      a <- ids; b <- ids
      if a != b && java.lang.Long.bitCount(hashes(a) ^ hashes(b)) <= maxHamming
    } yield (a, b)).map { case (x, y) => if (x.toString < y.toString) (x, y) else (y, x) }
      .toSet
    val got = MultimodalOps.frameNearDupPairs(gifs, maxHamming).collect()
      .map(r => ((r.getLong(0), r.getInt(1)), (r.getLong(2), r.getInt(3))))
      .map { case (x, y) => if (x.toString < y.toString) (x, y) else (y, x) }
      .toSet
    assert(got == expected,
      s"got ${got.size} expected ${expected.size}; " +
        s"extra=${(got -- expected).take(3)} missing=${(expected -- got).take(3)}")
    // the fixture really plants near-dup frame sequences (non-vacuous), and
    // only within a doc — cross-doc frames are far apart
    assert(expected.nonEmpty, "fixture planted no near-dup frames")
    assert(expected.forall { case ((da, _), (db, _)) => da == db },
      "cross-doc frames must not be near-dups")
    gifs.unpersist()
  }

  test("delta-encoded GIF frames are composited (offsets + disposal), not hashed raw") {
    import java.awt.image.BufferedImage
    def rgbFill(w: Int, h: Int, seed: Long): BufferedImage = {
      val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until h; x <- 0 until w)
        img.setRGB(x, y, (graft.corpus.SyntheticCorpus.mix2(seed,
          (x * 131 + y).toLong) & 0xffffff).toInt)
      img
    }
    val base = rgbFill(32, 32, 11L)   // frame 0: full canvas
    val patch = rgbFill(8, 8, 22L)    // frame 1: small delta at (12, 4)
    val patch2 = rgbFill(6, 6, 33L)   // frame 2: delta at (2, 20)
    val bytes = MediaCodecs.synthGifDelta(Seq(
      (base, 0, 0, "doNotDispose"),
      (patch, 12, 4, "doNotDispose"),
      (patch2, 2, 20, "doNotDispose")))
    val got = MediaCodecs.frameDHashes(bytes).toMap
    assert(got.size == 3)
    // independent oracle: composite by hand with plain AWT, re-encode each
    // displayed canvas as PNG, hash through the single-image path. NOTE the
    // GIF palette quantizes the written pixels, so the hand-composite must
    // draw what the GIF DECODER returns for each frame raster, not the
    // pre-quantization originals — read the rasters back first.
    val iis = javax.imageio.ImageIO.createImageInputStream(
      new java.io.ByteArrayInputStream(bytes))
    val reader = javax.imageio.ImageIO.getImageReaders(iis).next()
    reader.setInput(iis)
    val rasters = (0 until 3).map(reader.read)
    reader.dispose(); iis.close()
    val canvas = new BufferedImage(32, 32, BufferedImage.TYPE_INT_ARGB)
    val offs = Seq((0, 0), (12, 4), (2, 20))
    offs.zipWithIndex.foreach { case ((x, y), i) =>
      val g = canvas.createGraphics()
      g.drawImage(rasters(i), x, y, null); g.dispose()
      val bos = new java.io.ByteArrayOutputStream()
      assert(javax.imageio.ImageIO.write(canvas, "png", bos))
      assert(MediaCodecs.dhashImage(bos.toByteArray) == got(i),
        s"frame $i composite mismatch")
    }
    // and compositing MATTERS: the raw frame-1 patch alone hashes
    // differently from the displayed frame-1 canvas
    val bosRaw = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(rasters(1), "png", bosRaw)
    assert(MediaCodecs.dhashImage(bosRaw.toByteArray) != got(1))
    // restoreToBackgroundColor clears the frame's rect before the next one
    val bytes2 = MediaCodecs.synthGifDelta(Seq(
      (base, 0, 0, "doNotDispose"),
      (patch, 12, 4, "restoreToBackgroundColor"),
      (patch2, 2, 20, "doNotDispose")))
    val got2 = MediaCodecs.frameDHashes(bytes2).toMap
    val canvas2 = new BufferedImage(32, 32, BufferedImage.TYPE_INT_ARGB)
    locally {
      val g = canvas2.createGraphics()
      g.drawImage(rasters(0), 0, 0, null)
      g.setComposite(java.awt.AlphaComposite.Clear)
      g.fillRect(12, 4, 8, 8) // patch disposed to background
      g.setComposite(java.awt.AlphaComposite.SrcOver)
      g.drawImage(rasters(2), 2, 20, null)
      g.dispose()
      val bos = new java.io.ByteArrayOutputStream()
      assert(javax.imageio.ImageIO.write(canvas2, "png", bos))
      assert(MediaCodecs.dhashImage(bos.toByteArray) == got2(2),
        "restoreToBackgroundColor composite mismatch")
    }
  }

  test("restoreToPrevious disposal restores the pre-frame canvas") {
    import java.awt.image.BufferedImage
    def rgbFill(w: Int, h: Int, seed: Long): BufferedImage = {
      val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until h; x <- 0 until w)
        img.setRGB(x, y, (graft.corpus.SyntheticCorpus.mix2(seed,
          (x * 131 + y).toLong) & 0xffffff).toInt)
      img
    }
    val base = rgbFill(32, 32, 44L)
    val flash = rgbFill(16, 16, 55L) // frame 1: transient overlay
    val patch = rgbFill(6, 6, 66L)   // frame 2: lands on the RESTORED canvas
    val bytes = MediaCodecs.synthGifDelta(Seq(
      (base, 0, 0, "doNotDispose"),
      (flash, 8, 8, "restoreToPrevious"),
      (patch, 1, 1, "doNotDispose")))
    val got = MediaCodecs.frameDHashes(bytes).toMap
    // decode the rasters back (palette round-trip) for the hand-composite
    val iis = javax.imageio.ImageIO.createImageInputStream(
      new java.io.ByteArrayInputStream(bytes))
    val reader = javax.imageio.ImageIO.getImageReaders(iis).next()
    reader.setInput(iis)
    val rasters = (0 until 3).map(reader.read)
    reader.dispose(); iis.close()
    def png(img: BufferedImage): Array[Byte] = {
      val bos = new java.io.ByteArrayOutputStream()
      assert(javax.imageio.ImageIO.write(img, "png", bos)); bos.toByteArray
    }
    // frame 2's displayed canvas = base + patch, WITHOUT the flash: the
    // flash frame's disposal restored the pre-flash canvas
    val expect2 = new BufferedImage(32, 32, BufferedImage.TYPE_INT_ARGB)
    locally {
      val g = expect2.createGraphics()
      g.drawImage(rasters(0), 0, 0, null)
      g.drawImage(rasters(2), 1, 1, null)
      g.dispose()
    }
    assert(MediaCodecs.dhashImage(png(expect2)) == got(2),
      "frame 2 must composite onto the RESTORED canvas")
    // while frame 1's own displayed canvas DID include the flash
    val expect1 = new BufferedImage(32, 32, BufferedImage.TYPE_INT_ARGB)
    locally {
      val g = expect1.createGraphics()
      g.drawImage(rasters(0), 0, 0, null)
      g.drawImage(rasters(1), 8, 8, null)
      g.dispose()
    }
    assert(MediaCodecs.dhashImage(png(expect1)) == got(1))
  }

  test("frame decode-bomb: cumulative pixel budget rejects tall frame stacks") {
    // 40 frames of 1024x1024 = 41.9 Mpx total: fine per frame (<= 64 Mpx),
    // fine in count (<= 4096), but a 300-frame version would blow the
    // 256 Mpx cumulative budget. Use small real fixtures to assert the
    // budget math rather than decoding gigabytes in CI.
    val okFrames = (0 until 3).map(i =>
      (MediaCodecs.synthFrame(5L, i, w = 64, h = 64), 0, 0, "doNotDispose"))
    val ok = MediaCodecs.synthGifDelta(okFrames)
    assert(MediaCodecs.frameDHashes(ok).length == 3)
    // a synthetic reader-level check: 256 Mpx budget / (1024*1024) = 256
    // frames; the public constant relationship the guard relies on
    assert(MediaCodecs.MaxVideoTotalPixels / (1024L * 1024L) <
      MediaCodecs.MaxVideoFrames,
      "budget must bind before the frame-count bound for 1 Mpx frames")
  }

  test("undecodable video blobs land in the quarantine view, not the job") {
    import spark.implicits._
    val gifBytes = MediaCodecs.synthGif(Seq(MediaCodecs.synthFrame(7L, 0)))
    val rows = Seq(
      (1L, gifBytes),
      (2L, gifBytes.take(20)), // truncated container
      (3L, Array[Byte](1, 2, 3))) // garbage
    val df = rows.toDF("doc_id", "media")
    val ok = MultimodalOps.videoFrameHashes(df).select("doc_id")
      .as[Long].collect().toSet
    assert(ok == Set(1L))
    val bad = MultimodalOps.undecodableVideo(df).select("doc_id")
      .as[Long].collect().toSet
    assert(bad == Set(2L, 3L))
  }

  test("frameSample reads real frames from ImageIO containers") {
    val gifs = MultimodalOps.withSynthGif(
      TrainingOps.documents(spark, dir).select("doc_id").limit(5),
      nFrames = 8)
    val fr = MultimodalOps.frameSample(gifs, n = 4).collect()
    assert(fr.length == 5 * 4)
    val all = MultimodalOps.videoFrameHashes(gifs).collect()
      .map(r => ((r.getLong(0), r.getInt(1)), r.getLong(2))).toMap
    fr.foreach { f =>
      // offset = the sampled SOURCE frame index (n*f/sampleN), hash = that
      // frame's real dHash
      assert(f.offset == (8L * f.frame_idx) / 4, f.toString)
      assert(f.frame_hash == all((f.doc_id, f.offset.toInt)), f.toString)
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
