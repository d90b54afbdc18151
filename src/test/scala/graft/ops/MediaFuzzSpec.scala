package graft.ops

import graft.SparkTestBase
import org.scalatest.funsuite.AnyFunSuite

import java.nio.ByteOrder

/** Fuzz + per-row-isolation coverage for the media decoders — the second
  * parser family that faces arbitrary bytes from the wild web (after the
  * HTML extractor). Kernel invariant: for ANY byte array, decodeWav /
  * decodeBmp / dhashImage either return or throw a NON-FATAL exception
  * promptly — never hang (the negative-chunk-length WAV below used to walk
  * the RIFF chunks backwards forever) and never throw anything the Spark
  * layer's NonFatal isolation would miss. Spark invariant: a frame mixing
  * good and corrupt blobs decodes exactly the good rows, with the corrupt
  * set observable via the quarantine views (degrade-don't-die, like
  * vec_cosine's null-on-ragged). */
class MediaFuzzSpec extends AnyFunSuite {
  private val spark = SparkTestBase.spark
  import spark.implicits._

  /** A decode call must complete within `ms` — run on a daemon thread so a
    * regression to the infinite chunk walk fails the test instead of
    * wedging the suite. */
  private def completesWithin(ms: Long)(f: => Unit): Unit = {
    @volatile var thrown: Throwable = null
    @volatile var done = false
    val t = new Thread(() => {
      try f catch { case e: Throwable => thrown = e }
      done = true
    })
    t.setDaemon(true)
    t.start()
    t.join(ms)
    assert(done, s"decode did not complete within ${ms}ms (hang)")
    if (thrown != null) {
      assert(scala.util.control.NonFatal(thrown),
        s"fatal throwable escaped the decoder: $thrown")
    }
  }

  /** RIFF/WAVE followed by a chunk declaring length -8: before the
    * negative-length guard, the chunk walk moved position() backwards and
    * re-read the same header forever. */
  private def negLenWav: Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(20).order(ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes("US-ASCII")).putInt(12)
      .put("WAVE".getBytes("US-ASCII"))
      .put("JUNK".getBytes("US-ASCII")).putInt(-8)
    bb.array()
  }

  /** Deterministic corruption: truncate, flip bytes, or splice a random int
    * (which perturbs chunk lengths / dimensions / offsets). */
  private def mutate(bytes: Array[Byte], seed: Long): Array[Byte] = {
    val r = new java.util.Random(seed)
    var out = java.util.Arrays.copyOf(bytes, bytes.length)
    (0 to r.nextInt(3)).foreach { _ =>
      r.nextInt(3) match {
        case 0 => // truncate
          out = java.util.Arrays.copyOf(out, r.nextInt(out.length + 1))
        case 1 if out.length > 0 => // byte flip
          out(r.nextInt(out.length)) = r.nextInt(256).toByte
        case _ if out.length >= 4 => // int splice (lengths, dims, offsets)
          val off = r.nextInt(out.length - 3)
          val v = r.nextInt()
          out(off) = v.toByte; out(off + 1) = (v >> 8).toByte
          out(off + 2) = (v >> 16).toByte; out(off + 3) = (v >> 24).toByte
        case _ => ()
      }
    }
    out
  }

  test("negative-chunk-length WAV fails fast instead of hanging") {
    completesWithin(5000) {
      intercept[IllegalArgumentException](MediaCodecs.decodeWav(negLenWav))
    }
  }

  test("mutated WAVs: decode returns or throws NonFatal, promptly") {
    val base = MediaCodecs.synthWav(42L)
    (0 until 300).foreach { i =>
      val b = mutate(base, i.toLong)
      completesWithin(5000) {
        try { MediaCodecs.decodeWav(b); () }
        catch { case scala.util.control.NonFatal(_) => () }
      }
    }
  }

  test("mutated BMPs: decode + dhash return or throw NonFatal, promptly") {
    val base = MediaCodecs.synthBmp(42L)
    (0 until 300).foreach { i =>
      val b = mutate(base, 1000L + i)
      completesWithin(5000) {
        try { MediaCodecs.decodeBmp(b); () }
        catch { case scala.util.control.NonFatal(_) => () }
        try { MediaCodecs.dhashImage(b); () }
        catch { case scala.util.control.NonFatal(_) => () }
      }
    }
  }

  test("random bytes: all three decoders reject without fatal throws") {
    val r = new java.util.Random(7L)
    (0 until 200).foreach { _ =>
      val b = new Array[Byte](r.nextInt(120))
      r.nextBytes(b)
      completesWithin(5000) {
        Seq[Array[Byte] => Any](MediaCodecs.decodeWav, MediaCodecs.decodeBmp,
          MediaCodecs.dhashImage).foreach { f =>
          try { f(b); () }
          catch { case scala.util.control.NonFatal(_) => () }
        }
      }
    }
  }

  test("corrupt audio blobs degrade, don't kill the job") {
    val good = (1L to 3L).map(id => (id, MediaCodecs.synthWav(id)))
    val bad = Seq(
      (10L, Array[Byte](1, 2, 3)),
      (11L, MediaCodecs.synthWav(7L).take(20)), // truncated mid-header
      (12L, negLenWav))
    val df = (good ++ bad).toDF("doc_id", "audio")
    val decoded = MultimodalOps.decodeWav(df).collect()
    assert(decoded.map(_.doc_id).sorted.toSeq == Seq(1L, 2L, 3L))
    assert(decoded.forall(w => w.sample_rate == 8000 && w.n_frames > 0))
    val quarantined = MultimodalOps.undecodableAudio(df)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(quarantined.keySet == Set(10L, 11L, 12L))
    assert(quarantined.values.forall(_.nonEmpty))
  }

  test("corrupt image blobs degrade, don't kill the job") {
    // a real PNG through the ImageIO path, next to byte-level BMPs
    val png = {
      val img = new java.awt.image.BufferedImage(12, 10,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      (0 until 10).foreach(y => (0 until 12).foreach(x =>
        img.setRGB(x, y, (x * 21) << 16 | (y * 25) << 8 | 80)))
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", bos)
      bos.toByteArray
    }
    val lyingBmp = { // header says 1000x1000 but carries no pixels
      val b = java.util.Arrays.copyOf(MediaCodecs.synthBmp(3L), 64)
      b
    }
    val df = Seq(
      (1L, MediaCodecs.synthBmp(1L)),
      (2L, png),
      (10L, "not an image".getBytes("UTF-8")),
      (11L, lyingBmp)).toDF("doc_id", "image")
    val hashed = MultimodalOps.imageDHash(df).collect()
      .map(r => r.getLong(0)).sorted.toSeq
    assert(hashed == Seq(1L, 2L))
    val quarantined = MultimodalOps.undecodableImages(df)
      .collect().map(_.getLong(0)).sorted.toSeq
    assert(quarantined == Seq(10L, 11L))
    val means = MultimodalOps.decodeBmp(df).collect().map(_.doc_id).toSeq
    assert(means == Seq(1L)) // the PNG is not a BMP; byte decoder skips it
    // ...and the BMP-path quarantine lists that PNG (its kernel rejects
    // it), so decodeBmp output ∪ undecodableBmp covers every input row —
    // nothing disappears from both views.
    val bmpQuarantine = MultimodalOps.undecodableBmp(df)
      .collect().map(_.getLong(0)).sorted.toSeq
    assert(bmpQuarantine == Seq(2L, 10L, 11L))
  }

  test("decompression-bomb image is rejected before pixel allocation") {
    // A syntactically valid PNG whose IHDR declares 50000x50000 (~10 GB
    // ARGB): ImageIO.read would OOM — and OutOfMemoryError is FATAL, so it
    // would escape the per-row isolation and kill the job. The header-read
    // dimension bound must reject it as an undecodable ROW instead.
    def chunk(typ: String, body: Array[Byte]): Array[Byte] = {
      val bos = new java.io.ByteArrayOutputStream()
      val dos = new java.io.DataOutputStream(bos)
      dos.writeInt(body.length)
      val tb = typ.getBytes("US-ASCII")
      dos.write(tb); dos.write(body)
      val crc = new java.util.zip.CRC32()
      crc.update(tb); crc.update(body)
      dos.writeInt(crc.getValue.toInt)
      bos.toByteArray
    }
    val ihdr = {
      val b = java.nio.ByteBuffer.allocate(13)
      b.putInt(50000).putInt(50000) // width, height
      b.put(8.toByte).put(6.toByte) // bit depth, color type RGBA
      b.put(0.toByte).put(0.toByte).put(0.toByte)
      b.array()
    }
    val bombPng =
      Array[Byte](0x89.toByte, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a) ++
        chunk("IHDR", ihdr) ++ chunk("IEND", Array.empty)
    val e = intercept[IllegalArgumentException] {
      MediaCodecs.dhashImage(bombPng)
    }
    assert(e.getMessage.contains("decode bound"))
    // ...and through the Spark surface it lands in quarantine, job alive
    val df = Seq((1L, MediaCodecs.synthBmp(1L)), (7L, bombPng))
      .toDF("doc_id", "image")
    assert(MultimodalOps.imageDHash(df).collect().map(_.getLong(0)).toSeq
      == Seq(1L))
    assert(MultimodalOps.undecodableImages(df).collect()
      .map(_.getLong(0)).toSeq == Seq(7L))
  }

  test("over-declared data chunk fails as truncation, not a walk error") {
    // synthWav's data length field lives at offset 40; declare 100 more
    // bytes than the file carries — the clamped walk completes and the
    // declared-vs-present check reports it precisely.
    val w = MediaCodecs.synthWav(5L, nFrames = 1000)
    val bb = java.nio.ByteBuffer.wrap(w).order(ByteOrder.LITTLE_ENDIAN)
    bb.putInt(40, 2000 + 100)
    val e = intercept[IllegalArgumentException](MediaCodecs.decodeWav(w))
    assert(e.getMessage.contains("truncated data chunk"))
  }

  test("final chunk missing its pad byte still decodes") {
    // An odd-length trailing LIST chunk with no pad byte: the clamped walk
    // must not throw positioning past the buffer.
    val base = MediaCodecs.synthWav(6L, nFrames = 500)
    val extra = 7 // odd payload, no pad
    val bb = java.nio.ByteBuffer.allocate(base.length + 8 + extra)
      .order(ByteOrder.LITTLE_ENDIAN)
    bb.put(base)
    bb.put("LIST".getBytes("US-ASCII")).putInt(extra)
    bb.put(Array.fill(extra)(1.toByte))
    // grow the RIFF size field to cover the new chunk
    val out = bb.array()
    java.nio.ByteBuffer.wrap(out).order(ByteOrder.LITTLE_ENDIAN)
      .putInt(4, out.length - 8)
    val w = MediaCodecs.decodeWav(out)
    assert(w.nFrames == 500 && w.sampleRate == 8000)
  }
}
