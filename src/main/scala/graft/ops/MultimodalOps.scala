package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Multimodal column plumbing: image/audio/video as opaque `binary` columns
 * with typed metadata, processed per-partition with batched "decoders".
 *
 * Two tiers:
 *  - REAL decoders for codec-free containers — 16-bit PCM WAV and
 *    uncompressed 24-bit BMP (MediaCodecs): full byte-level parse, PCM
 *    RMS/peak, pixel channel means, and a perceptual dHash whose pairs
 *    feed the same Hamming-ball dedup machinery as text SimHash. Verified
 *    in MultimodalSpec against the JDK's own independent decoders
 *    (javax.sound.sampled, javax.imageio).
 *  - REAL still/animated decode through the JDK's ImageIO codecs
 *    (JPEG/PNG/GIF): per-image dHash (imageDHash) and per-FRAME dHash over
 *    multi-frame containers (videoFrameHashes / frameSample /
 *    frameNearDupPairs — animated GIF is the real multi-frame path), all
 *    behind the same decompression-bomb bounds (MediaCodecs).
 *  - STUB kernels for formats that need native codecs (H.264/AV1/...):
 *    clearly-marked deterministic stand-ins (StubCodec) behind real
 *    schema/binary/per-partition-decoder plumbing; swapping in a JNI/FFI
 *    codec is a drop-in change.
 *
 * Fake media layout (deterministic from doc_id):
 *   bytes[0..3]  magic "GIMG"
 *   bytes[4..7]  width  (big-endian int)
 *   bytes[8..11] height (big-endian int)
 *   bytes[12]    channels
 *   bytes[13..]  payload (pseudo-pixels)
 */
object MultimodalOps {

  final case class MediaMeta(doc_id: Long, width: Int, height: Int,
      channels: Int, n_bytes: Long)
  final case class MediaFeatures(doc_id: Long, features: Array[Float])
  final case class Frame(doc_id: Long, frame_idx: Int, offset: Long,
      frame_hash: Long)

  /** Attach a deterministic fake media blob per row (stand-in for a real
    * WARC/image column like input_hint's `html: binary`). */
  def withFakeMedia(df: DataFrame): DataFrame = {
    val gen = udf { (docId: Long) =>
      val w = 16 + (graft.corpus.SyntheticCorpus.mix(docId) & 0xff).toInt
      val h = 16 + (graft.corpus.SyntheticCorpus.mix(docId + 1) & 0xff).toInt
      val c = 3
      val payloadLen = 64
      val bb = java.nio.ByteBuffer.allocate(13 + payloadLen)
      bb.put("GIMG".getBytes("US-ASCII")).putInt(w).putInt(h).put(c.toByte)
      var i = 0
      while (i < payloadLen) {
        bb.put((graft.corpus.SyntheticCorpus.mix2(docId, i) & 0xff).toByte)
        i += 1
      }
      bb.array()
    }
    df.withColumn("media", gen(col("doc_id")))
  }

  /** STUB decoder — the only piece a real deployment replaces. */
  private object StubCodec {
    /** Simulates an expensive per-partition decoder handle (a real codec
      * would open a native context here, once per partition, not per row). */
    def open(): StubCodec.type = this
    def decodeHeader(bytes: Array[Byte]): (Int, Int, Int) = {
      require(bytes.length >= 13 && bytes(0) == 'G', "bad magic")
      val bb = java.nio.ByteBuffer.wrap(bytes)
      bb.position(4)
      (bb.getInt(), bb.getInt(), bb.get().toInt)
    }
    /** STUB feature extractor: hash-derived unit vector (real impl: CNN /
      * audio embedding over the decoded frame). */
    def features(bytes: Array[Byte], dim: Int): Array[Float] = {
      val out = new Array[Float](dim)
      var i = 0
      var norm = 0.0
      while (i < dim) {
        val h = graft.corpus.SyntheticCorpus.mix2(
          java.util.Arrays.hashCode(bytes).toLong, i)
        out(i) = ((h % 1000) / 1000.0f)
        norm += out(i) * out(i)
        i += 1
      }
      val n = math.sqrt(norm).toFloat
      if (n > 0) { i = 0; while (i < dim) { out(i) /= n; i += 1 } }
      out
    }
  }

  /** Decode typed metadata from the binary column — mapPartitions so the
    * (stub) codec is opened once per partition, batched over rows. */
  def decodeMeta(df: DataFrame): Dataset[MediaMeta] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col("doc_id"), col("media"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        val codec = StubCodec.open() // once per partition
        it.map { case (id, bytes) =>
          val (w, h, c) = codec.decodeHeader(bytes)
          MediaMeta(id, w, h, c, bytes.length.toLong)
        }
      }
  }

  /** Feature extraction (STUB kernel, real batching/schema). */
  def extractFeatures(df: DataFrame, dim: Int = 16): Dataset[MediaFeatures] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col("doc_id"), col("media"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        val codec = StubCodec.open()
        it.map { case (id, bytes) =>
          MediaFeatures(id, codec.features(bytes, dim))
        }
      }
  }

  // ---- REAL decoders (no external codecs needed) ---------------------------
  // WAV/PCM and uncompressed BMP are parsed for real (MediaCodecs), with the
  // JDK's own independent decoders (javax.sound, ImageIO) as test oracles.

  final case class WavRow(doc_id: Long, sample_rate: Int, channels: Int,
      bits: Int, n_frames: Long, duration_sec: Double, rms: Double, peak: Double)
  final case class BmpRow(doc_id: Long, width: Int, height: Int,
      mean_r: Double, mean_g: Double, mean_b: Double)

  /** Attach a deterministic synthetic WAV per row (16-bit PCM mono sine;
    * frequency/amplitude derived from doc_id). */
  def withSynthWav(df: DataFrame): DataFrame = {
    val gen = udf { (docId: Long) =>
      val m = graft.corpus.SyntheticCorpus.mix(docId)
      MediaCodecs.synthWav(docId, nFrames = 4000 + (m & 0xfff).toInt,
        freqHz = 200.0 + (m >>> 32) % 2000,
        amp = 0.2 + ((m >>> 12) & 0xff) / 512.0)
    }
    df.withColumn("audio", gen(col("doc_id")))
  }

  /** Attach a deterministic synthetic 24-bit BMP per row. */
  def withSynthBmp(df: DataFrame): DataFrame = {
    val gen = udf { (docId: Long) =>
      val m = graft.corpus.SyntheticCorpus.mix(docId + 7)
      MediaCodecs.synthBmp(docId,
        width = 16 + (m & 0x1f).toInt, height = 16 + ((m >>> 8) & 0x1f).toInt)
    }
    df.withColumn("image", gen(col("doc_id")))
  }

  /** Per-row decode isolation: a web-scale media column is GUARANTEED to
    * carry truncated, mis-declared, and outright garbage blobs, and one of
    * them must not kill a 10^12-row job — the multimodal seam follows the
    * same degrade-don't-die rule as vec_cosine's null-on-ragged. Decode
    * failures (any non-fatal throw from the kernel) drop the row here;
    * the quarantine views (`undecodableAudio`, `undecodableImages`,
    * `undecodableBmp` — each keyed to the SAME kernel as the decode it
    * mirrors) keep every dropped set observable (no silent truncation). */
  private def isolated[I, O](it: Iterator[I])(f: I => O): Iterator[O] =
    it.flatMap { i =>
      try Some(f(i))
      catch { case scala.util.control.NonFatal(_) => None }
    }

  private def failures(it: Iterator[(Long, Array[Byte])])(
      f: Array[Byte] => Any): Iterator[(Long, String)] =
    it.flatMap { case (id, bytes) =>
      try { f(bytes); None }
      catch {
        case scala.util.control.NonFatal(e) =>
          Some((id, (s"${e.getClass.getSimpleName}: ${e.getMessage}").take(200)))
      }
    }

  /** REAL audio decode: RIFF chunk walk + one PCM pass for RMS/peak.
    * Undecodable blobs are dropped (see `isolated`; `undecodableAudio`
    * lists them). */
  def decodeWav(df: DataFrame): Dataset[WavRow] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col("doc_id"), col("audio")).as[(Long, Array[Byte])]
      .mapPartitions(isolated(_) { case (id, bytes) =>
        val w = MediaCodecs.decodeWav(bytes)
        WavRow(id, w.sampleRate, w.channels, w.bitsPerSample, w.nFrames,
          w.durationSec, w.rms, w.peak)
      })
  }

  /** REAL image decode: header + padded bottom-up pixel rows → channel
    * means. Blobs this BMP kernel rejects are dropped — that includes
    * formats imageDHash WOULD accept via ImageIO (PNG/JPEG), so the
    * matching quarantine is `undecodableBmp`, keyed to this same kernel
    * (`undecodableImages` is keyed to imageDHash's wider sniffing path). */
  def decodeBmp(df: DataFrame): Dataset[BmpRow] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col("doc_id"), col("image")).as[(Long, Array[Byte])]
      .mapPartitions(isolated(_) { case (id, bytes) =>
        val b = MediaCodecs.decodeBmp(bytes)
        BmpRow(id, b.width, b.height, b.meanR, b.meanG, b.meanB)
      })
  }

  /** Quarantine view: (doc_id, err) for every `audio` blob the WAV decoder
    * rejects — route these to a dead-letter table instead of losing them
    * silently. */
  def undecodableAudio(df: DataFrame): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col("doc_id"), col("audio")).as[(Long, Array[Byte])]
      .mapPartitions(failures(_)(MediaCodecs.decodeWav))
      .toDF("doc_id", "err")
  }

  /** Quarantine view for the `image` column on the DHASH path (BMP byte
    * decoder or ImageIO, same sniffing as imageDHash): lists exactly the
    * rows imageDHash drops. */
  def undecodableImages(df: DataFrame): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col("doc_id"), col("image")).as[(Long, Array[Byte])]
      .mapPartitions(failures(_)(MediaCodecs.dhashImage))
      .toDF("doc_id", "err")
  }

  /** Quarantine view for the BMP DECODE path: lists exactly the rows
    * decodeBmp drops — a superset of undecodableImages, since the byte
    * kernel rejects everything that is not an uncompressed 24-bit BMP
    * (a valid PNG lands here but not in the dHash quarantine). */
  def undecodableBmp(df: DataFrame): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col("doc_id"), col("image")).as[(Long, Array[Byte])]
      .mapPartitions(failures(_)(MediaCodecs.decodeBmp))
      .toDF("doc_id", "err")
  }

  /** 64-bit perceptual dHash per image (decode → 9×8 luma resample →
    * gradient bits). Accepts uncompressed BMP (byte-level decoder) AND any
    * JDK-ImageIO-decodable format — JPEG/PNG/GIF — via the sniffing
    * MediaCodecs.dhashImage; the hash is decoder-independent. Undecodable
    * blobs are dropped (`undecodableImages` lists them). */
  def imageDHash(df: DataFrame): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col("doc_id"), col("image")).as[(Long, Array[Byte])]
      .mapPartitions(isolated(_) { case (id, bytes) =>
        (id, MediaCodecs.dhashImage(bytes))
      })
      .toDF("doc_id", "simhash")
  }

  /** Image near-duplicate pairs: dHash fingerprints fed through the SAME
    * pigeonhole-block + Hamming-verify machinery as text SimHash (the
    * fingerprint column is 64 bits either way) — multimodal dedup reuses
    * the scale path unchanged. */
  def imageNearDupPairs(df: DataFrame,
      maxHamming: Int = 3): DataFrame = {
    val cfg = graft.dedup.DedupConfig(runMinhash = false, runWinnow = false,
      simhashMaxHamming = maxHamming)
    graft.dedup.DedupPipeline.simhashCandidates(imageDHash(df), cfg)
  }

  /** Attach a deterministic synthetic animated GIF per row (multi-frame
    * video stand-in that is REAL bytes through a real container format):
    * `nFrames` frames whose content derives from doc_id — consecutive
    * frames of one doc are near-duplicates under dHash, frames of
    * different docs are not (MediaCodecs.synthFrame). */
  def withSynthGif(df: DataFrame, nFrames: Int = 6): DataFrame = {
    val gen = udf { (docId: Long) =>
      MediaCodecs.synthGif(
        (0 until nFrames).map(f => MediaCodecs.synthFrame(docId, f)))
    }
    df.withColumn("media", gen(col("doc_id")))
  }

  /** REAL multi-frame decode: (doc_id, frame_idx, simhash) with one 64-bit
    * perceptual dHash per container frame (animated GIF through the bounded
    * ImageIO reader — MediaCodecs.frameDHashes; a still image is a length-1
    * video). The hash column is named `simhash` because it IS one: the
    * frame rows feed the same pigeonhole-block Hamming machinery as text
    * SimHash and image dHash. Undecodable blobs drop (quarantine:
    * `undecodableVideo`). */
  def videoFrameHashes(df: DataFrame, mediaCol: String = "media"): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col("doc_id"), col(mediaCol)).as[(Long, Array[Byte])]
      .mapPartitions(it => it.flatMap { case (id, bytes) =>
        try MediaCodecs.frameDHashes(bytes).iterator
          .map { case (i, h) => (id, i, h) }
        catch { case scala.util.control.NonFatal(_) => Iterator.empty }
      })
      .toDF("doc_id", "frame_idx", "simhash")
  }

  /** Quarantine view for the multi-frame decode path: exactly the rows
    * videoFrameHashes/frameSample drop to their real-decode failure. */
  def undecodableVideo(df: DataFrame, mediaCol: String = "media"): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col("doc_id"), col(mediaCol)).as[(Long, Array[Byte])]
      .mapPartitions(failures(_)(MediaCodecs.frameDHashes(_)))
      .toDF("doc_id", "err")
  }

  /** Frame-level near-duplicate pairs across videos: per-frame dHashes →
    * the SAME pigeonhole-block + Hamming-verify machinery as text SimHash,
    * keyed by a 64-bit (doc_id, frame_idx) composite hash and decoded back
    * by equi-join. Output (doc_a, frame_a, doc_b, frame_b) — cross-doc AND
    * intra-doc near-dup frames (a video's own still sections) both
    * surface; filter `doc_a <> doc_b` for cross-video evidence only. */
  def frameNearDupPairs(df: DataFrame, maxHamming: Int = 3,
      mediaCol: String = "media"): DataFrame = {
    // Materialized: the plan references the hash relation three times
    // (candidate generation + two join-backs), and each reference would
    // otherwise re-run the FULL container decode of every blob — the
    // dominant cost at corpus scale. One decode pass, three block reads.
    //
    // LIFETIME CONTRACT (ADVICE r6): the checkpoint blocks back the
    // RETURNED lineage, so they live until the session's next cache clear
    // (spark.catalog.clearCache / unpersisting persistent RDDs — what the
    // bench's scoped clears do). A long-lived session calling this in a
    // loop should drain each result and clear between calls; an
    // auto-released variant would have to eagerly collect bounded output,
    // which this op's (corpus-scale) pair relation cannot assume.
    val hashes = graft.dedup.Materialize(videoFrameHashes(df, mediaCol)
      .withColumn("fid", xxhash64(col("doc_id"), col("frame_idx"))))
    val cfg = graft.dedup.DedupConfig(runMinhash = false, runWinnow = false,
      simhashMaxHamming = maxHamming)
    val pairs = graft.dedup.DedupPipeline.simhashCandidates(
      hashes.select(col("fid").as("doc_id"), col("simhash")), cfg)
    pairs
      .join(hashes.select(col("fid").as("src"), col("doc_id").as("doc_a"),
        col("frame_idx").as("frame_a")), "src")
      .join(hashes.select(col("fid").as("dst"), col("doc_id").as("doc_b"),
        col("frame_idx").as("frame_b")), "dst")
      .select("doc_a", "frame_a", "doc_b", "frame_b")
  }

  /** Video-style frame sampling: UP TO n evenly spaced frames per blob.
    * For ImageIO-decodable containers (animated GIF, any still format)
    * this is a REAL decode — `offset` is the sampled source frame index
    * and `frame_hash` its perceptual dHash (MediaCodecs.frameDHashes) —
    * so a container with fewer than n frames emits one row per frame it
    * HAS (a still emits exactly 1): sampling cannot invent frames, unlike
    * the old synthetic byte-offset sampling which always emitted n.
    * Composited GIFs still decode a sampled frame's predecessors (their
    * pixels are part of the displayed canvas); the per-blob pixel budget
    * bounds that work. Blobs no ImageIO codec accepts (e.g. the GIMG stub
    * format above) keep the deterministic byte-offset sampling so stub
    * plumbing stays testable; real garbage rows drop (quarantine:
    * `undecodableVideo` lists real-decode failures). */
  def frameSample(df: DataFrame, n: Int = 4): Dataset[Frame] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col("doc_id"), col("media"))
      .as[(Long, Array[Byte])]
      .flatMap { case (id, bytes) =>
        val real =
          try Some(MediaCodecs.frameDHashes(bytes, sampleN = n))
          catch { case scala.util.control.NonFatal(_) => None }
        real match {
          case Some(fs) =>
            fs.iterator.zipWithIndex.map { case ((src, h), f) =>
              Frame(id, f, src.toLong, h)
            }.toSeq
          case None if bytes.length >= 4 && bytes(0) == 'G' &&
              bytes(1) == 'I' && bytes(2) == 'M' && bytes(3) == 'G' =>
            // stub-format fallback: deterministic byte-offset sampling
            val body = bytes.length - 13
            if (body <= 0) Nil
            else (0 until n).map { f =>
              val off = 13L + (body.toLong * f) / n
              Frame(id, f, off,
                graft.corpus.SyntheticCorpus.mix2(id, bytes(off.toInt).toLong))
            }
          case None => Nil // real undecodable row: degrade, don't die
        }
      }
  }
}
