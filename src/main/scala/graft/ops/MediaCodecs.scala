package graft.ops

import java.nio.{ByteBuffer, ByteOrder}

/**
 * REAL media decode kernels for container formats that need no external
 * codec: 16-bit PCM WAV (RIFF) and uncompressed 24-bit BMP (BI_RGB),
 * parsed byte-by-byte from the binary column. These upgrade the multimodal
 * path beyond the StubCodec pattern: the Spark-side plumbing AND the decode
 * are real; formats that require native codecs (JPEG/H.264/...) remain
 * behind the documented stub seam.
 *
 * Correctness is pinned against the JDK's own independent implementations
 * in MultimodalSpec: javax.sound.sampled.AudioSystem for WAV and
 * javax.imageio.ImageIO for BMP decode the same bytes and must agree on
 * every field / pixel aggregate.
 */
object MediaCodecs {

  // ---- WAV (RIFF / PCM) ----------------------------------------------------

  final case class WavInfo(sampleRate: Int, channels: Int, bitsPerSample: Int,
      nFrames: Long, durationSec: Double, rms: Double, peak: Double)

  /** Minimal deterministic 16-bit PCM mono WAV: a sine of `freqHz` at
    * amplitude `amp` (0..1). Correct RIFF/fmt/data layout. */
  def synthWav(seed: Long, sampleRate: Int = 8000, nFrames: Int = 8000,
      freqHz: Double = 440.0, amp: Double = 0.5): Array[Byte] = {
    val dataLen = nFrames * 2
    val bb = ByteBuffer.allocate(44 + dataLen).order(ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataLen)
      .put("WAVE".getBytes("US-ASCII"))
    bb.put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1) // PCM
      .putShort(1) // mono
      .putInt(sampleRate)
      .putInt(sampleRate * 2) // byte rate
      .putShort(2) // block align
      .putShort(16) // bits
    bb.put("data".getBytes("US-ASCII")).putInt(dataLen)
    val phase = (seed % 1000) / 1000.0 * 2 * math.Pi
    var i = 0
    while (i < nFrames) {
      val v = amp * math.sin(phase + 2 * math.Pi * freqHz * i / sampleRate)
      bb.putShort(math.round(v * 32767).toShort)
      i += 1
    }
    bb.array()
  }

  /** Parse a PCM WAV: walks the RIFF chunk list (fmt may be followed by
    * LIST/fact/etc. before data), then one pass over the samples for
    * RMS/peak (normalized to [-1, 1]). 16-bit PCM only — the format this
    * library synthesizes and the overwhelmingly common archival layout. */
  def decodeWav(bytes: Array[Byte]): WavInfo = {
    val bb = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    def tag4(): String = {
      val t = new Array[Byte](4); bb.get(t); new String(t, "US-ASCII")
    }
    require(tag4() == "RIFF", "not a RIFF file")
    bb.getInt() // riff size
    require(tag4() == "WAVE", "not a WAVE file")
    var sampleRate = 0; var channels = 0; var bits = 0
    var dataOff = -1; var dataLen = 0
    while (bb.remaining() >= 8 && (dataOff < 0 || sampleRate == 0)) {
      val tag = tag4(); val len = bb.getInt()
      // A negative chunk length would move the walk BACKWARDS and re-read
      // the same header forever — a corrupt blob must fail, never hang an
      // executor.
      require(len >= 0, s"negative chunk length $len in '$tag'")
      // Word-aligned skip, clamped to the buffer: a final chunk missing its
      // pad byte (common in the wild) or a data chunk declaring more bytes
      // than the file carries must not die in position() here — the
      // declared-vs-present check after the walk reports truncation
      // precisely. Long math: p + len can overflow Int.
      def skipFrom(p: Int): Unit =
        bb.position(math.min(p.toLong + len + (len & 1), bb.limit().toLong).toInt)
      tag match {
        case "fmt " =>
          val p = bb.position()
          val fmt = bb.getShort()
          require(fmt == 1, s"not PCM (fmt=$fmt)")
          channels = bb.getShort()
          sampleRate = bb.getInt()
          bb.getInt(); bb.getShort()
          bits = bb.getShort()
          skipFrom(p)
        case "data" =>
          dataOff = bb.position(); dataLen = len
          skipFrom(dataOff)
        case _ =>
          skipFrom(bb.position())
      }
    }
    require(sampleRate > 0 && dataOff >= 0, "missing fmt/data chunk")
    require(bits == 16, s"only 16-bit PCM supported (bits=$bits)")
    require(channels > 0, s"invalid channel count $channels")
    require(dataLen <= bytes.length - dataOff,
      s"truncated data chunk ($dataLen bytes declared, " +
        s"${bytes.length - dataOff} present)")
    val nFrames = dataLen / (2 * channels)
    var sumSq = 0.0; var peak = 0.0
    var i = 0
    val s = ByteBuffer.wrap(bytes, dataOff, dataLen).order(ByteOrder.LITTLE_ENDIAN)
    val n = dataLen / 2
    while (i < n) {
      val v = s.getShort().toDouble / 32768.0
      sumSq += v * v
      val a = math.abs(v); if (a > peak) peak = a
      i += 1
    }
    WavInfo(sampleRate, channels, bits, nFrames,
      nFrames.toDouble / sampleRate,
      if (n > 0) math.sqrt(sumSq / n) else 0.0, peak)
  }

  // ---- BMP (uncompressed 24-bit BI_RGB) ------------------------------------

  final case class BmpInfo(width: Int, height: Int, bpp: Int,
      meanR: Double, meanG: Double, meanB: Double)

  /** Deterministic 24-bit BI_RGB BMP with correct 4-byte row padding and
    * bottom-up row order. Pixel (x, y) = seeded mix of coordinates. */
  def synthBmp(seed: Long, width: Int = 32, height: Int = 24): Array[Byte] = {
    val rowBytes = (width * 3 + 3) & ~3
    val dataLen = rowBytes * height
    val bb = ByteBuffer.allocate(54 + dataLen).order(ByteOrder.LITTLE_ENDIAN)
    bb.put('B'.toByte).put('M'.toByte).putInt(54 + dataLen)
      .putInt(0).putInt(54)
    bb.putInt(40).putInt(width).putInt(height).putShort(1).putShort(24)
      .putInt(0) // BI_RGB
      .putInt(dataLen).putInt(2835).putInt(2835).putInt(0).putInt(0)
    var y = height - 1 // bottom-up
    while (y >= 0) {
      var x = 0
      while (x < width) {
        val h = graft.corpus.SyntheticCorpus.mix2(seed, (y.toLong << 20) | x)
        bb.put((h & 0xff).toByte)          // B
        bb.put(((h >> 8) & 0xff).toByte)   // G
        bb.put(((h >> 16) & 0xff).toByte)  // R
        x += 1
      }
      var pad = rowBytes - width * 3
      while (pad > 0) { bb.put(0.toByte); pad -= 1 }
      y -= 1
    }
    bb.array()
  }

  /** Parse an uncompressed 24-bit BMP: header fields + one pass over the
    * (padded, bottom-up) pixel rows for channel means. */
  def decodeBmp(bytes: Array[Byte]): BmpInfo = {
    val bb = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    require(bytes.length >= 54 && bytes(0) == 'B' && bytes(1) == 'M', "not a BMP")
    bb.position(10)
    val dataOff = bb.getInt()
    bb.getInt() // header size
    val width = bb.getInt()
    val heightRaw = bb.getInt()
    bb.getShort()
    val bpp = bb.getShort().toInt
    val compression = bb.getInt()
    require(bpp == 24 && compression == 0, s"only 24-bit BI_RGB (bpp=$bpp)")
    val height = math.abs(heightRaw)
    require(width > 0 && height > 0, s"empty image ($width x $heightRaw)")
    val rowBytes = (width * 3 + 3) & ~3
    var (sr, sg, sbl) = (0.0, 0.0, 0.0)
    var y = 0
    while (y < height) {
      var off = dataOff + y * rowBytes
      var x = 0
      while (x < width) {
        sbl += (bytes(off) & 0xff); sg += (bytes(off + 1) & 0xff)
        sr += (bytes(off + 2) & 0xff)
        off += 3; x += 1
      }
      y += 1
    }
    val n = width.toLong * height
    BmpInfo(width, height, bpp, sr / n, sg / n, sbl / n)
  }

  /** Perceptual difference hash (dHash) of a 24-bit BMP: decode, nearest-
    * neighbor resample the luma plane to 9×8, then bit i = L(x,y) > L(x+1,y)
    * — the standard 64-bit image fingerprint whose Hamming distance orders
    * visual similarity. Orientation-normalized to top-down rows so the
    * stored row order (bottom-up vs top-down BMPs) cannot flip the hash. */
  def dhash(bytes: Array[Byte]): Long = {
    val bb = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    bb.position(10)
    val dataOff = bb.getInt()
    bb.getInt()
    val width = bb.getInt()
    val heightRaw = bb.getInt()
    bb.getShort()
    val bpp = bb.getShort().toInt
    require(bpp == 24, "dhash: 24-bit BMP only")
    val height = math.abs(heightRaw)
    require(width > 0 && height > 0, s"dhash: empty image ($width x $heightRaw)")
    val bottomUp = heightRaw > 0
    val rowBytes = (width * 3 + 3) & ~3
    def luma(x: Int, yTop: Int): Double = {
      val yStored = if (bottomUp) height - 1 - yTop else yTop
      val off = dataOff + yStored * rowBytes + x * 3
      0.114 * (bytes(off) & 0xff) + 0.587 * (bytes(off + 1) & 0xff) +
        0.299 * (bytes(off + 2) & 0xff)
    }
    dhashGrid(luma, width, height)
  }

  /** The dHash selection rule, shared by every decoder path: nearest-
    * neighbor 9×8 luma resample, bit (y,x) = L(x,y) > L(x+1,y). Keeping the
    * rule in one place is what makes swapping decoders hash-compatible. */
  private def dhashGrid(luma: (Int, Int) => Double, width: Int,
      height: Int): Long = {
    var h = 0L
    var y = 0
    while (y < 8) {
      var x = 0
      while (x < 8) {
        val sy = y * height / 8
        val a = luma(x * width / 9, sy)
        val b = luma((x + 1) * width / 9, sy)
        if (a > b) h |= 1L << (y * 8 + x)
        x += 1
      }
      y += 1
    }
    h
  }

  /** Format-sniffing dHash: uncompressed BMPs go through the byte-level
    * decoder above; anything else (JPEG, PNG, GIF) is decoded by the JDK's
    * built-in ImageIO codecs — the first REAL swap through the documented
    * decoder seam (MultimodalOps: "swapping in a codec is a drop-in
    * change"). The selection rule (dhashGrid) is shared, so the hash is
    * decoder-independent: the same pixels produce the same 64 bits whether
    * they arrived as BMP bytes or a JPEG stream. The luma here reads the
    * sRGB ints ImageIO produces with the same BT.601-style coefficients as
    * the BMP path. */
  /** Decompression-bomb bound for the ImageIO path: a few-KB stream can
    * DECLARE e.g. 40000×40000 px, and decoding it allocates gigabytes and
    * throws OutOfMemoryError — which is fatal (NonFatal does not match), so
    * it would escape MultimodalOps' per-row isolation and kill the job. The
    * header is read via an ImageReader BEFORE any pixel allocation and
    * over-bound images are rejected as undecodable rows instead. 64 Mpx
    * (≤ ~256 MB ARGB) bounds a worst-case row without excluding any real
    * web image. */
  private val MaxImagePixels = 64L << 20

  def dhashImage(bytes: Array[Byte]): Long =
    if (bytes.length >= 2 && bytes(0) == 'B'.toByte && bytes(1) == 'M'.toByte)
      dhash(bytes)
    else {
      // One stream, one reader, one parse: the header probe (dimension
      // bound) and the pixel decode share the reader — ImageIO.read after
      // a separate probe would rebuild the (temp-file-backed) input stream
      // and re-parse the container on every row of the corpus. reader
      // selection matches ImageIO.read (first registered reader), and
      // read(0) is the same first-frame decode it performs.
      withReader(bytes) { (reader, _) => dhashBuffered(boundedRead(reader, 0)) }
    }

  /** Frame-count bound for multi-frame containers: an animated GIF can
    * DECLARE an absurd frame count the same way a PNG declares absurd
    * dimensions; per-frame pixel bounds alone would still decode millions
    * of tiny frames. Over-bound blobs are undecodable rows (quarantine),
    * not job killers. 4096 frames ≈ 2.5 min of 30 fps animation — beyond
    * any real web GIF. */
  val MaxVideoFrames = 4096

  /** AGGREGATE pixel budget across every frame a single blob decodes: the
    * per-frame and frame-count bounds multiply otherwise (4096 frames ×
    * 64 Mpx each passes both and decodes ~1 TB of pixels from one row).
    * 256 Mpx ≈ 1 GB of ARGB total per blob — generous for any real
    * animation, fatal for none. Checked CUMULATIVELY before each frame
    * decode, from declared dimensions, before any pixel allocation. */
  val MaxVideoTotalPixels = 256L << 20

  /** Per-frame perceptual dHashes of a MULTI-FRAME container, as
    * (frame_index, dhash) pairs in frame order — the same bounded ImageIO
    * reader seam as dhashImage, one parse per blob.
    *
    * Animated GIFs are COMPOSITED: real-world GIFs delta-encode — frame k
    * is a small changed rectangle over the previous canvas, and
    * `reader.read(k)` returns that partial raster, so hashing rasters
    * directly would hash tiny patches instead of displayed frames. Each
    * frame is drawn at its (left, top) offset onto a logical-screen canvas
    * with the GIF disposal methods honored (doNotDispose accumulates,
    * restoreToBackgroundColor clears the frame's rect,
    * restoreToPrevious restores the pre-frame canvas), and the hash is of
    * the DISPLAYED canvas. Full-canvas frame sequences (e.g. synthGif's)
    * hash identically to their raw rasters.
    *
    * `sampleN > 0` returns that many evenly spaced frames (index f maps to
    * source frame floor(n*f/sampleN); containers with fewer than sampleN
    * frames return one entry per frame — sampling cannot invent frames);
    * `sampleN <= 0` returns every frame. For composited GIFs, PREDECESSOR
    * frames of a sampled frame must still decode (their pixels are part of
    * the displayed canvas); for other formats only sampled frames decode.
    * Single-frame images (and uncompressed BMPs via the byte decoder) come
    * back as one frame 0 — stills are length-1 videos, so the frame
    * machinery subsumes dhashImage.
    *
    * Decode-bomb bounds, all from DECLARED sizes before pixel allocation:
    * per-frame MaxImagePixels, frame count MaxVideoFrames, and the
    * CUMULATIVE MaxVideoTotalPixels budget (the first two multiply to ~1 TB
    * without it). Over-budget blobs are undecodable rows (quarantine). */
  def frameDHashes(bytes: Array[Byte], sampleN: Int = 0): Array[(Int, Long)] =
    if (bytes.length >= 2 && bytes(0) == 'B'.toByte && bytes(1) == 'M'.toByte)
      Array((0, dhash(bytes)))
    else withReader(bytes) { (reader, _) =>
      // allowSearch: the stream is an in-memory byte array, so the exact
      // count is a cheap scan (no seekForwardOnly stream to exhaust)
      val n = reader.getNumImages(true)
      require(n >= 1, "frameDHashes: container declares no frames")
      require(n <= MaxVideoFrames,
        s"frameDHashes: declared frame count $n exceeds the " +
          s"$MaxVideoFrames-frame decode bound")
      val wanted =
        if (sampleN <= 0 || sampleN >= n) (0 until n).toArray
        else (0 until sampleN).map(f => ((n.toLong * f) / sampleN).toInt)
          .distinct.toArray
      if (n > 1 && reader.getFormatName.equalsIgnoreCase("gif"))
        compositedGifHashes(reader, wanted)
      else {
        var budget = 0L
        wanted.map { i =>
          budget = spendPixelBudget(budget,
            reader.getWidth(i).toLong * reader.getHeight(i))
          (i, dhashBuffered(boundedRead(reader, i)))
        }
      }
    }

  private def spendPixelBudget(soFar: Long, px: Long): Long = {
    val t = soFar + px
    require(t <= MaxVideoTotalPixels,
      s"cumulative declared pixels $t exceed the $MaxVideoTotalPixels" +
        "-pixel per-blob decode budget")
    t
  }

  /** Composite an animated GIF frame by frame and hash the displayed
    * canvas at each `wanted` index (wanted is sorted ascending; every
    * frame up to max(wanted) decodes — compositing needs predecessors). */
  private def compositedGifHashes(reader: javax.imageio.ImageReader,
      wanted: Array[Int]): Array[(Int, Long)] = {
    val wantedSet = wanted.toSet
    val last = wanted.max
    // logical screen from stream metadata; fall back to frame-0 dims
    val (sw, sh) = gifScreenDims(reader)
    require(sw > 0 && sh > 0 && sw.toLong * sh <= MaxImagePixels,
      s"gif logical screen ${sw}x$sh exceeds the $MaxImagePixels-pixel bound")
    var budget = spendPixelBudget(0L, sw.toLong * sh) // the canvas itself
    var canvas = new java.awt.image.BufferedImage(
      sw, sh, java.awt.image.BufferedImage.TYPE_INT_ARGB)
    val out = Array.newBuilder[(Int, Long)]
    var i = 0
    while (i <= last) {
      budget = spendPixelBudget(budget,
        reader.getWidth(i).toLong * reader.getHeight(i))
      val frame = boundedRead(reader, i)
      val (x, y, disposal) = gifFrameMeta(reader, i)
      val prev =
        if (disposal == "restoreToPrevious") {
          val c = new java.awt.image.BufferedImage(sw, sh,
            java.awt.image.BufferedImage.TYPE_INT_ARGB)
          val g = c.createGraphics(); g.drawImage(canvas, 0, 0, null); g.dispose()
          c
        } else null
      val g = canvas.createGraphics()
      g.drawImage(frame, x, y, null)
      g.dispose()
      if (wantedSet(i)) out += ((i, dhashBuffered(canvas)))
      disposal match {
        case "restoreToBackgroundColor" =>
          // browsers render the disposed rect as transparent; luma reads it
          // as black — deterministic either way, transparent matches display
          val g2 = canvas.createGraphics()
          g2.setComposite(java.awt.AlphaComposite.Clear)
          g2.fillRect(x, y, frame.getWidth, frame.getHeight)
          g2.dispose()
        case "restoreToPrevious" => canvas = prev
        case _ => () // none / doNotDispose: accumulate
      }
      i += 1
    }
    out.result()
  }

  private def gifScreenDims(reader: javax.imageio.ImageReader): (Int, Int) =
    try {
      val tree = reader.getStreamMetadata
        .getAsTree("javax_imageio_gif_stream_1.0")
      val kids = tree.getChildNodes
      var w = -1; var h = -1
      var k = 0
      while (k < kids.getLength) {
        val node = kids.item(k)
        if (node.getNodeName == "LogicalScreenDescriptor") {
          val at = node.getAttributes
          w = at.getNamedItem("logicalScreenWidth").getNodeValue.toInt
          h = at.getNamedItem("logicalScreenHeight").getNodeValue.toInt
        }
        k += 1
      }
      if (w > 0 && h > 0) (w, h)
      else (reader.getWidth(0), reader.getHeight(0))
    } catch { case scala.util.control.NonFatal(_) =>
      (reader.getWidth(0), reader.getHeight(0))
    }

  /** (left, top, disposalMethod) of GIF frame `i` from its image metadata;
    * (0, 0, "none") when absent. */
  private def gifFrameMeta(reader: javax.imageio.ImageReader,
      i: Int): (Int, Int, String) =
    try {
      val tree = reader.getImageMetadata(i)
        .getAsTree("javax_imageio_gif_image_1.0")
      val kids = tree.getChildNodes
      var x = 0; var y = 0; var disposal = "none"
      var k = 0
      while (k < kids.getLength) {
        val node = kids.item(k)
        node.getNodeName match {
          case "ImageDescriptor" =>
            val at = node.getAttributes
            x = at.getNamedItem("imageLeftPosition").getNodeValue.toInt
            y = at.getNamedItem("imageTopPosition").getNodeValue.toInt
          case "GraphicControlExtension" =>
            val at = node.getAttributes
            disposal = at.getNamedItem("disposalMethod").getNodeValue
          case _ => ()
        }
        k += 1
      }
      (x, y, disposal)
    } catch { case scala.util.control.NonFatal(_) => (0, 0, "none") }

  /** Shared ImageIO reader lifecycle: one in-memory stream, the first
    * registered reader (ImageIO.read's own selection), guaranteed
    * dispose/close. */
  private def withReader[T](bytes: Array[Byte])(
      f: (javax.imageio.ImageReader, Int) => T): T = {
    val iis = javax.imageio.ImageIO.createImageInputStream(
      new java.io.ByteArrayInputStream(bytes))
    try {
      val readers = javax.imageio.ImageIO.getImageReaders(iis)
      require(readers.hasNext, "undecodable image bytes")
      val reader = readers.next()
      try {
        reader.setInput(iis) // seekForwardOnly=false: getNumImages may scan
        f(reader, 0)
      } finally reader.dispose()
    } finally iis.close()
  }

  /** Decode frame `i` with the decompression-bomb dimension bound applied
    * BEFORE any pixel allocation (see MaxImagePixels). */
  private def boundedRead(reader: javax.imageio.ImageReader,
      i: Int): java.awt.image.BufferedImage = {
    val (w, h) = (reader.getWidth(i).toLong, reader.getHeight(i).toLong)
    require(w > 0 && h > 0 && w * h <= MaxImagePixels,
      s"declared dimensions ${w}x$h exceed the $MaxImagePixels-pixel " +
        "decode bound")
    val img = reader.read(i)
    require(img != null, "undecodable image bytes")
    img
  }

  private def dhashBuffered(img: java.awt.image.BufferedImage): Long = {
    def luma(x: Int, y: Int): Double = {
      val rgb = img.getRGB(x, y)
      0.114 * (rgb & 0xff) + 0.587 * ((rgb >> 8) & 0xff) +
        0.299 * ((rgb >> 16) & 0xff)
    }
    dhashGrid(luma, img.getWidth, img.getHeight)
  }

  /** Deterministic animated GIF from explicit RGB frames — the multi-frame
    * fixture generator (the JDK ships a GIF ImageWriter; its sequence API
    * is the documented multi-frame path). GIF quantizes to a palette, but
    * both sides of every test read the bytes back through ImageIO, so the
    * palette round-trip is shared. */
  def synthGif(frames: Seq[java.awt.image.BufferedImage]): Array[Byte] = {
    require(frames.nonEmpty, "synthGif: at least one frame")
    val baos = new java.io.ByteArrayOutputStream()
    val ios = javax.imageio.ImageIO.createImageOutputStream(baos)
    val writer = javax.imageio.ImageIO.getImageWritersByFormatName("gif").next()
    try {
      writer.setOutput(ios)
      writer.prepareWriteSequence(null)
      frames.foreach(img => writer.writeToSequence(
        new javax.imageio.IIOImage(img, null, null), null))
      writer.endWriteSequence()
    } finally { writer.dispose(); ios.close() }
    baos.toByteArray
  }

  /** Deterministic DELTA-encoded animated GIF: each frame is (raster,
    * left, top, disposalMethod) — the real-world GIF shape (partial
    * rasters at offsets) that compositedGifHashes exists for. Frame 0
    * should be full-canvas (the JDK writer derives the logical screen from
    * the first frame). disposalMethod ∈ none | doNotDispose |
    * restoreToBackgroundColor | restoreToPrevious. */
  def synthGifDelta(
      frames: Seq[(java.awt.image.BufferedImage, Int, Int, String)])
      : Array[Byte] = {
    require(frames.nonEmpty, "synthGifDelta: at least one frame")
    val baos = new java.io.ByteArrayOutputStream()
    val ios = javax.imageio.ImageIO.createImageOutputStream(baos)
    val writer = javax.imageio.ImageIO.getImageWritersByFormatName("gif").next()
    try {
      writer.setOutput(ios)
      writer.prepareWriteSequence(null)
      frames.foreach { case (img, x, y, disposal) =>
        val itype =
          javax.imageio.ImageTypeSpecifier.createFromRenderedImage(img)
        val md = writer.getDefaultImageMetadata(itype, null)
        val fmt = "javax_imageio_gif_image_1.0"
        val tree = md.getAsTree(fmt)
          .asInstanceOf[javax.imageio.metadata.IIOMetadataNode]
        def child(name: String): javax.imageio.metadata.IIOMetadataNode = {
          val kids = tree.getChildNodes
          var k = 0
          while (k < kids.getLength) {
            if (kids.item(k).getNodeName == name)
              return kids.item(k)
                .asInstanceOf[javax.imageio.metadata.IIOMetadataNode]
            k += 1
          }
          val n = new javax.imageio.metadata.IIOMetadataNode(name)
          tree.appendChild(n)
          n
        }
        val desc = child("ImageDescriptor")
        desc.setAttribute("imageLeftPosition", x.toString)
        desc.setAttribute("imageTopPosition", y.toString)
        desc.setAttribute("imageWidth", img.getWidth.toString)
        desc.setAttribute("imageHeight", img.getHeight.toString)
        desc.setAttribute("interlaceFlag", "FALSE")
        val gce = child("GraphicControlExtension")
        gce.setAttribute("disposalMethod", disposal)
        gce.setAttribute("userInputFlag", "FALSE")
        gce.setAttribute("transparentColorFlag", "FALSE")
        gce.setAttribute("delayTime", "10")
        gce.setAttribute("transparentColorIndex", "0")
        md.setFromTree(fmt, tree)
        writer.writeToSequence(
          new javax.imageio.IIOImage(img, null, md), null)
      }
      writer.endWriteSequence()
    } finally { writer.dispose(); ios.close() }
    baos.toByteArray
  }

  /** One deterministic synthetic frame: blocky RGB derived from (seed,
    * frameIdx) via the corpus mix — adjacent frameIdx values differ in few
    * blocks, so consecutive frames of one seed are near-duplicates under
    * dHash while different seeds are not. */
  def synthFrame(seed: Long, frameIdx: Int, w: Int = 32,
      h: Int = 32): java.awt.image.BufferedImage = {
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        // 4x4 blocks keyed on the SEED only, with a single frame-keyed
        // block: frames within one gif share 63/64 blocks (near-dup),
        // different seeds share none
        val bx = x / 4; val by = y / 4
        val hotBlock = (graft.corpus.SyntheticCorpus.mix2(seed,
          frameIdx.toLong) & 0x3f).toInt
        val key =
          if (by * (w / 4) + bx == hotBlock)
            graft.corpus.SyntheticCorpus.mix2(seed * 31 + frameIdx, (bx * 97 + by).toLong)
          else graft.corpus.SyntheticCorpus.mix2(seed, (bx * 97 + by).toLong)
        img.setRGB(x, y, (key & 0xffffff).toInt)
        x += 1
      }
      y += 1
    }
    img
  }
}
