package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Multimodal columns: image/audio/video payloads ride as opaque `binary`
  * columns next to typed metadata (BASELINE.json north star; the reference
  * stops at BLOB→TEXT passthrough, src/schema/cell.rs:691-712 — this is the
  * beyond-reference training-pipeline surface).
  *
  * Design for 100 TB: every metadata helper is a pure Column expression over
  * a bounded byte PREFIX of the payload (magic sniffing hexes 12 bytes,
  * never the blob), so scans stay in whole-stage codegen and projection
  * pruning can drop the payload column entirely when only metadata is
  * queried. Decoding is the only per-row imperative step and is isolated in
  * partition-local `mapPartitions` (no shuffle, linear cost, data-local).
  *
  * IMAGE decode/resize are REAL: `javax.imageio` ships with the JDK and
  * runs headless, so `decodeImage`/`resizeImage` do actual PNG/JPEG/GIF/BMP
  * pixel work (undecodable payloads degrade to `decode_ok = false`, never
  * throw). Only VIDEO remains environment-blocked (no ffmpeg/codec libs in
  * this container): `frameSampleStub` keeps the one-to-many decode shape
  * with a clearly-marked deterministic frame fake.
  */
object Multimodal {

  /** Payload size in bytes (metadata-only query stays off the heap). */
  def sizeBytes(payload: Column): Column = length(payload).cast("long")

  /** Deterministic content hash. md5 over the HEX rendering (not the raw
    * bytes) so any engine without blob-md5 can replicate it exactly. */
  def contentHash(payload: Column): Column = md5(hex(payload))

  /** Magic-byte container sniff over the first 12 bytes only. */
  def sniffMime(payload: Column): Column = {
    val h = upper(hex(substring(payload, 1, 12)))
    val riff = h.startsWith("52494646")
    when(payload.isNull, lit(null).cast("string"))
      .when(h.startsWith("89504E470D0A1A0A"), "image/png")
      .when(h.startsWith("FFD8FF"), "image/jpeg")
      .when(h.startsWith("47494638"), "image/gif")
      .when(riff && substring(h, 17, 8) === "57415645", "audio/wav")
      .when(riff && substring(h, 17, 8) === "41564920", "video/avi")
      .when(h.startsWith("255044462D"), "application/pdf")
      .otherwise("application/octet-stream")
  }

  /** Payload is present, non-empty, and its sniffed container matches the
    * mime the metadata claims. */
  def isValid(payload: Column, declaredMime: Column): Column =
    payload.isNotNull && length(payload) > 0 && sniffMime(payload) === declaredMime

  // ------------------------------------------------------------------ image
  // Real image codec layer over `javax.imageio` (stock JDK, headless-safe).

  /** Decompression-bomb guard: a 100-byte payload can declare a
    * 100k×100k canvas; refuse anything whose DECODED pixel count
    * exceeds this (64 Mpx ≈ 192 MB of RGB) before allocating it. */
  private val MaxPixels: Long = 64L * 1024 * 1024

  /** Decode bytes → component-raster BufferedImage, or None. Never throws:
    * at 100 TB a corrupt payload is data, not an exception. The bomb guard
    * probes declared dimensions from the HEADER (ImageReader.getWidth reads
    * no pixel data) BEFORE any raster allocation — filtering after a full
    * ImageIO.read would OOM the executor first. */
  private def decode(bytes: Array[Byte]): Option[java.awt.image.BufferedImage] = {
    import java.awt.image.BufferedImage
    if (bytes == null || bytes.isEmpty) None
    else try {
      val iis = javax.imageio.ImageIO.createImageInputStream(
        new java.io.ByteArrayInputStream(bytes))
      val readers = javax.imageio.ImageIO.getImageReaders(iis)
      if (!readers.hasNext) { iis.close(); None }
      else {
        val reader = readers.next()
        try {
          reader.setInput(iis)
          val (w, h) = (reader.getWidth(0), reader.getHeight(0)) // header-only
          if (w.toLong * h > MaxPixels || w <= 0 || h <= 0) None
          else Option(reader.read(0)).map { img =>
            // Palette (GIF / indexed PNG) rasters hold palette INDICES —
            // arithmetic over them is meaningless; expand to 8-bit RGB.
            // 8-bit gray / RGB / RGBA component rasters pass through losslessly.
            val cm = img.getColorModel
            val bands = img.getRaster.getNumBands
            val componentOk = !cm.isInstanceOf[java.awt.image.IndexColorModel] &&
              cm.getComponentSize.forall(_ == 8) && (bands == 1 || bands == 3 || bands == 4)
            if (componentOk) img
            else {
              val out = new BufferedImage(img.getWidth, img.getHeight, BufferedImage.TYPE_3BYTE_BGR)
              val g = out.createGraphics(); g.drawImage(img, 0, 0, null); g.dispose(); out
            }
          }
        } finally { reader.dispose(); iis.close() }
      }
    } catch { case scala.util.control.NonFatal(_) => None }
  }

  private def pixSum(img: java.awt.image.BufferedImage): Long = {
    val r = img.getRaster
    val bands = r.getNumBands
    var sum = 0L
    var y = 0
    while (y < img.getHeight) {
      var x = 0
      while (x < img.getWidth) {
        var b = 0
        while (b < bands) { sum += r.getSample(x, y, b); b += 1 }
        x += 1
      }
      y += 1
    }
    sum
  }

  /** Real image decode (PNG/JPEG/GIF/BMP via ImageIO): true decoded
    * dimensions, band count, and the exact integer sum of every raster
    * sample — the pixel-data proof a header sniff can't fake. Undecodable
    * payloads (truncated, not an image, pixel bomb) yield `decode_ok=false`
    * with null metrics. Partition-local mapPartitions: no shuffle, linear
    * cost, decode stays data-local — the 100 TB shape. */
  def decodeImage(df: DataFrame, payloadCol: String, idCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(payloadCol))
      .as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        javax.imageio.ImageIO.setUseCache(false) // no temp-file cache per decode
        rows.map { case (id, bytes) =>
          decode(bytes) match {
            case Some(img) =>
              (id, Some(img.getWidth.toLong), Some(img.getHeight.toLong),
                Some(img.getRaster.getNumBands.toLong), Some(pixSum(img)), true)
            case None => (id, None, None, None, None, false)
          }
        }
      }
      .toDF(idCol, "width", "height", "channels", "pix_sum", "decode_ok")
  }

  /** IMAGE PATCH GRID — the ViT preprocessing shape: decode, then split the
    * raster into `patch`×`patch` cells (right/bottom edge cells partial)
    * and emit per-cell integer stats (pixel count, exact sample sum over
    * all bands) — one row in, (⌈w/p⌉·⌈h/p⌉) rows out, the flatMap sibling
    * of m07's audio frames. Partition-local, zero shuffle, linear in
    * pixels; integer arithmetic keeps every cell oracle-replayable.
    * Undecodable payloads degrade to ONE decode_ok=false row. */
  def imagePatches(df: DataFrame, payloadCol: String, idCol: String,
      patch: Int = 8): DataFrame = {
    require(patch >= 1, s"patch must be >= 1, got $patch")
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(payloadCol))
      .as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        javax.imageio.ImageIO.setUseCache(false)
        rows.flatMap { case (id, bytes) =>
          decode(bytes) match {
            case Some(img) =>
              val w = img.getWidth; val h = img.getHeight
              val raster = img.getRaster
              val bands = raster.getNumBands
              val cols = (w + patch - 1) / patch
              val prows = (h + patch - 1) / patch
              for (pr <- (0 until prows).iterator; pc <- 0 until cols) yield {
                val x1 = math.min((pc + 1) * patch, w)
                val y1 = math.min((pr + 1) * patch, h)
                var sum = 0L
                var y = pr * patch
                while (y < y1) {
                  var x = pc * patch
                  while (x < x1) {
                    var b = 0
                    while (b < bands) { sum += raster.getSample(x, y, b); b += 1 }
                    x += 1
                  }
                  y += 1
                }
                val nPix = (x1 - pc * patch).toLong * (y1 - pr * patch)
                (id, Option(pr.toLong), Option(pc.toLong), Option(nPix),
                  Option(sum), true)
              }
            case None => Iterator.single((id, None: Option[Long],
              None: Option[Long], None: Option[Long], None: Option[Long], false))
          }
        }
      }
      .toDF(idCol, "patch_row", "patch_col", "n_pixels", "pix_sum", "decode_ok")
  }

  /** Bilinear half-scale on a component raster: at an exact 2× downscale
    * with pixel-center alignment, bilinear interpolation IS the 2×2 box
    * average (floor on integer samples). Odd trailing row/column is
    * dropped (floor dims). Implemented directly on the raster — integer
    * in, integer out, no colorspace round-trip — so the result is exactly
    * replayable by any engine (this is what gives m03 a DuckDB oracle). */
  private def halfScale(img: java.awt.image.BufferedImage): java.awt.image.BufferedImage = {
    import java.awt.image.BufferedImage
    val w = img.getWidth / 2
    val h = img.getHeight / 2
    val bands = img.getRaster.getNumBands
    val outType = bands match {
      case 1 => BufferedImage.TYPE_BYTE_GRAY
      case 4 => BufferedImage.TYPE_4BYTE_ABGR
      case _ => BufferedImage.TYPE_3BYTE_BGR
    }
    val out = new BufferedImage(w, h, outType)
    val src = img.getRaster
    val dst = out.getRaster
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        var b = 0
        while (b < bands) {
          val s = src.getSample(2 * x, 2 * y, b) + src.getSample(2 * x + 1, 2 * y, b) +
            src.getSample(2 * x, 2 * y + 1, b) + src.getSample(2 * x + 1, 2 * y + 1, b)
          dst.setSample(x, y, b, s / 4)
          b += 1
        }
        x += 1
      }
      y += 1
    }
    out
  }

  /** Real resize: decode → bilinear half-scale → re-encode PNG → RE-DECODE
    * the emitted bytes and report THEIR dims/pixel-sum (round-trip proof:
    * the output payload is a valid image whose pixels are the resize
    * arithmetic, not whatever the in-memory raster held). Binary-in /
    * binary-out, partition-local, no shuffle. Failures → `decode_ok=false`,
    * null payload. */
  def resizeImage(df: DataFrame, payloadCol: String, idCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(payloadCol))
      .as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        javax.imageio.ImageIO.setUseCache(false)
        rows.map { case (id, bytes) =>
          decode(bytes).filter(i => i.getWidth >= 2 && i.getHeight >= 2).flatMap { img =>
            val half = halfScale(img)
            val bos = new java.io.ByteArrayOutputStream()
            javax.imageio.ImageIO.write(half, "png", bos)
            val png = bos.toByteArray
            decode(png).map { back =>
              (id, png, Some(back.getWidth.toLong), Some(back.getHeight.toLong),
                Some(pixSum(back)), true)
            }
          }.getOrElse((id, null: Array[Byte], None: Option[Long], None: Option[Long],
            None: Option[Long], false))
        }
      }
      .toDF(idCol, "payload", "out_width", "out_height", "out_pix_sum", "decode_ok")
  }

  /** 8-bit grayscale PNG encoder (real ImageIO encode; also the fixture
    * generator for the m03/m04 oracles). */
  def encodePngGray(width: Int, height: Int, sample: (Int, Int) => Int): Array[Byte] = {
    import java.awt.image.BufferedImage
    val img = new BufferedImage(width, height, BufferedImage.TYPE_BYTE_GRAY)
    val r = img.getRaster
    var y = 0
    while (y < height) {
      var x = 0
      while (x < width) { r.setSample(x, y, 0, sample(x, y) & 0xff); x += 1 }
      y += 1
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  /** Deterministic PNG fixture family shared by the m03/m04 queries, their
    * DuckDB oracles, and MultimodalSpec: every dimension/pixel is pure
    * integer arithmetic of `id`, so an engine with NO codec can replay the
    * DECODED geometry and pixel sums in closed form while this engine
    * proves it actually decoded the bytes. All dims even (clean 2× resize). */
  def fixtureWidth(id: Long): Int = 8 + 2 * (id % 16).toInt
  def fixtureHeight(id: Long): Int = 8 + 2 * ((id * 7) % 12).toInt
  def fixtureSample(id: Long)(x: Int, y: Int): Int = ((id * 31 + x * 7 + y * 13) % 256).toInt
  def fixturePng(id: Long): Array[Byte] =
    encodePngGray(fixtureWidth(id), fixtureHeight(id), fixtureSample(id))

  // ------------------------------------------------------------------ video
  // REAL container demux (RIFF/AVI chunk grammar from the public spec):
  // the frame PAYLOADS are extracted for real — only pixel decode of those
  // payloads still needs codecs this container lacks.

  /** Parse RIFF/AVI bytes → (streamId, frameIndex, absoluteOffset, bytes)
    * per frame chunk (##dc/##db/##wb) inside the `movi` LIST. Tolerant
    * demuxer: non-AVI payloads and truncated tails yield the frames parsed
    * so far (corrupt payloads are data, not exceptions). */
  private def parseAviFrames(bytes: Array[Byte]): Seq[(String, Int, Long, Array[Byte])] = {
    def fourcc(off: Int): String =
      new String(bytes, off, 4, "US-ASCII")
    def u32le(off: Int): Long =
      (bytes(off) & 0xffL) | ((bytes(off + 1) & 0xffL) << 8) |
        ((bytes(off + 2) & 0xffL) << 16) | ((bytes(off + 3) & 0xffL) << 24)
    if (bytes == null || bytes.length < 12) return Nil
    if (fourcc(0) != "RIFF" || fourcc(8) != "AVI ") return Nil
    val out = Seq.newBuilder[(String, Int, Long, Array[Byte])]
    var frameIdx = 0
    val riffEnd = math.min(bytes.length.toLong, 8L + u32le(4))
    // walk a chunk run, descending into nested LISTs — interleaved AVIs
    // group frames as `LIST ... rec ` inside movi (the CD-ROM layout)
    def walkFrames(start: Long, end: Long): Unit = {
      var q = start
      while (q + 8 <= end) {
        val cid = fourcc(q.toInt)
        val csz = u32le(q.toInt + 4)
        if (cid == "LIST" && q + 12 <= end)
          walkFrames(q + 12, math.min(end, q + 8 + csz))
        else {
          val isFrame = cid.length == 4 && cid(0).isDigit && cid(1).isDigit &&
            (cid.endsWith("dc") || cid.endsWith("db") || cid.endsWith("wb"))
          if (isFrame && q + 8 + csz <= end) {
            val data = java.util.Arrays.copyOfRange(bytes, (q + 8).toInt, (q + 8 + csz).toInt)
            out += ((cid.substring(0, 2), frameIdx, q + 8, data))
            frameIdx += 1
          }
        }
        q += 8 + csz + (csz & 1) // chunks pad to even
      }
    }
    var p = 12L
    while (p + 8 <= riffEnd) {
      val id = fourcc(p.toInt)
      val sz = u32le(p.toInt + 4)
      if (id == "LIST" && p + 12 <= riffEnd && fourcc(p.toInt + 8) == "movi")
        walkFrames(p + 12, math.min(riffEnd, p + 8 + sz))
      p += 8 + sz + (sz & 1)
    }
    out.result()
  }

  /** Real AVI frame demux as a DataFrame op: one row per frame chunk with
    * its stream id, index, absolute payload offset, size, and the md5 of
    * the UPPERCASE-hex rendering of the frame bytes (the same replayable
    * hash contract as frameSampleStub — any SQL engine can recompute it).
    * Partition-local, no shuffle, linear in payload bytes. */
  def aviFrames(df: DataFrame, payloadCol: String, idCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(payloadCol))
      .as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        val md = java.security.MessageDigest.getInstance("MD5")
        val HEXU = "0123456789ABCDEF".getBytes("US-ASCII")
        val HEXL = "0123456789abcdef".toCharArray
        rows.flatMap { case (id, bytes) =>
          parseAviFrames(bytes).map { case (stream, k, off, data) =>
            val hexBuf = new Array[Byte](data.length * 2)
            var i = 0
            while (i < data.length) {
              val b = data(i) & 0xff
              hexBuf(2 * i) = HEXU(b >> 4); hexBuf(2 * i + 1) = HEXU(b & 0xf)
              i += 1
            }
            md.reset(); md.update(hexBuf)
            val d = md.digest()
            val hex = new Array[Char](32)
            var j = 0
            while (j < 16) {
              hex(2 * j) = HEXL((d(j) >> 4) & 0xf); hex(2 * j + 1) = HEXL(d(j) & 0xf)
              j += 1
            }
            (id, k.toLong, stream, off, data.length.toLong, new String(hex))
          }
        }
      }
      .toDF(idCol, "frame_idx", "stream", "offset", "size_bytes", "frame_md5")
  }

  /** Minimal spec-conform AVI container around raw frame payloads: RIFF
    * form `AVI ` holding one `movi` LIST of `<stream>dc` chunks. Real
    * container bytes (players' demuxers accept the grammar); the fixture
    * half of the m05 oracle. */
  def buildAvi(frames: Seq[Array[Byte]], streamId: String = "00"): Array[Byte] = {
    require(streamId.length == 2)
    val bos = new java.io.ByteArrayOutputStream()
    def w4(s: String): Unit = bos.write(s.getBytes("US-ASCII"))
    def wle(v: Long): Unit =
      (0 until 4).foreach(i => bos.write(((v >> (8 * i)) & 0xff).toInt))
    val moviSize = 4L + frames.map(f => 8L + f.length + (f.length & 1)).sum
    w4("RIFF"); wle(4L + 8L + moviSize); w4("AVI ")
    w4("LIST"); wle(moviSize); w4("movi")
    frames.foreach { f =>
      w4(s"${streamId}dc"); wle(f.length.toLong); bos.write(f)
      if ((f.length & 1) == 1) bos.write(0) // pad to even
    }
    bos.toByteArray
  }

  /** Deterministic AVI fixture family for the m05 oracle: frame k of doc
    * `id` is `32 + 8*(k%2)` bytes of `(id*7 + k*11 + i) % 256` — payload
    * offsets and hashes are closed-form arithmetic for an engine with no
    * demuxer. */
  def fixtureAviFrameCount(id: Long): Int = 2 + (id % 4).toInt
  def fixtureAviFrameSize(k: Int): Int = 32 + 8 * (k % 2)
  def fixtureAvi(id: Long): Array[Byte] =
    buildAvi((0 until fixtureAviFrameCount(id)).map { k =>
      Array.tabulate(fixtureAviFrameSize(k))(i => ((id * 7 + k * 11 + i) % 256).toByte)
    })

  // ------------------------------------------------------------ audio WAV
  /** REAL PCM audio decode: parse the RIFF/WAVE container (fmt chunk,
    * chunk-walk with even padding, data chunk) AND the 16-bit little-endian
    * samples themselves — channels, sample rate, sample count, peak
    * amplitude, and the exact energy (sum of squared samples). No codec
    * library needed: PCM WAV is the uncompressed baseline every audio
    * pipeline normalizes to, and the JDK-free byte walk keeps this
    * partition-local, zero shuffle, linear in payload bytes. Corrupt or
    * non-PCM payloads degrade to `decode_ok=false` rows — data, never
    * exceptions (the m04 contract). */
  def wavFeatures(df: DataFrame, payloadCol: String, idCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(payloadCol))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, bytes) =>
        parseWav(bytes) match {
          case Some((ch, rate, n, peak, energy)) =>
            (id, Option(ch.toLong), Option(rate.toLong), Option(n.toLong),
              Option(peak.toLong), Option(energy), true)
          case None => (id, None: Option[Long], None: Option[Long],
            None: Option[Long], None: Option[Long], None: Option[Long], false)
        }
      })
      .toDF(idCol, "channels", "sample_rate", "n_samples", "peak_abs", "energy",
        "decode_ok")
  }

  /** WAV container walk → (channels, sampleRate, dataOffset, nSamples).
    * None on anything that is not plain 16-bit PCM. Shared by the whole-clip
    * features (m06) and the frame windowing (m07). */
  private def wavPcm(bytes: Array[Byte]): Option[(Int, Int, Int, Int)] = {
    def fourcc(off: Int): String = new String(bytes, off, 4, "US-ASCII")
    def u32(off: Int): Long =
      (bytes(off) & 0xffL) | ((bytes(off + 1) & 0xffL) << 8) |
        ((bytes(off + 2) & 0xffL) << 16) | ((bytes(off + 3) & 0xffL) << 24)
    def u16(off: Int): Int = (bytes(off) & 0xff) | ((bytes(off + 1) & 0xff) << 8)
    if (bytes == null || bytes.length < 12) return None
    if (fourcc(0) != "RIFF" || fourcc(8) != "WAVE") return None
    val end = math.min(bytes.length.toLong, 8L + u32(4))
    var channels = 0
    var rate = 0
    var bits = 0
    var pcm = false
    var data: Option[(Int, Int)] = None // (offset, size)
    var p = 12L
    while (p + 8 <= end) {
      val id = fourcc(p.toInt)
      val sz = u32(p.toInt + 4)
      if (id == "fmt " && p + 8 + 16 <= end) {
        pcm = u16(p.toInt + 8) == 1
        channels = u16(p.toInt + 10)
        rate = u32(p.toInt + 12).toInt
        bits = u16(p.toInt + 22)
      } else if (id == "data" && p + 8 + sz <= end)
        data = Some(((p + 8).toInt, sz.toInt))
      p += 8 + sz + (sz & 1) // chunks pad to even, like every RIFF
    }
    if (!pcm || bits != 16 || channels < 1 || data.isEmpty) return None
    val (off, sz) = data.get
    Some((channels, rate, off, sz / 2))
  }

  /** Sample i (16-bit little-endian) of a located PCM data chunk. */
  @inline private def pcm16(bytes: Array[Byte], off: Int, i: Int): Int =
    ((bytes(off + 2 * i) & 0xff) | (bytes(off + 2 * i + 1) << 8)).toShort.toInt

  /** WAV bytes → (channels, sampleRate, nSamples, peakAbs, energy). None on
    * anything that is not plain 16-bit PCM. */
  private def parseWav(bytes: Array[Byte]): Option[(Int, Int, Int, Int, Long)] =
    wavPcm(bytes).map { case (channels, rate, off, n) =>
      var peak = 0
      var energy = 0L
      var i = 0
      while (i < n) {
        val s = pcm16(bytes, off, i)
        val a = math.abs(s)
        if (a > peak) peak = a
        energy += s.toLong * s
        i += 1
      }
      (channels, rate, n, peak, energy)
    }

  /** AUDIO FRAME WINDOWING — the feature-extraction shape every audio
    * pipeline runs after decode: split the PCM stream into fixed-size
    * frames (`frameSize` samples, tail frame partial) and emit per-frame
    * integer statistics (sample count, peak amplitude, exact energy). The
    * one-to-many flatMap stays partition-local — zero shuffle, linear in
    * payload bytes — and integer arithmetic keeps it oracle-replayable.
    * Corrupt / non-PCM payloads degrade to one decode_ok=false row — data,
    * never exceptions (the m04 contract). */
  def wavFrames(df: DataFrame, payloadCol: String, idCol: String,
      frameSize: Int = 16): DataFrame = {
    require(frameSize >= 1, s"frameSize must be >= 1, got $frameSize")
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(payloadCol))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.flatMap { case (id, bytes) =>
        wavPcm(bytes) match {
          case Some((_, _, off, n)) =>
            val nFrames = (n + frameSize - 1) / frameSize
            (0 until nFrames).iterator.map { k =>
              val from = k * frameSize
              val until = math.min(from + frameSize, n)
              var peak = 0
              var energy = 0L
              var i = from
              while (i < until) {
                val s = pcm16(bytes, off, i)
                val a = math.abs(s)
                if (a > peak) peak = a
                energy += s.toLong * s
                i += 1
              }
              (id, Option(k.toLong), Option((until - from).toLong),
                Option(peak.toLong), Option(energy), true)
            }
          case None => Iterator.single((id, None: Option[Long],
            None: Option[Long], None: Option[Long], None: Option[Long], false))
        }
      })
      .toDF(idCol, "frame_idx", "n_in_frame", "peak_abs", "energy", "decode_ok")
  }

  /** Deterministic PCM WAV fixture: mono 8 kHz 16-bit, `50 + id % 37`
    * samples of `((id*31 + i*17) mod 65536) - 32768` — count, peak and
    * energy are closed-form arithmetic for an engine with no WAV parser. A
    * JUNK chunk with an ODD size sits before `data`, so a walker that
    * forgets RIFF even-padding misreads every payload. */
  def fixtureWavSampleCount(id: Long): Int = 50 + (id % 37).toInt
  def fixtureWav(id: Long): Array[Byte] = {
    val n = fixtureWavSampleCount(id)
    val dataSize = 2 * n
    val junk = 3 // odd on purpose
    val riffSize = 4 + (8 + 16) + (8 + junk + 1) + (8 + dataSize)
    val b = java.nio.ByteBuffer.allocate(8 + riffSize)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    b.put("RIFF".getBytes("US-ASCII")).putInt(riffSize).put("WAVE".getBytes("US-ASCII"))
    b.put("fmt ".getBytes("US-ASCII")).putInt(16)
    b.putShort(1).putShort(1).putInt(8000).putInt(16000).putShort(2).putShort(16)
    b.put("JUNK".getBytes("US-ASCII")).putInt(junk).put(Array[Byte](7, 7, 7)).put(0.toByte)
    b.put("data".getBytes("US-ASCII")).putInt(dataSize)
    (0 until n).foreach { i =>
      b.putShort((((id * 31 + i * 17) % 65536) - 32768).toShort)
    }
    b.array()
  }

  /** Frame sampling — the one-to-many decode shape (video → frames). Each
    * payload explodes into one row per fixed-size "frame" with its index,
    * a content hash, and a synthetic timestamp (25 fps → 40 ms stride).
    *
    * STUB note: with no video codec in-container the "frame" is a raw
    * `frameBytes` slice of the payload, NOT a decoded picture — but the
    * plumbing is the real 100 TB shape: a partition-local flatMap (no
    * shuffle, linear in payload bytes, output rows ≫ input rows), with the
    * frame hash taken over the HEX rendering so a SQL engine can replicate
    * every output bit (this is what gives m02 a DuckDB oracle). */
  def frameSampleStub(df: DataFrame, payloadCol: String, idCol: String,
      frameBytes: Int = 256): DataFrame = {
    require(frameBytes > 0)
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(payloadCol))
      .as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        // PER-PARTITION scratch state — one MessageDigest and one hex buffer
        // reused across every frame (a per-frame getInstance + format-string
        // hex was the hot spot at bench scale), and the template for where a
        // real decoder would keep its codec context.
        val md = java.security.MessageDigest.getInstance("MD5")
        val HEXU = "0123456789ABCDEF".getBytes("US-ASCII")
        val HEXL = "0123456789abcdef".toCharArray
        val hexBuf = new Array[Byte](frameBytes * 2) // ASCII hex of one frame
        rows.flatMap { case (id, bytes) =>
          val n = if (bytes == null) 0 else bytes.length
          val frames = n / frameBytes // trailing partial frame is dropped
          (0 until frames).iterator.map { f =>
            // --- STUB: real frame decode goes here --------------------------
            var i = 0
            while (i < frameBytes) {
              val b = bytes(f * frameBytes + i) & 0xff
              hexBuf(2 * i) = HEXU(b >> 4)
              hexBuf(2 * i + 1) = HEXU(b & 0xf)
              i += 1
            }
            md.reset()
            md.update(hexBuf)
            val d = md.digest()
            val out = new Array[Char](32)
            var j = 0
            while (j < 16) {
              out(2 * j) = HEXL((d(j) >> 4) & 0xf)
              out(2 * j + 1) = HEXL(d(j) & 0xf)
              j += 1
            }
            // ----------------------------------------------------------------
            (id, f.toLong, new String(out), f * 40L)
          }
        }
      }
      .toDF(idCol, "frame_idx", "frame_md5", "ts_ms")
  }
}
