package graft

import graft.operators.Multimodal
import org.apache.spark.sql.functions._

class MultimodalSpec extends SparkSpec {

  private def payloads = {
    import spark.implicits._
    Seq(
      1L -> "89504E470D0A1A0A0000000D49484452", // png
      2L -> "FFD8FFE000104A464946",             // jpeg
      3L -> "474946383961AABB",                 // gif
      4L -> "52494646AAAAAAAA57415645",         // riff/wave
      5L -> "52494646AAAAAAAA41564920",         // riff/avi
      6L -> "255044462D312E34",                 // %PDF-1.4
      7L -> "0001020304"                        // unknown
    ).toDF("id", "hx").select(col("id"), unhex(col("hx")).as("payload"))
  }

  test("sniffMime classifies by magic bytes, prefix-only") {
    val got = payloads.select(col("id"), Multimodal.sniffMime(col("payload")).as("m"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got === Map(
      1L -> "image/png", 2L -> "image/jpeg", 3L -> "image/gif",
      4L -> "audio/wav", 5L -> "video/avi", 6L -> "application/pdf",
      7L -> "application/octet-stream"))
  }

  test("isValid cross-checks declared mime against sniffed container") {
    val df = payloads.withColumn("declared",
      when(col("id") === 1L, "image/png").otherwise("image/jpeg"))
    val got = df.select(col("id"), Multimodal.isValid(col("payload"), col("declared")))
      .collect().map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    assert(got(1L) && got(2L) && !got(3L))
  }

  test("size and hash are metadata-cheap column exprs") {
    val row = payloads.filter(col("id") === 1L)
      .select(Multimodal.sizeBytes(col("payload")), Multimodal.contentHash(col("payload")))
      .head()
    assert(row.getLong(0) === 16L)
    assert(row.getString(1).matches("[0-9a-f]{32}"))
  }

  test("frameSampleStub: one-to-many flatMap, partial frames dropped, no shuffle") {
    import spark.implicits._
    // 3 payloads: 10 bytes (2 frames of 4 + partial), 4 bytes (1 frame),
    // 3 bytes (0 frames)
    val in = Seq(
      1L -> Array.tabulate(10)(_.toByte),
      2L -> Array.tabulate(4)(i => (i + 50).toByte),
      3L -> Array.tabulate(3)(_.toByte)
    ).toDF("id", "payload").repartition(2)
    val out = Multimodal.frameSampleStub(in, "payload", "id", frameBytes = 4)
    assert(out.columns.toSeq === Seq("id", "frame_idx", "frame_md5", "ts_ms"))
    val rows = out.collect()
    assert(rows.count(_.getLong(0) == 1L) === 2) // trailing 2 bytes dropped
    assert(rows.count(_.getLong(0) == 2L) === 1)
    assert(rows.count(_.getLong(0) == 3L) === 0)
    // 25 fps stride and deterministic hash
    val f = rows.filter(r => r.getLong(0) == 1L && r.getLong(1) == 1L).head
    assert(f.getLong(3) === 40L)
    assert(f.getString(2).matches("[0-9a-f]{32}"))
    // partition-local: the explode does not shuffle
    assert(out.rdd.getNumPartitions === 2)
  }

  private def unhexBytes(h: String): Array[Byte] =
    h.grouped(2).map(s => Integer.parseInt(s, 16).toByte).toArray

  // ------------------------------------------------------------ real codec

  test("encodePngGray round-trips byte-for-byte through ImageIO") {
    // a known 4×4 image: every sample distinct
    val samples = Array(
      Array(0, 10, 20, 30), Array(40, 50, 60, 70),
      Array(80, 90, 100, 110), Array(120, 130, 255, 7))
    val png = Multimodal.encodePngGray(4, 4, (x, y) => samples(y)(x))
    assert(png.take(8).toSeq === unhexBytes("89504E470D0A1A0A").toSeq) // real PNG container
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(png))
    assert(img.getWidth === 4 && img.getHeight === 4)
    assert(img.getRaster.getNumBands === 1)
    for (y <- 0 until 4; x <- 0 until 4)
      assert(img.getRaster.getSample(x, y, 0) === samples(y)(x),
        s"decoded sample ($x,$y) differs")
  }

  test("decodeImage: true dims + exact pixel sum; garbage degrades, never throws") {
    import spark.implicits._
    val png = Multimodal.encodePngGray(6, 3, (x, y) => x * 40 + y * 3)
    val expectedSum = (for (y <- 0 until 3; x <- 0 until 6) yield x * 40 + y * 3).sum.toLong
    val fakePng = unhexBytes("89504E470D0A1A0A") ++ "not really pixels".getBytes("UTF-8")
    val in = Seq(1L -> png, 2L -> fakePng, 3L -> null.asInstanceOf[Array[Byte]])
      .toDF("id", "payload").repartition(2)
    val out = Multimodal.decodeImage(in, "payload", "id")
    assert(out.columns.toSeq === Seq("id", "width", "height", "channels", "pix_sum", "decode_ok"))
    assert(out.rdd.getNumPartitions === 2) // partition-local: no shuffle
    val rows = out.collect().map(r => r.getLong(0) -> r).toMap
    assert(rows(1L).getLong(1) === 6L && rows(1L).getLong(2) === 3L)
    assert(rows(1L).getLong(3) === 1L)
    assert(rows(1L).getLong(4) === expectedSum)
    assert(rows(1L).getBoolean(5))
    // magic-correct but undecodable: sniffers pass it, the decoder must not
    assert(!rows(2L).getBoolean(5) && rows(2L).isNullAt(1))
    assert(!rows(3L).getBoolean(5))
  }

  test("decodeImage handles JPEG and BMP containers from ImageIO encoders") {
    import spark.implicits._
    val src = new java.awt.image.BufferedImage(10, 8, java.awt.image.BufferedImage.TYPE_3BYTE_BGR)
    for (y <- 0 until 8; x <- 0 until 10; b <- 0 until 3)
      src.getRaster.setSample(x, y, b, (x * 9 + y * 5 + b * 77) % 256)
    def enc(fmt: String) = {
      val bos = new java.io.ByteArrayOutputStream()
      assert(javax.imageio.ImageIO.write(src, fmt, bos), s"no $fmt writer in JDK")
      bos.toByteArray
    }
    val in = Seq(1L -> enc("jpg"), 2L -> enc("bmp")).toDF("id", "payload")
    val rows = Multimodal.decodeImage(in, "payload", "id")
      .collect().map(r => r.getLong(0) -> r).toMap
    for (id <- Seq(1L, 2L)) {
      assert(rows(id).getBoolean(5), s"decode_ok for $id")
      assert(rows(id).getLong(1) === 10L && rows(id).getLong(2) === 8L)
      assert(rows(id).getLong(3) === 3L)
    }
    // BMP is lossless: exact pixel sum; JPEG is lossy: sum only bounded
    val exact = (for (y <- 0 until 8; x <- 0 until 10; b <- 0 until 3)
      yield (x * 9 + y * 5 + b * 77) % 256).sum.toLong
    assert(rows(2L).getLong(4) === exact)
    assert(math.abs(rows(1L).getLong(4) - exact) < exact / 2)
  }

  test("decodeImage expands palette (GIF) images to component rasters") {
    import spark.implicits._
    // an 8×8 two-color INDEXED checkerboard through the JDK GIF writer
    // (8×8 because the JDK's GIF LZW path mis-packs 1-bit rows at
    // non-multiple-of-8 widths — probed; PNG is exact everywhere); the
    // decoder must expand palette indices to real RGB bands, never sum
    // raw palette indices
    val icm = new java.awt.image.IndexColorModel(8, 2,
      Array[Byte](0, -1), Array[Byte](0, -1), Array[Byte](0, -1))
    val src = new java.awt.image.BufferedImage(8, 8,
      java.awt.image.BufferedImage.TYPE_BYTE_INDEXED, icm)
    for (y <- 0 until 8; x <- 0 until 8)
      src.getRaster.setSample(x, y, 0, if ((x + y) % 2 == 0) 1 else 0)
    val bos = new java.io.ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(src, "gif", bos), "no gif writer in JDK")
    val in = Seq(1L -> bos.toByteArray).toDF("id", "payload")
    val row = Multimodal.decodeImage(in, "payload", "id").head()
    assert(row.getBoolean(5))
    assert(row.getLong(1) === 8L && row.getLong(2) === 8L)
    assert(row.getLong(3) === 3L, "palette must expand to 3 component bands")
    // checkerboard: half the 64 pixels are white (255×3), half black
    assert(row.getLong(4) === 32L * 255 * 3)
  }

  test("resizeImage: bilinear half-scale is the exact 2×2 floor-average") {
    import spark.implicits._
    val samples = Array(
      Array(0, 10, 20, 30), Array(40, 50, 60, 70),
      Array(80, 90, 100, 110), Array(120, 130, 255, 7))
    val png = Multimodal.encodePngGray(4, 4, (x, y) => samples(y)(x))
    val in = Seq(1L -> png).toDF("id", "payload")
    val row = Multimodal.resizeImage(in, "payload", "id").head()
    assert(row.getLong(2) === 2L && row.getLong(3) === 2L)
    val expected = Array(
      Array((0 + 10 + 40 + 50) / 4, (20 + 30 + 60 + 70) / 4),
      Array((80 + 90 + 120 + 130) / 4, (100 + 110 + 255 + 7) / 4))
    assert(row.getLong(4) === expected.flatten.sum.toLong)
    // the emitted payload is a REAL PNG holding exactly those pixels
    val outPng = row.getAs[Array[Byte]](1)
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(outPng))
    assert(img.getWidth === 2 && img.getHeight === 2)
    for (y <- 0 until 2; x <- 0 until 2)
      assert(img.getRaster.getSample(x, y, 0) === expected(y)(x),
        s"resized pixel ($x,$y)")
  }

  test("resizeImage: odd trailing row/col dropped; failures yield decode_ok=false") {
    import spark.implicits._
    val png53 = Multimodal.encodePngGray(5, 3, (x, y) => x + y)
    val in = Seq(1L -> png53, 2L -> "garbage".getBytes("UTF-8")).toDF("id", "payload")
    val rows = Multimodal.resizeImage(in, "payload", "id")
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(rows(1L).getLong(2) === 2L && rows(1L).getLong(3) === 1L)
    assert(!rows(2L).getBoolean(5) && rows(2L).isNullAt(1))
  }

  test("aviFrames: real RIFF walk — hdrl skipped, padding honored, wb/db frames kept") {
    import spark.implicits._
    // hand-assembled per the public RIFF/AVI grammar, NOT via buildAvi — the
    // parser is tested against the format: an hdrl LIST before movi, an
    // odd-sized frame (pad byte), an audio '01wb' frame, and a non-frame
    // JUNK chunk inside movi
    val bos = new java.io.ByteArrayOutputStream()
    def w4(s: String) = bos.write(s.getBytes("US-ASCII"))
    def wle(v: Int) = (0 until 4).foreach(i => bos.write((v >> (8 * i)) & 0xff))
    w4("RIFF"); wle(86); w4("AVI ")
    w4("LIST"); wle(16); w4("hdrl"); w4("avih"); wle(4); bos.write(Array[Byte](0, 0, 0, 0))
    w4("LIST"); wle(50); w4("movi")
    w4("00dc"); wle(5); bos.write(Array[Byte](1, 2, 3, 4, 5)); bos.write(0) // pad
    w4("01wb"); wle(4); bos.write(Array[Byte](9, 9, 9, 9))
    w4("JUNK"); wle(2); bos.write(Array[Byte](0, 0))
    w4("00db"); wle(2); bos.write(Array[Byte](7, 8))
    val avi = bos.toByteArray
    assert(avi.length === 94)
    val in = Seq(1L -> avi, 2L -> "not an avi at all".getBytes("UTF-8"),
      3L -> avi.take(62)).toDF("id", "payload").repartition(2)
    val out = Multimodal.aviFrames(in, "payload", "id")
    assert(out.columns.toSeq ===
      Seq("id", "frame_idx", "stream", "offset", "size_bytes", "frame_md5"))
    assert(out.rdd.getNumPartitions === 2) // demux is partition-local
    val rows = out.collect().groupBy(_.getLong(0))
    val f1 = rows(1L).sortBy(_.getLong(1))
    assert(f1.map(r => (r.getLong(1), r.getString(2), r.getLong(3), r.getLong(4))).toSeq
      === Seq((0L, "00", 56L, 5L), (1L, "01", 70L, 4L), (2L, "00", 92L, 2L)))
    def hexMd5(bs: Array[Byte]): String = {
      val hex = bs.map(b => f"${b & 0xff}%02X").mkString
      java.security.MessageDigest.getInstance("MD5")
        .digest(hex.getBytes("US-ASCII")).map(b => f"${b & 0xff}%02x").mkString
    }
    assert(f1(0).getString(5) === hexMd5(Array[Byte](1, 2, 3, 4, 5)))
    assert(f1(2).getString(5) === hexMd5(Array[Byte](7, 8)))
    assert(!rows.contains(2L)) // non-AVI: zero frames, no exception
    // truncated mid-movi: the complete leading frames survive
    assert(rows(3L).map(_.getLong(1)).toSeq.sorted === Seq(0L))
    // interleaved layout: frames grouped under `LIST rec ` inside movi
    // (the CD-ROM interleave) must still be found
    val bos2 = new java.io.ByteArrayOutputStream()
    def w4b(s: String) = bos2.write(s.getBytes("US-ASCII"))
    def wle2(v: Int) = (0 until 4).foreach(i => bos2.write((v >> (8 * i)) & 0xff))
    w4b("RIFF"); wle2(50); w4b("AVI ")
    w4b("LIST"); wle2(38); w4b("movi")
    w4b("LIST"); wle2(14); w4b("rec ")   // nested rec list holds one frame
    w4b("00dc"); wle2(2); bos2.write(Array[Byte](1, 2))
    w4b("00dc"); wle2(4); bos2.write(Array[Byte](3, 4, 5, 6)) // sibling after the rec list
    val recAvi = bos2.toByteArray
    val recRows = Multimodal.aviFrames(
      Seq(9L -> recAvi).toDF("id", "payload"), "payload", "id")
      .collect().sortBy(_.getLong(1))
    assert(recRows.map(r => (r.getLong(1), r.getLong(3), r.getLong(4))).toSeq
      === Seq((0L, 44L, 2L), (1L, 54L, 4L)))
    // and the deterministic fixture round-trips through its own builder
    val fx = Seq(5L -> Multimodal.fixtureAvi(5L)).toDF("id", "payload")
    val fxRows = Multimodal.aviFrames(fx, "payload", "id").collect()
    assert(fxRows.length === Multimodal.fixtureAviFrameCount(5L))
    assert(fxRows.map(_.getLong(4)).sorted.toSeq
      === (0 until 3).map(k => Multimodal.fixtureAviFrameSize(k).toLong).sorted)
  }

  test("pixel bomb rejected from the HEADER, before any raster allocation") {
    import spark.implicits._
    // a real tiny PNG whose IHDR is patched to declare a 60000×60000 canvas
    // (3.6 Gpx ≈ 10+ GB raster) with the chunk CRC recomputed so the reader
    // trusts the header; the guard must refuse before decoding
    val png = Multimodal.encodePngGray(4, 4, (x, y) => x + y)
    def be(i: Int) = Array[Byte]((i >>> 24).toByte, (i >>> 16).toByte, (i >>> 8).toByte, i.toByte)
    val bombed = png.clone()
    System.arraycopy(be(60000), 0, bombed, 16, 4) // IHDR width
    System.arraycopy(be(60000), 0, bombed, 20, 4) // IHDR height
    val crc = new java.util.zip.CRC32()
    crc.update(bombed, 12, 17) // chunk type "IHDR" + 13 data bytes
    System.arraycopy(be(crc.getValue.toInt), 0, bombed, 29, 4)
    val in = Seq(1L -> bombed).toDF("id", "payload")
    val t0 = System.nanoTime()
    val row = Multimodal.decodeImage(in, "payload", "id").head()
    assert(!row.getBoolean(5) && row.isNullAt(1))
    assert((System.nanoTime() - t0) < 30e9, "bomb guard must not attempt the decode")
  }

  test("wavFeatures: exact PCM math; non-PCM and truncation degrade to rows") {
    import spark.implicits._
    val good = Multimodal.fixtureWav(10L)
    val nonPcm = good.clone(); nonPcm(20) = 3 // fmt audioFormat → IEEE float
    val truncated = java.util.Arrays.copyOf(good, good.length - 5)
    val in = Seq((1L, good), (2L, nonPcm), (3L, truncated), (4L, "nope".getBytes))
      .toDF("id", "payload")
    val rows = Multimodal.wavFeatures(in, "payload", "id")
      .orderBy("id").collect()
    // exact replay of the fixture arithmetic, independent of the parser
    val n = Multimodal.fixtureWavSampleCount(10L)
    val samples = (0 until n).map(i => (((10L * 31 + i * 17) % 65536) - 32768).toInt)
    assert(rows(0).getBoolean(6))
    assert(rows(0).getLong(1) === 1L && rows(0).getLong(2) === 8000L)
    assert(rows(0).getLong(3) === n.toLong)
    assert(rows(0).getLong(4) === samples.map(math.abs).max.toLong)
    assert(rows(0).getLong(5) === samples.map(s => s.toLong * s).sum)
    // degraded payloads are rows with decode_ok=false, never exceptions
    Seq(1, 2, 3).foreach { i =>
      assert(!rows(i).getBoolean(6) && rows(i).isNullAt(3), s"row $i")
    }
  }

  test("fixturePng family: decoded geometry matches the closed-form oracle") {
    for (id <- Seq(0L, 7L, 123L, 499L)) {
      val img = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(Multimodal.fixturePng(id)))
      assert(img.getWidth === Multimodal.fixtureWidth(id))
      assert(img.getHeight === Multimodal.fixtureHeight(id))
      for (y <- 0 until img.getHeight; x <- 0 until img.getWidth)
        assert(img.getRaster.getSample(x, y, 0) === Multimodal.fixtureSample(id)(x, y))
    }
  }
}
