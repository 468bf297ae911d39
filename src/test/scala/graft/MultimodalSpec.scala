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

  test("resizeStub: bounded output, magic preserved, partition-local") {
    import spark.implicits._
    val big = Array.tabulate(5000)(_.toByte)
    val png = unhexBytes("89504E470D0A1A0A") ++ big
    val in = Seq(1L -> png, 2L -> Array[Byte](1, 2, 3)).toDF("id", "payload").repartition(2)
    val out = Multimodal.resizeStub(in, "payload", "id", targetBytes = 256)
    val rows = out.collect().map(r => r.getLong(0) -> r.getAs[Array[Byte]](1)).toMap
    assert(rows(1L).length <= 256)
    assert(rows(1L).take(8).toSeq === unhexBytes("89504E470D0A1A0A").toSeq) // magic survives
    assert(rows(2L).toSeq === Seq[Byte](1, 2, 3)) // already under budget: untouched
    assert(out.rdd.getNumPartitions === 2) // no shuffle
    // deterministic
    val again = Multimodal.resizeStub(in, "payload", "id", targetBytes = 256)
      .collect().map(r => r.getLong(0) -> r.getAs[Array[Byte]](1).toSeq).toMap
    assert(again(1L) === rows(1L).toSeq)
  }

  private def unhexBytes(h: String): Array[Byte] =
    h.grouped(2).map(s => Integer.parseInt(s, 16).toByte).toArray

  test("decodeImageStub: real plumbing, deterministic fake decode") {
    val in = payloads.repartition(3)
    val out = Multimodal.decodeImageStub(in, "payload", "id", dim = 4)
    assert(out.columns.toSeq === Seq("id", "width", "height", "features"))
    assert(out.count() === 7)
    // no shuffle: decode is partition-local
    assert(out.rdd.getNumPartitions === 3)
    val f1 = out.filter(col("id") === 1L).head()
    val f2 = Multimodal.decodeImageStub(in, "payload", "id", dim = 4)
      .filter(col("id") === 1L).head()
    assert(f1.getSeq[Float](3) === f2.getSeq[Float](3)) // deterministic
    assert(f1.getInt(1) === 16 % 640)
  }
}
