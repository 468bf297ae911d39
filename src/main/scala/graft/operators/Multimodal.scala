package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Multimodal columns: image/audio/video payloads ride as opaque `binary`
  * columns next to typed metadata (BASELINE.json north star; the reference
  * stops at BLOB→TEXT passthrough, src/schema/cell.rs:691-712 — this is the
  * beyond-reference training-pipeline surface).
  *
  * Design for 100 TB: every helper here is a pure Column expression over a
  * bounded byte PREFIX of the payload (magic sniffing hexes 12 bytes, never
  * the blob), so scans stay in whole-stage codegen and projection pruning
  * can drop the payload column entirely when only metadata is queried.
  * Decoding is the only per-row imperative step and is isolated behind
  * `decodeImageStub` (mapPartitions), which this container cannot back with
  * a real codec — the Spark-side plumbing (schema, batching, partitioning)
  * is real and tested; the pixel decode is a clearly-marked deterministic
  * fake.
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

  /** Decode layer — STUB. This container ships no image/audio codecs
    * (no javax.imageio plugins beyond JDK defaults, no ffmpeg), so the pixel
    * decode below is a DETERMINISTIC FAKE (dimensions and features derived
    * arithmetically from the payload bytes). Replace the marked block with a
    * real decoder to productionize; everything around it — the typed
    * mapPartitions pipeline, fixed output schema, per-partition batching,
    * no shuffle — is the real 100 TB shape: decode cost scales linearly and
    * stays data-local.
    */
  def decodeImageStub(df: DataFrame, payloadCol: String, idCol: String, dim: Int = 8): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(payloadCol))
      .as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        rows.map { case (id, bytes) =>
          // --- STUB: real `decode(bytes)` goes here -----------------------
          val n = if (bytes == null) 0 else bytes.length
          val width = n % 640
          val height = (n * 7) % 480
          val features = Array.tabulate(dim) { i =>
            if (n == 0) 0f else (bytes(i % n) & 0xff).toFloat / 255f
          }
          // ----------------------------------------------------------------
          (id, width, height, features)
        }
      }
      .toDF(idCol, "width", "height", "features")
  }

  /** Resize — the payload-transform decode shape (image → smaller image).
    * STUB: with no codec in-container the "resize" deterministically
    * subsamples the payload bytes to a `targetBytes` budget (every k-th
    * byte) after the 12-byte header, preserving the magic prefix so the
    * sniffer still classifies the output. The plumbing is the real shape:
    * partition-local mapPartitions, binary in → binary out + new size, no
    * shuffle, linear cost. */
  def resizeStub(df: DataFrame, payloadCol: String, idCol: String,
      targetBytes: Int = 1024): DataFrame = {
    require(targetBytes > 16)
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(payloadCol))
      .as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        rows.map { case (id, bytes) =>
          // --- STUB: real decode → scale → re-encode goes here ------------
          val out =
            if (bytes == null) null
            else if (bytes.length <= targetBytes) bytes
            else {
              val header = bytes.take(12)
              val body = bytes.drop(12)
              val budget = targetBytes - header.length
              val step = math.max(1, body.length / budget)
              header ++ body.indices.collect { case i if i % step == 0 => body(i) }
                .take(budget)
            }
          // ----------------------------------------------------------------
          (id, out, if (out == null) 0 else out.length)
        }
      }
      .toDF(idCol, "payload", "size_bytes")
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
