package graft.sources

import java.nio.{ByteBuffer, ByteOrder}

/** Minimal FlatGeobuf writer — fixture scaffolding for the native reader's
  * specs and oracle queries (the reference surface is `st_read`, i.e. READ;
  * this writer exists so the byte-level wire format is exercised from an
  * independent code path rather than the reader round-tripping its own
  * parse state). Emits spec-v3 files: magic bytes, size-prefixed Header
  * flatbuffer (explicit index_node_size=0 — no Hilbert index), then
  * size-prefixed Feature flatbuffers.
  *
  * The embedded [[FbBuilder]] is the standard back-to-front FlatBuffers
  * construction (create leaves first, tables last, root uoffset at the
  * front) implemented directly from the published wire format — the same
  * ~80 lines a codegen runtime would hide.
  *
  * CAVEAT — no FlatBuffers alignment: the builder performs no element
  * padding, so double vectors, u64 scalars and vector length prefixes land
  * unaligned. The emitted files are guaranteed readable by THIS repo's
  * reader (which uses unaligned little-endian ByteBuffer gets throughout,
  * as the JVM permits on any architecture); a strict conforming FlatBuffers
  * runtime that relies on natural alignment may reject or misread them.
  * That is acceptable for fixture scaffolding — the write surface users
  * consume is COPY TO (parquet/delta/iceberg/...), not fgb. */
object FlatGeobufWriter {

  /** Geometry payload: spec GeometryType id, flat xy pairs, optional part
    * end-indices (vertex counts, exclusive), nested parts (MultiPolygon). */
  case class FgbGeom(typ: Int, xy: Array[Double], ends: Seq[Int] = Nil,
      parts: Seq[FgbGeom] = Nil)

  /** columns: (name, ColumnType id). Row values align with columns; null
    * skips the property (the spec's absent-column encoding). */
  def write(path: java.io.File, name: String, geometryType: Int,
      columns: Seq[(String, Int)], rows: Seq[(Seq[Any], FgbGeom)]): Unit = {
    val out = new java.io.BufferedOutputStream(new java.io.FileOutputStream(path))
    try {
      out.write(Array[Byte](0x66, 0x67, 0x62, 0x03, 0x66, 0x67, 0x62, 0x01))
      writePrefixed(out, header(name, geometryType, columns, rows.length))
      rows.foreach { case (vals, geom) =>
        writePrefixed(out, feature(vals, geom, columns))
      }
    } finally out.close()
  }

  private def writePrefixed(out: java.io.OutputStream, fb: Array[Byte]): Unit = {
    val len = ByteBuffer.allocate(4).order(ByteOrder.LITTLE_ENDIAN)
      .putInt(fb.length).array()
    out.write(len); out.write(fb)
  }

  private def header(name: String, geometryType: Int,
      columns: Seq[(String, Int)], n: Int): Array[Byte] = {
    val b = new FbBuilder
    val colOffs = columns.map { case (cn, ct) =>
      val nameOff = b.createString(cn)
      b.table(Seq(
        0 -> FbBuilder.Ref(nameOff),
        1 -> FbBuilder.U8(ct)))
    }
    val colsVec = b.createOffsetVector(colOffs)
    val nameOff = b.createString(name)
    val root = b.table(Seq(
      0 -> FbBuilder.Ref(nameOff),
      2 -> FbBuilder.U8(geometryType),
      7 -> FbBuilder.Ref(colsVec),
      8 -> FbBuilder.U64(n.toLong),
      9 -> FbBuilder.U16(0))) // explicit: no index (default is 16)
    b.finish(root)
  }

  private def feature(vals: Seq[Any], geom: FgbGeom,
      columns: Seq[(String, Int)]): Array[Byte] = {
    val b = new FbBuilder
    val geomOff = geometryTable(b, geom)
    val propsOff = b.createByteVector(propertiesBlob(vals, columns))
    val root = b.table(Seq(
      0 -> FbBuilder.Ref(geomOff),
      1 -> FbBuilder.Ref(propsOff)))
    b.finish(root)
  }

  private def geometryTable(b: FbBuilder, g: FgbGeom): Int = {
    val partOffs = g.parts.map(p => geometryTable(b, p))
    val partsVec = if (partOffs.isEmpty) -1 else b.createOffsetVector(partOffs)
    val endsVec = if (g.ends.isEmpty) -1 else b.createIntVector(g.ends)
    val xyVec = if (g.xy.isEmpty) -1 else b.createDoubleVector(g.xy)
    val fields = Seq.newBuilder[(Int, FbBuilder.Field)]
    if (endsVec >= 0) fields += (0 -> FbBuilder.Ref(endsVec))
    if (xyVec >= 0) fields += (1 -> FbBuilder.Ref(xyVec))
    fields += (6 -> FbBuilder.U8(g.typ))
    if (partsVec >= 0) fields += (7 -> FbBuilder.Ref(partsVec))
    b.table(fields.result())
  }

  private def propertiesBlob(vals: Seq[Any], columns: Seq[(String, Int)]): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    def le(n: Int, width: Int): Unit = {
      val b = ByteBuffer.allocate(width).order(ByteOrder.LITTLE_ENDIAN)
      width match { case 2 => b.putShort(n.toShort); case 4 => b.putInt(n) }
      bos.write(b.array())
    }
    vals.zipWithIndex.foreach { case (v, i) =>
      if (v != null) {
        le(i, 2)
        val (_, ct) = columns(i)
        ct match {
          case 0 => bos.write(v.asInstanceOf[Int].toByte & 0xff) // Byte
          case 1 => bos.write(v.asInstanceOf[Int] & 0xff) // UByte
          case 3 => le(v.asInstanceOf[Int].toShort & 0xffff, 2) // Short
          case 2 => bos.write(if (v.asInstanceOf[Boolean]) 1 else 0)
          case 4 => le(v.asInstanceOf[Int] & 0xffff, 2) // UShort
          case 5 => le(v.asInstanceOf[Int], 4)
          case 7 => bos.write(ByteBuffer.allocate(8).order(ByteOrder.LITTLE_ENDIAN)
            .putLong(v.asInstanceOf[Long]).array())
          case 10 => bos.write(ByteBuffer.allocate(8).order(ByteOrder.LITTLE_ENDIAN)
            .putDouble(v.asInstanceOf[Double]).array())
          case 11 | 13 =>
            val bytes = v.toString.getBytes(java.nio.charset.StandardCharsets.UTF_8)
            le(bytes.length, 4); bos.write(bytes)
          case other => throw new IllegalArgumentException(
            s"FlatGeobufWriter: ColumnType $other not in this fixture writer's scope")
        }
      }
    }
    bos.toByteArray
  }
}

/** Back-to-front FlatBuffers builder: leaves (strings/vectors) first,
  * tables after their referents, root last; every reference is stored as
  * the spec's relative uoffset/soffset. Offsets are tracked as
  * bytes-from-buffer-END so no absolute math is needed until finish(). */
final class FbBuilder {
  private var buf = new Array[Byte](1024)
  private var space = buf.length

  private def ensure(n: Int): Unit =
    while (space < n) {
      val nb = new Array[Byte](buf.length * 2)
      System.arraycopy(buf, 0, nb, buf.length, buf.length)
      space += buf.length
      buf = nb
    }
  private def offset: Int = buf.length - space
  private def push(bytes: Array[Byte]): Unit = {
    ensure(bytes.length)
    space -= bytes.length
    System.arraycopy(bytes, 0, buf, space, bytes.length)
  }
  private def pushInt(v: Int): Unit =
    push(ByteBuffer.allocate(4).order(ByteOrder.LITTLE_ENDIAN).putInt(v).array())
  private def pushShort(v: Int): Unit =
    push(ByteBuffer.allocate(2).order(ByteOrder.LITTLE_ENDIAN).putShort(v.toShort).array())

  /** string = int32 length + utf8 bytes + NUL terminator. */
  def createString(s: String): Int = {
    val bytes = s.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    push(Array[Byte](0))
    push(bytes)
    pushInt(bytes.length)
    offset
  }
  def createByteVector(bytes: Array[Byte]): Int = {
    push(bytes); pushInt(bytes.length); offset
  }
  def createDoubleVector(ds: Array[Double]): Int = {
    ds.reverseIterator.foreach(d =>
      push(ByteBuffer.allocate(8).order(ByteOrder.LITTLE_ENDIAN).putDouble(d).array()))
    pushInt(ds.length); offset
  }
  def createIntVector(is: Seq[Int]): Int = {
    is.reverseIterator.foreach(pushInt); pushInt(is.length); offset
  }
  /** vector of uoffsets to already-created items (tables/strings). */
  def createOffsetVector(offs: Seq[Int]): Int = {
    offs.reverseIterator.foreach { target =>
      ensure(4); space -= 4
      val slotOff = buf.length - space
      ByteBuffer.wrap(buf, space, 4).order(ByteOrder.LITTLE_ENDIAN)
        .putInt(slotOff - target)
    }
    pushInt(offs.length); offset
  }

  /** table from (fieldId → field) pairs; referents must exist already. */
  def table(fields: Seq[(Int, FbBuilder.Field)]): Int = {
    val tableEnd = offset
    val fieldOffs = scala.collection.mutable.Map[Int, Int]()
    // inline data, written in reverse id order (any order is legal)
    fields.sortBy(-_._1).foreach { case (id, f) =>
      f match {
        case FbBuilder.U8(v) => push(Array((v & 0xff).toByte))
        case FbBuilder.U16(v) => pushShort(v)
        case FbBuilder.U64(v) =>
          push(ByteBuffer.allocate(8).order(ByteOrder.LITTLE_ENDIAN).putLong(v).array())
        case FbBuilder.Ref(target) =>
          ensure(4); space -= 4
          val fieldOff = buf.length - space
          ByteBuffer.wrap(buf, space, 4).order(ByteOrder.LITTLE_ENDIAN)
            .putInt(fieldOff - target)
      }
      fieldOffs(id) = offset
    }
    pushInt(0) // soffset placeholder
    val tableOff = offset
    // vtable
    val maxId = fields.map(_._1).max
    val vtSize = 4 + 2 * (maxId + 1)
    (maxId to 0 by -1).foreach { id =>
      pushShort(fieldOffs.get(id).map(tableOff - _).getOrElse(0))
    }
    pushShort(tableOff - tableEnd) // table byte size incl soffset
    pushShort(vtSize)
    val vtOff = offset
    // patch soffset: vtable_pos = table_pos - soffset → soffset = vt - table
    ByteBuffer.wrap(buf, buf.length - tableOff, 4).order(ByteOrder.LITTLE_ENDIAN)
      .putInt(vtOff - tableOff)
    tableOff
  }

  /** root uoffset + trim. */
  def finish(rootTable: Int): Array[Byte] = {
    pushInt(0) // placeholder so `offset` includes the root slot
    val rootSlotOff = offset
    ByteBuffer.wrap(buf, space, 4).order(ByteOrder.LITTLE_ENDIAN)
      .putInt(rootSlotOff - rootTable)
    java.util.Arrays.copyOfRange(buf, space, buf.length)
  }
}

object FbBuilder {
  sealed trait Field
  case class U8(v: Int) extends Field
  case class U16(v: Int) extends Field
  case class U64(v: Long) extends Field
  case class Ref(target: Int) extends Field
}
