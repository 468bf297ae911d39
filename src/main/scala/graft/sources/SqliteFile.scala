package graft.sources

import java.nio.{ByteBuffer, ByteOrder}
import java.nio.charset.StandardCharsets

import scala.collection.mutable.ArrayBuffer

/** Minimal SQLite 3 database-file codec — the container format of
  * GeoPackage. Built from the PUBLIC file-format document
  * (sqlite.org/fileformat2.html); no SQLite library exists in this
  * container, and the reference reaches `.gpkg` through GDAL's driver
  * surface (src/duckdb/spatial.rs:29-82), so — like the Delta/Iceberg log
  * readers — the container is parsed natively.
  *
  * Read side: full table b-tree traversal (interior + leaf pages, overflow
  * chains, all nine serial-type families, rowid-alias columns). Write side:
  * a deliberately small subset — rowid tables only, one interior level,
  * UTF-8 — enough to emit a spec-valid GeoPackage; anything beyond the
  * subset rejects loudly rather than writing a file other readers would
  * misparse.
  *
  * Scale shape: one SQLite file is one task's work (the format is a single
  * serially-paged file; there is no record-level split point without an
  * index), so parallelism comes from many files — same contract as the
  * Shapefile reader. All parsing runs wherever the bytes already are.
  */
object SqliteFile {

  final case class SqliteException(msg: String) extends IllegalArgumentException(msg)

  val Magic: Array[Byte] = "SQLite format 3".getBytes(StandardCharsets.US_ASCII) :+ 0.toByte

  /** A decoded database: page geometry plus the sqlite_master catalog. */
  final case class Db(bytes: Array[Byte], pageSize: Int, usable: Int,
      master: Seq[MasterRow])

  /** One sqlite_master row (type, name, tbl_name, rootpage, sql). */
  final case class MasterRow(typ: String, name: String, tblName: String,
      rootPage: Int, sql: String)

  // ------------------------------------------------------------------ read

  def open(bytes: Array[Byte]): Db = {
    if (bytes.length < 512 || !bytes.take(16).sameElements(Magic))
      throw SqliteException("not a SQLite 3 database (bad magic)")
    val pageSize = {
      val raw = ((bytes(16) & 0xff) << 8) | (bytes(17) & 0xff)
      if (raw == 1) 65536 else raw
    }
    if (pageSize < 512 || (pageSize & (pageSize - 1)) != 0)
      throw SqliteException(s"invalid page size $pageSize")
    // read version 2 = WAL journal; frames in the -wal file supersede the
    // main file, so parsing just the main file would serve stale/torn data
    if ((bytes(19) & 0xff) > 1)
      throw SqliteException("database uses WAL journal mode; checkpoint it " +
        "first (the native reader parses the main file only)")
    val reserved = bytes(20) & 0xff
    val enc = be32(bytes, 56)
    if (enc != 1)
      throw SqliteException(s"text encoding $enc unsupported (UTF-8 only)")
    val usable = pageSize - reserved
    val db0 = Db(bytes, pageSize, usable, Nil)
    val master = tableRows(db0, 1).map { case (_, vals) =>
      MasterRow(
        str(vals, 0, "sqlite_master.type"),
        str(vals, 1, "sqlite_master.name"),
        str(vals, 2, "sqlite_master.tbl_name"),
        num(vals, 3, "sqlite_master.rootpage").toInt,
        Option(vals(4)).map(_.toString).getOrElse(""))
    }
    db0.copy(master = master)
  }

  private def str(vals: Array[Any], i: Int, what: String): String = vals(i) match {
    case s: String => s
    case other => throw SqliteException(s"$what: expected text, got $other")
  }
  private def num(vals: Array[Any], i: Int, what: String): Long = vals(i) match {
    case l: Long => l
    case other => throw SqliteException(s"$what: expected integer, got $other")
  }

  /** All (rowid, values) of the table b-tree rooted at `root`, in rowid
    * order. Values use: null, java.lang.Long, java.lang.Double, String,
    * Array[Byte]. */
  def tableRows(db: Db, root: Int): Seq[(Long, Array[Any])] = {
    val out = ArrayBuffer.empty[(Long, Array[Any])]
    walk(db, root, out, depth = 0)
    out.toSeq
  }

  private def pageOff(db: Db, page: Int): Int = {
    val off = (page.toLong - 1) * db.pageSize
    if (page < 1 || off + db.pageSize > db.bytes.length)
      throw SqliteException(s"page $page out of range")
    off.toInt
  }

  private def walk(db: Db, page: Int, out: ArrayBuffer[(Long, Array[Any])],
      depth: Int): Unit = {
    if (depth > 40) throw SqliteException("b-tree deeper than 40 levels — cyclic page graph")
    val base = pageOff(db, page)
    val hdr = base + (if (page == 1) 100 else 0)
    val typ = db.bytes(hdr) & 0xff
    val nCells = be16(db.bytes, hdr + 3)
    typ match {
      case 5 => // interior table page: left-child pointers + right-most
        var i = 0
        while (i < nCells) {
          val cellOff = base + be16(db.bytes, hdr + 12 + 2 * i)
          walk(db, be32(db.bytes, cellOff), out, depth + 1)
          i += 1
        }
        walk(db, be32(db.bytes, hdr + 8), out, depth + 1)
      case 13 => // leaf table page
        var i = 0
        while (i < nCells) {
          val cellOff = base + be16(db.bytes, hdr + 8 + 2 * i)
          out += leafCell(db, cellOff)
          i += 1
        }
      case 2 | 10 =>
        throw SqliteException(s"page $page is an index b-tree page inside a table walk")
      case other =>
        throw SqliteException(s"page $page has unknown b-tree type $other")
    }
  }

  /** Decode one table-leaf cell, following the overflow chain if the
    * payload spills (thresholds per the format doc's X/M/K formulas). */
  private def leafCell(db: Db, cellOff: Int): (Long, Array[Any]) = {
    var p = cellOff
    val (payloadLen, p1) = varint(db.bytes, p); p = p1
    val (rowid, p2) = varint(db.bytes, p); p = p2
    val u = db.usable
    val x = u - 35
    val payload: Array[Byte] =
      if (payloadLen <= x) {
        java.util.Arrays.copyOfRange(db.bytes, p, p + payloadLen.toInt)
      } else {
        val m = ((u - 12) * 32 / 255) - 23
        val k = m + ((payloadLen - m) % (u - 4)).toInt
        val local = if (k <= x) k else m
        val buf = new Array[Byte](payloadLen.toInt)
        System.arraycopy(db.bytes, p, buf, 0, local)
        var filled = local
        var ovf = be32(db.bytes, p + local)
        while (filled < payloadLen) {
          if (ovf == 0) throw SqliteException("overflow chain ends before payload is complete")
          val po = pageOff(db, ovf)
          val take = math.min(u - 4, payloadLen.toInt - filled)
          System.arraycopy(db.bytes, po + 4, buf, filled, take)
          filled += take
          ovf = be32(db.bytes, po)
        }
        buf
      }
    (rowid, record(payload))
  }

  /** Decode a record (header of serial types + body) into values. */
  def record(payload: Array[Byte]): Array[Any] = {
    val (hdrLen, afterHdrLen) = varint(payload, 0)
    var p = afterHdrLen
    val types = ArrayBuffer.empty[Long]
    while (p < hdrLen) {
      val (t, np) = varint(payload, p); types += t; p = np
    }
    var body = hdrLen.toInt
    val out = new Array[Any](types.length)
    var i = 0
    while (i < types.length) {
      val t = types(i)
      t match {
        case 0 => out(i) = null
        case 1 => out(i) = java.lang.Long.valueOf(payload(body).toLong); body += 1
        case 2 => out(i) = java.lang.Long.valueOf(beInt(payload, body, 2)); body += 2
        case 3 => out(i) = java.lang.Long.valueOf(beInt(payload, body, 3)); body += 3
        case 4 => out(i) = java.lang.Long.valueOf(beInt(payload, body, 4)); body += 4
        case 5 => out(i) = java.lang.Long.valueOf(beInt(payload, body, 6)); body += 6
        case 6 => out(i) = java.lang.Long.valueOf(beInt(payload, body, 8)); body += 8
        case 7 =>
          out(i) = java.lang.Double.valueOf(
            java.lang.Double.longBitsToDouble(beInt(payload, body, 8))); body += 8
        case 8 => out(i) = java.lang.Long.valueOf(0L)
        case 9 => out(i) = java.lang.Long.valueOf(1L)
        case 10 | 11 => throw SqliteException(s"reserved serial type $t")
        case n if n >= 12 && n % 2 == 0 =>
          val len = ((n - 12) / 2).toInt
          out(i) = java.util.Arrays.copyOfRange(payload, body, body + len); body += len
        case n =>
          val len = ((n - 13) / 2).toInt
          out(i) = new String(payload, body, len, StandardCharsets.UTF_8); body += len
      }
      i += 1
    }
    out
  }

  private def be16(b: Array[Byte], off: Int): Int =
    ((b(off) & 0xff) << 8) | (b(off + 1) & 0xff)
  private def be32(b: Array[Byte], off: Int): Int =
    ((b(off) & 0xff) << 24) | ((b(off + 1) & 0xff) << 16) |
      ((b(off + 2) & 0xff) << 8) | (b(off + 3) & 0xff)
  /** Big-endian signed integer of `len` bytes (sign-extended). */
  private def beInt(b: Array[Byte], off: Int, len: Int): Long = {
    var v: Long = b(off).toLong // sign-extends
    var i = 1
    while (i < len) { v = (v << 8) | (b(off + i) & 0xffL); i += 1 }
    v
  }

  /** SQLite varint: 1–9 bytes big-endian base-128; byte 9 contributes 8 bits. */
  def varint(b: Array[Byte], off: Int): (Long, Int) = {
    var v = 0L
    var i = 0
    while (i < 8) {
      val x = b(off + i) & 0xff
      v = (v << 7) | (x & 0x7f)
      if ((x & 0x80) == 0) return (v, off + i + 1)
      i += 1
    }
    ((v << 8) | (b(off + 8) & 0xff), off + 9)
  }

  // ----------------------------------------------------------------- write

  /** A table to serialize: `createSql` is recorded verbatim in
    * sqlite_master; `pkAlias` marks the INTEGER-PRIMARY-KEY column whose
    * value is the rowid (stored NULL in the record, per the format);
    * rowids are 1..n in row order. */
  final case class WriteTable(name: String, createSql: String,
      nCols: Int, pkAlias: Option[Int], rows: Seq[Seq[Any]])

  private val PageSize = 4096

  /** Serialize tables into a complete single-file database. `appId` /
    * `userVersion` land in the header (GeoPackage pins both). Supports the
    * write subset documented on the object; larger shapes reject loudly. */
  def write(tables: Seq[WriteTable], appId: Int, userVersion: Int): Array[Byte] = {
    val u = PageSize // no reserved bytes
    val x = u - 35
    // ---- encode every table's leaf cells (payload may spill to overflow)
    final case class Cell(local: Array[Byte], rowid: Long, overflow: Seq[Array[Byte]])
    def encodeCell(rowid: Long, rec: Array[Byte]): Cell = {
      val head = ByteBuffer.allocate(18)
      putVarint(head, rec.length.toLong); putVarint(head, rowid)
      val hb = java.util.Arrays.copyOf(head.array(), head.position())
      if (rec.length <= x) Cell(hb ++ rec, rowid, Nil)
      else {
        val m = ((u - 12) * 32 / 255) - 23
        val k = m + ((rec.length - m) % (u - 4))
        val local = if (k <= x) k else m
        val chunks = rec.drop(local).grouped(u - 4).toSeq
        Cell(hb ++ rec.take(local) ++ new Array[Byte](4), rowid, chunks)
      }
    }
    // ---- pack cells into leaf pages (greedy, in rowid order)
    final case class Leaf(cells: Seq[Cell]) { def maxRowid: Long = cells.last.rowid }
    def packLeaves(cells: Seq[Cell], firstPageHdr: Int): Seq[Leaf] = {
      val leaves = ArrayBuffer.empty[Leaf]
      var cur = ArrayBuffer.empty[Cell]
      var used = 0
      val cap = u - firstPageHdr - 8 // header + cell body + 2B pointer each
      cells.foreach { c =>
        val need = c.local.length + 2
        if (cur.nonEmpty && used + need > (if (leaves.isEmpty) cap else u - 8)) {
          leaves += Leaf(cur.toSeq); cur = ArrayBuffer.empty[Cell]; used = 0
        }
        if (c.local.length + 2 > u - 8 - 8)
          throw SqliteException(s"cell local part ${c.local.length} exceeds one page")
        cur += c; used += need
      }
      if (cur.nonEmpty) leaves += Leaf(cur.toSeq)
      if (leaves.isEmpty) leaves += Leaf(Nil)
      leaves.toSeq
    }
    // ---- page image builders
    val pages = ArrayBuffer.empty[Array[Byte]] // index i = page i+1
    def alloc(): Int = { pages += new Array[Byte](PageSize); pages.length }
    def renderLeaf(pageNo: Int, leaf: Leaf, ovfStarts: Map[(Long, Int), Int]): Unit = {
      val img = pages(pageNo - 1)
      val hdrOff = if (pageNo == 1) 100 else 0
      img(hdrOff) = 13
      putBe16(img, hdrOff + 3, leaf.cells.length)
      var content = PageSize
      var i = leaf.cells.length - 1
      // place cells from the page end backwards; pointer array in cell order
      val offs = new Array[Int](leaf.cells.length)
      while (i >= 0) {
        val c = leaf.cells(i)
        val body = c.local.clone()
        if (c.overflow.nonEmpty)
          putBe32(body, body.length - 4, ovfStarts((c.rowid, pageNo)))
        content -= body.length
        System.arraycopy(body, 0, img, content, body.length)
        offs(i) = content
        i -= 1
      }
      putBe16(img, hdrOff + 5, if (content == 65536) 0 else content)
      leaf.cells.indices.foreach(j => putBe16(img, hdrOff + 8 + 2 * j, offs(j)))
    }
    def renderInterior(pageNo: Int, children: Seq[(Int, Long)], rightmost: Int): Unit = {
      val img = pages(pageNo - 1)
      img(0) = 5
      putBe16(img, 3, children.length)
      putBe32(img, 8, rightmost)
      var content = PageSize
      val offs = new Array[Int](children.length)
      var i = children.length - 1
      while (i >= 0) {
        val (child, key) = children(i)
        val cell = ByteBuffer.allocate(13)
        cell.putInt(child); putVarint(cell, key)
        val body = java.util.Arrays.copyOf(cell.array(), cell.position())
        content -= body.length
        System.arraycopy(body, 0, img, content, body.length)
        offs(i) = content
        i -= 1
      }
      putBe16(img, 5, content)
      children.indices.foreach(j => putBe16(img, 12 + 2 * j, offs(j)))
    }

    // ---- lay out user tables first (pages 2..), then sqlite_master on page 1
    require(pages.isEmpty)
    alloc() // reserve page 1
    final case class Planned(t: WriteTable, root: Int)
    val planned = tables.map { t =>
      val cells = t.rows.zipWithIndex.map { case (row, i) =>
        if (row.length != t.nCols)
          throw SqliteException(s"table ${t.name}: row ${i + 1} has ${row.length} values, declared ${t.nCols}")
        val masked = t.pkAlias.fold(row)(pi => row.updated(pi, null))
        encodeCell(i + 1L, encodeRecord(masked))
      }
      val leaves = packLeaves(cells, firstPageHdr = 8)
      val leafPages = leaves.map(_ => alloc())
      // overflow pages: allocate per spilling cell, chain, remember starts
      val ovfStarts = scala.collection.mutable.Map.empty[(Long, Int), Int]
      leaves.zip(leafPages).foreach { case (leaf, lp) =>
        leaf.cells.filter(_.overflow.nonEmpty).foreach { c =>
          val chain = c.overflow.map(_ => alloc())
          ovfStarts((c.rowid, lp)) = chain.head
          chain.zip(c.overflow).zipWithIndex.foreach { case ((pg, data), ci) =>
            val img = pages(pg - 1)
            putBe32(img, 0, if (ci + 1 < chain.length) chain(ci + 1) else 0)
            System.arraycopy(data, 0, img, 4, data.length)
          }
        }
      }
      val root =
        if (leaves.length == 1) { renderLeaf(leafPages.head, leaves.head, ovfStarts.toMap); leafPages.head }
        else {
          if (leaves.length > (u - 12 - 8) / (4 + 9 + 2))
            throw SqliteException(s"table ${t.name} needs a second interior level " +
              s"(${leaves.length} leaf pages); the write subset stops at one")
          leaves.zip(leafPages).foreach { case (l, p) => renderLeaf(p, l, ovfStarts.toMap) }
          val ip = alloc()
          renderInterior(ip, leaves.init.zip(leafPages.init).map { case (l, p) => (p, l.maxRowid) },
            leafPages.last)
          ip
        }
      Planned(t, root)
    }
    // sqlite_master rows: (type,name,tbl_name,rootpage,sql)
    val masterCells = planned.zipWithIndex.map { case (p, i) =>
      encodeCell(i + 1L, encodeRecord(Seq("table", p.t.name, p.t.name, p.root.toLong, p.t.createSql)))
    }
    val masterLeaves = packLeaves(masterCells, firstPageHdr = 8 + 100)
    if (masterLeaves.length > 1)
      throw SqliteException(s"${tables.length} tables overflow the single-page " +
        "sqlite_master the write subset emits")
    renderLeaf(1, masterLeaves.head, Map.empty)
    // ---- header
    val h = pages(0)
    System.arraycopy(Magic, 0, h, 0, 16)
    putBe16(h, 16, PageSize)
    h(18) = 1; h(19) = 1 // legacy journal read/write versions
    h(21) = 64; h(22) = 32; h(23) = 32
    putBe32(h, 24, 1) // file change counter
    putBe32(h, 28, pages.length)
    putBe32(h, 40, tables.length) // schema cookie
    putBe32(h, 44, 4) // schema format (NULL-trimmed records allowed)
    putBe32(h, 56, 1) // UTF-8
    putBe32(h, 68, appId)
    putBe32(h, 60, userVersion)
    putBe32(h, 92, 1) // version-valid-for = change counter
    putBe32(h, 96, 3049000) // SQLITE_VERSION_NUMBER the format doc ships
    pages.flatten.toArray
  }

  /** Encode one record. Accepted values: null, Long/Int, Double, Boolean,
    * String, Array[Byte]. */
  def encodeRecord(values: Seq[Any]): Array[Byte] = {
    val bodies = values.map {
      case null => (0L, Array.emptyByteArray)
      case b: Boolean => if (b) (9L, Array.emptyByteArray) else (8L, Array.emptyByteArray)
      case i: Int => intBody(i.toLong)
      case l: Long => intBody(l)
      case d: Double =>
        val bb = ByteBuffer.allocate(8).order(ByteOrder.BIG_ENDIAN).putDouble(d)
        (7L, bb.array())
      case s: String =>
        val b = s.getBytes(StandardCharsets.UTF_8); (13L + 2 * b.length, b)
      case a: Array[Byte] => (12L + 2 * a.length, a)
      case other => throw SqliteException(s"unsupported value type ${other.getClass}")
    }
    val typesBuf = ByteBuffer.allocate(9 * (bodies.length + 1))
    bodies.foreach(b => putVarint(typesBuf, b._1))
    val typesLen = typesBuf.position()
    // header length varint includes itself; sizes 1..9 never flip the digit
    // count here because typesLen+1 stays far below 1<<28
    val hdrLen = typesLen + varintLen(typesLen + 1)
    val out = ByteBuffer.allocate(hdrLen + bodies.map(_._2.length).sum)
    putVarint(out, hdrLen.toLong)
    out.put(typesBuf.array(), 0, typesLen)
    bodies.foreach(b => out.put(b._2))
    out.array()
  }

  private def intBody(l: Long): (Long, Array[Byte]) = {
    if (l == 0) (8L, Array.emptyByteArray)
    else if (l == 1) (9L, Array.emptyByteArray)
    else if (l >= Byte.MinValue && l <= Byte.MaxValue) (1L, Array(l.toByte))
    else if (l >= Short.MinValue && l <= Short.MaxValue)
      (2L, ByteBuffer.allocate(2).order(ByteOrder.BIG_ENDIAN).putShort(l.toShort).array())
    else if (l >= Int.MinValue && l <= Int.MaxValue)
      (4L, ByteBuffer.allocate(4).order(ByteOrder.BIG_ENDIAN).putInt(l.toInt).array())
    else (6L, ByteBuffer.allocate(8).order(ByteOrder.BIG_ENDIAN).putLong(l).array())
  }

  private def varintLen(v: Long): Int = {
    var n = 1; var x = v >>> 7
    while (x != 0 && n < 9) { n += 1; x >>>= 7 }
    n
  }

  private def putVarint(buf: ByteBuffer, v: Long): Unit = {
    if (v < 0) throw SqliteException("negative varint unsupported by the write subset")
    val n = varintLen(v)
    if (n == 9) throw SqliteException("9-byte varint unsupported by the write subset")
    var i = n - 1
    while (i >= 0) {
      val shift = 7 * i
      val b = ((v >>> shift) & 0x7f).toInt
      buf.put((if (i > 0) b | 0x80 else b).toByte)
      i -= 1
    }
  }

  private def putBe16(b: Array[Byte], off: Int, v: Int): Unit = {
    b(off) = ((v >>> 8) & 0xff).toByte; b(off + 1) = (v & 0xff).toByte
  }
  private def putBe32(b: Array[Byte], off: Int, v: Int): Unit = {
    b(off) = ((v >>> 24) & 0xff).toByte; b(off + 1) = ((v >>> 16) & 0xff).toByte
    b(off + 2) = ((v >>> 8) & 0xff).toByte; b(off + 3) = (v & 0xff).toByte
  }
}
