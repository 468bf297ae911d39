package graft.sources

import org.apache.hadoop.fs.{FileStatus, Path}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.execution.datasources.{FileIndex, FileStatusWithMetadata, PartitionDirectory}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Planning-time file skipping for the native lakehouse readers — the
  * delta-kernel / Iceberg-planner design, Spark-first.
  *
  * A lakehouse table's transaction log already knows, per data file, the
  * partition values, the byte size, and (when the writer recorded them)
  * per-column min/max/nullCount statistics. The reference reads these
  * tables through DuckDB extensions that do exactly this pruning in their
  * scan planners (delta-kernel's `scan::Scan` stats skipping; Iceberg
  * manifest `lower_bounds`/`upper_bounds`). In Spark, the seam is
  * `FileIndex`: `listFiles(partitionFilters, dataFilters)` runs at PLAN
  * time with the pushed-down predicates, so a `WHERE day = 7 AND x > 100`
  * over a million-file table opens only the files whose log entry admits a
  * match — no footer reads, no listing, no tasks for the rest.
  *
  * This index serves:
  *   - partition values FROM THE LOG (typed via the declared schema) — so
  *     hive and non-hive layouts prune identically, and Catalyst's
  *     partition pruning works on tables whose directory names say nothing;
  *   - per-file stats pruning over `dataFilters` (conservative tri-state:
  *     a file is dropped only when the predicate PROVABLY matches no row);
  *   - accurate `sizeInBytes` from the log — Catalyst's broadcast-join
  *     threshold sees the table's true size instead of a default guess.
  *
  * Driver-side state is one entry per live file — the same O(files)
  * footprint the log replay already carries. Everything here is metadata;
  * the data path stays a plain distributed parquet scan.
  */
object LogFileIndex {

  /** Per-file, per-column statistics in a normalized compare domain:
    * integrals/date → Long, float/double → Double, decimal → BigDecimal,
    * string → String, timestamp → Long micros, boolean → Boolean.
    * Absent entries mean "unknown" and never prune. */
  final case class FileStats(
      numRecords: Option[Long],
      min: Map[String, Any],
      max: Map[String, Any],
      nullCount: Map[String, Long])

  /** One live data file from the log. `stats` is parsed lazily (at most
    * once) — tables scanned without selective filters never pay for it. */
  final class IndexedFile(
      val path: String,
      val size: Long,
      val modificationTime: Long,
      val partitionValues: Map[String, String],
      statsParser: () => Option[FileStats]) {
    lazy val stats: Option[FileStats] = statsParser()
  }

  // ------------------------------------------------------ stats parsing
  /** JSON stats node (Delta `add.stats` shape: minValues/maxValues/
    * nullCount/numRecords objects keyed by column name) → FileStats.
    * Only top-level primitive columns participate; anything unparseable is
    * simply absent (→ no pruning on that column). */
  def parseDeltaStats(json: String, schema: StructType,
      mapper: com.fasterxml.jackson.databind.ObjectMapper): Option[FileStats] = {
    if (json == null || json.isEmpty) return None
    val node = try mapper.readTree(json) catch { case _: Exception => return None }
    val byName = schema.fields.map(f => f.name.toLowerCase -> f.dataType).toMap
    def obj(key: String): Map[String, Any] = {
      val o = node.path(key)
      if (!o.isObject) Map.empty
      else {
        val b = Map.newBuilder[String, Any]
        o.fields().forEachRemaining { e =>
          val name = e.getKey.toLowerCase
          byName.get(name).foreach { dt =>
            statValue(e.getValue, dt).foreach(v => b += name -> v)
          }
        }
        b.result()
      }
    }
    val nulls = {
      val o = node.path("nullCount")
      if (!o.isObject) Map.empty[String, Long]
      else {
        val b = Map.newBuilder[String, Long]
        o.fields().forEachRemaining { e =>
          if (e.getValue.isIntegralNumber) b += e.getKey.toLowerCase -> e.getValue.asLong()
        }
        b.result()
      }
    }
    val num = if (node.path("numRecords").isIntegralNumber)
      Some(node.path("numRecords").asLong()) else None
    Some(FileStats(num, obj("minValues"), obj("maxValues"), nulls))
  }

  private def statValue(n: com.fasterxml.jackson.databind.JsonNode,
      dt: DataType): Option[Any] = {
    if (n == null || n.isNull || n.isObject || n.isArray) return None
    try dt match {
      case ByteType | ShortType | IntegerType | LongType => Some(n.asLong())
      case FloatType | DoubleType => Some(n.asDouble())
      case _: DecimalType => Some(new java.math.BigDecimal(n.asText()))
      case StringType => Some(n.asText())
      case BooleanType => Some(n.asBoolean())
      case DateType => Some(java.time.LocalDate.parse(n.asText()).toEpochDay)
      case TimestampType | TimestampNTZType => parseTsMicros(n.asText())
      case _ => None
    } catch { case _: Exception => None }
  }

  /** ISO timestamp text → epoch micros. Offset forms resolve exactly;
    * offset-less forms read as UTC (the NTZ compare domain — both the
    * literal and the stat pass through the same convention, so ordering is
    * preserved either way). */
  private def parseTsMicros(text: String): Option[Any] = {
    val t = text.trim.replace(' ', 'T')
    def micros(i: java.time.Instant): Long =
      Math.addExact(Math.multiplyExact(i.getEpochSecond, 1000000L), i.getNano / 1000L)
    try Some(micros(java.time.OffsetDateTime.parse(t).toInstant))
    catch {
      case _: Exception =>
        try Some(micros(java.time.LocalDateTime.parse(t)
          .toInstant(java.time.ZoneOffset.UTC)))
        catch { case _: Exception => None }
    }
  }

  // ---------------------------------------------------- pruning algebra

  /** String compare domain = unsigned UTF-8 byte order — Spark's own
    * `UTF8String.compareTo` (what runtime predicates use) AND parquet's
    * UNSIGNED_LEXICOGRAPHICAL comparator (what produced the bounds). Java
    * `String.compareTo` is UTF-16 order, which DISAGREES for
    * supplementary-plane text (surrogates at 0xD800 sort below U+E000 in
    * UTF-16 but above in code-point/UTF-8 order) — pruning with it could
    * skip a live file. */
  private[graft] def utf8Compare(a: String, b: String): Int =
    org.apache.spark.unsafe.types.UTF8String.fromString(a)
      .compareTo(org.apache.spark.unsafe.types.UTF8String.fromString(b))

  private[graft] def cmp(a: Any, b: Any): Option[Int] = (a, b) match {
    case (x: Long, y: Long) => Some(java.lang.Long.compare(x, y))
    case (x: Double, y: Double) =>
      if (x.isNaN || y.isNaN) None else Some(java.lang.Double.compare(x, y))
    case (x: java.math.BigDecimal, y: java.math.BigDecimal) => Some(x.compareTo(y))
    case (x: String, y: String) => Some(utf8Compare(x, y))
    case (x: Boolean, y: Boolean) => Some(java.lang.Boolean.compare(x, y))
    case _ => None
  }

  /** Literal (Catalyst internal value) → the stats compare domain. */
  private def litValue(value: Any, dt: DataType): Option[Any] = {
    if (value == null) return None
    dt match {
      case ByteType | ShortType | IntegerType | LongType =>
        Some(value.asInstanceOf[Number].longValue())
      case DateType => Some(value.asInstanceOf[Number].longValue())
      case FloatType | DoubleType => Some(value.asInstanceOf[Number].doubleValue())
      case _: DecimalType => Some(value.asInstanceOf[Decimal].toJavaBigDecimal)
      case StringType => Some(value.toString)
      case BooleanType => Some(value.asInstanceOf[Boolean])
      case TimestampType | TimestampNTZType => Some(value.asInstanceOf[Number].longValue())
      case _ => None
    }
  }

  private def attrOf(e: Expression): Option[AttributeReference] = e match {
    case a: AttributeReference => Some(a)
    case _ => None
  }

  /** Could `filter` match any row of a file with these stats? `true` means
    * "maybe" — only a provable no prunes. */
  def mayMatch(filter: Expression, st: FileStats): Boolean = {
    def minOf(a: AttributeReference) = st.min.get(a.name.toLowerCase)
    def maxOf(a: AttributeReference) = st.max.get(a.name.toLowerCase)
    def allNull(a: AttributeReference): Boolean = (for {
      n <- st.nullCount.get(a.name.toLowerCase); total <- st.numRecords
    } yield n == total).getOrElse(false)
    // comparisons are null-intolerant: an all-null column can't satisfy one
    def cmpKeep(a: AttributeReference, v: Any, test: Int => Boolean,
        side: AttributeReference => Option[Any]): Boolean = {
      if (allNull(a)) return false
      side(a) match {
        case Some(bound) => cmp(bound, v) match {
          case Some(c) => test(c)
          case None => true
        }
        case None => true
      }
    }
    filter match {
      case And(l, r) => mayMatch(l, st) && mayMatch(r, st)
      case Or(l, r) => mayMatch(l, st) || mayMatch(r, st)
      case EqualTo(a: AttributeReference, Literal(v, dt)) =>
        litValue(v, dt) match {
          case None => false // `= NULL` matches nothing
          case Some(x) =>
            cmpKeep(a, x, _ <= 0, minOf) && cmpKeep(a, x, _ >= 0, maxOf)
        }
      case EqualTo(l: Literal, a: AttributeReference) =>
        mayMatch(EqualTo(a, l), st)
      case EqualNullSafe(a: AttributeReference, Literal(v, dt)) =>
        litValue(v, dt) match {
          case None => mayMatch(IsNull(a), st)
          case Some(x) => cmpKeep(a, x, _ <= 0, minOf) && cmpKeep(a, x, _ >= 0, maxOf)
        }
      case EqualNullSafe(l: Literal, a: AttributeReference) =>
        mayMatch(EqualNullSafe(a, l), st)
      case LessThan(a: AttributeReference, Literal(v, dt)) =>
        litValue(v, dt).forall(x => cmpKeep(a, x, _ < 0, minOf))
      case LessThan(Literal(v, dt), a: AttributeReference) => // v < a  ⇔  a > v
        litValue(v, dt).forall(x => cmpKeep(a, x, _ > 0, maxOf))
      case LessThanOrEqual(a: AttributeReference, Literal(v, dt)) =>
        litValue(v, dt).forall(x => cmpKeep(a, x, _ <= 0, minOf))
      case LessThanOrEqual(Literal(v, dt), a: AttributeReference) =>
        litValue(v, dt).forall(x => cmpKeep(a, x, _ >= 0, maxOf))
      case GreaterThan(a: AttributeReference, Literal(v, dt)) =>
        litValue(v, dt).forall(x => cmpKeep(a, x, _ > 0, maxOf))
      case GreaterThan(Literal(v, dt), a: AttributeReference) =>
        litValue(v, dt).forall(x => cmpKeep(a, x, _ < 0, minOf))
      case GreaterThanOrEqual(a: AttributeReference, Literal(v, dt)) =>
        litValue(v, dt).forall(x => cmpKeep(a, x, _ >= 0, maxOf))
      case GreaterThanOrEqual(Literal(v, dt), a: AttributeReference) =>
        litValue(v, dt).forall(x => cmpKeep(a, x, _ <= 0, minOf))
      case In(a: AttributeReference, values) if values.forall(_.isInstanceOf[Literal]) =>
        values.exists { case Literal(v, dt) =>
          litValue(v, dt).exists(x =>
            cmpKeep(a, x, _ <= 0, minOf) && cmpKeep(a, x, _ >= 0, maxOf))
        }
      case InSet(a: AttributeReference, hset) =>
        hset.exists(v => litValue(v, a.dataType).exists(x =>
          cmpKeep(a, x, _ <= 0, minOf) && cmpKeep(a, x, _ >= 0, maxOf)))
      case IsNull(a: AttributeReference) =>
        !st.nullCount.get(a.name.toLowerCase).contains(0L)
      case IsNotNull(a: AttributeReference) => !allNull(a)
      case StartsWith(a: AttributeReference, Literal(v, StringType)) if v != null =>
        val prefix = v.toString
        if (allNull(a)) false
        else {
          val maxOk = maxOf(a).forall {
            case s: String => utf8Compare(s, prefix) >= 0
            case _ => true
          }
          val minOk = minOf(a).forall {
            case s: String => utf8Compare(s, prefix) <= 0 || s.startsWith(prefix)
            case _ => true
          }
          maxOk && minOk
        }
      case Not(IsNull(a: AttributeReference)) => !allNull(a)
      case _ => true // unknown shape → never prune
    }
  }
}

/** FileIndex over log-resolved entries. `partitionSchema` fields use the
  * PHYSICAL column names (the names `partitionValues` is keyed by and the
  * pushed filters reference below any logical rename).
  *
  * `rowsExact` declares that the log-recorded per-file statistics describe
  * the rows the scan will actually RETURN — i.e. no row-level deletes,
  * deletion vectors, or other post-scan filtering apply to these files.
  * It licenses metadata-only aggregate answering (graft.plans
  * .MetadataAggregates); readers set it only on their no-deletes path. */
final class LogFileIndex(
    spark: SparkSession,
    root: Path,
    entries: Seq[LogFileIndex.IndexedFile],
    override val partitionSchema: StructType,
    val rowsExact: Boolean = false) extends FileIndex {
  import LogFileIndex._

  /** Log entries backing this index (metadata-aggregate answering reads
    * per-file stats; one object per live file, already driver-resident). */
  def files: Seq[IndexedFile] = entries

  // measured ceiling (SCALE.md "Driver-metadata ceiling"): ~0.7 KB and
  // ~20 µs of driver work per live file — linear and fine to ~1M files,
  // then driver heap becomes the knee. Past it, say so loudly instead of
  // degrading into an opaque OOM; compaction is the operational answer.
  if (entries.length > 1000000)
    org.slf4j.LoggerFactory.getLogger(classOf[LogFileIndex]).warn(
      s"table at $root has ${entries.length} live files — driver-side " +
        "planning holds one entry per file (~0.7 KB each) and this table is " +
        "past the measured comfort zone (~1M). Compact it (OPTIMIZE / " +
        "rewrite_data_files) before driver heap becomes the bottleneck.")

  private val tz = spark.sessionState.conf.sessionLocalTimeZone

  override def rootPaths: Seq[Path] = Seq(root)
  override def inputFiles: Array[String] = entries.map(_.path).toArray
  override def refresh(): Unit = ()
  override def sizeInBytes: Long = entries.map(_.size).sum

  private def partRow(values: Map[String, String]): InternalRow = {
    val vals = partitionSchema.fields.map { f =>
      values.get(f.name).flatMap(Option(_)) match {
        case None => null
        case Some(raw) =>
          Cast(Literal(UTF8String.fromString(raw), StringType), f.dataType,
            Option(tz)).eval(null)
      }
    }
    InternalRow.fromSeq(vals.toIndexedSeq)
  }

  /** EXACT partition pruning for metadata-only answering: the live files
    * whose partition row satisfies `pred` — an expression whose
    * attributes are already BoundReferences into [[partitionSchema]]'s
    * field order. Because every row of a file shares its partition
    * values, a partition-only predicate keeps ALL of a file's rows or
    * NONE of them, so folding stats over the survivors equals running
    * the filtered aggregate (three-valued logic included: a NULL
    * evaluation drops the file exactly as it drops the rows). */
  def filesWherePartition(pred: Expression): Seq[LogFileIndex.IndexedFile] = {
    val p = Predicate.createInterpreted(pred)
    entries.groupBy(_.partitionValues).toSeq.flatMap { case (pv, fs) =>
      if (p.eval(partRow(pv))) fs else Nil
    }
  }

  override def listFiles(partitionFilters: Seq[Expression],
      dataFilters: Seq[Expression]): Seq[PartitionDirectory] = {
    // data-filter pruning: a file survives unless EVERY... rather, unless
    // some filter provably matches none of its rows (filters are ANDed)
    val afterStats = entries.filter { e =>
      e.stats.forall(st => dataFilters.forall(f => mayMatch(f, st)))
    }
    val groups = afterStats.groupBy(_.partitionValues).toSeq.map {
      case (pv, fs) => (partRow(pv), fs)
    }
    // partition-filter pruning: bind by NAME against the partition schema
    // (the incoming attributes belong to the relation's output)
    val pruned =
      if (partitionFilters.isEmpty) groups
      else {
        val bindable = partitionFilters.forall(_.references.forall(a =>
          partitionSchema.fieldNames.exists(_.equalsIgnoreCase(a.name))))
        if (!bindable) groups
        else {
          val bound = partitionFilters.reduce(And).transform {
            case a: AttributeReference =>
              val idx = partitionSchema.fieldNames.indexWhere(_.equalsIgnoreCase(a.name))
              BoundReference(idx, partitionSchema.fields(idx).dataType, nullable = true)
          }
          val pred = Predicate.createInterpreted(bound)
          groups.filter { case (row, _) => pred.eval(row) }
        }
      }
    pruned.map { case (row, fs) =>
      PartitionDirectory(row, fs.map { e =>
        FileStatusWithMetadata(
          new FileStatus(e.size, false, 1, 128L * 1024 * 1024,
            e.modificationTime, new Path(e.path)),
          Map.empty)
      })
    }
  }
}
