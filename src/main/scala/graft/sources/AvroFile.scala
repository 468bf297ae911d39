package graft.sources

import java.math.{BigDecimal => JBigDecimal, BigInteger}
import java.nio.ByteBuffer
import java.time.{Instant, LocalDate, LocalDateTime, ZoneOffset}

import scala.jdk.CollectionConverters._

import org.apache.avro.{LogicalTypes, Schema, SchemaBuilder}
import org.apache.avro.file.{CodecFactory, DataFileReader, DataFileWriter}
import org.apache.avro.generic.{GenericData, GenericDatumReader, GenericDatumWriter, GenericRecord}
import org.apache.avro.mapred.FsInput
import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._

/** Native Avro Object Container File source + sink, built on avro-core only
  * (no spark-avro connector in this deployment) from the public Avro 1.12
  * specification. Beyond the reference surface — Avro is the other row-major
  * interchange format a lakehouse pipeline meets (Kafka dumps, sqoop-era
  * exports, Iceberg's own manifests).
  *
  * Scale shape: container files are SPLITTABLE at sync-marker boundaries —
  * the reader carves byte ranges of `spark.sql.files.maxPartitionBytes` and
  * each task `sync(start)`s to the first block after its range start and
  * stops `pastSync(end)`, the classic Hadoop input-split contract, so one
  * 10 GiB file still fans across executors. Schemas resolve per Avro schema
  * resolution against the first file's writer schema (projection +
  * promotion); unresolvable files fail the task loudly. The writer emits one
  * container per partition with the sync interval left at the library
  * default, so downstream re-reads split too.
  */
object AvroFile {

  final case class AvroFileException(msg: String) extends IllegalArgumentException(msg)

  val validReadOptions: Set[String] = Set("files")
  val validWriteOptions: Set[String] = Set("overwrite", "compression")

  // ----------------------------------------------------------- reader

  def read(spark: SparkSession, paths: Seq[String],
      options: Map[String, String]): DataFrame = {
    if (paths.isEmpty) throw AvroFileException("avro attach needs at least one path")
    val conf = spark.sessionState.newHadoopConf()
    val files: Seq[(String, Long)] = paths.flatMap { p =>
      val hp = new Path(p)
      val fs = hp.getFileSystem(conf)
      if (p.exists("*?[{".contains(_))) {
        val matched = Option(fs.globStatus(hp)).map(_.toSeq).getOrElse(Nil)
        if (matched.isEmpty) throw AvroFileException(s"glob `$p` matches no avro files")
        matched.map(s => s.getPath.toString -> s.getLen)
      } else {
        val st = fs.getFileStatus(hp)
        if (st.isDirectory) {
          val kids = fs.listStatus(hp).toSeq.filter(_.isFile)
            .filter(_.getPath.getName.toLowerCase.endsWith(".avro"))
          if (kids.isEmpty) throw AvroFileException(s"`$p`: directory holds no .avro files")
          kids.map(s => s.getPath.toString -> s.getLen)
        } else Seq(st.getPath.toString -> st.getLen)
      }
    }
    // Writer schema from the first file anchors the table schema; every
    // other file resolves against it (Avro schema resolution) in executors.
    val writerSchema = {
      val in = new FsInput(new Path(files.head._1), conf)
      try {
        val r = DataFileReader.openReader(in, new GenericDatumReader[GenericRecord]())
        try r.getSchema finally r.close()
      } finally in.close()
    }
    if (writerSchema.getType != Schema.Type.RECORD) throw AvroFileException(
      s"`${files.head._1}`: top-level avro type is ${writerSchema.getType}; " +
        "only record-rooted containers map to rows")
    val sparkSchema = toSpark(writerSchema) match {
      case s: StructType => s
      case other => throw AvroFileException(s"unexpected root mapping $other")
    }
    // Sync-split the byte ranges: tasks own [start, end) and read whole
    // blocks whose sync lands inside the range — every row read exactly once.
    val target = spark.sessionState.conf.filesMaxPartitionBytes.max(1L)
    // end is the true file length, never Long.MaxValue: pastSync(p)
    // compares blockStart >= p + 16 and a MaxValue sentinel overflows it.
    val splits: Seq[(String, Long, Long)] = files.flatMap { case (f, len) =>
      if (len <= target) Seq((f, 0L, len))
      else (0L until len by target).map(s => (f, s, math.min(s + target, len)))
    }
    val schemaJson = writerSchema.toString
    val confEntries: Seq[(String, String)] =
      conf.iterator().asScala.map(e => e.getKey -> e.getValue).toSeq
    val confBc = spark.sparkContext.broadcast(confEntries)
    val rows = spark.sparkContext
      .parallelize(splits, math.max(1, splits.length))
      .flatMap { case (f, start, end) =>
        val c = new Configuration(false)
        confBc.value.foreach { case (k, v) => c.set(k, v) }
        val reader = new Schema.Parser().parse(schemaJson)
        val in = new FsInput(new Path(f), c)
        val r = DataFileReader.openReader(in,
          new GenericDatumReader[GenericRecord](null, reader))
        // sync(p) seeks to the first marker AFTER p; markers trail each
        // block, so syncing at 0 would skip the first block — the range
        // starting at 0 reads from the header instead.
        if (start > 0L) r.sync(start)
        new Iterator[Row] {
          private var closed = false
          def hasNext: Boolean = {
            if (closed) return false
            val more = r.hasNext && !r.pastSync(end)
            if (!more) { r.close(); closed = true }
            more
          }
          def next(): Row = toRow(r.next(), reader)
        }
      }
    spark.createDataFrame(rows, sparkSchema)
  }

  /** Avro schema → Spark type. Unions beyond [null, T] reject loudly (no
    * silent stringification); logical types map to their Spark natives. */
  private[graft] def toSpark(s: Schema): DataType = s.getType match {
    case Schema.Type.BOOLEAN => BooleanType
    case Schema.Type.INT =>
      if (logical(s) == "date") DateType else IntegerType
    case Schema.Type.LONG => logical(s) match {
      case "timestamp-micros" | "timestamp-millis" => TimestampType
      case "local-timestamp-micros" | "local-timestamp-millis" => TimestampNTZType
      case _ => LongType
    }
    case Schema.Type.FLOAT => FloatType
    case Schema.Type.DOUBLE => DoubleType
    case Schema.Type.STRING => StringType
    case Schema.Type.ENUM => StringType
    case Schema.Type.BYTES | Schema.Type.FIXED =>
      s.getLogicalType match {
        case d: LogicalTypes.Decimal => DecimalType(d.getPrecision, d.getScale)
        case _ => BinaryType
      }
    case Schema.Type.RECORD =>
      StructType(s.getFields.asScala.toSeq.map { f =>
        val (dt, nullable) = fieldType(f.schema())
        StructField(f.name(), dt, nullable)
      })
    case Schema.Type.ARRAY =>
      val (dt, nullable) = fieldType(s.getElementType)
      ArrayType(dt, containsNull = nullable)
    case Schema.Type.MAP =>
      val (dt, nullable) = fieldType(s.getValueType)
      MapType(StringType, dt, valueContainsNull = nullable)
    case other => throw AvroFileException(s"avro type $other has no Spark mapping")
  }

  private def logical(s: Schema): String =
    Option(s.getLogicalType).map(_.getName).getOrElse("")

  /** Union [null, T] → (T, nullable); bare T → (T, false); else loud. */
  private def fieldType(s: Schema): (DataType, Boolean) =
    if (s.getType == Schema.Type.UNION) {
      val branches = s.getTypes.asScala.toSeq
      val nonNull = branches.filter(_.getType != Schema.Type.NULL)
      if (nonNull.size != 1) throw AvroFileException(
        s"avro union ${s} is not [null, T]; multi-branch unions have no " +
          "columnar mapping — restructure the schema or read the branch fields")
      (toSpark(nonNull.head), branches.size != nonNull.size)
    } else (toSpark(s), false)

  /** GenericRecord → external Row matching toSpark's mapping. */
  private[graft] def toRow(rec: GenericRecord, schema: Schema): Row = {
    val fields = schema.getFields.asScala.toSeq
    Row.fromSeq(fields.map(f => convert(rec.get(f.pos()), unwrap(f.schema()))))
  }

  private def unwrap(s: Schema): Schema =
    if (s.getType == Schema.Type.UNION)
      s.getTypes.asScala.find(_.getType != Schema.Type.NULL).getOrElse(s)
    else s

  private def convert(v: Any, s: Schema): Any = v match {
    case null => null
    case u: org.apache.avro.util.Utf8 => u.toString
    case str: String => str
    case i: java.lang.Integer =>
      if (logical(s) == "date") LocalDate.ofEpochDay(i.longValue()) else i
    case l: java.lang.Long => logical(s) match {
      case "timestamp-micros" => microsToInstant(l)
      case "timestamp-millis" => Instant.ofEpochMilli(l)
      case "local-timestamp-micros" =>
        LocalDateTime.ofInstant(microsToInstant(l), ZoneOffset.UTC)
      case "local-timestamp-millis" =>
        LocalDateTime.ofInstant(Instant.ofEpochMilli(l), ZoneOffset.UTC)
      case _ => l
    }
    case b: ByteBuffer =>
      val bytes = new Array[Byte](b.remaining()); b.duplicate().get(bytes)
      s.getLogicalType match {
        case d: LogicalTypes.Decimal => new JBigDecimal(new BigInteger(bytes), d.getScale)
        case _ => bytes
      }
    case fx: org.apache.avro.generic.GenericFixed =>
      s.getLogicalType match {
        case d: LogicalTypes.Decimal =>
          new JBigDecimal(new BigInteger(fx.bytes()), d.getScale)
        case _ => fx.bytes()
      }
    case e: org.apache.avro.generic.GenericEnumSymbol[_] => e.toString
    case r: GenericRecord => toRow(r, s)
    case arr: java.util.Collection[_] =>
      val el = unwrap(s.getElementType)
      arr.asScala.toSeq.map(convert(_, el))
    case m: java.util.Map[_, _] =>
      val vt = unwrap(s.getValueType)
      m.asScala.map { case (k, mv) => k.toString -> convert(mv, vt) }.toMap
    case other => other // boolean / float / double pass through
  }

  private def microsToInstant(micros: Long): Instant =
    Instant.ofEpochSecond(Math.floorDiv(micros, 1000000L),
      Math.floorMod(micros, 1000000L) * 1000L)

  // ----------------------------------------------------------- writer

  def write(df: DataFrame, path: String, options: Map[String, String]): Unit = {
    options.keys.find(k => !validWriteOptions.contains(k.toLowerCase)).foreach { k =>
      throw AvroFileException(s"invalid COPY option `$k` for format `avro`; " +
        s"valid options: ${validWriteOptions.toSeq.sorted.mkString(", ")}")
    }
    val codecName = options.getOrElse("compression", "null").toLowerCase
    if (!Set("null", "uncompressed", "deflate", "snappy").contains(codecName))
      throw AvroFileException(
        s"compression `$codecName` not supported; use null, deflate or snappy")
    val avroSchema = toAvro(df.schema, "graft_record")
    val spark = df.sparkSession
    val conf = spark.sessionState.newHadoopConf()
    val outPath = new Path(path)
    val fs = outPath.getFileSystem(conf)
    if (fs.exists(outPath)) {
      if (options.get("overwrite").exists(_.toBoolean)) fs.delete(outPath, true)
      else throw AvroFileException(s"`$path` exists; pass overwrite=true to replace")
    }
    fs.mkdirs(outPath)
    val schemaJson = avroSchema.toString
    val sparkSchema = df.schema
    val confEntries: Seq[(String, String)] =
      conf.iterator().asScala.map(e => e.getKey -> e.getValue).toSeq
    val confBc = spark.sparkContext.broadcast(confEntries)
    val outStr = fs.makeQualified(outPath).toString
    // One container per partition, written by the executor that owns the
    // rows — the driver never sees data, only the bounded count below.
    val written = df.rdd.mapPartitionsWithIndex { (i, it) =>
      if (!it.hasNext) Iterator.empty
      else {
        val c = new Configuration(false)
        confBc.value.foreach { case (k, v) => c.set(k, v) }
        val schema = new Schema.Parser().parse(schemaJson)
        val f = new Path(outStr, f"part-$i%05d.avro")
        val os = f.getFileSystem(c).create(f, false)
        val w = new DataFileWriter(new GenericDatumWriter[GenericRecord](schema))
        codecName match {
          case "deflate" => w.setCodec(CodecFactory.deflateCodec(6))
          case "snappy" => w.setCodec(CodecFactory.snappyCodec())
          case _ => ()
        }
        w.create(schema, os)
        var n = 0L
        try {
          it.foreach { row => w.append(rowToRecord(row, sparkSchema, schema)); n += 1 }
        } finally w.close()
        Iterator.single(n)
      }
    }.collect().sum
    require(written >= 0L) // force materialization; count is bounded metadata
  }

  /** Spark StructType → Avro record schema; nullable fields become
    * [null, T] unions. Names must already be Avro-legal — PG-folded
    * lowercase identifiers are; anything else rejects loudly. */
  private[graft] def toAvro(st: StructType, name: String): Schema = {
    val fields = st.fields.map { f =>
      if (!f.name.matches("[A-Za-z_][A-Za-z0-9_]*")) throw AvroFileException(
        s"column `${f.name}` is not an Avro-legal name ([A-Za-z_][A-Za-z0-9_]*); " +
          "alias it before COPY TO avro")
      val base = typeToAvro(f.dataType, s"${name}_${f.name}")
      val sch = if (f.nullable)
        Schema.createUnion(java.util.List.of(Schema.create(Schema.Type.NULL), base))
      else base
      new Schema.Field(f.name, sch,
        null, if (f.nullable) Schema.Field.NULL_DEFAULT_VALUE else null)
    }
    Schema.createRecord(name, null, "graft", false, java.util.List.of(fields: _*))
  }

  private def typeToAvro(dt: DataType, name: String): Schema = dt match {
    case BooleanType => Schema.create(Schema.Type.BOOLEAN)
    case ByteType | ShortType | IntegerType => Schema.create(Schema.Type.INT)
    case LongType => Schema.create(Schema.Type.LONG)
    case FloatType => Schema.create(Schema.Type.FLOAT)
    case DoubleType => Schema.create(Schema.Type.DOUBLE)
    case StringType => Schema.create(Schema.Type.STRING)
    case BinaryType => Schema.create(Schema.Type.BYTES)
    case DateType =>
      LogicalTypes.date().addToSchema(Schema.create(Schema.Type.INT))
    case TimestampType =>
      LogicalTypes.timestampMicros().addToSchema(Schema.create(Schema.Type.LONG))
    case TimestampNTZType =>
      LogicalTypes.localTimestampMicros().addToSchema(Schema.create(Schema.Type.LONG))
    case d: DecimalType =>
      LogicalTypes.decimal(d.precision, d.scale)
        .addToSchema(Schema.create(Schema.Type.BYTES))
    case s: StructType => toAvro(s, name)
    case ArrayType(el, containsNull) =>
      val base = typeToAvro(el, s"${name}_item")
      Schema.createArray(if (containsNull)
        Schema.createUnion(java.util.List.of(Schema.create(Schema.Type.NULL), base))
      else base)
    case MapType(StringType, vt, valueNull) =>
      val base = typeToAvro(vt, s"${name}_value")
      Schema.createMap(if (valueNull)
        Schema.createUnion(java.util.List.of(Schema.create(Schema.Type.NULL), base))
      else base)
    case MapType(k, _, _) => throw AvroFileException(
      s"avro maps key by string; map key type $k cannot round-trip — " +
        "restructure as an array of key/value structs")
    case other => throw AvroFileException(s"type $other has no Avro mapping")
  }

  private def rowToRecord(row: Row, st: StructType, schema: Schema): GenericRecord = {
    val rec = new GenericData.Record(schema)
    st.fields.zipWithIndex.foreach { case (f, i) =>
      val target = unwrap(schema.getFields.get(i).schema())
      rec.put(i, toAvroValue(row.get(i), f.dataType, target))
    }
    rec
  }

  private def toAvroValue(v: Any, dt: DataType, s: Schema): Any = v match {
    case null => null
    case _ => dt match {
      case DateType => v match {
        case d: java.sql.Date => d.toLocalDate.toEpochDay.toInt
        case d: LocalDate => d.toEpochDay.toInt
      }
      case TimestampType => v match {
        case t: java.sql.Timestamp =>
          Math.addExact(Math.multiplyExact(t.getTime / 1000L, 1000000L),
            (t.getNanos / 1000).toLong)
        case i: Instant =>
          Math.addExact(Math.multiplyExact(i.getEpochSecond, 1000000L),
            (i.getNano / 1000).toLong)
      }
      case TimestampNTZType => v match {
        case t: LocalDateTime =>
          val i = t.toInstant(ZoneOffset.UTC)
          Math.addExact(Math.multiplyExact(i.getEpochSecond, 1000000L),
            (i.getNano / 1000).toLong)
      }
      case d: DecimalType =>
        val bd = v.asInstanceOf[JBigDecimal].setScale(d.scale)
        ByteBuffer.wrap(bd.unscaledValue().toByteArray)
      case BinaryType => ByteBuffer.wrap(v.asInstanceOf[Array[Byte]])
      case ByteType => v.asInstanceOf[Byte].toInt
      case ShortType => v.asInstanceOf[Short].toInt
      case sub: StructType => rowToRecord(v.asInstanceOf[Row], sub, s)
      case ArrayType(el, _) =>
        val elS = unwrap(s.getElementType)
        v.asInstanceOf[scala.collection.Seq[_]].map(toAvroValue(_, el, elS)).toSeq.asJava
      case MapType(_, vt, _) =>
        val vS = unwrap(s.getValueType)
        v.asInstanceOf[scala.collection.Map[String, _]]
          .map { case (k, mv) => k -> toAvroValue(mv, vt, vS) }.toMap.asJava
      case _ => v
    }
  }
}
