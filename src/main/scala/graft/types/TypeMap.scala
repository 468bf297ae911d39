package graft.types

import org.apache.spark.sql.types._

/** Source-type → engine-type mapping spec, replicating the reference's schema
  * autodetection matrix (reference: src/fdw/trigger.rs:195-263) on Spark's
  * type system, including its rejections.
  *
  * The scan-time Arrow→value matrix (src/schema/cell.rs:685-1382) is subsumed
  * by Spark's vectorized readers + Catalyst Cast; what survives as spec is
  * which declared column types are accepted for a given source type, and the
  * widenings for unsigned integers (Spark has no unsigned types).
  */
object TypeMap {

  final case class UnsupportedTypeException(typeName: String)
    extends IllegalArgumentException(
      s"Type `$typeName` is not supported (matches the reference engine's rejection list)")

  /** Types the reference rejects outright (trigger.rs:196-226). */
  val rejected: Set[String] = Set("MAP", "ENUM", "UNION", "BIT", "INVALID")

  private val decimalRe = """DECIMAL\((\d+)\s*,\s*(\d+)\)""".r
  private val listRe = """(.+)\[\]""".r

  /** DuckDB-style type name → Spark DataType (trigger.rs:228-263 semantics).
    * Unsigned types widen one step; HUGEINT family → DECIMAL(38,0). */
  def toSpark(duckdbType: String): DataType = {
    val t = duckdbType.trim.toUpperCase
    if (rejected.exists(r => t == r || t.startsWith(r + "("))) throw UnsupportedTypeException(t)
    t match {
      case "BOOLEAN" => BooleanType
      case "TINYINT" => ByteType
      case "UTINYINT" | "SMALLINT" => ShortType
      case "USMALLINT" | "INTEGER" => IntegerType
      case "UINTEGER" | "BIGINT" => LongType
      case "UBIGINT" => DecimalType(20, 0)
      case "HUGEINT" | "UHUGEINT" => DecimalType(38, 0)
      case "FLOAT" => FloatType
      case "DOUBLE" => DoubleType
      case decimalRe(p, s) => DecimalType(p.toInt, s.toInt)
      case "DECIMAL" => DecimalType(18, 3) // DuckDB default DECIMAL(18,3)
      case "VARCHAR" | "TEXT" | "UUID" => StringType
      case "BLOB" | "BYTEA" | "GEOMETRY" | "WKB_BLOB" => BinaryType
      case "DATE" => DateType
      // Spark has no TIME type; the reference drops TIMETZ's zone (trigger.rs:241)
      case "TIME" | "TIME WITH TIME ZONE" | "TIMETZ" => TimestampNTZType
      case "TIMESTAMP" | "TIMESTAMP_S" | "TIMESTAMP_MS" | "TIMESTAMP_NS" => TimestampNTZType
      case "TIMESTAMPTZ" | "TIMESTAMP WITH TIME ZONE" => TimestampType
      case "INTERVAL" => DayTimeIntervalType()
      case listRe(inner) => ArrayType(toSpark(inner))
      case other if other.startsWith("STRUCT") =>
        // reference renders STRUCT as JSONB (trigger.rs:258-260); we keep the
        // string rendering for parity (StructType callers use to_json)
        StringType
      case other => throw UnsupportedTypeException(other)
    }
  }

  /** Spark DataType → the reference's Postgres-visible type name, for
    * describe-style introspection parity. */
  def toEngineName(dt: DataType): String = dt match {
    case BooleanType => "boolean"
    case ByteType | ShortType => "smallint"
    case IntegerType => "integer"
    case LongType => "bigint"
    case FloatType => "real"
    case DoubleType => "double precision"
    case d: DecimalType => s"numeric(${d.precision},${d.scale})"
    case StringType => "text"
    case BinaryType => "bytea"
    case DateType => "date"
    case TimestampType => "timestamp with time zone"
    case TimestampNTZType => "timestamp"
    case _: DayTimeIntervalType | _: YearMonthIntervalType => "interval"
    case a: ArrayType => toEngineName(a.elementType) + "[]"
    case _: StructType => "jsonb"
    case m: MapType => throw UnsupportedTypeException(m.simpleString)
    case other => other.simpleString
  }
}
