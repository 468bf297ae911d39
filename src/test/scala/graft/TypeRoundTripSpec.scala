package graft

import graft.catalog.Catalog
import graft.types.TypeMap
import org.apache.spark.sql.Row
import org.apache.spark.sql.types._
import java.time.{Duration, Instant, LocalDate, LocalDateTime}

/** Golden round-trip corpora on REAL data (SURVEY §5 pillar 1; FIXTURES.md):
  * the reference pins its type matrix with a 17-type Arrow corpus
  * (tests/tests/fixtures/arrow.rs:144-213) and a 29-type engine-oracle table
  * (tests/tests/fixtures/tables/duckdb_types.rs:83-149). TypeMapSpec pins the
  * mapping as spec; this suite proves the widenings hold through an actual
  * write → attach → read cycle. */
class TypeRoundTripSpec extends SparkSpec {

  private lazy val dir = tempDir("roundtrip")

  // ------------------------------------------------ 17-type Arrow corpus
  private val corpus17Schema = StructType(Seq(
    StructField("boolean_col", BooleanType),
    StructField("int8_col", ByteType),
    StructField("int16_col", ShortType),
    StructField("int32_col", IntegerType),
    StructField("int64_col", LongType),
    StructField("uint8_col", ShortType),     // UInt8 widens (trigger.rs:229-230)
    StructField("uint16_col", IntegerType),  // UInt16 widens
    StructField("uint32_col", LongType),     // UInt32 widens
    StructField("uint64_col", DecimalType(20, 0)), // UInt64 → NUMERIC(20)
    StructField("float32_col", FloatType),
    StructField("float64_col", DoubleType),
    StructField("date32_col", DateType),
    StructField("date64_col", DateType),
    StructField("binary_col", BinaryType),
    StructField("large_binary_col", BinaryType),
    StructField("utf8_col", StringType),
    StructField("large_utf8_col", StringType)))

  private def dec20(s: String) = new java.math.BigDecimal(s)

  private val corpus17Rows = Seq(
    Row(true, 1.toByte, 1.toShort, 1, 1L, 1.toShort, 1, 1L, dec20("1"),
      1.0f, 1.0, LocalDate.of(2020, 1, 1), LocalDate.of(2021, 1, 1),
      "hello".getBytes, "hello".getBytes, "Hello", "Hello"),
    Row(true, (-1).toByte, (-1).toShort, -1, -1L, 2.toShort, 2, 2L, dec20("2"),
      -1.0f, -1.0, LocalDate.of(2020, 1, 2), LocalDate.of(2021, 1, 2),
      Array.empty[Byte], Array.empty[Byte], "There", "There"),
    Row(false, 0.toByte, 0.toShort, 0, 0L, 0.toShort, 0, 0L, dec20("0"),
      0.0f, 0.0, LocalDate.of(2020, 1, 3), LocalDate.of(2021, 1, 3),
      "parquet".getBytes, "parquet".getBytes, "World", "World"))

  test("17-type corpus survives parquet write → attach → read") {
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(corpus17Rows, 1), corpus17Schema)
    val path = s"$dir/primitive17"
    df.write.mode("overwrite").parquet(path)
    val back = Catalog.attach(spark, "primitive17", "parquet", Map("files" -> path))
    assert(back.schema === corpus17Schema)
    val rows = back.orderBy("date32_col").collect()
    assert(rows.length === 3)
    val r0 = rows(0)
    assert(r0.getBoolean(0) === true)
    assert(r0.getByte(1) === 1.toByte)
    assert(r0.getDecimal(8) === dec20("1").setScale(0))
    assert(r0.getAs[Array[Byte]]("binary_col").toSeq === "hello".getBytes.toSeq)
    assert(rows(1).getAs[Array[Byte]]("binary_col").length === 0)
    assert(rows.map(_.getString(15)).toSeq === Seq("Hello", "There", "World"))
    assert(rows.map(_.getLong(4)).toSeq === Seq(1L, -1L, 0L))
  }

  // --------------------------------------- 29-type extreme-value corpus
  test("29-type extreme values survive with reference widenings (parquet)") {
    val schema = StructType(Seq(
      StructField("tinyint_col", TypeMap.toSpark("TINYINT")),
      StructField("smallint_col", TypeMap.toSpark("SMALLINT")),
      StructField("integer_col", TypeMap.toSpark("INTEGER")),
      StructField("bigint_col", TypeMap.toSpark("BIGINT")),
      StructField("utinyint_col", TypeMap.toSpark("UTINYINT")),
      StructField("usmallint_col", TypeMap.toSpark("USMALLINT")),
      StructField("uinteger_col", TypeMap.toSpark("UINTEGER")),
      StructField("ubigint_col", TypeMap.toSpark("UBIGINT")),
      StructField("hugeint_col", TypeMap.toSpark("HUGEINT")),
      StructField("float_col", TypeMap.toSpark("FLOAT")),
      StructField("double_col", TypeMap.toSpark("DOUBLE")),
      StructField("decimal_col", TypeMap.toSpark("DECIMAL")),
      StructField("date_col", TypeMap.toSpark("DATE")),
      StructField("time_col", TypeMap.toSpark("TIME")),
      StructField("time_tz_col", TypeMap.toSpark("TIMETZ")),
      StructField("timestamp_col", TypeMap.toSpark("TIMESTAMP")),
      StructField("timestamp_tz_col", TypeMap.toSpark("TIMESTAMPTZ")),
      StructField("interval_col", TypeMap.toSpark("INTERVAL")),
      StructField("varchar_col", TypeMap.toSpark("VARCHAR")),
      StructField("blob_col", TypeMap.toSpark("BLOB")),
      StructField("list_col", TypeMap.toSpark("INTEGER[]")),
      StructField("struct_col", TypeMap.toSpark("STRUCT(a VARCHAR, b VARCHAR)")),
      StructField("uuid_col", TypeMap.toSpark("UUID"))))
    // max-range values from the reference corpus (scan.rs:269-309)
    val row = Row(
      127.toByte, 32767.toShort, Int.MaxValue, Long.MaxValue,
      255.toShort, 65535, 4294967295L,
      dec20("18446744073709551615"),                  // 2^64-1 in NUMERIC(20)
      dec20("9223372036854775808"),                   // 2^63 in NUMERIC(38)
      3.4f, 1.7e308,
      new java.math.BigDecimal("12345.678"),
      LocalDate.of(2023, 6, 27),
      LocalDateTime.of(1970, 1, 1, 12, 34, 56),       // TIME on epoch date
      LocalDateTime.of(1970, 1, 1, 12, 34, 56),       // TIMETZ: zone DROPPED
      LocalDateTime.of(2023, 6, 27, 12, 34, 56),
      Instant.parse("2023-06-27T10:34:56Z"),          // '12:34:56+02' in UTC
      Duration.ofDays(1),
      "text", "blob".getBytes, Seq(1, 2, 3),
      """{"a":"abc","b":"def"}""",                    // STRUCT → JSON render
      "a0eebc99-9c0b-4ef8-bb6d-6bb9bd380a11")
    val path = s"$dir/types29"
    spark.createDataFrame(spark.sparkContext.parallelize(Seq(row), 1), schema)
      .write.mode("overwrite").parquet(path)
    val back = Catalog.attach(spark, "types29", "parquet", Map("files" -> path))
    assert(back.schema === schema)
    val r = back.head()
    assert(r.getAs[java.math.BigDecimal]("ubigint_col") === dec20("18446744073709551615").setScale(0))
    assert(r.getAs[java.math.BigDecimal]("hugeint_col") === dec20("9223372036854775808").setScale(0))
    assert(r.getAs[Long]("bigint_col") === Long.MaxValue)
    assert(r.getAs[Long]("uinteger_col") === 4294967295L)
    assert(r.getAs[LocalDateTime]("time_tz_col") === LocalDateTime.of(1970, 1, 1, 12, 34, 56))
    assert(r.getAs[java.sql.Timestamp]("timestamp_tz_col").toInstant ===
      Instant.parse("2023-06-27T10:34:56Z"))
    assert(r.getAs[Duration]("interval_col") === Duration.ofDays(1))
    assert(r.getAs[scala.collection.Seq[Int]]("list_col") === Seq(1, 2, 3))
    assert(r.getAs[String]("struct_col").contains("\"abc\""))
  }

  test("csv attach with declared DuckDB types applies widenings on real data") {
    // NOTE: DuckDB HUGEINT tops out at 2^127-1 (39 digits) but Spark decimals
    // cap at precision 38 — values beyond 38 digits overflow to NULL. The
    // reference's NUMERIC is unbounded in Postgres; this is a documented
    // engine delta. 2^126 (38 digits) is the widest representable pin.
    val p = writeText(dir, "widen.csv",
      "u,h,d,s\n18446744073709551615,85070591730234615865843651857942052864,2023-06-27,wide\n")
    val df = Catalog.attach(spark, "widen_csv", "csv",
      Map("files" -> p, "header" -> "true",
        "columns" -> "u:UBIGINT,h:HUGEINT,d:DATE,s:VARCHAR"))
    assert(df.schema("u").dataType === DecimalType(20, 0))
    assert(df.schema("h").dataType === DecimalType(38, 0))
    val r = df.head()
    assert(r.getAs[java.math.BigDecimal]("u") === dec20("18446744073709551615").setScale(0))
    assert(r.getAs[java.math.BigDecimal]("h") ===
      dec20("85070591730234615865843651857942052864").setScale(0)) // 2^126
    assert(r.getAs[java.sql.Date]("d").toLocalDate === LocalDate.of(2023, 6, 27))
  }

  test("MAP/ENUM/UNION/BIT rejected at attach time") {
    val p = writeText(dir, "rej.csv", "m\nx\n")
    Seq("MAP(INTEGER, VARCHAR)", "ENUM('a','b')", "UNION(n INTEGER)", "BIT").foreach { t =>
      intercept[TypeMap.UnsupportedTypeException] {
        Catalog.attach(spark, "rej_csv", "csv",
          Map("files" -> p, "header" -> "true", "columns" -> s"m:$t"))
      }
    }
  }
}
