package graft

import graft.catalog.Catalog
import graft.sqlapi.SqlApi

/** The reference's own test SQL, run through `executePg` unchanged — the
  * normalizer is validated against real reference inputs, not synthetic
  * ones. Statements and the 3-row `primitive` fixture are transcribed from
  * /root/reference/tests/tests/scan.rs:336-501,
  * tests/tests/json.rs:295-305, tests/tests/datetime.rs:56, and
  * tests/tests/fixtures/arrow.rs:167-213 (values: ints 1/-1/0, uints 1/2/0,
  * dates 2020-01-01.., timestamps 2021-01-01.., binaries
  * 'hello'/''/'parquet', strings Hello/There/World).
  *
  * Fixtures are written to parquet and registered through `Catalog.attach` —
  * the engine's CREATE FOREIGN TABLE — matching the reference's FDW tables
  * (each test there attaches a parquet file through the wrapper), so every
  * statement exercises the dialect layer AND the attach path end-to-end.
  *
  * Harness substitution (a documented delta, not a dialect gap):
  * `CREATE TABLE t1 (a int)` → an empty temp view (this engine's DDL
  * surface is ViewCtasSpec's; the corpus targets query dialect).
  */
class PgDialectCorpusSpec extends SparkSpec {

  private lazy val fixture: Unit = {
    val dir = tempDir("pgcorpus")
    spark.sql("""
      SELECT * FROM VALUES
        (true,  CAST(1  AS TINYINT), CAST(1  AS SMALLINT), 1,  CAST(1  AS BIGINT),
         CAST(1 AS SMALLINT), 1, CAST(1 AS BIGINT), CAST(1 AS BIGINT),
         CAST(1.0 AS FLOAT), CAST(1.0 AS DOUBLE),
         DATE'2020-01-01', TIMESTAMP'2021-01-01 00:00:00',
         CAST('hello' AS BINARY), CAST('hello' AS BINARY), 'Hello', 'Hello'),
        (true,  CAST(-1 AS TINYINT), CAST(-1 AS SMALLINT), -1, CAST(-1 AS BIGINT),
         CAST(2 AS SMALLINT), 2, CAST(2 AS BIGINT), CAST(2 AS BIGINT),
         CAST(-1.0 AS FLOAT), CAST(-1.0 AS DOUBLE),
         DATE'2020-01-02', TIMESTAMP'2021-01-02 00:00:00',
         CAST('' AS BINARY), CAST('' AS BINARY), 'There', 'There'),
        (false, CAST(0  AS TINYINT), CAST(0  AS SMALLINT), 0,  CAST(0  AS BIGINT),
         CAST(0 AS SMALLINT), 0, CAST(0 AS BIGINT), CAST(0 AS BIGINT),
         CAST(0.0 AS FLOAT), CAST(0.0 AS DOUBLE),
         DATE'2020-01-03', TIMESTAMP'2021-01-03 00:00:00',
         CAST('parquet' AS BINARY), CAST('parquet' AS BINARY), 'World', 'World')
      AS t(boolean_col, int8_col, int16_col, int32_col, int64_col,
           uint8_col, uint16_col, uint32_col, uint64_col,
           float32_col, float64_col, date32_col, date64_col,
           binary_col, large_binary_col, utf8_col, large_utf8_col)
      """).write.mode("overwrite").parquet(s"$dir/primitive.parquet")
    Catalog.attach(spark, "primitive", "parquet", Map("files" -> s"$dir/primitive.parquet"))
    spark.sql("SELECT CAST(1 AS INT) AS a WHERE false").createOrReplaceTempView("t1")
  }

  private lazy val jsonFixture: Unit = {
    val dir = tempDir("pgjson")
    spark.sql("""SELECT '{"name": "joe", "age": 12}' AS string_col,
                        '{"name": "joe", "age": 12}' AS large_string_col""")
      .write.mode("overwrite").parquet(s"$dir/json_table.parquet")
    Catalog.attach(spark, "json_table", "parquet", Map("files" -> s"$dir/json_table.parquet"))
  }

  // (where-clause, expected int32_col) pairs verbatim from
  // test_quals_pushdown's test_case table (scan.rs:351-387)
  private val quals: Seq[(String, Int)] = Seq(
    ("boolean_col = false", 0),
    ("int8_col = -1", -1),
    ("int16_col = 0", 0),
    ("int32_col = 1", 1),
    ("int64_col = -1", -1),
    ("uint8_col = 0", 0),
    ("uint16_col = 1", 1),
    ("uint32_col = 2", -1),
    ("uint64_col = 0", 0),
    ("float32_col = 1.0", 1),
    ("float64_col = -1.0", -1),
    ("date32_col = '2020-01-01'", 1),
    ("date64_col = '2021-01-02'", -1),
    ("binary_col = decode(encode('hello', 'hex'),'hex')", 1),
    ("binary_col = E''", -1),
    ("large_binary_col = '\\x68656C6C6F'", 1),
    ("large_binary_col = '\\x70617271756574'", 0),
    ("utf8_col = 'Hello'", 1),
    ("utf8_col = 'There'", -1),
    ("large_utf8_col = 'Hello'", 1),
    ("large_utf8_col = 'World'", 0))

  test("reference quals corpus: every statement executes with the PG result") {
    fixture
    quals.foreach { case (clause, expected) =>
      val q = s"SELECT int32_col from primitive LEFT JOIN t1 on true WHERE $clause"
      val rows = SqlApi.executePg(spark, q).collect()
      assert(rows.length === 1, s"\nclause: $clause")
      assert(rows.head.getInt(0) === expected, s"\nclause: $clause")
    }
  }

  test("reference complex-quals corpus statement (scan.rs:425-465)") {
    fixture
    val q = """SELECT int64_col
            FROM primitive LEFT JOIN t1 ON true
        WHERE (
            boolean_col = TRUE
            AND int8_col = 1
            AND int16_col = 1
            AND int32_col = 1
            AND int64_col = 1
            AND uint8_col = 1
            AND uint16_col = 1
            AND uint32_col = 1
            AND uint64_col = 1
            AND float32_col = 1.0
            AND float64_col = 1.0
            AND date32_col = DATE '2020-01-01'
            AND date64_col = TIMESTAMP '2021-01-01'
            AND binary_col = E'\\x68656c6c6f'
            AND large_binary_col = E'\\x68656c6c6f'
            AND utf8_col = 'Hello'
            AND large_utf8_col = 'Hello'
        )
        OR (
            boolean_col = FALSE
            AND int8_col = 0
            AND int16_col = 0
            AND int32_col = 0
            AND int64_col = 0
            AND uint8_col = 0
            AND uint16_col = 0
            AND uint32_col = 0
            AND uint64_col = 0
            AND float32_col = 0.0
            AND float64_col = 0.0
            AND date32_col = DATE '2020-01-03'
            AND date64_col = TIMESTAMP '2021-01-03'
            AND binary_col = E'\\x70617271756574'
            AND large_binary_col = E'\\x70617271756574'
            AND utf8_col = 'World'
            AND large_utf8_col = 'World'
        )"""
    val vals = SqlApi.executePg(spark, q).collect().map(_.getLong(0)).sorted.toSeq
    assert(vals === Seq(0L, 1L))
  }

  test("reference json-operator corpus (json.rs:295-305)") {
    jsonFixture
    val r1 = SqlApi.executePg(spark,
      "SELECT string_col::json->>'name', large_string_col::json->>'age' FROM json_table")
      .collect()
    assert(r1.length === 1)
    assert(r1.head.getString(0) === "joe")
    assert(r1.head.getString(1) === "12")
    val r2 = SqlApi.executePg(spark,
      "SELECT string_col::jsonb->>'name', large_string_col::jsonb->>'age' FROM json_table")
      .collect()
    assert(r2.head.getString(0) === "joe")
    assert(r2.head.getString(1) === "12")
    val r3 = SqlApi.executePg(spark,
      "SELECT string_col::json, large_string_col::jsonb FROM json_table").collect()
    assert(r3.head.getString(0) === """{"name": "joe", "age": 12}""")
    assert(r3.head.getString(1) === """{"name": "joe", "age": 12}""")
  }

  test("reference date_trunc corpus statement (datetime.rs:56)") {
    val dir = tempDir("pgdt")
    spark.sql("SELECT TIMESTAMP'2023-06-27 12:34:56' AS timestamp_col")
      .write.mode("overwrite").parquet(s"$dir/duckdb_types_test.parquet")
    Catalog.attach(spark, "duckdb_types_test", "parquet",
      Map("files" -> s"$dir/duckdb_types_test.parquet"))
    // the reference statement, verbatim
    assert(SqlApi.executePg(spark,
      "SELECT date_trunc('day', timestamp_col) FROM duckdb_types_test").collect().length === 1)
    // value check stays in-engine (TZ-proof): truncation lands on midnight
    assert(SqlApi.executePg(spark,
      "SELECT date_trunc('day', timestamp_col) = TIMESTAMP'2023-06-27 00:00:00' " +
        "FROM duckdb_types_test").head().getBoolean(0))
  }

  test("bare read_parquet/read_csv/read_json map to Spark path tables") {
    val q = SqlApi.executePg(spark,
      s"SELECT count(*) AS n FROM read_parquet('$sf/region.parquet')")
    assert(q.head().getLong(0) === 5)
    // optioned forms do NOT silently half-rewrite — Spark reports the
    // original text
    intercept[Exception] {
      SqlApi.executePg(spark,
        s"SELECT * FROM read_csv('$sf/x.csv', header=true)").collect()
    }
  }

  test("prepared-statement $n inside string literals stays literal text") {
    val reg = SqlApi.newPreparedRegistry()
    reg.prepare("p_lit",
      "SELECT utf8_col, 'price: $5' AS tag FROM primitive WHERE int32_col = $1")
    fixture
    val rows = reg.execute(spark, "p_lit", Seq(1)).collect()
    assert(rows.length === 1)
    assert(rows.head.getString(0) === "Hello")
    assert(rows.head.getString(1) === "price: $5")
  }
}
