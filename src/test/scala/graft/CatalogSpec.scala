package graft

import graft.catalog.{Catalog, Formats}
import org.apache.spark.sql.types._

class CatalogSpec extends SparkSpec {

  private lazy val dir = tempDir("catalog")
  private lazy val csvPath = writeText(dir, "people.csv",
    "Name,Age,Score\nalice,30,1.5\nbob,25,2.5\ncarol,35,3.5\n")
  private lazy val jsonlPath = writeText(dir, "people.jsonl",
    """{"name":"alice","age":30}
      |{"name":"bob","age":25}
      |""".stripMargin)
  private lazy val jsonArrayPath = writeText(dir, "people.json",
    """[{"name":"alice","age":30},{"name":"bob","age":25}]""")

  test("attach parquet registers a queryable view") {
    val df = Catalog.attach(spark, "li_attach", "parquet",
      Map("files" -> s"$sf/lineitem.parquet"))
    assert(df.count() > 0)
    assert(spark.sql("SELECT count(*) FROM li_attach").head().getLong(0) === df.count())
    Catalog.detach(spark, "li_attach")
  }

  test("attach csv with header + inference") {
    val df = Catalog.attach(spark, "people_csv", "csv",
      Map("files" -> csvPath, "header" -> "true"))
    assert(df.columns.toSeq === Seq("name", "age", "score")) // lowercased by default
    assert(df.schema("age").dataType === IntegerType)
    assert(df.count() === 3)
  }

  test("preserve_casing keeps source column names") {
    val df = Catalog.attach(spark, "people_cased", "csv",
      Map("files" -> csvPath, "header" -> "true", "preserve_casing" -> "true"))
    assert(df.columns.toSeq === Seq("Name", "Age", "Score"))
  }

  test("csv declared columns override inference (DuckDB type names)") {
    val df = Catalog.attach(spark, "people_typed", "csv",
      Map("files" -> csvPath, "header" -> "true",
        "columns" -> "name:VARCHAR,age:SMALLINT,score:DOUBLE"))
    assert(df.schema("age").dataType === ShortType)
    assert(df.schema("score").dataType === DoubleType)
  }

  test("csv all_varchar disables inference") {
    val df = Catalog.attach(spark, "people_varchar", "csv",
      Map("files" -> csvPath, "header" -> "true", "all_varchar" -> "true"))
    assert(df.schema.fields.forall(_.dataType === StringType))
  }

  test("csv skip slices leading lines") {
    val df = Catalog.attach(spark, "people_skip", "csv",
      Map("files" -> csvPath, "skip" -> "2", "header" -> "false"))
    assert(df.count() === 2) // bob, carol
  }

  test("json newline-delimited and array formats") {
    val dl = Catalog.attach(spark, "people_jsonl", "json", Map("files" -> jsonlPath))
    assert(dl.count() === 2)
    val da = Catalog.attach(spark, "people_jsonarr", "json",
      Map("files" -> jsonArrayPath, "format" -> "array"))
    assert(da.count() === 2)
  }

  test("filename and file_row_number metadata columns") {
    val df = Catalog.attach(spark, "li_meta", "parquet",
      Map("files" -> s"$sf/region.parquet", "filename" -> "true", "file_row_number" -> "true"))
    assert(df.columns.contains("filename"))
    assert(df.columns.contains("file_row_number"))
    assert(df.select("filename").head().getString(0).contains("region.parquet"))
  }

  test("select option projects columns") {
    val df = Catalog.attach(spark, "li_proj", "parquet",
      Map("files" -> s"$sf/lineitem.parquet", "select" -> "l_orderkey, l_quantity"))
    assert(df.columns.toSeq === Seq("l_orderkey", "l_quantity"))
  }

  test("multi-file list attaches as one table") {
    val df = Catalog.attach(spark, "multi", "parquet",
      Map("files" -> s"$sf/region.parquet,$sf/region.parquet"))
    assert(df.count() === 2 * spark.read.parquet(s"$sf/region.parquet").count())
  }

  test("unknown option errors and lists valid options") {
    val e = intercept[Catalog.InvalidOptionException] {
      Catalog.attach(spark, "bad", "parquet",
        Map("files" -> "x.parquet", "bogus_option" -> "1"))
    }
    assert(e.getMessage.contains("bogus_option"))
    assert(e.getMessage.contains("valid options"))
  }

  test("missing required option errors") {
    val e = intercept[Catalog.InvalidOptionException] {
      Catalog.attach(spark, "bad2", "parquet", Map("binary_as_string" -> "true"))
    }
    assert(e.getMessage.contains("files"))
  }

  test("reserved table names rejected") {
    intercept[Catalog.ReservedTableNameException] {
      Catalog.attach(spark, "duckdb_tables", "parquet", Map("files" -> "x.parquet"))
    }
  }

  test("unknown format errors; unavailable format capability-gated") {
    intercept[Formats.UnknownFormatException] {
      Catalog.attach(spark, "t", "orc_nope", Map("files" -> "x"))
    }
    // delta/iceberg jars are absent in this container
    if (!Formats.delta.available) {
      intercept[Formats.UnsupportedFormatException] {
        Catalog.attach(spark, "t", "delta", Map("files" -> "x"))
      }
    }
  }

  test("re-attach replaces the view (idempotent by name)") {
    Catalog.attach(spark, "idem", "parquet", Map("files" -> s"$sf/region.parquet"))
    val n1 = spark.sql("SELECT count(*) FROM idem").head().getLong(0)
    Catalog.attach(spark, "idem", "parquet", Map("files" -> s"$sf/nation.parquet"))
    val n2 = spark.sql("SELECT count(*) FROM idem").head().getLong(0)
    assert(n1 !== n2)
  }
}
