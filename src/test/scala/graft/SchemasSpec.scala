package graft

import graft.catalog.Schemas
import graft.sqlapi.SqlApi

/** Pins the reference's search_path semantics (tests/tests/scan.rs:504-559:
  * resolution follows the path order; 600-650: prepared statements
  * re-resolve after a path change). */
class SchemasSpec extends SparkSpec {

  test("unqualified names resolve by search path order") {
    val schemas = Schemas(spark)
    schemas.attachIn("s1", "sp_t", "parquet", Map("files" -> s"$sf/region.parquet"))
    schemas.attachIn("s2", "sp_t", "parquet", Map("files" -> s"$sf/nation.parquet"))
    schemas.setSearchPath(Seq("s1", "s2"))
    assert(spark.sql("SELECT count(*) FROM sp_t").head().getLong(0) === 5)  // region
    schemas.setSearchPath(Seq("s2", "s1"))
    assert(spark.sql("SELECT count(*) FROM sp_t").head().getLong(0) === 25) // nation
  }

  test("name off the path is not visible; qualified access still works") {
    val schemas = Schemas(spark)
    schemas.attachIn("only", "sp_hidden", "parquet", Map("files" -> s"$sf/region.parquet"))
    schemas.setSearchPath(Seq("elsewhere"))
    intercept[Exception] { spark.sql("SELECT count(*) FROM sp_hidden").collect() }
    assert(schemas.table("only", "sp_hidden").count() === 5)
    intercept[IllegalArgumentException] { schemas.table("nope", "sp_hidden") }
  }

  test("setSearchPath never drops a user's own same-named temp view") {
    val schemas = Schemas(spark)
    // the user makes their own temp view, never through the registry
    spark.range(3).createOrReplaceTempView("sp_foreign")
    // a registry table of a DIFFERENT name comes and goes off-path
    schemas.attachIn("fx", "sp_reg", "parquet", Map("files" -> s"$sf/region.parquet"))
    schemas.setSearchPath(Seq("nowhere"))
    // registry view dropped, the user's view untouched
    intercept[Exception] { spark.sql("SELECT count(*) FROM sp_reg").collect() }
    assert(spark.sql("SELECT count(*) FROM sp_foreign").head().getLong(0) === 3)
    // now the user shadows a REGISTERED name while it is off-path: a later
    // path change must not destroy their view either
    spark.range(4).createOrReplaceTempView("sp_reg")
    schemas.setSearchPath(Seq("elsewhere"))
    assert(spark.sql("SELECT count(*) FROM sp_reg").head().getLong(0) === 4)
  }

  test("prepared statements re-resolve after a search path change (scan.rs:600-650)") {
    val schemas = Schemas(spark)
    schemas.attachIn("pa", "sp_p", "parquet", Map("files" -> s"$sf/region.parquet"))
    schemas.attachIn("pb", "sp_p", "parquet", Map("files" -> s"$sf/nation.parquet"))
    val reg = SqlApi.newPreparedRegistry()
    reg.prepare("q", "SELECT count(*) AS n FROM sp_p")
    schemas.setSearchPath(Seq("pa", "pb"))
    assert(reg.execute(spark, "q").head().getLong(0) === 5)
    schemas.setSearchPath(Seq("pb", "pa"))
    assert(reg.execute(spark, "q").head().getLong(0) === 25)
  }

  test("detach refreshes resolution to the next schema on the path") {
    val schemas = Schemas(spark)
    schemas.attachIn("d1", "sp_d", "parquet", Map("files" -> s"$sf/region.parquet"))
    schemas.attachIn("d2", "sp_d", "parquet", Map("files" -> s"$sf/nation.parquet"))
    schemas.setSearchPath(Seq("d1", "d2"))
    assert(spark.sql("SELECT count(*) FROM sp_d").head().getLong(0) === 5)
    schemas.detach("d1", "sp_d")
    assert(spark.sql("SELECT count(*) FROM sp_d").head().getLong(0) === 25)
  }
}
