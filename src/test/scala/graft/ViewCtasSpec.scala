package graft

import graft.catalog.Catalog

/** Pins CREATE VIEW pushdown behavior (nested views, join views — reference
  * tests/tests/scan.rs:653-691, src/hooks/utility/view.rs:31-98) and the
  * CTAS/COPY passthrough path (scan.rs:315-333) on the Spark engine. */
class ViewCtasSpec extends SparkSpec {

  test("nested views over attached tables resolve transitively") {
    Catalog.attach(spark, "vt_region", "parquet", Map("files" -> s"$sf/region.parquet"))
    spark.sql("CREATE OR REPLACE TEMP VIEW v_r1 AS SELECT r_regionkey, r_name FROM vt_region")
    spark.sql("CREATE OR REPLACE TEMP VIEW v_r2 AS SELECT upper(r_name) AS rn FROM v_r1 WHERE r_regionkey >= 2")
    val names = spark.sql("SELECT rn FROM v_r2 ORDER BY rn").collect().map(_.getString(0))
    assert(names.length === 3)
    assert(names.forall(n => n === n.toUpperCase))
  }

  test("join view over two attached tables") {
    Catalog.attach(spark, "vt_region2", "parquet", Map("files" -> s"$sf/region.parquet"))
    Catalog.attach(spark, "vt_nation", "parquet", Map("files" -> s"$sf/nation.parquet"))
    spark.sql("""CREATE OR REPLACE TEMP VIEW v_joined AS
      SELECT n.n_name, r.r_name FROM vt_nation n JOIN vt_region2 r
      ON n.n_regionkey = r.r_regionkey""")
    assert(spark.sql("SELECT count(*) FROM v_joined").head().getLong(0) === 25)
    // and a view over the join view (nested again)
    spark.sql("CREATE OR REPLACE TEMP VIEW v_counts AS SELECT r_name, count(*) AS n FROM v_joined GROUP BY r_name")
    assert(spark.sql("SELECT sum(n) FROM v_counts").head().getLong(0) === 25)
  }

  test("CREATE OR REPLACE VIEW replaces the definition") {
    spark.range(3).createOrReplaceTempView("v_base")
    spark.sql("CREATE OR REPLACE TEMP VIEW v_swap AS SELECT id FROM v_base WHERE id < 2")
    assert(spark.sql("SELECT count(*) FROM v_swap").head().getLong(0) === 2)
    spark.sql("CREATE OR REPLACE TEMP VIEW v_swap AS SELECT id FROM v_base")
    assert(spark.sql("SELECT count(*) FROM v_swap").head().getLong(0) === 3)
  }

  test("CTAS from an attached table writes parquet and re-reads identically") {
    Catalog.attach(spark, "vt_nation2", "parquet", Map("files" -> s"$sf/nation.parquet"))
    val loc = new java.io.File(tempDir("ctas"), "nation_ctas").getAbsolutePath
    spark.sql("DROP TABLE IF EXISTS nation_ctas")
    spark.sql(s"""CREATE TABLE nation_ctas USING parquet LOCATION '$loc' AS
      SELECT n_nationkey, n_name FROM vt_nation2 WHERE n_regionkey = 0""")
    try {
      val viaTable = spark.sql("SELECT count(*) FROM nation_ctas").head().getLong(0)
      val direct = spark.read.parquet(loc).count()
      assert(viaTable === direct)
      assert(viaTable === 5)
      // the CTAS result joins back against live attached tables
      val joined = spark.sql("""SELECT count(*) FROM nation_ctas c
        JOIN vt_nation2 n ON c.n_nationkey = n.n_nationkey""").head().getLong(0)
      assert(joined === 5)
    } finally spark.sql("DROP TABLE IF EXISTS nation_ctas")
  }

  test("INSERT-free COPY analogue: write.parquet round-trips an attached query") {
    Catalog.attach(spark, "vt_region3", "parquet", Map("files" -> s"$sf/region.parquet"))
    val out = new java.io.File(tempDir("copyout"), "region_copy").getAbsolutePath
    spark.sql("SELECT * FROM vt_region3").write.mode("overwrite").parquet(out)
    assert(spark.read.parquet(out).count() ===
      spark.sql("SELECT count(*) FROM vt_region3").head().getLong(0))
  }
}
