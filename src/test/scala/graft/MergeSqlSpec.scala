package graft

import org.apache.spark.sql.functions._
import graft.sqlapi.SqlApi

/** SQL `MERGE INTO` routing — the delta-spark statement shape parsed in
  * sqlapi and dispatched to the native mergeInto writers. Pins: both
  * formats route; the full clause surface (conditional matched DELETE,
  * conditional INSERT, both BY SOURCE clauses, subquery USING sources,
  * arbitrary aliases) maps 1:1 onto the APIs; and every statement shape
  * the APIs CANNOT express rejects loudly instead of silently re-ordering
  * clause semantics (wrong format, ambiguous cardinality, conditional
  * matched UPDATE, UPDATE-before-DELETE orders, non-identity INSERT). */
class MergeSqlSpec extends SparkSpec {

  private def mkDelta(name: String): String = {
    import spark.implicits._
    val root = tempDir("mergesql").getAbsolutePath + "/t"
    val df = Seq((1L, 10.0, "a"), (2L, 20.0, "b"), (3L, 30.0, "c"))
      .toDF("id", "bal", "seg")
    graft.catalog.Sinks.copyTo(df, root, "delta", Map.empty)
    graft.catalog.Catalog.attach(spark, name, "delta", Map("files" -> root))
    root
  }

  private def rows(name: String): Seq[(Long, Double, String)] =
    spark.table(name).orderBy("id").collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getString(2))).toSeq

  test("delta: matched UPDATE + INSERT * + both BY SOURCE clauses route via SQL") {
    import spark.implicits._
    mkDelta("msql_t1")
    Seq((2L, 99.0, "b2"), (4L, 40.0, "d")).toDF("id", "bal", "seg")
      .createOrReplaceTempView("msql_src1")
    val r = SqlApi.executePg(spark, """
      MERGE INTO msql_t1 AS tgt USING msql_src1 AS src
      ON tgt.id = src.id
      WHEN MATCHED THEN UPDATE SET bal = src.bal
      WHEN NOT MATCHED THEN INSERT *
      WHEN NOT MATCHED BY SOURCE AND tgt.seg = 'a' THEN DELETE
      WHEN NOT MATCHED BY SOURCE AND tgt.seg = 'c'
        THEN UPDATE SET bal = CAST(-1.0 AS DOUBLE)""")
      .collect().head
    assert((r.getLong(0), r.getLong(1)) === (2L, 1L)) // 2 updates (1 matched + 1 by-source), 1 insert
    assert(rows("msql_t1") === Seq((2L, 99.0, "b"), (3L, -1.0, "c"), (4L, 40.0, "d")))
  }

  test("delta: conditional matched DELETE before UPDATE + conditional INSERT + subquery source") {
    mkDelta("msql_t2")
    val r = SqlApi.executePg(spark, """
      MERGE INTO msql_t2 t
      USING (SELECT id, bal * 2 AS bal, seg FROM msql_t2 WHERE id <= 2) s
      ON t.id = s.id
      WHEN MATCHED AND s.bal > 30 THEN DELETE
      WHEN MATCHED THEN UPDATE SET bal = s.bal
      WHEN NOT MATCHED AND s.bal > 1000 THEN INSERT (id, bal, seg) VALUES (s.id, s.bal, s.seg)""")
      .collect().head
    // id=2 (40 > 30) deletes, id=1 updates to 20, nothing inserts
    assert(rows("msql_t2") === Seq((1L, 20.0, "a"), (3L, 30.0, "c")))
  }

  test("iceberg: MERGE routes to the merge-on-read writer") {
    import spark.implicits._
    val root = tempDir("mergesql").getAbsolutePath + "/ice"
    val df = Seq((1L, 10.0, "a"), (2L, 20.0, "b")).toDF("id", "bal", "seg")
    graft.catalog.Sinks.copyTo(df, root, "iceberg", Map.empty)
    graft.catalog.Catalog.attach(spark, "msql_ice", "iceberg", Map("files" -> root))
    Seq((2L, 99.0, "b2"), (5L, 50.0, "e")).toDF("id", "bal", "seg")
      .createOrReplaceTempView("msql_icesrc")
    SqlApi.executePg(spark, """
      MERGE INTO msql_ice t USING msql_icesrc s ON t.id = s.id
      WHEN MATCHED THEN UPDATE SET bal = s.bal
      WHEN NOT MATCHED THEN INSERT *""")
    assert(rows("msql_ice") === Seq((1L, 10.0, "a"), (2L, 99.0, "b"), (5L, 50.0, "e")))
  }

  test("inexpressible statement shapes reject loudly") {
    import spark.implicits._
    mkDelta("msql_t3")
    Seq((2L, 99.0, "b2")).toDF("id", "bal", "seg")
      .createOrReplaceTempView("msql_src3")
    def rejects(sql: String, needle: String): Unit = {
      val e = intercept[IllegalArgumentException] { SqlApi.executePg(spark, sql) }
      assert(e.getMessage.contains(needle), s"got: ${e.getMessage}")
    }
    // conditional matched UPDATE has no API rendering
    rejects("""MERGE INTO msql_t3 t USING msql_src3 s ON t.id = s.id
      WHEN MATCHED AND s.bal > 5 THEN UPDATE SET bal = s.bal""",
      "no native-writer rendering")
    // matched UPDATE listed before the conditional DELETE (first-match drift)
    rejects("""MERGE INTO msql_t3 t USING msql_src3 s ON t.id = s.id
      WHEN MATCHED THEN UPDATE SET bal = s.bal
      WHEN MATCHED AND s.bal > 5 THEN DELETE""",
      "list the DELETE")
    // by-source UPDATE listed before the DELETE
    rejects("""MERGE INTO msql_t3 t USING msql_src3 s ON t.id = s.id
      WHEN NOT MATCHED BY SOURCE AND t.seg = 'c' THEN UPDATE SET bal = CAST(0.0 AS DOUBLE)
      WHEN NOT MATCHED BY SOURCE AND t.seg = 'a' THEN DELETE""",
      "DELETE clause first")
    // non-identity INSERT projection
    rejects("""MERGE INTO msql_t3 t USING msql_src3 s ON t.id = s.id
      WHEN NOT MATCHED THEN INSERT (id, bal, seg) VALUES (s.id, s.bal + 1, s.seg)""",
      "identity INSERT")
    // unconditional matched DELETE shadowing an UPDATE
    rejects("""MERGE INTO msql_t3 t USING msql_src3 s ON t.id = s.id
      WHEN MATCHED THEN DELETE
      WHEN MATCHED THEN UPDATE SET bal = s.bal""",
      "unreachable")
    // not an attached foreign table
    rejects("""MERGE INTO msql_nosuch t USING msql_src3 s ON t.id = s.id
      WHEN MATCHED THEN UPDATE SET bal = s.bal""",
      "not an attached foreign table")
  }

  test("iceberg conditional clauses route (matched DELETE + gated INSERT); cardinality rejects") {
    import spark.implicits._
    val root = tempDir("mergesql").getAbsolutePath + "/ice2"
    graft.catalog.Sinks.copyTo(
      Seq((1L, 10.0, "a"), (2L, 20.0, "b"), (3L, 30.0, "c")).toDF("id", "bal", "seg"),
      root, "iceberg", Map.empty)
    graft.catalog.Catalog.attach(spark, "msql_ice2", "iceberg", Map("files" -> root))
    Seq((1L, 99.0, "x"), (2L, 5.0, "y"), (7L, 70.0, "g"), (8L, 1.0, "h"))
      .toDF("id", "bal", "seg").createOrReplaceTempView("msql_icesrc2")
    SqlApi.executePg(spark, """MERGE INTO msql_ice2 t USING msql_icesrc2 s ON t.id = s.id
      WHEN MATCHED AND s.bal > 50 THEN DELETE
      WHEN MATCHED THEN UPDATE SET bal = s.bal
      WHEN NOT MATCHED AND s.bal > 10 THEN INSERT *""")
    // id=1 deletes (99>50), id=2 updates to 5, id=7 inserts (70>10),
    // id=8 does NOT insert (1<=10), id=3 carries
    assert(rows("msql_ice2") === Seq((2L, 5.0, "b"), (3L, 30.0, "c"), (7L, 70.0, "g")))
    // two source rows on one target row — the writer's cardinality rule
    mkDelta("msql_t4")
    Seq((2L, 1.0, "x"), (2L, 2.0, "y")).toDF("id", "bal", "seg")
      .createOrReplaceTempView("msql_src4")
    val e2 = intercept[Exception] {
      SqlApi.executePg(spark, """MERGE INTO msql_t4 t USING msql_src4 s ON t.id = s.id
        WHEN MATCHED THEN UPDATE SET bal = s.bal""")
    }
    assert(e2.getMessage.contains("ambiguous"))
  }

  test("iceberg CDC-apply via SQL: extra source columns visible to conditions") {
    import spark.implicits._
    val root = tempDir("mergesql").getAbsolutePath + "/ice3"
    graft.catalog.Sinks.copyTo(
      Seq((1L, 10.0, "a"), (2L, 20.0, "b")).toDF("id", "bal", "seg"),
      root, "iceberg", Map.empty)
    graft.catalog.Catalog.attach(spark, "msql_ice3", "iceberg", Map("files" -> root))
    Seq((1L, 0.0, "a", "delete"), (2L, 99.0, "b", "update"), (5L, 50.0, "e", "insert"),
        (6L, 60.0, "f", "delete"))
      .toDF("id", "bal", "seg", "op").createOrReplaceTempView("msql_icesrc3")
    SqlApi.executePg(spark, """MERGE INTO msql_ice3 t USING msql_icesrc3 s ON t.id = s.id
      WHEN MATCHED AND s.op = 'delete' THEN DELETE
      WHEN MATCHED THEN UPDATE SET bal = s.bal
      WHEN NOT MATCHED AND s.op != 'delete' THEN INSERT (id, bal, seg) VALUES (s.id, s.bal, s.seg)""")
    assert(rows("msql_ice3") === Seq((2L, 99.0, "b"), (5L, 50.0, "e")))
  }
}
