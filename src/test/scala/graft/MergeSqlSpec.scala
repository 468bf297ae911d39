package graft

import org.apache.spark.sql.functions._
import graft.sqlapi.SqlApi

/** SQL `MERGE INTO` routing — the delta-spark statement shape parsed in
  * sqlapi and dispatched to the native mergeInto writers. Pins: both
  * formats route; the full clause surface maps onto the APIs — ANY
  * number of conditional UPDATE/DELETE clauses per family (MATCHED and
  * NOT MATCHED BY SOURCE) and ANY number of conditional INSERT clauses,
  * all in statement order under SQL first-match semantics, each UPDATE
  * clause applying its own SET and each INSERT clause its own projection
  * (identity or computed, omitted columns NULL-filled); subquery USING
  * sources, arbitrary aliases (alias-shaped tokens inside string
  * literals untouched), CASE in ON; NULL-evaluating clause conditions
  * are NOT satisfied (the row falls through, SQL rule); and malformed
  * shapes reject loudly (wrong format, ambiguous cardinality,
  * unknown/duplicate INSERT columns). */
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

  test("malformed statement shapes reject loudly") {
    import spark.implicits._
    mkDelta("msql_t3")
    Seq((2L, 99.0, "b2")).toDF("id", "bal", "seg")
      .createOrReplaceTempView("msql_src3")
    def rejects(sql: String, needle: String): Unit = {
      val e = intercept[IllegalArgumentException] { SqlApi.executePg(spark, sql) }
      assert(e.getMessage.contains(needle), s"got: ${e.getMessage}")
    }
    // INSERT naming a column the table does not have
    rejects("""MERGE INTO msql_t3 t USING msql_src3 s ON t.id = s.id
      WHEN NOT MATCHED THEN INSERT (id, nosuch) VALUES (s.id, s.bal)""",
      "not in the table schema")
    // INSERT listing a column twice
    rejects("""MERGE INTO msql_t3 t USING msql_src3 s ON t.id = s.id
      WHEN NOT MATCHED THEN INSERT (id, id) VALUES (s.id, s.id)""",
      "twice")
    // column/value count mismatch
    rejects("""MERGE INTO msql_t3 t USING msql_src3 s ON t.id = s.id
      WHEN NOT MATCHED THEN INSERT (id, bal) VALUES (s.id)""",
      "counts differ")
    // not an attached foreign table
    rejects("""MERGE INTO msql_nosuch t USING msql_src3 s ON t.id = s.id
      WHEN MATCHED THEN UPDATE SET bal = s.bal""",
      "not an attached foreign table")
    // a non-final unconditional clause makes later family clauses dead —
    // the delta-spark reachability rule rejects the typo loudly
    rejects("""MERGE INTO msql_t3 t USING msql_src3 s ON t.id = s.id
      WHEN MATCHED THEN DELETE
      WHEN MATCHED AND s.bal > 10 THEN UPDATE SET bal = s.bal""",
      "unreachable")
    rejects("""MERGE INTO msql_t3 t USING msql_src3 s ON t.id = s.id
      WHEN NOT MATCHED THEN INSERT *
      WHEN NOT MATCHED AND s.bal > 10 THEN INSERT (id) VALUES (s.id)""",
      "unreachable")
    // an unbalanced CASE (stray unquoted token named `case`) names itself
    // instead of the generic clause-head error
    rejects("""MERGE INTO msql_t3 t USING msql_src3 s ON t.id = case
      WHEN MATCHED THEN UPDATE SET bal = s.bal""",
      "unbalanced CASE")
  }

  test("conditional matched UPDATE + first-match order: UPDATE listed first wins") {
    import spark.implicits._
    mkDelta("msql_t5")
    // op drives the clauses; the source need not carry the table's
    // columns when no identity INSERT clause is present
    Seq((1L, 100.0, "up"), (2L, 200.0, "dl"), (3L, 300.0, null.asInstanceOf[String]))
      .toDF("id", "bal2", "op").createOrReplaceTempView("msql_src5")
    SqlApi.executePg(spark, """
      MERGE INTO msql_t5 t USING msql_src5 s ON t.id = s.id
      WHEN MATCHED AND s.op = 'up' THEN UPDATE SET bal = s.bal2
      WHEN MATCHED AND s.op <> 'xx' THEN DELETE""")
    // id=1: update cond true (listed first) → updates even though the
    // delete cond also holds; id=2: update false, delete true → deleted;
    // id=3: op NULL → both conditions NULL ⇒ NOT satisfied → carries
    assert(rows("msql_t5") === Seq((1L, 100.0, "a"), (3L, 30.0, "c")))
  }

  test("first-match order: DELETE listed first wins; NULL conditions fall through") {
    import spark.implicits._
    mkDelta("msql_t6")
    Seq((1L, 100.0, "dl"), (2L, 200.0, "up"), (3L, 300.0, null.asInstanceOf[String]))
      .toDF("id", "bal2", "op").createOrReplaceTempView("msql_src6")
    SqlApi.executePg(spark, """
      MERGE INTO msql_t6 t USING msql_src6 s ON t.id = s.id
      WHEN MATCHED AND s.op = 'dl' THEN DELETE
      WHEN MATCHED AND s.bal2 > 0 THEN UPDATE SET bal = s.bal2""")
    // id=1 deletes (both hold, DELETE first); id=2 updates; id=3: delete
    // cond NULL ⇒ falls through to the UPDATE clause (bal2 > 0 holds)
    assert(rows("msql_t6") === Seq((2L, 200.0, "b"), (3L, 300.0, "c")))
  }

  test("by-source first-match: UPDATE listed first claims rows satisfying both") {
    import spark.implicits._
    mkDelta("msql_t9")
    Seq((2L, 0.0, "zz")).toDF("id", "bal", "seg")
      .createOrReplaceTempView("msql_src9")
    SqlApi.executePg(spark, """
      MERGE INTO msql_t9 t USING msql_src9 s ON t.id = s.id
      WHEN NOT MATCHED BY SOURCE AND t.seg = 'a' THEN UPDATE SET bal = CAST(0.0 AS DOUBLE)
      WHEN NOT MATCHED BY SOURCE THEN DELETE""")
    // id=1 (seg a, unmatched): update cond true AND the unconditional
    // delete also applies — UPDATE listed first wins; id=3 deletes;
    // id=2 matched → carries
    assert(rows("msql_t9") === Seq((1L, 0.0, "a"), (2L, 20.0, "b")))
  }

  test("non-identity INSERT projection: reordered, computed, omitted columns NULL-fill") {
    import spark.implicits._
    mkDelta("msql_t7")
    Seq((2L, 99.0), (4L, 40.0)).toDF("k", "amount")
      .createOrReplaceTempView("msql_src7")
    SqlApi.executePg(spark, """
      MERGE INTO msql_t7 t USING msql_src7 s ON t.id = s.k
      WHEN MATCHED THEN UPDATE SET bal = s.amount
      WHEN NOT MATCHED THEN INSERT (bal, id) VALUES (s.amount * 2, s.k + 100)""")
    val got = spark.table("msql_t7").orderBy("id").collect()
      .map(r => (r.getLong(0), r.getDouble(1),
        if (r.isNullAt(2)) None else Some(r.getString(2)))).toSeq
    // id=2 updates; id=4 unmatched → inserts as id 104 with the computed
    // bal and the omitted seg NULL-filled (a NOT NULL omitted column
    // rejects loudly via the writer's constraint check instead)
    assert(got === Seq((1L, 10.0, Some("a")), (2L, 99.0, Some("b")),
      (3L, 30.0, Some("c")), (104L, 80.0, None)))
  }

  test("iceberg: non-identity INSERT projection + conditional UPDATE route") {
    import spark.implicits._
    val root = tempDir("mergesql").getAbsolutePath + "/ice4"
    graft.catalog.Sinks.copyTo(
      Seq((1L, 10.0, "a"), (2L, 20.0, "b")).toDF("id", "bal", "seg"),
      root, "iceberg", Map.empty)
    graft.catalog.Catalog.attach(spark, "msql_ice4", "iceberg", Map("files" -> root))
    Seq((1L, 11.0, "up"), (2L, 22.0, null.asInstanceOf[String]), (9L, 90.0, "in"))
      .toDF("k", "amount", "op").createOrReplaceTempView("msql_icesrc4")
    SqlApi.executePg(spark, """
      MERGE INTO msql_ice4 t USING msql_icesrc4 s ON t.id = s.k
      WHEN MATCHED AND s.op = 'up' THEN UPDATE SET bal = s.amount
      WHEN NOT MATCHED AND s.op = 'in' THEN INSERT (id, bal) VALUES (s.k, s.amount / 2)""")
    val got = spark.table("msql_ice4").orderBy("id").collect()
      .map(r => (r.getLong(0), r.getDouble(1),
        if (r.isNullAt(2)) None else Some(r.getString(2)))).toSeq
    // id=1 updates (op 'up'); id=2: op NULL ⇒ carries; id=9 inserts with
    // seg NULL-filled
    assert(got === Seq((1L, 11.0, Some("a")), (2L, 20.0, Some("b")),
      (9L, 45.0, None)))
  }

  test("alias-shaped tokens inside string literals survive the rewrite") {
    import spark.implicits._
    mkDelta("msql_t8")
    Seq((2L, 0.0)).toDF("id", "x").createOrReplaceTempView("msql_src8")
    SqlApi.executePg(spark, """
      MERGE INTO msql_t8 AS tt USING msql_src8 AS ss ON tt.id = ss.id
      WHEN MATCHED THEN UPDATE SET seg = 'per tt. policy see ss. note'""")
    val seg = spark.table("msql_t8").filter(col("id") === 2L)
      .select("seg").collect().head.getString(0)
    assert(seg === "per tt. policy see ss. note")
  }

  test("multiple conditional UPDATE clauses: first-match picks the claiming SET") {
    import spark.implicits._
    mkDelta("msql_t11")
    Seq((1L, "dbl"), (2L, "neg"), (3L, "zz")).toDF("id", "op")
      .createOrReplaceTempView("msql_src11")
    SqlApi.executePg(spark, """
      MERGE INTO msql_t11 t USING msql_src11 s ON t.id = s.id
      WHEN MATCHED AND s.op = 'dbl' THEN UPDATE SET bal = t.bal * 2
      WHEN MATCHED AND s.op = 'neg' THEN UPDATE SET bal = -t.bal, seg = 'n'
      WHEN MATCHED THEN DELETE""")
    // id=1 → first clause (bal doubles); id=2 → second clause (negated,
    // seg reset — each clause's OWN SET applies); id=3 → neither update
    // condition holds, falls to the trailing unconditional DELETE
    assert(rows("msql_t11") === Seq((1L, 20.0, "a"), (2L, -20.0, "n")))
  }

  test("iceberg: three matched clauses, overlapping conditions, NULL falls to the last") {
    import spark.implicits._
    val root = tempDir("mergesql").getAbsolutePath + "/ice5"
    graft.catalog.Sinks.copyTo(
      Seq((1L, 10.0, "a"), (2L, 20.0, "b"), (3L, 30.0, "c"), (4L, 40.0, "d"))
        .toDF("id", "bal", "seg"),
      root, "iceberg", Map.empty)
    graft.catalog.Catalog.attach(spark, "msql_ice5", "iceberg", Map("files" -> root))
    Seq((1L, Some(5.0)), (2L, Some(25.0)), (3L, Some(35.0)), (4L, None))
      .toDF("id", "v").createOrReplaceTempView("msql_icesrc5")
    SqlApi.executePg(spark, """
      MERGE INTO msql_ice5 t USING msql_icesrc5 s ON t.id = s.id
      WHEN MATCHED AND s.v > 30 THEN DELETE
      WHEN MATCHED AND s.v > 20 THEN UPDATE SET bal = s.v
      WHEN MATCHED THEN UPDATE SET bal = CAST(0.0 AS DOUBLE)""")
    // id=3: v=35 satisfies BOTH the delete and the second update — the
    // DELETE is listed first and claims it; id=2: 25 → second clause;
    // id=1: 5 → last clause; id=4: v NULL → both conditional gates are
    // NOT satisfied (SQL NULL rule), falls to the unconditional last
    assert(rows("msql_ice5") === Seq((1L, 0.0, "a"), (2L, 25.0, "b"), (4L, 0.0, "d")))
  }

  test("multiple NOT MATCHED BY SOURCE clauses: first-match across UPDATE/UPDATE/DELETE") {
    import spark.implicits._
    mkDelta("msql_t12")
    Seq((2L, 0.0, "x")).toDF("id", "bal", "seg")
      .createOrReplaceTempView("msql_src12")
    SqlApi.executePg(spark, """
      MERGE INTO msql_t12 t USING msql_src12 s ON t.id = s.id
      WHEN NOT MATCHED BY SOURCE AND t.seg = 'a' THEN UPDATE SET bal = CAST(1.0 AS DOUBLE)
      WHEN NOT MATCHED BY SOURCE AND t.bal > 5 THEN UPDATE SET bal = CAST(2.0 AS DOUBLE)
      WHEN NOT MATCHED BY SOURCE THEN DELETE""")
    // id=1 (seg a, bal 10) satisfies BOTH update clauses — the first
    // claims it; id=3 (seg c): second claims; id=2 is matched → carries;
    // the trailing unconditional DELETE claims nothing (all unmatched
    // rows were taken by earlier clauses)
    assert(rows("msql_t12") === Seq((1L, 1.0, "a"), (2L, 20.0, "b"), (3L, 2.0, "c")))
  }

  test("multiple NOT MATCHED INSERT clauses: first-match picks the projection") {
    import spark.implicits._
    mkDelta("msql_t13")
    Seq((10L, 1.0, "hi"), (11L, 2.0, "lo"), (12L, 3.0, "zz"))
      .toDF("id", "bal", "tag").createOrReplaceTempView("msql_src13")
    SqlApi.executePg(spark, """
      MERGE INTO msql_t13 t USING msql_src13 s ON t.id = s.id
      WHEN NOT MATCHED AND s.tag = 'hi' THEN INSERT (id, bal, seg) VALUES (s.id, s.bal * 10, 'H')
      WHEN NOT MATCHED AND s.tag <> 'zz' THEN INSERT (id, bal) VALUES (s.id + 100, s.bal)""")
    val got = spark.table("msql_t13").orderBy("id").collect()
      .map(r => (r.getLong(0), r.getDouble(1),
        if (r.isNullAt(2)) None else Some(r.getString(2)))).toSeq
    // id=10 satisfies both insert clauses — the FIRST projection applies;
    // id=11 only the second (seg NULL-fills); id=12 neither → no insert
    assert(got === Seq((1L, 10.0, Some("a")), (2L, 20.0, Some("b")),
      (3L, 30.0, Some("c")), (10L, 10.0, Some("H")), (111L, 2.0, None)))
  }

  test("iceberg: multiple NOT MATCHED INSERT clauses route") {
    import spark.implicits._
    val root = tempDir("mergesql").getAbsolutePath + "/ice6"
    graft.catalog.Sinks.copyTo(
      Seq((1L, 10.0, "a")).toDF("id", "bal", "seg"), root, "iceberg", Map.empty)
    graft.catalog.Catalog.attach(spark, "msql_ice6", "iceberg", Map("files" -> root))
    Seq((5L, "A"), (6L, "B"), (7L, "C")).toDF("k", "g")
      .createOrReplaceTempView("msql_icesrc6")
    SqlApi.executePg(spark, """
      MERGE INTO msql_ice6 t USING msql_icesrc6 s ON t.id = s.k
      WHEN NOT MATCHED AND s.g = 'A' THEN INSERT (id, bal) VALUES (s.k, 1.0)
      WHEN NOT MATCHED AND s.g = 'B' THEN INSERT (id, bal, seg) VALUES (s.k, 2.0, 'b2')""")
    val got = spark.table("msql_ice6").orderBy("id").collect()
      .map(r => (r.getLong(0), r.getDouble(1),
        if (r.isNullAt(2)) None else Some(r.getString(2)))).toSeq
    // id=5 → first clause (seg NULL-fills), id=6 → second, id=7 → neither
    assert(got === Seq((1L, 10.0, Some("a")), (5L, 1.0, None), (6L, 2.0, Some("b2"))))
  }

  test("NULL-evaluating conditions: identical final tables on BOTH formats, CDC rows match counts") {
    import spark.implicits._
    val base = Seq((1L, 10.0, "a"), (2L, 20.0, "b"), (3L, 30.0, "c"))
    val droot = tempDir("mergesql").getAbsolutePath + "/dnull"
    graft.catalog.Sinks.copyTo(base.toDF("id", "bal", "seg"), droot, "delta",
      Map("change_data_feed" -> "true"))
    graft.catalog.Catalog.attach(spark, "msql_dnull", "delta", Map("files" -> droot))
    val iroot = tempDir("mergesql").getAbsolutePath + "/inull"
    graft.catalog.Sinks.copyTo(base.toDF("id", "bal", "seg"), iroot, "iceberg", Map.empty)
    graft.catalog.Catalog.attach(spark, "msql_inull", "iceberg", Map("files" -> iroot))
    // op NULL on a MATCHED pair (id=3) and on an UNMATCHED source row
    // (id=8): every clause condition evaluates NULL for those rows
    Seq((1L, 0.0, "del"), (2L, 99.0, "upd"), (3L, 77.0, null.asInstanceOf[String]),
        (7L, 70.0, "new"), (8L, 80.0, null.asInstanceOf[String]))
      .toDF("k", "amount", "op").createOrReplaceTempView("msql_nullsrc")
    def stmt(t: String) = s"""
      MERGE INTO $t t USING msql_nullsrc s ON t.id = s.k
      WHEN MATCHED AND s.op = 'del' THEN DELETE
      WHEN MATCHED AND s.op = 'upd' THEN UPDATE SET bal = s.amount
      WHEN NOT MATCHED AND s.op <> 'del' THEN INSERT (id, bal, seg) VALUES (s.k, s.amount, 'n')"""
    val rd = SqlApi.executePg(spark, stmt("msql_dnull")).collect().head
    val ri = SqlApi.executePg(spark, stmt("msql_inull")).collect().head
    assert((rd.getLong(0), rd.getLong(1)) === (1L, 1L))
    assert((ri.getLong(0), ri.getLong(1)) === (1L, 1L))
    // id=1 deleted, id=2 updated, id=3 carries (NULL ⇒ no clause
    // satisfied — NOT silently deleted, NOT stuck), id=7 inserts,
    // id=8's NULL insert condition gates it out — on BOTH formats
    val want = Seq((2L, 99.0, "b"), (3L, 30.0, "c"), (7L, 70.0, "n"))
    assert(rows("msql_dnull") === want)
    assert(rows("msql_inull") === want)
    // the change feed agrees with the counts: one delete, one pre/post
    // pair, one insert — and NO row for the NULL-cond carried pair
    val feed = graft.sources.DeltaNative.read(spark, droot,
      Map("read_change_feed" -> "true", "starting_version" -> "1"))
      .groupBy("_change_type").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(feed === Map("delete" -> 1L, "update_preimage" -> 1L,
      "update_postimage" -> 1L, "insert" -> 1L))
  }

  test("CASE WHEN inside the ON condition does not split the clause scan") {
    import spark.implicits._
    mkDelta("msql_t10")
    Seq((2L, 99.0, "b2")).toDF("id", "bal", "seg")
      .createOrReplaceTempView("msql_src10")
    SqlApi.executePg(spark, """
      MERGE INTO msql_t10 t USING msql_src10 s
      ON t.id = CASE WHEN s.id > 0 THEN s.id ELSE -s.id END
      WHEN MATCHED THEN UPDATE SET bal = s.bal""")
    assert(rows("msql_t10") === Seq((1L, 10.0, "a"), (2L, 99.0, "b"), (3L, 30.0, "c")))
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
