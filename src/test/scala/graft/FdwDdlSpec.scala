package graft

import graft.sqlapi.{FdwDdl, SqlApi}

/** The reference's FDW DDL lifecycle through executePg — fixture scripts
  * taken verbatim from tests/tests/fixtures/arrow.rs and
  * tests/tests/table_config.rs, with only the file paths swapped for local
  * testdata. */
class FdwDdlSpec extends SparkSpec {

  private def pg(sql: String) = SqlApi.executePg(spark, sql)
  private def script(sql: String) = SqlApi.executePgScript(spark, sql)

  private def freshNames(tag: String): (String, String, String) =
    (s"wrapper_$tag", s"server_$tag", s"table_$tag")

  test("reference fixture script verbatim: wrapper; server; mapping; typed table") {
    // tests/tests/fixtures/arrow.rs:325-340 (setup_fdw_local_parquet_file_listing)
    val path = s"$sf/nation.parquet"
    script(s"""
        CREATE FOREIGN DATA WRAPPER parquet_wrapper HANDLER parquet_fdw_handler VALIDATOR parquet_fdw_validator;
        CREATE SERVER parquet_server FOREIGN DATA WRAPPER parquet_wrapper;
        CREATE FOREIGN TABLE fdw_nation (n_nationkey bigint, n_name text, n_regionkey bigint, n_comment text) SERVER parquet_server OPTIONS (files '$path');
    """)
    val rows = spark.sql("SELECT n_name FROM fdw_nation WHERE n_nationkey = 3").collect()
    assert(rows.map(_.getString(0)).toSeq == Seq("NATION_3"))
    // declared types applied as the read schema
    val sch = spark.table("fdw_nation").schema
    assert(sch("n_name").dataType.typeName == "string")
    assert(sch("n_nationkey").dataType.typeName == "long")
    pg("DROP FOREIGN TABLE fdw_nation")
    intercept[Exception] { spark.sql("SELECT * FROM fdw_nation").collect() }
  }

  test("auto schema creation: empty column list infers from the files") {
    // arrow.rs:303 auto_create_table: CREATE FOREIGN TABLE t () SERVER s
    val (w, s, t) = freshNames("auto")
    script(s"""
      CREATE FOREIGN DATA WRAPPER $w HANDLER parquet_fdw_handler VALIDATOR parquet_fdw_validator;
      CREATE SERVER $s FOREIGN DATA WRAPPER $w;
      CREATE FOREIGN TABLE $t () SERVER $s OPTIONS (files '$sf/region.parquet');
    """)
    assert(spark.sql(s"SELECT count(*) FROM $t").collect().head.getLong(0) == 5L)
    assert(spark.table(t).schema.fieldNames.contains("r_name"))
  }

  test("typed columns cast: numeric(p,s), double precision, varchar(n), smallint") {
    val (w, s, t) = freshNames("typed")
    script(s"""
      CREATE FOREIGN DATA WRAPPER $w HANDLER parquet_fdw_handler VALIDATOR parquet_fdw_validator;
      CREATE SERVER $s FOREIGN DATA WRAPPER $w;
      CREATE FOREIGN TABLE $t (
        l_orderkey bigint,
        l_linenumber integer,
        l_quantity numeric(12,2),
        l_extendedprice double precision,
        l_shipmode varchar(10)
      ) SERVER $s OPTIONS (files '$sf/lineitem.parquet');
    """)
    val sch = spark.table(t).schema
    assert(sch("l_quantity").dataType.sql == "DECIMAL(12,2)")
    assert(sch("l_extendedprice").dataType.typeName == "double")
    assert(sch("l_shipmode").dataType.typeName == "string")
    assert(sch("l_linenumber").dataType.typeName == "integer")
    assert(spark.sql(s"SELECT count(*) FROM $t").collect().head.getLong(0) > 0)
  }

  test("quoted table name with preserve_casing (table_config.rs:195)") {
    val (w, s, _) = freshNames("cased")
    script(s"""
      CREATE FOREIGN DATA WRAPPER $w HANDLER parquet_fdw_handler VALIDATOR parquet_fdw_validator;
      CREATE SERVER $s FOREIGN DATA WRAPPER $w;
    """)
    pg(s"""CREATE FOREIGN TABLE "PrimitiveTable" () SERVER $s OPTIONS (files '$sf/region.parquet', preserve_casing 'true')""")
    assert(spark.sql("SELECT count(*) FROM PrimitiveTable").collect().head.getLong(0) == 5L)
    pg("""DROP FOREIGN TABLE "PrimitiveTable"""")
  }

  test("schema-qualified foreign table resolves via search_path (table_config.rs:221)") {
    val (w, s, _) = freshNames("schemaq")
    script(s"""
      CREATE FOREIGN DATA WRAPPER $w HANDLER parquet_fdw_handler VALIDATOR parquet_fdw_validator;
      CREATE SERVER $s FOREIGN DATA WRAPPER $w;
      CREATE FOREIGN TABLE "MY_SCHEMA"."MyTable" () SERVER $s OPTIONS (files '$sf/region.parquet', preserve_casing 'true');
    """)
    pg("SET search_path = my_schema, public")
    assert(spark.sql("SELECT count(*) FROM MyTable").collect().head.getLong(0) == 5L)
    pg("""DROP FOREIGN TABLE "MY_SCHEMA"."MyTable"""")
    pg("SET search_path = public")
  }

  test("user mapping options land as engine secrets (nyc_trips.rs:110 verbatim)") {
    val (w, s, _) = freshNames("s3map")
    script(s"""
      CREATE FOREIGN DATA WRAPPER $w HANDLER parquet_fdw_handler VALIDATOR parquet_fdw_validator;
      CREATE SERVER $s FOREIGN DATA WRAPPER $w;
      CREATE USER MAPPING FOR public SERVER $s OPTIONS (type 'S3', region 'us-east-1', endpoint 'localhost:8000', use_ssl 'false', url_style 'path');
    """)
    val conf = spark.sparkContext.hadoopConfiguration
    assert(conf.get("fs.s3a.endpoint") == "localhost:8000")
    assert(conf.get("fs.s3a.endpoint.region") == "us-east-1")
    assert(conf.get("fs.s3a.path.style.access") == "true")
    assert(conf.get("fs.s3a.connection.ssl.enabled") == "false")
  }

  test("select option rewrites columns at attach (table_config.rs:269)") {
    val (w, s, t) = freshNames("sel")
    script(s"""
      CREATE FOREIGN DATA WRAPPER $w HANDLER parquet_fdw_handler VALIDATOR parquet_fdw_validator;
      CREATE SERVER $s FOREIGN DATA WRAPPER $w;
      CREATE FOREIGN TABLE $t () SERVER $s OPTIONS (files '$sf/region.parquet', select 'r_name AS name_col, 2020 as year');
    """)
    val sch = spark.table(t).schema.fieldNames.toSeq
    assert(sch == Seq("name_col", "year"))
  }

  test("csv handler routes to the csv reader") {
    val (w, s, t) = freshNames("csvh")
    val dir = tempDir("fdwcsv")
    val p = writeText(dir, "data.csv", "a,b\n1,x\n2,y\n")
    script(s"""
      CREATE FOREIGN DATA WRAPPER $w HANDLER csv_fdw_handler VALIDATOR csv_fdw_validator;
      CREATE SERVER $s FOREIGN DATA WRAPPER $w;
      CREATE FOREIGN TABLE $t () SERVER $s OPTIONS (files '$p', header 'true');
    """)
    assert(spark.sql(s"SELECT count(*) FROM $t").collect().head.getLong(0) == 2L)
  }

  test("unknown handler fails at CREATE FOREIGN TABLE with the reference's shape") {
    val (w, s, t) = freshNames("otherh")
    script(s"""
      CREATE FOREIGN DATA WRAPPER $w HANDLER my_container_fdw_handler VALIDATOR my_container_fdw_validator;
      CREATE SERVER $s FOREIGN DATA WRAPPER $w;
    """)
    val e = intercept[IllegalArgumentException] {
      pg(s"CREATE FOREIGN TABLE $t () SERVER $s OPTIONS (files '$sf/region.parquet')")
    }
    // src/fdw/base.rs:254
    assert(e.getMessage.contains("got unexpected fdw_handler"))
  }

  test("unknown attach option errors listing the valid ones") {
    val (w, s, t) = freshNames("badopt")
    script(s"""
      CREATE FOREIGN DATA WRAPPER $w HANDLER parquet_fdw_handler VALIDATOR parquet_fdw_validator;
      CREATE SERVER $s FOREIGN DATA WRAPPER $w;
    """)
    val e = intercept[IllegalArgumentException] {
      pg(s"CREATE FOREIGN TABLE $t () SERVER $s OPTIONS (files '$sf/region.parquet', frobnicate 'yes')")
    }
    assert(e.getMessage.contains("frobnicate"))
  }

  test("missing objects error with PG shapes; IF EXISTS / IF NOT EXISTS soften") {
    val msg1 = intercept[IllegalArgumentException] {
      pg("CREATE SERVER no_such FOREIGN DATA WRAPPER missing_wrapper")
    }.getMessage
    assert(msg1.contains("missing_wrapper") && msg1.contains("does not exist"))
    val msg2 = intercept[IllegalArgumentException] {
      pg("CREATE USER MAPPING FOR public SERVER ghost_server")
    }.getMessage
    assert(msg2.contains("ghost_server") && msg2.contains("does not exist"))
    val msg3 = intercept[IllegalArgumentException] {
      pg("DROP FOREIGN TABLE never_created")
    }.getMessage
    assert(msg3.contains("never_created") && msg3.contains("does not exist"))
    pg("DROP FOREIGN TABLE IF EXISTS never_created") // no throw
    pg("DROP SERVER IF EXISTS ghost_server")
    pg("DROP FOREIGN DATA WRAPPER IF EXISTS missing_wrapper")
  }

  test("DROP SERVER refuses with dependents, cascades when asked") {
    val (w, s, t) = freshNames("cascade")
    script(s"""
      CREATE FOREIGN DATA WRAPPER $w HANDLER parquet_fdw_handler VALIDATOR parquet_fdw_validator;
      CREATE SERVER $s FOREIGN DATA WRAPPER $w;
      CREATE FOREIGN TABLE $t () SERVER $s OPTIONS (files '$sf/region.parquet');
    """)
    val e = intercept[IllegalArgumentException] { pg(s"DROP SERVER $s") }
    assert(e.getMessage.contains("depend"))
    pg(s"DROP SERVER $s CASCADE")
    intercept[Exception] { spark.sql(s"SELECT * FROM $t").collect() }
    // wrapper drop cascades through servers to tables
    val (w2, s2, t2) = freshNames("cascade2")
    script(s"""
      CREATE FOREIGN DATA WRAPPER $w2 HANDLER parquet_fdw_handler VALIDATOR parquet_fdw_validator;
      CREATE SERVER $s2 FOREIGN DATA WRAPPER $w2;
      CREATE FOREIGN TABLE $t2 () SERVER $s2 OPTIONS (files '$sf/region.parquet');
    """)
    pg(s"DROP FOREIGN DATA WRAPPER $w2 CASCADE")
    intercept[Exception] { spark.sql(s"SELECT * FROM $t2").collect() }
    assert(!FdwDdl.stateFor(spark).servers.contains(s2))
  }

  test("duplicate creations error; user mapping duplicate included") {
    val (w, s, _) = freshNames("dup")
    pg(s"CREATE FOREIGN DATA WRAPPER $w HANDLER parquet_fdw_handler")
    assert(intercept[IllegalArgumentException] {
      pg(s"CREATE FOREIGN DATA WRAPPER $w HANDLER parquet_fdw_handler")
    }.getMessage.contains("already exists"))
    pg(s"CREATE SERVER $s FOREIGN DATA WRAPPER $w")
    assert(intercept[IllegalArgumentException] {
      pg(s"CREATE SERVER $s FOREIGN DATA WRAPPER $w")
    }.getMessage.contains("already exists"))
    pg(s"CREATE SERVER IF NOT EXISTS $s FOREIGN DATA WRAPPER $w") // softened
    pg(s"CREATE USER MAPPING FOR public SERVER $s")
    assert(intercept[IllegalArgumentException] {
      pg(s"CREATE USER MAPPING FOR public SERVER $s")
    }.getMessage.contains("already exists"))
    pg(s"DROP USER MAPPING FOR public SERVER $s")
    pg(s"DROP SERVER $s")
    pg(s"DROP FOREIGN DATA WRAPPER $w")
  }

  test("spatial handler with declared geom bytea projects to the declared shape") {
    // arrow.rs:441-447 primitive_create_spatial_table: (geom bytea)
    val (w, s, t) = freshNames("spatial")
    val dir = tempDir("fdwgeo")
    val geojson =
      """{"type":"FeatureCollection","features":[
        |{"type":"Feature","properties":{"name":"a"},"geometry":{"type":"Point","coordinates":[1.0,2.0]}},
        |{"type":"Feature","properties":{"name":"b"},"geometry":{"type":"Point","coordinates":[3.0,4.0]}}]}
        |""".stripMargin
    val p = writeText(dir, "pts.geojson", geojson)
    script(s"""
      CREATE FOREIGN DATA WRAPPER $w HANDLER spatial_fdw_handler VALIDATOR spatial_fdw_validator;
      CREATE SERVER $s FOREIGN DATA WRAPPER $w;
      CREATE FOREIGN TABLE $t (geom bytea) SERVER $s OPTIONS (files '$p');
    """)
    val sch = spark.table(t).schema
    assert(sch.fieldNames.toSeq == Seq("geom"))
    assert(sch("geom").dataType.typeName == "binary")
    assert(spark.sql(s"SELECT count(*) FROM $t").collect().head.getLong(0) == 2L)
  }

  test("pg column type mapping table") {
    import FdwDdl.pgColumnType
    assert(pgColumnType("numeric(20)") == "DECIMAL(20,0)")
    assert(pgColumnType("numeric(20, 2)") == "DECIMAL(20,2)")
    assert(pgColumnType("numeric") == "DECIMAL(38,18)")
    assert(pgColumnType("double precision") == "DOUBLE")
    assert(pgColumnType("real") == "FLOAT")
    assert(pgColumnType("character varying(10)") == "STRING")
    assert(pgColumnType("text") == "STRING")
    assert(pgColumnType("bytea") == "BINARY")
    assert(pgColumnType("timestamp") == "TIMESTAMP")
    assert(pgColumnType("timestamp without time zone") == "TIMESTAMP_NTZ")
    assert(pgColumnType("timestamp with time zone") == "TIMESTAMP")
    assert(pgColumnType("timestamptz") == "TIMESTAMP")
    assert(pgColumnType("int2") == "SMALLINT")
    assert(pgColumnType("boolean") == "BOOLEAN")
    assert(pgColumnType("date") == "DATE")
  }
}
