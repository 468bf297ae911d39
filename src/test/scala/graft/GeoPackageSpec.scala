package graft

import java.io.File

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.catalog.{Catalog, Sinks}
import graft.sources.{GeoPackage, SqliteFile}

/** Native GeoPackage driver: the SQLite container codec (b-tree pages,
  * overflow chains, serial types, rowid aliases) and the GPKG layer model
  * (gpkg_contents feature tables, GPB geometry blobs) — tested by writing
  * with our spec-subset writer AND by hand-checking the written bytes
  * against the PUBLIC file-format documents, so reader and writer cannot
  * share a correlated misunderstanding silently. */
class GeoPackageSpec extends SparkSpec {

  private def pointWkb(x: Double, y: Double): Array[Byte] = {
    val b = java.nio.ByteBuffer.allocate(21).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    b.put(1.toByte).putInt(1).putDouble(x).putDouble(y)
    b.array()
  }

  private def writeSample(f: File, n: Int = 3): Unit = {
    val rows = (1 to n).map(i =>
      org.apache.spark.sql.Row(i.toLong * 10, s"name_$i", i / 2.0, i % 2 == 0,
        pointWkb(i.toDouble, i * 2.0)))
    val schema = StructType(Seq(
      StructField("key", LongType), StructField("name", StringType),
      StructField("score", DoubleType), StructField("flag", BooleanType),
      StructField("geom", BinaryType)))
    val real = spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 1), schema)
    GeoPackage.write(real, f.getAbsolutePath, Map("layer" -> "sample"))
  }

  test("gpkg: writer emits a header other tools would accept (magic, GPKG app id)") {
    val dir = tempDir("gpkg")
    val f = new File(dir, "sample.gpkg")
    writeSample(f)
    val bytes = java.nio.file.Files.readAllBytes(f.toPath)
    assert(bytes.take(16).sameElements(SqliteFile.Magic))
    // application_id "GPKG" at offset 68, user_version at 60 (both BE)
    def be32(off: Int) = ((bytes(off) & 0xff) << 24) | ((bytes(off + 1) & 0xff) << 16) |
      ((bytes(off + 2) & 0xff) << 8) | (bytes(off + 3) & 0xff)
    assert(be32(68) == 0x47504b47)
    assert(be32(60) == 10300)
    // page count covers the file exactly
    assert(be32(28) * 4096 == bytes.length)
  }

  test("gpkg: roundtrip — attributes, types, fid from rowid, WKB geometry") {
    val dir = tempDir("gpkg")
    val f = new File(dir, "sample.gpkg")
    writeSample(f)
    val df = Catalog.attach(spark, "gpkg_rt", "spatial", Map("files" -> f.getAbsolutePath))
    assert(df.schema.fieldNames.toSeq ==
      Seq("fid", "key", "name", "score", "flag", "geom"))
    assert(df.schema("fid").dataType == LongType)
    assert(df.schema("flag").dataType == BooleanType)
    val rows = df.orderBy("fid").collect()
    assert(rows.length == 3)
    assert(rows.map(_.getLong(0)).toSeq == Seq(1L, 2L, 3L))
    assert(rows.map(_.getLong(1)).toSeq == Seq(10L, 20L, 30L))
    assert(rows.map(_.getString(2)).toSeq == Seq("name_1", "name_2", "name_3"))
    assert(rows.map(_.getDouble(3)).toSeq == Seq(0.5, 1.0, 1.5))
    assert(rows.map(_.getBoolean(4)).toSeq == Seq(false, true, false))
    assert(rows(1).getAs[Array[Byte]]("geom").sameElements(pointWkb(2.0, 4.0)))
  }

  test("gpkg: multi-page b-tree + overflow payloads survive the roundtrip") {
    val dir = tempDir("gpkg")
    val f = new File(dir, "big.gpkg")
    val n = 3000 // forces interior page (+ overflow via the long text)
    val rows = (1 to n).map(i => org.apache.spark.sql.Row(
      s"row_$i" * (if (i % 97 == 0) 2000 else 1), // ~12 KB spill rows
      i.toLong, pointWkb(i.toDouble, -i.toDouble)))
    val schema = StructType(Seq(StructField("txt", StringType),
      StructField("k", LongType), StructField("geom", BinaryType)))
    val df = spark.createDataFrame(spark.sparkContext.parallelize(rows, 1), schema)
    GeoPackage.write(df, f.getAbsolutePath, Map("layer" -> "big"))
    val back = Catalog.attach(spark, "gpkg_big", "spatial",
      Map("files" -> f.getAbsolutePath))
    assert(back.count() == n)
    val spilled = back.filter(col("k") === 97L).collect().head
    assert(spilled.getAs[String]("txt") == "row_97" * 2000)
    assert(back.agg(sum("k")).collect().head.getLong(0) == (1 to n).map(_.toLong).sum)
  }

  test("gpkg: COPY TO via Sinks writes DATE/DATETIME as ISO text and reads them back") {
    val dir = tempDir("gpkg")
    val f = new File(dir, "dated.gpkg")
    val rows = Seq(org.apache.spark.sql.Row(
      java.sql.Date.valueOf("2024-02-29"),
      java.sql.Timestamp.from(java.time.Instant.parse("2024-02-29T12:34:56.789Z")),
      pointWkb(0.0, 0.0)))
    val schema = StructType(Seq(StructField("d", DateType),
      StructField("ts", TimestampType), StructField("geom", BinaryType)))
    val df = spark.createDataFrame(spark.sparkContext.parallelize(rows, 1), schema)
    Sinks.copyTo(df, f.getAbsolutePath, "gpkg", Map("layer" -> "dated"))
    val back = Catalog.attach(spark, "gpkg_dated", "spatial",
      Map("files" -> f.getAbsolutePath))
    assert(back.schema("d").dataType == DateType)
    assert(back.schema("ts").dataType == TimestampType)
    val r = back.collect().head
    assert(r.getAs[java.sql.Date]("d").toString == "2024-02-29")
    assert(r.getAs[java.sql.Timestamp]("ts").toInstant ==
      java.time.Instant.parse("2024-02-29T12:34:56.789Z"))
  }

  test("gpkg: layer option selects among feature tables; absence rejects loudly") {
    // hand-build a two-layer package through the container writer
    val dir = tempDir("gpkg")
    val f = new File(dir, "two.gpkg")
    def layerTable(name: String, k: Long) = SqliteFile.WriteTable(name,
      s"""CREATE TABLE "$name" ("fid" INTEGER PRIMARY KEY, "k" INTEGER, "geom" POINT)""",
      3, Some(0), Seq(Seq(null, k, GeoPackage.wkbToGpb(pointWkb(k.toDouble, 0.0), 4326))))
    val tables = Seq(
      SqliteFile.WriteTable("gpkg_contents",
        "CREATE TABLE gpkg_contents (table_name TEXT, data_type TEXT, identifier TEXT, " +
          "description TEXT, last_change DATETIME, min_x DOUBLE, min_y DOUBLE, " +
          "max_x DOUBLE, max_y DOUBLE, srs_id INTEGER)",
        10, None, Seq(
          Seq("alpha", "features", "alpha", "", "2026-01-01T00:00:00.000Z", null, null, null, null, 4326L),
          Seq("beta", "features", "beta", "", "2026-01-01T00:00:00.000Z", null, null, null, null, 4326L))),
      SqliteFile.WriteTable("gpkg_geometry_columns",
        "CREATE TABLE gpkg_geometry_columns (table_name TEXT, column_name TEXT, " +
          "geometry_type_name TEXT, srs_id INTEGER, z TINYINT, m TINYINT)",
        6, None, Seq(Seq("alpha", "geom", "POINT", 4326L, 0L, 0L),
          Seq("beta", "geom", "POINT", 4326L, 0L, 0L))),
      layerTable("alpha", 1L), layerTable("beta", 2L))
    java.nio.file.Files.write(f.toPath,
      SqliteFile.write(tables, GeoPackage.AppId, GeoPackage.UserVersion))

    val beta = Catalog.attach(spark, "gpkg_two_beta", "spatial",
      Map("files" -> f.getAbsolutePath, "layer" -> "beta"))
    assert(beta.select("k").collect().map(_.getLong(0)).toSeq == Seq(2L))
    val err = intercept[GeoPackage.GeoPackageException] {
      Catalog.attach(spark, "gpkg_two_none", "spatial",
        Map("files" -> f.getAbsolutePath))
    }
    assert(err.getMessage.contains("alpha, beta"))
    val missing = intercept[GeoPackage.GeoPackageException] {
      Catalog.attach(spark, "gpkg_two_missing", "spatial",
        Map("files" -> f.getAbsolutePath, "layer" -> "gamma"))
    }
    assert(missing.getMessage.contains("no feature table `gamma`"))
  }

  test("gpkg: spatial_filter_box pushdown composes with the gpkg driver") {
    val dir = tempDir("gpkg")
    val f = new File(dir, "sample.gpkg")
    writeSample(f)
    // points are (1,2),(2,4),(3,6): box [1.5,3.5]×[0,10] keeps fid 2,3
    val df = Catalog.attach(spark, "gpkg_box", "spatial",
      Map("files" -> f.getAbsolutePath, "spatial_filter_box" -> "1.5, 0, 3.5, 10"))
    assert(df.select("fid").collect().map(_.getLong(0)).sorted.toSeq == Seq(2L, 3L))
  }

  test("gpkg: WAL mode, non-GPKG sqlite, and oversize COPY reject loudly") {
    val dir = tempDir("gpkg")
    // a plain sqlite db without gpkg tables
    val plain = new File(dir, "plain.gpkg")
    java.nio.file.Files.write(plain.toPath, SqliteFile.write(Seq(
      SqliteFile.WriteTable("t", "CREATE TABLE t (a INTEGER)", 1, None, Seq(Seq(1L)))),
      appId = 0, userVersion = 0))
    val notGpkg = intercept[GeoPackage.GeoPackageException] {
      Catalog.attach(spark, "gpkg_plain", "spatial", Map("files" -> plain.getAbsolutePath))
    }
    assert(notGpkg.getMessage.contains("gpkg_contents"))
    // WAL read version byte
    val wal = new File(dir, "wal.gpkg")
    val bytes = java.nio.file.Files.readAllBytes(plain.toPath)
    bytes(18) = 2; bytes(19) = 2
    java.nio.file.Files.write(wal.toPath, bytes)
    val walErr = intercept[GeoPackage.GeoPackageException] {
      Catalog.attach(spark, "gpkg_wal", "spatial", Map("files" -> wal.getAbsolutePath))
    }
    assert(walErr.getMessage.contains("WAL"))
    // row guard on the single-file sink
    import spark.implicits._
    val big = spark.range(100).toDF("k").withColumn("geom", lit(pointWkb(0, 0)))
    val guard = intercept[GeoPackage.GeoPackageException] {
      Sinks.copyTo(big, new File(dir, "big2.gpkg").getAbsolutePath, "gpkg",
        Map("max_rows" -> "99"))
    }
    assert(guard.getMessage.contains("max_rows"))
  }

  test("gpkg: GPB envelope variants and big-endian flag decode to the same WKB") {
    val wkb = pointWkb(7.5, -3.25)
    // indicator 1 (XY envelope, little-endian)
    val le = java.nio.ByteBuffer.allocate(8 + 32 + wkb.length)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    le.put('G'.toByte).put('P'.toByte).put(0.toByte).put(((1 << 1) | 1).toByte)
    le.putInt(4326)
    Seq(7.5, 7.5, -3.25, -3.25).foreach(le.putDouble)
    le.put(wkb)
    assert(GeoPackage.gpbToWkb(le.array()).sameElements(wkb))
    // indicator 0, big-endian srs
    val be = java.nio.ByteBuffer.allocate(8 + wkb.length)
    be.put('G'.toByte).put('P'.toByte).put(0.toByte).put(0.toByte)
    be.putInt(4326)
    be.put(wkb)
    assert(GeoPackage.gpbToWkb(be.array()).sameElements(wkb))
    // extended blobs reject
    val ext = be.array().clone(); ext(3) = 0x20
    intercept[GeoPackage.GeoPackageException] { GeoPackage.gpbToWkb(ext) }
  }

  test("gpkg: directory attach expands .gpkg layers; mixed formats reject") {
    val dir = tempDir("gpkg")
    writeSample(new File(dir, "a.gpkg"))
    writeSample(new File(dir, "b.gpkg"))
    val df = Catalog.attach(spark, "gpkg_dir", "spatial",
      Map("files" -> dir.getAbsolutePath, "layer" -> "sample"))
    assert(df.count() == 6)
    val geojson = writeText(dir, "c.geojson",
      """{"type":"FeatureCollection","features":[]}""")
    val mixed = intercept[Catalog.InvalidOptionException] {
      Catalog.attach(spark, "gpkg_mixed", "spatial",
        Map("files" -> s"${new File(dir, "a.gpkg").getAbsolutePath},$geojson"))
    }
    assert(mixed.getMessage.contains("mixes"))
  }
}
