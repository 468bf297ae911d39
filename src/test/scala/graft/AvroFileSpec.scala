package graft

import java.sql.{Date, Timestamp}

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.sources.AvroFile

class AvroFileSpec extends SparkSpec {

  private def roundTrip(df: org.apache.spark.sql.DataFrame,
      opts: Map[String, String] = Map.empty): org.apache.spark.sql.DataFrame = {
    val out = tempDir("avro_rt").getPath + "/t"
    AvroFile.write(df, out, opts)
    AvroFile.read(spark, Seq(out), Map.empty)
  }

  test("primitives + logical types round-trip exactly") {
    import spark.implicits._
    val df = Seq(
      (1L, "alpha", 3.5, true, BigDecimal("12345.67"),
        Date.valueOf("2021-03-14"), Timestamp.valueOf("2021-03-14 01:59:26.535897")),
      (2L, "beta", -0.25, false, BigDecimal("-0.01"),
        Date.valueOf("1969-12-31"), Timestamp.valueOf("1969-12-31 23:59:59.999999")))
      .toDF("id", "name", "x", "flag", "dec", "d", "ts")
      .withColumn("dec", col("dec").cast("decimal(9,2)"))
    val back = roundTrip(df)
    assert(back.schema("dec").dataType === DecimalType(9, 2))
    assert(back.schema("d").dataType === DateType)
    assert(back.schema("ts").dataType === TimestampType)
    val rows = back.orderBy("id").collect()
    assert(rows.map(_.getString(1)).toSeq === Seq("alpha", "beta"))
    assert(rows.map(_.getDecimal(4).toPlainString).toSeq === Seq("12345.67", "-0.01"))
    assert(rows.map(_.getDate(5).toString).toSeq === Seq("2021-03-14", "1969-12-31"))
    // micros precision survives, including the pre-epoch value
    assert(rows.map(_.getTimestamp(6).getNanos).toSeq === Seq(535897000, 999999000))
  }

  test("struct, array and map nest and round-trip; nulls survive") {
    val schema = StructType(Seq(
      StructField("id", LongType, nullable = false),
      StructField("info", StructType(Seq(
        StructField("city", StringType),
        StructField("pop", LongType))), nullable = true),
      StructField("tags", ArrayType(StringType, containsNull = true)),
      StructField("props", MapType(StringType, LongType, valueContainsNull = true))))
    val df = spark.createDataFrame(
      java.util.List.of(
        Row(1L, Row("paris", 2100000L), Seq("a", null, "c"), Map("x" -> 7L)),
        Row(2L, null, Seq.empty[String], Map.empty[String, Long]),
        Row(3L, Row(null, 5L), null, null)),
      schema)
    val back = roundTrip(df, Map("compression" -> "snappy")).orderBy("id").collect()
    assert(back(0).getStruct(1).getString(0) === "paris")
    assert(back(0).getSeq[String](2) === Seq("a", null, "c"))
    assert(back(0).getMap[String, Long](3) === Map("x" -> 7L))
    assert(back(1).isNullAt(1) && back(1).getSeq[String](2).isEmpty)
    assert(back(2).isNullAt(2) && back(2).isNullAt(3))
    assert(back(2).getStruct(1).isNullAt(0) && back(2).getStruct(1).getLong(1) === 5L)
  }

  test("sync-split read covers every row exactly once across byte ranges") {
    import spark.implicits._
    val out = tempDir("avro_split").getPath + "/t"
    // one container, many blocks: small sync interval forces block marks
    val df = spark.range(0, 20000).select(col("id"),
      concat(lit("pad-"), lpad(col("id").cast("string"), 32, "0")).as("s"))
      .coalesce(1)
    AvroFile.write(df, out, Map.empty)
    val prev = spark.conf.get("spark.sql.files.maxPartitionBytes")
    try {
      // ~1 MB file carved into ~16 KB ranges → dozens of splits; any
      // double-read or gap at a sync boundary breaks count or sum
      spark.conf.set("spark.sql.files.maxPartitionBytes", (16 * 1024).toString)
      val back = AvroFile.read(spark, Seq(out), Map.empty)
      assert(back.rdd.getNumPartitions > 4)
      val agg = back.agg(count(lit(1)), sum("id")).head()
      assert(agg.getLong(0) === 20000L)
      assert(agg.getLong(1) === (0L until 20000L).sum)
    } finally spark.conf.set("spark.sql.files.maxPartitionBytes", prev)
  }

  test("multi-branch unions and non-string map keys reject loudly") {
    import spark.implicits._
    val e1 = intercept[AvroFile.AvroFileException] {
      AvroFile.toAvro(StructType(Seq(
        StructField("m", MapType(LongType, StringType)))), "r")
    }
    assert(e1.getMessage.contains("map key"))
    // a writer-side illegal column name
    val e2 = intercept[AvroFile.AvroFileException] {
      AvroFile.write(Seq(1).toDF("bad name"), tempDir("avro_bad").getPath + "/x", Map.empty)
    }
    assert(e2.getMessage.contains("Avro-legal"))
    // reader-side: a genuine multi-branch union file
    val union = org.apache.avro.SchemaBuilder.record("r").fields()
      .name("u").`type`().unionOf().intType().and().stringType().endUnion().noDefault()
      .endRecord()
    val dir = tempDir("avro_union")
    val f = new java.io.File(dir, "u.avro")
    val w = new org.apache.avro.file.DataFileWriter(
      new org.apache.avro.generic.GenericDatumWriter[org.apache.avro.generic.GenericRecord](union))
    w.create(union, f)
    val rec = new org.apache.avro.generic.GenericData.Record(union)
    rec.put("u", 5)
    w.append(rec); w.close()
    val e3 = intercept[AvroFile.AvroFileException] {
      AvroFile.read(spark, Seq(f.getPath), Map.empty)
    }
    assert(e3.getMessage.contains("union"))
  }

  test("attach + COPY TO dispatch through catalog and sinks") {
    import spark.implicits._
    val out = tempDir("avro_cat").getPath + "/t"
    val df = Seq((1L, "x"), (2L, "y")).toDF("id", "s")
    graft.catalog.Sinks.copyTo(df, out, "avro")
    val got = graft.catalog.Catalog.attach(spark, "avro_cat_t", "avro",
      Map("files" -> out))
    assert(got.orderBy("id").collect().map(_.getString(1)).toSeq === Seq("x", "y"))
    // option validation inherits the attach contract
    val e = intercept[Exception] {
      graft.catalog.Catalog.attach(spark, "avro_cat_bad", "avro",
        Map("files" -> out, "hive_partitioning" -> "true"))
    }
    assert(e.getMessage.contains("hive_partitioning") || e.getMessage.contains("invalid"))
  }
}
