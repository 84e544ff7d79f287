package graft

import java.nio.file.Files
import java.sql.{Date, Timestamp}

import org.apache.hadoop.io.NullWritable
import org.apache.avro.generic.GenericRecord
import org.apache.avro.mapred.AvroKey
import org.apache.avro.mapreduce.AvroKeyInputFormat
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.sources.AvroSource

/** S3: the Avro batch source/sink (SURVEY.md §2.1) — type-mapping
  * roundtrip across the engine's whole surface, null handling through
  * union[null,T], split-based parallel reads of a single container file,
  * and schema inference parity with the written frame.
  */
class AvroSourceSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(prefix: String) = Files.createTempDirectory(prefix).toString

  test("roundtrip preserves all supported types incl nulls (S3)") {
    val schema = StructType(Seq(
      StructField("id", LongType, nullable = false),
      StructField("n_int", IntegerType),
      StructField("score", DoubleType),
      StructField("ratio", FloatType),
      StructField("flag", BooleanType),
      StructField("name", StringType),
      StructField("payload", BinaryType),
      StructField("ts", TimestampType),
      StructField("day", DateType),
      StructField("vec", ArrayType(FloatType)),
      StructField("tags", MapType(StringType, LongType)),
      StructField("meta", StructType(Seq(
        StructField("k", StringType), StructField("v", DoubleType))))))
    val rows = Seq(
      Row(1L, 7, 1.5, 0.25f, true, "alpha", Array[Byte](1, 2, 3),
        Timestamp.valueOf("2024-03-01 12:34:56.789123"), Date.valueOf("2024-03-01"),
        Seq(1.0f, -2.5f), Map("a" -> 1L, "b" -> 2L), Row("x", 9.0)),
      Row(2L, null, null, null, null, null, null, null, null, null, null, null),
      // pre-epoch timestamp exercises the floorDiv paths both ways
      Row(3L, -1, -0.0, 1e-7f, false, "", Array[Byte](),
        Timestamp.valueOf("1969-12-31 23:59:59.5"), Date.valueOf("1969-12-31"),
        Seq.empty[Float], Map.empty[String, Long], Row(null, null)))
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 2), schema)

    val dir = tmp("avro_rt") + "/t"
    AvroSource.write(df, dir)
    val back = AvroSource.read(spark, dir)

    assert(back.schema.map(f => (f.name, f.dataType)) ===
      schema.map(f => (f.name, f.dataType)))
    val a = df.collect().map(r => r.getLong(0) -> r).toMap
    val b = back.collect().map(r => r.getLong(0) -> r).toMap
    assert(a.keySet === b.keySet)
    for (k <- a.keySet) {
      val (ra, rb) = (a(k), b(k))
      for (i <- schema.indices) (ra.get(i), rb.get(i)) match {
        case (x: Array[Byte], y: Array[Byte]) => assert(x.toSeq === y.toSeq, s"col $i row $k")
        case (x, y) => assert(x === y, s"col $i row $k")
      }
    }
  }

  test("a single large container file splits across tasks") {
    val dir = tmp("avro_split") + "/t"
    // one partition -> one .avro file, big enough to hold many sync blocks
    val df = spark.range(0, 200000).select($"id",
      concat(lit("txt_"), $"id").as("text")).coalesce(1)
    AvroSource.write(df, dir)
    val file = new java.io.File(dir).listFiles()
      .filter(_.getName.endsWith(".avro")).head
    assert(file.length() > 256 * 1024, s"fixture too small: ${file.length()}")

    // cap split size so the block-structured file must split
    val conf = new org.apache.hadoop.conf.Configuration(
      spark.sparkContext.hadoopConfiguration)
    conf.setLong("mapreduce.input.fileinputformat.split.maxsize", 128 * 1024)
    val rdd = spark.sparkContext.newAPIHadoopFile(
      file.getAbsolutePath,
      classOf[AvroKeyInputFormat[GenericRecord]],
      classOf[AvroKey[GenericRecord]],
      classOf[NullWritable], conf)
    assert(rdd.getNumPartitions > 1, s"expected >1 splits")
    assert(rdd.count() === 200000L)

    // and the DataFrame path returns the same rows
    val back = AvroSource.read(spark, dir)
    assert(back.count() === 200000L)
    assert(back.agg(sum($"id")).as[Long].head === (0L until 200000L).sum)
  }

  test("inferred schema marks non-nullable source columns nullable-safe") {
    val dir = tmp("avro_schema") + "/t"
    val df = Seq((1L, "a", 2.0), (2L, "b", 3.0)).toDF("id", "s", "x")
    AvroSource.write(df, dir)
    val back = AvroSource.read(spark, dir)
    assert(back.schema("id").dataType === LongType)
    assert(back.schema("s").dataType === StringType)
    assert(back.schema("x").dataType === DoubleType)
    assert(back.filter($"s" === "b").select("x").as[Double].head === 3.0)
  }

  test("streaming avro archive sink: foreachBatch writes container files " +
       "per micro-batch (the reference's finalized-file cadence)") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val dir = tmp("avro_stream")
    val in = MemoryStream[(Long, String, Double)]
    val q = in.toDF().toDF("id", "sym", "px").writeStream
      .outputMode("append")
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, id: Long) =>
        if (!batch.isEmpty) AvroSource.write(batch, s"$dir/batch=$id")
      }
      .start()
    try {
      in.addData((1L, "ETH", 10.0), (2L, "SOL", 5.0)); q.processAllAvailable()
      in.addData((3L, "ETH", 11.0)); q.processAllAvailable()
    } finally q.stop()
    val batches = new java.io.File(dir).listFiles()
      .filter(_.getName.startsWith("batch=")).sortBy(_.getName)
    assert(batches.length === 2, batches.mkString(","))
    val all = batches.toSeq
      .map(b => AvroSource.read(spark, b.getAbsolutePath))
      .reduce(_ union _)
    assert(all.count() === 3L)
    assert(all.agg(sum($"px")).as[Double].head === 26.0)
  }

  test("parquet table -> avro archive -> aggregate matches parquet direct") {
    val sf = "/root/testdata/sf0.001"
    val li = Tables.lineitem(spark, sf).filter($"l_linenumber" === 1)
    val dir = tmp("avro_li") + "/lineitem"
    AvroSource.write(li, dir)
    // l_shipdate is TIMESTAMP_NTZ in Spark 4 (parquet isAdjustedToUTC =
    // false), so compare the timestamp generically
    def agg(df: org.apache.spark.sql.DataFrame) =
      df.groupBy($"l_returnflag").agg(
          count(lit(1)).as("n"),
          round(sum($"l_extendedprice"), 2).as("rev"),
          max($"l_shipdate").as("last_ship"))
        .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2),
          String.valueOf(r.get(3)))).sortBy(_._1).toSeq
    val viaAvro = agg(AvroSource.read(spark, dir))
    val direct = agg(li)
    assert(viaAvro === direct)
  }

  test("corrupt container quarantine: a dirty archive still loads the " +
       "good files and reports the bad ones (S4)") {
    val dir = tmp("avro_dirty")
    AvroSource.write(Seq((1L, "a"), (2L, "b")).toDF("id", "v"), dir)
    // one garbage file (bad magic) and one truncated header
    Files.write(java.nio.file.Paths.get(dir, "junk.avro"),
      "this is not an avro container".getBytes)
    Files.write(java.nio.file.Paths.get(dir, "trunc.avro"),
      Array[Byte]('O', 'b', 'j', 1))
    val (df, bad) = AvroSource.readWithReport(spark, dir)
    assert(df.select($"id").as[Long].collect().sorted === Array(1L, 2L))
    assert(bad.map(_._1.split('/').last).sorted === Seq("junk.avro", "trunc.avro"))
    // fail-fast mode surfaces the same files in the error
    val e = intercept[java.io.IOException] {
      AvroSource.read(spark, dir, skipCorrupt = false)
    }
    assert(e.getMessage.contains("junk.avro"))
  }

  test("heterogeneous writer schemas resolve by field NAME against the " +
       "first file's reader schema, not by index") {
    val dir = tmp("avro_evolved")
    // file A: (id, v) — its header becomes the reader schema
    AvroSource.write(Seq((1L, "a1")).toDF("id", "v").coalesce(1),
      dir + "/a")
    // file B: evolved writer with the SAME fields in swapped order
    AvroSource.write(Seq(("b2", 2L)).toDF("v", "id").coalesce(1),
      dir + "/b")
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.rename(new org.apache.hadoop.fs.Path(dir + "/a/part-00000.avro"),
      new org.apache.hadoop.fs.Path(dir + "/0.avro"))
    fs.rename(new org.apache.hadoop.fs.Path(dir + "/b/part-00000.avro"),
      new org.apache.hadoop.fs.Path(dir + "/1.avro"))
    fs.delete(new org.apache.hadoop.fs.Path(dir + "/a"), true)
    fs.delete(new org.apache.hadoop.fs.Path(dir + "/b"), true)
    val rows = AvroSource.read(spark, dir)
      .select($"id", $"v").as[(Long, String)].collect().sortBy(_._1)
    // by-index decoding would swap B's columns (or throw); by-name
    // resolution keeps (2, "b2") intact
    assert(rows === Array((1L, "a1"), (2L, "b2")))
  }

  test("an all-empty frame round-trips: write emits a schema-bearing " +
       "empty container and read returns an empty frame") {
    val dir = tmp("avro_empty") + "/e"
    AvroSource.write(Seq((1L, "x")).toDF("id", "v").filter($"id" < 0), dir)
    val back = AvroSource.read(spark, dir)
    assert(back.columns.toSeq === Seq("id", "v"))
    assert(back.count() === 0L)
  }
}
