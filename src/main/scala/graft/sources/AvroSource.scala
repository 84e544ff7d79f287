package graft.sources

import java.io.ByteArrayOutputStream
import java.nio.ByteBuffer
import java.sql.{Date, Timestamp}
import java.time.LocalDate
import scala.jdk.CollectionConverters._

import org.apache.avro.{LogicalTypes, Schema, SchemaBuilder}
import org.apache.avro.file.{CodecFactory, DataFileReader, DataFileWriter}
import org.apache.avro.generic.{GenericData, GenericDatumReader, GenericDatumWriter, GenericRecord}
import org.apache.avro.mapred.{AvroKey, FsInput}
import org.apache.avro.mapreduce.AvroKeyInputFormat
import org.apache.hadoop.fs.{FileSystem, Path => HPath}
import org.apache.hadoop.io.NullWritable
import org.apache.spark.TaskContext
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._

/** S3: Avro batch scan + sink (SURVEY.md §2.1).
  *
  * The reference's batch layer archives the Pub/Sub stream as Avro
  * container files and loads them with `spark.read.format("avro")`
  * (terraform/scripts/batch_to_mongo.py:364, packages :110-113). The
  * offline image has no spark-avro DataSource jar, but Spark ships the
  * Avro core + avro-mapred jars, so the engine implements the source on
  * the public Hadoop input-format path instead:
  *
  *  - READ: `AvroKeyInputFormat` via `newAPIHadoopFile` — Avro container
  *    files are block-structured with sync markers, so the format splits
  *    a large file across tasks exactly like spark-avro does. One
  *    executor-side pass converts records to Rows (the Hadoop record
  *    reader reuses its datum object, so conversion happens before any
  *    buffering). Schema is read once, driver-side, from the first file
  *    header and shipped to executors as the canonical JSON string.
  *  - WRITE: one Avro container file per partition (snappy codec, the
  *    same codec family the reference's GCS sink finalizes), written
  *    through the Hadoop FileSystem API so the same code targets any
  *    `fs.*` scheme at cluster scale.
  *
  * Type mapping covers the engine's surface both ways: boolean / int /
  * long / float / double / string / bytes-binary, timestamp-millis/micros
  * and date logical types, nullable-as-union[null,T], nested records,
  * arrays, and string-keyed maps. Enum and fixed read as string/binary.
  */
object AvroSource {

  // ---------------------------------------------------------------- read

  /** Read a directory of `*.avro` container files as a DataFrame.
    *
    * Corrupt-input quarantine: every file's container HEADER (magic bytes
    * + embedded writer schema) is validated driver-side before any task
    * launches — the same sniff-before-load discipline the reference
    * applies to each archive blob (batch_to_mongo.py:60-106). With
    * `skipCorrupt` (the default) malformed files are skipped and logged
    * so replaying a dirty archive loads what it can; `skipCorrupt=false`
    * fails fast instead. [[readWithReport]] returns the quarantine list
    * for callers that route bad files somewhere.
    */
  def read(spark: SparkSession, dir: String,
           skipCorrupt: Boolean = true): DataFrame =
    readWithReport(spark, dir, skipCorrupt)._1

  /** [[read]] plus the quarantine report: (path, reason) per file whose
    * container header failed validation. */
  def readWithReport(spark: SparkSession, dir: String,
                     skipCorrupt: Boolean = true)
      : (DataFrame, Seq[(String, String)]) = {
    val conf = spark.sparkContext.hadoopConfiguration
    val fs = new HPath(dir).getFileSystem(conf)
    val files = fs.listStatus(new HPath(dir)).map(_.getPath)
      .filter(_.getName.endsWith(".avro")).sortBy(_.getName)
    require(files.nonEmpty, s"no .avro files under $dir")

    val checked = files.map { p =>
      p -> (try Right(headerSchema(p, conf)) catch {
        case e: Exception =>
          Left(Option(e.getMessage).getOrElse(e.getClass.getName))
      })
    }
    val bad = checked.collect { case (p, Left(m)) => p.toString -> m }.toSeq
    if (bad.nonEmpty && !skipCorrupt)
      throw new java.io.IOException(
        s"corrupt avro container(s) under $dir: " +
          bad.map { case (p, m) => s"$p ($m)" }.mkString("; "))
    bad.foreach { case (p, m) =>
      System.err.println(s"[graft.AvroSource] quarantined corrupt file $p: $m")
    }
    val good = checked.collect { case (p, Right(s)) => p -> s }
    require(good.nonEmpty, s"no readable .avro files under $dir " +
      s"(${bad.size} quarantined)")

    val avroSchema = good.head._2
    val sparkSchema = toSparkType(avroSchema).asInstanceOf[StructType]
    val schemaJson = avroSchema.toString

    // the first good header is the READER schema for every file: Avro
    // schema resolution then reconciles evolved/heterogeneous writer
    // schemas by field NAME (with defaults for missing fields) instead of
    // each file decoding by index against the first file's converters
    val jobConf = new org.apache.hadoop.conf.Configuration(conf)
    jobConf.set("avro.schema.input.key", schemaJson)

    val rdd = spark.sparkContext.newAPIHadoopFile(
      good.map(_._1).mkString(","),
      classOf[AvroKeyInputFormat[GenericRecord]],
      classOf[AvroKey[GenericRecord]],
      classOf[NullWritable],
      jobConf)
      .mapPartitions { it =>
        val sch = new Schema.Parser().parse(schemaJson)
        val conv = reader(sch, toSparkType(sch))
        it.map(kv => conv(kv._1.datum()).asInstanceOf[Row])
      }
    (spark.createDataFrame(rdd, sparkSchema), bad)
  }

  /** Open one container's header (validates the magic bytes and parses
    * the embedded writer schema — the cheap structural check; a truncated
    * TAIL still surfaces as a task-level read error). */
  private def headerSchema(p: HPath,
      conf: org.apache.hadoop.conf.Configuration): Schema = {
    val in = new FsInput(p, conf)
    val r = DataFileReader.openReader(in, new GenericDatumReader[GenericRecord]())
    try r.getSchema finally r.close()
  }

  /** Hadoop Configuration is not java-serializable; ship it to executors
    * via its own writable protocol (same trick every Hadoop-API-based
    * Spark connector uses). */
  private class SerConf(@transient var value: org.apache.hadoop.conf.Configuration)
      extends Serializable {
    private def writeObject(out: java.io.ObjectOutputStream): Unit = {
      out.defaultWriteObject(); value.write(out)
    }
    private def readObject(in: java.io.ObjectInputStream): Unit = {
      in.defaultReadObject()
      value = new org.apache.hadoop.conf.Configuration(false)
      value.readFields(in)
    }
  }

  /** Write one Avro container file per partition under `dir` (overwrite). */
  def write(df: DataFrame, dir: String): Unit = {
    val sparkSchema = df.schema
    val schemaJson = toAvroSchema(sparkSchema, "topLevelRecord", "graft").toString
    val conf = new SerConf(df.sparkSession.sparkContext.hadoopConfiguration)

    val out = new HPath(dir)
    val fs = out.getFileSystem(conf.value)
    if (fs.exists(out)) fs.delete(out, true)
    fs.mkdirs(out)

    df.rdd.foreachPartition { it =>
      if (it.hasNext) {
        val sch = new Schema.Parser().parse(schemaJson)
        val conv = writer(sch, sparkSchema)
        val tc = TaskContext.get()
        val pid = tc.partitionId()
        val taskFs = out.getFileSystem(conf.value)
        // task-commit protocol: write to an attempt-unique hidden temp
        // file, rename into place only after a clean close — a failed or
        // zombie attempt can never leave a partial part file readable.
        // Of two speculative twins, on HDFS-like filesystems only the
        // first rename wins (the loser fails against the existing target
        // and drops its temp); on POSIX/RawLocalFileSystem rename
        // silently OVERWRITES, which is benign only because twins of the
        // same partition write identical content
        val tmp = new HPath(out,
          f".part-$pid%05d-${tc.taskAttemptId()}.inprogress")
        val fin = new HPath(out, f"part-$pid%05d.avro")
        val os = taskFs.create(tmp, true)
        val w = new DataFileWriter(new GenericDatumWriter[GenericRecord](sch))
          .setCodec(CodecFactory.snappyCodec())
          .create(sch, os)
        try it.foreach(r => w.append(conv(r).asInstanceOf[GenericRecord]))
        finally w.close()
        if (!taskFs.rename(tmp, fin)) taskFs.delete(tmp, false)
      }
    }
    // an all-empty-partitions frame writes no part files (each task
    // skips empty iterators); emit ONE schema-bearing empty container so
    // the directory round-trips — read() recovers the schema and returns
    // an empty DataFrame instead of rejecting the archive
    if (!fs.listStatus(out).exists(_.getPath.getName.endsWith(".avro"))) {
      val sch = new Schema.Parser().parse(schemaJson)
      val os = fs.create(new HPath(out, "part-empty.avro"), true)
      new DataFileWriter(new GenericDatumWriter[GenericRecord](sch))
        .setCodec(CodecFactory.snappyCodec())
        .create(sch, os)
        .close()
    }
    // job-commit marker: read() stays permissive (archives written
    // incrementally by streaming sinks have no single job), but batch
    // consumers can gate on _SUCCESS like any Hadoop output
    fs.create(new HPath(out, "_SUCCESS"), true).close()
  }

  /** In-memory single-record encode/decode used by specs to pin the wire
    * format independent of the file path. */
  private[graft] def encodeOne(rec: GenericRecord): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val w = new DataFileWriter(new GenericDatumWriter[GenericRecord](rec.getSchema))
      .create(rec.getSchema, bos)
    w.append(rec); w.close(); bos.toByteArray
  }

  // ------------------------------------------------- schema conversion

  /** Avro schema -> Spark type. Unions other than [null, T] are rejected
    * (the reference's archive schemas never produce them). */
  def toSparkType(s: Schema): DataType = s.getType match {
    case Schema.Type.BOOLEAN => BooleanType
    case Schema.Type.INT =>
      if (s.getLogicalType.isInstanceOf[LogicalTypes.Date]) DateType else IntegerType
    case Schema.Type.LONG => s.getLogicalType match {
      case _: LogicalTypes.TimestampMillis | _: LogicalTypes.TimestampMicros =>
        TimestampType
      case _: LogicalTypes.LocalTimestampMillis |
           _: LogicalTypes.LocalTimestampMicros => TimestampNTZType
      case _ => LongType
    }
    case Schema.Type.FLOAT => FloatType
    case Schema.Type.DOUBLE => DoubleType
    case Schema.Type.STRING | Schema.Type.ENUM => StringType
    case Schema.Type.BYTES | Schema.Type.FIXED => BinaryType
    case Schema.Type.ARRAY => ArrayType(toSparkType(s.getElementType))
    case Schema.Type.MAP => MapType(StringType, toSparkType(s.getValueType))
    case Schema.Type.RECORD => StructType(s.getFields.asScala.toSeq.map { f =>
      StructField(f.name, toSparkType(f.schema()), nullable = isNullable(f.schema()))
    })
    case Schema.Type.UNION => toSparkType(nonNullBranch(s))
    case t => throw new IllegalArgumentException(s"unsupported avro type $t")
  }

  /** Spark type -> Avro schema (field-nullability handled by the caller). */
  def toAvroSchema(dt: DataType, name: String, ns: String): Schema = dt match {
    case BooleanType => Schema.create(Schema.Type.BOOLEAN)
    case IntegerType | ShortType | ByteType => Schema.create(Schema.Type.INT)
    case LongType => Schema.create(Schema.Type.LONG)
    case FloatType => Schema.create(Schema.Type.FLOAT)
    case DoubleType => Schema.create(Schema.Type.DOUBLE)
    case StringType => Schema.create(Schema.Type.STRING)
    case BinaryType => Schema.create(Schema.Type.BYTES)
    case DateType =>
      LogicalTypes.date().addToSchema(Schema.create(Schema.Type.INT))
    case TimestampType =>
      LogicalTypes.timestampMicros().addToSchema(Schema.create(Schema.Type.LONG))
    case TimestampNTZType =>
      LogicalTypes.localTimestampMicros()
        .addToSchema(Schema.create(Schema.Type.LONG))
    case ArrayType(et, containsNull) =>
      Schema.createArray(maybeNullable(toAvroSchema(et, name + "_item", ns), containsNull))
    case MapType(StringType, vt, valueContainsNull) =>
      Schema.createMap(maybeNullable(toAvroSchema(vt, name + "_value", ns), valueContainsNull))
    case StructType(fields) =>
      val rec = Schema.createRecord(name, null, ns, false)
      rec.setFields(fields.map { f =>
        new Schema.Field(f.name,
          maybeNullable(toAvroSchema(f.dataType, f.name, ns + "." + name), f.nullable),
          null, if (f.nullable) Schema.Field.NULL_DEFAULT_VALUE else null)
      }.toList.asJava)
      rec
    case other => throw new IllegalArgumentException(s"unsupported spark type $other")
  }

  private def maybeNullable(s: Schema, nullable: Boolean): Schema =
    if (nullable) Schema.createUnion(Schema.create(Schema.Type.NULL), s) else s

  private def isNullable(s: Schema): Boolean =
    s.getType == Schema.Type.UNION &&
      s.getTypes.asScala.exists(_.getType == Schema.Type.NULL)

  private def nonNullBranch(s: Schema): Schema = {
    val branches = s.getTypes.asScala.filter(_.getType != Schema.Type.NULL)
    require(branches.size == 1, s"unsupported union $s (only [null, T])")
    branches.head
  }

  // ------------------------------------------------- value conversion

  /** Avro datum -> external Spark value for one (avro, spark) type pair. */
  private def reader(s: Schema, dt: DataType): Any => Any = {
    if (s.getType == Schema.Type.UNION) {
      val inner = reader(nonNullBranch(s), dt)
      return v => if (v == null) null else inner(v)
    }
    (s.getType, dt) match {
      case (Schema.Type.RECORD, st: StructType) =>
        val convs = s.getFields.asScala.toArray.map(f =>
          reader(f.schema(), st(f.name).dataType))
        v => {
          val rec = v.asInstanceOf[GenericRecord]
          Row.fromSeq(convs.indices.map(i => convs(i)(rec.get(i))))
        }
      case (Schema.Type.ARRAY, ArrayType(et, _)) =>
        val conv = reader(s.getElementType, et)
        v => v.asInstanceOf[java.util.Collection[Any]].asScala.toSeq.map(conv)
      case (Schema.Type.MAP, MapType(_, vt, _)) =>
        val conv = reader(s.getValueType, vt)
        v => v.asInstanceOf[java.util.Map[Any, Any]].asScala.map {
          case (k, mv) => k.toString -> conv(mv)
        }.toMap
      case (Schema.Type.STRING | Schema.Type.ENUM, StringType) => v => v.toString
      case (Schema.Type.BYTES, BinaryType) => v => {
        val bb = v.asInstanceOf[ByteBuffer]
        val a = new Array[Byte](bb.remaining()); bb.duplicate().get(a); a
      }
      case (Schema.Type.FIXED, BinaryType) =>
        v => v.asInstanceOf[GenericData.Fixed].bytes().clone()
      case (Schema.Type.INT, DateType) =>
        v => Date.valueOf(LocalDate.ofEpochDay(v.asInstanceOf[Int].toLong))
      case (Schema.Type.LONG, TimestampType) =>
        val micros = s.getLogicalType.isInstanceOf[LogicalTypes.TimestampMicros]
        v => {
          val us = if (micros) v.asInstanceOf[Long] else v.asInstanceOf[Long] * 1000L
          val ts = new Timestamp(Math.floorDiv(us, 1000000L) * 1000L)
          ts.setNanos((Math.floorMod(us, 1000000L) * 1000L).toInt)
          ts
        }
      case (Schema.Type.LONG, TimestampNTZType) =>
        val micros =
          s.getLogicalType.isInstanceOf[LogicalTypes.LocalTimestampMicros]
        v => {
          val us = if (micros) v.asInstanceOf[Long] else v.asInstanceOf[Long] * 1000L
          java.time.LocalDateTime.ofEpochSecond(Math.floorDiv(us, 1000000L),
            (Math.floorMod(us, 1000000L) * 1000L).toInt, java.time.ZoneOffset.UTC)
        }
      case _ => identity // int/long/float/double/boolean pass through
    }
  }

  /** External Spark value -> Avro datum for one (avro, spark) type pair. */
  private def writer(s: Schema, dt: DataType): Any => Any = {
    if (s.getType == Schema.Type.UNION) {
      val inner = writer(nonNullBranch(s), dt)
      return v => if (v == null) null else inner(v)
    }
    (s.getType, dt) match {
      case (Schema.Type.RECORD, st: StructType) =>
        val convs = st.fields.map(f =>
          writer(s.getField(f.name).schema(), f.dataType))
        v => {
          val row = v.asInstanceOf[Row]
          val rec = new GenericData.Record(s)
          var i = 0
          while (i < convs.length) { rec.put(i, convs(i)(row.get(i))); i += 1 }
          rec
        }
      // Row.get hands back collection.Seq/Map (mutable ArraySeq for
      // arrays), not the immutable aliases
      case (Schema.Type.ARRAY, ArrayType(et, _)) =>
        val conv = writer(s.getElementType, et)
        v => v.asInstanceOf[scala.collection.Seq[Any]].map(conv).asJava
      case (Schema.Type.MAP, MapType(_, vt, _)) =>
        val conv = writer(s.getValueType, vt)
        v => v.asInstanceOf[scala.collection.Map[String, Any]]
          .map { case (k, mv) => k -> conv(mv) }.toMap.asJava
      case (Schema.Type.BYTES, BinaryType) =>
        v => ByteBuffer.wrap(v.asInstanceOf[Array[Byte]])
      case (Schema.Type.INT, DateType) =>
        v => v.asInstanceOf[Date].toLocalDate.toEpochDay.toInt
      case (Schema.Type.LONG, TimestampType) =>
        v => {
          val ts = v.asInstanceOf[Timestamp]
          // getTime repeats the sub-second part that getNanos carries in
          // full precision; rebuild from whole seconds + nanos (floorDiv
          // keeps pre-epoch instants correct).
          Math.multiplyExact(Math.floorDiv(ts.getTime, 1000L), 1000000L) +
            ts.getNanos / 1000L
        }
      case (Schema.Type.LONG, TimestampNTZType) =>
        v => {
          val ldt = v.asInstanceOf[java.time.LocalDateTime]
          Math.multiplyExact(ldt.toEpochSecond(java.time.ZoneOffset.UTC),
            1000000L) + ldt.getNano / 1000L
        }
      case (Schema.Type.INT, ShortType) => v => v.asInstanceOf[Short].toInt
      case (Schema.Type.INT, ByteType) => v => v.asInstanceOf[Byte].toInt
      case _ => identity
    }
  }
}
