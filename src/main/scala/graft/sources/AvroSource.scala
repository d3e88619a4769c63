package graft.sources

import java.nio.ByteBuffer

import scala.jdk.CollectionConverters._

import org.apache.avro.{LogicalTypes, Schema}
import org.apache.avro.file.{DataFileReader, DataFileStream, DataFileWriter, SeekableByteArrayInput}
import org.apache.avro.generic.{GenericData, GenericDatumReader, GenericDatumWriter, GenericRecord}
import org.apache.hadoop.fs.{Path => HPath}
import org.apache.spark.TaskContext
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._
import graft.schema.SchemaConform

/** Avro container-file source/sink over the shipped avro-core jars.
  *
  * The environment has `avro-1.12.1.jar` but NOT the `spark-avro` DataSource
  * module, so `spark.read.format("avro")` cannot exist here (tracked since
  * round 11). This is the documented fallback: whole-file ingestion through
  * Spark's `binaryFile` source (the same scan that backs
  * [[graft.operators.MultimodalOps]]) with the Avro object-container decode
  * done partition-parallel by avro-core's `DataFileReader`.
  *
  * Scale posture:
  *  - Parallelism is per FILE (one container file = one decode task): Avro
  *    is a row format and `binaryFile` does not split on sync markers the
  *    way spark-avro does, so a lake writing bounded-size files (the normal
  *    discipline — 64–256 MB objects) parallelizes across executors; one
  *    giant single file would not. [[AvroIo.write]] therefore emits one
  *    file per partition — repartition upstream to control file count/size.
  *  - The schema is read ONCE on the driver from the first file's header
  *    (a few KB — the header alone is fetched, never the file body); rows
  *    never touch the driver.
  *  - Decode is `flatMap` over executor-local bytes: no shuffle, no
  *    collect. Column pruning cannot reach inside a row-oriented container
  *    (decode materializes every field), matching spark-avro's own
  *    behavior on non-columnar data.
  *
  * Type coverage (both directions): boolean/int/long/float/double/string/
  * binary, date (Avro `date` logical on int), timestamp (Avro
  * `timestamp-micros` logical on long), decimal (Avro `decimal` logical on
  * bytes), arrays, maps (string keys), nested structs; every field is a
  * nullable `["null", T]` union, mirroring parquet's default nullability.
  * Read-only extras for foreign files: enum → string, fixed → binary (or
  * decimal when `decimal`-annotated), and `timestamp-millis` /
  * `local-timestamp-millis` longs scaled to micros at decode.
  */
object AvroIo {

  // ---------------------------------------------------------------- schema

  /** Spark → Avro schema. Field types become `["null", T]` unions. */
  def toAvroSchema(st: StructType, recordName: String): Schema = {
    val fields = st.fields.toSeq.map { f =>
      new Schema.Field(f.name, nullable(toAvroType(f.dataType, s"${recordName}_${f.name}")),
        null, Schema.Field.NULL_DEFAULT_VALUE)
    }
    Schema.createRecord(recordName, null, "graft.avro", false, fields.asJava)
  }

  private def nullable(s: Schema): Schema =
    Schema.createUnion(java.util.List.of(Schema.create(Schema.Type.NULL), s))

  private def toAvroType(dt: DataType, name: String): Schema = dt match {
    case BooleanType => Schema.create(Schema.Type.BOOLEAN)
    case ByteType | ShortType | IntegerType => Schema.create(Schema.Type.INT)
    case LongType => Schema.create(Schema.Type.LONG)
    case FloatType => Schema.create(Schema.Type.FLOAT)
    case DoubleType => Schema.create(Schema.Type.DOUBLE)
    case StringType => Schema.create(Schema.Type.STRING)
    case BinaryType => Schema.create(Schema.Type.BYTES)
    case DateType => LogicalTypes.date().addToSchema(Schema.create(Schema.Type.INT))
    case TimestampType =>
      LogicalTypes.timestampMicros().addToSchema(Schema.create(Schema.Type.LONG))
    case TimestampNTZType =>
      LogicalTypes.localTimestampMicros().addToSchema(Schema.create(Schema.Type.LONG))
    case d: DecimalType =>
      LogicalTypes.decimal(d.precision, d.scale).addToSchema(Schema.create(Schema.Type.BYTES))
    case ArrayType(elem, _) => Schema.createArray(nullable(toAvroType(elem, name)))
    case MapType(StringType, v, _) => Schema.createMap(nullable(toAvroType(v, name)))
    case st: StructType => toAvroSchema(st, name)
    case other => throw new IllegalArgumentException(s"Avro sink: unsupported type $other")
  }

  /** Avro → Spark schema (the inverse, for reading foreign files). */
  def toSparkType(s: Schema): DataType = unwrap(s) match {
    case u if u.getType == Schema.Type.BOOLEAN => BooleanType
    case u if u.getType == Schema.Type.INT =>
      if (u.getLogicalType.isInstanceOf[LogicalTypes.Date]) DateType else IntegerType
    case u if u.getType == Schema.Type.LONG =>
      u.getLogicalType match {
        case _: LogicalTypes.TimestampMicros | _: LogicalTypes.TimestampMillis => TimestampType
        case _: LogicalTypes.LocalTimestampMicros | _: LogicalTypes.LocalTimestampMillis =>
          TimestampNTZType
        case _ => LongType
      }
    case u if u.getType == Schema.Type.FLOAT => FloatType
    case u if u.getType == Schema.Type.DOUBLE => DoubleType
    case u if u.getType == Schema.Type.STRING || u.getType == Schema.Type.ENUM => StringType
    case u if u.getType == Schema.Type.BYTES || u.getType == Schema.Type.FIXED =>
      u.getLogicalType match {
        case d: LogicalTypes.Decimal => DecimalType(d.getPrecision, d.getScale)
        case _ => BinaryType
      }
    case u if u.getType == Schema.Type.ARRAY => ArrayType(toSparkType(u.getElementType))
    case u if u.getType == Schema.Type.MAP => MapType(StringType, toSparkType(u.getValueType))
    case u if u.getType == Schema.Type.RECORD =>
      StructType(u.getFields.asScala.toSeq.map(f =>
        StructField(f.name, toSparkType(f.schema()), nullable = true)))
    case other => throw new IllegalArgumentException(s"Avro source: unsupported type $other")
  }

  /** Strip a 2-branch null union; wider unions are out of scope. */
  private def unwrap(s: Schema): Schema =
    if (s.getType != Schema.Type.UNION) s
    else {
      val branches = s.getTypes.asScala.filterNot(_.getType == Schema.Type.NULL)
      if (branches.length == 1) branches.head
      else throw new IllegalArgumentException(s"Avro source: non-null union $s unsupported")
    }

  // ----------------------------------------------------------------- write

  /** Write `df` as Avro container files, one `part-NNNNN.avro` per
    * partition via the Hadoop FS API (works on file://, HDFS, or any
    * configured object store). Part names are deterministic per partition
    * and created with overwrite, so a task retry is idempotent; a
    * production multi-writer would route through a FileCommitProtocol, but
    * for a library staging/export utility deterministic-overwrite gives
    * the same at-least-once safety without the committer machinery.
    */
  def write(df: DataFrame, path: String, recordName: String = "graft_row"): Unit = {
    val st = df.schema
    val avroJson = toAvroSchema(st, recordName).toString
    val spark = df.sparkSession
    val root = new HPath(path)
    root.getFileSystem(spark.sparkContext.hadoopConfiguration).mkdirs(root)
    // Hadoop Configuration is not serializable — ship the driver's conf to
    // executors as raw key/value pairs and rebuild it there, so
    // spark.hadoop.* overrides and object-store credentials reach the
    // executor-side FileSystem resolution (r13 ADVICE: a bare
    // `new Configuration()` dropped them, contradicting the scaladoc's
    // "any configured object store" claim).
    val confProps: Array[(String, String)] =
      spark.sparkContext.hadoopConfiguration.iterator().asScala
        .map(e => (e.getKey, e.getValue)).toArray
    df.foreachPartition { (it: Iterator[Row]) =>
      if (it.hasNext) {
        val schema = new Schema.Parser().parse(avroJson)
        val pid = TaskContext.getPartitionId()
        val file = new HPath(path, f"part-$pid%05d.avro")
        val conf = new org.apache.hadoop.conf.Configuration(false)
        confProps.foreach { case (k, v) => conf.set(k, v) }
        val fs = file.getFileSystem(conf)
        val out = fs.create(file, true)
        val w = new DataFileWriter(new GenericDatumWriter[GenericRecord](schema))
        try {
          w.create(schema, out)
          it.foreach { r => w.append(rowToRecord(r, st, schema)) }
        } finally w.close()
      }
    }
  }

  private def rowToRecord(r: Row, st: StructType, schema: Schema): GenericRecord = {
    val rec = new GenericData.Record(schema)
    var i = 0
    while (i < st.length) {
      val fieldSchema = unwrap(schema.getFields.get(i).schema())
      rec.put(i, toAvroValue(if (r.isNullAt(i)) null else r.get(i),
        st.fields(i).dataType, fieldSchema))
      i += 1
    }
    rec
  }

  /** `avro` is the UNWRAPPED target schema for this value — nested records
    * must be built against the writer schema's own (namespaced) record
    * instance, not a freshly derived one, or union resolution fails on the
    * record-name mismatch.
    */
  private def toAvroValue(v: Any, dt: DataType, avro: Schema): AnyRef = (v, dt) match {
    case (null, _) => null
    case (b: Array[Byte], BinaryType) => ByteBuffer.wrap(b)
    case (d: java.sql.Date, DateType) => Int.box(d.toLocalDate.toEpochDay.toInt)
    case (d: java.time.LocalDate, DateType) => Int.box(d.toEpochDay.toInt)
    case (t: java.sql.Timestamp, TimestampType) =>
      Long.box(Math.multiplyExact(t.getTime, 1000L) + (t.getNanos / 1000) % 1000)
    case (t: java.time.Instant, TimestampType) =>
      Long.box(Math.addExact(Math.multiplyExact(t.getEpochSecond, 1000000L), t.getNano / 1000L))
    case (t: java.time.LocalDateTime, TimestampNTZType) =>
      Long.box(Math.addExact(
        Math.multiplyExact(t.toEpochSecond(java.time.ZoneOffset.UTC), 1000000L),
        t.getNano / 1000L))
    case (d: java.math.BigDecimal, dec: DecimalType) =>
      ByteBuffer.wrap(d.setScale(dec.scale).unscaledValue().toByteArray)
    case (d: scala.math.BigDecimal, dec: DecimalType) =>
      ByteBuffer.wrap(d.underlying().setScale(dec.scale).unscaledValue().toByteArray)
    // collection.Seq, not Seq: Row.getAs hands back mutable.ArraySeq in 2.13.
    case (s: scala.collection.Seq[_], ArrayType(elem, _)) =>
      val elemSchema = unwrap(avro.getElementType)
      new java.util.ArrayList[AnyRef](s.map(e => toAvroValue(e, elem, elemSchema)).asJava)
    case (m: scala.collection.Map[_, _], MapType(StringType, vt, _)) =>
      val valueSchema = unwrap(avro.getValueType)
      val jm = new java.util.HashMap[String, AnyRef](m.size)
      m.foreach { case (k, mv) => jm.put(k.toString, toAvroValue(mv, vt, valueSchema)) }
      jm
    case (r: Row, nested: StructType) => rowToRecord(r, nested, avro)
    case (other, _) => other.asInstanceOf[AnyRef]
  }

  // ------------------------------------------------------------------ read

  /** Read an Avro directory: the READER schema comes from `readerSchema`
    * if given, else the LAST file's header (name-sorted — in a lake laying
    * files down over time the newest schema is the widest one), read on
    * the driver (header only, a few KB). Decode is partition-parallel over
    * whole files through `binaryFile`, with each file's own writer schema
    * RESOLVED against the reader schema (standard Avro evolution: fields
    * added since a file was written materialize as their null default;
    * fields since dropped are skipped) — so a directory whose schema
    * evolved across files reads under one consistent shape.
    */
  def read(spark: SparkSession, path: String, readerSchema: Option[String] = None): DataFrame = {
    val avroSchema = readerSchema.map(new Schema.Parser().parse(_)).getOrElse {
      val root = new HPath(path)
      val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
      val last = fs.listStatus(root).map(_.getPath).filter(_.getName.endsWith(".avro"))
        .sortBy(_.getName).lastOption
        .getOrElse(throw new IllegalArgumentException(s"no .avro files under $path"))
      val in = fs.open(last)
      try {
        val s = new DataFileStream(in, new GenericDatumReader[GenericRecord]())
        try s.getSchema finally s.close()
      } finally in.close()
    }
    val structType = toSparkType(avroSchema) match {
      case st: StructType => st
      case other => throw new IllegalArgumentException(s"top-level Avro schema is not a record: $other")
    }
    val readerJson = avroSchema.toString
    val bin = spark.read.format("binaryFile").option("pathGlobFilter", "*.avro").load(path)
    val rows = bin.select("content").rdd.mapPartitions { files =>
      val expected = new Schema.Parser().parse(readerJson)
      files.flatMap { row =>
        val bytes = row.getAs[Array[Byte]](0)
        // (writer = null, reader = expected): DataFileReader installs each
        // file's actual writer schema and avro resolves it against the
        // expected shape.
        val rdr = new DataFileReader[GenericRecord](
          new SeekableByteArrayInput(bytes),
          new GenericDatumReader[GenericRecord](null, expected))
        new Iterator[Row] {
          def hasNext: Boolean = { val h = rdr.hasNext; if (!h) rdr.close(); h }
          def next(): Row = recordToRow(rdr.next(), structType, expected)
        }
      }
    }
    spark.createDataFrame(rows, structType)
  }

  private def recordToRow(rec: GenericRecord, st: StructType, avro: Schema): Row =
    Row.fromSeq(st.fields.toSeq.zipWithIndex.map { case (f, i) =>
      toSparkValue(rec.get(i), f.dataType, unwrap(avro.getFields.get(i).schema()))
    })

  /** GenericDatumReader hands logical-typed values through RAW (no
    * conversions are registered), so the long under a `timestamp-millis`
    * field is MILLIS — `avro` (the unwrapped reader schema for this value)
    * is threaded through decode so millis/micros dispatch on the declared
    * logical type instead of assuming micros (r13 ADVICE: foreign
    * Debezium-style millis files loaded timestamps 1000× too small).
    */
  private def toSparkValue(v: AnyRef, dt: DataType, avro: Schema): Any = (v, dt) match {
    case (null, _) => null
    case (e: org.apache.avro.generic.GenericEnumSymbol[_], StringType) => e.toString
    case (s: CharSequence, StringType) => s.toString
    case (f: org.apache.avro.generic.GenericFixed, BinaryType) => f.bytes().clone()
    case (f: org.apache.avro.generic.GenericFixed, dec: DecimalType) =>
      new java.math.BigDecimal(new java.math.BigInteger(f.bytes()), dec.scale)
    case (b: ByteBuffer, BinaryType) =>
      val arr = new Array[Byte](b.remaining()); b.duplicate().get(arr); arr
    case (b: ByteBuffer, dec: DecimalType) =>
      val arr = new Array[Byte](b.remaining()); b.duplicate().get(arr)
      new java.math.BigDecimal(new java.math.BigInteger(arr), dec.scale)
    case (days: java.lang.Integer, DateType) =>
      java.sql.Date.valueOf(java.time.LocalDate.ofEpochDay(days.longValue()))
    case (t: java.lang.Long, TimestampType) =>
      val micros = if (isMillis(avro)) Math.multiplyExact(t.longValue(), 1000L) else t.longValue()
      val ts = new java.sql.Timestamp(Math.floorDiv(micros, 1000000L) * 1000L)
      ts.setNanos(Math.floorMod(micros, 1000000L).toInt * 1000)
      ts
    case (t: java.lang.Long, TimestampNTZType) =>
      val micros = if (isMillis(avro)) Math.multiplyExact(t.longValue(), 1000L) else t.longValue()
      java.time.LocalDateTime.ofEpochSecond(
        Math.floorDiv(micros, 1000000L),
        Math.floorMod(micros, 1000000L).toInt * 1000,
        java.time.ZoneOffset.UTC)
    case (a: java.util.Collection[_], ArrayType(elem, _)) =>
      val elemSchema = unwrap(avro.getElementType)
      a.asScala.toSeq.map(e => toSparkValue(e.asInstanceOf[AnyRef], elem, elemSchema))
    case (m: java.util.Map[_, _], MapType(StringType, vt, _)) =>
      val valueSchema = unwrap(avro.getValueType)
      m.asScala.map { case (k, mv) =>
        k.toString -> toSparkValue(mv.asInstanceOf[AnyRef], vt, valueSchema)
      }.toMap
    case (r: GenericRecord, nested: StructType) => recordToRow(r, nested, avro)
    case (other, _) => other
  }

  private def isMillis(s: Schema): Boolean = s.getLogicalType match {
    case _: LogicalTypes.TimestampMillis | _: LogicalTypes.LocalTimestampMillis => true
    case _ => false
  }
}

/** Avro registered as a [[SourceProvider]] next to csv/parquet/json/orc —
  * a reference user whose lake ships Avro objects points the same registry
  * key at the same path contract. Option `avroSchema` (a schema JSON)
  * overrides the header-derived reader schema, mirroring spark-avro's
  * option of the same name.
  */
object AvroSource extends SourceProvider {
  val name = "avro"
  def load(spark: SparkSession, path: String, options: Map[String, String]): DataFrame =
    SchemaConform.lowercaseColumns(AvroIo.read(spark, path, options.get("avroSchema")))
}
