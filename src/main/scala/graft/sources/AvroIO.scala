package graft.sources

import org.apache.avro.Schema
import org.apache.avro.generic.{GenericData, GenericRecord}
import org.apache.avro.mapred.AvroKey
import org.apache.avro.mapreduce.{AvroJob, AvroKeyInputFormat, AvroKeyOutputFormat}
import org.apache.hadoop.io.NullWritable
import org.apache.hadoop.mapreduce.Job
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._

import java.nio.ByteBuffer
import scala.jdk.CollectionConverters._

/** Avro container-file round-trip built directly on the Avro core +
  * avro-mapred jars that ship in `/opt/spark/jars` (the `spark-avro`
  * DataSource module does NOT ship there, so `spark.read.format("avro")`
  * is unavailable — this module closes that gap with the public
  * `org.apache.avro.mapreduce` API instead).
  *
  * Why this shape is cluster-correct, not a local-FS hack:
  *  - The WRITE goes through `saveAsNewAPIHadoopFile` +
  *    `AvroKeyOutputFormat`, i.e. Hadoop's task-commit protocol — each
  *    task writes an `.avro` container part-file to a temporary attempt
  *    dir and the committer promotes it, exactly how parquet/ORC writes
  *    survive speculative execution and task retries on a real cluster.
  *  - The READ goes through `newAPIHadoopFile` + `AvroKeyInputFormat`,
  *    which is splittable on Avro sync markers — a 100 GB Avro file
  *    fans out across tasks the same way a parquet scan does.
  *  - Records are converted Row→GenericRecord inside the writing task
  *    (no shuffle of Avro objects), and GenericRecord→Row immediately in
  *    the reading task's map (the Hadoop record reader REUSES its datum
  *    between `next()` calls; converting eagerly copies every value out
  *    before reuse can corrupt it).
  *
  * Like the CSV/JSON readers in [[Sources]], the reader takes an
  * EXPLICIT Spark schema: the Avro reader schema is derived from it and
  * handed to `AvroJob.setInputKeySchema`, so Avro's own schema-resolution
  * rules (field-by-name matching, default filling) apply against the
  * writer schema embedded in each container file — schema evolution
  * behaves the way Avro consumers expect, and no inference pass runs.
  *
  * Type subset carried (the driver-table universe, checked in
  * AvroRoundTripSpec): BOOLEAN, INT, LONG, FLOAT, DOUBLE, STRING, BINARY,
  * TIMESTAMP (as Avro long + `timestamp-micros` logical type, the same
  * physical encoding spark-avro uses), DATE (int + `date`), and
  * ARRAY of any of those. Nullable fields become `union {null, T}`.
  */
object AvroIO {

  // ---------------------------------------------------------------- schema
  /** Spark StructType → Avro record schema (JSON-stable, so it can be
    * shipped to tasks as a string and re-parsed per partition). */
  def toAvroSchema(st: StructType, name: String): Schema = {
    val fields = st.fields.toSeq.map { f =>
      val base = toAvroType(f.dataType, s"${name}_${f.name}")
      val typ =
        if (f.nullable) Schema.createUnion(java.util.List.of(Schema.create(Schema.Type.NULL), base))
        else base
      new Schema.Field(f.name, typ, null, if (f.nullable) Schema.Field.NULL_DEFAULT_VALUE else null)
    }
    Schema.createRecord(name, null, "graft.avro", false, fields.asJava)
  }

  private def toAvroType(dt: DataType, nestedName: String): Schema = dt match {
    case BooleanType => Schema.create(Schema.Type.BOOLEAN)
    case IntegerType => Schema.create(Schema.Type.INT)
    case LongType    => Schema.create(Schema.Type.LONG)
    case FloatType   => Schema.create(Schema.Type.FLOAT)
    case DoubleType  => Schema.create(Schema.Type.DOUBLE)
    case StringType  => Schema.create(Schema.Type.STRING)
    case BinaryType  => Schema.create(Schema.Type.BYTES)
    case DateType =>
      val s = Schema.create(Schema.Type.INT); s.addProp("logicalType", "date"); s
    case TimestampType =>
      val s = Schema.create(Schema.Type.LONG); s.addProp("logicalType", "timestamp-micros"); s
    case TimestampNTZType => // driver parquet is timestamp[us] with no zone
      val s = Schema.create(Schema.Type.LONG); s.addProp("logicalType", "local-timestamp-micros"); s
    case ArrayType(elem, containsNull) =>
      val e = toAvroType(elem, nestedName + "_elem")
      val et =
        if (containsNull) Schema.createUnion(java.util.List.of(Schema.create(Schema.Type.NULL), e))
        else e
      Schema.createArray(et)
    case other =>
      throw new IllegalArgumentException(s"AvroIO: unsupported Spark type $other")
  }

  // ------------------------------------------------------------- conversion
  private def fromAvroValue(v: Any, dt: DataType): Any = (v, dt) match {
    case (null, _)                    => null
    case (s: CharSequence, StringType) => s.toString // Avro hands back Utf8
    case (micros: java.lang.Long, TimestampType) =>
      val ts = new java.sql.Timestamp(Math.floorDiv(micros, 1000L))
      ts.setNanos((Math.floorMod(micros, 1000000L) * 1000L).toInt)
      ts
    case (days: java.lang.Integer, DateType) =>
      java.sql.Date.valueOf(java.time.LocalDate.ofEpochDay(days.longValue))
    case (micros: java.lang.Long, TimestampNTZType) =>
      java.time.LocalDateTime.ofEpochSecond(
        Math.floorDiv(micros, 1000000L),
        (Math.floorMod(micros, 1000000L) * 1000L).toInt,
        java.time.ZoneOffset.UTC)
    case (bb: ByteBuffer, BinaryType) =>
      val out = new Array[Byte](bb.remaining()); bb.duplicate().get(out); out
    case (lst: java.util.Collection[_], ArrayType(elem, _)) =>
      lst.asScala.toSeq.map(x => fromAvroValue(x, elem))
    case (x, _)                       => x
  }

  private def recordToRow(rec: GenericRecord, st: StructType): Row = {
    // positional get: after Avro schema resolution the datum carries the
    // READER schema, which is derived from `st` in field order, so
    // position i is st field i — no per-field name lookup per row
    val vals = new Array[Any](st.length)
    var i = 0
    while (i < st.length) {
      vals(i) = fromAvroValue(rec.get(i), st.fields(i).dataType)
      i += 1
    }
    Row.fromSeq(scala.collection.immutable.ArraySeq.unsafeWrapArray(vals))
  }

  // -------------------------------------------------------------------- io
  /** Per-field extractor from Spark's INTERNAL row format straight to the
    * Avro value — the write path reads `queryExecution.toRdd` instead of
    * `df.rdd`, skipping the InternalRow→external-Row encoder pass that
    * boxed and converted every value once before [[toAvroValue]]
    * converted it again (r13: the conversion, not the container I/O, was
    * the write-side cost). Internal encodings line up with Avro's:
    * TimestampType/TimestampNTZType are ALREADY epoch-micros longs and
    * DateType epoch-day ints — identity moves here where the Row path
    * round-tripped through java.sql/java.time objects. */
  private def internalGetter(dt: DataType): (org.apache.spark.sql.catalyst.util.ArrayData Either org.apache.spark.sql.catalyst.InternalRow, Int) => Any = {
    def get(ord: (org.apache.spark.sql.catalyst.util.ArrayData Either org.apache.spark.sql.catalyst.InternalRow, Int) => Any) = ord
    dt match {
      case BooleanType => get((r, i) => r.fold(_.getBoolean(i), _.getBoolean(i)))
      case IntegerType | DateType => get((r, i) => r.fold(_.getInt(i), _.getInt(i)))
      case LongType | TimestampType | TimestampNTZType =>
        get((r, i) => r.fold(_.getLong(i), _.getLong(i)))
      case FloatType  => get((r, i) => r.fold(_.getFloat(i), _.getFloat(i)))
      case DoubleType => get((r, i) => r.fold(_.getDouble(i), _.getDouble(i)))
      case StringType => get((r, i) => r.fold(_.getUTF8String(i), _.getUTF8String(i)).toString)
      case BinaryType => get((r, i) => ByteBuffer.wrap(r.fold(_.getBinary(i), _.getBinary(i))))
      case ArrayType(elem, _) =>
        val eg = internalGetter(elem)
        get { (r, i) =>
          val ad = r.fold(_.getArray(i), _.getArray(i))
          val n = ad.numElements()
          val out = new java.util.ArrayList[Any](n)
          var j = 0
          while (j < n) {
            out.add(if (ad.isNullAt(j)) null else eg(Left(ad), j))
            j += 1
          }
          out
        }
      case other =>
        throw new IllegalArgumentException(s"AvroIO: unsupported Spark type $other")
    }
  }

  /** Write `df` as Avro container part-files under `path` (overwrite).
    * One part per partition, committed through the Hadoop protocol. */
  def writeAvro(df: DataFrame, path: String): Unit = {
    val st = df.schema
    val avroJson = toAvroSchema(st, "graft_record").toString
    val sc = df.sparkSession.sparkContext
    val hconf = sc.hadoopConfiguration
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(hconf)
    if (fs.exists(p)) fs.delete(p, true)
    val job = Job.getInstance(hconf)
    AvroJob.setOutputKeySchema(job, new Schema.Parser().parse(avroJson))
    val getters = st.fields.map(f => internalGetter(f.dataType))
    val nFields = st.length
    val pairs = df.queryExecution.toRdd.mapPartitions { it =>
      val avro = new Schema.Parser().parse(avroJson) // parse once per task
      it.map { ir =>
        // values are extracted eagerly per row, so UnsafeRow reuse by the
        // upstream iterator cannot corrupt the record
        val rec = new GenericData.Record(avro)
        var i = 0
        while (i < nFields) {
          rec.put(i, if (ir.isNullAt(i)) null else getters(i)(Right(ir), i))
          i += 1
        }
        (new AvroKey[GenericRecord](rec), NullWritable.get())
      }
    }
    pairs.saveAsNewAPIHadoopFile(
      path,
      classOf[AvroKey[GenericRecord]],
      classOf[NullWritable],
      classOf[AvroKeyOutputFormat[GenericRecord]],
      job.getConfiguration)
  }

  /** Read Avro container files at `path` with the given (pinned) Spark
    * schema; Avro schema resolution maps writer fields by name. */
  def readAvro(s: SparkSession, path: String, st: StructType): DataFrame = {
    val avroJson = toAvroSchema(st, "graft_record").toString
    val job = Job.getInstance(s.sparkContext.hadoopConfiguration)
    AvroJob.setInputKeySchema(job, new Schema.Parser().parse(avroJson))
    val rows = s.sparkContext
      .newAPIHadoopFile(
        path,
        classOf[AvroKeyInputFormat[GenericRecord]],
        classOf[AvroKey[GenericRecord]],
        classOf[NullWritable],
        job.getConfiguration)
      // convert INSIDE the map — the record reader reuses its datum
      .map { case (k, _) => recordToRow(k.datum(), st) }
    s.createDataFrame(rows, st)
  }
}
