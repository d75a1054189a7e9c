package graft.io

import java.io.{ObjectInputStream, ObjectOutputStream}

import org.apache.avro.generic.{GenericData, GenericDatumReader, GenericDatumWriter, GenericRecord}
import org.apache.avro.{Schema => AvroSchema, SchemaBuilder}
import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._

/** Jar-free AVRO DATA FILES in foreign Iceberg tables — the Iceberg
  * spec allows `file_format = AVRO` for data files (Flink CDC writers
  * and streaming ingesters commonly land Avro), and until this module
  * the import refused them outright. No `spark-avro` data source ships
  * in this environment, so the decode rides the plain Avro
  * object-container library (already on the classpath for manifests)
  * inside EXECUTOR tasks — a mapPartitions-at-the-codec-boundary read,
  * the same pattern the multimodal codecs use:
  *
  *  - one Spark partition per file-chunk of the file list; each task
  *    streams its files record-by-record (never materializing a file),
  *    emitting rows in the TABLE's current schema;
  *  - columns resolve BY ICEBERG FIELD ID first (the spec's Avro
  *    mapping stores `field-id` props on every record field), falling
  *    back to name for id-less writers; missing columns null-fill
  *    (schema evolution), extra file columns are ignored;
  *  - the spec's Avro type mappings are applied: `date` (int days),
  *    `timestamp[tz]` (long micros), `decimal` (fixed/bytes unscaled
  *    big-endian), `uuid` (fixed[16] → string), unions-with-null
  *    unwrap, structs/lists/maps recurse;
  *  - per-row POSITION is tracked (the record's ordinal in its file —
  *    exactly the spec's position-delete `pos`), so row-level deletes
  *    apply to Avro rows the same as parquet ones.
  *
  * This is the COMPATIBILITY path, not the performance path: Avro is a
  * row format — no column pruning, no predicate pushdown, no
  * vectorization. A migrating Avro shop reads correctly first and
  * compacts to parquet ([[IcebergMaintenance.compact]]) for the scan
  * profile. The write side ([[writeDataFile]]) exists for fixtures and
  * round-trip tests, not as a recommended sink. */
object IcebergAvroData {

  /** Hadoop Configuration is not Serializable but is Writable — the
    * standard wrapper, so executor tasks open files under the
    * driver's exact FS settings. */
  private[io] final class SerializableConf(@transient var value: Configuration)
      extends Serializable {
    private def writeObject(out: ObjectOutputStream): Unit = {
      out.defaultWriteObject(); value.write(out)
    }
    private def readObject(in: ObjectInputStream): Unit = {
      in.defaultReadObject(); value = new Configuration(false); value.readFields(in)
    }
  }

  /** Distributed read of Iceberg-Avro data files as `schema` rows.
    * `withPos`: also emit `(__graft_ice_file, __graft_ice_pos)` — the
    * lineage columns the delete-application pipeline joins on; the
    * file spelling is exactly the path string given here. */
  private[io] def read(spark: SparkSession, files: Seq[String], schema: StructType,
      withPos: Boolean = false): DataFrame = {
    val out =
      if (!withPos) schema
      else schema.add(IcebergImport.LineageFileCol, StringType)
        .add(IcebergImport.LineagePosCol, LongType)
    if (files.isEmpty)
      return spark.createDataFrame(java.util.Collections.emptyList[Row](), out)
    val conf = new SerializableConf(spark.sparkContext.hadoopConfiguration)
    val fields = schema.fields
    val n = math.max(1, math.min(files.size, spark.sparkContext.defaultParallelism))
    val rdd = spark.sparkContext.parallelize(files, n).flatMap { f =>
      val p = new Path(f)
      val fs = p.getFileSystem(conf.value)
      val stream = new org.apache.avro.file.DataFileStream[GenericRecord](
        fs.open(p), new GenericDatumReader[GenericRecord]())
      // the TASK owns the handle, not the iterator: a partially
      // consumed iterator (LIMIT/take, downstream failure) never
      // reaches exhaustion, so closing only there would leak the file
      val closed = new java.util.concurrent.atomic.AtomicBoolean(false)
      def close(): Unit = if (closed.compareAndSet(false, true)) stream.close()
      Option(org.apache.spark.TaskContext.get())
        .foreach(_.addTaskCompletionListener[Unit](_ => close()))
      // resolve each table column to the file's field position once —
      // under a close guard: a refused footer must not leak the handle
      val resolvers: Array[Option[AvroSchema.Field]] =
        try {
          val fileSchema = stream.getSchema
          require(fileSchema.getType == AvroSchema.Type.RECORD,
            s"Avro data file $f is not a record container (top-level ${fileSchema.getType})")
          fields.map(sf => resolveField(fileSchema, sf))
        } catch { case t: Throwable => close(); throw t }
      new Iterator[Row] {
        private var pos = -1L
        private var done = false
        override def hasNext: Boolean = {
          if (done) return false // post-close hasNext must not touch the stream
          val h = stream.hasNext
          if (!h) { done = true; close() }
          h
        }
        override def next(): Row = {
          val rec = stream.next()
          pos += 1
          val vals = new Array[Any](fields.length + (if (withPos) 2 else 0))
          var i = 0
          while (i < fields.length) {
            vals(i) = resolvers(i) match {
              case Some(af) => convert(rec.get(af.pos()), af.schema(), fields(i).dataType, f)
              case None     => null
            }
            i += 1
          }
          if (withPos) { vals(fields.length) = f; vals(fields.length + 1) = pos }
          Row.fromSeq(scala.collection.immutable.ArraySeq.unsafeWrapArray(vals))
        }
      }
    }
    spark.createDataFrame(rdd, out)
  }

  /** The file field serving a table column: by Iceberg FIELD ID
    * (`field-id` prop, the spec's Avro mapping) when the table column
    * carries one, else by name. */
  private def resolveField(fileSchema: AvroSchema, sf: StructField): Option[AvroSchema.Field] = {
    import scala.jdk.CollectionConverters._
    val wantId: Option[Long] =
      if (sf.metadata.contains("parquet.field.id")) Some(sf.metadata.getLong("parquet.field.id"))
      else None
    val byId = wantId.flatMap { id =>
      fileSchema.getFields.asScala.find { f =>
        Option(f.getObjectProp("field-id")).exists {
          case n: Number => n.longValue == id
          case s: String => s.toLongOption.contains(id)
          case _ => false
        }
      }
    }
    byId.orElse(Option(fileSchema.getField(sf.name)))
  }

  /** One Avro value → the Spark external type for `dt`, per the
    * Iceberg spec's Avro mappings. Refusals are loud with the file in
    * the message — silently nulling a value the mapping doesn't cover
    * would corrupt a migration. */
  private def convert(v: Any, sc0: AvroSchema, dt: DataType, file: String): Any = {
    if (v == null) return null
    // unwrap the nullable union to the concrete branch
    val sc =
      if (sc0.getType == AvroSchema.Type.UNION) {
        import scala.jdk.CollectionConverters._
        sc0.getTypes.asScala.find(_.getType != AvroSchema.Type.NULL).getOrElse(sc0)
      } else sc0
    val logical = Option(sc.getLogicalType).map(_.getName)
    (dt, v) match {
      case (IntegerType, i: java.lang.Integer) => i
      case (LongType, l: java.lang.Long) => l
      case (LongType, i: java.lang.Integer) => java.lang.Long.valueOf(i.longValue)
      case (BooleanType, b: java.lang.Boolean) => b
      case (FloatType, f: java.lang.Float) => f
      case (DoubleType, d: java.lang.Double) => d
      case (DoubleType, f: java.lang.Float) => java.lang.Double.valueOf(f.doubleValue)
      case (StringType, s) => s match {
        case u: org.apache.avro.util.Utf8 => u.toString
        case s2: String => s2
        case fx: GenericData.Fixed if logical.contains("uuid") || fx.bytes().length == 16 =>
          val bb = java.nio.ByteBuffer.wrap(fx.bytes())
          new java.util.UUID(bb.getLong, bb.getLong).toString
        case other => other.toString
      }
      case (DateType, i: java.lang.Integer) => java.sql.Date.valueOf(
        java.time.LocalDate.ofEpochDay(i.longValue))
      case (TimestampType, l: java.lang.Long) => microsToTs(l)
      case (TimestampNTZType, l: java.lang.Long) =>
        java.time.LocalDateTime.ofEpochSecond(
          Math.floorDiv(l.longValue, 1000000L),
          (Math.floorMod(l.longValue, 1000000L) * 1000L).toInt,
          java.time.ZoneOffset.UTC)
      case (d: DecimalType, x) =>
        val unscaled = x match {
          case bb: java.nio.ByteBuffer =>
            val b = new Array[Byte](bb.remaining()); bb.duplicate().get(b); b
          case fx: GenericData.Fixed => fx.bytes()
          case other => throw new IllegalArgumentException(
            s"decimal column carries ${other.getClass.getName} in Avro data file $file")
        }
        new java.math.BigDecimal(new java.math.BigInteger(unscaled), d.scale)
      case (BinaryType, bb: java.nio.ByteBuffer) =>
        val b = new Array[Byte](bb.remaining()); bb.duplicate().get(b); b
      case (BinaryType, fx: GenericData.Fixed) => fx.bytes()
      case (st: StructType, rec: GenericRecord) =>
        Row.fromSeq(st.fields.toSeq.map { sf =>
          resolveField(rec.getSchema, sf) match {
            case Some(af) => convert(rec.get(af.pos()), af.schema(), sf.dataType, file)
            case None     => null
          }
        })
      case (at: ArrayType, coll: java.util.Collection[_]) =>
        import scala.jdk.CollectionConverters._
        coll.asScala.toSeq.map(convert(_, sc.getElementType, at.elementType, file))
      case (mt: MapType, m: java.util.Map[_, _]) =>
        import scala.jdk.CollectionConverters._
        m.asScala.map { case (k, mv) =>
          val key = k match { case u: org.apache.avro.util.Utf8 => u.toString; case o => o }
          convert(key, AvroSchema.create(AvroSchema.Type.STRING), mt.keyType, file) ->
            convert(mv, sc.getValueType, mt.valueType, file)
        }.toMap
      case (other, x) => throw new IllegalArgumentException(
        s"Avro data file $file carries ${x.getClass.getName} where the table schema wants " +
          s"${other.simpleString} — mapping not supported; compact the table to parquet first")
    }
  }

  private def microsToTs(l: java.lang.Long): java.sql.Timestamp = {
    val ts = new java.sql.Timestamp(Math.floorDiv(l.longValue, 1000L))
    ts.setNanos((Math.floorMod(l.longValue, 1000000L) * 1000L).toInt)
    ts
  }

  // ------------------------------------------------------------------
  // write side — fixtures and round-trip tests (driver-side, small)
  // ------------------------------------------------------------------

  /** Write `df` as ONE Iceberg-shaped Avro data file (record schema
    * with `field-id` props per the spec's Avro mapping) and return its
    * row count. Driver-side — fixture/test tooling, not a data sink.
    * Supported column types: the primitives [[convert]] reads back. */
  private[graft] def writeDataFile(spark: SparkSession, df: DataFrame, path: String,
      fieldIds: Map[String, Int]): Long = {
    val schema = df.schema
    var b = SchemaBuilder.record("iceberg_row").fields()
    schema.fields.foreach { sf =>
      val base: AvroSchema = sf.dataType match {
        case IntegerType => AvroSchema.create(AvroSchema.Type.INT)
        case LongType    => AvroSchema.create(AvroSchema.Type.LONG)
        case BooleanType => AvroSchema.create(AvroSchema.Type.BOOLEAN)
        case FloatType   => AvroSchema.create(AvroSchema.Type.FLOAT)
        case DoubleType  => AvroSchema.create(AvroSchema.Type.DOUBLE)
        case StringType  => AvroSchema.create(AvroSchema.Type.STRING)
        case BinaryType  => AvroSchema.create(AvroSchema.Type.BYTES)
        case DateType =>
          org.apache.avro.LogicalTypes.date().addToSchema(AvroSchema.create(AvroSchema.Type.INT))
        case TimestampType =>
          org.apache.avro.LogicalTypes.timestampMicros()
            .addToSchema(AvroSchema.create(AvroSchema.Type.LONG))
        case d: DecimalType =>
          org.apache.avro.LogicalTypes.decimal(d.precision, d.scale)
            .addToSchema(AvroSchema.create(AvroSchema.Type.BYTES))
        case other => throw new IllegalArgumentException(
          s"writeDataFile does not map ${other.simpleString}")
      }
      val union = AvroSchema.createUnion(AvroSchema.create(AvroSchema.Type.NULL), base)
      val fb = b.name(sf.name)
      val id = fieldIds.getOrElse(sf.name, throw new IllegalArgumentException(
        s"no field id for column '${sf.name}'"))
      b = fb.prop("field-id", id.toString).`type`(union).withDefault(null)
    }
    val avroSchema = b.endRecord()
    val p = new Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val w = new org.apache.avro.file.DataFileWriter[GenericRecord](
      new GenericDatumWriter[GenericRecord](avroSchema))
    w.create(avroSchema, fs.create(p, false))
    var count = 0L
    df.toLocalIterator().forEachRemaining { row =>
      val rec = new GenericData.Record(avroSchema)
      schema.fields.zipWithIndex.foreach { case (sf, i) =>
        val v: AnyRef =
          if (row.isNullAt(i)) null
          else sf.dataType match {
            case DateType =>
              java.lang.Integer.valueOf(row.getDate(i).toLocalDate.toEpochDay.toInt)
            case TimestampType =>
              val ts = row.getTimestamp(i)
              java.lang.Long.valueOf(ts.getTime * 1000L + (ts.getNanos / 1000L) % 1000L)
            case d: DecimalType =>
              java.nio.ByteBuffer.wrap(
                row.getDecimal(i).setScale(d.scale).unscaledValue().toByteArray)
            case BinaryType => java.nio.ByteBuffer.wrap(row.getAs[Array[Byte]](i))
            case _ => row.get(i).asInstanceOf[AnyRef]
          }
        rec.put(sf.name, v)
      }
      w.append(rec)
      count += 1
    }
    w.close()
    count
  }
}
