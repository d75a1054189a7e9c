package graft.io

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{Column, DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Jar-free ORC DATA FILES in foreign Iceberg tables — the last
  * spec-legal data format the bridge refused (the r16 verdict's "hard
  * wall" #2 names Avro AND ORC). Spark ships a full native ORC reader,
  * so unlike Avro this path stays COLUMNAR and distributed: planning
  * probes each file's footer for the Iceberg field-id attributes the
  * spec pins (`iceberg.id` on every ORC type), groups files by their
  * id→column mapping, and reads each group with `spark.read.orc` plus
  * a rename projection onto the CURRENT schema — so renames and added
  * columns come out right, exactly parquet's by-id rule. Footers
  * without ids fall back to the spec's name-mapping projection, then
  * plain names (the same id-less rules the parquet path applies).
  *
  * One honest refusal, stated where it bites: Spark's
  * `_metadata.row_index` exists for PARQUET scans only, so ORC rows
  * cannot be addressed by POSITION — a snapshot combining position
  * deletes with ORC data files refuses (compact to parquet first), and
  * the DML write side never emits position deletes against ORC rows.
  * Equality deletes apply fine: they need only the file's sequence
  * number (`_metadata.file_path` works for every file source). */
object IcebergOrcData {

  /** Per-file footer probe: the top-level (field id → ORC column name)
    * mapping from the `iceberg.id` attributes, empty when the writer
    * recorded none. Metadata-only (one footer read). */
  private def fileIds(spark: SparkSession, path: String): Map[Int, String] = {
    val p = new Path(path)
    val r = org.apache.orc.OrcFile.createReader(p,
      org.apache.orc.OrcFile.readerOptions(spark.sparkContext.hadoopConfiguration))
    import scala.jdk.CollectionConverters._
    val root = r.getSchema
    if (root.getCategory != org.apache.orc.TypeDescription.Category.STRUCT) Map.empty
    else root.getFieldNames.asScala.zip(root.getChildren.asScala).flatMap {
      case (name, child) =>
        Option(child.getAttributeValue("iceberg.id")).flatMap(_.toIntOption).map(_ -> name)
    }.toMap
  }

  /** The row count in one ORC file's footer. */
  private[io] def rows(spark: SparkSession, path: String): Long = {
    val r = org.apache.orc.OrcFile.createReader(new Path(path),
      org.apache.orc.OrcFile.readerOptions(spark.sparkContext.hadoopConfiguration))
    r.getNumberOfRows
  }

  /** Distributed read of Iceberg-ORC data files as `schema` rows.
    * `withFile`: also emit `__graft_ice_file` (and a typed-null
    * `__graft_ice_pos` so the delete pipeline's shape is uniform —
    * callers that NEED real positions must have refused already). */
  private[io] def read(spark: SparkSession, files: Seq[String], schema: StructType,
      nameMapping: Map[Int, Seq[String]], withFile: Boolean): DataFrame = {
    val out =
      if (!withFile) schema
      else schema.add(IcebergImport.LineageFileCol, StringType)
        .add(IcebergImport.LineagePosCol, LongType)
    if (files.isEmpty)
      return spark.createDataFrame(java.util.Collections.emptyList[Row](), out)
    def qcol(c: String) = col("`" + c.replace("`", "``") + "`")
    def fieldId(f: StructField): Option[Int] =
      if (f.metadata.contains("parquet.field.id"))
        Some(f.metadata.getLong("parquet.field.id").toInt)
      else None
    // footer probes are independent metadata round trips (painful
    // sequentially against an object store) — probe CONCURRENTLY, like
    // the parquet path's footer classifier
    val probed = new java.util.concurrent.ConcurrentHashMap[String, Seq[(Int, String)]]()
    def idsOf(f: String): Seq[(Int, String)] =
      probed.computeIfAbsent(f, f2 => fileIds(spark, f2).toSeq.sorted)
    if (files.size > 4) {
      import scala.collection.parallel.CollectionConverters._
      val pc = files.par
      pc.tasksupport = new scala.collection.parallel.ExecutionContextTaskSupport(
        scala.concurrent.ExecutionContext.global)
      pc.foreach(idsOf(_))
    }
    // group files by their id→name mapping signature: one scan per
    // distinct vintage, unioned by name (same move as the parquet
    // path's by-id/id-less classes)
    val grouped = files.groupBy(idsOf)
    val frames = grouped.toSeq.sortBy(_._1.mkString(",")).map { case (idSeq, fs) =>
      val ids = idSeq.toMap
      val raw = spark.read.orc(fs: _*)
      val have = raw.columns.toSet
      // a name claimed by some field's mapping entry belongs to that
      // id alone (the dropped-then-reused-name guard, as in parquet)
      val claimed: Map[String, Int] =
        if (ids.nonEmpty) Map.empty
        else nameMapping.toSeq.flatMap { case (id, names) => names.map(_ -> id) }
          .groupBy(_._1).view.mapValues(_.head._2).toMap
      val cols: Seq[Column] = schema.fields.toSeq.map { sf =>
        val src: Option[String] = fieldId(sf) match {
          case Some(id) if ids.nonEmpty =>
            ids.get(id).filter(have.contains) // BY ID: the footer names the column
          case idOpt =>
            val plainOk = have.contains(sf.name) &&
              claimed.get(sf.name).forall(owner => idOpt.contains(owner))
            if (plainOk) Some(sf.name)
            else idOpt.toSeq.flatMap(id => nameMapping.getOrElse(id, Nil))
              .find(have.contains)
        }
        src match {
          case Some(c) =>
            // the cast is reserved for SPEC-LEGAL promotions — a
            // physically incompatible file column must refuse loudly,
            // never read back as silent NULLs (the module's contract)
            val fromType = raw.schema(c).dataType
            require(readCompatible(fromType, sf.dataType),
              s"ORC data file(s) ${fs.take(2).mkString(", ")} carry column '$c' as " +
                s"${fromType.simpleString} where the table schema wants " +
                s"${sf.dataType.simpleString} for '${sf.name}' — not a spec-legal " +
                "promotion; refusing rather than silently nulling the values " +
                "(rewrite or compact the offending files)")
            qcol(c).cast(sf.dataType).as(sf.name)
          case None    => lit(null).cast(sf.dataType).as(sf.name)
        }
      }
      val extra: Seq[Column] =
        if (!withFile) Nil
        else Seq(col("_metadata.file_path").as(IcebergImport.LineageFileCol),
          lit(null).cast(LongType).as(IcebergImport.LineagePosCol))
      raw.select(cols ++ extra: _*)
    }
    frames.reduce(_ unionByName _)
  }

  /** Is reading a physical `from` as a logical `to` spec-legal? Equal
    * types (modulo nullability), the spec's promotions (int→long,
    * float→double, decimal precision widening at fixed scale), and the
    * same recursively for containers. Everything else refuses. */
  private def stripNullability(dt: DataType): DataType = dt match {
    case s: StructType => StructType(s.fields.map(f =>
      StructField(f.name, stripNullability(f.dataType), nullable = true)))
    case a: ArrayType => ArrayType(stripNullability(a.elementType), containsNull = true)
    case m: MapType =>
      MapType(stripNullability(m.keyType), stripNullability(m.valueType),
        valueContainsNull = true)
    case other => other
  }

  private[io] def readCompatible(from: DataType, to: DataType): Boolean = (from, to) match {
    case (f, t) if stripNullability(f) == stripNullability(t) => true
    case (IntegerType, LongType) => true
    case (FloatType, DoubleType) => true
    case (f: DecimalType, t: DecimalType) => t.scale == f.scale && t.precision >= f.precision
    case (f: ArrayType, t: ArrayType) => readCompatible(f.elementType, t.elementType)
    case (f: MapType, t: MapType) =>
      readCompatible(f.keyType, t.keyType) && readCompatible(f.valueType, t.valueType)
    case (f: StructType, t: StructType) =>
      f.fields.length == t.fields.length &&
        f.fields.zip(t.fields).forall { case (a, b) =>
          a.name == b.name && readCompatible(a.dataType, b.dataType)
        }
    case _ => false
  }

  // ------------------------------------------------------------------
  // write side — fixtures and round-trip tests (driver-side, small)
  // ------------------------------------------------------------------

  /** Write `df` as ONE Iceberg-shaped ORC data file (`iceberg.id`
    * attributes on every column per the spec's ORC mapping) and return
    * its row count. Driver-side fixture tooling — int/long/double/
    * string columns only (what the tests exercise). */
  private[graft] def writeDataFile(spark: SparkSession, df: DataFrame, path: String,
      fieldIds: Map[String, Int]): Long = {
    import org.apache.orc.TypeDescription
    val schema = df.schema
    val td = TypeDescription.createStruct()
    schema.fields.foreach { sf =>
      val child = sf.dataType match {
        case IntegerType => TypeDescription.createInt()
        case LongType    => TypeDescription.createLong()
        case DoubleType  => TypeDescription.createDouble()
        case StringType  => TypeDescription.createString()
        case other => throw new IllegalArgumentException(
          s"writeDataFile does not map ${other.simpleString}")
      }
      child.setAttribute("iceberg.id",
        fieldIds.getOrElse(sf.name, throw new IllegalArgumentException(
          s"no field id for column '${sf.name}'")).toString)
      td.addField(sf.name, child)
    }
    val conf = spark.sparkContext.hadoopConfiguration
    val w = org.apache.orc.OrcFile.createWriter(new Path(path),
      org.apache.orc.OrcFile.writerOptions(conf).setSchema(td))
    val batch = td.createRowBatch()
    var count = 0L
    def flush(): Unit = if (batch.size > 0) { w.addRowBatch(batch); batch.reset() }
    df.toLocalIterator().forEachRemaining { row =>
      val r = batch.size
      schema.fields.zipWithIndex.foreach { case (sf, i) =>
        val cv = batch.cols(i)
        if (row.isNullAt(i)) { cv.noNulls = false; cv.isNull(r) = true }
        else sf.dataType match {
          case IntegerType =>
            cv.asInstanceOf[org.apache.hadoop.hive.ql.exec.vector.LongColumnVector]
              .vector(r) = row.getInt(i).toLong
          case LongType =>
            cv.asInstanceOf[org.apache.hadoop.hive.ql.exec.vector.LongColumnVector]
              .vector(r) = row.getLong(i)
          case DoubleType =>
            cv.asInstanceOf[org.apache.hadoop.hive.ql.exec.vector.DoubleColumnVector]
              .vector(r) = row.getDouble(i)
          case StringType =>
            val b = row.getString(i).getBytes("UTF-8")
            cv.asInstanceOf[org.apache.hadoop.hive.ql.exec.vector.BytesColumnVector]
              .setVal(r, b, 0, b.length)
          case _ => ()
        }
      }
      batch.size += 1
      count += 1
      if (batch.size == batch.getMaxSize) flush()
    }
    flush()
    w.close()
    count
  }
}
