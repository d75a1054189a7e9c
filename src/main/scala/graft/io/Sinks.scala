package graft.io

import org.apache.spark.sql.{DataFrame, SaveMode}

/** Managed-table and file sinks.
  *
  * The reference writes `format("iceberg").mode("overwrite").saveAsTable`
  * (reference: spark/jobs/job_silver.py:174-178, job_gold.py:98-102) —
  * a FULL-table overwrite on every run, so despite date partitioning the
  * table only ever holds the latest run. We reproduce that as parity
  * mode and add the mode the reference should have used: dynamic
  * partition overwrite, which replaces only the partitions present in
  * the incoming frame — at 100 TB rewriting the whole table daily is
  * not an option. Iceberg-specific metadata-retention options
  * (job_silver.py:176-177) have no builtin-catalog analog and are
  * accepted divergence (SURVEY §7).
  */
object Sinks {

  /** Parity mode: full-table overwrite, partitioned layout
    * (job_silver.py:174-178). */
  def overwriteTable(df: DataFrame, table: String, partitionCols: Seq[String] = Nil): Unit = {
    val w = df.write.mode(SaveMode.Overwrite)
    (if (partitionCols.nonEmpty) w.partitionBy(partitionCols: _*) else w).saveAsTable(table)
  }

  /** Scale mode: replace only the partitions present in `df`
    * (`INSERT OVERWRITE ... PARTITION` semantics via dynamic
    * partitionOverwriteMode). */
  def overwritePartitions(df: DataFrame, table: String, partitionCols: Seq[String]): Unit = {
    val spark = df.sparkSession
    val prev = spark.conf.getOption("spark.sql.sources.partitionOverwriteMode")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try df.write.mode(SaveMode.Overwrite).insertInto(table)
    finally prev match {
      case Some(v) => spark.conf.set("spark.sql.sources.partitionOverwriteMode", v)
      case None    => spark.conf.unset("spark.sql.sources.partitionOverwriteMode")
    }
  }

  /** Bucketed managed table: rows hash-partitioned into `numBuckets`
    * files per partition by `bucketCols`, sorted within buckets. Two
    * tables bucketed the same way join on the bucket columns with NO
    * shuffle on either side — the pre-computed co-location that turns a
    * recurring 100 TB fact⋈fact join from two exchanges into zero
    * (verified by SinksSpec's no-Exchange plan assertion). */
  def bucketedTable(
      df: DataFrame,
      table: String,
      bucketCols: Seq[String],
      numBuckets: Int,
      sortCols: Seq[String] = Nil
  ): Unit = {
    clearManagedTable(df.sparkSession, table)
    val w = df.write.mode(SaveMode.Overwrite)
      .bucketBy(numBuckets, bucketCols.head, bucketCols.tail: _*)
    (if (sortCols.nonEmpty) w.sortBy(sortCols.head, sortCols.tail: _*) else w)
      .saveAsTable(table)
  }

  /** Make a managed-table (re)build idempotent across JVMs: drop the
    * catalog entry if this session has one, AND delete a leftover
    * warehouse directory from a previous process — the in-memory
    * catalog dies with its JVM but `spark-warehouse/` does not, and
    * CTAS refuses an existing location (LOCATION_ALREADY_EXISTS).
    *
    * Locations are resolved through the CATALOG, never by
    * string-concatenating `<warehouse>/<name>`: a qualified `db.tbl`
    * lives at `<warehouse>/db.db/tbl`, the current database may not be
    * `default`, and the naive concat could recursively delete an
    * unrelated directory literally named `db.tbl` — or miss the real
    * leftover and still fail the CTAS. Two paths are cleared: the live
    * entry's reported location (managed tables only — an EXTERNAL
    * table's data is the user's), and the canonical default location a
    * new managed table of this name would be assigned. */
  private[graft] def clearManagedTable(spark: org.apache.spark.sql.SparkSession, table: String): Unit = {
    val catalog = spark.sessionState.catalog
    val ident = spark.sessionState.sqlParser.parseTableIdentifier(table)
    val managedLoc =
      if (catalog.tableExists(ident)) {
        val meta = catalog.getTableMetadata(ident)
        if (meta.tableType == org.apache.spark.sql.catalyst.catalog.CatalogTableType.MANAGED)
          Some(new org.apache.hadoop.fs.Path(meta.location))
        else None
      } else None
    spark.sql(s"DROP TABLE IF EXISTS ${ident.quotedString}")
    val defaultLoc = new org.apache.hadoop.fs.Path(catalog.defaultTablePath(ident))
    (managedLoc.toSeq :+ defaultLoc).distinct.foreach { loc =>
      val fs = loc.getFileSystem(spark.sparkContext.hadoopConfiguration)
      if (fs.exists(loc)) fs.delete(loc, true)
    }
  }

  /** NDJSON land (bronze): one JSON object per line so downstream reads
    * split line-wise (reference builds this by hand,
    * datalake_bronze_fetch_raw_data_api_dag.py:300-303). */
  def ndjson(df: DataFrame, path: String): Unit =
    df.write.mode(SaveMode.Overwrite).json(path)

  /** Layout-optimized parquet: range-partition on `sortCols` then sort
    * within partitions before writing. Every output file then covers a
    * DISJOINT range of the sort key, so parquet min/max statistics let
    * a filtered scan skip whole files/row-groups — the data-layout half
    * of predicate pushdown, and at 100 TB the difference between
    * scanning everything and scanning the one file a point/range query
    * needs. `numFiles` sizes the range partitioning (pick so files land
    * near the rowgroup/HDFS-block sweet spot, ~128-1024 MB). */
  def sortedParquet(df: DataFrame, path: String, sortCols: Seq[String], numFiles: Int): Unit = {
    import org.apache.spark.sql.functions.col
    df.repartitionByRange(numFiles, sortCols.map(col): _*)
      .sortWithinPartitions(sortCols.map(col): _*)
      .write.mode(SaveMode.Overwrite).parquet(path)
  }

  def parquet(df: DataFrame, path: String): Unit =
    df.write.mode(SaveMode.Overwrite).parquet(path)

  /** Z-order (Morton-curve) clustered parquet: the multi-dimensional
    * complement to [[sortedParquet]]. A single-key sort gives tight
    * per-file min/max on ONE column; filtering on any other column
    * still touches every file. Interleaving the bit codes of `zCols`
    * and range-partitioning + sorting on the interleaved value keeps
    * every file's footer stats tight on ALL z columns at once, so a
    * box/point predicate on any subset of them skips most files — at
    * 100 TB this is the difference between scanning the store and
    * scanning a handful of files, for query shapes no single sort key
    * covers.
    *
    * Column codes are linear min/max scalings into `bits` bits (one
    * cheap scan-local agg for the bounds; 2·|zCols| driver scalars —
    * not a collect of data). Linear scaling is the deterministic v1;
    * heavily skewed columns would want rank/percentile codes (the
    * sampling trick Delta's OPTIMIZE ZORDER uses) layered on the same
    * interleave. Everything else is codegen'd column arithmetic — no
    * UDF, no shuffle beyond the one range repartition any clustered
    * write pays. Nulls code to null and cluster together at the range
    * boundary. */
  def zorderedParquet(
      df: DataFrame,
      path: String,
      zCols: Seq[String],
      numFiles: Int,
      bits: Int = 16
  ): Unit =
    zorderCluster(df, zCols, numFiles, bits)
      .write.mode(SaveMode.Overwrite).parquet(path)

  /** The clustering transform behind [[zorderedParquet]], exposed so
    * any sink can write a z-ordered layout — in particular
    * [[SnapshotTables]] commits (z-order + stats manifest = box
    * predicates prune snapshot files on every cluster column). Returns
    * `df` range-partitioned into `numFiles` and sorted by the
    * interleaved z-value (the helper column is dropped; Project
    * preserves the ordering). */
  def zorderCluster(
      df: DataFrame,
      zCols: Seq[String],
      numFiles: Int,
      bits: Int = 16,
      bounds: Option[Seq[(Double, Double)]] = None
  ): DataFrame = {
    import org.apache.spark.sql.functions._
    require(zCols.nonEmpty, "zorderCluster needs at least one column")
    require(zCols.size * bits <= 63, s"${zCols.size} cols x $bits bits exceeds a long")
    require(bounds.forall(_.size == zCols.size), "one (min, max) pair per z column")
    // Column domains: caller-supplied when known (saves the extra
    // bounds scan — at 100 TB the pre-pass costs a full pass over the
    // z columns, and domains like dates or scores are usually known a
    // priori), otherwise one scan-local min/max agg. Values outside
    // supplied bounds clamp into the edge code bins.
    val mm: Seq[(Option[Double], Option[Double])] = bounds match {
      case Some(bs) => bs.map { case (mn, mx) => (Some(mn), Some(mx)) }
      case None =>
        val aggs = zCols.flatMap(c =>
          Seq(min(col(c).cast("double")).as(s"__mn_$c"), max(col(c).cast("double")).as(s"__mx_$c")))
        val r = df.agg(aggs.head, aggs.tail: _*).head
        zCols.indices.map(i =>
          (if (r.isNullAt(2 * i)) None else Some(r.getDouble(2 * i)),
            if (r.isNullAt(2 * i + 1)) None else Some(r.getDouble(2 * i + 1))))
    }
    val codes = linearCodes(zCols, mm, bits)
    clusterByZ(df, codes, bits, numFiles)
  }

  private def linearCodes(zCols: Seq[String], mm: Seq[(Option[Double], Option[Double])],
      bits: Int): Seq[org.apache.spark.sql.Column] = {
    import org.apache.spark.sql.functions._
    zCols.zipWithIndex.map { case (c, i) =>
      mm(i) match {
        case (Some(mn), Some(mx)) =>
          val scale = if (mx > mn) ((1L << bits) - 1).toDouble / (mx - mn) else 0.0
          val code = floor((col(c).cast("double") - lit(mn)) * lit(scale)).cast("long")
          least(greatest(code, lit(0L)), lit((1L << bits) - 1)) // clamp out-of-bounds values
        case _ => lit(0L) // all-null column: no spread to encode
      }
    }
  }

  /** Per-PARTITION z-order clustering — [[zorderCluster]] for
    * Hive-partitioned layouts. Global range partitioning on the
    * z-value would scatter each directory's rows across write tasks
    * (and the writer's own partition-column re-sort then destroys the
    * z runs); instead rows co-locate by `partitionCols` so each
    * directory compacts into this task's files, sorted by
    * (partitionCols, z) — every file's footer stats stay tight on ALL
    * z columns WITHIN its partition, and box predicates combine
    * partition-directory pruning with z-file skipping. Codes are the
    * same linear min/max scalings as [[zorderCluster]] (global bounds
    * — one agg pass, or caller-supplied). */
  def zorderClusterWithin(
      df: DataFrame,
      partitionCols: Seq[String],
      zCols: Seq[String],
      numFiles: Int,
      bits: Int = 16,
      bounds: Option[Seq[(Double, Double)]] = None
  ): DataFrame = {
    import org.apache.spark.sql.functions._
    require(partitionCols.nonEmpty, "zorderClusterWithin needs partition columns (else use zorderCluster)")
    require(zCols.nonEmpty, "zorderClusterWithin needs at least one z column")
    require(zCols.size * bits <= 63, s"${zCols.size} cols x $bits bits exceeds a long")
    require(bounds.forall(_.size == zCols.size), "one (min, max) pair per z column")
    val mm: Seq[(Option[Double], Option[Double])] = bounds match {
      case Some(bs) => bs.map { case (mn, mx) => (Some(mn), Some(mx)) }
      case None =>
        val aggs = zCols.flatMap(c =>
          Seq(min(col(c).cast("double")).as(s"__mn_$c"), max(col(c).cast("double")).as(s"__mx_$c")))
        val r = df.agg(aggs.head, aggs.tail: _*).head
        zCols.indices.map(i =>
          (if (r.isNullAt(2 * i)) None else Some(r.getDouble(2 * i)),
            if (r.isNullAt(2 * i + 1)) None else Some(r.getDouble(2 * i + 1))))
    }
    val codes = linearCodes(zCols, mm, bits)
    // RANGE partition on (partitionCols, z): each task holds one
    // partition's contiguous z range (boundary tasks at most straddle
    // two partitions), so a partition directory splits into SEVERAL
    // files with disjoint z runs — a hash repartition on the partition
    // columns alone would collapse each directory into one file and
    // there would be nothing left to skip
    df.withColumn("__z", zValue(codes, bits))
      .repartitionByRange(numFiles, (partitionCols.map(col) :+ col("__z")): _*)
      .sortWithinPartitions((partitionCols.map(col) :+ col("__z")): _*)
      .drop("__z")
  }

  /** Equi-depth (rank-coded) z-order clustering — the skew-proof
    * variant of [[zorderCluster]]. A heavy-tailed column defeats
    * linear min/max codes: most rows collapse into one bin, so files
    * in the dense region carry near-full-domain stats and box
    * predicates stop pruning there. Rank codes are quantile bins —
    * boundaries come from one `percentile_approx` sketch pass (what
    * Delta's OPTIMIZE ZORDER samples for), and the per-row code is a
    * fold over the boundary literal array (codegen'd comparisons;
    * `bits` ≤ 10 keeps that ≤ 1023 per column). Nulls code to bin 0.
    * Same interleave and write shape as the linear variant. */
  def zorderClusterRank(
      df: DataFrame,
      zCols: Seq[String],
      numFiles: Int,
      bits: Int = 8
  ): DataFrame = {
    import org.apache.spark.sql.functions._
    require(zCols.nonEmpty, "zorderClusterRank needs at least one column")
    require(bits >= 1 && bits <= 10, "rank coding supports 1-10 bits per column")
    require(zCols.size * bits <= 63, s"${zCols.size} cols x $bits bits exceeds a long")
    val n = 1 << bits
    val qs = (1 until n).map(i => i.toDouble / n).toArray
    val aggs = zCols.map(c =>
      percentile_approx(col(c).cast("double"), typedlit(qs), lit(10000)).as(s"__q_$c"))
    val row = df.agg(aggs.head, aggs.tail: _*).head
    val codes = zCols.zipWithIndex.map { case (c, i) =>
      if (row.isNullAt(i)) lit(0L)
      else {
        val bnds = row.getSeq[Double](i)
        // code = number of boundaries <= x, in [0, n-1]
        aggregate(typedlit(bnds), lit(0L),
          (acc, b) => acc + when(col(c).cast("double") >= b, 1L).otherwise(0L))
      }
    }
    clusterByZ(df, codes, bits, numFiles)
  }

  /** Interleave per-column bit codes (bit b of column i lands at
    * position b·n + (n−1−i): round-robin, first column in the higher
    * lanes), then range-partition + sort on the z-value. */
  private def clusterByZ(df: DataFrame, codes: Seq[org.apache.spark.sql.Column], bits: Int, numFiles: Int): DataFrame = {
    import org.apache.spark.sql.functions.col
    df.withColumn("__z", zValue(codes, bits))
      .repartitionByRange(numFiles, col("__z"))
      .sortWithinPartitions(col("__z"))
      .drop("__z")
  }

  /** The interleaved Morton value of per-column bit codes (bit b of
    * column i lands at position b·n + (n−1−i): round-robin, first
    * column in the higher lanes). */
  private def zValue(codes: Seq[org.apache.spark.sql.Column], bits: Int): org.apache.spark.sql.Column = {
    import org.apache.spark.sql.functions._
    val n = codes.size
    (0 until bits)
      .flatMap { b =>
        codes.zipWithIndex.map { case (code, i) =>
          shiftleft(shiftright(code, b).bitwiseAND(lit(1L)), b * n + (n - 1 - i))
        }
      }
      .reduce(_.bitwiseOR(_))
  }
}
