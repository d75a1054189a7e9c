package graft.plans

import graft.SparkSpec
import graft.catalog.SnapshotCatalog
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.catalyst.plans.logical.LocalRelation
import org.apache.spark.sql.execution.datasources.LogicalRelation
import org.apache.spark.sql.execution.datasources.v2.DataSourceV2ScanRelation

/** X113 — metadata-only SQL aggregates: grouping-less COUNT/MIN/MAX
  * over snapshot-catalog tables answer from the stats manifests as a
  * LocalRelation (zero data files), with every honesty rule falling
  * back to the real scan. Each metadata-answered assert is paired with
  * the same query under `graft.scan.metadataAggregates = false`. */
class MetadataAggSpec extends SparkSpec {

  private var n = 0
  private def newCatalog(): String = synchronized {
    n += 1
    val cat = s"mspec$n"
    val root = java.nio.file.Files.createTempDirectory(s"graft-magg-$cat").toString
    spark.conf.set(s"spark.sql.catalog.$cat", classOf[SnapshotCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$cat.root", root)
    spark.sql(s"CREATE NAMESPACE $cat.dw")
    cat
  }

  /** True when the optimized plan reads NO table at all (the aggregate
    * collapsed to a LocalRelation). */
  private def metadataOnly(df: DataFrame): Boolean = {
    val p = df.queryExecution.optimizedPlan
    p.collectFirst { case _: DataSourceV2ScanRelation => (); case _: LogicalRelation => () }.isEmpty &&
      p.collectFirst { case _: LocalRelation => () }.isDefined
  }

  private def refRows(sql: String): Seq[Row] = {
    spark.conf.set("graft.scan.metadataAggregates", "false")
    try spark.sql(sql).collect().toSeq
    finally spark.conf.set("graft.scan.metadataAggregates", "true")
  }

  test("count(*)/count(c)/min/max answer from manifests across an append chain") {
    val c = newCatalog()
    spark.sql(s"CREATE TABLE $c.dw.t (k INT, d DATE, s STRING) TBLPROPERTIES(" +
      "'graft.stats.columns'='k,d')")
    spark.sql(s"INSERT INTO $c.dw.t SELECT CAST(id AS INT), " +
      s"DATE_ADD(DATE'2026-01-01', CAST(id AS INT)), CAST(id AS STRING) FROM range(0, 100)")
    spark.sql(s"INSERT INTO $c.dw.t SELECT CAST(id AS INT), " +
      s"DATE_ADD(DATE'2026-01-01', CAST(id AS INT)), CAST(id AS STRING) FROM range(1000, 1100)")

    val q = s"SELECT count(*) AS n, count(k) AS nk, min(k) AS mn, max(k) AS mx, " +
      s"min(d) AS mnd, max(d) AS mxd FROM $c.dw.t"
    val df = spark.sql(q)
    assert(metadataOnly(df), df.queryExecution.optimizedPlan.toString)
    assert(df.collect().toSeq == refRows(q))
    assert(df.collect().head == Row(200L, 200L, 0, 1099,
      java.sql.Date.valueOf("2026-01-01"), java.sql.Date.valueOf("2029-01-04")))
  }

  test("count(c) subtracts covered null counts; all-NULL column answers literal NULL") {
    val c = newCatalog()
    spark.sql(s"CREATE TABLE $c.dw.t (k INT, v DOUBLE) TBLPROPERTIES(" +
      "'graft.stats.columns'='k,v')")
    // v NULL on odd rows; k never null
    spark.sql(s"INSERT INTO $c.dw.t SELECT CAST(id AS INT), " +
      s"CASE WHEN id % 2 = 0 THEN CAST(id AS DOUBLE) END FROM range(0, 100)")
    val q = s"SELECT count(v) AS nv, min(v) AS mnv, max(v) AS mxv FROM $c.dw.t"
    val df = spark.sql(q)
    assert(metadataOnly(df))
    assert(df.collect().toSeq == refRows(q))
    assert(df.collect().head == Row(50L, 0.0, 98.0))

    // an ALL-null stats column: extremum is literal NULL, provably
    spark.sql(s"CREATE TABLE $c.dw.t2 (k INT, v DOUBLE) TBLPROPERTIES(" +
      "'graft.stats.columns'='k,v')")
    spark.sql(s"INSERT INTO $c.dw.t2 SELECT CAST(id AS INT), CAST(NULL AS DOUBLE) FROM range(0, 10)")
    val q2 = s"SELECT count(*) AS n, count(v) AS nv, min(v) AS mnv FROM $c.dw.t2"
    val df2 = spark.sql(q2)
    assert(metadataOnly(df2))
    assert(df2.collect().toSeq == refRows(q2))
    assert(df2.collect().head == Row(10L, 0L, null))
  }

  test("honesty fallbacks: filters, DISTINCT, strings, stats-less tables keep the real scan") {
    val c = newCatalog()
    spark.sql(s"CREATE TABLE $c.dw.t (k INT, s STRING) TBLPROPERTIES('graft.stats.columns'='k')")
    spark.sql(s"INSERT INTO $c.dw.t SELECT CAST(id AS INT), CAST(id AS STRING) FROM range(0, 100)")

    assert(!metadataOnly(spark.sql(s"SELECT count(*) FROM $c.dw.t WHERE k > 5")))
    assert(!metadataOnly(spark.sql(s"SELECT count(DISTINCT k) FROM $c.dw.t")))
    assert(!metadataOnly(spark.sql(s"SELECT min(s) FROM $c.dw.t"))) // string bounds may truncate
    assert(!metadataOnly(spark.sql(s"SELECT count(*), min(s) FROM $c.dw.t"))) // one bad apple
    assert(!metadataOnly(spark.sql(s"SELECT k, count(*) FROM $c.dw.t GROUP BY k")))

    // no stats columns at all -> no manifests -> real scan, right answer
    spark.sql(s"CREATE TABLE $c.dw.plain (k INT)")
    spark.sql(s"INSERT INTO $c.dw.plain SELECT CAST(id AS INT) FROM range(0, 7)")
    val dfp = spark.sql(s"SELECT count(*) AS n FROM $c.dw.plain")
    assert(!metadataOnly(dfp))
    assert(dfp.collect().head == Row(7L))
  }

  test("merge-on-read chains and DML keep correctness (COW count reflects the delete)") {
    val c = newCatalog()
    spark.sql(s"CREATE TABLE $c.dw.t (k INT) TBLPROPERTIES('graft.stats.columns'='k')")
    spark.sql(s"INSERT INTO $c.dw.t SELECT CAST(id AS INT) FROM range(0, 100)")
    spark.sql(s"DELETE FROM $c.dw.t WHERE k >= 90") // COW rewrite: new full version
    val q = s"SELECT count(*) AS n, max(k) AS mx FROM $c.dw.t"
    val df = spark.sql(q)
    assert(metadataOnly(df))
    assert(df.collect().head == Row(90L, 89))

    // mor chain: tombstones pending -> metadata answer impossible
    spark.sql(s"ALTER TABLE $c.dw.t SET TBLPROPERTIES('graft.write.mode'='mor')")
    spark.sql(s"DELETE FROM $c.dw.t WHERE k >= 80")
    val df2 = spark.sql(q)
    assert(!metadataOnly(df2))
    assert(df2.collect().head == Row(80L, 79))
  }

  test("time travel answers for the pinned version; empty tables answer 0/NULL") {
    val c = newCatalog()
    spark.sql(s"CREATE TABLE $c.dw.t (k INT) TBLPROPERTIES('graft.stats.columns'='k')")
    spark.sql(s"INSERT INTO $c.dw.t SELECT CAST(id AS INT) FROM range(0, 50)")
    spark.sql(s"INSERT INTO $c.dw.t SELECT CAST(id AS INT) FROM range(1000, 1050)")
    val q1 = s"SELECT count(*) AS n, max(k) AS mx FROM $c.dw.t VERSION AS OF 1"
    val df1 = spark.sql(q1)
    assert(metadataOnly(df1))
    assert(df1.collect().head == Row(50L, 49))

    spark.sql(s"CREATE TABLE $c.dw.e (k INT) TBLPROPERTIES('graft.stats.columns'='k')")
    spark.sql(s"INSERT INTO $c.dw.e SELECT CAST(id AS INT) FROM range(0, 5)")
    spark.sql(s"TRUNCATE TABLE $c.dw.e")
    val qe = s"SELECT count(*) AS n, min(k) AS mn FROM $c.dw.e"
    val dfe = spark.sql(qe)
    assert(metadataOnly(dfe))
    assert(dfe.collect().head == Row(0L, null))
  }

  test("identity-partition equality scopes metadata aggregates (X114)") {
    val c = newCatalog()
    spark.sql(s"CREATE TABLE $c.dw.t (k INT, p STRING) PARTITIONED BY (p) " +
      "TBLPROPERTIES('graft.stats.columns'='k')")
    spark.sql(s"INSERT INTO $c.dw.t SELECT CAST(id AS INT), " +
      s"CASE WHEN id % 3 = 0 THEN 'a' WHEN id % 3 = 1 THEN 'b' END FROM range(0, 90)")

    val q = s"SELECT count(*) AS n, count(k) AS nk, min(k) AS mn, max(k) AS mx " +
      s"FROM $c.dw.t WHERE p = 'a'"
    val df = spark.sql(q)
    assert(metadataOnly(df), df.queryExecution.optimizedPlan.toString)
    assert(df.collect().toSeq == refRows(q))
    assert(df.collect().head == Row(30L, 30L, 0, 87))

    // NULL-partition rows stay excluded exactly as the filter demands
    val qn = s"SELECT count(*) AS n FROM $c.dw.t WHERE p = 'b'"
    val dfn = spark.sql(qn)
    assert(metadataOnly(dfn))
    assert(dfn.collect().head == Row(30L))

    // a value absent from every partition answers zero, metadata-only
    val q0 = s"SELECT count(*) AS n, min(k) AS mn FROM $c.dw.t WHERE p = 'zzz'"
    val df0 = spark.sql(q0)
    assert(metadataOnly(df0))
    assert(df0.collect().head == Row(0L, null))

    // honesty: a non-partition conjunct, or IS NOT NULL alone, keeps the scan
    assert(!metadataOnly(spark.sql(s"SELECT count(*) FROM $c.dw.t WHERE p = 'a' AND k > 5")))
    assert(!metadataOnly(spark.sql(s"SELECT count(*) FROM $c.dw.t WHERE p IS NOT NULL")))

    // BOUNDARY: appending turns a PARTITIONED table into a chain whose
    // scan resolves at analysis time (DeltaResolveRule — multi-root
    // hive layouts can't direct-scan), so the aggregate rule never
    // sees the relation; the real scan stays and the answer is right.
    // Compaction returns the table to the metadata-served shape.
    spark.sql(s"INSERT INTO $c.dw.t SELECT CAST(id AS INT), 'a' FROM range(1000, 1030)")
    val df2 = spark.sql(q)
    assert(!metadataOnly(df2))
    assert(df2.collect().head == Row(60L, 60L, 0, 1029))
    spark.sql(s"CALL $c.system.compact_deltas('dw.t')")
    val df3 = spark.sql(q)
    assert(df3.collect().head == Row(60L, 60L, 0, 1029))
  }

  test("partition scoping refuses hidden-transform layouts") {
    val c = newCatalog()
    // mixed spec: identity p PLUS a hidden bucket transform — partition
    // tokens are only trusted under a PURE identity layout, so the
    // scoped rewrite must refuse (conservatively) and stay correct
    spark.sql(s"CREATE TABLE $c.dw.t (k INT, p STRING) PARTITIONED BY (p, bucket(4, k)) " +
      "TBLPROPERTIES('graft.stats.columns'='k')")
    spark.sql(s"INSERT INTO $c.dw.t SELECT CAST(id AS INT), 'a' FROM range(0, 20)")
    val q = s"SELECT count(*) AS n FROM $c.dw.t WHERE p = 'a'"
    val df = spark.sql(q)
    assert(!metadataOnly(df))
    assert(df.collect().head == Row(20L))
  }

  test("kill switch: graft.scan.metadataAggregates=false keeps the scan") {
    val c = newCatalog()
    spark.sql(s"CREATE TABLE $c.dw.t (k INT) TBLPROPERTIES('graft.stats.columns'='k')")
    spark.sql(s"INSERT INTO $c.dw.t SELECT CAST(id AS INT) FROM range(0, 9)")
    spark.conf.set("graft.scan.metadataAggregates", "false")
    try {
      val df = spark.sql(s"SELECT count(*) AS n FROM $c.dw.t")
      assert(!metadataOnly(df))
      assert(df.collect().head == Row(9L))
    } finally spark.conf.set("graft.scan.metadataAggregates", "true")
    assert(metadataOnly(spark.sql(s"SELECT count(*) AS n FROM $c.dw.t")))
  }

  test("over-budget manifests take the distributed path and answer identically") {
    val c = newCatalog()
    spark.sql(s"CREATE TABLE $c.dw.t (k INT) TBLPROPERTIES('graft.stats.columns'='k')")
    // multi-segment chain so the distributed union keys per-file rows
    // by (__seg, file) — relative part names are only unique within a
    // segment, and bare-file keying would collapse any cross-segment
    // name collision and undercount
    spark.sql(s"INSERT INTO $c.dw.t SELECT CAST(id AS INT) FROM range(0, 100)")
    spark.sql(s"INSERT INTO $c.dw.t SELECT CAST(id AS INT) FROM range(0, 100)")
    spark.sql(s"INSERT INTO $c.dw.t SELECT CAST(id AS INT) FROM range(500, 600)")
    val q = s"SELECT count(*) AS n, count(k) AS nk, min(k) AS mn, max(k) AS mx FROM $c.dw.t"
    spark.conf.set("graft.scan.manifestDriverRows", "0") // force distributed evaluation
    try {
      val df = spark.sql(q)
      assert(metadataOnly(df), df.queryExecution.optimizedPlan.toString)
      assert(df.collect().head == Row(300L, 300L, 0, 599))
    } finally spark.conf.unset("graft.scan.manifestDriverRows")
    assert(spark.sql(q).collect().head == Row(300L, 300L, 0, 599))
  }
}
