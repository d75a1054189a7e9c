package graft.plans

import graft.SparkSpec
import graft.catalog.SnapshotCatalog
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
import org.apache.spark.sql.execution.datasources.v2.{DataSourceV2ScanRelation, FileScan}

/** X112 — manifest file skipping for SQL scans: pushed-down predicates
  * consult the per-file stats/bloom manifests at planning time and the
  * scan opens only files that may match. File-level evidence comes
  * from `Dataset.inputFiles` (the planned scan's file set, before any
  * row filtering); every skipping assert is paired with a correctness
  * assert against the same query with pruning disabled. */
class ScanPruneSpec extends SparkSpec {

  private var n = 0
  private def newCatalog(): String = synchronized {
    n += 1
    val cat = s"pspec$n"
    val root = java.nio.file.Files.createTempDirectory(s"graft-prune-$cat").toString
    spark.conf.set(s"spark.sql.catalog.$cat", classOf[SnapshotCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$cat.root", root)
    cat
  }

  /** Files the PLANNED scan would open — `Dataset.inputFiles`'s V2
    * case only matches Spark's own FileTable, and the physical plan
    * hides its scans behind AdaptiveSparkPlanExec, so count the
    * OPTIMIZED logical plan's leaves (stock DSv2 scan relations and
    * the substituted V1 file relations alike). */
  private def scannedFiles(df: DataFrame): Int =
    df.queryExecution.optimizedPlan.collect {
      case s: DataSourceV2ScanRelation => s.scan match {
        case f: FileScan => f.fileIndex.inputFiles.length
        case _ => 0
      }
      case l: LogicalRelation => l.relation match {
        case h: HadoopFsRelation => h.location.inputFiles.length
        case _ => 0
      }
    }.sum

  /** Run `sql` twice — pruning off (reference) and on — and return
    * (reference rows, pruned rows, pruned scan file count). */
  private def prunedVsRef(sql: String): (Seq[Row], Seq[Row], Int) = {
    spark.conf.set("graft.scan.manifestPruning", "false")
    val ref = try spark.sql(sql).collect().toSeq
              finally spark.conf.set("graft.scan.manifestPruning", "true")
    val df = spark.sql(sql)
    (ref, df.collect().toSeq, scannedFiles(df))
  }

  test("range predicate on a stats column skips non-intersecting files") {
    val c = newCatalog()
    spark.sql(s"CREATE NAMESPACE $c.dw")
    spark.sql(s"CREATE TABLE $c.dw.t (k INT, v STRING) TBLPROPERTIES(" +
      "'graft.write.sort_by'='k', 'graft.stats.columns'='k')")
    spark.sql(s"INSERT INTO $c.dw.t SELECT CAST(id AS INT), CAST(id AS STRING) FROM range(0, 100)")
    spark.sql(s"INSERT INTO $c.dw.t SELECT CAST(id AS INT), CAST(id AS STRING) FROM range(1000, 1100)")
    val all = scannedFiles(spark.table(s"$c.dw.t"))
    assert(all >= 2, s"fixture should land >= 2 files, got $all")

    val (ref, got, files) = prunedVsRef(
      s"SELECT k, v FROM $c.dw.t WHERE k BETWEEN 10 AND 20 ORDER BY k")
    assert(files < all, s"expected file skipping: read $files of $all files")
    assert(got == ref && got.length == 11)

    // a predicate spanning every file proves nothing -> plan untouched
    assert(scannedFiles(spark.sql(s"SELECT * FROM $c.dw.t WHERE k >= 0")) == all)
    // and an unfiltered scan is never touched
    assert(scannedFiles(spark.table(s"$c.dw.t")) == all)
  }

  test("point lookup and IN on a sketch column skip via Bloom membership") {
    val c = newCatalog()
    spark.sql(s"CREATE NAMESPACE $c.dw")
    spark.sql(s"CREATE TABLE $c.dw.t (id BIGINT, v STRING) TBLPROPERTIES(" +
      "'graft.sketch.columns'='id')")
    // even vs odd ids: the two files' [min,max] overlap completely, so
    // only the membership sketch can tell them apart
    spark.sql(s"INSERT INTO $c.dw.t SELECT id * 2, CAST(id AS STRING) FROM range(0, 200)")
    spark.sql(s"INSERT INTO $c.dw.t SELECT id * 2 + 1, CAST(id AS STRING) FROM range(0, 200)")
    val all = scannedFiles(spark.table(s"$c.dw.t"))
    assert(all >= 2)

    val (ref, got, files) = prunedVsRef(s"SELECT id, v FROM $c.dw.t WHERE id = 42")
    assert(files < all, s"bloom should skip the odd-ids file: read $files of $all")
    assert(got == ref && got.length == 1)

    val (refIn, gotIn, filesIn) = prunedVsRef(
      s"SELECT id, v FROM $c.dw.t WHERE id IN (42, 44) ORDER BY id")
    assert(filesIn < all)
    assert(gotIn == refIn && gotIn.length == 2)
  }

  test("date-typed stats prune in the manifest's physical unit (days)") {
    val c = newCatalog()
    spark.sql(s"CREATE NAMESPACE $c.dw")
    spark.sql(s"CREATE TABLE $c.dw.t (d DATE, v INT) TBLPROPERTIES(" +
      "'graft.stats.columns'='d')")
    spark.sql(s"INSERT INTO $c.dw.t SELECT DATE_ADD(DATE'2026-01-01', CAST(id AS INT)), " +
      s"CAST(id AS INT) FROM range(0, 28)")
    spark.sql(s"INSERT INTO $c.dw.t SELECT DATE_ADD(DATE'2026-03-01', CAST(id AS INT)), " +
      s"CAST(id AS INT) FROM range(0, 28)")
    val all = scannedFiles(spark.table(s"$c.dw.t"))
    assert(all >= 2)

    val (ref, got, files) = prunedVsRef(
      s"SELECT d, v FROM $c.dw.t WHERE d >= DATE'2026-03-01' ORDER BY d")
    assert(files < all, s"read $files of $all files")
    assert(got == ref && got.length == 28)

    // equality on a date is a probe with a range check behind it
    val (refEq, gotEq, filesEq) = prunedVsRef(
      s"SELECT v FROM $c.dw.t WHERE d = DATE'2026-01-05'")
    assert(filesEq < all)
    assert(gotEq == refEq && gotEq.length == 1)
  }

  test("manifest-less segments fall back to a full read, never to a wrong skip") {
    val c = newCatalog()
    spark.sql(s"CREATE NAMESPACE $c.dw")
    // no stats at CREATE: first segment commits with no manifest
    spark.sql(s"CREATE TABLE $c.dw.t (k INT, v STRING)")
    spark.sql(s"INSERT INTO $c.dw.t SELECT CAST(id AS INT), CAST(id AS STRING) FROM range(0, 100)")
    val seg1Files = scannedFiles(spark.table(s"$c.dw.t"))
    spark.sql(s"ALTER TABLE $c.dw.t SET TBLPROPERTIES('graft.stats.columns'='k')")
    spark.sql(s"INSERT INTO $c.dw.t SELECT CAST(id AS INT), CAST(id AS STRING) FROM range(1000, 1100)")
    val all = scannedFiles(spark.table(s"$c.dw.t"))
    assert(all > seg1Files)

    // predicate inside the FIRST (manifest-less) segment's range: that
    // segment is kept whole, the second segment's files prune away
    val (ref, got, files) = prunedVsRef(
      s"SELECT k FROM $c.dw.t WHERE k BETWEEN 10 AND 20 ORDER BY k")
    assert(files < all, s"read $files of $all files")
    assert(files >= seg1Files, "a manifest-less segment must be kept whole")
    assert(got == ref && got.length == 11)

    // predicate inside the SECOND segment's range: segment 2 may prune
    // its own non-intersecting files, but every manifest-less segment-1
    // file stays in the scan (absence of stats can only keep)
    val (ref2, got2, files2) = prunedVsRef(
      s"SELECT k FROM $c.dw.t WHERE k BETWEEN 1010 AND 1020 ORDER BY k")
    assert(files2 >= seg1Files + 1 && files2 <= all)
    assert(got2 == ref2 && got2.length == 11)
  }

  test("time-travel scans prune against the pinned version's own chain") {
    val c = newCatalog()
    spark.sql(s"CREATE NAMESPACE $c.dw")
    spark.sql(s"CREATE TABLE $c.dw.t (k INT) TBLPROPERTIES('graft.stats.columns'='k')")
    spark.sql(s"INSERT INTO $c.dw.t SELECT CAST(id AS INT) FROM range(0, 50)")
    spark.sql(s"INSERT INTO $c.dw.t SELECT CAST(id AS INT) FROM range(1000, 1050)")
    spark.sql(s"INSERT INTO $c.dw.t SELECT CAST(id AS INT) FROM range(2000, 2050)")
    val v2All = scannedFiles(spark.sql(s"SELECT * FROM $c.dw.t VERSION AS OF 2"))
    assert(v2All >= 2)

    val (ref, got, files) = prunedVsRef(
      s"SELECT k FROM $c.dw.t VERSION AS OF 2 WHERE k < 10 ORDER BY k")
    assert(files < v2All, s"read $files of $v2All files")
    assert(got == ref && got.length == 10)
  }

  test("stats/sketch TBLPROPERTIES: SHOW, ALTER, UNSET, invalid column refused") {
    val c = newCatalog()
    spark.sql(s"CREATE NAMESPACE $c.dw")
    spark.sql(s"CREATE TABLE $c.dw.t (k INT, s STRING) TBLPROPERTIES(" +
      "'graft.stats.columns'='k', 'graft.sketch.columns'='s')")
    spark.sql(s"INSERT INTO $c.dw.t VALUES (1, 'a')") // ALTER needs a committed version
    def props(): Map[String, String] =
      spark.sql(s"SHOW TBLPROPERTIES $c.dw.t").collect()
        .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(props().get("graft.stats.columns").contains("k"))
    assert(props().get("graft.sketch.columns").contains("s"))

    spark.sql(s"ALTER TABLE $c.dw.t SET TBLPROPERTIES('graft.stats.columns'='k,s')")
    assert(props().get("graft.stats.columns").contains("k,s"))
    spark.sql(s"ALTER TABLE $c.dw.t UNSET TBLPROPERTIES('graft.sketch.columns')")
    assert(!props().contains("graft.sketch.columns"))

    // invalid column fails the statement with zero side effects
    intercept[Exception] {
      spark.sql(s"CREATE TABLE $c.dw.bad (k INT) TBLPROPERTIES('graft.stats.columns'='nope')")
    }
    assert(!spark.catalog.tableExists(s"$c.dw.bad"))
    intercept[Exception] {
      spark.sql(s"ALTER TABLE $c.dw.t SET TBLPROPERTIES('graft.stats.columns'='nope')")
    }
    assert(props().get("graft.stats.columns").contains("k,s")) // unchanged
  }

  test("kill switch: graft.scan.manifestPruning=false leaves every scan stock") {
    val c = newCatalog()
    spark.sql(s"CREATE NAMESPACE $c.dw")
    spark.sql(s"CREATE TABLE $c.dw.t (k INT) TBLPROPERTIES('graft.stats.columns'='k')")
    spark.sql(s"INSERT INTO $c.dw.t SELECT CAST(id AS INT) FROM range(0, 50)")
    spark.sql(s"INSERT INTO $c.dw.t SELECT CAST(id AS INT) FROM range(1000, 1050)")
    val all = scannedFiles(spark.table(s"$c.dw.t"))
    spark.conf.set("graft.scan.manifestPruning", "false")
    try assert(scannedFiles(spark.sql(s"SELECT k FROM $c.dw.t WHERE k < 10")) == all)
    finally spark.conf.set("graft.scan.manifestPruning", "true")
    assert(scannedFiles(spark.sql(s"SELECT k FROM $c.dw.t WHERE k < 10")) < all)
  }

  test("log-governed catalogs prune the PUBLISHED head like any pinned scan") {
    val c = newCatalog()
    val log = java.nio.file.Files.createTempDirectory("graft-prune-log").toString
    spark.conf.set(s"spark.sql.catalog.$c.commitlog", log)
    spark.sql(s"CREATE NAMESPACE $c.dw")
    spark.sql(s"CREATE TABLE $c.dw.t (k INT) TBLPROPERTIES('graft.stats.columns'='k')")
    spark.sql(s"INSERT INTO $c.dw.t SELECT CAST(id AS INT) FROM range(0, 50)")
    spark.sql(s"INSERT INTO $c.dw.t SELECT CAST(id AS INT) FROM range(1000, 1050)")
    val all = scannedFiles(spark.table(s"$c.dw.t"))
    assert(all >= 2)
    val (ref, got, files) = prunedVsRef(s"SELECT k FROM $c.dw.t WHERE k < 10 ORDER BY k")
    assert(files < all, s"read $files of $all files")
    assert(got == ref && got.length == 10)
  }

  test("string stats compare in UTF-8 byte order, not UTF-16 (non-BMP regression)") {
    val c = newCatalog()
    spark.sql(s"CREATE NAMESPACE $c.dw")
    spark.sql(s"CREATE TABLE $c.dw.t (v STRING, k INT) TBLPROPERTIES(" +
      "'graft.stats.columns'='v')")
    // one file holding both U+FFFF and an emoji: the parquet/UTF8String
    // byte-order bounds are [U+FFFF, emoji], but Java String (UTF-16
    // code-unit) ordering sorts U+FFFF ABOVE the surrogate-pair emoji —
    // a Java-ordered max check would wrongly prune this file for a
    // U+FFFF probe and silently lose the row
    spark.sql(s"INSERT INTO $c.dw.t VALUES ('￿', 1), ('😀', 2)")
    // a disjoint ascii file so the prune actually engages
    spark.sql(s"INSERT INTO $c.dw.t VALUES ('aaa', 3), ('bbb', 4)")
    val all = scannedFiles(spark.table(s"$c.dw.t"))
    assert(all >= 2)

    val (ref, got, files) = prunedVsRef(s"SELECT k FROM $c.dw.t WHERE v = '￿'")
    assert(got == ref && got.length == 1, s"U+FFFF probe lost rows: got $got vs ref $ref")
    assert(files < all, s"ascii file should still prune away: read $files of $all")

    // range shape hits the bounds path rather than the probe path
    val (refR, gotR, _) = prunedVsRef(
      s"SELECT k FROM $c.dw.t WHERE v >= '￿' AND v <= '￿' ORDER BY k")
    assert(gotR == refR && gotR.length == 1)
  }

  test("over-budget manifests keep pruning via the distributed path (driver fast path bypassed)") {
    val c = newCatalog()
    spark.sql(s"CREATE NAMESPACE $c.dw")
    spark.sql(s"CREATE TABLE $c.dw.t (k INT) TBLPROPERTIES('graft.stats.columns'='k')")
    spark.sql(s"INSERT INTO $c.dw.t SELECT CAST(id AS INT) FROM range(0, 50)")
    spark.sql(s"INSERT INTO $c.dw.t SELECT CAST(id AS INT) FROM range(1000, 1050)")
    val all = scannedFiles(spark.table(s"$c.dw.t"))
    assert(all >= 2)
    spark.conf.set("graft.scan.manifestDriverRows", "0") // every manifest is "over budget"
    try {
      val (ref, got, files) = prunedVsRef(s"SELECT k FROM $c.dw.t WHERE k < 10 ORDER BY k")
      assert(files < all, s"distributed evaluation must still skip: read $files of $all")
      assert(got == ref && got.length == 10)
    } finally spark.conf.unset("graft.scan.manifestDriverRows")
  }

  test("a corrupt manifest degrades to a full scan, never a failed query") {
    val c = newCatalog()
    spark.sql(s"CREATE NAMESPACE $c.dw")
    spark.sql(s"CREATE TABLE $c.dw.t (k INT) TBLPROPERTIES('graft.stats.columns'='k')")
    spark.sql(s"INSERT INTO $c.dw.t SELECT CAST(id AS INT) FROM range(0, 50)")
    spark.sql(s"INSERT INTO $c.dw.t SELECT CAST(id AS INT) FROM range(1000, 1050)")
    val all = scannedFiles(spark.table(s"$c.dw.t"))
    // trash every manifest on disk and force the distributed path (the
    // driver fast path caches reads; a 0 budget bypasses it), so the
    // consultation itself throws mid-rule — the guard must leave the
    // plan untouched instead of failing the query
    val root = spark.conf.get(s"spark.sql.catalog.$c.root")
    import scala.jdk.CollectionConverters._
    java.nio.file.Files.walk(java.nio.file.Paths.get(root)).iterator().asScala
      .filter(_.toString.contains("-manifest.parquet"))
      .filter(java.nio.file.Files.isRegularFile(_))
      .foreach(p => java.nio.file.Files.write(p, "not parquet".getBytes))
    spark.conf.set("graft.scan.manifestDriverRows", "0")
    try {
      val got = spark.sql(s"SELECT k FROM $c.dw.t WHERE k < 10 ORDER BY k").collect()
      assert(got.map(_.getInt(0)).toSeq == (0 until 10))
      assert(scannedFiles(spark.sql(s"SELECT k FROM $c.dw.t WHERE k < 10")) == all)
    } finally spark.conf.unset("graft.scan.manifestDriverRows")
  }
}
