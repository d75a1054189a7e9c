package graft.io

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** `.files` / `.snapshots` metadata-table twins for FOREIGN Iceberg
  * layouts (`graft_iceberg_files` / `graft_iceberg_snapshots`) —
  * metadata-sized audit relations, driver never opens a data file. */
class IcebergMetaTablesSpec extends SparkSpec {
  import spark.implicits._

  private def exported(): (SnapshotTables, String) = {
    val root = java.nio.file.Files.createTempDirectory("graft-meta").toString
    val t = new SnapshotTables(spark, root)
    t.overwriteTable((1 to 100).map(i => (i.toLong, s"v$i")).toDF("id", "v").coalesce(1), "tab")
    t.append((101 to 150).map(i => (i.toLong, s"v$i")).toDF("id", "v").coalesce(1), "tab")
    t.upsertMor("tab", Seq((5L, "up5"), (151L, "new")).toDF("id", "v").coalesce(1), Seq("id"))
    val dest = java.nio.file.Files.createTempDirectory("graft-meta-out").toString
    IcebergExport.export(t, "tab", dest)
    (t, dest)
  }

  test("snapshots relation: one row per exported snapshot, timestamps and manifest lists real") {
    val (_, dest) = exported()
    val snaps = spark.sql(s"SELECT * FROM graft_iceberg_snapshots('$dest') ORDER BY snapshot_id")
      .collect()
    assert(snaps.length == 3)
    assert(snaps.map(_.getLong(0)).toSeq == Seq(1L, 2L, 3L))
    // parent chain: v2's parent is v1, v3's is v2
    assert(snaps(1).getLong(1) == 1L && snaps(2).getLong(1) == 2L)
    snaps.foreach { r =>
      assert(r.getLong(3) > 0L, "timestamp_ms must be real")
      val ml = r.getString(5)
      assert(ml != null && new java.io.File(new java.net.URI(ml).getPath).exists,
        s"manifest list $ml must exist")
    }
  }

  test("files relation: contents, record counts, readable bounds, equality ids; snapshot pinning") {
    val (_, dest) = exported()
    val files = spark.sql(s"SELECT * FROM graft_iceberg_files('$dest')").collect()
    val byContent = files.groupBy(_.getInt(0))
    // data: v1 file + v2 file + the upsert file; deletes: the upsert as equality delete
    assert(byContent(0).length == 3)
    assert(byContent(2).length == 1)
    assert(byContent(0).map(_.getLong(3)).sum == 100 + 50 + 2, "record counts from manifests")
    assert(byContent(2).head.getLong(3) == 2)
    assert(byContent(2).head.getSeq[Int](6).nonEmpty, "equality ids surfaced")
    // bounds decode to readable values: the v1 segment spans ids 1..100
    val v1 = files.filter(r => r.getInt(0) == 0 && r.getLong(2) == 1L)
    assert(v1.nonEmpty)
    val lo = v1.head.getMap[String, String](4)
    val hi = v1.head.getMap[String, String](5)
    assert(lo.get("id").contains("1") && hi.get("id").contains("100"), s"got lo=$lo hi=$hi")
    assert(lo.get("v").exists(_.startsWith("v")), "string bounds readable")
    // pinned at snapshot 1: only the first data file
    val s1 = spark.sql(s"SELECT content, record_count FROM graft_iceberg_files('$dest', 1)")
      .collect()
    assert(s1.length == 1 && s1.head.getInt(0) == 0 && s1.head.getLong(1) == 100)
  }

  test("partitions relation: identity layout per-value rows, snapshot pinning, unpartitioned singleton") {
    // identity-partitioned export + foreign append INTO partitions
    val root = java.nio.file.Files.createTempDirectory("graft-meta-part").toString
    val t = new SnapshotTables(spark, root)
    val rows = (1 to 90).map(i => (i.toLong, if (i % 3 == 0) "a" else "b"))
    t.overwriteTable(rows.filter(_._1 % 2 == 0).toDF("id", "p"), "tab",
      partitionCols = Seq("p"))
    val dest = java.nio.file.Files.createTempDirectory("graft-meta-part-out").toString
    IcebergExport.export(t, "tab", dest)
    IcebergAppend.append(spark, dest, rows.filter(_._1 % 2 == 1).toDF("id", "p"))
    val got = spark.sql(s"SELECT partition, record_count FROM graft_iceberg_partitions('$dest')")
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq.sorted
    assert(got == Seq(("p=a", 30L), ("p=b", 60L)))
    // pinned at the export snapshot: only the even half's counts
    val pinned = spark.sql(
      s"SELECT partition, record_count FROM graft_iceberg_partitions('$dest', 1)")
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq.sorted
    assert(pinned == Seq(("p=a", 15L), ("p=b", 30L)))
    // unpartitioned table: one empty-partition row with the total
    val root2 = java.nio.file.Files.createTempDirectory("graft-meta-unp").toString
    val t2 = new SnapshotTables(spark, root2)
    t2.overwriteTable((1 to 7).map(i => (i.toLong, "x")).toDF("id", "v"), "tab")
    val dest2 = java.nio.file.Files.createTempDirectory("graft-meta-unp-out").toString
    IcebergExport.export(t2, "tab", dest2)
    val u = spark.sql(s"SELECT * FROM graft_iceberg_partitions('$dest2')").collect()
    assert(u.length == 1 && u.head.getString(0) == "" && u.head.getAs[Long]("record_count") == 7L)
  }
}
