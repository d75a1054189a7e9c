package graft.io

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** [[IcebergLakeCommits]] — cross-table atomic publish over FOREIGN
  * Iceberg tables (the Nessie capability on tables graft didn't
  * write). Pins:
  *
  *  - governed reads resolve the PINNED snapshot: a table-line commit
  *    that was never published is invisible through the log AND
  *    through a `commitlog` catalog mount (the torn-pair guard)
  *  - publishBranches both-or-neither: before the publish a reader
  *    sees the OLD pair; after, the NEW pair; never a mix
  *  - a diverged-main fast-forward refusal aborts with NO log commit
  *  - readAt time-travels the whole lake; un-governed tables fall
  *    back to their own heads
  *  - explicit VERSION AS OF beats the log pin on a governed mount */
class IcebergLakeCommitsSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(tag: String): String =
    java.nio.file.Files.createTempDirectory(s"graft-icelake-$tag").toString

  /** Two exported tables (silver rows + gold count) under one
    * warehouse; returns (wh, liDir, aggDir). */
  private def warehouse(tag: String, n: Int): (String, String, String) = {
    val wh = tmp(s"$tag-wh")
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(wh, "dw"))
    val st = new SnapshotTables(spark, tmp(s"$tag-snap"))
    st.overwriteTable((1 to n).map(i => (i.toLong, s"v$i")).toDF("id", "v"), "li")
    IcebergExport.export(st, "li", s"$wh/dw/li")
    st.overwriteTable(Seq(n.toLong).toDF("n"), "li_agg")
    IcebergExport.export(st, "li_agg", s"$wh/dw/li_agg")
    (wh, s"$wh/dw/li", s"$wh/dw/li_agg")
  }

  test("unpublished table-line commits are invisible through the log and the governed mount") {
    val (wh, liDir, aggDir) = warehouse("poison", 10)
    val logDir = tmp("poison-log")
    val lake = new IcebergLakeCommits(spark, logDir)
    lake.publish(Seq(liDir, aggDir))
    // poison: lands on the table line, never published
    IcebergAppend.append(spark, liDir, Seq((99L, "poison")).toDF("id", "v"))
    assert(lake.read(liDir).count() == 10)            // log-resolved: pinned
    assert(IcebergImport.read(spark, liDir).count() == 11) // direct: head
    val cat = "icelakep"
    spark.conf.set(s"spark.sql.catalog.$cat",
      classOf[graft.catalog.IcebergWarehouseCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$cat.warehouse", wh)
    spark.conf.set(s"spark.sql.catalog.$cat.commitlog", logDir)
    assert(spark.sql(s"SELECT COUNT(*) FROM $cat.dw.li").head().getLong(0) == 10L)
    // explicit time travel to the head snapshot still wins over the pin
    val head = IcebergImport.currentSnapshot(spark, liDir).get
    assert(spark.sql(s"SELECT COUNT(*) FROM $cat.dw.li VERSION AS OF $head")
      .head().getLong(0) == 11L)
    // a later publish flips visibility
    lake.publish(Seq(liDir))
    assert(spark.sql(s"SELECT COUNT(*) FROM $cat.dw.li").head().getLong(0) == 11L)
  }

  test("publishBranches: both-or-neither across two foreign tables") {
    val (_, liDir, aggDir) = warehouse("wap", 10)
    val lake = new IcebergLakeCommits(spark, tmp("wap-log"))
    lake.publish(Seq(liDir, aggDir))
    IcebergEvolve.createBranch(spark, liDir, "wap")
    IcebergEvolve.createBranch(spark, aggDir, "wap")
    IcebergAppend.append(spark, liDir, (11 to 15).map(i => (i.toLong, s"v$i")).toDF("id", "v"),
      branch = "wap")
    IcebergAppend.overwrite(spark, aggDir, Seq(15L).toDF("n"), branch = "wap")
    // staged world invisible: the OLD consistent pair
    val Seq(li0, agg0) = lake.readAll(Seq(liDir, aggDir))
    assert(li0.count() == 10 && agg0.head().getLong(0) == 10L)
    lake.publishBranches(Seq((liDir, "wap"), (aggDir, "wap")))
    // the NEW consistent pair: stored gold equals recomputed gold
    val Seq(li1, agg1) = lake.readAll(Seq(liDir, aggDir))
    assert(li1.count() == 15 && agg1.head().getLong(0) == 15L)
  }

  test("diverged-main fast-forward aborts with NO log commit") {
    val (_, liDir, aggDir) = warehouse("div", 5)
    val lake = new IcebergLakeCommits(spark, tmp("div-log"))
    lake.publish(Seq(liDir, aggDir))
    val before = lake.headCommit
    IcebergEvolve.createBranch(spark, liDir, "wap")
    IcebergAppend.append(spark, liDir, Seq((6L, "b")).toDF("id", "v"), branch = "wap")
    // main diverges AFTER the fork — fast-forward must refuse
    IcebergAppend.append(spark, liDir, Seq((7L, "m")).toDF("id", "v"))
    intercept[Exception] { lake.publishBranches(Seq((liDir, "wap"))) }
    assert(lake.headCommit == before, "a failed publish must not advance the log")
    assert(lake.read(liDir).count() == 5, "the pinned world is untouched")
  }

  test("readAt time-travels the lake; un-governed tables read their own heads") {
    val (_, liDir, aggDir) = warehouse("tt", 4)
    val lake = new IcebergLakeCommits(spark, tmp("tt-log"))
    val c1 = lake.publish(Seq(liDir))
    IcebergAppend.append(spark, liDir, Seq((5L, "e")).toDF("id", "v"))
    val c2 = lake.publish(Seq(liDir))
    assert(lake.readAt(c1, liDir).count() == 4)
    assert(lake.readAt(c2, liDir).count() == 5)
    // aggDir was never governed: resolves to its own head
    assert(lake.read(aggDir).head().getLong(0) == 4L)
  }
}
