package graft.catalog

import graft.SparkSpec
import graft.io.{IcebergDml, IcebergEvolve, IcebergExport, IcebergImport, SnapshotTables}
import org.apache.spark.sql.functions._

/** [[IcebergWarehouseCatalog]] — 3-level-name SQL over a warehouse of
  * FOREIGN Iceberg tables: reads (deletes applied, time travel, refs),
  * INSERT INTO/OVERWRITE, DELETE/UPDATE, and the DDL refusal matrix.
  * The reference's SQL face is exactly this shape
  * (`job_gold.py:71-88` reads `silver.dw.tab_brewery`). */
class IcebergWarehouseCatalogSpec extends SparkSpec {
  import spark.implicits._

  /** A fresh warehouse with `db.tab` exported into it; returns the
    * catalog name to query through. */
  private var n = 0
  private def mounted(df: org.apache.spark.sql.DataFrame,
      mor: Option[org.apache.spark.sql.DataFrame] = None): (String, String) = {
    n += 1
    val cat = s"icewh$n"
    val wh = java.nio.file.Files.createTempDirectory(s"graft-icewh$n").toString
    val root = java.nio.file.Files.createTempDirectory(s"graft-icewh$n-snap").toString
    val t = new SnapshotTables(spark, root)
    t.overwriteTable(df, "tab")
    mor.foreach(keys => t.deleteKeysMor("tab", keys))
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(wh, "db"))
    IcebergExport.export(t, "tab", s"$wh/db/tab")
    spark.conf.set(s"spark.sql.catalog.$cat", classOf[IcebergWarehouseCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$cat.warehouse", wh)
    (cat, s"$wh/db/tab")
  }

  test("3-level-name read resolves the jar-free import plan, deletes applied") {
    val (cat, _) = mounted((1L to 8L).map(i => (i, i * 10.0)).toDF("k", "x"),
      mor = Some(Seq(2L, 4L).toDF("k")))
    val out = spark.sql(s"SELECT k, x FROM $cat.db.tab ORDER BY k")
      .as[(Long, Double)].collect().toSeq
    assert(out == (1L to 8L).filterNot(Set(2L, 4L)).map(i => (i, i * 10.0)))
    // discovery surfaces
    assert(spark.sql(s"SHOW TABLES IN $cat.db").collect().map(_.getString(1)).toSet == Set("tab"))
    assert(spark.sql(s"SHOW NAMESPACES IN $cat").collect().map(_.getString(0)).toSet == Set("db"))
  }

  test("predicates and projection push into the substituted parquet scan") {
    val (cat, _) = mounted((1L to 100L).map(i => (i, s"v$i", i * 1.0)).toDF("k", "v", "x"))
    val df = spark.sql(s"SELECT k FROM $cat.db.tab WHERE k = 42")
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") && plan.contains("42"),
      s"expected pushed filter in:\n$plan")
    assert(df.as[Long].collect().toSeq == Seq(42L))
  }

  test("time travel: VERSION AS OF snapshot id and named ref, TIMESTAMP AS OF") {
    val (cat, dir) = mounted((1L to 4L).map(i => (i, s"v$i")).toDF("k", "v"))
    val firstSnap = IcebergImport.snapshots(spark, dir).max
    IcebergEvolve.createTag(spark, dir, "before_load")
    spark.sql(s"INSERT INTO $cat.db.tab VALUES (5, 'v5'), (6, 'v6')")
    assert(spark.sql(s"SELECT COUNT(*) FROM $cat.db.tab").as[Long].head() == 6L)
    assert(spark.sql(s"SELECT COUNT(*) FROM $cat.db.tab VERSION AS OF $firstSnap")
      .as[Long].head() == 4L)
    assert(spark.sql(s"SELECT COUNT(*) FROM $cat.db.tab VERSION AS OF 'before_load'")
      .as[Long].head() == 4L)
    val nowTs = java.time.LocalDateTime.now(java.time.ZoneOffset.UTC)
      .plusMinutes(5).toString.replace('T', ' ')
    assert(spark.sql(s"SELECT COUNT(*) FROM $cat.db.tab TIMESTAMP AS OF '$nowTs'")
      .as[Long].head() == 6L)
  }

  test("INSERT OVERWRITE is one atomic replace snapshot") {
    val (cat, dir) = mounted((1L to 4L).map(i => (i, s"v$i")).toDF("k", "v"))
    val versionsBefore = IcebergImport.snapshots(spark, dir).size
    spark.sql(s"INSERT OVERWRITE $cat.db.tab VALUES (9, 'z')")
    assert(spark.sql(s"SELECT k, v FROM $cat.db.tab").as[(Long, String)].collect().toSeq ==
      Seq((9L, "z")))
    assert(IcebergImport.snapshots(spark, dir).size == versionsBefore + 1)
  }

  test("SQL DELETE and UPDATE route onto IcebergDml's spec-shaped commits") {
    val (cat, dir) = mounted(
      Seq((1L, "a", 10.0), (2L, "b", 20.0), (3L, "c", 30.0)).toDF("k", "v", "price"))
    spark.sql(s"DELETE FROM $cat.db.tab WHERE k = 2")
    spark.sql(s"UPDATE $cat.db.tab SET price = price * 2 WHERE v = 'c'")
    assert(spark.sql(s"SELECT k, v, price FROM $cat.db.tab ORDER BY k")
      .as[(Long, String, Double)].collect().toSeq ==
      Seq((1L, "a", 10.0), (3L, "c", 60.0)))
    // the commits are real spec shapes on disk: equality delete files present
    assert(IcebergImport.deleteFiles(spark, dir).nonEmpty)
    // and an external jar-free read agrees
    assert(IcebergImport.read(spark, dir).count() == 2)
  }

  test("type=rest-shape without uri= refuses at initialize — never an ungoverned mount") {
    // letting it through would leave restUri=None AND lakeUri=None: reads
    // silently resolving each table's directory head, with the catalog
    // pin the mount claims to enforce simply absent
    val cat = "icewh_norest"
    val wh = java.nio.file.Files.createTempDirectory("graft-icewh-norest").toString
    spark.conf.set(s"spark.sql.catalog.$cat", classOf[IcebergWarehouseCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$cat.warehouse", wh)
    spark.conf.set(s"spark.sql.catalog.$cat.type", "rest-shape")
    try {
      val e = intercept[Exception] { spark.sql(s"SHOW NAMESPACES IN $cat").collect() }
      def messages(t: Throwable): Seq[String] =
        if (t == null) Nil else String.valueOf(t.getMessage) +: messages(t.getCause)
      assert(messages(e).exists(_.contains("needs uri=")),
        s"expected the initialize-time refusal, got: ${messages(e).mkString(" | ")}")
    } finally Seq("", ".warehouse", ".type").foreach(s =>
      spark.conf.unset(s"spark.sql.catalog.$cat$s"))
  }

  test("DDL refuses (externally-owned warehouse); pinned relations refuse DML") {
    val (cat, _) = mounted(Seq((1L, "a")).toDF("k", "v"))
    val e1 = intercept[Exception](
      spark.sql(s"CREATE TABLE $cat.db.t2 (k BIGINT) USING parquet"))
    assert(e1.getMessage.contains("externally owned"))
    val e2 = intercept[Exception](spark.sql(s"DROP TABLE $cat.db.tab"))
    assert(e2.getMessage.contains("externally owned"))
    val e3 = intercept[Exception](spark.sql(s"ALTER TABLE $cat.db.tab ADD COLUMN z STRING"))
    assert(e3.getMessage.contains("externally owned"))
  }

  test("canonical MERGE INTO commits one MOR upsert snapshot; richer shapes refuse; cardinality raises") {
    val (cat, dir) = mounted(
      Seq((1L, "a", 10.0), (2L, "b", 20.0)).toDF("k", "v", "price"))
    Seq((2L, "b2", 25.0), (3L, "c", 30.0)).toDF("k", "v", "price")
      .createOrReplaceTempView("wh_merge_src")
    val before = IcebergImport.snapshots(spark, dir).size
    spark.sql(s"""MERGE INTO $cat.db.tab t USING wh_merge_src s ON t.k = s.k
      WHEN MATCHED THEN UPDATE SET * WHEN NOT MATCHED THEN INSERT *""")
    assert(IcebergImport.snapshots(spark, dir).size == before + 1, "ONE overwrite snapshot")
    assert(spark.sql(s"SELECT k, v, price FROM $cat.db.tab ORDER BY k")
      .as[(Long, String, Double)].collect().toSeq ==
      Seq((1L, "a", 10.0), (2L, "b2", 25.0), (3L, "c", 30.0)))
    // non-canonical (conditional UPDATE) refuses with guidance
    val e1 = intercept[Exception](spark.sql(
      s"""MERGE INTO $cat.db.tab t USING wh_merge_src s ON t.k = s.k
        WHEN MATCHED AND s.price > 100 THEN UPDATE SET *
        WHEN NOT MATCHED THEN INSERT *"""))
    assert(e1.getMessage.contains("canonical keyed upsert"))
    // cardinality: two source rows hitting ONE target row must raise
    Seq((3L, "x", 1.0), (3L, "y", 2.0)).toDF("k", "v", "price")
      .createOrReplaceTempView("wh_merge_dup")
    val e2 = intercept[Exception](spark.sql(
      s"""MERGE INTO $cat.db.tab t USING wh_merge_dup s ON t.k = s.k
        WHEN MATCHED THEN UPDATE SET * WHEN NOT MATCHED THEN INSERT *"""))
    assert(e2.getMessage.contains("multiple source rows"))
  }

  test("MERGE keeps SQL's null-rejecting ON: NULL-keyed rows insert alongside, never delete") {
    // ON t.k = s.k never matches NULL = NULL in SQL MERGE — a
    // NULL-keyed source row must INSERT next to a surviving NULL-keyed
    // target row, not silently remove it (the null-SAFE matching stays
    // on the documented Scala/CALL upsert face only). Two NULL-keyed
    // source rows are also NOT a cardinality violation: neither ever
    // hits a target row.
    val (cat, dir) = mounted(
      Seq((Option(1L), "a"), (Option.empty[Long], "t-null")).toDF("k", "v"))
    Seq((Option(1L), "a2"), (Option.empty[Long], "s-null1"), (Option.empty[Long], "s-null2"))
      .toDF("k", "v").createOrReplaceTempView("wh_merge_nulls")
    val before = IcebergImport.snapshots(spark, dir).size
    spark.sql(s"""MERGE INTO $cat.db.tab t USING wh_merge_nulls s ON t.k = s.k
      WHEN MATCHED THEN UPDATE SET * WHEN NOT MATCHED THEN INSERT *""")
    assert(IcebergImport.snapshots(spark, dir).size == before + 1, "still ONE snapshot")
    assert(spark.sql(s"SELECT v FROM $cat.db.tab").as[String].collect().sorted.toSeq ==
      Seq("a2", "s-null1", "s-null2", "t-null"))
    // contrast: the Scala face's documented null-SAFE keying replaces them
    IcebergDml.upsert(spark, dir,
      Seq((Option.empty[Long], "merged-null")).toDF("k", "v"), keys = Seq("k"))
    assert(spark.sql(s"SELECT v FROM $cat.db.tab").as[String].collect().sorted.toSeq ==
      Seq("a2", "merged-null"))
  }

  test("MERGE evaluates the source exactly ONCE (pinned before the multi-consumer commit)") {
    // the cardinality check, the delete-key tuples, and the data
    // manifest must all see the SAME rows — a source re-evaluated per
    // consumer could write delete keys inconsistent with the inserted
    // rows. Counted with an accumulator-ticking UDF over 3 rows: one
    // pinned evaluation = exactly 3 ticks.
    val (cat, _) = mounted(Seq((1L, "a")).toDF("k", "v"))
    val acc = spark.sparkContext.longAccumulator("graft-merge-src-evals")
    val tick = udf { (k: Long) => acc.add(1L); k }
    spark.range(1, 4).select(tick(col("id")).as("k"),
      concat(lit("v"), col("id")).as("v")).createOrReplaceTempView("wh_merge_tick")
    spark.sql(s"""MERGE INTO $cat.db.tab t USING wh_merge_tick s ON t.k = s.k
      WHEN MATCHED THEN UPDATE SET * WHEN NOT MATCHED THEN INSERT *""")
    assert(acc.value == 3L,
      s"source rows evaluated ${acc.value} times for 3 rows — must be pinned to one pass")
    assert(spark.sql(s"SELECT k, v FROM $cat.db.tab ORDER BY k")
      .as[(Long, String)].collect().toSeq == Seq((1L, "v1"), (2L, "v2"), (3L, "v3")))
  }

  test("the reference's gold query shape runs verbatim against a mounted foreign table") {
    // job_gold.py:71-88: filtered grouped-count over a 3-level name
    val (cat, _) = mounted(
      Seq(("US", "CA", "brew1"), ("US", "CA", "brew2"), ("US", "NY", "brew3"),
        ("BR", "SP", "brew4")).toDF("country", "state", "name"))
    val out = spark.sql(
      s"""SELECT country, state, COUNT(1) AS qt_breweries
          FROM $cat.db.tab WHERE country = 'US'
          GROUP BY 1, 2 ORDER BY 1, 2""").collect()
    assert(out.map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSeq ==
      Seq(("US", "CA", 2L), ("US", "NY", 1L)))
  }
}
