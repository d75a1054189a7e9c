package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.Row
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions.col

/** [[CatalogStreams]] — the catalog-name front door over the
  * [[Streams]] snapshot sinks. The sinks' own merge/sketch/replay
  * contracts are pinned in [[StreamsSpec]]; what THIS suite pins is
  * the resolution seam ([[graft.catalog.CatalogTables
  * .resolveSnapshotGoverned]]): a stream addressed as
  * `cat.ns.t` lands in the SAME store SQL resolves (mid-stream
  * `spark.sql` visibility, `VERSION AS OF` across micro-batch
  * commits), name-shape refusals, and the log-governed interaction
  * (every committed batch publishes through, so pinned SQL readers
  * follow the stream — the reference's streams-equivalent tables are
  * SQL-visible Iceberg tables, job_gold.py:50-58,71-88). */
class CatalogStreamsSpec extends SparkSpec {
  import spark.implicits._

  /** Register a fresh uniquely-named SnapshotCatalog; returns (catalog
    * name, root dir). */
  private var n = 0
  private def newCatalog(commitlog: Option[String] = None): (String, String) = synchronized {
    n += 1
    val cat = s"cstream$n"
    val root = java.nio.file.Files.createTempDirectory(s"graft-cstream-$cat").toString
    spark.conf.set(s"spark.sql.catalog.$cat", classOf[graft.catalog.SnapshotCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$cat.root", root)
    commitlog.foreach(p => spark.conf.set(s"spark.sql.catalog.$cat.commitlog", p))
    (cat, root)
  }

  private def ckDir(tag: String): String =
    java.nio.file.Files.createTempDirectory(s"graft-cstream-ck-$tag").toString

  test("snapshotMergeSink on a 3-level name: mid-stream SQL visibility, VERSION AS OF across batches, idempotent replayed content") {
    implicit val ctx = spark.sqlContext
    val (cat, _) = newCatalog()
    spark.sql(s"CREATE NAMESPACE $cat.dw")
    val ms = MemoryStream[(Long, String, Long)]
    val q = CatalogStreams.snapshotMergeSink(
      ms.toDF().toDF("k", "status", "seq"), s"$cat.dw.events_latest",
      keyCols = Seq("k"), checkpoint = ckDir("merge"), orderCol = Some("seq"))
    try {
      ms.addData((1L, "new", 1L), (2L, "new", 1L))
      q.processAllAvailable()
      // the stream is still running: a plain SQL reader on the 3-level
      // name sees batch 1's committed state
      assert(spark.sql(s"SELECT k, status FROM $cat.dw.events_latest ORDER BY k")
        .collect().toSeq == Seq(Row(1L, "new"), Row(2L, "new")))
      ms.addData((1L, "shipped", 2L), (3L, "new", 1L))
      q.processAllAvailable()
      assert(spark.sql(s"SELECT k, status FROM $cat.dw.events_latest ORDER BY k")
        .collect().toSeq == Seq(Row(1L, "shipped"), Row(2L, "new"), Row(3L, "new")))
      // time travel steps across micro-batch commits: version 1 IS batch 1
      assert(spark.sql(s"SELECT k, status FROM $cat.dw.events_latest VERSION AS OF 1 ORDER BY k")
        .collect().toSeq == Seq(Row(1L, "new"), Row(2L, "new")))
      assert(spark.sql(s"SELECT k, status FROM $cat.dw.events_latest VERSION AS OF 2 ORDER BY k")
        .collect().toSeq == Seq(Row(1L, "shipped"), Row(2L, "new"), Row(3L, "new")))
      // replayed CONTENT is idempotent: same rows again -> one more
      // version, identical state (exactly-once effect, as in StreamsSpec)
      ms.addData((1L, "shipped", 2L), (3L, "new", 1L))
      q.processAllAvailable()
      assert(spark.sql(s"SELECT k, status FROM $cat.dw.events_latest ORDER BY k")
        .collect().toSeq == Seq(Row(1L, "shipped"), Row(2L, "new"), Row(3L, "new")))
      // and the table joins like any other catalog table, mid-stream
      assert(spark.sql(
        s"""SELECT count(*) FROM $cat.dw.events_latest e
            JOIN $cat.dw.events_latest VERSION AS OF 1 v ON e.k = v.k""")
        .head.getLong(0) == 2L)
      // the WHOLE catalog surface composes over the streamed table,
      // mid-stream: DESCRIBE HISTORY sees one version per committed
      // batch (3: two live + one replayed-content commit) ...
      assert(spark.sql(s"SELECT version, is_current FROM $cat.dw.events_latest.history ORDER BY version")
        .collect().map(r => (r.getInt(0), r.getBoolean(1))).toSeq ==
        Seq((1, false), (2, false), (3, true)))
      // ... and the CDC table function reads the changelog BETWEEN
      // micro-batch commits: batch 2 = one update (key 1) + one insert
      assert(spark.sql(
        s"""SELECT k, _change_type FROM graft_table_changes('$cat.dw.events_latest', 1, 2, 'k')
            ORDER BY k""").collect().map(r => (r.getLong(0), r.getString(1))).toSeq ==
        Seq((1L, "update"), (3L, "insert")))
    } finally q.stop()
  }

  test("snapshotAppendSink on a 3-level name: append-only ingest is SQL-visible and auditable mid-stream") {
    implicit val ctx = spark.sqlContext
    val (cat, _) = newCatalog()
    spark.sql(s"CREATE NAMESPACE $cat.dw")
    val ms = MemoryStream[(Long, String)]
    val q = CatalogStreams.snapshotAppendSink(
      ms.toDF().toDF("id", "payload"), s"$cat.dw.facts", checkpoint = ckDir("app"))
    try {
      ms.addData((1L, "a"), (2L, "b"))
      q.processAllAvailable()
      assert(spark.sql(s"SELECT COUNT(*) FROM $cat.dw.facts").head.getLong(0) == 2L)
      ms.addData((3L, "c"))
      q.processAllAvailable()
      assert(spark.sql(s"SELECT id FROM $cat.dw.facts ORDER BY id").collect()
        .map(_.getLong(0)).toSeq == Seq(1L, 2L, 3L))
      // each micro-batch is one auditable commit: .history shows the
      // append kinds and VERSION AS OF steps across batches
      assert(spark.sql(s"SELECT kind FROM $cat.dw.facts.history ORDER BY version").collect()
        .map(_.getString(0)).toSeq == Seq("full", "append"))
      assert(spark.sql(s"SELECT COUNT(*) FROM $cat.dw.facts VERSION AS OF 1").head.getLong(0) == 2L)
    } finally q.stop()
  }

  test("name-shape refusals: 2-part names and non-graft catalogs are rejected at sink-open time") {
    implicit val ctx = spark.sqlContext
    val ms = MemoryStream[(Long, String)]
    val df = ms.toDF().toDF("k", "v")
    val twoPart = intercept[IllegalArgumentException] {
      CatalogStreams.snapshotMergeSink(df, "dw.t", Seq("k"), ckDir("refuse2"))
    }
    assert(twoPart.getMessage.contains("3-level"))
    val wrongCat = intercept[IllegalArgumentException] {
      CatalogStreams.snapshotMergeSink(df, "spark_catalog.default.t", Seq("k"), ckDir("refuse3"))
    }
    assert(wrongCat.getMessage.contains("not a graft SnapshotCatalog"))
  }

  test("topKSketchSink on a 3-level name: standing heavy-hitter state is SQL-queryable mid-stream") {
    implicit val ctx = spark.sqlContext
    val (cat, _) = newCatalog()
    spark.sql(s"CREATE NAMESPACE $cat.dw")
    val ms = MemoryStream[(String, String)]
    val q = CatalogStreams.topKSketchSink(ms.toDF().toDF("src", "token"), Seq("src"), "token",
      s"$cat.dw.hh_state", checkpoint = ckDir("topk"))
    def standing(): Set[(String, Int, String, Long)] =
      graft.operators.Sketches.topKRollup(spark.table(s"$cat.dw.hh_state"), Seq("src"), k = 2)
        .select(col("src"), col("rk"), col("item"), col("cnt"))
        .as[(String, Int, String, Long)].collect().toSet
    try {
      ms.addData(("a", "x"), ("a", "x"), ("a", "y"), ("b", "p"))
      q.processAllAvailable()
      // the sketch STATE table is a plain catalog table: schema visible
      // to SQL, one row per group, exact rollup below capacity
      assert(spark.sql(s"SELECT src, n_rows FROM $cat.dw.hh_state ORDER BY src")
        .collect().toSeq == Seq(Row("a", 3L), Row("b", 1L)))
      assert(standing() == Set(("a", 1, "x", 2L), ("a", 2, "y", 1L), ("b", 1, "p", 1L)))
      ms.addData(("a", "y"), ("a", "y"), ("b", "q"), ("b", "q"))
      q.processAllAvailable()
      assert(standing() == Set(("a", 1, "y", 3L), ("a", 2, "x", 2L), ("b", 1, "q", 2L), ("b", 2, "p", 1L)))
      // sketch state as of batch 1 still time-travels through SQL
      assert(spark.sql(s"SELECT count(*) FROM $cat.dw.hh_state VERSION AS OF 1").head.getLong(0) == 2L)
    } finally q.stop()
  }

  test("quantileSketchSink on a 3-level name: standing percentiles via SQL-read state") {
    implicit val ctx = spark.sqlContext
    val (cat, _) = newCatalog()
    spark.sql(s"CREATE NAMESPACE $cat.dw")
    val ms = MemoryStream[(String, Double)]
    val q = CatalogStreams.quantileSketchSink(ms.toDF().toDF("src", "v"), Seq("src"), "v",
      s"$cat.dw.q_state", checkpoint = ckDir("quant"))
    def p50(): Map[String, Double] =
      graft.operators.Sketches.quantileRollup(spark.table(s"$cat.dw.q_state"), Seq("src"),
        Seq(("p50", 0.5)))
        .select(col("src"), col("p50")).as[(String, Double)].collect().toMap
    try {
      ms.addData(("a", 5.0), ("a", 1.0), ("a", 9.0), ("b", 2.0))
      q.processAllAvailable()
      assert(p50() == Map("a" -> 5.0, "b" -> 2.0))
      ms.addData(("a", 3.0), ("b", 8.0))
      q.processAllAvailable()
      assert(p50() == Map("a" -> 3.0, "b" -> 2.0)) // disc quantile, ceil rank
    } finally q.stop()
  }

  test("lshIndexUpsertSink on a 3-level name: the ANN index is a SQL-visible, serveable catalog table") {
    implicit val ctx = spark.sqlContext
    import graft.operators.Similarity
    val (cat, root) = newCatalog()
    spark.sql(s"CREATE NAMESPACE $cat.dw")
    val e = spark.read.parquet(sf() + "/embeddings.parquet").select($"vec_id", $"embedding")
    val all = e.limit(200).as[(Long, Array[Float])].collect().toSeq
    val ms = MemoryStream[(Long, Array[Float])]
    val q = CatalogStreams.lshIndexUpsertSink(ms.toDF().toDF("vec_id", "embedding"),
      s"$cat.dw.ann", "vec_id", "embedding", checkpoint = ckDir("ann"), bits = 4, dim = 64)
    try {
      ms.addData(all: _*)
      q.processAllAvailable()
      // index rows (id, norm, bucket) are plain SQL
      assert(spark.sql(s"SELECT count(*) FROM $cat.dw.ann").head.getLong(0) == all.size.toLong)
      // and serving through the SAME store the catalog resolved works:
      // resolveSnapshot returns the one store, not a copy
      val (st, bare) = graft.catalog.CatalogTables.resolveSnapshot(spark, s"$cat.dw.ann")
      assert(st.rootPath == s"$root/dw" && bare == "ann")
      val queries = e.filter($"vec_id" < 3)
      val served = Similarity.queryLshIndexSnapshot(st, bare, queries, "vec_id", "embedding",
        k = 3, bits = 4, dim = 64)
      assert(served.count() == 9L)
    } finally q.stop()
  }

  test("log-governed catalog: every committed batch publishes through, so pinned SQL readers follow the stream") {
    implicit val ctx = spark.sqlContext
    val log = java.nio.file.Files.createTempDirectory("graft-cstream-log").toString
    val (cat, root) = newCatalog(commitlog = Some(log))
    spark.sql(s"CREATE NAMESPACE $cat.dw")
    val lc = new graft.io.LakeCommits(spark, log)
    val ms = MemoryStream[(Long, String, Long)]
    val q = CatalogStreams.snapshotMergeSink(
      ms.toDF().toDF("k", "status", "seq"), s"$cat.dw.gov",
      keyCols = Seq("k"), checkpoint = ckDir("gov"), orderCol = Some("seq"))
    try {
      ms.addData((1L, "new", 1L))
      q.processAllAvailable()
      // batch 1 committed v1 AND published it: the log head pins v1, so
      // a governed SQL reader resolves exactly this version
      val st = new graft.io.SnapshotTables(spark, s"$root/dw")
      assert(lc.pinnedVersion(st, "gov").contains(1))
      assert(spark.sql(s"SELECT status FROM $cat.dw.gov").head.getString(0) == "new")
      // batch 2: without publish-through the table would stay pinned at
      // v1 and this update would be INVISIBLE to SQL — the regression
      // this spec exists to catch
      ms.addData((1L, "shipped", 2L))
      q.processAllAvailable()
      assert(lc.pinnedVersion(st, "gov").contains(2))
      assert(spark.sql(s"SELECT status FROM $cat.dw.gov").head.getString(0) == "shipped")
    } finally q.stop()
  }
}
