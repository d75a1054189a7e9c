package graft.streaming

import graft.SparkSpec
import graft.io.SnapshotTables
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.streaming.StreamingQueryException

/** [[ChangeFeed]] — the streaming change-feed SOURCE over snapshot
  * tables (`spark.readStream.format("graft-changes")`): offsets are
  * snapshot versions, each micro-batch is the row-level diff of the
  * versions it covers, and the stock engine's checkpointing makes the
  * delivery exactly-once. What this suite pins:
  *
  *  - the KEYED changelog shape (insert / delete / update pre+post
  *    image, Delta-CDF column order) across a multi-version catch-up
  *    batch, commit stamps included
  *  - the MULTISET mode (update = delete+insert, multiplicity honest)
  *  - the default start (= head at stream start: only NEW commits) vs
  *    `startingVersion=earliest` (the whole retained line)
  *  - exactly-once across a stop / commit-more / restart-from-
  *    checkpoint cycle
  *  - `maxVersionsPerBatch` catch-up pacing (one version per batch)
  *  - LOUD failure on a retention-expired range and on mid-stream
  *    schema drift (never a silently reshaped row)
  *  - catalog addressing: on a LOG-GOVERNED catalog the feed follows
  *    the PUBLISHED head — a staged-but-unpublished commit does not
  *    stream until the lake publishes it (read-what-SQL-reads) */
class ChangeFeedSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(tag: String): String =
    java.nio.file.Files.createTempDirectory(s"graft-cdf-$tag").toString

  private def feed(root: String, name: String, extra: (String, String)*) = {
    var r = spark.readStream.format("graft-changes")
      .option("root", root).option("name", name)
    extra.foreach { case (k, v) => r = r.option(k, v) }
    r.load()
  }

  /** (version, change type, id, v) rows of a memory-sink table, in
    * commit/type/id order. */
  private def changes(view: String): Seq[(Int, String, Int, String)] =
    spark.table(view).select("_commit_version", "_change_type", "id", "v")
      .collect().map(r => (r.getInt(0), r.getString(1), r.getInt(2), r.getString(3)))
      .toSeq.sortBy(t => (t._1, t._2, t._3))

  test("keyed feed from earliest: full CDF history in one catch-up batch, commit stamps on") {
    val root = tmp("keyed"); val st = new SnapshotTables(spark, root)
    st.overwriteTable(Seq((1, "a"), (2, "b"), (3, "c")).toDF("id", "v"), "t")
    st.merge("t", Seq((2, "B"), (4, "d")).toDF("id", "v"), Seq("id"))
    st.delete("t", col("id") === 1)
    val q = feed(root, "t", "keys" -> "id", "startingVersion" -> "earliest")
      .writeStream.format("memory").queryName("cdf_keyed")
      .option("checkpointLocation", tmp("keyed-ck")).start()
    try {
      q.processAllAvailable()
      assert(changes("cdf_keyed") == Seq(
        (1, "insert", 1, "a"), (1, "insert", 2, "b"), (1, "insert", 3, "c"),
        (2, "insert", 4, "d"),
        (2, "update_postimage", 2, "B"), (2, "update_preimage", 2, "b"),
        (3, "delete", 1, "a")))
      // commit stamps ride along, on the same clock TIMESTAMP AS OF uses
      assert(spark.table("cdf_keyed").filter(col("_commit_timestamp").isNull).isEmpty)
    } finally q.stop()
  }

  test("delta commits stream O(delta): feed events over append/upsert/delete/patch chains are exact") {
    val root = tmp("delta"); val st = new SnapshotTables(spark, root)
    st.overwriteTable(Seq((1, "a"), (2, "b")).toDF("id", "v"), "t") // v1 full
    st.append(Seq((3, "c")).toDF("id", "v"), "t")                   // v2 append
    st.upsertMor("t", Seq((2, "B"), (4, "d")).toDF("id", "v"), Seq("id")) // v3
    st.deleteKeysMor("t", Seq(1).toDF("id"))                        // v4
    st.updateMor("t", Seq("v" -> org.apache.spark.sql.functions.concat(col("v"),
      org.apache.spark.sql.functions.lit("!"))), col("id") === 3)   // v5 patch
    val q = feed(root, "t", "keys" -> "id", "startingVersion" -> "earliest")
      .writeStream.format("memory").queryName("cdf_delta")
      .option("checkpointLocation", tmp("delta-ck")).start()
    try {
      q.processAllAvailable()
      assert(changes("cdf_delta") == Seq(
        (1, "insert", 1, "a"), (1, "insert", 2, "b"),
        (2, "insert", 3, "c"),
        (3, "insert", 4, "d"),
        (3, "update_postimage", 2, "B"), (3, "update_preimage", 2, "b"),
        (4, "delete", 1, "a"),
        (5, "update_postimage", 3, "c!"), (5, "update_preimage", 3, "c")))
    } finally q.stop()
  }

  test("a minor-compaction fold commit streams as a ZERO-row step (content-preserving)") {
    val root = tmp("fold"); val st = new SnapshotTables(spark, root)
    st.overwriteTable(Seq((1, "a"), (2, "b")).toDF("id", "v"), "t") // v1
    st.upsertMor("t", Seq((2, "B")).toDF("id", "v"), Seq("id"))     // v2
    st.deleteKeysMor("t", Seq(1).toDF("id"))                        // v3
    assert(st.compactDeltas("t"))                                   // v4 fold (revise)
    st.append(Seq((5, "e")).toDF("id", "v"), "t")                   // v5
    val q = feed(root, "t", "keys" -> "id", "startingVersion" -> "earliest")
      .writeStream.format("memory").queryName("cdf_fold")
      .option("checkpointLocation", tmp("fold-ck")).start()
    try {
      q.processAllAvailable()
      // v4 contributes NOTHING; every real change streams exactly once
      assert(changes("cdf_fold") == Seq(
        (1, "insert", 1, "a"), (1, "insert", 2, "b"),
        (2, "update_postimage", 2, "B"), (2, "update_preimage", 2, "b"),
        (3, "delete", 1, "a"),
        (5, "insert", 5, "e")))
    } finally q.stop()
  }

  test("default start = head at stream start: only commits made after subscription stream") {
    val root = tmp("latest"); val st = new SnapshotTables(spark, root)
    st.overwriteTable(Seq((1, "a"), (2, "b")).toDF("id", "v"), "t")
    val q = feed(root, "t", "keys" -> "id")
      .writeStream.format("memory").queryName("cdf_latest")
      .option("checkpointLocation", tmp("latest-ck")).start()
    try {
      q.processAllAvailable()
      assert(changes("cdf_latest").isEmpty) // pre-subscription history is not replayed
      st.merge("t", Seq((2, "B")).toDF("id", "v"), Seq("id"))
      q.processAllAvailable()
      assert(changes("cdf_latest") == Seq(
        (2, "update_postimage", 2, "B"), (2, "update_preimage", 2, "b")))
    } finally q.stop()
  }

  test("multiset mode (no keys): an update streams as delete+insert, duplicates keep multiplicity") {
    val root = tmp("multi"); val st = new SnapshotTables(spark, root)
    st.overwriteTable(Seq((1, "a"), (1, "a"), (2, "b")).toDF("id", "v"), "t")
    st.overwriteTable(Seq((1, "a"), (2, "B")).toDF("id", "v"), "t") // drop ONE dup, change 2
    val q = feed(root, "t", "startingVersion" -> "earliest")
      .writeStream.format("memory").queryName("cdf_multi")
      .option("checkpointLocation", tmp("multi-ck")).start()
    try {
      q.processAllAvailable()
      assert(changes("cdf_multi") == Seq(
        (1, "insert", 1, "a"), (1, "insert", 1, "a"), (1, "insert", 2, "b"),
        (2, "delete", 1, "a"), (2, "delete", 2, "b"), (2, "insert", 2, "B")))
    } finally q.stop()
  }

  test("exactly-once across restart: a new query on the same checkpoint resumes, not replays") {
    val root = tmp("restart"); val st = new SnapshotTables(spark, root)
    val ck = tmp("restart-ck")
    st.overwriteTable(Seq((1, "a")).toDF("id", "v"), "t")
    val got = scala.collection.mutable.ArrayBuffer[(Int, String, Int, String)]()
    def collector = feed(root, "t", "keys" -> "id", "startingVersion" -> "earliest")
      .writeStream
      .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
        val rows = df.select("_commit_version", "_change_type", "id", "v").collect()
          .map(r => (r.getInt(0), r.getString(1), r.getInt(2), r.getString(3)))
        got.synchronized { got ++= rows }; ()
      }
      .option("checkpointLocation", ck)
    val q1 = collector.start()
    try { q1.processAllAvailable() } finally q1.stop()
    assert(got.toSeq.sorted == Seq((1, "insert", 1, "a")))
    st.merge("t", Seq((2, "b")).toDF("id", "v"), Seq("id")) // committed while the stream is DOWN
    val q2 = collector.start()
    try {
      q2.processAllAvailable()
      // only the version committed after the checkpointed offset — v1
      // is NOT re-emitted even though startingVersion says earliest
      assert(got.toSeq.sorted == Seq((1, "insert", 1, "a"), (2, "insert", 2, "b")))
    } finally q2.stop()
  }

  test("maxVersionsPerBatch=1 paces catch-up one version per micro-batch") {
    val root = tmp("pace"); val st = new SnapshotTables(spark, root)
    st.overwriteTable(Seq((1, "a")).toDF("id", "v"), "t")
    st.merge("t", Seq((2, "b")).toDF("id", "v"), Seq("id"))
    st.merge("t", Seq((3, "c")).toDF("id", "v"), Seq("id"))
    val perBatch = scala.collection.mutable.ArrayBuffer[Set[Int]]()
    val q = feed(root, "t", "keys" -> "id", "startingVersion" -> "earliest",
        "maxVersionsPerBatch" -> "1")
      .writeStream
      .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
        perBatch.synchronized {
          perBatch += df.select("_commit_version").distinct()
            .collect().map(_.getInt(0)).toSet
        }; ()
      }
      .option("checkpointLocation", tmp("pace-ck")).start()
    try {
      q.processAllAvailable()
      assert(perBatch.toSeq == Seq(Set(1), Set(2), Set(3)))
    } finally q.stop()
  }

  test("a retention-expired range fails the stream loudly with a restart hint") {
    val root = tmp("ret")
    val st = new SnapshotTables(spark, root, previousVersionsMax = 1)
    st.overwriteTable(Seq((1, "a")).toDF("id", "v"), "t")
    st.overwriteTable(Seq((2, "b")).toDF("id", "v"), "t")
    st.overwriteTable(Seq((3, "c")).toDF("id", "v"), "t") // v1 expired now
    val q = feed(root, "t", "keys" -> "id", "startingVersion" -> "earliest")
      .writeStream.format("memory").queryName("cdf_ret")
      .option("checkpointLocation", tmp("ret-ck")).start()
    val e = intercept[StreamingQueryException] { q.processAllAvailable() }
    assert(e.getMessage.contains("retention has expired") ||
      Option(e.getCause).exists(_.getMessage.contains("retention has expired")))
  }

  test("mid-stream schema drift fails the feed instead of silently reshaping rows") {
    val root = tmp("drift"); val st = new SnapshotTables(spark, root)
    st.overwriteTable(Seq((1, "a")).toDF("id", "v"), "t")
    val q = feed(root, "t", "keys" -> "id")
      .writeStream.format("memory").queryName("cdf_drift")
      .option("checkpointLocation", tmp("drift-ck")).start()
    q.processAllAvailable() // subscribe at v1's schema
    st.overwriteTable(Seq((1, "a", 9L)).toDF("id", "v", "extra"), "t")
    val e = intercept[StreamingQueryException] { q.processAllAvailable() }
    assert(e.getMessage.contains("schema changed mid-stream") ||
      Option(e.getCause).exists(_.getMessage.contains("schema changed mid-stream")))
  }

  test("a feed started after ADD COLUMN null-fills pre-evolution versions (Delta CDF additive semantics)") {
    val root = tmp("evo"); val st = new SnapshotTables(spark, root)
    st.overwriteTable(Seq((1, "a"), (2, "b")).toDF("id", "v"), "t")      // v1
    st.append(Seq((3, "c")).toDF("id", "v"), "t")                        // v2
    st.addColumn("t", "score", org.apache.spark.sql.types.LongType)      // v3: metadata-only
    st.append(Seq((4, "d", 7L)).toDF("id", "v", "score"), "t")           // v4
    // the feed pins the CURRENT (post-evolution) schema; catching up
    // from earliest must null-fill the narrower versions, not fail
    val q = feed(root, "t", "keys" -> "id", "startingVersion" -> "earliest")
      .writeStream.format("memory").queryName("cdf_evo")
      .option("checkpointLocation", tmp("evo-ck")).start()
    try {
      q.processAllAvailable()
      val got = spark.table("cdf_evo")
        .select("_commit_version", "_change_type", "id", "v", "score")
        .collect()
        .map(r => (r.getInt(0), r.getString(1), r.getInt(2), r.getString(3),
          if (r.isNullAt(4)) None else Some(r.getLong(4))))
        .toSet
      assert(got == Set(
        (1, "insert", 1, "a", None), (1, "insert", 2, "b", None),
        (2, "insert", 3, "c", None),
        // v3 (the ALTER) emits nothing: no rows changed
        (4, "insert", 4, "d", Some(7L))), got.toString)
    } finally q.stop()
  }

  test("option refusals: missing addressing and 2-part catalog names") {
    intercept[IllegalArgumentException] {
      spark.readStream.format("graft-changes").option("root", "/nope").load()
    }
    val e = intercept[IllegalArgumentException] {
      spark.readStream.format("graft-changes").option("table", "db.t").load()
    }
    assert(e.getMessage.contains("3-level"))
  }

  test("startingTimestamp streams versions committed at/after the timestamp, TIMESTAMP AS OF's clock") {
    val root = tmp("ts"); val st = new SnapshotTables(spark, root)
    st.overwriteTable(Seq((1, "a")).toDF("id", "v"), "t")
    val afterV1 = st.versionHistory("t").last._2 + 1 // strictly after v1's commit
    Thread.sleep(5)
    st.merge("t", Seq((2, "b")).toDF("id", "v"), Seq("id"))
    st.merge("t", Seq((3, "c")).toDF("id", "v"), Seq("id"))
    val q = feed(root, "t", "keys" -> "id", "startingTimestamp" -> afterV1.toString)
      .writeStream.format("memory").queryName("cdf_ts")
      .option("checkpointLocation", tmp("ts-ck")).start()
    try {
      q.processAllAvailable()
      // v1 predates the timestamp; v2 and v3 stream
      assert(changes("cdf_ts") == Seq((2, "insert", 2, "b"), (3, "insert", 3, "c")))
    } finally q.stop()
    // both knobs at once is ambiguous — refused
    intercept[IllegalArgumentException] {
      feed(root, "t", "startingVersion" -> "earliest", "startingTimestamp" -> "0")
        .writeStream.format("memory").queryName("cdf_ts2")
        .option("checkpointLocation", tmp("ts2-ck")).start()
    }
  }

  test("composes: a table's change feed incrementally maintains a downstream snapshot table") {
    // the incremental silver→gold shape: tail silver's commits, merge
    // the upsert images into gold — gold follows silver version by
    // version without ever rescanning silver's full history
    val root = tmp("pipe"); val st = new SnapshotTables(spark, root)
    st.overwriteTable(Seq((1, "a"), (2, "b")).toDF("id", "v"), "silver")
    val upserts = feed(root, "silver", "keys" -> "id", "startingVersion" -> "earliest")
      .filter(col("_change_type").isin("insert", "update_postimage"))
      .select("id", "v")
    val q = Streams.snapshotMergeSink(upserts, st, "gold", Seq("id"), tmp("pipe-ck"))
    try {
      q.processAllAvailable()
      assert(st.read("gold").as[(Int, String)].collect().sorted.toSeq
        == Seq((1, "a"), (2, "b")))
      st.merge("silver", Seq((2, "B"), (3, "c")).toDF("id", "v"), Seq("id"))
      q.processAllAvailable()
      assert(st.read("gold").as[(Int, String)].collect().sorted.toSeq
        == Seq((1, "a"), (2, "B"), (3, "c")))
    } finally q.stop()
  }

  test("log-governed catalog: the feed follows the PUBLISHED head, not raw commits") {
    val log = tmp("gov-log")
    val root = tmp("gov-root")
    val cat = "cdfgov"
    spark.conf.set(s"spark.sql.catalog.$cat", classOf[graft.catalog.SnapshotCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$cat.root", root)
    spark.conf.set(s"spark.sql.catalog.$cat.commitlog", log)
    spark.sql(s"CREATE NAMESPACE $cat.dw")
    spark.sql(s"CREATE TABLE $cat.dw.t AS SELECT 1 AS id, 'a' AS v") // CTAS publishes v1
    val st = new SnapshotTables(spark, s"$root/dw")
    val lc = new graft.io.LakeCommits(spark, log)
    assert(lc.pinnedVersion(st, "t").contains(1))
    val q = CatalogStreams.changeFeed(spark, s"$cat.dw.t",
        keys = Seq("id"), startingVersion = Some(-1))
      .writeStream.format("memory").queryName("cdf_gov")
      .option("checkpointLocation", tmp("gov-ck")).start()
    try {
      q.processAllAvailable()
      assert(changes("cdf_gov") == Seq((1, "insert", 1, "a")))
      // stage v2 OUTSIDE the log (a raw API commit): SQL readers still
      // resolve v1, and so must the feed
      st.merge("t", Seq((2, "b")).toDF("id", "v"), Seq("id"))
      q.processAllAvailable()
      assert(changes("cdf_gov") == Seq((1, "insert", 1, "a")))
      // publish v2 → the feed advances with the SQL-visible state
      lc.publishExact(Seq((st, "t", 2)))
      q.processAllAvailable()
      assert(changes("cdf_gov") == Seq(
        (1, "insert", 1, "a"), (2, "insert", 2, "b")))
    } finally q.stop()
  }
}
