package graft.catalog

import graft.SparkSpec
import org.apache.spark.sql.Row

/** The SQL face of delta commits: INSERT INTO as an O(batch) append
  * commit, merge-on-read DELETE/UPDATE behind the `graft.write.mode`
  * table property, chain-resolving SELECT / time travel / `.history`,
  * and the DeltaResolveRule plan substitution for chains plain parquet
  * paths cannot express. */
class DeltaSqlSpec extends SparkSpec {

  private var n = 0
  private def newCatalog(): String = synchronized {
    n += 1
    val cat = s"dsql$n"
    val root = java.nio.file.Files.createTempDirectory(s"graft-cat-$cat").toString
    spark.conf.set(s"spark.sql.catalog.$cat", classOf[SnapshotCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$cat.root", root)
    cat
  }

  private def rows(sql: String): Seq[Row] = spark.sql(sql).collect().toSeq

  test("INSERT INTO commits an append delta, not a rewrite; reads and time travel resolve the chain") {
    val c = newCatalog()
    spark.sql(s"CREATE NAMESPACE $c.dw")
    spark.sql(s"CREATE TABLE $c.dw.t (id INT, v STRING)")
    spark.sql(s"INSERT INTO $c.dw.t VALUES (1, 'a'), (2, 'b')") // first commit: full
    spark.sql(s"INSERT INTO $c.dw.t VALUES (3, 'c')")           // append delta
    spark.sql(s"INSERT INTO $c.dw.t VALUES (4, 'd')")           // append delta
    assert(rows(s"SELECT kind FROM $c.dw.t.history ORDER BY version") ==
      Seq(Row("full"), Row("append"), Row("append")))
    assert(rows(s"SELECT * FROM $c.dw.t ORDER BY id") ==
      Seq(Row(1, "a"), Row(2, "b"), Row(3, "c"), Row(4, "d")))
    assert(rows(s"SELECT count(*) AS c FROM $c.dw.t VERSION AS OF 2") == Seq(Row(3L)))
    // predicate pushdown survives the multi-segment scan
    val q = spark.sql(s"SELECT v FROM $c.dw.t WHERE id >= 3")
    assert(q.collect().map(_.getString(0)).sorted.toSeq == Seq("c", "d"))
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters: [IsNotNull(id), GreaterThanOrEqual(id,3)]"))
  }

  test("write mode 'mor': DELETE and UPDATE commit patch deltas; SELECT resolves them") {
    val c = newCatalog()
    spark.sql(s"CREATE NAMESPACE $c.dw")
    spark.sql(
      s"CREATE TABLE $c.dw.m (id INT, v STRING) TBLPROPERTIES ('graft.write.mode'='mor')")
    spark.sql(s"INSERT INTO $c.dw.m SELECT id, concat('r', id) FROM range(1000)")
    spark.sql(s"DELETE FROM $c.dw.m WHERE id % 100 = 7")
    spark.sql(s"UPDATE $c.dw.m SET v = 'boosted' WHERE id < 3")
    assert(rows(s"SELECT kind FROM $c.dw.m.history ORDER BY version") ==
      Seq(Row("full"), Row("mor_patch"), Row("mor_patch")))
    assert(rows(s"SELECT count(*) AS c FROM $c.dw.m") == Seq(Row(990L)))
    assert(rows(s"SELECT count(*) AS c FROM $c.dw.m WHERE v = 'boosted'") == Seq(Row(3L)))
    assert(rows(s"SELECT count(*) AS c FROM $c.dw.m WHERE id = 7") == Seq(Row(0L)))
    // time travel to before the delete still sees everything
    assert(rows(s"SELECT count(*) AS c FROM $c.dw.m VERSION AS OF 1") == Seq(Row(1000L)))
    // the resolved plan is joins/unions — never a nested-loop join
    val plan = spark.sql(s"SELECT * FROM $c.dw.m").queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoop") && !plan.contains("CartesianProduct"))
    // ALTER back to cow: the next DELETE rewrites (full)
    spark.sql(s"ALTER TABLE $c.dw.m SET TBLPROPERTIES ('graft.write.mode'='cow')")
    spark.sql(s"DELETE FROM $c.dw.m WHERE id = 999")
    assert(rows(s"SELECT kind FROM $c.dw.m.history WHERE is_current") == Seq(Row("full")))
    assert(rows(s"SELECT count(*) AS c FROM $c.dw.m") == Seq(Row(989L)))
  }

  test("MERGE INTO reads a merge-on-read chained SOURCE through the resolve rule") {
    val c = newCatalog()
    spark.sql(s"CREATE NAMESPACE $c.dw")
    spark.sql(
      s"CREATE TABLE $c.dw.src (id INT, v STRING) TBLPROPERTIES ('graft.write.mode'='mor')")
    spark.sql(s"INSERT INTO $c.dw.src VALUES (1, 'a'), (2, 'b'), (3, 'c')")
    spark.sql(s"DELETE FROM $c.dw.src WHERE id = 2") // src is now a MOR chain
    spark.sql(s"CREATE TABLE $c.dw.dst (id INT, v STRING)")
    spark.sql(s"INSERT INTO $c.dw.dst VALUES (1, 'old')")
    spark.sql(
      s"""MERGE INTO $c.dw.dst t USING $c.dw.src s ON t.id = s.id
         |WHEN MATCHED THEN UPDATE SET *
         |WHEN NOT MATCHED THEN INSERT *""".stripMargin)
    assert(rows(s"SELECT * FROM $c.dw.dst ORDER BY id") ==
      Seq(Row(1, "a"), Row(3, "c")))
  }

  test("INSERT INTO a partitioned table appends with the layout; chain scans keep partition pruning semantics") {
    val c = newCatalog()
    spark.sql(s"CREATE NAMESPACE $c.dw")
    spark.sql(s"CREATE TABLE $c.dw.p (id INT, region STRING) PARTITIONED BY (region)")
    spark.sql(s"INSERT INTO $c.dw.p VALUES (1, 'eu'), (2, 'us')")
    spark.sql(s"INSERT INTO $c.dw.p VALUES (3, 'eu')") // append on a partitioned table
    assert(rows(s"SELECT kind FROM $c.dw.p.history ORDER BY version") ==
      Seq(Row("full"), Row("append")))
    // partitioned append chains plan through the resolve rule (multi-
    // root partition discovery is refused by Spark) — results exact
    assert(rows(s"SELECT id FROM $c.dw.p WHERE region = 'eu' ORDER BY id") ==
      Seq(Row(1), Row(3)))
    assert(rows(s"SELECT id FROM $c.dw.p WHERE region = 'us'") == Seq(Row(2)))
    // DML over the chain: COW delete materializes; content stays right
    spark.sql(s"DELETE FROM $c.dw.p WHERE id = 1")
    assert(rows(s"SELECT id FROM $c.dw.p ORDER BY id") == Seq(Row(2), Row(3)))
  }

  test("CDC and catalog procedures read through delta chains") {
    val c = newCatalog()
    spark.sql(s"CREATE NAMESPACE $c.dw")
    spark.sql(
      s"CREATE TABLE $c.dw.t (id INT, v STRING) TBLPROPERTIES ('graft.write.mode'='mor')")
    spark.sql(s"INSERT INTO $c.dw.t VALUES (1, 'a'), (2, 'b')")
    spark.sql(s"INSERT INTO $c.dw.t VALUES (3, 'c')")
    spark.sql(s"DELETE FROM $c.dw.t WHERE id = 1")
    // graft_table_changes across delta versions: keyed classification
    val d = rows(
      s"SELECT id, _change_type FROM graft_table_changes('$c.dw.t', 1, 3, 'id') ORDER BY id")
    assert(d == Seq(Row(1, "delete"), Row(3, "insert")))
    // CALL optimize materializes the chain
    spark.sql(s"CALL $c.system.optimize('dw.t')")
    assert(rows(s"SELECT kind FROM $c.dw.t.history WHERE is_current") == Seq(Row("full")))
    assert(rows(s"SELECT count(*) AS c FROM $c.dw.t") == Seq(Row(2L)))
  }

  test("write mode 'mor': canonical keyed MERGE commits an O(source) mor_upsert delta") {
    val c = newCatalog()
    spark.sql(s"CREATE NAMESPACE $c.dw")
    spark.sql(
      s"CREATE TABLE $c.dw.u (id BIGINT, v STRING) TBLPROPERTIES ('graft.write.mode'='mor')")
    spark.sql(s"INSERT INTO $c.dw.u SELECT id, concat('r', id) FROM range(1000)")
    spark.sql(s"CREATE TABLE $c.dw.batch (id BIGINT, v STRING)")
    spark.sql(s"INSERT INTO $c.dw.batch VALUES (1, 'up1'), (5000, 'new')")
    spark.sql(
      s"""MERGE INTO $c.dw.u t USING $c.dw.batch s ON t.id = s.id
         |WHEN MATCHED THEN UPDATE SET *
         |WHEN NOT MATCHED THEN INSERT *""".stripMargin)
    // the statement landed as a merge-on-read delta, NOT a rewrite
    assert(rows(s"SELECT kind FROM $c.dw.u.history WHERE is_current") == Seq(Row("mor_upsert")))
    assert(rows(s"SELECT count(*) AS c FROM $c.dw.u") == Seq(Row(1001L)))
    assert(rows(s"SELECT v FROM $c.dw.u WHERE id IN (1, 2, 5000) ORDER BY id") ==
      Seq(Row("up1"), Row("r2"), Row("new")))
    // duplicate source keys that hit a TARGET row violate the SQL
    // cardinality rule and must raise, not double-apply
    spark.sql(s"INSERT INTO $c.dw.batch VALUES (1, 'up1-again')")
    val e = intercept[Exception](spark.sql(
      s"""MERGE INTO $c.dw.u t USING $c.dw.batch s ON t.id = s.id
         |WHEN MATCHED THEN UPDATE SET *
         |WHEN NOT MATCHED THEN INSERT *""".stripMargin))
    assert(e.getMessage.contains("matched multiple source rows"))
    // a CONDITIONAL merge is not the canonical upsert shape: it takes
    // the general copy-on-write path (kind 'full'), results exact
    spark.sql(
      s"""MERGE INTO $c.dw.u t USING (SELECT 2L AS id, 'cond' AS v) s ON t.id = s.id
         |WHEN MATCHED AND t.v = 'r2' THEN UPDATE SET *
         |WHEN NOT MATCHED THEN INSERT *""".stripMargin)
    assert(rows(s"SELECT kind FROM $c.dw.u.history WHERE is_current") == Seq(Row("full")))
    assert(rows(s"SELECT v FROM $c.dw.u WHERE id = 2") == Seq(Row("cond")))
    // on a COW table the same canonical merge stays a rewrite
    spark.sql(s"CREATE TABLE $c.dw.cw (id BIGINT, v STRING)")
    spark.sql(s"INSERT INTO $c.dw.cw VALUES (1, 'a')")
    spark.sql(
      s"""MERGE INTO $c.dw.cw t USING (SELECT 2L AS id, 'b' AS v) s ON t.id = s.id
         |WHEN MATCHED THEN UPDATE SET *
         |WHEN NOT MATCHED THEN INSERT *""".stripMargin)
    assert(rows(s"SELECT kind FROM $c.dw.cw.history WHERE is_current") == Seq(Row("full")))
    assert(rows(s"SELECT count(*) AS c FROM $c.dw.cw") == Seq(Row(2L)))
  }

  test("SQL CDC null-fills across additive schema evolution; destructive changes stay loud") {
    val c = newCatalog()
    spark.sql(s"CREATE NAMESPACE $c.dw")
    spark.sql(s"CREATE TABLE $c.dw.e (id INT, v STRING)")
    spark.sql(s"INSERT INTO $c.dw.e VALUES (1, 'a'), (2, 'b')")        // v1 full
    spark.sql(s"ALTER TABLE $c.dw.e ADD COLUMN score BIGINT")           // v2 metadata-only
    spark.sql(s"INSERT INTO $c.dw.e VALUES (3, 'c', 9)")                // v3 append
    // keyed: only the real insert surfaces; its new column rides in __new
    assert(rows(
      s"""SELECT id, _change_type, __new.score AS score
         |FROM graft_table_changes('$c.dw.e', 1, 3, 'id') ORDER BY id""".stripMargin) ==
      Seq(Row(3, "insert", 9L)))
    // multiset: pre-evolution rows never re-emit (they are unchanged
    // modulo the null-filled column), the insert carries its value
    assert(rows(
      s"SELECT id, score, _change_type FROM graft_table_changes('$c.dw.e', 1, 3) ORDER BY id") ==
      Seq(Row(3, 9L, "insert")))
    // the ALTER step itself emits zero change rows, in the NEW shape
    assert(rows(s"SELECT count(*) AS c FROM graft_table_changes('$c.dw.e', 1, 2)") == Seq(Row(0L)))
    // destructive evolution (DROP COLUMN) keeps the loud failure
    spark.sql(s"ALTER TABLE $c.dw.e DROP COLUMN v")                     // v4 metadata-only
    val e = intercept[Exception](rows(s"SELECT * FROM graft_table_changes('$c.dw.e', 3, 4)"))
    assert(e.getMessage.contains("destructive schema change"), e.getMessage)
  }

  test("invalid graft TBLPROPERTIES fail CREATE with zero side effects") {
    val c = newCatalog()
    spark.sql(s"CREATE NAMESPACE $c.dw")
    intercept[Exception](spark.sql(
      s"CREATE TABLE $c.dw.bad (id INT) TBLPROPERTIES ('graft.retention.versions'='not-a-number')"))
    // the failed CREATE must not leave a declared-but-half-configured
    // table behind (property validation runs BEFORE declareTable)
    assert(!spark.catalog.tableExists(s"$c.dw.bad"))
    intercept[Exception](spark.sql(
      s"CREATE TABLE $c.dw.bad (id INT) TBLPROPERTIES ('graft.write.mode'='sideways')"))
    assert(!spark.catalog.tableExists(s"$c.dw.bad"))
    intercept[Exception](spark.sql(
      s"CREATE TABLE $c.dw.bad (id INT) TBLPROPERTIES ('graft.write.sort_by'='no_such_col')"))
    assert(!spark.catalog.tableExists(s"$c.dw.bad"))
    // and the same validation guards the CTAS staging path
    intercept[Exception](spark.sql(
      s"CREATE TABLE $c.dw.bad TBLPROPERTIES ('graft.retention.versions'='-3') AS SELECT 1 AS id"))
    assert(!spark.catalog.tableExists(s"$c.dw.bad"))
    // a valid CREATE still lands with the properties applied
    spark.sql(
      s"CREATE TABLE $c.dw.ok (id INT) TBLPROPERTIES ('graft.retention.versions'='2')")
    assert(spark.catalog.tableExists(s"$c.dw.ok"))
  }
}
