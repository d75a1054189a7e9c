package graft.catalog

import graft.SparkSpec
import org.apache.spark.sql.Row

/** X116 — snapshot TAGS (Iceberg's named immutable refs): CALL
  * create_tag / drop_tag, `VERSION AS OF '<tag>'` reads, refs listing
  * with type, expiry protection for the tag's lifetime, and the
  * refusal surface. */
class TagsSpec extends SparkSpec {

  private var n = 0
  private def newCatalog(): String = synchronized {
    n += 1
    val cat = s"tagspec$n"
    val root = java.nio.file.Files.createTempDirectory(s"graft-tag-$cat").toString
    spark.conf.set(s"spark.sql.catalog.$cat", classOf[SnapshotCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$cat.root", root)
    spark.sql(s"CREATE NAMESPACE $cat.dw")
    cat
  }

  test("tag lifecycle through SQL: CALL, VERSION AS OF, refs, drop") {
    val c = newCatalog()
    spark.sql(s"CREATE TABLE $c.dw.t (k INT)")
    spark.sql(s"INSERT INTO $c.dw.t VALUES (1), (2)") // v1
    spark.sql(s"INSERT INTO $c.dw.t VALUES (3)")      // v2
    val r = spark.sql(s"CALL $c.system.create_tag('dw.t', 'rel-1.0', 1)").collect().head
    assert(r.getInt(0) == 1)
    spark.sql(s"CALL $c.system.create_tag('dw.t', 'latest')").collect() // default: current (v2)

    // tag reads are pinned version reads
    assert(spark.sql(s"SELECT count(*) FROM $c.dw.t VERSION AS OF 'rel-1.0'")
      .collect().head.getLong(0) == 2)
    assert(spark.sql(s"SELECT count(*) FROM $c.dw.t VERSION AS OF 'latest'")
      .collect().head.getLong(0) == 3)
    // main keeps moving; the tag does not
    spark.sql(s"INSERT INTO $c.dw.t VALUES (4)") // v3
    assert(spark.sql(s"SELECT count(*) FROM $c.dw.t VERSION AS OF 'latest'")
      .collect().head.getLong(0) == 3)

    // refs relation lists both tags with type, alongside branches
    spark.sql(s"CALL $c.system.create_branch('dw.t', 'wip')")
    assert(spark.sql(s"SELECT branch, base_version, branch_commits, type FROM $c.dw.t.refs ORDER BY branch")
      .collect().toSeq == Seq(Row("latest", 2, 0, "tag"), Row("rel-1.0", 1, 0, "tag"),
        Row("wip", 3, 0, "branch")))

    // DML through a tag read is refused like any time travel
    intercept[Exception] {
      spark.sql(s"INSERT INTO $c.dw.t VERSION AS OF 'rel-1.0' VALUES (9)")
    }

    spark.sql(s"CALL $c.system.drop_tag('dw.t', 'latest')")
    intercept[Exception] {
      spark.sql(s"SELECT * FROM $c.dw.t VERSION AS OF 'latest'").collect()
    }
    assert(spark.sql(s"SELECT count(*) FROM $c.dw.t.refs WHERE type = 'tag'")
      .collect().head.getLong(0) == 1)
  }

  test("a tagged version survives retention and age-based expiry until the tag drops") {
    val c = newCatalog()
    spark.sql(s"CREATE TABLE $c.dw.t (k INT) TBLPROPERTIES('graft.retention.versions'='1')")
    spark.sql(s"INSERT INTO $c.dw.t VALUES (1)") // v1
    spark.sql(s"CALL $c.system.create_tag('dw.t', 'keepme', 1)")
    (2 to 5).foreach(i => spark.sql(s"INSERT OVERWRITE $c.dw.t VALUES ($i)")) // v2..v5
    // retention-1 would have expired v1 thrice over; the tag held it
    assert(spark.sql(s"SELECT * FROM $c.dw.t VERSION AS OF 'keepme'").collect().toSeq == Seq(Row(1)))
    // explicit age-based expiry also respects the tag
    spark.sql(s"CALL $c.system.expire_snapshots('dw.t', '2100-01-01 00:00:00', 1)")
    assert(spark.sql(s"SELECT * FROM $c.dw.t VERSION AS OF 'keepme'").collect().toSeq == Seq(Row(1)))

    // dropping the tag releases the version to the next expiry pass
    spark.sql(s"CALL $c.system.drop_tag('dw.t', 'keepme')")
    spark.sql(s"INSERT OVERWRITE $c.dw.t VALUES (6)")
    intercept[Exception] {
      spark.sql(s"SELECT * FROM $c.dw.t VERSION AS OF 1").collect()
    }
  }

  test("refusals: duplicate, numeric, unretained; branches shadow tags") {
    val c = newCatalog()
    spark.sql(s"CREATE TABLE $c.dw.t (k INT)")
    spark.sql(s"INSERT INTO $c.dw.t VALUES (1)")
    spark.sql(s"CALL $c.system.create_tag('dw.t', 'x')")
    intercept[Exception] { spark.sql(s"CALL $c.system.create_tag('dw.t', 'x')").collect() }
    intercept[Exception] { spark.sql(s"CALL $c.system.create_tag('dw.t', '7')").collect() }
    intercept[Exception] { spark.sql(s"CALL $c.system.create_tag('dw.t', 'v7')").collect() }
    intercept[Exception] { spark.sql(s"CALL $c.system.create_tag('dw.t', 'y', 99)").collect() }
    intercept[Exception] { spark.sql(s"CALL $c.system.drop_tag('dw.t', 'nope')").collect() }

    // name collision: the branch wins (a WAP audit must never read a stale pin)
    spark.sql(s"INSERT INTO $c.dw.t VALUES (2)") // v2
    spark.sql(s"CALL $c.system.create_tag('dw.t', 'shared', 1)")
    spark.sql(s"CALL $c.system.create_branch('dw.t', 'shared')")
    // the branch (forked at v2, nothing staged) reads its base v2 — not the tag's v1
    assert(spark.sql(s"SELECT count(*) FROM $c.dw.t VERSION AS OF 'shared'")
      .collect().head.getLong(0) == 2)
    spark.sql(s"CALL $c.system.drop_branch('dw.t', 'shared')")
    assert(spark.sql(s"SELECT count(*) FROM $c.dw.t VERSION AS OF 'shared'")
      .collect().head.getLong(0) == 1)
  }

  test("tag reads compose with the scan-planning rules: metadata-only count through a tag") {
    val c = newCatalog()
    spark.sql(s"CREATE TABLE $c.dw.t (k INT) TBLPROPERTIES('graft.stats.columns'='k')")
    spark.sql(s"INSERT INTO $c.dw.t SELECT CAST(id AS INT) FROM range(0, 40)")
    spark.sql(s"CALL $c.system.create_tag('dw.t', 'snap')")
    spark.sql(s"INSERT INTO $c.dw.t SELECT CAST(id AS INT) FROM range(1000, 1010)")
    val df = spark.sql(s"SELECT count(*) AS n, max(k) AS mx FROM $c.dw.t VERSION AS OF 'snap'")
    // the tag pin resolves BEFORE planning, so the metadata-aggregate
    // rule answers for the tagged version with zero data files
    val p = df.queryExecution.optimizedPlan
    assert(p.collectFirst {
      case _: org.apache.spark.sql.execution.datasources.v2.DataSourceV2ScanRelation => ()
      case _: org.apache.spark.sql.execution.datasources.LogicalRelation => ()
    }.isEmpty, p.toString)
    assert(df.collect().head == org.apache.spark.sql.Row(40L, 39))
  }
}
