package graft.io

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** [[IcebergDml]] — jar-free row-level DELETE/UPDATE on foreign
  * Iceberg v2 tables (spec-shaped equality delete files + delete/
  * overwrite snapshots), plus the branch surface (createBranch /
  * branch-targeted commits / fastForward) and the commit-safety
  * matrix this round hardened: single-commit compact, no-overwrite
  * metadata versions everywhere, relative-path-safe expiry, and
  * expiry-proof streaming txn markers. */
class IcebergDmlSpec extends SparkSpec {
  import spark.implicits._

  private def exported(df: org.apache.spark.sql.DataFrame,
      partitionCols: Seq[String] = Nil): String = {
    val root = java.nio.file.Files.createTempDirectory("graft-dml-snap").toString
    val t = new SnapshotTables(spark, root)
    t.overwriteTable(df, "tab", partitionCols = partitionCols)
    val dest = java.nio.file.Files.createTempDirectory("graft-dml-ice").toString
    IcebergExport.export(t, "tab", dest)
    dest
  }

  private def metadataVersions(dest: String): Seq[Int] = {
    val metaDir = java.nio.file.Paths.get(dest, "metadata")
    import scala.jdk.CollectionConverters._
    java.nio.file.Files.list(metaDir).iterator().asScala
      .map(_.getFileName.toString)
      .filter(_.matches("v\\d+\\.metadata\\.json"))
      .map(_.stripPrefix("v").stripSuffix(".metadata.json").toInt)
      .toSeq.sorted
  }

  private def currentSnapshotNode(dest: String): com.fasterxml.jackson.databind.JsonNode = {
    val om = new com.fasterxml.jackson.databind.ObjectMapper()
    val metaDir = java.nio.file.Paths.get(dest, "metadata")
    val hint = java.nio.file.Files.readString(metaDir.resolve("version-hint.text")).trim.toInt
    val md = om.readTree(java.nio.file.Files.readString(IcebergTestSplice.mdFile(metaDir, hint)))
    val cur = md.get("current-snapshot-id").asLong
    (0 until md.get("snapshots").size).map(md.get("snapshots").get)
      .find(_.get("snapshot-id").asLong == cur).get
  }

  // ------------------------------------------------------------------
  // deleteWhere
  // ------------------------------------------------------------------

  test("deleteWhere (full-column default) is exact predicate semantics, duplicates included") {
    // duplicate copies of (2, "b") — equality on ALL columns must
    // remove every copy, and nothing else
    val dest = exported(Seq((1L, "a"), (2L, "b"), (2L, "b"), (3L, "c"), (4L, "d"))
      .toDF("k", "v"))
    val before = metadataVersions(dest)
    val snap = IcebergDml.deleteWhere(spark, dest, "k <= 2")
    assert(snap.isDefined)
    assert(metadataVersions(dest).size == before.size + 1, "one atomic commit")
    assert(IcebergImport.read(spark, dest).as[(Long, String)].collect().toSet ==
      Set((3L, "c"), (4L, "d")))
    // spec shape: a delete-operation snapshot, delete files planned
    assert(currentSnapshotNode(dest).get("summary").get("operation").asText == "delete")
    assert(IcebergImport.deleteFiles(spark, dest).nonEmpty)
    // time travel: the pre-delete snapshot still reads all 5 copies
    val preSnap = IcebergImport.snapshots(spark, dest).filterNot(s => snap.contains(s)).max
    assert(IcebergImport.read(spark, dest, Some(preSnap)).count() == 5)
  }

  test("deleteWhere with explicit equalityCols widens to key semantics") {
    val dest = exported(Seq((1L, "x", 10.0), (1L, "y", 20.0), (2L, "z", 30.0))
      .toDF("k", "tag", "val"))
    // predicate matches only (1, "x", 10.0); keying on k deletes BOTH
    // rows with k=1 — the documented widening
    IcebergDml.deleteWhere(spark, dest, "tag = 'x'", equalityCols = Seq("k"))
    assert(IcebergImport.read(spark, dest).as[(Long, String, Double)].collect().toSet ==
      Set((2L, "z", 30.0)))
  }

  test("deleteWhere: no match = no commit; refusals for bad columns and maps") {
    val dest = exported(Seq((1L, "a")).toDF("k", "v"))
    val before = metadataVersions(dest)
    assert(IcebergDml.deleteWhere(spark, dest, "k > 100").isEmpty)
    assert(metadataVersions(dest) == before, "no-op must not commit")
    val e1 = intercept[IllegalArgumentException](
      IcebergDml.deleteWhere(spark, dest, "k > 0", equalityCols = Seq("nope")))
    assert(e1.getMessage.contains("nope"))
    val destM = exported(Seq((1L, Map("a" -> 1))).toDF("k", "m"))
    // maps refuse under EXPLICIT equality (auto falls back to position)
    val e2 = intercept[IllegalArgumentException](
      IcebergDml.deleteWhere(spark, destM, "k > 0", strategy = "equality"))
    assert(e2.getMessage.contains("map-typed"))
    val e3 = intercept[IllegalArgumentException](
      IcebergDml.deleteWhere(spark, destM, "k > 0", strategy = "nonsense"))
    assert(e3.getMessage.contains("auto | equality | position"))
    // naming map-free equality columns works on the same table
    IcebergDml.deleteWhere(spark, destM, "k > 0", equalityCols = Seq("k"))
    assert(IcebergImport.read(spark, destM).count() == 0)
  }

  test("NULL values in equality columns delete null-safely (and only the NULLs)") {
    val dest = exported(Seq((1L, "a"), (2L, null), (3L, null), (4L, "d"))
      .toDF("k", "v"))
    // full-column equality over rows whose v IS NULL: the spec's
    // null-safe matching must remove exactly those rows
    IcebergDml.deleteWhere(spark, dest, "v IS NULL AND k <= 2")
    assert(IcebergImport.read(spark, dest).as[(Long, Option[String])].collect().toSet ==
      Set((1L, Some("a")), (3L, None), (4L, Some("d"))))
    // keyed on the NULLABLE column itself: every remaining NULL goes
    IcebergDml.deleteWhere(spark, dest, "v IS NULL", equalityCols = Seq("v"))
    assert(IcebergImport.read(spark, dest).as[(Long, Option[String])].collect().toSet ==
      Set((1L, Some("a")), (4L, Some("d"))))
  }

  test("position strategy: spec-shaped (file_path, pos) deletes address exactly the matched copies") {
    val dest = exported(Seq((1L, "a"), (2L, "b"), (2L, "b"), (3L, "c")).toDF("k", "v"))
    val snap = IcebergDml.deleteWhere(spark, dest, "k = 2", strategy = "position")
    assert(snap.isDefined)
    assert(IcebergImport.read(spark, dest).as[(Long, String)].collect().toSet ==
      Set((1L, "a"), (3L, "c")))
    // the delete files on disk are REAL position deletes: reserved
    // column names, readable as plain parquet
    val dels = IcebergImport.deleteFiles(spark, dest)
    assert(dels.nonEmpty && dels.forall(_.contains("posdelete-")))
    val raw = spark.read.parquet(dels: _*)
    assert(raw.columns.toSet == Set("file_path", "pos"))
    assert(raw.count() == 2) // both copies of (2, "b"), each by position
    // a later append is untouched by the earlier position delete
    IcebergAppend.append(spark, dest, Seq((2L, "b")).toDF("k", "v"))
    assert(IcebergImport.read(spark, dest).count() == 3)
  }

  test("auto strategy falls back to position deletes on map-typed tables") {
    val dest = exported(Seq(
      (1L, Map("a" -> 1)), (2L, Map("b" -> 2)), (3L, Map("c" -> 3))).toDF("k", "m"))
    // full-column equality would refuse (maps) — auto routes to position
    val snap = IcebergDml.deleteWhere(spark, dest, "k = 2")
    assert(snap.isDefined)
    assert(IcebergImport.read(spark, dest).select("k").as[Long].collect().toSet ==
      Set(1L, 3L))
    assert(IcebergImport.deleteFiles(spark, dest).forall(_.contains("posdelete-")))
    // explicit equality on the map column still refuses loudly
    val e = intercept[IllegalArgumentException](
      IcebergDml.deleteWhere(spark, dest, "k = 1", strategy = "equality"))
    assert(e.getMessage.contains("map-typed"))
  }

  test("position deletes compose with existing deletes: only surviving copies are addressed") {
    val dest = exported((1L to 6L).map(i => (i, i * 1.0)).toDF("k", "x"))
    IcebergDml.deleteWhere(spark, dest, "k <= 2")                       // equality first
    IcebergDml.deleteWhere(spark, dest, "x >= 5.0", strategy = "position")
    assert(IcebergImport.read(spark, dest).as[(Long, Double)].collect().toSet ==
      Set((3L, 3.0), (4L, 4.0)))
    // maintenance folds BOTH delete shapes away
    IcebergMaintenance.compact(spark, dest, targetFiles = 1)
    IcebergMaintenance.expireSnapshots(spark, dest, keepLast = 1, removeOrphans = true)
    assert(IcebergImport.read(spark, dest).as[(Long, Double)].collect().toSet ==
      Set((3L, 3.0), (4L, 4.0)))
    assert(IcebergImport.deleteFiles(spark, dest).isEmpty)
  }

  // ------------------------------------------------------------------
  // update
  // ------------------------------------------------------------------

  test("update commits pre-image delete + post-image data in ONE overwrite snapshot") {
    val dest = exported(Seq((1L, "a", 10.0), (2L, "b", 20.0), (2L, "b", 20.0), (3L, "c", 30.0))
      .toDF("k", "v", "price"))
    val before = metadataVersions(dest)
    val preSnaps = IcebergImport.snapshots(spark, dest)
    val snap = IcebergDml.update(spark, dest, "k = 2", Map("price" -> "price * 2"))
    assert(snap.isDefined)
    assert(metadataVersions(dest).size == before.size + 1,
      "update is ONE metadata version — no deleted-but-not-rewritten intermediate")
    assert(currentSnapshotNode(dest).get("summary").get("operation").asText == "overwrite")
    // duplicates stay duplicates (multiset update), others untouched
    assert(IcebergImport.read(spark, dest).as[(Long, String, Double)].collect().sorted.toSeq ==
      Seq((1L, "a", 10.0), (2L, "b", 40.0), (2L, "b", 40.0), (3L, "c", 30.0)))
    // time travel to the pre-update head
    assert(IcebergImport.read(spark, dest, Some(preSnaps.max))
      .as[(Long, String, Double)].collect().sorted.toSeq ==
      Seq((1L, "a", 10.0), (2L, "b", 20.0), (2L, "b", 20.0), (3L, "c", 30.0)))
  }

  test("update on an identity-partitioned table: post-images land in partitions, delete is global") {
    val dest = exported(
      Seq((1L, "r", 1.0), (2L, "r", 2.0), (3L, "g", 3.0)).toDF("k", "color", "val"),
      partitionCols = Seq("color"))
    IcebergDml.update(spark, dest, "color = 'r'", Map("val" -> "val + 0.5"))
    assert(IcebergImport.read(spark, dest)
      .select("k", "color", "val").as[(Long, String, Double)].collect().toSet ==
      Set((1L, "r", 1.5), (2L, "r", 2.5), (3L, "g", 3.0)))
    // updating the partition column itself MOVES rows across partitions
    IcebergDml.update(spark, dest, "k = 3", Map("color" -> "'r'"))
    assert(IcebergImport.read(spark, dest)
      .filter(col("color") === "r").count() == 3)
    // maintenance interplay: compact folds the DML debt, content holds
    IcebergMaintenance.compact(spark, dest, targetFiles = 1)
    IcebergMaintenance.expireSnapshots(spark, dest, keepLast = 1, removeOrphans = true)
    assert(IcebergImport.read(spark, dest)
      .select("k", "color", "val").as[(Long, String, Double)].collect().toSet ==
      Set((1L, "r", 1.5), (2L, "r", 2.5), (3L, "r", 3.0)))
  }

  test("update on a MAP-typed table routes the pre-image delete by position") {
    val dest = exported(Seq(
      (1L, Map("a" -> 1), 10.0), (2L, Map("b" -> 2), 20.0), (3L, Map("c" -> 3), 30.0))
      .toDF("k", "m", "price"))
    val before = metadataVersions(dest)
    val snap = IcebergDml.update(spark, dest, "k = 2", Map("price" -> "price * 2"))
    assert(snap.isDefined)
    assert(metadataVersions(dest).size == before.size + 1, "still one atomic commit")
    assert(IcebergImport.read(spark, dest).select("k", "price")
      .as[(Long, Double)].collect().toSet ==
      Set((1L, 10.0), (2L, 40.0), (3L, 30.0)))
    // the map column survives the round trip on the rewritten row
    assert(IcebergImport.read(spark, dest).filter(col("k") === 2)
      .select("m").as[Map[String, Int]].head() == Map("b" -> 2))
    assert(IcebergImport.deleteFiles(spark, dest).forall(_.contains("posdelete-")))
  }

  test("upsert: one overwrite snapshot, unseen keys insert, seen keys replace, null-safe keys") {
    val dest = exported(Seq((1L, "a"), (2L, "b")).toDF("k", "v"))
    val before = metadataVersions(dest)
    IcebergDml.upsert(spark, dest,
      Seq((2L, "b2"), (3L, "c")).toDF("k", "v"), keys = Seq("k"))
    assert(metadataVersions(dest).size == before.size + 1)
    assert(currentSnapshotNode(dest).get("summary").get("operation").asText == "overwrite")
    assert(IcebergImport.read(spark, dest).as[(Long, String)].collect().toSet ==
      Set((1L, "a"), (2L, "b2"), (3L, "c")))
    // upserting into a branch leaves main untouched until publish
    IcebergEvolve.createBranch(spark, dest, "wip")
    IcebergDml.upsert(spark, dest, Seq((1L, "a9")).toDF("k", "v"),
      keys = Seq("k"), branch = "wip")
    assert(IcebergImport.read(spark, dest).as[(Long, String)].collect().toSet ==
      Set((1L, "a"), (2L, "b2"), (3L, "c")))
    assert(IcebergImport.readRef(spark, dest, "wip").as[(Long, String)].collect().toSet ==
      Set((1L, "a9"), (2L, "b2"), (3L, "c")))
  }

  test("UPDATE assignments evaluate simultaneously on the PRE-image (SET a=b, b=a swaps)") {
    // a foldLeft of withColumn would feed the second assignment the
    // first one's post-image (and depend on Map iteration order) —
    // SQL's rule is simultaneous evaluation over the pre-image row
    val dest = exported(Seq((1L, 10.0, 100.0), (2L, 20.0, 200.0)).toDF("k", "a", "b"))
    IcebergDml.update(spark, dest, "k = 1", Map("a" -> "b", "b" -> "a"))
    assert(IcebergImport.read(spark, dest).as[(Long, Double, Double)].collect().toSet ==
      Set((1L, 100.0, 10.0), (2L, 20.0, 200.0)))
    // dependent arithmetic: b = a*2 must see the OLD a, not a+1's result
    IcebergDml.update(spark, dest, "k = 2", Map("a" -> "a + 1", "b" -> "a * 2"))
    assert(IcebergImport.read(spark, dest).as[(Long, Double, Double)].collect().toSet ==
      Set((1L, 100.0, 10.0), (2L, 21.0, 40.0)))
    // the MAP-typed (position-delete) path obeys the same rule
    val destM = exported(Seq((1L, 3.0, 7.0, Map("t" -> 1))).toDF("k", "a", "b", "m"))
    IcebergDml.update(spark, destM, "k = 1", Map("a" -> "b", "b" -> "a"))
    assert(IcebergImport.read(spark, destM).select("a", "b")
      .as[(Double, Double)].head() == ((7.0, 3.0)))
  }

  test("DML manifest writes restore the fieldId parquet conf — no session leak") {
    // the conf is registered with default "true", so the leak to pin
    // is an explicit user value ("false") being clobbered: every DML
    // shape must put it back, while its own files still carry ids
    val key = "spark.sql.parquet.fieldId.write.enabled"
    val dest = exported(Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("k", "v"))
    val prior = spark.conf.getOption(key)
    try {
      spark.conf.set(key, "false")
      IcebergDml.deleteWhere(spark, dest, "k = 1") // equality-delete path
      assert(spark.conf.get(key) == "false", "equality delete must restore the user's value")
      IcebergDml.deleteWhere(spark, dest, "k = 2", strategy = "position")
      assert(spark.conf.get(key) == "false", "position delete must restore the user's value")
      IcebergDml.update(spark, dest, "k = 3", Map("v" -> "'z'")) // delete + data manifests
      assert(spark.conf.get(key) == "false", "update must restore the user's value")
      // and the writes themselves still carried field ids (reads resolve by id)
      assert(IcebergImport.read(spark, dest).as[(Long, String)].collect().toSet ==
        Set((3L, "z")))
    } finally prior match {
      case Some(v) => spark.conf.set(key, v)
      case None => spark.conf.unset(key)
    }
  }

  // ------------------------------------------------------------------
  // branches: write-audit-publish on foreign tables
  // ------------------------------------------------------------------

  test("branch append + DML stay invisible to main until fastForward publishes") {
    val dest = exported((1L to 4L).map(i => (i, i * 10.0)).toDF("k", "x"))
    IcebergEvolve.createBranch(spark, dest, "audit")
    IcebergAppend.append(spark, dest, Seq((5L, 50.0), (6L, 60.0)).toDF("k", "x"),
      branch = "audit")
    IcebergDml.deleteWhere(spark, dest, "k = 1", branch = "audit")
    // audit sees the staged world; main is untouched
    assert(IcebergImport.readRef(spark, dest, "audit").as[(Long, Double)].collect().toSet ==
      (2L to 6L).map(i => (i, i * 10.0)).toSet)
    assert(IcebergImport.read(spark, dest).as[(Long, Double)].collect().toSet ==
      (1L to 4L).map(i => (i, i * 10.0)).toSet)
    // publish: main fast-forwards to the audited head
    IcebergEvolve.fastForward(spark, dest, "audit")
    assert(IcebergImport.read(spark, dest).as[(Long, Double)].collect().toSet ==
      (2L to 6L).map(i => (i, i * 10.0)).toSet)
  }

  test("branch refusals: tags take no commits; diverged main refuses fast-forward") {
    val dest = exported(Seq((1L, "a")).toDF("k", "v"))
    IcebergEvolve.createTag(spark, dest, "pin")
    val e1 = intercept[IllegalArgumentException](
      IcebergAppend.append(spark, dest, Seq((2L, "b")).toDF("k", "v"), branch = "pin"))
    assert(e1.getMessage.contains("tag"))
    IcebergEvolve.createBranch(spark, dest, "wip")
    IcebergAppend.append(spark, dest, Seq((2L, "b")).toDF("k", "v"), branch = "wip")
    // main moves past the fork point -> no longer an ancestor
    IcebergAppend.append(spark, dest, Seq((3L, "c")).toDF("k", "v"))
    val e2 = intercept[IllegalArgumentException](
      IcebergEvolve.fastForward(spark, dest, "wip"))
    assert(e2.getMessage.contains("not a fast-forward"))
    val e3 = intercept[IllegalArgumentException](
      IcebergAppend.append(spark, dest, Seq((9L, "z")).toDF("k", "v"), branch = "ghost"))
    assert(e3.getMessage.contains("createBranch"))
  }

  test("CALL faces: delete_where / update / upsert by path") {
    spark.conf.set("spark.sql.catalog.icedml",
      classOf[graft.catalog.SnapshotCatalog].getName)
    spark.conf.set("spark.sql.catalog.icedml.root",
      java.nio.file.Files.createTempDirectory("graft-dml-cat").toString)
    val dest = exported(Seq((1L, "a", 10.0), (2L, "b", 20.0), (3L, "c", 30.0))
      .toDF("k", "v", "price"))
    assert(spark.sql(s"CALL icedml.system.iceberg_delete_where('$dest', 'k = 1')")
      .collect().head.getLong(0) > 0)
    assert(spark.sql(
      s"CALL icedml.system.iceberg_update('$dest', 'k = 2', 'price = price + 5')")
      .collect().head.getLong(0) > 0)
    assert(spark.sql(s"""CALL icedml.system.iceberg_upsert('$dest',
      'SELECT CAST(3 AS BIGINT) AS k, CAST(''c2'' AS STRING) AS v,
        CAST(33.0 AS DOUBLE) AS price
       UNION ALL SELECT 4, ''d'', 40.0', 'k')""")
      .collect().head.getLong(0) > 0)
    assert(IcebergImport.read(spark, dest).as[(Long, String, Double)].collect().toSet ==
      Set((2L, "b", 25.0), (3L, "c2", 33.0), (4L, "d", 40.0)))
  }

  // ------------------------------------------------------------------
  // commit-safety matrix (this round's hardening)
  // ------------------------------------------------------------------

  test("compact is ONE atomic metadata version whose list references only the rewrite") {
    val dest = exported((1L to 6L).map(i => (i, s"v$i")).toDF("k", "v"))
    IcebergDml.deleteWhere(spark, dest, "k = 6")
    val before = metadataVersions(dest)
    val snap = IcebergMaintenance.compact(spark, dest, targetFiles = 1)
    assert(metadataVersions(dest).size == before.size + 1,
      "compact must publish exactly one metadata version — a polling reader can " +
        "never observe an intermediate append-shaped (doubled) head")
    val node = currentSnapshotNode(dest)
    assert(node.get("summary").get("operation").asText == "replace")
    val list = IcebergTestSplice.readAvroRecords(node.get("manifest-list").asText)
    assert(list.nonEmpty &&
      list.forall(_.get("added_snapshot_id").asInstanceOf[Long] == snap),
      "the replace snapshot's manifest list must reference ONLY the rewrite manifest")
    assert(IcebergImport.read(spark, dest).as[(Long, String)].collect().toSet ==
      (1L to 5L).map(i => (i, s"v$i")).toSet)
  }

  test("every metadata commit refuses to overwrite a racing writer's version file") {
    val dest = exported(Seq((1L, "a")).toDF("k", "v"))
    // simulate a racing writer landing v<N+1> first
    val metaDir = java.nio.file.Paths.get(dest, "metadata")
    val hint = java.nio.file.Files.readString(metaDir.resolve("version-hint.text")).trim.toInt
    java.nio.file.Files.writeString(metaDir.resolve(s"v${hint + 1}.metadata.json"), "{}")
    intercept[Exception](IcebergEvolve.createTag(spark, dest, "t1"))
    intercept[Exception](IcebergAppend.append(spark, dest, Seq((2L, "b")).toDF("k", "v")))
    intercept[Exception](IcebergDml.deleteWhere(spark, dest, "k = 1"))
    // the losing writers changed nothing: the head still reads v<hint>
    java.nio.file.Files.delete(metaDir.resolve(s"v${hint + 1}.metadata.json"))
    assert(IcebergImport.read(spark, dest).as[(Long, String)].collect().toSet == Set((1L, "a")))
  }

  test("catalog-convention metadata names refuse writes honestly, not NumberFormatException") {
    val e = intercept[IllegalArgumentException](IcebergImport.writableVersionOf(
      new org.apache.hadoop.fs.Path("/t/metadata/00001-abc-def.metadata.json")))
    assert(e.getMessage.contains("read-only"))
  }

  test("catalog-convention layouts (NNNNN-uuid, no hint) READ at the highest version; writes refuse") {
    // REST/Hive-catalog tables name metadata <NNNNN>-<uuid>.metadata.json
    // with NO version-hint (the catalog is the pointer); a directory
    // copy must still read at the highest embedded version
    val dest = exported(Seq((1L, "a"), (2L, "b")).toDF("k", "v"))
    IcebergAppend.append(spark, dest, Seq((3L, "c")).toDF("k", "v"))
    val metaDir = java.nio.file.Paths.get(dest, "metadata")
    import scala.jdk.CollectionConverters._
    java.nio.file.Files.list(metaDir).iterator().asScala.toSeq
      .filter(_.getFileName.toString.matches("v\\d+\\.metadata\\.json")).foreach { p =>
        val v = p.getFileName.toString.stripPrefix("v").stripSuffix(".metadata.json").toInt
        java.nio.file.Files.move(p,
          metaDir.resolve(f"$v%05d-${java.util.UUID.randomUUID()}.metadata.json"))
        java.nio.file.Files.deleteIfExists(
          metaDir.resolve("." + p.getFileName.toString + ".crc"))
      }
    java.nio.file.Files.deleteIfExists(metaDir.resolve("version-hint.text"))
    java.nio.file.Files.deleteIfExists(metaDir.resolve(".version-hint.text.crc"))
    assert(IcebergImport.read(spark, dest).as[(Long, String)].collect().toSet ==
      Set((1L, "a"), (2L, "b"), (3L, "c")), "must read the v2 (post-append) head")
    val e = intercept[IllegalArgumentException](
      IcebergAppend.append(spark, dest, Seq((4L, "d")).toDF("k", "v")))
    assert(e.getMessage.contains("read-only"))
  }

  test("expiry keeps relative-path tables' live files out of the orphan list") {
    val dest = exported((1L to 4L).map(i => (i, s"v$i")).toDF("k", "v"))
    IcebergAppend.append(spark, dest, Seq((5L, "v5")).toDF("k", "v"))
    relativizePaths(dest)
    // sanity: the importer reads the relative layout (resolve() rule)
    assert(IcebergImport.read(spark, dest).as[(Long, String)].collect().toSet ==
      (1L to 5L).map(i => (i, s"v$i")).toSet)
    val live = IcebergImport.dataFiles(spark, dest).map(_.stripPrefix("file:")).toSet
    // keepLast large: nothing expires, so NOTHING live may be an orphan
    val orphans = IcebergMaintenance.expireSnapshots(spark, dest, keepLast = 10)
    val overlap = orphans.map(_.stripPrefix("file:")).toSet.intersect(live)
    assert(overlap.isEmpty,
      s"live data files inventoried as orphans (would be DELETED under removeOrphans): $overlap")
    // destructive expiry to 1 snapshot still preserves the head content
    IcebergMaintenance.expireSnapshots(spark, dest, keepLast = 1, removeOrphans = true)
    assert(IcebergImport.read(spark, dest).as[(Long, String)].collect().toSet ==
      (1L to 5L).map(i => (i, s"v$i")).toSet)
  }

  test("streaming txn markers survive snapshot expiry (expiry-proof replay guard)") {
    val dest = exported(Seq((1L, "a")).toDF("k", "v"))
    val txn0 = "ice-append.cafebabe.0"
    val txn1 = "ice-append.cafebabe.1"
    IcebergAppend.append(spark, dest, Seq((2L, "b")).toDF("k", "v"),
      summaryProps = Map(IcebergAppend.TxnKey -> txn0))
    IcebergAppend.append(spark, dest, Seq((3L, "c")).toDF("k", "v"),
      summaryProps = Map(IcebergAppend.TxnKey -> txn1))
    IcebergAppend.append(spark, dest, Seq((4L, "d")).toDF("k", "v"))
    assert(IcebergAppend.committedTxnIds(spark, dest).intersect(Set(txn0, txn1)).size == 2)
    // expire everything but the head — the marker snapshots are gone...
    IcebergMaintenance.expireSnapshots(spark, dest, keepLast = 1, removeOrphans = true)
    assert(IcebergImport.snapshots(spark, dest).size == 1)
    // ...but the markers survive in table properties: a replayed batch
    // is still recognized and skipped
    assert(IcebergAppend.committedTxnIds(spark, dest).intersect(Set(txn0, txn1)).size == 2)
  }

  test("txn range codec round-trips contiguous and gapped batch ids") {
    import IcebergAppend.{decodeRanges, encodeRanges}
    assert(encodeRanges(Seq(0L, 1L, 2L, 3L)) == "0-3")
    assert(encodeRanges(Seq(5L, 0L, 1L, 3L, 5L)) == "0-1,3,5")
    assert(decodeRanges("0-3,7,9-10") == Seq(0L, 1L, 2L, 3L, 7L, 9L, 10L))
    assert(decodeRanges(encodeRanges(0L to 10000L)) == (0L to 10000L))
  }

  /** Rewrite an exported table IN PLACE so every manifest-list path,
    * manifest_path and file_path is TABLE-RELATIVE — the layout shape
    * portable Iceberg tables use (metadata can move with the data).
    * Exercises the resolve() rule end to end. */
  private def relativizePaths(dest: String): Unit = {
    val om = new com.fasterxml.jackson.databind.ObjectMapper()
    val metaDir = java.nio.file.Paths.get(dest, "metadata")
    val hint = java.nio.file.Files.readString(metaDir.resolve("version-hint.text")).trim.toInt
    val mdFile = IcebergTestSplice.mdFile(metaDir, hint)
    val md = om.readTree(java.nio.file.Files.readString(mdFile))
      .asInstanceOf[com.fasterxml.jackson.databind.node.ObjectNode]
    def rel(p: String): String = {
      val bare = p.stripPrefix("file:")
      if (bare.startsWith(dest + "/")) bare.stripPrefix(dest + "/") else p
    }
    // in-place rewrites bypass Hadoop's LocalFileSystem checksums —
    // drop the stale .crc sidecars so later Hadoop reads don't trip
    def dropCrc(absPath: String): Unit = {
      val f = java.nio.file.Paths.get(absPath.stripPrefix("file:"))
      java.nio.file.Files.deleteIfExists(f.resolveSibling("." + f.getFileName + ".crc"))
      ()
    }
    def rewriteAvro(absPath: String, field: String): Unit = {
      val f = new java.io.File(absPath.stripPrefix("file:"))
      val reader = new org.apache.avro.file.DataFileReader[org.apache.avro.generic.GenericRecord](
        f, new org.apache.avro.generic.GenericDatumReader[org.apache.avro.generic.GenericRecord]())
      val schema = reader.getSchema
      val recs = scala.collection.mutable.ArrayBuffer.empty[org.apache.avro.generic.GenericRecord]
      import scala.jdk.CollectionConverters._
      val meta = reader.getMetaKeys.asScala.filterNot(_.startsWith("avro."))
        .map(k => k -> reader.getMetaString(k)).toSeq
      while (reader.hasNext) recs += reader.next()
      reader.close()
      val w = new org.apache.avro.file.DataFileWriter[org.apache.avro.generic.GenericRecord](
        new org.apache.avro.generic.GenericDatumWriter[org.apache.avro.generic.GenericRecord](schema))
      meta.foreach { case (k, v) => w.setMeta(k, v) }
      w.create(schema, f) // overwrite in place
      recs.foreach { r =>
        if (field == "manifest_path") r.put(field, rel(r.get(field).toString))
        else {
          val dfr = r.get("data_file").asInstanceOf[org.apache.avro.generic.GenericRecord]
          dfr.put("file_path", rel(dfr.get("file_path").toString))
        }
        w.append(r)
      }
      w.close()
      dropCrc(absPath)
    }
    val snaps = md.get("snapshots")
    (0 until snaps.size).map(snaps.get).foreach { s =>
      val sn = s.asInstanceOf[com.fasterxml.jackson.databind.node.ObjectNode]
      val absList = sn.get("manifest-list").asText
      val listRecs = IcebergTestSplice.readAvroRecords(absList)
      listRecs.map(_.get("manifest_path").toString).distinct.foreach(m =>
        rewriteAvro(m, "file_path"))
      rewriteAvro(absList, "manifest_path")
      sn.put("manifest-list", rel(absList))
    }
    java.nio.file.Files.writeString(mdFile, om.writeValueAsString(md))
    dropCrc(mdFile.toString)
  }
}
