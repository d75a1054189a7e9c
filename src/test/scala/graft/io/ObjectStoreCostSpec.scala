package graft.io

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** X104's asymptotic claim under an S3 cost model: on object stores
  * rename is a billed server-side COPY, so the stage-then-rename
  * commit protocol pays O(data) per commit while the direct layout's
  * CAS-only publish pays O(metadata). [[CostModelFileSystem]] meters
  * every rename's bytes; both layouts run the SAME operations over the
  * SAME data through `costfs://` URIs and the spec asserts the cost
  * split — not just file identity. The parquet task commit itself
  * renames task temps into place under BOTH layouts (a real deployment
  * swaps in an S3 direct committer for that half), so the assert
  * isolates the snapshot-layer commit: rename-layout must pay at least
  * the data bytes AGAIN on top of whatever the write paid, the direct
  * layout must pay 0 extra data bytes. */
class ObjectStoreCostSpec extends SparkSpec {
  import spark.implicits._

  private def newCostRoot(): String = {
    spark.sparkContext.hadoopConfiguration
      .set("fs.costfs.impl", classOf[CostModelFileSystem].getName)
    "costfs://" + java.nio.file.Files.createTempDirectory("graft-costfs").toString
  }

  /** Bytes renamed by `body` (global meter, so specs must not run
    * concurrent FS work — SparkSpec suites are sequential). */
  private def renameBytes(body: => Unit): Long = {
    val before = CostModelFileSystem.bytesRenamed.get()
    body
    CostModelFileSystem.bytesRenamed.get() - before
  }

  private def dataBytesUnder(root: String): Long = {
    val base = java.nio.file.Paths.get(root.stripPrefix("costfs://"))
    var n = 0L
    java.nio.file.Files.walk(base).forEach { p =>
      if (p.getFileName.toString.endsWith(".parquet") &&
          java.nio.file.Files.isRegularFile(p) && !p.toString.contains("/metadata/"))
        n += java.nio.file.Files.size(p)
    }
    n
  }

  private def df(n: Int) =
    spark.range(n).select(col("id"), concat(lit("payload-"), col("id")).as("v"))

  test("commit cost: rename layout pays O(data) in rename bytes, direct pays O(metadata)") {
    val renameRoot = newCostRoot()
    val tRename = new SnapshotTables(spark, renameRoot)
    // the parquet write itself renames task temps into place under
    // either layout; measure it once so the commit-layer delta is clean
    val renameTotal = renameBytes(tRename.overwriteTable(df(20000), "tab"))
    val data = dataBytesUnder(renameRoot)
    assert(data > 0)

    val directRoot = newCostRoot()
    val tDirect = new SnapshotTables(spark, directRoot)
    spark.conf.set("graft.commit.layout", "direct")
    val directTotal =
      try renameBytes(tDirect.overwriteTable(df(20000), "tab"))
      finally spark.conf.unset("graft.commit.layout")
    val dataDirect = dataBytesUnder(directRoot)

    // same data both sides (same rows, same codec)
    assert(math.abs(data - dataDirect) < data / 10, s"fixtures diverged: $data vs $dataDirect")
    // rename layout moved the data files at least once MORE than direct
    assert(renameTotal - directTotal >= data,
      s"rename-layout commit should cost >= $data extra rename bytes: " +
        s"rename=$renameTotal direct=$directTotal")
    // the shared write phase costs 2x data (FileOutputCommitter v1:
    // task commit + job commit each rename the files once); the direct
    // layout must add only metadata on top of that, the rename layout
    // adds the whole data set a third time
    assert(directTotal < data * 5 / 2,
      s"direct=$directTotal should be write-phase-only (~${2 * data})")
    assert(renameTotal >= data * 3,
      s"rename=$renameTotal should pay the data a third time (~${3 * data})")
    // both roots answer identically
    assert(tRename.read("tab").count() == 20000 && tDirect.read("tab").count() == 20000)
  }

  test("WAP publish cost: direct adopts the branch pool by reference — zero data rename bytes") {
    val root = newCostRoot()
    val t = new SnapshotTables(spark, root)
    spark.conf.set("graft.commit.layout", "direct")
    try {
      t.overwriteTable(df(5000), "tab")
      t.createBranch("tab", "audit")
      t.mergeToBranch("tab", "audit",
        df(5000).withColumn("v", concat(col("v"), lit("-u"))).filter(col("id") < 100),
        keyCols = Seq("id"))
      val branchData = dataBytesUnder(root)
      val publishCost = renameBytes { t.publish("tab", "audit") }
      // the publish may move METADATA (manifest/pointer files), never data:
      // its rename bytes must be tiny relative to the table's data bytes
      assert(publishCost < branchData / 100,
        s"direct publish should move ~0 data bytes: cost=$publishCost data=$branchData")
      assert(t.read("tab").filter(col("v").endsWith("-u")).count() == 100)
    } finally spark.conf.unset("graft.commit.layout")
  }

  test("scheme-qualified URIs round-trip the whole stack: reads, time travel, pruning") {
    val root = newCostRoot()
    val t = new SnapshotTables(spark, root)
    t.overwriteTable(df(1000), "tab", Nil, statsCols = Seq("id"))
    t.append(df(1000).withColumn("id", col("id") + 10000), "tab")
    assert(t.read("tab").count() == 2000)
    assert(t.readVersion("tab", 1).count() == 1000)
    val pruned = t.readPrunedBox("tab", Seq(("id", 0, 50)))
      .filter(col("id").between(0, 50))
    assert(pruned.count() == 51)
  }
}
