package graft.io

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._

/** 100×-FILE-COUNT scale record for scan planning (round-14 ask #3,
  * X112–X114): the round-13 planning fast path collects manifests
  * ≤64k rows to the driver and LRU-caches them; this harness PROVES
  * the budget at 1M manifest rows.
  *
  * Method: commit a small real table through the SQL catalog, then
  * splice `n` GHOST file rows into its stats manifest (disjoint
  * [min,max] bounds far above every probe, so ghosts always prune away
  * and reads only ever open the real files — planning never opens data
  * files, so ghost rows exercise exactly the planning path a
  * million-file table would). Per scale: time the PLANNING of a pruned
  * SQL query (sql → executedPlan, fresh decision state), assert the
  * answer stays correct, and assert the budget verdict: ≤64k rows →
  * driver fast path caches the rows; >64k → the cache records
  * over-budget (None) and the evaluation stays distributed — the
  * driver never materializes a million-row manifest.
  *
  * LRU half: plan pruned queries over MORE tables than the cache bound
  * and assert the cache never exceeds it (heap is not pinned across
  * many tables).
  *
  * Usage: Test/runMain graft.io.ScaleScanPlanning [outFile]
  */
object ScaleScanPlanning {
  def main(args: Array[String]): Unit = {
    val out = args.headOption.getOrElse("SCALE_r14.json")
    val spark = graft.core.GraftSession.local("scale-scan", Runtime.getRuntime.availableProcessors)
    spark.sparkContext.setLogLevel("ERROR")
    val root = Files.createTempDirectory("graft-scale-scan").toString
    spark.conf.set("spark.sql.catalog.scalescan", classOf[graft.catalog.SnapshotCatalog].getName)
    spark.conf.set("spark.sql.catalog.scalescan.root", root)
    spark.sql("CREATE NAMESPACE scalescan.dw")
    spark.sql("CREATE TABLE scalescan.dw.t (k BIGINT, v STRING) " +
      "TBLPROPERTIES('graft.stats.columns'='k')")
    spark.sql("INSERT INTO scalescan.dw.t SELECT id, CAST(id AS STRING) FROM range(0, 1000)")

    val mp = {
      var found: Option[java.nio.file.Path] = None
      Files.walk(Paths.get(root)).forEach { p =>
        if (p.getFileName.toString.endsWith("-manifest.parquet") && Files.isDirectory(p))
          found = Some(p)
      }
      found.getOrElse(sys.error(s"no manifest under $root")).toString
    }
    // detach the real rows from the file before overwriting it
    val real = spark.read.parquet(mp).localCheckpoint(true)
    val realCols = real.schema

    val q = "SELECT k FROM scalescan.dw.t WHERE k BETWEEN 0 AND 50 ORDER BY k"
    spark.conf.set("graft.scan.manifestPruning", "false")
    val ref = spark.sql(q).collect().toSeq
    spark.conf.set("graft.scan.manifestPruning", "true")

    def planSeconds(): Double = {
      val t0 = System.nanoTime()
      val df = spark.sql(q)
      df.queryExecution.executedPlan
      (System.nanoTime() - t0) / 1e9
    }

    val scales = Seq(10000, 100000, 1000000)
    val curve = scales.map { n =>
      val ghosts0 = spark.range(n.toLong).select(
        concat(lit("ghost-"), col("id"), lit(".parquet")).as("file"),
        lit("k").as("column"),
        lit(100L).as("rows"), lit(0L).as("nulls"),
        (col("id") * 1000L + 1000000000L).cast("double").as("min_num"),
        (col("id") * 1000L + 1000000999L).cast("double").as("max_num"))
      val ghostCols = ghosts0.columns.toSet
      val ghosts = ghosts0.select(realCols.map(f =>
        if (ghostCols(f.name)) col(f.name).cast(f.dataType)
        else lit(null).cast(f.dataType).as(f.name)): _*)
      val tmp = Files.createTempDirectory("graft-scale-manifest").toString + "/m"
      real.unionByName(ghosts).coalesce(4).write.parquet(tmp)
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(mp))
      Files.move(Paths.get(tmp), Paths.get(mp))
      SnapshotTables.manifestCache.synchronized(SnapshotTables.manifestCache.clear())

      val plan1 = planSeconds() // decision + manifest consultation, cold cache
      val plan2 = planSeconds() // cached verdict path
      val got = spark.sql(q).collect().toSeq
      require(got == ref, s"scale $n: pruned answer diverged")
      val cached = SnapshotTables.manifestCache.synchronized {
        import scala.jdk.CollectionConverters._
        SnapshotTables.manifestCache.asScala.toMap
      }
      val overBudget = cached.values.exists(_ == SnapshotTables.ManifestOverBudget)
      val driverRows = cached.values.collect {
        case SnapshotTables.ManifestRows(rs) => rs.size
      }.sum
      val expectOver = n + 2 > 65536 // ghosts + the real file's rows
      require(overBudget == expectOver,
        s"scale $n: over-budget verdict $overBudget, expected $expectOver")
      require(driverRows <= 65536, s"scale $n: driver holds $driverRows manifest rows")
      println(f"SCALESCAN n=$n plan1=$plan1%.3f plan2=$plan2%.3f overBudget=$overBudget driverRows=$driverRows")
      (n, plan1, plan2, overBudget, driverRows)
    }

    // LRU: more tables than the cache bound; the cache must not grow past it
    SnapshotTables.manifestCache.synchronized(SnapshotTables.manifestCache.clear())
    val nTables = 80
    (1 to nTables).foreach { i =>
      spark.sql(s"CREATE TABLE scalescan.dw.l$i (k BIGINT) TBLPROPERTIES('graft.stats.columns'='k')")
      spark.sql(s"INSERT INTO scalescan.dw.l$i SELECT id FROM range(0, 10)")
      spark.sql(s"SELECT k FROM scalescan.dw.l$i WHERE k < 5").collect()
    }
    val lruSize = SnapshotTables.manifestCache.synchronized(SnapshotTables.manifestCache.size())
    println(s"SCALESCAN lru tables=$nTables cacheSize=$lruSize")
    require(lruSize <= 64, s"LRU exceeded its bound: $lruSize")

    val curveJson = curve.map { case (n, p1, p2, ob, dr) =>
      s"""{"manifest_rows":$n,"plan_cold_sec":${math.rint(p1 * 1000) / 1000},""" +
        s""""plan_cached_sec":${math.rint(p2 * 1000) / 1000},"over_budget_distributed":$ob,""" +
        s""""driver_cached_rows":$dr}"""
    }.mkString("[", ",", "]")
    val json =
      s"""{"kind":"scan_planning","budget_rows":65536,"correct_at_every_scale":true,""" +
        s""""curve":$curveJson,"lru":{"tables_planned":$nTables,"cache_bound":64,"cache_size":$lruSize}}"""
    Files.write(Paths.get(out), json.getBytes(StandardCharsets.UTF_8))
    println(s"SCALESCAN wrote $out")
    spark.stop()
  }
}
