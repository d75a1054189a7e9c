package graft.io

import graft.SparkSpec
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec

class SinksSpec extends SparkSpec {
  import spark.implicits._

  test("co-bucketed tables join with zero shuffle exchanges") {
    val facts = (0 until 2000).map(i => (i.toLong % 100, i.toLong, i * 1.5)).toDF("k", "id", "v")
    val dims = (0 until 100).map(i => (i.toLong, s"name$i")).toDF("k", "name")
    Sinks.bucketedTable(facts, "bkt_facts", Seq("k"), numBuckets = 8, sortCols = Seq("k"))
    Sinks.bucketedTable(dims, "bkt_dims", Seq("k"), numBuckets = 8, sortCols = Seq("k"))
    // disable auto-broadcast so the join would otherwise shuffle both sides
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold", "10485760")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val j = spark.table("bkt_facts").join(spark.table("bkt_dims"), "k")
      assert(j.count() == 2000)
      val plan = j.queryExecution.executedPlan match {
        case a: AdaptiveSparkPlanExec => a.executedPlan.toString
        case p => p.toString
      }
      assert(!plan.contains("Exchange"), s"co-bucketed join must not shuffle:\n$plan")
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
      spark.sql("DROP TABLE IF EXISTS bkt_facts")
      spark.sql("DROP TABLE IF EXISTS bkt_dims")
    }
  }

  test("clearManagedTable resolves qualified-name locations through the catalog, not string concat") {
    spark.sql("CREATE DATABASE IF NOT EXISTS sinksdb")
    try {
      // a directory whose name literally matches the naive
      // <warehouse>/<name> concat — the old bug would delete it
      val warehouse = spark.conf.get("spark.sql.warehouse.dir")
      val bystander = new org.apache.hadoop.fs.Path(warehouse, "sinksdb.victim")
      val fs = bystander.getFileSystem(spark.sparkContext.hadoopConfiguration)
      fs.mkdirs(bystander)
      // qualified managed table rebuilt twice: second CTAS must not hit
      // LOCATION_ALREADY_EXISTS (leftover dir is found at its REAL
      // catalog location, <warehouse>/sinksdb.db/victim)
      Sinks.bucketedTable(Seq((1L, "a")).toDF("k", "v"), "sinksdb.victim", Seq("k"), 2)
      Sinks.bucketedTable(Seq((2L, "b")).toDF("k", "v"), "sinksdb.victim", Seq("k"), 2)
      assert(spark.table("sinksdb.victim").as[(Long, String)].head() == ((2L, "b")))
      assert(fs.exists(bystander), "unrelated dir named 'db.tbl' must never be deleted")
      // EXTERNAL table data is the user's: clearing must drop the
      // catalog entry but leave the files
      val ext = java.nio.file.Files.createTempDirectory("sinks-ext").toString
      Seq((9L, "x")).toDF("k", "v").write.mode("overwrite").parquet(ext)
      spark.sql(s"CREATE TABLE sinksdb.exttab (k BIGINT, v STRING) USING parquet LOCATION '$ext'")
      Sinks.clearManagedTable(spark, "sinksdb.exttab")
      assert(!spark.catalog.tableExists("sinksdb.exttab"))
      assert(spark.read.parquet(ext).count() == 1, "external data must survive the clear")
    } finally {
      spark.sql("DROP TABLE IF EXISTS sinksdb.victim")
      spark.sql("DROP DATABASE IF EXISTS sinksdb CASCADE")
    }
  }

  test("sortedParquet writes files with disjoint sort-key ranges (min/max skippable)") {
    val out = java.nio.file.Files.createTempDirectory("sorted-pq").toString + "/t"
    val df = spark.range(0, 10000).toDF("id")
      .withColumn("v", $"id" * 2)
      .orderBy(org.apache.spark.sql.functions.rand(7)) // scrambled input
    Sinks.sortedParquet(df, out, Seq("id"), numFiles = 4)
    val files = new java.io.File(out).listFiles().filter(_.getName.endsWith(".parquet")).map(_.toString)
    assert(files.length == 4)
    // per-file (min, max) of the sort key must not overlap across files
    val ranges = files.map { f =>
      val r = spark.read.parquet(f)
        .agg(org.apache.spark.sql.functions.min($"id"), org.apache.spark.sql.functions.max($"id")).head
      (r.getLong(0), r.getLong(1))
    }.sortBy(_._1)
    ranges.sliding(2).foreach {
      case Array((_, hi), (lo2, _)) => assert(hi < lo2, s"file ranges overlap: ${ranges.toSeq}")
      case _ =>
    }
    // total rows preserved
    assert(spark.read.parquet(out).count() == 10000)
  }

  test("zorderedParquet keeps per-file min/max tight on BOTH columns; box predicates skip files") {
    import org.apache.spark.sql.functions._
    // two independent uniform dimensions: no single sort key can give
    // tight file stats on both
    val df = spark.range(0, 20000).toDF("id")
      .withColumn("x", pmod(hash($"id" * 7919), lit(10000)).cast("long"))
      .withColumn("y", pmod(hash($"id" * 104729 + 1), lit(10000)).cast("long"))
    def fileRanges(path: String, c: String): Seq[(Long, Long)] =
      spark.read.parquet(path)
        .groupBy(input_file_name()).agg(min(col(c)).as("mn"), max(col(c)).as("mx"))
        .select("mn", "mx").collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    // a box predicate on both dims: files whose stats ranges intersect
    // the box are the ones a parquet reader must open
    def candidates(path: String, lo: Long, hi: Long): Int =
      spark.read.parquet(path)
        .groupBy(input_file_name())
        .agg(min($"x").as("xmn"), max($"x").as("xmx"), min($"y").as("ymn"), max($"y").as("ymx"))
        .filter($"xmn" <= hi && $"xmx" >= lo && $"ymn" <= hi && $"ymx" >= lo)
        .count().toInt

    val zdir = java.nio.file.Files.createTempDirectory("zorder-pq").toString + "/t"
    val udir = java.nio.file.Files.createTempDirectory("zorder-pq").toString + "/u"
    Sinks.zorderedParquet(df, zdir, Seq("x", "y"), numFiles = 16)
    df.repartition(16).write.parquet(udir) // unclustered baseline
    // content round-trips
    assert(spark.read.parquet(zdir).agg(sum($"id")).head.getLong(0) ==
      df.agg(sum($"id")).head.getLong(0))
    // every file's x-range AND y-range is a fraction of the domain
    // (z-curve locality), vs the unclustered layout where each file
    // spans nearly everything
    def avgWidth(rs: Seq[(Long, Long)]): Double =
      rs.map { case (a, b) => (b - a).toDouble }.sum / rs.size
    assert(avgWidth(fileRanges(zdir, "x")) < 0.5 * avgWidth(fileRanges(udir, "x")))
    assert(avgWidth(fileRanges(zdir, "y")) < 0.5 * avgWidth(fileRanges(udir, "y")))
    // a 10%x10% box: the z-ordered layout prunes most of the 16 files,
    // the unclustered one prunes none
    val (zc, uc) = (candidates(zdir, 4500, 5500), candidates(udir, 4500, 5500))
    assert(uc == 16, s"baseline unexpectedly prunable: $uc")
    assert(zc <= 10, s"z-order box candidates $zc of 16 — no locality")
    // caller-supplied domains skip the bounds pre-scan and still cluster
    val zdirB = java.nio.file.Files.createTempDirectory("zorder-pq").toString + "/t2"
    Sinks.zorderCluster(df, Seq("x", "y"), numFiles = 16,
      bounds = Some(Seq((0d, 9999d), (0d, 9999d))))
      .write.parquet(zdirB)
    assert(candidates(zdirB, 4500, 5500) <= 10)
  }

  test("rank-coded z-order keeps pruning selective inside a heavy-tailed column's dense region") {
    import org.apache.spark.sql.functions._
    // x uniform; y = u^8-shaped heavy tail (99% of mass in a sliver of
    // the domain): linear codes collapse the dense region into bin 0,
    // so a selective band there stops pruning — rank codes are
    // equi-depth and keep spreading it
    val df = spark.range(0, 40000).toDF("id")
      .withColumn("x", pmod(hash($"id" * 7919), lit(10000)).cast("long"))
      .withColumn("u", pmod(hash($"id" * 104729 + 1), lit(10000)).cast("double") / 10000.0)
      .withColumn("y", (pow($"u", 8) * 1e9).cast("long")).drop("u")
    def candidates(path: String, ylo: Long, yhi: Long): Int =
      spark.read.parquet(path).groupBy(input_file_name())
        .agg(min($"y").as("c"), max($"y").as("d"))
        .filter($"c" <= yhi && $"d" >= ylo).count().toInt
    val lin = java.nio.file.Files.createTempDirectory("rz").toString + "/lin"
    val rnk = java.nio.file.Files.createTempDirectory("rz").toString + "/rnk"
    Sinks.zorderCluster(df, Seq("x", "y"), numFiles = 16).write.parquet(lin)
    Sinks.zorderClusterRank(df, Seq("x", "y"), numFiles = 16).write.parquet(rnk)
    assert(spark.read.parquet(rnk).count() == 40000) // content round-trips
    // a 5%-of-rows band inside the dense region (tiny absolute y range)
    val Array(y40, y45) = df.stat.approxQuantile("y", Array(0.40, 0.45), 0.001)
    val (cl, cr) = (candidates(lin, y40.toLong, y45.toLong), candidates(rnk, y40.toLong, y45.toLong))
    assert(cr < cl, s"rank coding should out-prune linear in the dense region: rank=$cr linear=$cl")
    assert(cr <= 12, s"rank-coded dense band read $cr of 16 files")
  }
}
