package graft.operators

import graft.SparkSpec

class SimilaritySpec extends SparkSpec {
  import spark.implicits._

  // 4-dim toy embeddings: 1≈2 (same direction), 3 orthogonal, 4 opposite.
  private def vecs = Seq(
    (1L, Array(1.0f, 0.0f, 0.0f, 0.0f)),
    (2L, Array(0.9f, 0.1f, 0.0f, 0.0f)),
    (3L, Array(0.0f, 1.0f, 0.0f, 0.0f)),
    (4L, Array(-1.0f, 0.0f, 0.0f, 0.0f))
  ).toDF("vec_id", "embedding")

  test("brute-force top-k ranks by cosine with deterministic tiebreak") {
    val out = Similarity.bruteForceTopK(vecs, vecs.filter($"vec_id" === 1L), "vec_id", "embedding", k = 3)
      .collect().map(r => (r.getInt(1), r.getLong(2)))
    assert(out.toSeq == Seq((1, 2L), (2, 3L), (3, 4L)))
  }

  test("near-dup pairs returns only pairs above threshold, a<b") {
    val out = Similarity.nearDupPairs(vecs, "vec_id", "embedding", threshold = 0.9)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(out.toSeq == Seq((1L, 2L)))
  }

  test("lsh top-k buckets identical-direction vectors together") {
    val out = Similarity.lshTopK(vecs, vecs.filter($"vec_id" === 1L), "vec_id", "embedding",
      k = 3, bits = 4, dim = 4)
      .collect().map(r => r.getLong(2)).toSet
    // same-bucket neighbors must include the near-duplicate vector 2
    assert(out.contains(2L))
    // and never the opposite-direction vector 4 (differs on every plane)
    assert(!out.contains(4L))
  }

  test("ivf top-k probes nearest cells and re-ranks exactly") {
    // centroids = vectors 1,2 (numCells=2); nprobe=2 covers both cells,
    // so the true nearest neighbor 2 must surface first for query 1
    val out = Similarity.ivfTopK(vecs, vecs.filter($"vec_id" === 1L), "vec_id", "embedding",
      k = 3, numCells = 2, nprobe = 2)
      .collect().map(r => (r.getInt(1), r.getLong(2)))
    assert(out.head == ((1, 2L)))
    // nprobe=1 restricts to the query's own cell — fewer candidates, never more than k
    val narrow = Similarity.ivfTopK(vecs, vecs.filter($"vec_id" === 1L), "vec_id", "embedding",
      k = 3, numCells = 2, nprobe = 1)
      .collect().map(_.getLong(2)).toSet
    assert(narrow.subsetOf(Set(2L, 3L, 4L)))
  }

  test("multi-probe lsh recall >= single-probe recall against brute force") {
    val dir = "/root/testdata/sf0.001"
    val e = spark.read.parquet(s"$dir/embeddings.parquet")
    val q = e.filter($"vec_id" < 10)
    def hits(df: org.apache.spark.sql.DataFrame) =
      df.select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val truth = hits(Similarity.bruteForceTopK(e, q, "vec_id", "embedding", k = 5))
    val single = hits(Similarity.lshTopK(e, q, "vec_id", "embedding", k = 5, bits = 4))
    val multi = hits(Similarity.lshTopK(e, q, "vec_id", "embedding", k = 5, bits = 4, probes = 2))
    val rSingle = (single intersect truth).size
    val rMulti = (multi intersect truth).size
    assert(rMulti >= rSingle, s"multi-probe recall $rMulti < single-probe $rSingle")
    assert(rMulti > 0)
  }

  test("multi-table lsh recall >= single-table recall against brute force") {
    val dir = "/root/testdata/sf0.001"
    val e = spark.read.parquet(s"$dir/embeddings.parquet")
    val q = e.filter($"vec_id" < 10)
    def hits(df: org.apache.spark.sql.DataFrame) =
      df.select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val truth = hits(Similarity.bruteForceTopK(e, q, "vec_id", "embedding", k = 5))
    val single = hits(Similarity.lshTopK(e, q, "vec_id", "embedding", k = 5, bits = 4))
    val multi = hits(Similarity.lshTopKMultiTable(e, q, "vec_id", "embedding", k = 5, bits = 4, tables = 3))
    assert((multi intersect truth).size >= (single intersect truth).size)
  }

  test("lsh near-dup pairs: subset of brute force, concrete recall floor, more tables >= recall") {
    val dir = "/root/testdata/sf0.001"
    val e = spark.read.parquet(s"$dir/embeddings.parquet")
    def pairs(df: org.apache.spark.sql.DataFrame) =
      df.select("a", "b", "score").as[(Long, Long, Double)].collect().toSet
    // brute force = the exact oracle the bucketed path approximates
    val truth = pairs(Similarity.nearDupPairs(e, "vec_id", "embedding", threshold = 0.4))
    val one = pairs(Similarity.nearDupPairsLsh(e, "vec_id", "embedding", 0.4, bits = 4, tables = 1))
    val two = pairs(Similarity.nearDupPairsLsh(e, "vec_id", "embedding", 0.4, bits = 4, tables = 2))
    // every emitted pair is a true above-threshold pair with the exact score
    assert(one.subsetOf(truth) && two.subsetOf(truth))
    // OR-amplification: recall can only grow with tables
    assert(one.subsetOf(two))
    assert(two.nonEmpty, "bucketed path found no pairs at all")
    // concrete recall floor with tuned params: bits=3/tables=8 measures
    // 63/66 here (86% at sf0.01) — assert >= 50% so a recall collapse
    // can never pass. The q40 defaults (bits=4, tables=2) sit at ~30-40%
    // recall by design (small fixture, few tables) — documented in
    // nearDupPairsLsh's scaladoc, not asserted, since q40's oracle is
    // replay-style and this floor is the real recall guard.
    val tuned = pairs(Similarity.nearDupPairsLsh(e, "vec_id", "embedding", 0.4, bits = 3, tables = 8))
    assert(tuned.subsetOf(truth))
    assert(tuned.size * 2 >= truth.size,
      s"tuned recall ${tuned.size}/${truth.size} fell below the 50% floor")
  }

  test("ivfTopKWithCentroids on seed centroids is exactly ivfTopK; refined recall stays sane") {
    val dir = "/root/testdata/sf0.001"
    val e = spark.read.parquet(s"$dir/embeddings.parquet")
    val q = e.filter($"vec_id" < 10)
    // wiring proof: the id<numCells convention is just the supplied-
    // centroids special case — results must be row-identical
    val seeds = e.filter($"vec_id" < 16)
      .select($"vec_id".cast("long").as("cell_id"), $"embedding".as("cent_vec"))
    val viaSeeds = Similarity.ivfTopKWithCentroids(e, q, "vec_id", "embedding", k = 5, seeds, nprobe = 2)
    val builtin = Similarity.ivfTopK(e, q, "vec_id", "embedding", k = 5, numCells = 16, nprobe = 2)
    assert(viaSeeds.collect().toSeq == builtin.collect().toSeq)
    // recall floor for both quantizers against brute force (the fixture
    // is near-uniform random, so refinement holds recall level rather
    // than raising it — the ordering is data-dependent and not asserted;
    // inertia improvement below is the refinement guarantee)
    def hits(df: org.apache.spark.sql.DataFrame) =
      df.select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val truth = hits(Similarity.bruteForceTopK(e, q, "vec_id", "embedding", k = 5))
    val widthBefore = spark.conf.get("spark.sql.shuffle.partitions")
    val cent = Similarity.kmeansCentroids(e, "vec_id", "embedding", k = 16, iters = 2)
    // Lloyd rounds run on an isolated session clone: caller conf
    // untouched, returned frame bound to the caller's session
    assert(spark.conf.get("spark.sql.shuffle.partitions") == widthBefore)
    assert(cent.sparkSession eq spark)
    val refined = hits(Similarity.ivfTopKWithCentroids(e, q, "vec_id", "embedding", k = 5, cent, nprobe = 2))
    val unrefined = hits(builtin)
    assert((refined intersect truth).size * 2 >= truth.size,
      s"refined recall ${(refined intersect truth).size}/${truth.size} below 50%")
    assert((unrefined intersect truth).size * 2 >= truth.size)
  }

  test("persisted LSH index: results equal lshTopK, scan prunes to probed buckets") {
    val dir = "/root/testdata/sf0.001"
    val e = spark.read.parquet(s"$dir/embeddings.parquet")
    val q = e.filter($"vec_id" < 5)
    Similarity.buildLshIndex(e, "vec_id", "embedding", "lsh_index_test", bits = 4, dim = 64, numBuckets = 8)
    try {
      val served = Similarity.queryLshIndex(spark, "lsh_index_test", q, "vec_id", "embedding",
        k = 5, bits = 4, dim = 64)
      val direct = Similarity.lshTopK(e, q, "vec_id", "embedding", k = 5, bits = 4, dim = 64)
      assert(served.collect().toSeq == direct.collect().toSeq)
      // bucket pruning visible in the scan: fewer buckets read than exist
      val plan = served.queryExecution.executedPlan.toString
      val m = "SelectedBucketsCount: (\\d+) out of (\\d+)".r.findFirstMatchIn(plan)
      assert(m.isDefined, s"bucketed scan must report pruning:\n$plan")
      assert(m.get.group(1).toInt <= m.get.group(2).toInt)
      assert(m.get.group(2).toInt == 8)
    } finally spark.sql("DROP TABLE IF EXISTS lsh_index_test")
  }

  test("kmeans refinement never increases inertia and is deterministic") {
    val dir = "/root/testdata/sf0.001"
    val e = spark.read.parquet(s"$dir/embeddings.parquet")
    val seed = Similarity.kmeansCentroids(e, "vec_id", "embedding", k = 8, iters = 0)
    val refined = Similarity.kmeansCentroids(e, "vec_id", "embedding", k = 8, iters = 3)
    val i0 = Similarity.kmeansInertia(e, "vec_id", "embedding", seed)
    val i3 = Similarity.kmeansInertia(e, "vec_id", "embedding", refined)
    assert(i3 <= i0 + 1e-12, s"inertia rose: $i0 -> $i3")
    // bit-stable across runs (decimal sums, deterministic argmax)
    val again = Similarity.kmeansCentroids(e, "vec_id", "embedding", k = 8, iters = 3)
    val a = refined.orderBy("cell_id").collect().map(_.getSeq[Double](1)).map(_.toSeq)
    val b = again.orderBy("cell_id").collect().map(_.getSeq[Double](1)).map(_.toSeq)
    assert(a.toSeq == b.toSeq)
  }

  test("kmeans: durable-checkpoint and folded-interval modes match the default exactly") {
    val dir = "/root/testdata/sf0.001"
    val e = spark.read.parquet(s"$dir/embeddings.parquet")
    def vecsOf(df: org.apache.spark.sql.DataFrame) =
      df.orderBy("cell_id").collect().map(r => (r.getLong(0), r.getSeq[Double](1).toSeq)).toSeq
    val local = vecsOf(Similarity.kmeansCentroids(e, "vec_id", "embedding", k = 8, iters = 2))
    val ckDir = java.nio.file.Files.createTempDirectory("graft-kmeans-ck").toString
    val durable = vecsOf(Similarity.kmeansCentroids(e, "vec_id", "embedding", k = 8, iters = 2,
      checkpointDir = Some(ckDir)))
    val folded = vecsOf(Similarity.kmeansCentroids(e, "vec_id", "embedding", k = 8, iters = 2,
      checkpointInterval = 2))
    assert(durable == local)
    assert(folded == local)
    // the durable mode really did write reliable-checkpoint files
    assert(new java.io.File(ckDir).listFiles().nonEmpty)
  }

  test("hyperplanes are deterministic across calls") {
    val a = Similarity.hyperplanes(8, 4)
    val b = Similarity.hyperplanes(8, 4)
    assert(a.flatten.toSeq == b.flatten.toSeq)
  }

  test("pq: codeword-built vectors encode losslessly and ADC equals true squared L2") {
    // dim=8, m=4 subspaces of 2 dims, k=2 codewords: the pool is the
    // subvectors of seed ids 0 and 1; every other vector is assembled
    // FROM that pool, so quantization is exact and ADC must equal the
    // true squared L2 distance between the raw vectors.
    val rows = Seq(
      (0L, Seq(1f, 0f, 2f, 0f, 0f, 3f, 1f, 1f)), // seeds: codes (0,0,0,0)
      (1L, Seq(0f, 1f, 0f, 2f, 3f, 0f, 2f, 2f)), //        codes (1,1,1,1)
      (2L, Seq(1f, 0f, 0f, 2f, 0f, 3f, 2f, 2f)), // codes (0,1,0,1)
      (3L, Seq(0f, 1f, 2f, 0f, 3f, 0f, 1f, 1f))  // codes (1,0,1,0)
    )
    val df = rows.toDF("vec_id", "embedding")
    val cb = Similarity.pqTrain(df, "vec_id", "embedding", dim = 8, m = 4, k = 2)
    assert(cb.count() == 8) // m*k codewords
    val codes = Similarity.pqEncode(df, "vec_id", "embedding", cb, dim = 8, m = 4)
    val got = codes.collect().map(r => r.getLong(0) -> r.getSeq[Int](1).toSeq).toMap
    assert(got == Map(
      0L -> Seq(0, 0, 0, 0), 1L -> Seq(1, 1, 1, 1),
      2L -> Seq(0, 1, 0, 1), 3L -> Seq(1, 0, 1, 0)))
    val top = Similarity.pqTopK(codes, df.filter($"vec_id" === 0L), "vec_id", "embedding",
      cb, dim = 8, m = 4, k = 2, topK = 3)
      .collect().map(r => (r.getInt(1), r.getLong(2), r.getDouble(3)))
    // true squared L2 from v0: v2=10, v3=20, v1=30
    assert(top.toSeq == Seq((1, 2L, 10.0), (2, 3L, 20.0), (3, 1L, 30.0)))
  }

  test("ivf-pq: probing all cells equals full-scan pq ADC exactly; pruned probes still rank top-k") {
    val e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val q = e.filter($"vec_id" < 10)
    val cb = Similarity.pqTrain(e, "vec_id", "embedding", dim = 64, m = 8, k = 16)
    val codes = Similarity.pqEncode(e, "vec_id", "embedding", cb, dim = 64, m = 8)
    val full = Similarity.pqTopK(codes, q, "vec_id", "embedding", cb,
      dim = 64, m = 8, k = 16, topK = 5).collect().toSeq
    // nprobe = numCells degenerates to the full ADC scan, bit-for-bit
    val allProbes = Similarity.ivfPqTopK(e, q, "vec_id", "embedding", cb,
      dim = 64, m = 8, k = 16, numCells = 16, nprobe = 16, topK = 5).collect().toSeq
    assert(allProbes == full)
    // pruned serving still returns a full top-k per query, adc ascending
    val pruned = Similarity.ivfPqTopK(e, q, "vec_id", "embedding", cb,
      dim = 64, m = 8, k = 16, numCells = 16, nprobe = 2, topK = 5)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getDouble(3)))
    assert(pruned.length == 50)
    pruned.groupBy(_._1).values.foreach { g =>
      val byRk = g.sortBy(_._2).map(_._3)
      assert(byRk.zip(byRk.tail).forall { case (a, b) => a <= b })
    }
  }

  test("refined-centroid IVF-PQ: persisted index serving equals the direct path; all-probes equals full ADC") {
    val e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val q = e.filter($"vec_id" < 5)
    val cb = Similarity.pqTrain(e, "vec_id", "embedding", dim = 64, m = 8, k = 16)
    val refined = Similarity.kmeansCentroids(e, "vec_id", "embedding", k = 16, iters = 1)
    Similarity.buildPqIndex(e, "vec_id", "embedding", cb, "pq_index_refined_test",
      dim = 64, m = 8, numCells = 16, numBuckets = 8, centroids = Some(refined))
    try {
      val served = Similarity.queryPqIndex(spark, "pq_index_refined_test", q, "vec_id", "embedding",
        cb, dim = 64, m = 8, k = 16, nprobe = 2, topK = 5)
      val direct = Similarity.ivfPqTopKWithCentroids(e, q, "vec_id", "embedding", cb,
        dim = 64, m = 8, k = 16, centroids = refined, nprobe = 2, topK = 5)
      assert(served.collect().toSeq == direct.collect().toSeq)
      // refined coarse cells change WHICH rows are scanned, never the
      // scoring: probing every refined cell degenerates to the flat ADC
      // scan bit-for-bit, exactly as with seed cells
      val codes = Similarity.pqEncode(e, "vec_id", "embedding", cb, dim = 64, m = 8)
      val full = Similarity.pqTopK(codes, q, "vec_id", "embedding", cb,
        dim = 64, m = 8, k = 16, topK = 5).collect().toSeq
      val allProbes = Similarity.ivfPqTopKWithCentroids(e, q, "vec_id", "embedding", cb,
        dim = 64, m = 8, k = 16, centroids = refined, nprobe = 16, topK = 5).collect().toSeq
      assert(allProbes == full)
    } finally {
      spark.sql("DROP TABLE IF EXISTS pq_index_refined_test")
      spark.sql("DROP TABLE IF EXISTS pq_index_refined_test_centroids")
    }
  }

  test("persisted PQ index: serving equals the direct IVF-PQ path, scan prunes to probed cells") {
    val e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val q = e.filter($"vec_id" < 5)
    val cb = Similarity.pqTrain(e, "vec_id", "embedding", dim = 64, m = 8, k = 16)
    Similarity.buildPqIndex(e, "vec_id", "embedding", cb, "pq_index_test",
      dim = 64, m = 8, numCells = 16, numBuckets = 8)
    try {
      val served = Similarity.queryPqIndex(spark, "pq_index_test", q, "vec_id", "embedding",
        cb, dim = 64, m = 8, k = 16, nprobe = 2, topK = 5)
      val direct = Similarity.ivfPqTopK(e, q, "vec_id", "embedding", cb,
        dim = 64, m = 8, k = 16, numCells = 16, nprobe = 2, topK = 5)
      assert(served.collect().toSeq == direct.collect().toSeq)
      // cell pruning visible in the bucketed scan
      val plan = served.queryExecution.executedPlan.toString
      val mm = "SelectedBucketsCount: (\\d+) out of (\\d+)".r.findFirstMatchIn(plan)
      assert(mm.isDefined, s"bucketed scan must report pruning:\n$plan")
      assert(mm.get.group(1).toInt < mm.get.group(2).toInt)
      assert(mm.get.group(2).toInt == 8)
    } finally {
      spark.sql("DROP TABLE IF EXISTS pq_index_test")
      spark.sql("DROP TABLE IF EXISTS pq_index_test_centroids")
    }
  }

  test("incrementally upserted PQ index serves identically to the batch-built one; replays idempotent") {
    val e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val q = e.filter($"vec_id" < 5)
    val cb = Similarity.pqTrain(e, "vec_id", "embedding", dim = 64, m = 8, k = 16)
    val root = java.nio.file.Files.createTempDirectory("graft-pq-inc").toString
    val tables = new graft.io.SnapshotTables(spark, root)
    // the quantizer must be FROZEN across increments: seed it from the
    // full corpus on the first call, exactly what a production retrain
    // would persist before resuming ingestion
    val seedCent = e.filter($"vec_id" < 16)
      .select($"vec_id".cast("long").as("cell_id"), $"embedding".as("cent_vec"))
    Similarity.upsertPqIndex(tables, "pq", e.filter($"vec_id" < 300), "vec_id", "embedding",
      cb, dim = 64, m = 8, numCells = 16, centroids = Some(seedCent))
    Similarity.upsertPqIndex(tables, "pq", e.filter($"vec_id" >= 300), "vec_id", "embedding",
      cb, dim = 64, m = 8, numCells = 16)
    Similarity.buildPqIndex(e, "vec_id", "embedding", cb, "pq_inc_ref",
      dim = 64, m = 8, numCells = 16, numBuckets = 8)
    try {
      val served = Similarity.queryPqIndexSnapshot(tables, "pq", q, "vec_id", "embedding",
        cb, dim = 64, m = 8, k = 16, nprobe = 2, topK = 5)
      val reference = Similarity.queryPqIndex(spark, "pq_inc_ref", q, "vec_id", "embedding",
        cb, dim = 64, m = 8, k = 16, nprobe = 2, topK = 5)
      assert(served.collect().toSeq == reference.collect().toSeq)
      // probed cells prune to partition directories on the snapshot read
      val plan = served.queryExecution.executedPlan.toString
      assert(plan.contains("PartitionFilters") && plan.contains("cell_id"), plan)
      // replaying an increment leaves content identical, one more version
      val vBefore = tables.currentVersion("pq")
      val n = tables.read("pq").count()
      Similarity.upsertPqIndex(tables, "pq", e.filter($"vec_id" >= 300), "vec_id", "embedding",
        cb, dim = 64, m = 8, numCells = 16)
      assert(tables.currentVersion("pq") == vBefore + 1 && tables.read("pq").count() == n)
    } finally {
      spark.sql("DROP TABLE IF EXISTS pq_inc_ref")
      spark.sql("DROP TABLE IF EXISTS pq_inc_ref_centroids")
    }
  }

  test("semantic dedup keeps exactly the docs with no smaller-id near-dup in their cell") {
    val e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val out = Similarity.semanticDedup(e, "vec_id", "embedding", numCells = 8, threshold = 0.25)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2)))
    assert(out.length == e.count())
    val cell = out.map(r => r._1 -> r._2).toMap
    // replay the rule locally: dropped iff ∃ same-cell neighbor with
    // smaller id and cosine > τ
    val vecs = e.collect().map(r => r.getLong(0) -> r.getSeq[Float](1).map(_.toDouble).toArray).toMap
    def cos(a: Array[Double], b: Array[Double]) = {
      val d = a.zip(b).map { case (x, y) => x * y }.sum
      d / (math.sqrt(a.map(x => x * x).sum) * math.sqrt(b.map(x => x * x).sum))
    }
    out.foreach { case (id, c, kept) =>
      val expectDropped = vecs.keys.exists(o => o < id && cell(o) == c && cos(vecs(o), vecs(id)) > 0.25)
      assert(kept == !expectDropped, s"doc $id kept=$kept but expectDropped=$expectDropped")
    }
    // survivors + dropped partition the corpus; some of each at this τ
    val keptN = out.count(_._3)
    assert(keptN > 0 && keptN < out.length)
  }

  test("semantic dedup accepts refined centroids and stays deterministic under repartition") {
    val e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val cent = Similarity.kmeansCentroids(e, "vec_id", "embedding", k = 8, iters = 1)
    def flat(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2))).toSeq
    val a = flat(Similarity.semanticDedup(e, "vec_id", "embedding", 8, 0.25, Some(cent)))
    val b = flat(Similarity.semanticDedup(e.repartition(13), "vec_id", "embedding", 8, 0.25, Some(cent)))
    assert(a == b)
    assert(a.length == e.count())
  }

  test("knn self-join: near-identical vectors are mutual rank-1 neighbors, k bounds each list") {
    val out = Similarity.knnJoinLsh(vecs, "vec_id", "embedding", k = 2, bits = 4, dim = 4, tables = 2)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
    // every doc's list is bounded by k
    out.groupBy(_._1).foreach { case (id, rows) => assert(rows.length <= 2, s"doc $id has ${rows.length} rows") }
    // 1 and 2 share every sign-bit bucket (same direction) => mutual rank-1
    assert(out.contains((1L, 1, 2L)), s"1's top neighbor must be 2: ${out.toSeq}")
    assert(out.contains((2L, 1, 1L)), s"2's top neighbor must be 1: ${out.toSeq}")
    // symmetric candidate feed: both endpoints of each pair got a list
    val ids = out.map(_._1).toSet
    assert(ids.contains(1L) && ids.contains(2L))
  }

  test("hard negatives: near-dup band excluded, ranks renumbered, bounded per doc") {
    val e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val tau = 0.25
    val neg = Similarity.hardNegatives(e, "vec_id", "embedding",
      negativesPerDoc = 2, dupThreshold = tau, fetchK = 8)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3)))
    // every negative sits at or below the dup threshold
    assert(neg.forall(_._4 <= tau), s"dup-band leak: ${neg.filter(_._4 > tau).take(3).toSeq}")
    // bounded and densely re-ranked per doc
    neg.groupBy(_._1).foreach { case (id, rows) =>
      assert(rows.length <= 2)
      assert(rows.map(_._2).sorted.toSeq == (1 to rows.length), s"ranks must renumber for $id")
    }
    // negatives are exactly the knn survivors: subset of the knn list,
    // and no surviving knn neighbor outranks a chosen negative
    val knn = Similarity.knnJoinLsh(e, "vec_id", "embedding", k = 8)
      .collect().map(r => (r.getLong(0), r.getLong(2), r.getDouble(3)))
    val knnSet = knn.map(t => (t._1, t._2)).toSet
    assert(neg.forall(t => knnSet.contains((t._1, t._3))))
    val bestSurvivor = knn.filter(_._3 <= tau).groupBy(_._1).view.mapValues(_.map(_._3).max).toMap
    neg.filter(_._2 == 1).foreach { case (id, _, _, score) =>
      assert(score == bestSurvivor(id), s"doc $id rank-1 negative must be its best non-dup neighbor")
    }
  }

  test("mmr rerank trades relevance for diversity; lambda=1 reduces to plain top-k") {
    // q=(1,0,..); c1 highly relevant, c2 a near-dup of c1, c3 diverse
    // but less relevant: plain top-2 = {c1,c2}, MMR top-2 = {c1,c3}
    val vs = Seq(
      (10L, Array(1.0f, 0.0f, 0.0f, 0.0f)),   // query
      (1L, Array(0.99f, 0.1f, 0.0f, 0.0f)),   // c1: rel ~.995
      (2L, Array(0.98f, 0.11f, 0.0f, 0.0f)),  // c2: near-dup of c1
      (3L, Array(0.6f, 0.0f, 0.8f, 0.0f))     // c3: diverse, rel .6
    ).toDF("vec_id", "embedding")
    val cand = Similarity.bruteForceTopK(vs, vs.filter($"vec_id" === 10L), "vec_id", "embedding", k = 3)
    def ids(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getInt(1), r.getLong(2))).toSeq
    val diverse = ids(Similarity.mmrRerank(cand, vs, "vec_id", "embedding", selectK = 2, lambda = 0.5))
    assert(diverse.map(_._2) == Seq(1L, 3L), s"expected diverse pick, got $diverse")
    val plain = ids(Similarity.mmrRerank(cand, vs, "vec_id", "embedding", selectK = 2, lambda = 1.0))
    assert(plain.map(_._2) == Seq(1L, 2L), s"lambda=1 must follow relevance, got $plain")
    // partitioning-independent (canonicalized candidate multiset)
    val again = ids(Similarity.mmrRerank(cand.repartition(5), vs, "vec_id", "embedding", selectK = 2, lambda = 0.5))
    assert(again == diverse)
  }

  test("pq training never increases quantization error and is deterministic") {
    val e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val seed = Similarity.pqTrain(e, "vec_id", "embedding", dim = 64, m = 8, k = 16)
    val trained = Similarity.pqTrain(e, "vec_id", "embedding", dim = 64, m = 8, k = 16, iters = 2)
    val e0 = Similarity.pqQuantError(e, "vec_id", "embedding", seed, dim = 64, m = 8)
    val e2 = Similarity.pqQuantError(e, "vec_id", "embedding", trained, dim = 64, m = 8)
    assert(e2 <= e0 + 1e-5, s"Lloyd raised pq quantization error: $e0 -> $e2")
    // bit-stable training (decimal means): identical codebooks run-to-run
    val again = Similarity.pqTrain(e, "vec_id", "embedding", dim = 64, m = 8, k = 16, iters = 2)
    def flat(df: org.apache.spark.sql.DataFrame) =
      df.orderBy("subspace", "code").collect()
        .map(r => (r.getInt(0), r.getInt(1), r.getSeq[Double](2).toSeq)).toSeq
    assert(flat(again) == flat(trained))
  }

  test("bitsFor holds bucket occupancy as the corpus scales (linear candidate volume)") {
    import Similarity.bitsFor
    // occupancy n/2^bits never exceeds the target (within the cap)
    for (n <- Seq(1L, 100L, 10000L, 1000000L, 100000000L, 10000000000L)) {
      val b = bitsFor(n, targetPerBucket = 10000L)
      assert(b >= 1 && b <= 30)
      if (b < 30) assert(n.toDouble / math.pow(2, b) <= 10000.0, s"n=$n bits=$b")
    }
    // 10x the corpus adds the ~log2(10)≈3.3 bits that keep occupancy
    // flat — the invariant the fixed-bits scale smoke violated
    assert(bitsFor(10000000L) - bitsFor(1000000L) == 3) // ceil(log2 1000)-ceil(log2 100)
    // doc example: n=1e9 at 1e4/bucket needs ~17 bits
    assert(bitsFor(1000000000L) == 17)
    // tiny corpora floor at 1 bit; huge ones cap at 30
    assert(bitsFor(5L) == 1 && bitsFor(Long.MaxValue / 2) == 30)
  }
}
