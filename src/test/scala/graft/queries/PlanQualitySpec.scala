package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec

/** Physical-plan assertions for the corpus — the plans SCALE.md claims
  * are the plans Catalyst actually produces. Each failure here is a
  * scale regression even when results stay correct. */
class PlanQualitySpec extends SparkSpec {

  private def run(name: String): DataFrame =
    Corpus.all.find(_.name == name).get.run(spark, sf("sf0.001"))

  /** Execute (to let AQE finalize) and return the full final plan string. */
  private def finalPlan(df: DataFrame): String = {
    df.count()
    df.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan.toString
      case p: SparkPlan => p.toString
    }
  }

  test("q01: ship-date filter is pushed to the parquet scan") {
    val plan = run("q01_pricing_summary").queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate"))
  }

  test("q01: scan reads only the columns the query touches") {
    val plan = run("q01_pricing_summary").queryExecution.executedPlan.toString
    val readSchema = plan.linesIterator.mkString
    assert(readSchema.contains("l_quantity") && readSchema.contains("l_discount"))
    assert(!readSchema.contains("l_comment") && !readSchema.contains("l_shipmode"))
  }

  test("q10: dim-chain join broadcasts both dims (no shuffle of customer)") {
    val plan = finalPlan(run("q10_join_dims_broadcast"))
    assert("BroadcastHashJoin".r.findAllIn(plan).length == 2)
    assert(!plan.contains("SortMergeJoin"))
  }

  test("q21: global top-k plans as TakeOrderedAndProject, not a full sort") {
    val plan = finalPlan(run("q21_topk_global"))
    assert(plan.contains("TakeOrderedAndProject"))
  }

  test("q44: as-of join plans with NO join operator at all (union+window)") {
    val plan = finalPlan(run("q44_asof_join"))
    assert(!plan.contains("Join"), s"as-of must be join-free:\n$plan")
    assert(plan.contains("Window"))
  }

  test("q45: range join is a hash join on buckets, never nested-loop") {
    val plan = finalPlan(run("q45_range_join"))
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"))
  }

  test("q32: LSH banding never goes quadratic (hash/merge join on buckets)") {
    val plan = finalPlan(run("q32_lsh_candidate_pairs"))
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"))
  }

  test("q40: embedding near-dup pairs join on LSH buckets, never nested-loop") {
    val plan = finalPlan(run("q40_embedding_near_dups"))
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"),
      s"near-dup pairs must be bucket-keyed:\n$plan")
  }

  test("q47: IVF candidate join is keyed on cell, centroids broadcast") {
    val plan = finalPlan(run("q47_ann_ivf"))
    assert(!plan.contains("CartesianProduct"))
    assert(plan.contains("BroadcastHashJoin") || plan.contains("SortMergeJoin")
      || plan.contains("ShuffledHashJoin"))
  }

  test("q60: correlated EXISTS decorrelates to semi/anti joins (no per-row subquery)") {
    val plan = finalPlan(run("q60_exists_correlated"))
    assert(!plan.contains("CartesianProduct"), s"EXISTS must decorrelate:\n$plan")
    assert(plan.contains("LeftSemi") || plan.contains("ExistenceJoin"))
    assert(plan.contains("LeftAnti"))
  }

  test("q67: tf-idf joins broadcast the small df/N sides, fact side unshuffled by joins") {
    val plan = finalPlan(run("q67_tfidf"))
    assert(plan.contains("BroadcastHashJoin"), s"dfreq join must broadcast:\n$plan")
    assert(!plan.contains("CartesianProduct"))
  }

  test("q62: RANGE frame runs as a single Window pass, no self-join") {
    val plan = finalPlan(run("q62_window_range_frame"))
    assert(plan.contains("Window"))
    assert(!plan.contains("Join"), s"range frame must not plan a join:\n$plan")
  }

  test("q71: clustering iterations never go quadratic") {
    val plan = finalPlan(run("q71_neardup_clusters"))
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"))
  }

  test("q56: generator plans as Generate over the pruned scan") {
    val plan = finalPlan(run("q56_explode_lateral"))
    assert(plan.contains("Generate"))
    assert(!plan.linesIterator.mkString.contains("n_chars"), "unused columns must be pruned")
  }

  test("q64: hash split is a pure projection before the aggregate (no pre-shuffle)") {
    val plan = finalPlan(run("q64_hash_split"))
    // exactly the agg exchange (+ AQE reads); no repartition/sort beyond it
    assert("Exchange hashpartitioning".r.findAllIn(plan).length <= 1)
  }

  test("q74: decontamination probe broadcasts the benchmark side") {
    val plan = finalPlan(run("q74_decontamination"))
    assert(plan.contains("BroadcastHashJoin"), s"benchmark side must broadcast:\n$plan")
    assert(!plan.contains("SortMergeJoin"))
  }

  test("q75: salted join is a hash/merge join on (key, salt) — never nested-loop") {
    val plan = finalPlan(run("q75_salted_join"))
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"))
  }

  test("q73: multi-probe only fans out the query side (corpus side unchanged)") {
    val plan = finalPlan(run("q73_ann_multiprobe"))
    // exactly one Generate (the query-side probe explode) — the corpus
    // side must not explode
    assert("Generate".r.findAllIn(plan).length == 1, s"corpus side must not fan out:\n$plan")
  }

  test("q77: the naive BETWEEN join is auto-rewritten (no BNLJ in the plan)") {
    val plan = finalPlan(run("q77_auto_range_join"))
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"),
      s"RangeJoinRewrite must fire:\n$plan")
  }

  test("q81: the curate recipe fuses into semi-join + agg, never a cross product") {
    val plan = finalPlan(run("q81_curate_recipe"))
    assert(plan.contains("LeftSemi"), s"dedup must be a semi-join:\n$plan")
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"))
  }

  test("q86: hot-bucket cap plans a broadcast ANTI join (hot set is tiny by definition)") {
    val plan = finalPlan(run("q86_lsh_capped_pairs"))
    assert(plan.contains("LeftAnti"), s"cap must be an anti-join:\n$plan")
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"))
  }

  test("q88: incremental dedup anti-joins the index on the signature (no BNLJ)") {
    val plan = finalPlan(run("q88_incremental_dedup"))
    assert(plan.contains("LeftAnti"), s"index probe must be an anti-join:\n$plan")
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"))
  }

  test("q89: bloom prune sits scan-side, before the exact join") {
    val plan = finalPlan(run("q89_decontamination_bloom"))
    assert(plan.contains("might_contain"), s"bloom prune must be in the plan:\n$plan")
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"))
  }

  test("q90: decontaminated recipe plans semi (dedup) + anti (contamination), no cross product") {
    val plan = finalPlan(run("q90_curate_decontaminated"))
    assert(plan.contains("LeftSemi"), s"dedup must be a semi-join:\n$plan")
    assert(plan.contains("LeftAnti"), s"decontamination must be an anti-join:\n$plan")
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"))
  }

  test("q91: unigram scoring broadcasts the logprob table (fact stream unshuffled by the join)") {
    val plan = finalPlan(run("q91_unigram_logloss"))
    assert(plan.contains("BroadcastHashJoin"), s"logprob join must broadcast:\n$plan")
    assert(!plan.contains("SortMergeJoin") && !plan.contains("CartesianProduct"))
  }

  test("q96: PQ ADC serving broadcasts the query tables; codes side never shuffled by a join") {
    val plan = finalPlan(run("q96_pq_adc"))
    // the corpus-side scan joins only against broadcast relations
    // (codebooks for encode, per-query tables for scoring): the single
    // hash exchange allowed is pqEncode's groupBy(vector) — scoring
    // itself must add no shuffle before the top-k window
    assert(plan.contains("BroadcastNestedLoopJoin") || plan.contains("BroadcastHashJoin"),
      s"query tables must broadcast:\n$plan")
    assert(!plan.contains("SortMergeJoin"), s"no shuffle join on the codes side:\n$plan")
    assert(!plan.contains("CartesianProduct"))
  }

  test("q97: IVF-PQ cell-probe join broadcasts; no cartesian anywhere") {
    val plan = finalPlan(run("q97_ivf_pq_adc"))
    // the scoring join (codes x probed cells) must be a broadcast hash
    // join on cell_id; codes⋈assignment may sort-merge but reuses the
    // two aggregations' exchanges (no extra shuffle of the corpus)
    assert(plan.contains("BroadcastHashJoin"), s"cell-probe join must broadcast:\n$plan")
    assert(!plan.contains("CartesianProduct"))
  }

  test("q103: heavy hitters is one partial-agg pair — shuffle carries sketches, not values") {
    val plan = finalPlan(run("q103_heavy_hitters"))
    // two-phase hash aggregation of the sketch (partial -> final):
    // exactly one exchange pair for the agg, never a raw-token shuffle
    assert(plan.contains("approx_top_k"), s"sketch agg missing:\n$plan")
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"))
    // re-ranking runs on the exploded sketch (<= fetch rows), so the
    // single-partition window after the agg is bounded, not data-sized
    assert("Exchange hashpartitioning".r.findAllIn(plan).isEmpty ||
      "Exchange".r.findAllIn(plan).length <= 3, s"too many exchanges:\n$plan")
  }

  test("q105: BM25 prunes to query terms pre-shuffle and broadcasts the idf side") {
    val plan = finalPlan(run("q105_bm25"))
    // the one nested-loop is the 1-row corpus-stats broadcast (the
    // scalar-aggregate cross join every stats-consuming query plans);
    // anything beyond it would be a genuine all-pairs regression
    assert(!plan.contains("CartesianProduct"))
    assert("BroadcastNestedLoopJoin".r.findAllIn(plan).length <= 1, s"unexpected NLJ:\n$plan")
    // idf side is a broadcast hash join; the only shuffled relations
    // are the query-term-filtered tf rows and per-doc lengths
    assert(plan.contains("BroadcastHashJoin"), s"idf join must broadcast:\n$plan")
    // the query-term membership filter exists as a codegen'd INSET over
    // the exploded tokens (pre-agg, so non-matching tokens never shuffle)
    assert(plan.contains("INSET") || plan.contains("IN ("),
      s"query-term filter missing:\n$plan")
  }

  test("q106: sorted-neighborhood is ONE window pass, no join at all") {
    val plan = finalPlan(run("q106_sorted_neighbor_pairs"))
    // all `window` leads come from a single Window operator over the
    // block partitioning — the whole candidate generation is join-free
    assert("Window".r.findAllIn(plan).length == 1, s"must be one window pass:\n$plan")
    assert(!plan.contains("Join"), s"sorted-neighborhood must be join-free:\n$plan")
  }

  test("q110: weighted sample is a projection + TakeOrderedAndProject, never a global sort") {
    val plan = finalPlan(run("q110_weighted_sample"))
    // the A-ES key is scan-local; the k smallest keys come from
    // per-partition heaps
    assert(plan.contains("TakeOrderedAndProject"), s"expected top-k plan:\n$plan")
    assert(!plan.contains("Join"))
  }

  test("q112: semantic dedup pairs join keyed on the cell, centroids broadcast, no cartesian") {
    val plan = finalPlan(run("q112_semantic_dedup"))
    // assignment: centroids broadcast against the corpus scan (the one
    // BNLJ, 16 rows); pairs: an equi-join on cell_id — never all-pairs
    assert(!plan.contains("CartesianProduct"), s"no cartesian allowed:\n$plan")
    assert("BroadcastNestedLoopJoin".r.findAllIn(plan).length <= 1,
      s"only the centroid broadcast may be nested-loop:\n$plan")
    assert(plan.contains("SortMergeJoin") || plan.contains("ShuffledHashJoin") ||
      plan.contains("BroadcastHashJoin"), s"cell pair join must be keyed:\n$plan")
  }

  test("q115: per-group cap is one window pass with a PARTIAL group-limit before the shuffle") {
    val plan = finalPlan(run("q115_per_group_cap"))
    assert("Window \\[".r.findAllIn(plan).length == 1, s"must be one window pass:\n$plan")
    assert(!plan.contains("Join"), s"cap must be join-free:\n$plan")
    // Spark 4 pushes the rank limit below the exchange (WindowGroupLimit
    // Partial): each map task ships at most n rows per group, so the
    // window shuffle is bounded by groups x n x tasks, not |input| —
    // the property that makes the cap safe on a skewed 100 TB corpus
    assert(plan.contains("WindowGroupLimit") && plan.contains("Partial"),
      s"partial group-limit must precede the shuffle:\n$plan")
  }

  test("q117: knn join is bucket-keyed with a partial group-limit; never nested-loop") {
    val plan = finalPlan(run("q117_knn_join"))
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"),
      s"knn join must never go all-pairs:\n$plan")
    // per-doc top-k: the rank filter runs partially below the window exchange
    assert(plan.contains("WindowGroupLimit"), s"expected group-limit pushdown:\n$plan")
  }

  test("q120: the six-stage curation chain fuses without a cartesian; one centroid broadcast only") {
    val plan = finalPlan(run("q120_curate_embeddings"))
    assert(!plan.contains("CartesianProduct"), s"no cartesian in the recipe:\n$plan")
    // the only nested-loop is the 16-row centroid broadcast of the
    // semantic stage; quality/dedup/caps/split stay keyed or scan-local
    assert("BroadcastNestedLoopJoin".r.findAllIn(plan).length <= 1,
      s"only the centroid broadcast may be nested-loop:\n$plan")
    // the cap stage's partial group-limit survives composition
    assert(plan.contains("WindowGroupLimit"), s"cap stage must keep its group-limit:\n$plan")
  }

  test("q121: overlap join is a hash/merge join on (key, cell) — never nested-loop") {
    val plan = finalPlan(run("q121_overlap_join"))
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"),
      s"interval overlap must stay keyed:\n$plan")
    assert(plan.contains("SortMergeJoin") || plan.contains("ShuffledHashJoin") ||
      plan.contains("BroadcastHashJoin"), s"expected a keyed join:\n$plan")
  }

  test("conformance compiles to a single Project over the scan") {
    import graft.core.{Conform, ColumnSpec}
    val df = Corpus.fixture(spark, sf("sf0.001"), "part")
    val spec = Seq(ColumnSpec("p_partkey", "long", 0), ColumnSpec("p_name", "string", 1),
      ColumnSpec("p_missing", "double", 2))
    val plan = Conform(df, spec).queryExecution.executedPlan.toString
    assert("Project".r.findAllIn(plan).length <= 1)
  }

  test("graft_table_changes plans a keyed join over two version-pinned scans — no BNLJ, no driver rows") {
    val cat = "pq" + java.util.UUID.randomUUID().toString.replace("-", "").take(10)
    val root = java.nio.file.Files.createTempDirectory(s"graft-plan-$cat").toString
    spark.conf.set(s"spark.sql.catalog.$cat", classOf[graft.catalog.SnapshotCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$cat.root", root)
    spark.sql(s"CREATE NAMESPACE $cat.dw")
    spark.sql(s"CREATE TABLE $cat.dw.t AS SELECT id AS k, id * 2 AS v FROM range(1000)")
    spark.sql(s"UPDATE $cat.dw.t SET v = v + 1 WHERE k < 10")
    val df = spark.sql(s"SELECT * FROM graft_table_changes('$cat.dw.t', 1, 2, 'k')")
    val plan = finalPlan(df)
    // the keyed diff is a distributed full-outer join of the two
    // version snapshots — never a nested-loop and never a local scan
    // of collected rows
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"), plan)
    assert(plan.contains("FullOuter"), plan)
    assert("Scan parquet".r.findAllIn(plan).length == 2, plan)
  }

  test("SHOW PROCEDURES lists the catalog's maintenance surface") {
    val cat = "ps" + java.util.UUID.randomUUID().toString.replace("-", "").take(10)
    val root = java.nio.file.Files.createTempDirectory(s"graft-plan-$cat").toString
    spark.conf.set(s"spark.sql.catalog.$cat", classOf[graft.catalog.SnapshotCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$cat.root", root)
    val out = spark.sql(s"SHOW PROCEDURES IN $cat.system")
    val nameCol = out.columns.indexWhere(_.contains("procedure"))
    val names = out.collect().map(_.getString(nameCol)).toSet
    assert(names == Set("rollback", "create_branch", "drop_branch", "create_tag", "drop_tag", "fast_forward",
      "optimize", "compact_deltas", "evolve_partitioning", "expire_snapshots",
      "remove_orphan_files", "expire_log", "publish_branches", "export_iceberg_metadata",
      // the FOREIGN-Iceberg-by-path surface (bridge evolution/
      // maintenance/append + r16's row-level DML and branches)
      "iceberg_rename_column", "iceberg_add_column", "iceberg_drop_column",
      "iceberg_promote_column", "iceberg_compact", "iceberg_expire_snapshots",
      "iceberg_append", "iceberg_delete_where", "iceberg_update", "iceberg_upsert",
      "iceberg_create_branch", "iceberg_fast_forward"))
  }
}
