package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** One corpus entry: a Spark-first implementation plus (when the
  * semantics are ANSI-SQL-expressible) a DuckDB oracle over the same
  * parquet tables. Column names/types are aligned between the two so
  * the driver's sorted-column value hash matches.
  */
final case class Q(
    name: String,
    run: (SparkSession, String) => DataFrame,
    oracle: Option[String],
    headline: Boolean = false
)

/** The operator-inventory correctness corpus (SURVEY.md §2 + BASELINE
  * extensions). Cross-engine determinism conventions:
  *
  *  - money/measure sums go through DECIMAL(18,2|4) element casts so both
  *    engines sum exactly (double summation is order-dependent); final
  *    values are cast back to DOUBLE
  *  - averages are exact decimal sums divided as doubles, rounded
  *  - every query ends in a total-order ORDER BY; DuckDB oracles spell
  *    NULLS FIRST explicitly (Spark ASC default is NULLS FIRST, DuckDB's
  *    is NULLS LAST)
  *  - integer-typed results are aligned (DuckDB `row_number`/`year`/
  *    `length` return BIGINT where Spark returns INT)
  */
object Corpus {

  private val dec2 = DecimalType(18, 2)
  private val dec4 = DecimalType(18, 4)
  private def d2(c: Column): Column = c.cast(dec2)

  /** Relation cache for the read-only fixture tables (r20 optimization,
    * guide §1/§6): every `fixture` call built a fresh relation —
    * re-listing the path and re-reading a parquet footer for schema
    * inference (~10-30 ms of driver IO) — for inputs that never change
    * during a JVM's lifetime. Entries are (modTime,len)-guarded per
    * (session, path) so a rewritten replica (ScaleSmoke staging) or a
    * different session can never see a stale or foreign plan. This
    * caches the RELATION (file list + schema), never data or results:
    * every query execution still scans the parquet in full. */
  private val fixtureCacheMax = 64
  private val fixtureCache =
    new java.util.LinkedHashMap[String, (Long, Long, DataFrame)](16, 0.75f, true) {
      override def removeEldestEntry(
          e: java.util.Map.Entry[String, (Long, Long, DataFrame)]): Boolean =
        size() > fixtureCacheMax
    }

  def fixture(spark: SparkSession, dir: String, name: String): DataFrame = {
    val p = new org.apache.hadoop.fs.Path(s"$dir/$name.parquet")
    val st =
      try p.getFileSystem(spark.sparkContext.hadoopConfiguration).getFileStatus(p)
      catch { case _: java.io.FileNotFoundException => null }
    val key = s"${System.identityHashCode(spark)}|$dir/$name.parquet"
    if (st != null) {
      val hit = fixtureCache.synchronized { Option(fixtureCache.get(key)) }
      hit match {
        case Some((m, l, df)) if m == st.getModificationTime && l == st.getLen => return df
        case _ => ()
      }
    }
    val df = fixtureUncached(spark, dir, name)
    if (st != null) fixtureCache.synchronized {
      fixtureCache.put(key, (st.getModificationTime, st.getLen, df))
    }
    df
  }

  private def fixtureUncached(spark: SparkSession, dir: String, name: String): DataFrame =
    if (name == "events") {
      // events.ts has shipped in two fixture vintages: INT64
      // TIMESTAMP(NANOS) (Spark only reads it via the nanosAsLong
      // legacy conf, yielding LongType) and TIMESTAMP_MICROS with
      // isAdjustedToUTC=0 (Spark reads TIMESTAMP_NTZ). Branch on the
      // loaded dtype so either vintage lands as session-TZ
      // TimestampType: the session runs UTC, so wall-clock values —
      // and the DuckDB oracle's CAST(ts AS TIMESTAMP) — agree under
      // both. NTZ must NOT pass through untouched: downstream queries
      // compare ts against TimestampType literals and window bounds,
      // which throws DATATYPE_MISMATCH on NTZ.
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      val raw = spark.read.parquet(s"$dir/$name.parquet")
      raw.schema("ts").dataType match {
        case org.apache.spark.sql.types.LongType =>
          // nanos vintage: floor to micros (DuckDB CAST truncates identically)
          raw.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
        case org.apache.spark.sql.types.TimestampType => raw
        case _ => raw.withColumn("ts", col("ts").cast("timestamp"))
      }
    } else if (name == "documents" || name == "embeddings") {
      // These fixtures are tiny single-row-group files ⇒ Spark scans
      // each as ONE split, serializing the CPU-heavy text pipelines
      // (minhash, simhash, lang-id) and pairwise similarity scans onto
      // one core. Real corpora arrive in thousands of splits; spreading
      // the ~1 MB here restores the parallelism the operators are
      // designed for.
      val s2 = spark.read.parquet(s"$dir/$name.parquet")
      s2.repartition(spark.sparkContext.defaultParallelism)
    } else spark.read.parquet(s"$dir/$name.parquet")

  /** Register the standard tables as temp views for SQL-text queries. */
  def withViews(spark: SparkSession, dir: String, names: String*)(sqlText: String): DataFrame = {
    names.foreach(n => fixture(spark, dir, n).createOrReplaceTempView(n))
    spark.sql(sqlText)
  }

  // ---------------------------------------------------------------- 2.c aggregations

  /** TPC-H Q1-shaped pricing summary — partial+final HashAggregate over a
    * pushed-down timestamp filter (the reference's gold agg pattern,
    * job_gold.py:71-88, widened to many aggregates). */
  private val q01 = Q(
    "q01_pricing_summary",
    (s, dir) => {
      val li = fixture(s, dir, "lineitem").filter(col("l_shipdate") <= lit("2001-09-02").cast("timestamp"))
      li.groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          sum(d2(col("l_quantity"))).cast("double").as("sum_qty"),
          sum(d2(col("l_extendedprice"))).cast("double").as("sum_base_price"),
          sum((d2(col("l_extendedprice")) * d2(lit(1.0) - col("l_discount"))).cast(dec4)).cast("double").as("sum_disc_price"),
          sum(((d2(col("l_extendedprice")) * d2(lit(1.0) - col("l_discount"))).cast(dec4) * d2(lit(1.0) + col("l_tax"))).cast(DecimalType(18, 6))).cast("double").as("sum_charge"),
          round(sum(d2(col("l_quantity"))).cast("double") / count(lit(1)), 6).as("avg_qty"),
          round(sum(d2(col("l_extendedprice"))).cast("double") / count(lit(1)), 6).as("avg_price"),
          round(sum(d2(col("l_discount"))).cast("double") / count(lit(1)), 6).as("avg_disc"),
          count(lit(1)).as("count_order")
        )
        .orderBy(col("l_returnflag"), col("l_linestatus"))
    },
    Some("""SELECT l_returnflag, l_linestatus,
      CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
      CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
      CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(1.0-l_discount AS DECIMAL(18,2)) AS DECIMAL(18,4))) AS DOUBLE) AS sum_disc_price,
      CAST(SUM(CAST(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(1.0-l_discount AS DECIMAL(18,2)) AS DECIMAL(18,4)) * CAST(1.0+l_tax AS DECIMAL(18,2)) AS DECIMAL(18,6))) AS DOUBLE) AS sum_charge,
      ROUND(CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE)/COUNT(*), 6) AS avg_qty,
      ROUND(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)/COUNT(*), 6) AS avg_price,
      ROUND(CAST(SUM(CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE)/COUNT(*), 6) AS avg_disc,
      COUNT(*) AS count_order
      FROM lineitem WHERE l_shipdate <= TIMESTAMP '2001-09-02'
      GROUP BY l_returnflag, l_linestatus
      ORDER BY l_returnflag, l_linestatus"""),
    headline = true
  )

  /** Gold-parity grouped count via SQL text with ordinal GROUP BY/ORDER BY
    * (reference: job_gold.py:71-88). */
  private val q02 = Q(
    "q02_grouped_count_ordinal",
    (s, dir) =>
      withViews(s, dir, "orders")(
        """SELECT CAST(o_orderdate AS DATE) AS od, o_orderstatus, count(*) AS qtd
          |FROM orders GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin
      ),
    Some("""SELECT CAST(o_orderdate AS DATE) AS od, o_orderstatus, count(*) AS qtd
      FROM orders GROUP BY 1, 2 ORDER BY 1, 2""")
  )

  private val q03 = Q(
    "q03_distinct_agg",
    (s, dir) =>
      fixture(s, dir, "lineitem")
        .groupBy(col("l_returnflag"))
        .agg(
          countDistinct(col("l_suppkey")).as("n_supp"),
          countDistinct(col("l_partkey")).as("n_part"),
          count(lit(1)).as("n")
        )
        .orderBy(col("l_returnflag")),
    Some("""SELECT l_returnflag, COUNT(DISTINCT l_suppkey) AS n_supp,
      COUNT(DISTINCT l_partkey) AS n_part, COUNT(*) AS n
      FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""")
  )

  private val q04 = Q(
    "q04_rollup",
    (s, dir) =>
      fixture(s, dir, "lineitem")
        .rollup(col("l_returnflag"), col("l_linestatus"))
        .agg(count(lit(1)).as("n"), sum(d2(col("l_quantity"))).cast("double").as("sum_qty"))
        .orderBy(col("l_returnflag").asc_nulls_first, col("l_linestatus").asc_nulls_first),
    Some("""SELECT l_returnflag, l_linestatus, COUNT(*) AS n,
      CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
      FROM lineitem GROUP BY ROLLUP(l_returnflag, l_linestatus)
      ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""")
  )

  private val q05 = Q(
    "q05_cube",
    (s, dir) =>
      fixture(s, dir, "orders")
        .cube(col("o_orderstatus"), col("o_orderpriority"))
        .agg(count(lit(1)).as("n"))
        .orderBy(col("o_orderstatus").asc_nulls_first, col("o_orderpriority").asc_nulls_first),
    Some("""SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n
      FROM orders GROUP BY CUBE(o_orderstatus, o_orderpriority)
      ORDER BY o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST""")
  )

  private val q06 = Q(
    "q06_grouping_sets",
    (s, dir) =>
      withViews(s, dir, "lineitem")(
        """SELECT l_returnflag, l_linestatus, count(*) AS n
          |FROM lineitem
          |GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
          |ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""".stripMargin
      ),
    Some("""SELECT l_returnflag, l_linestatus, count(*) AS n
      FROM lineitem GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
      ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""")
  )

  private val q07 = Q(
    "q07_stats",
    (s, dir) =>
      fixture(s, dir, "lineitem")
        .groupBy(col("l_returnflag"))
        .agg(
          min(col("l_quantity")).as("min_qty"),
          max(col("l_quantity")).as("max_qty"),
          round(sum(d2(col("l_quantity"))).cast("double") / count(lit(1)), 6).as("avg_qty"),
          round(stddev_samp(col("l_quantity")), 6).as("sd_qty"),
          round(var_samp(col("l_quantity")), 6).as("var_qty")
        )
        .orderBy(col("l_returnflag")),
    Some("""SELECT l_returnflag, MIN(l_quantity) AS min_qty, MAX(l_quantity) AS max_qty,
      ROUND(CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE)/COUNT(*), 6) AS avg_qty,
      ROUND(STDDEV_SAMP(l_quantity), 6) AS sd_qty,
      ROUND(VAR_SAMP(l_quantity), 6) AS var_qty
      FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""")
  )

  /** Exact interpolated percentiles (Spark `percentile` = DuckDB
    * `quantile_cont`). The approximate path (`approx_percentile`,
    * `approx_count_distinct`) is exercised rows-only in q08b. */
  private val q08 = Q(
    "q08_percentiles",
    (s, dir) =>
      fixture(s, dir, "lineitem")
        .groupBy(col("l_returnflag"))
        .agg(
          expr("percentile(l_quantity, 0.25)").as("p25"),
          expr("percentile(l_quantity, 0.5)").as("p50"),
          expr("percentile(l_quantity, 0.75)").as("p75")
        )
        .orderBy(col("l_returnflag")),
    Some("""SELECT l_returnflag, QUANTILE_CONT(l_quantity, 0.25) AS p25,
      QUANTILE_CONT(l_quantity, 0.5) AS p50, QUANTILE_CONT(l_quantity, 0.75) AS p75
      FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""")
  )

  /** Sketch aggregates (HLL distinct + approximate percentile),
    * oracle-pinned: the estimates are deterministic given the fixture
    * (HLL++ and approx_percentile are hash/rank algorithms, no RNG),
    * so the oracle pins them as literal expected values and derives
    * the within-5%-of-exact audit booleans from the DATA-computed
    * exact answers — the sketch error bound is checked cross-engine,
    * not assumed. The exact columns ride along so most of the row is
    * data-derived rather than pinned. */
  private val q08b = Q(
    "q08b_approx_sketches",
    (s, dir) =>
      fixture(s, dir, "lineitem")
        .groupBy(col("l_returnflag"))
        .agg(
          approx_count_distinct(col("l_partkey")).as("approx_parts"),
          countDistinct(col("l_partkey")).as("exact_parts"),
          expr("approx_percentile(l_quantity, 0.5, 1000)").cast("double").as("approx_p50"),
          expr("percentile(l_quantity, 0.5)").as("exact_p50")
        )
        .select(
          col("l_returnflag"), col("approx_parts"), col("exact_parts"),
          (abs(col("approx_parts") - col("exact_parts")).cast("double")
            <= lit(0.05) * col("exact_parts")).as("ndv_ok"),
          col("approx_p50"), col("exact_p50"),
          (abs(col("approx_p50") - col("exact_p50"))
            <= lit(0.05) * col("exact_p50")).as("p50_ok")
        )
        .orderBy(col("l_returnflag")),
    Some("""WITH a(l_returnflag, approx_parts, approx_p50) AS (
        VALUES ('A', CAST(1947 AS BIGINT), 25.0),
               ('N', CAST(1947 AS BIGINT), 26.0),
               ('R', CAST(1947 AS BIGINT), 25.0)),
      e AS (SELECT l_returnflag, COUNT(DISTINCT l_partkey) AS exact_parts,
              QUANTILE_CONT(l_quantity, 0.5) AS exact_p50
            FROM lineitem GROUP BY 1)
      SELECT e.l_returnflag, a.approx_parts, e.exact_parts,
        abs(CAST(a.approx_parts AS DOUBLE) - e.exact_parts) <= 0.05 * e.exact_parts AS ndv_ok,
        a.approx_p50, e.exact_p50,
        abs(a.approx_p50 - e.exact_p50) <= 0.05 * e.exact_p50 AS p50_ok
      FROM e JOIN a USING (l_returnflag) ORDER BY e.l_returnflag""")
  )

  private val q09 = Q(
    "q09_count_scalar",
    (s, dir) => fixture(s, dir, "lineitem").agg(count(lit(1)).as("n")),
    Some("SELECT COUNT(*) AS n FROM lineitem")
  )

  // ---------------------------------------------------------------- 2.d joins

  /** Dim-chain join: both dims are broadcast (no shuffle of customer). */
  private val q10 = Q(
    "q10_join_dims_broadcast",
    (s, dir) => {
      val c = fixture(s, dir, "customer")
      val n = fixture(s, dir, "nation")
      val r = fixture(s, dir, "region")
      c.join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
        .join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
        .groupBy(col("r_name"), col("n_name"))
        .agg(count(lit(1)).as("n_cust"), sum(d2(col("c_acctbal"))).cast("double").as("sum_bal"))
        .orderBy(col("r_name"), col("n_name"))
    },
    Some("""SELECT r_name, n_name, COUNT(*) AS n_cust,
      CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS sum_bal
      FROM customer JOIN nation ON c_nationkey = n_nationkey
      JOIN region ON n_regionkey = r_regionkey
      GROUP BY r_name, n_name ORDER BY r_name, n_name"""),
    headline = true
  )

  private val q11 = Q(
    "q11_join_fact",
    (s, dir) => {
      val o = fixture(s, dir, "orders")
      val c = fixture(s, dir, "customer")
      o.join(c, o("o_custkey") === c("c_custkey"))
        .groupBy(col("c_mktsegment"))
        .agg(count(lit(1)).as("n_orders"), sum(d2(col("o_totalprice"))).cast("double").as("total"))
        .orderBy(col("c_mktsegment"))
    },
    Some("""SELECT c_mktsegment, COUNT(*) AS n_orders,
      CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
      FROM orders JOIN customer ON o_custkey = c_custkey
      GROUP BY c_mktsegment ORDER BY c_mktsegment""")
  )

  /** Fact-fact-dim revenue rollup: lineitem⋈orders shuffle join on the
    * fact key, dims broadcast — the shape that must survive 100×. */
  private val q12 = Q(
    "q12_join_revenue",
    (s, dir) => {
      val li = fixture(s, dir, "lineitem")
      val o = fixture(s, dir, "orders")
      val c = fixture(s, dir, "customer")
      val n = fixture(s, dir, "nation")
      li.join(o, li("l_orderkey") === o("o_orderkey"))
        .join(c, o("o_custkey") === c("c_custkey"))
        .join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
        .groupBy(col("n_name"))
        .agg(
          sum((d2(col("l_extendedprice")) * d2(lit(1.0) - col("l_discount"))).cast(dec4)).cast("double").as("revenue"),
          count(lit(1)).as("n_items")
        )
        .orderBy(col("n_name"))
    },
    Some("""SELECT n_name,
      CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(1.0-l_discount AS DECIMAL(18,2)) AS DECIMAL(18,4))) AS DOUBLE) AS revenue,
      COUNT(*) AS n_items
      FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      JOIN customer ON o_custkey = c_custkey
      JOIN nation ON c_nationkey = n_nationkey
      GROUP BY n_name ORDER BY n_name"""),
    headline = true
  )

  private val q13 = Q(
    "q13_semi_join",
    (s, dir) => {
      val c = fixture(s, dir, "customer")
      val big = fixture(s, dir, "orders").filter(col("o_totalprice") > 400000)
      c.join(big, c("c_custkey") === big("o_custkey"), "left_semi")
        .select(col("c_custkey"), col("c_name"))
        .orderBy(col("c_custkey"))
    },
    Some("""SELECT c_custkey, c_name FROM customer c
      WHERE EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 400000)
      ORDER BY c_custkey""")
  )

  private val q14 = Q(
    "q14_anti_join",
    (s, dir) => {
      val c = fixture(s, dir, "customer")
      val big = fixture(s, dir, "orders").filter(col("o_totalprice") > 400000)
      c.join(big, c("c_custkey") === big("o_custkey"), "left_anti")
        .select(col("c_custkey"), col("c_name"))
        .orderBy(col("c_custkey"))
    },
    Some("""SELECT c_custkey, c_name FROM customer c
      WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 400000)
      ORDER BY c_custkey""")
  )

  private val q15 = Q(
    "q15_outer_join",
    (s, dir) => {
      val c = fixture(s, dir, "customer")
      val o = fixture(s, dir, "orders").filter(col("o_totalprice") > 300000)
      c.join(o, c("c_custkey") === o("o_custkey"), "left_outer")
        .groupBy(col("c_custkey"))
        .agg(
          count(col("o_orderkey")).as("n_big_orders"),
          coalesce(sum(d2(col("o_totalprice"))), lit(0).cast(dec2)).cast("double").as("big_spend")
        )
        .orderBy(col("c_custkey"))
    },
    Some("""SELECT c_custkey, COUNT(o_orderkey) AS n_big_orders,
      CAST(COALESCE(SUM(CAST(o_totalprice AS DECIMAL(18,2))), 0) AS DOUBLE) AS big_spend
      FROM customer LEFT JOIN (SELECT * FROM orders WHERE o_totalprice > 300000) o
      ON c_custkey = o_custkey
      GROUP BY c_custkey ORDER BY c_custkey""")
  )

  // ------------------------------------------------------- 2.e windows / sort / set ops

  private val q16 = Q(
    "q16_window_topn_per_key",
    (s, dir) => {
      val w = Window.partitionBy(col("o_custkey")).orderBy(col("o_totalprice").desc, col("o_orderkey"))
      fixture(s, dir, "orders")
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") <= 3)
        .select(col("o_custkey"), col("rn"), col("o_orderkey"), col("o_totalprice"))
        .orderBy(col("o_custkey"), col("rn"))
    },
    Some("""SELECT o_custkey, CAST(rn AS INTEGER) AS rn, o_orderkey, o_totalprice FROM (
      SELECT o_custkey, o_orderkey, o_totalprice,
        ROW_NUMBER() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS rn
      FROM orders) WHERE rn <= 3 ORDER BY o_custkey, rn""")
  )

  private val q17 = Q(
    "q17_window_running_sum",
    (s, dir) => {
      val w = Window
        .partitionBy(col("user_id"))
        .orderBy(col("ts"), col("event_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      fixture(s, dir, "events")
        .select(col("event_id"), col("user_id"), sum(d2(col("value"))).over(w).cast("double").as("running"))
        .orderBy(col("event_id"))
    },
    Some("""SELECT event_id, user_id,
      CAST(SUM(CAST(value AS DECIMAL(18,2))) OVER (PARTITION BY user_id ORDER BY CAST(ts AS TIMESTAMP), event_id
        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running
      FROM events ORDER BY event_id"""),
    headline = true
  )

  private val q18 = Q(
    "q18_window_lag_lead",
    (s, dir) => {
      val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      fixture(s, dir, "events")
        .select(
          col("event_id"),
          col("user_id"),
          col("value"),
          lag(col("value"), 1).over(w).as("prev_value"),
          lead(col("value"), 1).over(w).as("next_value")
        )
        .orderBy(col("event_id"))
    },
    Some("""SELECT event_id, user_id, value,
      LAG(value, 1) OVER w AS prev_value, LEAD(value, 1) OVER w AS next_value
      FROM events WINDOW w AS (PARTITION BY user_id ORDER BY CAST(ts AS TIMESTAMP), event_id)
      ORDER BY event_id""")
  )

  private val q19 = Q(
    "q19_window_moving_frame",
    (s, dir) => {
      val w = Window
        .partitionBy(col("user_id"))
        .orderBy(col("ts"), col("event_id"))
        .rowsBetween(-2, Window.currentRow)
      fixture(s, dir, "events")
        .select(
          col("event_id"),
          col("user_id"),
          sum(d2(col("value"))).over(w).cast("double").as("sum3"),
          count(lit(1)).over(w).as("cnt3")
        )
        .orderBy(col("event_id"))
    },
    Some("""SELECT event_id, user_id,
      CAST(SUM(CAST(value AS DECIMAL(18,2))) OVER w AS DOUBLE) AS sum3,
      COUNT(*) OVER w AS cnt3
      FROM events WINDOW w AS (PARTITION BY user_id ORDER BY CAST(ts AS TIMESTAMP), event_id
        ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)
      ORDER BY event_id""")
  )

  private val q20 = Q(
    "q20_window_rank_ntile",
    (s, dir) => {
      val w = Window.partitionBy(col("user_id")).orderBy(col("value"), col("event_id"))
      fixture(s, dir, "events")
        .select(
          col("event_id"),
          col("user_id"),
          rank().over(w).as("rnk"),
          dense_rank().over(w).as("drnk"),
          ntile(4).over(w).as("quartile")
        )
        .orderBy(col("event_id"))
    },
    Some("""SELECT event_id, user_id, CAST(RANK() OVER w AS INTEGER) AS rnk,
      CAST(DENSE_RANK() OVER w AS INTEGER) AS drnk, CAST(NTILE(4) OVER w AS INTEGER) AS quartile
      FROM events WINDOW w AS (PARTITION BY user_id ORDER BY value, event_id)
      ORDER BY event_id""")
  )

  private val q21 = Q(
    "q21_topk_global",
    (s, dir) =>
      fixture(s, dir, "orders")
        .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
        .limit(100),
    Some("""SELECT o_orderkey, o_custkey, o_totalprice FROM orders
      ORDER BY o_totalprice DESC, o_orderkey LIMIT 100""")
  )

  private val q22 = Q(
    "q22_union_all",
    (s, dir) => {
      val o = fixture(s, dir, "orders")
      val hi = o.filter(col("o_totalprice") > 400000).select(lit("hi").as("src"), col("o_custkey").as("k"))
      val lo = o.filter(col("o_totalprice") < 2000).select(lit("lo").as("src"), col("o_custkey").as("k"))
      hi.unionAll(lo).orderBy(col("src"), col("k"))
    },
    Some("""SELECT * FROM (
      SELECT 'hi' AS src, o_custkey AS k FROM orders WHERE o_totalprice > 400000
      UNION ALL
      SELECT 'lo' AS src, o_custkey AS k FROM orders WHERE o_totalprice < 2000)
      ORDER BY src, k""")
  )

  private val q23 = Q(
    "q23_intersect",
    (s, dir) => {
      val c = fixture(s, dir, "customer").filter(col("c_mktsegment") === "BUILDING").select(col("c_custkey").as("k"))
      val o = fixture(s, dir, "orders").filter(col("o_totalprice") > 300000).select(col("o_custkey").as("k"))
      c.intersect(o).orderBy(col("k"))
    },
    Some("""SELECT c_custkey AS k FROM customer WHERE c_mktsegment = 'BUILDING'
      INTERSECT
      SELECT o_custkey AS k FROM orders WHERE o_totalprice > 300000
      ORDER BY k""")
  )

  private val q24 = Q(
    "q24_except",
    (s, dir) => {
      val c = fixture(s, dir, "customer").filter(col("c_mktsegment") === "BUILDING").select(col("c_custkey").as("k"))
      val o = fixture(s, dir, "orders").filter(col("o_totalprice") > 300000).select(col("o_custkey").as("k"))
      c.except(o).orderBy(col("k"))
    },
    Some("""SELECT k FROM (
      SELECT c_custkey AS k FROM customer WHERE c_mktsegment = 'BUILDING'
      EXCEPT
      SELECT o_custkey AS k FROM orders WHERE o_totalprice > 300000)
      ORDER BY k""")
  )

  // ---------------------------------------------------------------- 2.f scalar functions

  private val q25 = Q(
    "q25_string_functions",
    (s, dir) =>
      fixture(s, dir, "part")
        .select(
          col("p_partkey"),
          upper(col("p_brand")).as("b_up"),
          lower(col("p_type")).as("t_lo"),
          substring(col("p_name"), 1, 8).as("prefix"),
          length(col("p_name")).as("name_len"),
          concat(col("p_brand"), lit("/"), col("p_type")).as("brand_type"),
          regexp_replace(col("p_name"), " ", "_").as("snake")
        )
        .orderBy(col("p_partkey")),
    Some("""SELECT p_partkey, UPPER(p_brand) AS b_up, LOWER(p_type) AS t_lo,
      SUBSTRING(p_name, 1, 8) AS prefix, CAST(LENGTH(p_name) AS INTEGER) AS name_len,
      p_brand || '/' || p_type AS brand_type, REPLACE(p_name, ' ', '_') AS snake
      FROM part ORDER BY p_partkey""")
  )

  private val q26 = Q(
    "q26_date_functions",
    (s, dir) =>
      fixture(s, dir, "orders")
        .select(
          col("o_orderkey"),
          col("o_orderdate").cast("date").as("od"),
          year(col("o_orderdate")).as("y"),
          month(col("o_orderdate")).as("m"),
          dayofmonth(col("o_orderdate")).as("d"),
          date_trunc("month", col("o_orderdate")).as("mon"),
          datediff(lit("2002-01-01").cast("date"), col("o_orderdate").cast("date")).as("age_days")
        )
        .orderBy(col("o_orderkey")),
    Some("""SELECT o_orderkey, CAST(o_orderdate AS DATE) AS od,
      CAST(YEAR(o_orderdate) AS INTEGER) AS y, CAST(MONTH(o_orderdate) AS INTEGER) AS m,
      CAST(DAY(o_orderdate) AS INTEGER) AS d, DATE_TRUNC('month', o_orderdate) AS mon,
      CAST(DATEDIFF('day', CAST(o_orderdate AS DATE), DATE '2002-01-01') AS INTEGER) AS age_days
      FROM orders ORDER BY o_orderkey""")
  )

  /** JSON extraction from the events `props` column (the reference
    * validates/parses JSON at ingest, datalake_bronze_...py:207-224). */
  private val q27 = Q(
    "q27_json_extract",
    (s, dir) =>
      fixture(s, dir, "events")
        .select(
          col("event_id"),
          get_json_object(col("props"), "$.k").cast("int").as("k_val")
        )
        .orderBy(col("event_id")),
    Some("""SELECT event_id, CAST(props->>'$.k' AS INTEGER) AS k_val
      FROM events ORDER BY event_id""")
  )

  private val q28 = Q(
    "q28_case_when_bands",
    (s, dir) =>
      fixture(s, dir, "orders")
        .select(
          when(col("o_totalprice") < 50000, "small")
            .when(col("o_totalprice") < 200000, "mid")
            .otherwise("big")
            .as("band"),
          col("o_totalprice")
        )
        .groupBy(col("band"))
        .agg(count(lit(1)).as("n"), sum(d2(col("o_totalprice"))).cast("double").as("total"))
        .orderBy(col("band")),
    Some("""SELECT CASE WHEN o_totalprice < 50000 THEN 'small'
        WHEN o_totalprice < 200000 THEN 'mid' ELSE 'big' END AS band,
      COUNT(*) AS n, CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
      FROM orders GROUP BY 1 ORDER BY 1""")
  )

  /** Tumbling time-window aggregation (batch form; the streaming form is
    * exercised in graft.streaming tests). */
  private val q29 = Q(
    "q29_tumbling_hour",
    (s, dir) =>
      fixture(s, dir, "events")
        .groupBy(date_trunc("hour", col("ts")).as("h"))
        .agg(count(lit(1)).as("n"), sum(d2(col("value"))).cast("double").as("total"))
        .orderBy(col("h")),
    Some("""SELECT DATE_TRUNC('hour', ts) AS h, COUNT(*) AS n,
      CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total
      FROM events GROUP BY 1 ORDER BY 1""")
  )

  /** Pivot (wide conditional aggregation) — explicit value list so the
    * plan needs no distinct-values pre-pass (the 100 TB form; implicit
    * pivot runs an extra job to discover columns). */
  private val q50 = Q(
    "q50_pivot",
    (s, dir) =>
      fixture(s, dir, "orders")
        .join(broadcast(fixture(s, dir, "customer")), col("o_custkey") === col("c_custkey"))
        .groupBy(col("c_mktsegment"))
        .pivot("o_orderstatus", Seq("F", "O", "P"))
        .agg(count(lit(1)))
        // empty pivot cells are null in Spark but 0 under SQL FILTER
        .select(col("c_mktsegment") +: Seq("F", "O", "P").map(c => coalesce(col(c), lit(0L)).as(c)): _*)
        .orderBy(col("c_mktsegment")),
    Some("""SELECT c_mktsegment,
      COUNT(*) FILTER (o_orderstatus = 'F') AS F,
      COUNT(*) FILTER (o_orderstatus = 'O') AS O,
      COUNT(*) FILTER (o_orderstatus = 'P') AS P
      FROM orders JOIN customer ON o_custkey = c_custkey
      GROUP BY c_mktsegment ORDER BY c_mktsegment""")
  )

  /** Uncorrelated scalar subquery (decimal avg so both engines compare
    * against the identical exact threshold). */
  private val q51 = Q(
    "q51_scalar_subquery",
    (s, dir) =>
      withViews(s, dir, "orders")(
        """SELECT o_orderstatus, count(*) AS n_above
          |FROM orders
          |WHERE o_totalprice > (SELECT AVG(CAST(o_totalprice AS DECIMAL(18,2))) FROM orders)
          |GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin
      ),
    Some("""SELECT o_orderstatus, count(*) AS n_above
      FROM orders
      WHERE o_totalprice > (SELECT AVG(CAST(o_totalprice AS DECIMAL(18,2))) FROM orders)
      GROUP BY o_orderstatus ORDER BY o_orderstatus""")
  )

  /** Sliding time windows via the built-in `window()` generator: each
    * event lands in length/slide windows (here 2). The oracle
    * replicates the expansion with a UNION ALL of shifted hour truncs. */
  private val q52 = Q(
    "q52_sliding_windows",
    (s, dir) =>
      fixture(s, dir, "events")
        .groupBy(window(col("ts"), "2 hours", "1 hour").as("w"))
        .agg(count(lit(1)).as("n"), sum(d2(col("value"))).cast("double").as("total"))
        .select(col("w.start").as("w_start"), col("w.end").as("w_end"), col("n"), col("total"))
        .orderBy(col("w_start")),
    Some("""WITH e AS (
        SELECT date_trunc('hour', CAST(ts AS TIMESTAMP)) AS w_start, value FROM events
        UNION ALL
        SELECT date_trunc('hour', CAST(ts AS TIMESTAMP)) - INTERVAL 1 HOUR, value FROM events)
      SELECT w_start, w_start + INTERVAL 2 HOUR AS w_end, COUNT(*) AS n,
        CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total
      FROM e GROUP BY w_start ORDER BY w_start""")
  )

  /** Built-in `session_window()` (30-min gap): session end is
    * last-event + gap by Spark's definition — the oracle mirrors that
    * on top of the q46-style lag/running-sum session assignment. */
  private val q53 = Q(
    "q53_session_window",
    (s, dir) =>
      fixture(s, dir, "events")
        .groupBy(col("user_id"), session_window(col("ts"), "30 minutes").as("w"))
        .agg(count(lit(1)).as("n_events"), sum(d2(col("value"))).cast("double").as("total"))
        .select(col("user_id"), col("w.start").as("session_start"), col("w.end").as("session_end"),
          col("n_events"), col("total"))
        .orderBy(col("user_id"), col("session_start")),
    Some("""WITH e AS (SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS ts, value FROM events),
      g AS (SELECT *, CASE WHEN prev IS NULL OR epoch_us(ts) - epoch_us(prev) > 1800000000
                      THEN 1 ELSE 0 END AS new_sess
            FROM (SELECT *, LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev FROM e)),
      s AS (SELECT *, SUM(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sess_id FROM g)
      SELECT user_id, MIN(ts) AS session_start, MAX(ts) + INTERVAL 30 MINUTE AS session_end,
        COUNT(*) AS n_events, CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total
      FROM s GROUP BY user_id, sess_id ORDER BY user_id, session_start""")
  )

  /** Array scalar functions over the tokenized documents (ASCII text,
    * so Spark's UTF8 binary sort == DuckDB's default collation). */
  private val q54 = Q(
    "q54_array_functions",
    (s, dir) =>
      fixture(s, dir, "documents")
        .select(col("doc_id"), split(col("text"), " ").as("toks"))
        .select(
          col("doc_id"),
          size(col("toks")).as("n"),
          size(array_distinct(col("toks"))).as("n_distinct"),
          array_contains(col("toks"), "the").as("has_the"),
          concat_ws("-", slice(col("toks"), 1, 3)).as("first3"),
          element_at(array_sort(array_distinct(col("toks"))), 1).as("first_sorted")
        )
        .orderBy(col("doc_id")),
    Some("""WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents)
      SELECT doc_id, CAST(len(toks) AS INTEGER) AS n,
        CAST(len(list_distinct(toks)) AS INTEGER) AS n_distinct,
        list_contains(toks, 'the') AS has_the,
        array_to_string(toks[1:3], '-') AS first3,
        list_sort(list_distinct(toks))[1] AS first_sorted
      FROM t ORDER BY doc_id""")
  )

  val relational: Seq[Q] = Seq(
    q01, q02, q03, q04, q05, q06, q07, q08, q08b, q09, q10, q11, q12, q13, q14, q15,
    q16, q17, q18, q19, q20, q21, q22, q23, q24, q25, q26, q27, q28, q29, q50, q51,
    q52, q53, q54
  )

  /** Full corpus: relational inventory + the BASELINE extensions
    * (dedup / similarity / text analysis / multimodal / temporal
    * joins, see [[ExtensionCorpus]]). */
  def all: Seq[Q] = relational ++ ExtensionCorpus.all ++ CurationCorpus.all

  def headlines: Seq[Q] = all.filter(_.headline)
}
