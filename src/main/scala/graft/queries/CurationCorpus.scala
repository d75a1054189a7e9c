package graft.queries

import graft.functions.TextFunctions._
import graft.operators.{Curation, Dedup}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import Corpus.{fixture, withViews}

/** Round-2 corpus: remaining relational-surface operators (generators,
  * map/struct access, unpivot, multiset set-ops, correlated EXISTS,
  * conditional aggregates, range frames, window navigation) and the
  * corpus-curation pipeline (deterministic splits, repetition/quality
  * filters, vocabulary + tf-idf, PII redaction, stratified sampling,
  * near-dup clustering).
  *
  * Oracle conventions follow [[Corpus]]: decimal-cast sums, explicit
  * NULLS FIRST, INTEGER casts where Spark returns int, ROUND(…, 6) on
  * doubles.
  */
object CurationCorpus {

  /** DuckDB rendering of TextFunctions.hash32 (kept in lockstep with
    * ExtensionCorpus.sqlHash32). */
  private def sqlHash32(e: String): String =
    s"CAST(('0x' || substr(md5($e),1,8)) AS BIGINT)"

  /** DuckDB rendering of TextFunctions.occurrences over padded text. */
  private def sqlOcc(padded: String, pat: String): String = {
    val esc = pat.replace("'", "''")
    s"CAST((length($padded) - length(replace($padded, '$esc', ''))) / ${pat.length} AS INTEGER)"
  }

  private val sqlEnScore: String =
    langMarkers.collectFirst { case ("en", pats) => pats }.get
      .map(p => sqlOcc("(' ' || text || ' ')", p)).mkString("(", " + ", ")")

  // ------------------------------------------------- relational surface

  /** Generator / lateral view: one row per token with its position. */
  private val q56 = Q(
    "q56_explode_lateral",
    (s, dir) =>
      fixture(s, dir, "documents")
        .filter(col("doc_id") < 50)
        .select(col("doc_id"), posexplode(tokens(col("text"))).as(Seq("pos", "token")))
        .orderBy(col("doc_id"), col("pos")),
    Some("""WITH t AS (SELECT doc_id, string_split(text,' ') AS toks FROM documents WHERE doc_id < 50)
      SELECT doc_id, CAST(i - 1 AS INTEGER) AS pos, toks[i] AS token
      FROM t, unnest(generate_series(1, len(toks))) AS g(i)
      ORDER BY doc_id, pos""")
  )

  /** Map construction + element_at, struct construction + field access. */
  private val q57 = Q(
    "q57_struct_map",
    (s, dir) => {
      val n = fixture(s, dir, "nation")
      val m = map(lit("name"), col("n_name"), lit("region"), col("n_regionkey").cast("string"))
      val st = struct(col("n_nationkey").as("key"), col("n_name").as("name"))
      n.select(
        col("n_nationkey"),
        element_at(m, "name").as("m_name"),
        element_at(m, "region").as("m_region"),
        st.getField("name").as("s_name"),
        size(map_keys(m)).as("n_keys")
      ).orderBy(col("n_nationkey"))
    },
    Some("""SELECT n_nationkey, n_name AS m_name, CAST(n_regionkey AS VARCHAR) AS m_region,
      n_name AS s_name, CAST(2 AS INTEGER) AS n_keys
      FROM nation ORDER BY n_nationkey""")
  )

  /** Unpivot (wide measures -> long metric/value rows). */
  private val q58 = Q(
    "q58_unpivot",
    (s, dir) =>
      fixture(s, dir, "lineitem")
        .groupBy(col("l_returnflag"))
        .agg(
          sum(col("l_quantity").cast("decimal(18,2)")).cast("double").as("sum_qty"),
          sum(col("l_extendedprice").cast("decimal(18,2)")).cast("double").as("sum_price")
        )
        .unpivot(Array(col("l_returnflag")), Array(col("sum_qty"), col("sum_price")), "metric", "value")
        .orderBy(col("l_returnflag"), col("metric")),
    Some("""WITH a AS (SELECT l_returnflag,
        CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
        CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
      FROM lineitem GROUP BY 1)
      SELECT l_returnflag, 'sum_qty' AS metric, sum_qty AS value FROM a
      UNION ALL SELECT l_returnflag, 'sum_price' AS metric, sum_price AS value FROM a
      ORDER BY l_returnflag, metric""")
  )

  /** Multiset set operations (INTERSECT ALL / EXCEPT ALL). */
  private val q59 = Q(
    "q59_setops_all",
    (s, dir) => {
      val o = fixture(s, dir, "orders")
      val evens = o.filter(col("o_orderkey") % 2 === 0).select(col("o_custkey"))
      val threes = o.filter(col("o_orderkey") % 3 === 0).select(col("o_custkey"))
      val inter = evens.intersectAll(threes).groupBy(col("o_custkey"))
        .agg(count(lit(1)).as("n")).withColumn("op", lit("intersect_all"))
      val exc = evens.exceptAll(threes).groupBy(col("o_custkey"))
        .agg(count(lit(1)).as("n")).withColumn("op", lit("except_all"))
      inter.unionByName(exc).orderBy(col("op"), col("o_custkey"))
    },
    Some("""WITH e AS (SELECT o_custkey FROM orders WHERE o_orderkey % 2 = 0),
      t AS (SELECT o_custkey FROM orders WHERE o_orderkey % 3 = 0),
      i AS (SELECT o_custkey, COUNT(*) AS n, 'intersect_all' AS op
            FROM (SELECT * FROM e INTERSECT ALL SELECT * FROM t) GROUP BY o_custkey),
      x AS (SELECT o_custkey, COUNT(*) AS n, 'except_all' AS op
            FROM (SELECT * FROM e EXCEPT ALL SELECT * FROM t) GROUP BY o_custkey)
      SELECT * FROM i UNION ALL SELECT * FROM x ORDER BY op, o_custkey""")
  )

  /** Correlated EXISTS / NOT EXISTS subqueries (same SQL text runs on
    * both engines; Spark decorrelates to semi/anti joins). */
  private val existsSql =
    """SELECT c_custkey, c_name FROM customer c
       WHERE EXISTS (SELECT 1 FROM orders o
                     WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 150000)
         AND NOT EXISTS (SELECT 1 FROM orders o2
                         WHERE o2.o_custkey = c.c_custkey
                           AND o2.o_orderpriority = '1-URGENT' AND o2.o_totalprice < 20000)
       ORDER BY c_custkey"""

  private val q60 = Q(
    "q60_exists_correlated",
    (s, dir) => withViews(s, dir, "customer", "orders")(existsSql),
    Some(existsSql)
  )

  /** Conditional / boolean / distinct aggregates. */
  private val q61 = Q(
    "q61_conditional_agg",
    (s, dir) =>
      fixture(s, dir, "lineitem")
        .groupBy(col("l_returnflag"))
        .agg(
          count_if(col("l_quantity") > 25).as("n_big"),
          bool_and(col("l_quantity") < 100).as("all_small"),
          bool_or(col("l_tax") > 0.07).as("any_taxy"),
          sum_distinct(col("l_linenumber")).cast("bigint").as("sd_linenum")
        )
        .orderBy(col("l_returnflag")),
    Some("""SELECT l_returnflag, CAST(count_if(l_quantity > 25) AS BIGINT) AS n_big,
      bool_and(l_quantity < 100) AS all_small, bool_or(l_tax > 0.07) AS any_taxy,
      CAST(SUM(DISTINCT l_linenumber) AS BIGINT) AS sd_linenum
      FROM lineitem GROUP BY 1 ORDER BY 1""")
  )

  /** RANGE window frame over event-time seconds (1-hour rolling sum per
    * user — frame membership is by VALUE range, not row count). */
  private val q62 = Q(
    "q62_window_range_frame",
    (s, dir) => {
      val w = Window.partitionBy(col("user_id")).orderBy(col("sec")).rangeBetween(-3600, 0)
      fixture(s, dir, "events")
        .withColumn("sec", expr("unix_micros(ts) div 1000000"))
        .select(
          col("event_id"),
          col("user_id"),
          sum(col("value").cast("decimal(18,2)")).over(w).cast("double").as("rolling_1h")
        )
        .orderBy(col("event_id"))
    },
    Some("""WITH e AS (SELECT event_id, user_id, value,
        epoch_us(CAST(ts AS TIMESTAMP)) // 1000000 AS sec FROM events)
      SELECT event_id, user_id,
        CAST(SUM(CAST(value AS DECIMAL(18,2))) OVER (
          PARTITION BY user_id ORDER BY sec
          RANGE BETWEEN 3600 PRECEDING AND CURRENT ROW) AS DOUBLE) AS rolling_1h
      FROM e ORDER BY event_id""")
  )

  /** Window navigation: percent_rank / cume_dist / first / last / nth. */
  private val q63 = Q(
    "q63_window_navigation",
    (s, dir) => {
      val ord = Window.partitionBy(col("user_id")).orderBy(col("value"), col("event_id"))
      val full = ord.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
      fixture(s, dir, "events")
        .select(
          col("event_id"),
          col("user_id"),
          round(percent_rank().over(ord), 6).as("pr"),
          round(cume_dist().over(ord), 6).as("cd"),
          first(col("value")).over(full).as("fv"),
          last(col("value")).over(full).as("lv"),
          nth_value(col("value"), 2).over(full).as("nv2")
        )
        .orderBy(col("event_id"))
    },
    Some("""SELECT event_id, user_id,
      ROUND(percent_rank() OVER w, 6) AS pr, ROUND(cume_dist() OVER w, 6) AS cd,
      first_value(value) OVER wf AS fv, last_value(value) OVER wf AS lv,
      nth_value(value, 2) OVER wf AS nv2
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY value, event_id),
        wf AS (PARTITION BY user_id ORDER BY value, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
      ORDER BY event_id""")
  )

  // ------------------------------------------------- curation pipeline

  /** Deterministic hash-bucket train/val/test split. */
  private val q64 = Q(
    "q64_hash_split",
    (s, dir) =>
      Curation.hashSplit(fixture(s, dir, "documents"), "doc_id")
        .groupBy(col("split"))
        .agg(count(lit(1)).as("n"), min(col("doc_id")).as("min_id"), max(col("doc_id")).as("max_id"))
        .orderBy(col("split")),
    Some(s"""WITH b AS (SELECT doc_id, ${sqlHash32("CAST(doc_id AS VARCHAR)")} % 100 AS bkt FROM documents)
      SELECT CASE WHEN bkt < 80 THEN 'train' WHEN bkt < 90 THEN 'val' ELSE 'test' END AS split,
        COUNT(*) AS n, MIN(doc_id) AS min_id, MAX(doc_id) AS max_id
      FROM b GROUP BY 1 ORDER BY split""")
  )

  /** Gopher-style repetition stats per document. */
  private val q65 = Q(
    "q65_repetition_ratio",
    (s, dir) =>
      Curation.repetitionRatio(fixture(s, dir, "documents"), "doc_id", "text")
        .orderBy(col("doc_id")),
    Some("""WITH w AS (SELECT doc_id, unnest(string_split(text,' ')) AS tok FROM documents),
      c AS (SELECT doc_id, tok, COUNT(*) AS cnt FROM w GROUP BY 1, 2)
      SELECT doc_id, CAST(MAX(cnt) AS INTEGER) AS top_tok_cnt,
        CAST(SUM(cnt) AS INTEGER) AS n_tokens,
        CAST(COUNT(*) AS INTEGER) AS n_distinct_tokens,
        ROUND(CAST(MAX(cnt) AS DOUBLE) / CAST(SUM(cnt) AS DOUBLE), 6) AS repetition_ratio
      FROM c GROUP BY doc_id ORDER BY doc_id""")
  )

  /** Vocabulary document frequency, top-100 by df. */
  private val q66 = Q(
    "q66_vocab_df",
    (s, dir) =>
      Curation.vocabDocFreq(fixture(s, dir, "documents"), "doc_id", "text", minDf = 5)
        .orderBy(col("df").desc, col("token"))
        .limit(100),
    Some("""WITH w AS (SELECT doc_id, unnest(string_split(text,' ')) AS token FROM documents),
      d AS (SELECT DISTINCT doc_id, token FROM w),
      f AS (SELECT token, COUNT(*) AS df FROM d GROUP BY 1)
      SELECT token, df FROM f WHERE df >= 5 ORDER BY df DESC, token LIMIT 100""")
  )

  /** Top-3 tf-idf terms per document (bounded to 100 docs). */
  private val q67 = Q(
    "q67_tfidf",
    (s, dir) =>
      Curation.tfidfTopTerms(fixture(s, dir, "documents").filter(col("doc_id") < 100), "doc_id", "text", k = 3)
        .orderBy(col("doc_id"), col("rk")),
    Some("""WITH d AS (SELECT doc_id, text FROM documents WHERE doc_id < 100),
      w AS (SELECT doc_id, unnest(string_split(text,' ')) AS token FROM d),
      tf AS (SELECT doc_id, token, COUNT(*) AS tf FROM w GROUP BY 1, 2),
      dfq AS (SELECT token, COUNT(*) AS df FROM tf GROUP BY 1),
      n AS (SELECT COUNT(*) AS n_docs FROM d),
      sc AS (SELECT tf.doc_id, tf.token, tf.tf, dfq.df,
               ROUND(tf.tf * ln(CAST(n.n_docs AS DOUBLE) / dfq.df), 6) AS score
             FROM tf JOIN dfq ON tf.token = dfq.token CROSS JOIN n),
      r AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY score DESC, token) AS rk FROM sc)
      SELECT doc_id, CAST(rk AS INTEGER) AS rk, token, CAST(tf AS INTEGER) AS tf,
        CAST(df AS INTEGER) AS df, score
      FROM r WHERE rk <= 3 ORDER BY doc_id, rk"""),
    headline = true
  )

  /** PII-style redaction (digit runs / URLs) with match counts. */
  private val q68 = Q(
    "q68_pii_redact",
    (s, dir) =>
      Curation.redactPii(fixture(s, dir, "documents"), "text")
        .select(col("doc_id"), col("n_nums"), col("n_urls"),
          md5(col("redacted")).as("red_md5"), length(col("redacted")).as("red_len"))
        .orderBy(col("doc_id")),
    Some("""SELECT doc_id,
      CAST(len(regexp_extract_all(text, '[0-9]+')) AS INTEGER) AS n_nums,
      CAST(len(regexp_extract_all(text, 'https?://[^ ]+')) AS INTEGER) AS n_urls,
      md5(regexp_replace(regexp_replace(text, 'https?://[^ ]+', '<URL>', 'g'), '[0-9]+', '<NUM>', 'g')) AS red_md5,
      CAST(length(regexp_replace(regexp_replace(text, 'https?://[^ ]+', '<URL>', 'g'), '[0-9]+', '<NUM>', 'g')) AS INTEGER) AS red_len
      FROM documents ORDER BY doc_id""")
  )

  /** Composite quality gate with per-rule audit columns. */
  private val q69 = Q(
    "q69_quality_filter",
    (s, dir) =>
      Curation.qualityFilter(fixture(s, dir, "documents"), "text")
        .select(col("doc_id"), col("len_ok"), col("tok_ok"), col("wlen_ok"), col("stop_ok"), col("kept"))
        .orderBy(col("doc_id")),
    Some(s"""SELECT doc_id,
      length(text) BETWEEN 100 AND 2000 AS len_ok,
      len(string_split(text, ' ')) BETWEEN 10 AND 500 AS tok_ok,
      (CAST(length(replace(text, ' ', '')) AS DOUBLE) / len(string_split(text, ' '))) BETWEEN 2.0 AND 12.0 AS wlen_ok,
      $sqlEnScore > 0 AS stop_ok,
      (length(text) BETWEEN 100 AND 2000)
        AND (len(string_split(text, ' ')) BETWEEN 10 AND 500)
        AND ((CAST(length(replace(text, ' ', '')) AS DOUBLE) / len(string_split(text, ' '))) BETWEEN 2.0 AND 12.0)
        AND ($sqlEnScore > 0) AS kept
      FROM documents ORDER BY doc_id""")
  )

  /** Deterministic stratified sample: 20 docs per language. */
  private val q70 = Q(
    "q70_stratified_sample",
    (s, dir) =>
      Curation.stratifiedSample(fixture(s, dir, "documents"), "lang", "doc_id", k = 20)
        .select(col("lang"), col("doc_id"), col("rk"))
        .orderBy(col("lang"), col("rk")),
    Some("""WITH r AS (SELECT lang, doc_id,
        ROW_NUMBER() OVER (PARTITION BY lang ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rk
      FROM documents)
      SELECT lang, doc_id, CAST(rk AS INTEGER) AS rk FROM r WHERE rk <= 20
      ORDER BY lang NULLS FIRST, rk""")
  )

  /** Near-dup clusters: connected components over the LSH candidate
    * pairs (oracle: recursive-CTE transitive closure over the same
    * pair set). */
  private val q71 = Q(
    "q71_neardup_clusters",
    (s, dir) => {
      val pairs = Dedup.lshCandidatePairs(fixture(s, dir, "documents"), "doc_id", "text", numHashes = 8, bands = 4)
      Dedup.nearDupClusters(pairs).orderBy(col("id"))
    },
    Some(s"""WITH RECURSIVE ${ExtensionCorpus.sqlLshPairCtes},
      e AS (SELECT a, b FROM pairs UNION SELECT b, a FROM pairs),
      reach(src, dst) AS (SELECT a, b FROM e
        UNION SELECT e.a, r.dst FROM e JOIN reach r ON e.b = r.src),
      n AS (SELECT DISTINCT a AS id FROM e)
      SELECT id, LEAST(id, MIN(dst)) AS comp FROM n JOIN reach ON reach.src = n.id
      GROUP BY id ORDER BY id"""),
    headline = true
  )

  /** Higher-order array lambdas (transform / filter / exists / forall /
    * zip_with / aggregate) over the embedding vectors. The fold shape
    * (double-cast elements, left-associated adds from a 0.0 seed)
    * matches DuckDB's no-init list_reduce bit-for-bit, same as the
    * cosine oracles. */
  private val q72 = Q(
    "q72_higher_order",
    (s, dir) => {
      val emb = transform(col("embedding"), x => x.cast("double"))
      fixture(s, dir, "embeddings")
        .select(
          col("vec_id"),
          round(aggregate(emb, lit(0.0d), (a, x) => a + x * x), 6).as("sq_norm"),
          size(filter(emb, x => x > 0)).as("n_pos"),
          exists(emb, x => x > 0.4).as("has_big"),
          forall(emb, x => abs(x) <= 0.6).as("bounded"),
          round(element_at(zip_with(emb, reverse(emb), (a, b) => a * b), 1), 6).as("first_x_last")
        )
        .orderBy(col("vec_id"))
    },
    Some("""WITH v AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS emb FROM embeddings)
      SELECT vec_id,
        ROUND(list_reduce(list_transform(emb, x -> x*x), (x,y) -> x+y), 6) AS sq_norm,
        CAST(len(list_filter(emb, x -> x > 0)) AS INTEGER) AS n_pos,
        len(list_filter(emb, x -> x > 0.4)) > 0 AS has_big,
        len(list_filter(emb, x -> abs(x) > 0.6)) = 0 AS bounded,
        ROUND(emb[1] * emb[len(emb)], 6) AS first_x_last
      FROM v ORDER BY vec_id""")
  )

  /** Multi-probe LSH ANN: queries also probe the bucket with their
    * weakest sign bit flipped (probes=1). Oracle replays the flip with
    * the same seeded hyperplanes; LEAST + first-match CASE mirrors the
    * struct-sort tie-break (smallest |projection|, then lowest bit). */
  private val q73 = Q(
    "q73_ann_multiprobe",
    (s, dir) => {
      val e = fixture(s, dir, "embeddings")
      graft.operators.Similarity.lshTopK(
        e, e.filter(col("vec_id") < 10), "vec_id", "embedding",
        k = 5, bits = 4, dim = 64, probes = 1)
    },
    Some {
      val planes = graft.operators.Similarity.hyperplanes(dim = 64, bits = 4)
      val projCols = (0 until 4).map { b =>
        (0 until 64).map(i => s"emb[${i + 1}]*(${planes(b)(i)})").mkString(" + ")
      }
      val pSel = projCols.zipWithIndex.map { case (p, b) => s"($p) AS p$b" }.mkString(", ")
      val bkt = (0 until 4).map(b => s"(CASE WHEN p$b > 0 THEN ${1L << b} ELSE 0 END)").mkString(" + ")
      val m = (0 until 4).map(b => s"abs(p$b)").mkString("LEAST(", ", ", ")")
      val wb = (0 until 4).map(b => s"WHEN abs(p$b) = m THEN $b").mkString("CASE ", " ", " END")
      s"""WITH v AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS emb FROM embeddings),
        p AS (SELECT vec_id, emb, $pSel FROM v),
        nb AS (SELECT vec_id, emb, $bkt AS bkt, p0, p1, p2, p3 FROM p),
        qw AS (SELECT vec_id, emb, bkt, $wb AS wb
               FROM (SELECT *, $m AS m FROM nb) WHERE vec_id < 10),
        qq AS (SELECT vec_id, emb, bkt FROM qw
               UNION ALL SELECT vec_id, emb, xor(bkt, (CAST(1 AS BIGINT) << wb)) FROM qw),
        sc AS (SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
                 ${"(list_reduce(list_transform(list_zip(q.emb, c.emb), z -> struct_extract(z,1)*struct_extract(z,2)), (x,y) -> x+y) / (sqrt(list_reduce(list_transform(q.emb, x -> x*x), (x,y) -> x+y)) * sqrt(list_reduce(list_transform(c.emb, x -> x*x), (x,y) -> x+y))))"} AS score
               FROM qq q JOIN nb c ON q.bkt = c.bkt AND q.vec_id <> c.vec_id),
        r AS (SELECT query_id, neighbor_id, score,
                ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY score DESC, neighbor_id) AS rk
              FROM sc)
        SELECT query_id, CAST(rk AS INTEGER) AS rk, neighbor_id, ROUND(score, 6) AS score
        FROM r WHERE rk <= 5 ORDER BY query_id, rk"""
    }
  )

  /** The q74/q89 oracle: both decontamination paths are exact by
    * construction (the bloom pre-prune's false positives are removed by
    * the exact join), so one SQL gates both. */
  private val sqlDecontamination =
    s"""WITH t AS (SELECT doc_id, string_split(text,' ') AS toks FROM documents),
      s AS (SELECT doc_id, unnest(list_distinct(${ExtensionCorpus.sqlShingles})) AS sh
            FROM t WHERE len(toks) >= 3),
      bm AS (SELECT DISTINCT sh FROM s WHERE doc_id < 3)
      SELECT s.doc_id, CAST(COUNT(*) AS INTEGER) AS n_hits
      FROM s JOIN bm USING (sh) WHERE s.doc_id >= 3
      GROUP BY s.doc_id ORDER BY doc_id"""

  /** Benchmark decontamination: docs sharing any 3-shingle with the
    * "benchmark" (docs 0-2 stand in for an eval set). */
  private val q74 = Q(
    "q74_decontamination",
    (s, dir) => {
      val docs = fixture(s, dir, "documents")
      val bench = Curation.benchmarkShingles(docs.filter(col("doc_id") < 3), "text")
      Curation.flagContaminated(docs.filter(col("doc_id") >= 3), "doc_id", "text", bench)
        .orderBy(col("doc_id"))
    },
    Some(sqlDecontamination),
    headline = true
  )

  /** Bloom-prefiltered decontamination: the scan-local
    * BloomFilterMightContain prune + exact verification — must
    * hash-match the same oracle as q74 (false positives are removed by
    * the exact join; only the shuffle volume changes). */
  private val q89 = Q(
    "q89_decontamination_bloom",
    (s, dir) => {
      val docs = fixture(s, dir, "documents")
      val bench = Curation.benchmarkShingles(docs.filter(col("doc_id") < 3), "text")
      Curation.flagContaminatedBloom(docs.filter(col("doc_id") >= 3), "doc_id", "text", bench)
        .orderBy(col("doc_id"))
    },
    Some(sqlDecontamination)
  )

  /** Salted skew-join: result must equal the plain join (the salt is
    * an execution detail, never visible in the output). */
  private val q75 = Q(
    "q75_salted_join",
    (s, dir) => {
      val ev = fixture(s, dir, "events")
      val dim = ev.groupBy(col("user_id"))
        .agg(sum(col("value").cast("decimal(18,2)")).cast("double").as("user_total"))
      graft.operators.Skew.saltedJoin(ev, dim, Seq("user_id"), col("event_id"), salts = 8)
        .select(col("event_id"), col("user_id"), col("user_total"))
        .orderBy(col("event_id"))
    },
    Some("""WITH d AS (SELECT user_id, CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS user_total
        FROM events GROUP BY 1)
      SELECT e.event_id, e.user_id, d.user_total FROM events e JOIN d USING (user_id)
      ORDER BY event_id""")
  )

  /** Structured JSON surface: from_json with explicit schema, validity
    * via try_parse_json, to_json re-serialization. */
  private val q76 = Q(
    "q76_json_struct",
    (s, dir) =>
      fixture(s, dir, "events")
        .select(
          col("event_id"),
          from_json(col("props"), org.apache.spark.sql.types.StructType(
            Seq(org.apache.spark.sql.types.StructField("k", org.apache.spark.sql.types.IntegerType))))
            .getField("k").as("k_val"),
          expr("try_parse_json(props) IS NOT NULL").as("valid"),
          to_json(struct(col("event_id").as("id"))).as("j")
        )
        .orderBy(col("event_id")),
    Some("""SELECT event_id, CAST(props->>'$.k' AS INTEGER) AS k_val,
      json_valid(props) AS valid,
      '{"id":' || CAST(event_id AS VARCHAR) || '}' AS j
      FROM events ORDER BY event_id""")
  )

  /** Naive keyless BETWEEN join, written the way a user would — the
    * RangeJoinRewrite rule turns it into a bucketed equi-join (Verify
    * runs on GraftSession, so the oracle checks the REWRITTEN plan's
    * results against DuckDB's plain BETWEEN join). */
  private val q77 = Q(
    "q77_auto_range_join",
    (s, dir) => {
      val ev = fixture(s, dir, "events")
      val win = ev.filter(col("event_id") < 20)
        .select(col("event_id").as("window_id"), col("ts").as("w_start"),
          (col("ts") + expr("INTERVAL 2 HOURS")).as("w_end"))
      ev.select(col("event_id"), col("ts"))
        .join(win, col("ts") >= col("w_start") && col("ts") <= col("w_end"))
        .select(col("event_id"), col("window_id"))
        .orderBy(col("event_id"), col("window_id"))
    },
    Some("""WITH e AS (SELECT event_id, CAST(ts AS TIMESTAMP) AS ts FROM events),
      w AS (SELECT event_id AS window_id, ts AS w_start, ts + INTERVAL 2 HOUR AS w_end
            FROM e WHERE event_id < 20)
      SELECT e.event_id, w.window_id FROM e JOIN w
        ON e.ts >= w.w_start AND e.ts <= w.w_end
      ORDER BY event_id, window_id""")
  )

  /** Context-window chunking: 32-token chunks, 8-token overlap. */
  private val q78 = Q(
    "q78_chunking",
    (s, dir) =>
      Curation.chunkTokens(fixture(s, dir, "documents"), "doc_id", "text", chunkSize = 32, overlap = 8)
        .orderBy(col("doc_id"), col("chunk_idx")),
    Some("""WITH t AS (SELECT doc_id, string_split(text,' ') AS toks FROM documents),
      n AS (SELECT doc_id, toks,
              GREATEST(1, CAST(ceil((len(toks) - 8) / 24.0) AS INTEGER)) AS nc FROM t),
      c AS (SELECT doc_id, toks, unnest(generate_series(0, nc - 1)) AS chunk_idx FROM n)
      SELECT doc_id, CAST(chunk_idx AS INTEGER) AS chunk_idx,
        array_to_string(toks[chunk_idx*24 + 1 : chunk_idx*24 + 32], ' ') AS chunk_text,
        CAST(LEAST(32, len(toks) - chunk_idx*24) AS INTEGER) AS n_chunk_tokens
      FROM c ORDER BY doc_id, chunk_idx""")
  )

  /** Scan-order sequence packing into 256-token context bins. */
  private val q79 = Q(
    "q79_sequence_packing",
    (s, dir) =>
      Curation.packSequences(fixture(s, dir, "documents"), "doc_id", "text", budgetTokens = 256)
        .select(col("doc_id"), col("n_tokens"), col("bin_id"))
        .orderBy(col("doc_id")),
    Some("""WITH t AS (SELECT doc_id, CAST(len(string_split(text,' ')) AS INTEGER) AS n_tokens FROM documents),
      c AS (SELECT doc_id, n_tokens,
              COALESCE(SUM(n_tokens) OVER (ORDER BY doc_id
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cb FROM t)
      SELECT doc_id, n_tokens, CAST(cb // 256 AS BIGINT) AS bin_id FROM c ORDER BY doc_id""")
  )

  /** Deterministic source mixing: downsample src0 to 20%, src1 to 50%,
    * drop src2, keep the rest — then count the surviving mixture. */
  private val q80 = Q(
    "q80_source_mixing",
    (s, dir) =>
      Curation.mixSources(fixture(s, dir, "documents"), "doc_id", "source",
        Map("src0" -> 200, "src1" -> 500, "src2" -> 0))
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n"), min(col("doc_id")).as("min_id"))
        .orderBy(col("source")),
    Some(s"""WITH r AS (SELECT *, CASE source WHEN 'src0' THEN 200 WHEN 'src1' THEN 500
          WHEN 'src2' THEN 0 ELSE 1000 END AS rate FROM documents)
      SELECT source, COUNT(*) AS n, MIN(doc_id) AS min_id FROM r
      WHERE ${sqlHash32("CAST(doc_id AS VARCHAR)")} % 1000 < rate
      GROUP BY source ORDER BY source""")
  )

  /** The full curation recipe end-to-end: quality → dedup → split →
    * mixing, oracle-checked as one chain. */
  private val q81 = Q(
    "q81_curate_recipe",
    (s, dir) =>
      Curation.curate(fixture(s, dir, "documents"), "doc_id", "text", "source",
        ratesPerMille = Map("src0" -> 500))
        .select(col("doc_id"), col("source"), col("split"))
        .orderBy(col("doc_id")),
    Some(s"""WITH q AS (SELECT * FROM documents
        WHERE (length(text) BETWEEN 100 AND 2000)
          AND (len(string_split(text, ' ')) BETWEEN 10 AND 500)
          AND ((CAST(length(replace(text, ' ', '')) AS DOUBLE) / len(string_split(text, ' '))) BETWEEN 2.0 AND 12.0)
          AND ($sqlEnScore > 0)),
      k AS (SELECT MIN(doc_id) AS doc_id FROM q GROUP BY md5(lower(trim(text)))),
      d AS (SELECT q.* FROM q JOIN k USING (doc_id)),
      h AS (SELECT *, ${sqlHash32("CAST(doc_id AS VARCHAR)")} AS hv FROM d)
      SELECT doc_id, source,
        CASE WHEN hv % 100 < 80 THEN 'train' WHEN hv % 100 < 90 THEN 'val' ELSE 'test' END AS split
      FROM h
      WHERE hv % 1000 < (CASE source WHEN 'src0' THEN 500 ELSE 1000 END)
      ORDER BY doc_id"""),
    // top-5 cold-cost query in BENCH_r03 (5.45 s cold) — warm-tracked
    headline = true
  )

  /** The curation recipe with the decontamination stage enabled:
    * quality → drop docs sharing any 3-shingle with the benchmark
    * (docs 0-2) → dedup → split → mix. Same chain as q81 with the
    * contamination anti-join spliced in; the oracle composes q81's SQL
    * with q74's contamination CTE (computing contamination over all
    * batch docs is equivalent — quality-failed docs are already out of
    * the chain). */
  private val q90 = Q(
    "q90_curate_decontaminated",
    (s, dir) => {
      val docs = fixture(s, dir, "documents")
      val bench = Curation.benchmarkShingles(docs.filter(col("doc_id") < 3), "text")
      Curation.curate(docs.filter(col("doc_id") >= 3), "doc_id", "text", "source",
        ratesPerMille = Map("src0" -> 500), benchmark = Some(bench))
        .select(col("doc_id"), col("source"), col("split"))
        .orderBy(col("doc_id"))
    },
    Some(s"""WITH t AS (SELECT doc_id, string_split(text,' ') AS toks FROM documents),
      s AS (SELECT doc_id, unnest(list_distinct(${ExtensionCorpus.sqlShingles})) AS sh
            FROM t WHERE len(toks) >= 3),
      bm AS (SELECT DISTINCT sh FROM s WHERE doc_id < 3),
      contaminated AS (SELECT DISTINCT s.doc_id FROM s JOIN bm USING (sh) WHERE s.doc_id >= 3),
      q AS (SELECT * FROM documents
        WHERE doc_id >= 3
          AND (length(text) BETWEEN 100 AND 2000)
          AND (len(string_split(text, ' ')) BETWEEN 10 AND 500)
          AND ((CAST(length(replace(text, ' ', '')) AS DOUBLE) / len(string_split(text, ' '))) BETWEEN 2.0 AND 12.0)
          AND ($sqlEnScore > 0)
          AND doc_id NOT IN (SELECT doc_id FROM contaminated)),
      k AS (SELECT MIN(doc_id) AS doc_id FROM q GROUP BY md5(lower(trim(text)))),
      d AS (SELECT q.* FROM q JOIN k USING (doc_id)),
      h AS (SELECT *, ${sqlHash32("CAST(doc_id AS VARCHAR)")} AS hv FROM d)
      SELECT doc_id, source,
        CASE WHEN hv % 100 < 80 THEN 'train' WHEN hv % 100 < 90 THEN 'val' ELSE 'test' END AS split
      FROM h
      WHERE hv % 1000 < (CASE source WHEN 'src0' THEN 500 ELSE 1000 END)
      ORDER BY doc_id""")
  )

  /** Unigram LM scoring (perplexity-style quality signal). The oracle
    * replicates the determinism contract: ln pre-rounded to 8 decimals
    * (absorbing libm 1-ulp drift), decimal-summed (order-independent),
    * final NLL rounded to 6. */
  private val q91 = Q(
    "q91_unigram_logloss",
    (s, dir) =>
      Curation.unigramLogLoss(fixture(s, dir, "documents"), "doc_id", "text")
        .orderBy(col("doc_id")),
    Some("""WITH w AS (SELECT doc_id, unnest(string_split(text,' ')) AS w FROM documents),
      v AS (SELECT w, COUNT(*) AS cnt FROM w GROUP BY w),
      n AS (SELECT SUM(cnt) AS n_total FROM v),
      lp AS (SELECT w, CAST(ROUND(ln(CAST(cnt AS DOUBLE)/CAST(n.n_total AS DOUBLE)), 8) AS DECIMAL(28,10)) AS logp
             FROM v, n),
      d AS (SELECT doc_id, SUM(logp) AS s, COUNT(*) AS n_tok FROM w JOIN lp USING (w) GROUP BY doc_id)
      SELECT doc_id, CAST(n_tok AS INTEGER) AS n_tok,
        ROUND(-CAST(s AS DOUBLE)/n_tok, 6) AS nll,
        ROUND(exp(ROUND(-CAST(s AS DOUBLE)/n_tok, 6)), 4) AS ppl
      FROM d ORDER BY doc_id""")
  )

  /** Bigram (conditional) LM scoring — q91's sharper sibling; same
    * determinism contract. */
  private val q92 = Q(
    "q92_bigram_logloss",
    (s, dir) =>
      Curation.bigramLogLoss(fixture(s, dir, "documents"), "doc_id", "text")
        .orderBy(col("doc_id")),
    Some("""WITH t AS (SELECT doc_id, string_split(text,' ') AS toks FROM documents),
      b AS (SELECT doc_id, unnest(list_transform(range(1, len(toks)), i -> array_to_string(toks[i:i+1], ' '))) AS bg
            FROM t WHERE len(toks) >= 2),
      cnt AS (SELECT bg, COUNT(*) AS c FROM b GROUP BY bg),
      tot AS (SELECT split_part(bg, ' ', 1) AS w1, SUM(c) AS tc FROM cnt GROUP BY 1),
      lp AS (SELECT bg, CAST(ROUND(ln(CAST(c AS DOUBLE)/CAST(tc AS DOUBLE)), 8) AS DECIMAL(28,10)) AS logp
             FROM cnt JOIN tot ON split_part(cnt.bg, ' ', 1) = tot.w1),
      d AS (SELECT doc_id, SUM(logp) AS s, COUNT(*) AS n_bg FROM b JOIN lp USING (bg) GROUP BY doc_id)
      SELECT doc_id, CAST(n_bg AS INTEGER) AS n_bigrams, ROUND(-CAST(s AS DOUBLE)/n_bg, 6) AS nll
      FROM d ORDER BY doc_id""")
  )

  /** Spark 4 native recursive CTE (`WITH RECURSIVE`), kept to the
    * workload shape recursion is FOR at scale: a BOUNDED-DEPTH walk
    * over a SPARSE graph. Two explicit bounds, both proven necessary
    * by the 10× scale smoke:
    *  - sparsify the LSH pair graph to each node's MINIMUM successor
    *    (`GROUP BY a → MIN(b)`): out-degree ≤ 1, so UNION ALL
    *    enumerates each reachable pair once and rows stay LINEAR
    *    (the dense graph blew Spark's recursion ROW limit —
    *    combinatorial path counts in near-dup cliques; Spark doesn't
    *    support UNION-distinct recursion yet, and dense-graph closure
    *    belongs to Dedup.nearDupClusters/q71, whose per-iteration
    *    dedup IS the semi-naive evaluation SQL can't yet express);
    *  - carry an explicit hop counter and stop the recursive term at
    *    10 hops, so the recursion EXHAUSTS instead of tripping the
    *    engine's depth limit on long chains (the sparse walk blew the
    *    LEVEL limit at 10× — replica clusters chain hundreds deep).
    * "Reachable within k hops" is well-defined at any scale — the org-
    * chart/BOM shape recursive SQL exists for. DuckDB replays the
    * identical sparsify + bounded walk. */
  private val q93 = Q(
    "q93_recursive_closure",
    (s, dir) => {
      // materialize the edge relation ONCE: the recursion re-executes
      // the view per iteration, and an unmaterialized view would re-run
      // the whole LSH pipeline (scan → minhash → bucket join) each step
      Dedup.lshCandidatePairs(fixture(s, dir, "documents"), "doc_id", "text", numHashes = 8, bands = 4)
        .groupBy(col("a")).agg(min(col("b")).as("b"))
        .localCheckpoint(true)
        .createOrReplaceTempView("graft_q93_edges")
      s.sql("""WITH RECURSIVE reach(a, b, depth) AS (
          SELECT a, b, 1 FROM graft_q93_edges
          UNION ALL
          SELECT r.a, p.b, r.depth + 1
          FROM reach r JOIN graft_q93_edges p ON r.b = p.a
          WHERE r.depth < 10)
        SELECT a, b FROM reach ORDER BY a, b""")
    },
    Some(s"""WITH RECURSIVE ${ExtensionCorpus.sqlLshPairCtes},
      edges AS (SELECT a, MIN(b) AS b FROM pairs GROUP BY a),
      reach(a, b, depth) AS (SELECT a, b, 1 FROM edges
        UNION ALL SELECT r.a, p.b, r.depth + 1
        FROM reach r JOIN edges p ON r.b = p.a WHERE r.depth < 10)
      SELECT a, b FROM reach ORDER BY a, b""")
  )

  /** Spark 4 VARIANT surface: schema-less semi-structured parsing
    * (`parse_json` → VARIANT) with typed path extraction — the modern
    * alternative to from_json-with-schema (q76) when the shape isn't
    * known up front. Missing paths extract as typed NULL, present paths
    * as the requested type; binary-encoded at rest, no string re-parse
    * per access. */
  private val q94 = Q(
    "q94_variant_extract",
    (s, dir) =>
      fixture(s, dir, "events")
        .selectExpr(
          "event_id",
          "variant_get(parse_json(props), '$.k', 'int') AS k_val",
          "variant_get(parse_json(props), '$.missing', 'string') AS missing_val",
          "variant_get(parse_json(props), '$.k', 'int') * 2 AS k_doubled"
        )
        .orderBy(col("event_id")),
    Some("""SELECT event_id, CAST(props->>'$.k' AS INTEGER) AS k_val,
      props->>'$.missing' AS missing_val,
      CAST(props->>'$.k' AS INTEGER) * 2 AS k_doubled
      FROM events ORDER BY event_id""")
  )

  /** Multi-table LSH ANN: union of 2 seeded bucketings, distinct
    * candidates, exact re-rank. */
  private val q82 = Q(
    "q82_ann_multitable",
    (s, dir) => {
      val e = fixture(s, dir, "embeddings")
      graft.operators.Similarity.lshTopKMultiTable(
        e, e.filter(col("vec_id") < 10), "vec_id", "embedding",
        k = 5, bits = 4, dim = 64, tables = 2)
    },
    Some {
      val bucketSql = (seed: Long) => {
        val planes = graft.operators.Similarity.hyperplanes(dim = 64, bits = 4, seed)
        (0 until 4).map { b =>
          val proj = (0 until 64).map(i => s"emb[${i + 1}]*(${planes(b)(i)})").mkString(" + ")
          s"(CASE WHEN ($proj) > 0 THEN ${1L << b} ELSE 0 END)"
        }.mkString(" + ")
      }
      val tableSelects = (0 until 2).map { t =>
        s"""SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id
            FROM (SELECT vec_id, ${bucketSql(42L + t)} AS bkt FROM v WHERE vec_id < 10) q
            JOIN (SELECT vec_id, ${bucketSql(42L + t)} AS bkt FROM v) c
              ON q.bkt = c.bkt AND q.vec_id <> c.vec_id"""
      }.mkString(" UNION ")
      val cos = "(list_reduce(list_transform(list_zip(q.emb, c.emb), z -> struct_extract(z,1)*struct_extract(z,2)), (x,y) -> x+y)" +
        " / (sqrt(list_reduce(list_transform(q.emb, x -> x*x), (x,y) -> x+y))" +
        " * sqrt(list_reduce(list_transform(c.emb, x -> x*x), (x,y) -> x+y))))"
      s"""WITH v AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS emb FROM embeddings),
        p AS ($tableSelects),
        sc AS (SELECT p.query_id, p.neighbor_id, $cos AS score
               FROM p JOIN v q ON p.query_id = q.vec_id JOIN v c ON p.neighbor_id = c.vec_id),
        r AS (SELECT query_id, neighbor_id, score,
                ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY score DESC, neighbor_id) AS rk
              FROM sc)
        SELECT query_id, CAST(rk AS INTEGER) AS rk, neighbor_id, ROUND(score, 6) AS score
        FROM r WHERE rk <= 5 ORDER BY query_id, rk"""
    }
  )

  /** Corpus report card: one row of fleet-level statistics a curation
    * run logs before/after — doc and token volume, source/language
    * diversity, duplicate ratio, length percentiles. One aggregation
    * pass (partial-agg everything; the dup ratio rides on a distinct
    * count of the dedup digest). */
  private val q83 = Q(
    "q83_corpus_report",
    (s, dir) =>
      fixture(s, dir, "documents")
        .select(col("doc_id"), col("source"), col("lang"), col("text"),
          tokenCount(col("text")).as("n_tok"),
          md5(lower(trim(col("text")))).as("norm_digest"))
        .agg(
          count(lit(1)).as("n_docs"),
          sum(col("n_tok").cast("long")).as("total_tokens"),
          countDistinct(col("source")).as("n_sources"),
          countDistinct(col("lang")).as("n_langs"),
          round(lit(1.0) - countDistinct(col("norm_digest")).cast("double") / count(lit(1)), 6).as("dup_ratio"),
          expr("percentile(n_tok, 0.5)").as("p50_tokens"),
          expr("percentile(n_tok, 0.95)").as("p95_tokens")
        ),
    Some("""WITH t AS (SELECT doc_id, source, lang,
        len(string_split(text,' ')) AS n_tok, md5(lower(trim(text))) AS norm_digest FROM documents)
      SELECT COUNT(*) AS n_docs, CAST(SUM(n_tok) AS BIGINT) AS total_tokens,
        COUNT(DISTINCT source) AS n_sources, COUNT(DISTINCT lang) AS n_langs,
        ROUND(1.0 - CAST(COUNT(DISTINCT norm_digest) AS DOUBLE) / COUNT(*), 6) AS dup_ratio,
        QUANTILE_CONT(n_tok, 0.5) AS p50_tokens, QUANTILE_CONT(n_tok, 0.95) AS p95_tokens
      FROM t""")
  )

  /** Element-wise label centroids over the embeddings (decimal sums ->
    * partial-agg-order independent). */
  private val q84 = Q(
    "q84_label_centroids",
    (s, dir) =>
      graft.operators.Similarity.centroids(fixture(s, dir, "embeddings"), "label", "embedding")
        .orderBy(col("label"), col("dim")),
    Some("""WITH e AS (SELECT label, CAST(i - 1 AS INTEGER) AS dim,
        CAST(CAST(embedding[i] AS DOUBLE) AS DECIMAL(28,10)) AS x
      FROM embeddings, unnest(generate_series(1, len(embedding))) AS g(i))
      SELECT label, dim, ROUND(CAST(SUM(x) / COUNT(*) AS DOUBLE), 6) AS centroid, COUNT(*) AS n
      FROM e GROUP BY label, dim ORDER BY label, dim""")
  )

  /** Int8 scalar quantization of embeddings: scale, digest of the
    * quantized codes, and max reconstruction error. */
  private val q85 = Q(
    "q85_quantize_embeddings",
    (s, dir) => {
      import graft.functions.VectorFunctions._
      fixture(s, dir, "embeddings")
        .select(
          col("vec_id"),
          round(quantScale(col("embedding")), 6).as("scale"),
          md5(concat_ws(",", quantizeInt8(col("embedding")))).as("codes_md5"),
          round(quantError(col("embedding")), 6).as("max_err")
        )
        .orderBy(col("vec_id"))
    },
    Some("""WITH v AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS emb FROM embeddings),
      sc AS (SELECT vec_id, emb,
               CASE WHEN list_max(list_transform(emb, x -> abs(x))) > 0
                    THEN list_max(list_transform(emb, x -> abs(x))) / 127.0 END AS s FROM v),
      qz AS (SELECT vec_id, emb, s,
               list_transform(emb, x -> CAST(COALESCE(floor(x / s + 0.5), 0) AS INTEGER)) AS q FROM sc)
      SELECT vec_id, ROUND(s, 6) AS scale,
        md5(array_to_string(q, ',')) AS codes_md5,
        ROUND(list_max(list_transform(list_zip(q, emb),
          z -> abs(CAST(struct_extract(z,1) AS DOUBLE) * COALESCE(s, 0) - struct_extract(z,2)))), 6) AS max_err
      FROM qz ORDER BY vec_id""")
  )

  /** Heavy hitters (approx_top_k) over the token stream, EXACT-oracle
    * checked: the documents vocabulary is far below the sketch
    * capacity, so no purge ever occurs and the frequent-items counts
    * are exactly the true counts — the oracle is the plain exact
    * GROUP BY. Both sides rank by the same (count DESC, token) total
    * order, so even boundary ties cannot flip membership. At real
    * vocabulary scale the counts gain the documented over-estimate
    * bound and this becomes a rows-only audit — capacity is the dial;
    * the merge law that makes the per-source build safe is pinned in
    * SketchesSpec. */
  private val q103 = Q(
    "q103_heavy_hitters",
    (s, dir) =>
      graft.operators.Sketches.approxTopK(
        fixture(s, dir, "documents").select(explode(split(col("text"), " ")).as("token")),
        "token", k = 10, maxItemsTracked = 8192),
    Some("""WITH w AS (SELECT unnest(string_split(text,' ')) AS token FROM documents),
      c AS (SELECT token AS item, COUNT(*) AS cnt FROM w GROUP BY 1),
      r AS (SELECT item, cnt, ROW_NUMBER() OVER (ORDER BY cnt DESC, item) AS rk FROM c)
      SELECT CAST(rk AS INTEGER) AS rk, item, cnt FROM r WHERE rk <= 10 ORDER BY rk""")
  )

  /** Mergeable quantile sketches (build per (event_type, day), roll up
    * to event_type), EXACT-oracle checked: per-group value counts stay
    * below the sketch capacity at verify scale, so no compaction ever
    * occurs — the rollup's weighted disc quantile degenerates to the
    * exact `quantile_disc`, and exactness below capacity is
    * merge-ORDER-independent (merge is pure concat, the estimate sees
    * the full multiset), so the hash match is stable across task
    * scheduling. The probs are binary-representable (0.25/0.5/0.75) so
    * ceil(p·W) has no floating-point ambiguity; the selected values
    * are elements of the data (never interpolated sums), so both
    * engines return bit-identical doubles. Capacity is the dial:
    * beyond it, estimates carry the KLL rank-error bound and this
    * becomes a rows-only audit — the error bound and merge law are
    * pinned in SketchesSpec. */
  private val q104 = Q(
    "q104_quantile_sketch_rollup",
    (s, dir) => {
      val ev = fixture(s, dir, "events").withColumn("day", to_date(col("ts")))
      val fine = graft.operators.Sketches.quantileSketches(
        ev, Seq("event_type", "day"), "value", capacity = 32768)
      graft.operators.Sketches.quantileRollup(
        fine, Seq("event_type"),
        Seq(("p25", 0.25), ("p50", 0.5), ("p75", 0.75)), capacity = 32768)
        .orderBy(col("event_type"))
    },
    Some("""SELECT event_type, COUNT(*) AS n_rows,
      quantile_disc(value, 0.25) AS p25,
      quantile_disc(value, 0.50) AS p50,
      quantile_disc(value, 0.75) AS p75
      FROM events WHERE value IS NOT NULL
      GROUP BY event_type ORDER BY event_type""")
  )

  /** BM25 relevance against a fixed query-term set, exact-oracle
    * checked end-to-end: idf and per-term contributions follow the
    * q91 determinism contract (round(ln,8) → DECIMAL sums), everything
    * else is correctly-rounded IEEE arithmetic written in the same
    * parenthesization on both engines, and avgdl is an exact integer
    * sum divided once — so the full scorer (saturation, length
    * normalization, idf) hash-matches DuckDB bit-for-bit. */
  private val q105 = Q(
    "q105_bm25",
    (s, dir) =>
      graft.operators.Curation.bm25Scores(fixture(s, dir, "documents"), "doc_id", "text",
        Seq("spark", "query", "vector")).orderBy(col("doc_id")),
    Some("""WITH tok AS (SELECT doc_id, unnest(string_split(text,' ')) AS token FROM documents),
      dl AS (SELECT doc_id, COUNT(*) AS dl FROM tok GROUP BY doc_id),
      corpus AS (SELECT COUNT(*) AS n_docs, CAST(SUM(dl) AS DOUBLE)/COUNT(*) AS avgdl FROM dl),
      tf AS (SELECT doc_id, token, COUNT(*) AS tf FROM tok
             WHERE token IN ('spark','query','vector') GROUP BY doc_id, token),
      df AS (SELECT token, COUNT(*) AS df FROM tf GROUP BY token),
      idf AS (SELECT token, ROUND(ln((n_docs - df + 0.5)/(df + 0.5) + 1.0), 8) AS idf, avgdl
              FROM df, corpus),
      c AS (SELECT tf.doc_id,
              CAST(ROUND(idf * (tf * 2.2) / (tf + 1.2 * (1.0 - 0.75 + 0.75 * dl.dl / avgdl)), 8)
                AS DECIMAL(28,10)) AS contrib
            FROM tf JOIN idf USING (token) JOIN dl ON tf.doc_id = dl.doc_id)
      SELECT doc_id, CAST(COUNT(*) AS INTEGER) AS n_terms,
        ROUND(CAST(SUM(contrib) AS DOUBLE), 6) AS score
      FROM c GROUP BY doc_id ORDER BY doc_id""")
  )

  /** Weighted sampling (Efraimidis–Spirakis), exact-oracle: the
    * hash-derived uniform, the −ln(u)/w key (rounded per the q91 ln
    * contract), and the (key, id) top-k are all replayed verbatim in
    * SQL, so the hash match pins the exact DRAW, not just the row
    * count. Weight = n_chars: longer documents proportionally more
    * likely, the quality/temperature-weighted subsample shape. */
  private val q110 = Q(
    "q110_weighted_sample",
    (s, dir) =>
      graft.operators.Curation.weightedSample(
        fixture(s, dir, "documents").select(col("doc_id"), col("n_chars")),
        "doc_id", "n_chars", k = 100)
        .orderBy(col("skey"), col("doc_id")),
    Some("""WITH w AS (SELECT doc_id, n_chars,
        ROUND(-ln((CAST(('0x' || substr(md5('aes' || CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT) + 0.5)
                  / 4294967296.0) / CAST(n_chars AS DOUBLE), 8) AS skey
      FROM documents WHERE n_chars IS NOT NULL AND n_chars > 0)
      SELECT doc_id, n_chars, skey FROM w ORDER BY skey, doc_id LIMIT 100""")
  )

  /** The FULL curation recipe with the embedding-space stages, exact:
    * quality → exact dedup → semantic dedup over the survivors'
    * embeddings (seed cells drawn from the SURVIVOR set — the oracle's
    * centroid CTE filters after the dedup CTEs, exactly like the
    * operator's semi-join) → per-source caps by token count →
    * deterministic split → source mixing. Composes q81's chain with
    * q112's assignment/pairing CTEs and q115's rank — the whole
    * decision replayed in one SQL statement. Stage order is the
    * contract under test: caps are decided on the post-dedup
    * population, splits on the capped one. */
  private val q120 = Q(
    "q120_curate_embeddings",
    (s, dir) => {
      val docs = fixture(s, dir, "documents")
      val emb = fixture(s, dir, "embeddings")
      Curation.curateWithEmbeddings(docs, "doc_id", "text", "source",
        emb, "vec_id", "embedding",
        numCells = 16, simThreshold = 0.3, maxPerSource = 8,
        ratesPerMille = Map("src0" -> 500))
        .select(col("doc_id"), col("source"), col("split"))
        .orderBy(col("doc_id"))
    },
    Some(s"""WITH q AS (SELECT * FROM documents
        WHERE (length(text) BETWEEN 100 AND 2000)
          AND (len(string_split(text, ' ')) BETWEEN 10 AND 500)
          AND ((CAST(length(replace(text, ' ', '')) AS DOUBLE) / len(string_split(text, ' '))) BETWEEN 2.0 AND 12.0)
          AND ($sqlEnScore > 0)),
      k AS (SELECT MIN(doc_id) AS doc_id FROM q GROUP BY md5(lower(trim(text)))),
      d AS (SELECT q.* FROM q JOIN k USING (doc_id)),
      v AS (${ExtensionCorpus.sqlVecView}),
      se AS (SELECT v.* FROM v JOIN d ON v.vec_id = d.doc_id),
      n AS (SELECT vec_id, emb,
              sqrt(list_reduce(list_transform(emb, x -> x*x), (x,y) -> x+y)) AS nrm FROM se),
      cent AS (SELECT vec_id AS cell_id, emb AS cemb, nrm AS cnrm FROM n WHERE vec_id < 16),
      asg AS (SELECT vec_id, emb, nrm, cell_id FROM (
        SELECT x.vec_id, x.emb, x.nrm, cent.cell_id,
          ROW_NUMBER() OVER (PARTITION BY x.vec_id ORDER BY
            (list_reduce(list_transform(list_zip(x.emb, cent.cemb), p -> struct_extract(p,1)*struct_extract(p,2)), (a,b) -> a+b)
             / (x.nrm * cent.cnrm)) DESC, cell_id DESC) AS rn
        FROM n x, cent) WHERE rn = 1),
      dropped AS (SELECT DISTINCT pb.vec_id AS id
        FROM asg pa JOIN asg pb ON pa.cell_id = pb.cell_id AND pa.vec_id < pb.vec_id
        WHERE (list_reduce(list_transform(list_zip(pa.emb, pb.emb), p -> struct_extract(p,1)*struct_extract(p,2)), (x,y) -> x+y)
               / (pa.nrm * pb.nrm)) > 0.3),
      sem AS (SELECT * FROM d WHERE doc_id NOT IN (SELECT id FROM dropped)),
      cap AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY source
                ORDER BY len(string_split(text, ' ')) DESC, doc_id) AS rk FROM sem),
      c2 AS (SELECT * FROM cap WHERE rk <= 8),
      h AS (SELECT *, ${sqlHash32("CAST(doc_id AS VARCHAR)")} AS hv FROM c2)
      SELECT doc_id, source,
        CASE WHEN hv % 100 < 80 THEN 'train' WHEN hv % 100 < 90 THEN 'val' ELSE 'test' END AS split
      FROM h
      WHERE hv % 1000 < (CASE source WHEN 'src0' THEN 500 ELSE 1000 END)
      ORDER BY doc_id""")
  )

  /** Temperature mixing, hash-exact: lineitem rows balanced across
    * return-flag "sources" at α = 0.5 (N holds ~half the rows and gets
    * down-sampled hardest; the smallest flag keeps everything). The
    * oracle replays the rate derivation (POW → normalized → ROUND 8)
    * and the per-row hash-uniform decision verbatim; per-flag counts
    * are sensitive to every row's keep/drop, so the hash match pins
    * the whole draw. Row id = orderkey·10 + linenumber (unique). */
  private val q124 = Q(
    "q124_temperature_mix",
    (s, dir) => {
      val li = fixture(s, dir, "lineitem")
        .withColumn("row_id", col("l_orderkey") * 10 + col("l_linenumber"))
      Curation.temperatureMix(li, "row_id", "l_returnflag", alpha = 0.5)
        .groupBy(col("l_returnflag"))
        .agg(count(lit(1)).as("n_kept"))
        .orderBy(col("l_returnflag"))
    },
    Some(s"""WITH li AS (SELECT *, l_orderkey * 10 + l_linenumber AS row_id FROM lineitem),
      c AS (SELECT l_returnflag, COUNT(*) AS n FROM li GROUP BY l_returnflag),
      r AS (SELECT l_returnflag,
              ROUND(POW(CAST(n AS DOUBLE), -0.5)
                    / (SELECT MAX(POW(CAST(n AS DOUBLE), -0.5)) FROM c), 8) AS rate FROM c)
      SELECT li.l_returnflag, COUNT(*) AS n_kept
      FROM li JOIN r USING (l_returnflag)
      WHERE ((${sqlHash32("'tmix' || CAST(row_id AS VARCHAR)")} + 0.5) / 4294967296.0) < rate
      GROUP BY li.l_returnflag ORDER BY li.l_returnflag""")
  )

  /** Per-source document cap (the domain-cap curation step), exact:
    * keep the 10 longest-by-token-count docs per source, deterministic
    * (n_tokens DESC, doc_id) rank — the oracle replays the token count
    * (len of the space split, the q68 convention) and the window rank
    * verbatim. Output is bounded by |sources|·10 whatever the source
    * skew. */
  private val q115 = Q(
    "q115_per_group_cap",
    (s, dir) => {
      val d = fixture(s, dir, "documents")
        .withColumn("n_tokens", graft.functions.TextFunctions.tokenCount(col("text")))
      graft.operators.Curation.capPerGroup(d, "source", col("n_tokens"), "doc_id", n = 10)
        .select(col("doc_id"), col("source"), col("n_tokens"), col("rk"))
        .orderBy(col("source"), col("rk"))
    },
    Some("""WITH t AS (SELECT doc_id, source,
        CAST(len(string_split(text, ' ')) AS INTEGER) AS n_tokens FROM documents),
      r AS (SELECT doc_id, source, n_tokens,
        CAST(ROW_NUMBER() OVER (PARTITION BY source ORDER BY n_tokens DESC, doc_id) AS INTEGER) AS rk
      FROM t)
      SELECT doc_id, source, n_tokens, rk FROM r WHERE rk <= 10
      ORDER BY source, rk""")
  )

  /** Token-budget sampling: absolute per-source budgets (the FineWeb/
    * Dolma assembly step `mixSources`' proportions can't express).
    * Three regimes pinned at once: a small budget (src0, partial keep),
    * an over-sized budget (src1, keeps everything), and the default
    * budget for the other 18 sources. The oracle replays the
    * hash-ordered running sum and the strictly-before budget test
    * verbatim — hash-exact on doc counts AND kept-token sums. */
  private val q129 = Q(
    "q129_token_budget_sample",
    (s, dir) =>
      Curation.tokenBudgetSample(fixture(s, dir, "documents"), "doc_id", "source", "n_chars",
          budgets = Map("src0" -> 3000L, "src1" -> 100000L), defaultBudget = 1500L)
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_docs"),
          sum(when(col("kept"), 1L).otherwise(0L)).as("n_kept"),
          sum(when(col("kept"), col("n_chars")).otherwise(0L)).as("chars_kept"))
        .orderBy(col("source")),
    Some(s"""WITH ord AS (
        SELECT doc_id, source, n_chars,
          COALESCE(SUM(n_chars) OVER (PARTITION BY source
            ORDER BY ${sqlHash32("'budget' || CAST(doc_id AS VARCHAR)")}, doc_id
            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cum_before
        FROM documents),
      k AS (SELECT source, n_chars, cum_before,
          CASE source WHEN 'src0' THEN 3000 WHEN 'src1' THEN 100000 ELSE 1500 END AS budget
        FROM ord)
      SELECT source, COUNT(*) AS n_docs,
        CAST(SUM(CASE WHEN cum_before < budget THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
        CAST(SUM(CASE WHEN cum_before < budget THEN n_chars ELSE 0 END) AS BIGINT) AS chars_kept
      FROM k GROUP BY source ORDER BY source""")
  )

  /** DSIR-style importance resampling (Xie et al. 2023, a published
    * data-selection method), hash-exact end-to-end: fit Laplace-
    * smoothed hashed-n-gram (unigram+bigram → 4096 md5-hashed cells)
    * multinomials for a TARGET domain (two sources) and the RAW pool,
    * weight every raw doc by its summed cell log-ratio, then Gumbel-
    * top-k resample on the log weights with the corpus's standard
    * hash-uniform draw. DuckDB replays featurization, both model fits,
    * the λ table (incl. zero-count smoothing cells), the DECIMAL
    * weight sums AND the draw itself — so the match pins the exact
    * selected subset, not just the scores. All broadcast-sized model
    * state (4096 rows); the pool is touched by two exploded partial
    * aggregates and one broadcast join — the shape that holds at
    * 100 TB. */
  private val q134 = Q(
    "q134_dsir_resample",
    (s, dir) => {
      val docs = fixture(s, dir, "documents")
      Curation.dsirResample(docs,
          docs.filter(col("source").isin("src0", "src1")),
          "doc_id", "text", k = 200, buckets = 4096)
        .select(col("doc_id"), col("n_grams"),
          round(col("logw").cast("double"), 6).as("logw"), col("draw"))
        .orderBy(desc("draw"), col("doc_id"))
    },
    Some("""WITH tgt AS (SELECT text FROM documents WHERE source IN ('src0','src1')),
      tg AS (SELECT unnest(list_concat(string_split(text,' '),
               list_transform(range(1, len(string_split(text,' '))),
                 i -> array_to_string(string_split(text,' ')[i:i+1], ' ')))) AS g FROM tgt),
      rg AS (SELECT doc_id, unnest(list_concat(string_split(text,' '),
               list_transform(range(1, len(string_split(text,' '))),
                 i -> array_to_string(string_split(text,' ')[i:i+1], ' ')))) AS g FROM documents),
      tb AS (SELECT CAST(('0x' || substr(md5(g),1,8)) AS BIGINT) % 4096 AS b, COUNT(*) AS tc
             FROM tg GROUP BY 1),
      rb AS (SELECT CAST(('0x' || substr(md5(g),1,8)) AS BIGINT) % 4096 AS b, COUNT(*) AS rc
             FROM rg GROUP BY 1),
      tn AS (SELECT SUM(tc) AS tn FROM tb),
      rn AS (SELECT SUM(rc) AS rn FROM rb),
      lam AS (SELECT r.range AS b,
               CAST(ROUND(ln((COALESCE(tb.tc,0)+1) / CAST(tn.tn+4096 AS DOUBLE)), 8)
                  - ROUND(ln((COALESCE(rb.rc,0)+1) / CAST(rn.rn+4096 AS DOUBLE)), 8)
                  AS DECIMAL(28,10)) AS lambda
              FROM range(4096) r
              LEFT JOIN tb ON tb.b = r.range LEFT JOIN rb ON rb.b = r.range, tn, rn),
      w AS (SELECT doc_id, CAST(COUNT(*) AS INTEGER) AS n_grams, SUM(lambda) AS logw
            FROM (SELECT doc_id, CAST(('0x' || substr(md5(g),1,8)) AS BIGINT) % 4096 AS b FROM rg) d
            JOIN lam USING (b) GROUP BY doc_id),
      drawn AS (SELECT doc_id, n_grams,
                 ROUND(CAST(logw AS DOUBLE), 6) AS logw,
                 ROUND(CAST(logw AS DOUBLE)
                   - ln(-ln((CAST(('0x' || substr(md5('dsir' || CAST(doc_id AS VARCHAR)),1,8)) AS BIGINT) + 0.5) / 4294967296.0)), 6) AS draw
                FROM w)
      SELECT doc_id, n_grams, logw, draw FROM drawn
      ORDER BY draw DESC, doc_id LIMIT 200""")
  )

  /** LEAKAGE-SAFE train/val split (X117), oracle-pinned end to end:
    * near-dup clusters from the SAME LSH pair chain as q71, every
    * document assigned by a deterministic md5 bucket of its CLUSTER
    * representative — so a near-duplicate pair can never straddle the
    * split. The DuckDB oracle replays the pair CTEs, the recursive
    * transitive closure, the representative join AND the hash bucket,
    * hash-matching the full assignment (the straddle-impossibility is
    * additionally asserted directly in CurationSpec). */
  private val q142 = Q(
    "q142_leakage_safe_split",
    (s, dir) => {
      val docs = fixture(s, dir, "documents")
      val pairs = Dedup.lshCandidatePairs(docs, "doc_id", "text", numHashes = 8, bands = 4)
      Curation.leakageSafeSplit(docs, "doc_id", pairs, valPermille = 200)
        .select(col("doc_id"), col("rep"), col("split"))
        .orderBy(col("doc_id"))
    },
    Some(s"""WITH RECURSIVE ${ExtensionCorpus.sqlLshPairCtes},
      e AS (SELECT a, b FROM pairs UNION SELECT b, a FROM pairs),
      reach(src, dst) AS (SELECT a, b FROM e
        UNION SELECT e.a, r.dst FROM e JOIN reach r ON e.b = r.src),
      n AS (SELECT DISTINCT a AS id FROM e),
      comp AS (SELECT id, LEAST(id, MIN(dst)) AS comp FROM n JOIN reach ON reach.src = n.id
               GROUP BY id)
      SELECT d.doc_id, COALESCE(c.comp, d.doc_id) AS rep,
        CASE WHEN (CAST(('0x' || substr(md5('split' || CAST(COALESCE(c.comp, d.doc_id) AS VARCHAR)),1,8)) AS BIGINT) % 1000) < 200
             THEN 'val' ELSE 'train' END AS split
      FROM documents d LEFT JOIN comp c ON c.id = d.doc_id
      ORDER BY d.doc_id""")
  )

  val all: Seq[Q] = Seq(q56, q57, q58, q59, q60, q61, q62, q63, q64, q65, q66, q67, q68, q69, q70,
    q71, q72, q73, q74, q75, q76, q77, q78, q79, q80, q81, q82, q83, q84, q85, q89, q90, q91,
    q92, q93, q94, q103, q104, q105, q110, q115, q120, q124, q129, q134, q142)
}
