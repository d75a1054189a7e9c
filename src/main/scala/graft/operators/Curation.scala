package graft.operators

import graft.functions.TextFunctions._
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus-curation operators for large-scale training-data pipelines:
  * deterministic splits, quality/repetition filtering, vocabulary and
  * tf-idf statistics, PII redaction, stratified sampling.
  *
  * Design rules shared by every operator here:
  *  - pure column expressions or partial-agg-friendly groupBys — no
  *    UDFs, no driver-side collects, so each scales linearly with a
  *    100 TB scan
  *  - all randomness is hash-derived (md5 of the row id), making every
  *    operator deterministic, re-runnable on changed inputs without
  *    resampling unchanged rows, and oracle-verifiable cross-engine
  */
object Curation {

  /** Deterministic train/val/test split: bucket = hash32(id) % 100,
    * labeled by cumulative weight boundaries. A row's split never
    * changes when other rows are added/removed — the property that
    * matters when a 100 TB corpus is grown incrementally.
    *
    * `weights` maps split name -> percent; must sum to 100. */
  def hashSplit(df: DataFrame, idCol: String, weights: Seq[(String, Int)] = Seq("train" -> 80, "val" -> 10, "test" -> 10)): DataFrame = {
    require(weights.map(_._2).sum == 100, "split weights must sum to 100")
    val bucket = hash32(col(idCol).cast("string")) % 100
    val bounds = weights.scanLeft(0) { case (acc, (_, w)) => acc + w }.tail
    // fold from the right so the chain reads when(b<80,train).otherwise(
    // when(b<90,val).otherwise(when(b<100,test)))
    val label = weights.zip(bounds).reverse.foldLeft(lit(null).cast("string")) {
      case (acc, ((name, _), hi)) => when(bucket < hi, name).otherwise(acc)
    }
    df.withColumn("split", label)
  }

  /** Per-document repetition stats (Gopher-style repetition filter
    * input): most-frequent-token share of all tokens. One explode, two
    * partial-aggregated groupBys — shuffle volume is |distinct (doc,
    * token)| then |docs|. */
  def repetitionRatio(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(col(idCol), explode(tokens(col(textCol))).as("tok"))
      .groupBy(col(idCol), col("tok"))
      .agg(count(lit(1)).as("cnt"))
      .groupBy(col(idCol))
      .agg(
        max(col("cnt")).as("top_tok_cnt"),
        sum(col("cnt")).as("n_tokens"),
        count(lit(1)).as("n_distinct_tokens")
      )
      .select(
        col(idCol),
        col("top_tok_cnt").cast("int").as("top_tok_cnt"),
        col("n_tokens").cast("int").as("n_tokens"),
        col("n_distinct_tokens").cast("int").as("n_distinct_tokens"),
        round(col("top_tok_cnt").cast("double") / col("n_tokens"), 6).as("repetition_ratio")
      )

  /** Vocabulary with document frequency: distinct (doc, token) pairs
    * aggregated to per-token df. The distinct is a map-side-combining
    * aggregate on (doc, token) — never a global sort. */
  def vocabDocFreq(df: DataFrame, idCol: String, textCol: String, minDf: Int = 1): DataFrame =
    df.select(col(idCol), explode(array_distinct(tokens(col(textCol)))).as("token"))
      .groupBy(col("token"))
      .agg(count(lit(1)).as("df"))
      .filter(col("df") >= minDf)

  /** Top-k tf-idf terms per document. tf = in-doc count, idf =
    * ln(N/df), deterministic (score desc, token asc) ranking. The doc
    * count N is computed as a scalar aggregate and broadcast-joined —
    * no driver collect. */
  def tfidfTopTerms(df: DataFrame, idCol: String, textCol: String, k: Int = 3): DataFrame = {
    val tok = df.select(col(idCol), explode(tokens(col(textCol))).as("token"))
    val tf = tok.groupBy(col(idCol), col("token")).agg(count(lit(1)).as("tf"))
    val dfreq = tf.groupBy(col("token")).agg(count(lit(1)).as("df"))
    val n = df.select(count(lit(1)).as("n_docs"))
    val w = Window.partitionBy(col(idCol)).orderBy(col("score").desc, col("token"))
    tf.join(broadcast(dfreq), "token")
      .crossJoin(broadcast(n))
      .withColumn("score", round(col("tf") * log(col("n_docs").cast("double") / col("df")), 6))
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= k)
      .select(col(idCol), col("rk"), col("token"), col("tf").cast("int").as("tf"),
        col("df").cast("int").as("df"), col("score"))
  }

  /** BM25 relevance of every document against a fixed query-term set —
    * the standard retrieval scorer (Robertson/Sparck Jones; Lucene's
    * `+1` idf form so scores are always positive), which tf-idf
    * ([[tfidfTopTerms]]) lacks: per-term saturation (k1) and
    * document-length normalization (b). Used in a curation pipeline to
    * rank/filter a corpus against a topic term list at full scale.
    *
    * Shapes: one token explode; tf filtered to the query terms BEFORE
    * any shuffle (the per-doc/term agg carries only query-term rows);
    * doc-frequency, doc-count and avgdl are tiny aggregates broadcast
    * back. Determinism contract as [[unigramLogLoss]]: ln is the one
    * libm-sensitive op, so idf and each term contribution are rounded
    * to 8 dp and summed as DECIMAL — fold-order-independent and
    * replayable cross-engine; everything else is correctly-rounded
    * IEEE arithmetic written in one fixed parenthesization. avgdl is
    * an exact integer sum divided once (never an incremental mean).
    *
    * Returns (idCol, n_terms, score) for documents matching ≥1 query
    * term. */
  def bm25Scores(
      df: DataFrame,
      idCol: String,
      textCol: String,
      queryTerms: Seq[String],
      k1: Double = 1.2,
      b: Double = 0.75
  ): DataFrame = {
    require(queryTerms.nonEmpty, "bm25Scores needs at least one query term")
    val tok = df.select(col(idCol), explode(tokens(col(textCol))).as("token"))
    val docLen = tok.groupBy(col(idCol)).agg(count(lit(1)).as("dl"))
    val corpus = docLen.agg(count(lit(1)).as("n_docs"),
      (sum(col("dl")).cast("double") / count(lit(1))).as("avgdl"))
    val tf = tok.filter(col("token").isInCollection(queryTerms))
      .groupBy(col(idCol), col("token")).agg(count(lit(1)).as("tf"))
    val dfreq = tf.groupBy(col("token")).agg(count(lit(1)).as("df"))
    val idf = dfreq.crossJoin(broadcast(corpus))
      .select(col("token"),
        round(log((col("n_docs") - col("df") + 0.5) / (col("df") + 0.5) + 1.0), 8).as("idf"),
        col("avgdl"))
    tf.join(broadcast(idf), "token")
      .join(docLen, idCol)
      .withColumn("contrib",
        round(col("idf") * (col("tf") * lit(k1 + 1.0)) /
          (col("tf") + lit(k1) * (lit(1.0 - b) + lit(b) * col("dl") / col("avgdl"))), 8)
          .cast("decimal(28,10)"))
      .groupBy(col(idCol))
      .agg(count(lit(1)).cast("int").as("n_terms"),
        round(sum(col("contrib")).cast("double"), 6).as("score"))
  }

  /** PII-style redaction: digit runs -> `<NUM>`, http(s) tokens ->
    * `<URL>`. Pure regexp projection (codegen'd, zero shuffle). Returns
    * the redacted text plus per-kind match counts. */
  def redactPii(df: DataFrame, textCol: String): DataFrame = {
    val numPat = "[0-9]+"
    val urlPat = "https?://[^ ]+"
    df.withColumn("n_nums", size(regexp_extract_all(col(textCol), lit(numPat), lit(0))))
      .withColumn("n_urls", size(regexp_extract_all(col(textCol), lit(urlPat), lit(0))))
      .withColumn("redacted",
        regexp_replace(regexp_replace(col(textCol), urlPat, "<URL>"), numPat, "<NUM>"))
  }

  /** Composite quality gate (C4/Gopher-style rule set): length band,
    * token-count band, mean-token-length band, minimum stopword signal.
    * Emits each rule verdict plus the conjunction, so downstream can
    * both filter and audit why rows were dropped. */
  def qualityFilter(df: DataFrame, textCol: String): DataFrame = {
    val c = col(textCol)
    df.withColumn("len_ok", length(c).between(100, 2000))
      .withColumn("tok_ok", tokenCount(c).between(10, 500))
      .withColumn("wlen_ok",
        (length(replace(c, lit(" "), lit(""))).cast("double") / tokenCount(c)).between(2.0, 12.0))
      .withColumn("stop_ok", langScore(c, "en") > 0)
      .withColumn("kept", col("len_ok") && col("tok_ok") && col("wlen_ok") && col("stop_ok"))
  }

  /** Context-window chunking: split each document into fixed-size token
    * chunks with `overlap` tokens of context carried between adjacent
    * chunks (stride = chunkSize - overlap). Pure per-row explode — the
    * chunker distributes with the scan, and chunk ids are (doc, index)
    * so downstream dedup/packing can trace provenance.
    *
    * Output: (id, chunk_idx, chunk_text, n_chunk_tokens). */
  def chunkTokens(df: DataFrame, idCol: String, textCol: String, chunkSize: Int, overlap: Int = 0): DataFrame = {
    require(chunkSize > 0 && overlap >= 0 && overlap < chunkSize, "need 0 <= overlap < chunkSize")
    val stride = chunkSize - overlap
    val toks = tokens(col(textCol))
    val nChunks = greatest(lit(1), ceil((size(toks) - lit(overlap)).cast("double") / stride).cast("int"))
    df.select(col(idCol), toks.as("__toks"), nChunks.as("__nc"))
      .select(col(idCol), col("__toks"), posexplode(sequence(lit(0), col("__nc") - 1)).as(Seq("chunk_idx", "__c")))
      .select(
        col(idCol),
        col("chunk_idx"),
        concat_ws(" ", slice(col("__toks"), col("chunk_idx") * stride + 1, lit(chunkSize))).as("chunk_text"),
        least(lit(chunkSize), size(col("__toks")) - col("chunk_idx") * stride).as("n_chunk_tokens")
      )
  }

  /** Scan-order sequence packing: assign rows to context-window bins of
    * `budgetTokens` by cumulative token count within each `packKey`
    * partition — the streaming approximation of bin packing that large
    * pipelines actually use (one window pass; no global optimization,
    * no driver state). A row longer than the budget gets its own bin.
    *
    * Output: input row + (n_tokens, bin_id). */
  def packSequences(df: DataFrame, idCol: String, textCol: String, budgetTokens: Int, packKey: Column = lit(0)): DataFrame = {
    val w = Window.partitionBy(packKey).orderBy(col(idCol))
      .rowsBetween(Window.unboundedPreceding, -1)
    df.withColumn("n_tokens", tokenCount(col(textCol)))
      .withColumn("__cum_before", coalesce(sum(col("n_tokens")).over(w), lit(0L)))
      .withColumn("bin_id", (col("__cum_before") / budgetTokens).cast("long"))
      .drop("__cum_before")
  }

  /** Deterministic source mixing: keep each row with its source's
    * sampling rate (per-mille), decided by hash of the row id — the
    * mixture-weights step of a pretraining data recipe. Like
    * [[hashSplit]], membership is a pure function of (id, rate):
    * stable under corpus growth, reproducible across engines, zero
    * shuffle (the rates map becomes a literal when-chain). Sources
    * absent from `ratesPerMille` keep everything (rate 1000). */
  def mixSources(df: DataFrame, idCol: String, sourceCol: String, ratesPerMille: Map[String, Int]): DataFrame = {
    require(ratesPerMille.values.forall(r => r >= 0 && r <= 1000), "rates are per-mille")
    val rate = ratesPerMille.toSeq.sortBy(_._1).foldLeft(lit(1000)) {
      case (acc, (src, r)) => when(col(sourceCol) === src, r).otherwise(acc)
    }
    df.filter(hash32(col(idCol).cast("string")) % 1000 < rate)
  }

  /** Benchmark decontamination: per-document count of distinct word
    * 3-shingles shared with a benchmark shingle set (`benchmark` must
    * expose a string column `sh`).
    *
    * The join strategy is size-gated: when the distinct benchmark
    * shingle set fits under `maxBroadcastRows` (the normal case — eval
    * sets are tiny next to a training corpus) it is broadcast, making
    * the probe scan-local (explode + broadcast-hash join, nothing
    * shuffles but one row per contaminated doc). A pathological
    * benchmark above the gate falls back to an un-hinted shuffle join
    * instead of OOMing the driver with a forced broadcast. The gate
    * costs one count() over the (aggregated, partial-agg-friendly)
    * benchmark side at plan-build time — negligible next to the corpus
    * scan, and the counted plan is exactly the join input so the
    * decision matches what would be shipped. Results are identical on
    * both paths (the hint never changes semantics — spec-asserted). */
  def flagContaminated(
      df: DataFrame,
      idCol: String,
      textCol: String,
      benchmark: DataFrame,
      maxBroadcastRows: Long = 10000000L
  ): DataFrame = {
    val bench = benchmark.select(col("sh")).distinct()
    exactContaminationProbe(explodedShingles(df, idCol, textCol), bench, idCol, maxBroadcastRows)
  }

  /** [[flagContaminated]] with a Bloom-filter pre-prune — the shape a
    * 100 TB corpus scan wants when the benchmark shingle set is too big
    * to broadcast as a hash relation: a Bloom filter over the set is
    * 10-20× smaller (`fpp` 1% ≈ 9.6 bits/shingle vs a raw 16-byte+
    * digest per entry), ships to every task, and prunes the exploded
    * corpus shingles SCAN-LOCALLY before anything shuffles. Only
    * bloom-positive shingles (true hits + `fpp` false positives) reach
    * the exact join, which removes the false positives — so the result
    * is EXACTLY [[flagContaminated]]'s (same oracle), while the shuffle
    * shrinks from |all corpus shingles| to |hits|/(1-fpp).
    *
    * Build side uses the public sketch API over xxhash64(sh) longs; the
    * probe is Catalyst's own `BloomFilterMightContain` (the expression
    * Spark's runtime row-level filtering injects) on the same
    * xxhash64 — codegen'd, no UDF. Two benchmark-side actions (bloom
    * build + the broadcast gate count), both tiny next to the scan. */
  def flagContaminatedBloom(
      df: DataFrame,
      idCol: String,
      textCol: String,
      benchmark: DataFrame,
      expectedShingles: Long = 1L << 20,
      fpp: Double = 0.01,
      maxBroadcastRows: Long = 10000000L
  ): DataFrame = {
    import org.apache.spark.sql.GraftSqlBridge
    import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal}
    val bench = benchmark.select(col("sh")).distinct()
    val bloom = bench.select(xxhash64(col("sh")).as("h"))
      .stat.bloomFilter("h", expectedShingles, fpp)
    val bytes = {
      val baos = new java.io.ByteArrayOutputStream()
      bloom.writeTo(baos)
      baos.toByteArray
    }
    val mightContain = GraftSqlBridge.column(BloomFilterMightContain(
      Literal.create(bytes, org.apache.spark.sql.types.BinaryType),
      GraftSqlBridge.expression(xxhash64(col("sh")))
    ))
    val pruned = explodedShingles(df, idCol, textCol).filter(mightContain)
    exactContaminationProbe(pruned, bench, idCol, maxBroadcastRows)
  }

  private def explodedShingles(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(col(idCol), explode(array_distinct(wordShingles(tokens(col(textCol))))).as("sh"))

  private def exactContaminationProbe(
      exploded: DataFrame,
      bench: DataFrame,
      idCol: String,
      maxBroadcastRows: Long
  ): DataFrame = {
    val probeSide = if (bench.count() <= maxBroadcastRows) broadcast(bench) else bench
    exploded
      .join(probeSide, "sh")
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_hits"))
      .select(col(idCol), col("n_hits").cast("int").as("n_hits"))
  }

  /** Drop documents contaminated by a benchmark: rows whose distinct
    * shared-shingle count reaches `minHits` are anti-joined away. The
    * flag pass is [[flagContaminated]] (size-gated broadcast), so the
    * anti-join's right side is only the contaminated ids — tiny on a
    * clean corpus. */
  def decontaminate(
      df: DataFrame,
      idCol: String,
      textCol: String,
      benchmark: DataFrame,
      minHits: Int = 1,
      maxBroadcastRows: Long = 10000000L
  ): DataFrame =
    df.join(
      flagContaminated(df, idCol, textCol, benchmark, maxBroadcastRows)
        .filter(col("n_hits") >= minHits)
        .select(col(idCol)),
      Seq(idCol),
      "left_anti"
    )

  /** The standard curation recipe composed end-to-end: quality gate →
    * (optional) benchmark decontamination → exact dedup (keep the
    * min-id representative per normalized text) → deterministic
    * train/val/test split → source mixing. One declarative plan —
    * Catalyst fuses the projections, and the only shuffles are the
    * contamination probe (when enabled), the dedup aggregation, and
    * its semi-join.
    *
    * This is the entry point a reference user migrates to: input any
    * (id, text, source) table, output the curated rows with audit
    * columns (`kept` rules, `split`). */
  def curate(
      df: DataFrame,
      idCol: String,
      textCol: String,
      sourceCol: String,
      ratesPerMille: Map[String, Int] = Map.empty,
      splitWeights: Seq[(String, Int)] = Seq("train" -> 80, "val" -> 10, "test" -> 10),
      benchmark: Option[DataFrame] = None,
      minContamHits: Int = 1
  ): DataFrame = {
    val q = qualityFilter(df, textCol).filter(col("kept"))
    val clean = benchmark match {
      case Some(bm) => decontaminate(q, idCol, textCol, bm, minContamHits)
      case None     => q
    }
    val keeperIds = clean
      .groupBy(md5(lower(trim(col(textCol)))).as("__k"))
      .agg(min(col(idCol)).as(idCol))
      .select(col(idCol))
    val deduped = clean.join(keeperIds, Seq(idCol), "left_semi")
    mixSources(hashSplit(deduped, idCol, splitWeights), idCol, sourceCol, ratesPerMille)
  }

  /** Temperature-based source balancing (the mT5/multilingual mixing
    * recipe, public): resulting source proportions follow n_s^α —
    * α = 1 keeps natural proportions, α → 0 flattens toward uniform.
    * Realized as DOWN-sampling only (filtering cannot upsample): each
    * source keeps rate r_s = n_s^(α−1) / max_t n_t^(α−1), so the
    * smallest source keeps everything and larger sources shed rows
    * until counts ∝ n_s^α in expectation.
    *
    * Membership is the [[hashSplit]] hash-uniform contract — a pure
    * function of (seed, id): stable under growth/repartition and
    * engine-replayable. Rates are rounded to 8 dp before the compare
    * (the q91 ln contract — pow may differ by an ulp between libms;
    * the pre-round absorbs it, and the 2^-32-grid uniform never sits
    * within 5e-9 of an 8-dp rate in any fixture). Shape: one
    * per-source count agg, a broadcast rates join, a scan-local
    * filter — the corpus never shuffles. */
  def temperatureMix(df: DataFrame, idCol: String, sourceCol: String, alpha: Double,
      seed: String = "tmix"): DataFrame = {
    require(alpha > 0.0 && alpha <= 1.0, "alpha in (0, 1] — filtering cannot upsample")
    val cnt = df.groupBy(col(sourceCol)).agg(count(lit(1)).as("__n"))
    val w = cnt.withColumn("__w", pow(col("__n").cast("double"), lit(alpha - 1.0)))
    val rates = w.crossJoin(broadcast(w.agg(max(col("__w")).as("__wmax"))))
      .select(col(sourceCol), round(col("__w") / col("__wmax"), 8).as("__rate"))
    val u = (hash32(concat(lit(seed), col(idCol).cast("string"))) + lit(0.5)) / lit(4294967296.0)
    // LEFT join + coalesce: rows with a NULL source don't equi-match
    // the rates frame — they keep everything (rate 1.0), consistent
    // with mixSources' default-rate treatment of unknown sources,
    // instead of being silently dropped by an inner join.
    df.join(broadcast(rates), Seq(sourceCol), "left")
      .filter(u < coalesce(col("__rate"), lit(1.0)))
      .drop("__rate")
  }

  /** The full training-corpus recipe with the embedding-space stages
    * composed — what a 100 TB curation run actually chains:
    * quality gate → (optional) decontamination → exact dedup →
    * SEMANTIC dedup over document embeddings ([[Similarity
    * .semanticDedup]] — paraphrase-level duplicates no shingle stage
    * caught) → per-source domain caps ([[capPerGroup]] by token
    * count) → deterministic split → source mixing. Stage order
    * matters and is part of the contract: cheap scan-local gates
    * first, the quadratic-within-cell semantic stage only over
    * already-deduped survivors, caps before the split so source
    * balance is decided on the final population.
    *
    * Documents with no embedding row pass the semantic stage
    * unjudged (kept) — an embedding pipeline that lags the text
    * pipeline must not silently delete the corpus. Every stage is a
    * pure function of (id, content, seed); the q120 oracle replays
    * the entire chain. */
  def curateWithEmbeddings(
      df: DataFrame,
      idCol: String,
      textCol: String,
      sourceCol: String,
      embeddings: DataFrame,
      embIdCol: String,
      vecCol: String,
      numCells: Int = 16,
      simThreshold: Double = 0.3,
      maxPerSource: Int = 100,
      ratesPerMille: Map[String, Int] = Map.empty,
      splitWeights: Seq[(String, Int)] = Seq("train" -> 80, "val" -> 10, "test" -> 10),
      benchmark: Option[DataFrame] = None,
      minContamHits: Int = 1
  ): DataFrame = {
    val q = qualityFilter(df, textCol).filter(col("kept"))
    val clean = benchmark match {
      case Some(bm) => decontaminate(q, idCol, textCol, bm, minContamHits)
      case None     => q
    }
    val keeperIds = clean
      .groupBy(md5(lower(trim(col(textCol)))).as("__k"))
      .agg(min(col(idCol)).as(idCol))
      .select(col(idCol))
    val deduped = clean.join(keeperIds, Seq(idCol), "left_semi")
    val survEmb = embeddings.join(
      deduped.select(col(idCol).cast("long").as(embIdCol)), Seq(embIdCol), "left_semi")
    val verdicts = Similarity.semanticDedup(survEmb, embIdCol, vecCol, numCells, simThreshold)
      .select(col("id").as("__semid"), col("kept").as("__semkept"))
    val sem = deduped
      .join(verdicts, deduped(idCol).cast("long") === verdicts("__semid"), "left")
      .filter(col("__semkept").isNull || col("__semkept"))
      .drop("__semid", "__semkept")
    val capped = capPerGroup(
      sem.withColumn("__ntok", tokenCount(col(textCol))), sourceCol, col("__ntok"), idCol, maxPerSource)
      .drop("rk", "__ntok")
    mixSources(hashSplit(capped, idCol, splitWeights), idCol, sourceCol, ratesPerMille)
  }

  /** Unigram language-model scoring — the perplexity-style quality
    * signal (CCNet/Gopher lineage): train token log-probabilities on
    * the corpus itself (count/total), then score each document by its
    * mean negative log-likelihood. High-NLL docs are gibberish/rare-
    * token soup; low-NLL docs are stopword soup — both tails are what
    * perplexity filters trim.
    *
    * Shapes: vocabulary = one partial-agg groupBy (|vocab| rows);
    * total = scalar agg broadcast via crossJoin; scoring joins the
    * exploded tokens against the logprob table and partial-aggregates
    * per doc. The logprob broadcast is size-gated (same pattern as
    * [[flagContaminated]]): vocabularies up to `maxBroadcastRows` ship
    * hinted-broadcast so the token stream is never shuffled; a web-
    * scale vocab beyond the gate falls back to an un-hinted join that
    * shuffles on the token key instead — the stopword skew there is
    * exactly AQE's skew-join case.
    *
    * Determinism contract: log-probs are rounded to 8 decimals then
    * summed as DECIMAL(28,10), so per-doc sums are independent of
    * partial-aggregation order and reproducible cross-engine (ln() may
    * differ by 1 ulp between libms; the pre-round absorbs it).
    * Output: (id, n_tok, nll, ppl). */
  def unigramLogLoss(
      df: DataFrame,
      idCol: String,
      textCol: String,
      maxBroadcastRows: Long = 10000000L
  ): DataFrame = {
    val tok = df.select(col(idCol), explode(tokens(col(textCol))).as("w"))
    // the vocab count table is read THREE times (broadcast gate, the
    // total, the logprob join) — materialize the corpus-wide token agg
    // ONCE as a localCheckpoint (vocab-sized, auto-reclaimed when the
    // frame is GC'd) instead of re-running the explode+aggregate per
    // consumer (the 10× scale smoke measured the recompute directly)
    val vocab = tok.groupBy(col("w")).agg(count(lit(1)).as("cnt")).localCheckpoint()
    val total = vocab.agg(sum(col("cnt")).as("n_total"))
    val logp = vocab.crossJoin(broadcast(total))
      .select(col("w"),
        round(log(col("cnt").cast("double") / col("n_total").cast("double")), 8)
          .cast("decimal(28,10)").as("logp"))
    val probeSide = if (vocab.count() <= maxBroadcastRows) broadcast(logp) else logp
    tok.join(probeSide, "w")
      .groupBy(col(idCol))
      .agg(sum(col("logp")).as("s"), count(lit(1)).as("n_tok"))
      .select(
        col(idCol),
        col("n_tok").cast("int").as("n_tok"),
        round(-col("s").cast("double") / col("n_tok"), 6).as("nll"),
        round(exp(round(-col("s").cast("double") / col("n_tok"), 6)), 4).as("ppl")
      )
  }

  /** Bigram LM scoring — [[unigramLogLoss]]'s conditional sibling:
    * p(w_i | w_{i-1}) = count(w_{i-1} w_i) / count(w_{i-1} ·), scored
    * as per-doc mean negative log-likelihood over the doc's bigrams.
    * Sharper than unigram at separating fluent text from bag-of-common-
    * words gibberish (a doc of frequent tokens in random ORDER scores
    * badly here). Same shapes (explode → partial-agg counts → size-
    * gated broadcast logprob join; one |bigram-vocab| count decides
    * the gate for both the conditional-total join and the scoring
    * join — the w1 table is never larger than the bigram table, so
    * the single gate is safe for both) and the same cross-engine
    * determinism contract (round(ln, 8) → DECIMAL sums). Docs with
    * < 2 tokens carry no bigrams and are not emitted. */
  def bigramLogLoss(
      df: DataFrame,
      idCol: String,
      textCol: String,
      maxBroadcastRows: Long = 10000000L
  ): DataFrame = {
    val bg = df.select(col(idCol), explode(wordShingles(tokens(col(textCol)), 2)).as("bg"))
    // same single-materialization move as [[unigramLogLoss]]: the
    // bigram count table feeds the gate, the conditional totals AND
    // the logprob join — checkpoint the corpus-wide aggregate once
    val cnt = bg.groupBy(col("bg")).agg(count(lit(1)).as("c")).localCheckpoint()
    val underGate = cnt.count() <= maxBroadcastRows
    val tot = cnt.groupBy(substring_index(col("bg"), " ", 1).as("w1")).agg(sum(col("c")).as("tc"))
    val totSide = if (underGate) broadcast(tot) else tot
    val logp = cnt.join(totSide, substring_index(col("bg"), " ", 1) === col("w1"))
      .select(col("bg"),
        round(log(col("c").cast("double") / col("tc").cast("double")), 8)
          .cast("decimal(28,10)").as("logp"))
    val probeSide = if (underGate) broadcast(logp) else logp
    bg.join(probeSide, "bg")
      .groupBy(col(idCol))
      .agg(sum(col("logp")).as("s"), count(lit(1)).as("n_bigrams"))
      .select(
        col(idCol),
        col("n_bigrams").cast("int").as("n_bigrams"),
        round(-col("s").cast("double") / col("n_bigrams"), 6).as("nll")
      )
  }

  /** The shingle set of a benchmark corpus, for [[flagContaminated]]. */
  def benchmarkShingles(df: DataFrame, textCol: String): DataFrame =
    df.select(explode(array_distinct(wordShingles(tokens(col(textCol))))).as("sh")).distinct()

  /** Deterministic stratified sample: keep `k` rows per stratum, chosen
    * by md5-of-id order (a seeded uniform draw that is stable across
    * runs and engines). The window sort is per-stratum — at scale this
    * is one shuffle on the stratum key, and AQE handles stratum skew. */
  def stratifiedSample(df: DataFrame, stratumCol: String, idCol: String, k: Int): DataFrame = {
    val w = Window.partitionBy(col(stratumCol))
      .orderBy(md5(col(idCol).cast("string")), col(idCol))
    df.withColumn("rk", row_number().over(w)).filter(col("rk") <= k)
  }

  /** Per-group document cap — the domain-cap step of web-corpus
    * curation (public recipe in RefinedWeb/FineWeb-style pipelines:
    * bound any single domain's share of the corpus so over-crawled
    * sites cannot dominate training data): keep the top `n` rows of
    * each group by (orderCol DESC, id) — quality-ranked, deterministic
    * tie-break, everything past the cap dropped.
    *
    * Scale shape: one hash-partitioned window pass on the group key;
    * output is bounded by |groups|·n whatever the skew of the input.
    * A pathologically hot group (one domain = half the corpus) makes
    * one fat window partition — the mitigation at that extreme is a
    * pre-filter pass (cheap per-group count, then only groups over the
    * cap enter the window), which callers compose when their domain
    * histogram warrants it; AQE cannot split a window partition. */
  def capPerGroup(df: DataFrame, groupCol: String, orderCol: Column, idCol: String, n: Int): DataFrame = {
    val w = Window.partitionBy(col(groupCol)).orderBy(orderCol.desc, col(idCol))
    df.withColumn("rk", row_number().over(w)).filter(col("rk") <= n)
  }

  /** Deterministic WEIGHTED sampling without replacement — k rows with
    * inclusion probability proportional to `weightCol` (Efraimidis–
    * Spirakis A-ES, public algorithm): each row draws a reproducible
    * uniform u from md5(seed, id) and keys itself by −ln(u)/w; the k
    * SMALLEST keys are the sample. The LLM-curation use is
    * quality/temperature-weighted subsampling ("keep 100k docs, prefer
    * high quality^T") where a plain uniform sample over- represents
    * junk. Randomness is hash-derived exactly as [[hashSplit]] /
    * [[stratifiedSample]]: re-running, repartitioning, or growing the
    * cluster never changes the draw for an existing row.
    *
    * Scale shape: the key is a pure projection (distributes with the
    * scan); global top-k by (key, id) plans as TakeOrderedAndProject —
    * per-partition heaps, no global sort. Keys are rounded to 8 dp
    * (the q91 ln contract) so the ordering replays engine-independently
    * in the DuckDB oracle (ties broken by id). Rows with weight ≤ 0 or
    * null never qualify. */
  /** Token-budget sampling (the FineWeb/Dolma assembly step): per
    * source, keep documents in a deterministic hash order until the
    * source's TOKEN budget is reached — proportions (`mixSources`/
    * `temperatureMix`) control ratios, this controls the absolute
    * token count a fixed-size training mix needs from each pool. A doc
    * is kept iff the cumulative tokens of the docs ordered BEFORE it
    * are still under budget, so each source yields the smallest
    * hash-ordered prefix covering its budget (the last kept doc may
    * overshoot — the standard greedy contract; sources under budget
    * keep everything). Sources absent from `budgets` use
    * `defaultBudget` (0 = dropped entirely).
    *
    * Shape: ONE window cumulative sum partitioned by source — shuffle
    * is one pass of (source)-keyed rows. A single gigantic source
    * serializes its own running sum into one task (windows are
    * per-partition sequential by nature); at 100 TB granularity,
    * budget at a finer source key (domain, shard) — same call, finer
    * column. Output: input columns + `cum_before` + `kept`, total
    * order (source, sample order) for replay. */
  def tokenBudgetSample(
      df: DataFrame,
      idCol: String,
      sourceCol: String,
      tokenCol: String,
      budgets: Map[String, Long],
      defaultBudget: Long = 0L,
      seed: String = "budget"
  ): DataFrame = {
    val order = hash32(concat(lit(seed), col(idCol).cast("string")))
    val w = Window.partitionBy(col(sourceCol))
      .orderBy(order, col(idCol))
      .rowsBetween(Window.unboundedPreceding, -1)
    val budget = budgets.foldLeft(lit(defaultBudget)) { case (acc, (s, b)) =>
      when(col(sourceCol) === s, lit(b)).otherwise(acc)
    }
    df.withColumn("cum_before", coalesce(sum(col(tokenCol)).over(w), lit(0L)))
      .withColumn("kept", col("cum_before") < budget)
      .orderBy(col(sourceCol), order, col(idCol))
  }

  def weightedSample(
      df: DataFrame,
      idCol: String,
      weightCol: String,
      k: Int,
      seed: String = "aes"
  ): DataFrame = {
    // u in (0,1): 32 hash bits + 0.5, over 2^32 — never exactly 0 or 1
    val u = (hash32(concat(lit(seed), col(idCol).cast("string"))) + lit(0.5)) / lit(4294967296.0)
    df.filter(col(weightCol).isNotNull && col(weightCol) > 0)
      .withColumn("skey", round(-log(u) / col(weightCol).cast("double"), 8))
      .orderBy(col("skey"), col(idCol))
      .limit(k)
  }

  /** DSIR-style domain-targeted importance weights (Data Selection for
    * Language Models via Importance Resampling — Xie et al. 2023, a
    * published method): score each RAW-pool document by how much more
    * likely its n-gram profile is under a TARGET domain's model than
    * under the raw pool's own. Features are unigrams + word bigrams
    * hashed into `buckets` cells (the hashing IS the method's
    * dimensionality reduction — collisions are by design); both models
    * are Laplace-smoothed bucket multinomials fit distributively; each
    * document's log importance weight is the sum of its grams' cell
    * log-ratios:  log w(d) = Σ_g [ln p_target(b(g)) − ln q_raw(b(g))].
    *
    * Distributed shape, built for the 100 TB pool: two explode →
    * bucket-count aggregates (map-side partial agg; results are
    * `buckets`-bounded, i.e. metadata-sized), a BROADCAST λ-table join
    * (buckets rows — never a shuffle of the pool), one per-doc sum.
    * No driver-side loop touches document data.
    *
    * Determinism contract (cross-engine, like [[unigramLogLoss]]):
    * md5-based [[graft.functions.TextFunctions.hash32]] bucketing, λ =
    * round(ln·, 8) as DECIMAL, per-doc DECIMAL sums — hash-exact
    * against a DuckDB replay regardless of partitioning.
    * Output: idCol, n_grams, logw (DECIMAL 28,10). */
  def dsirWeights(
      raw: DataFrame,
      target: DataFrame,
      idCol: String,
      textCol: String,
      buckets: Int = 4096
  ): DataFrame = {
    require(buckets > 0, "buckets must be positive")
    def grams(df: DataFrame, extra: Seq[Column]) = {
      val toks = tokens(col(textCol))
      df.select(extra :+ explode(concat(toks, wordShingles(toks, 2))).as("g"): _*)
    }
    val b = pmod(hash32(col("g")), lit(buckets.toLong)).as("b")
    // corpus-wide cell counts: B-bounded frames, checkpointed once
    // (each feeds a total AND the λ join)
    val tCnt = grams(target, Nil).groupBy(b).agg(count(lit(1)).as("tc")).localCheckpoint()
    val rCnt = grams(raw, Nil).groupBy(b).agg(count(lit(1)).as("rc")).localCheckpoint()
    val tN = tCnt.agg(sum(col("tc")).as("tn"))
    val rN = rCnt.agg(sum(col("rc")).as("rn"))
    val allCells = raw.sparkSession.range(buckets).select(col("id").as("b"))
    val lambda = allCells
      .join(tCnt, Seq("b"), "left").join(rCnt, Seq("b"), "left")
      .crossJoin(broadcast(tN)).crossJoin(broadcast(rN))
      .select(col("b"),
        (round(log((coalesce(col("tc"), lit(0L)) + 1).cast("double") /
            (col("tn") + buckets).cast("double")), 8) -
          round(log((coalesce(col("rc"), lit(0L)) + 1).cast("double") /
            (col("rn") + buckets).cast("double")), 8))
          .cast("decimal(28,10)").as("lambda"))
    grams(raw, Seq(col(idCol))).select(col(idCol), b)
      .join(broadcast(lambda), "b")
      .groupBy(col(idCol))
      .agg(count(lit(1)).cast("int").as("n_grams"), sum(col("lambda")).as("logw"))
  }

  /** Importance RESAMPLING on the DSIR weights: Gumbel-top-k — draw
    * key = logw + Gumbel(0,1) with the Gumbel from the same
    * deterministic hash-uniform every sampler here uses, so the draw
    * itself (not just the weight) is pinned cross-engine. Working on
    * LOG weights is what makes this shape safe at scale: w = e^logw
    * over/underflows double for strongly-shifted domains, the Gumbel
    * trick never exponentiates. One global top-k (TakeOrdered), no
    * full sort materialization. */
  def dsirResample(
      raw: DataFrame,
      target: DataFrame,
      idCol: String,
      textCol: String,
      k: Int,
      buckets: Int = 4096,
      seed: String = "dsir"
  ): DataFrame = {
    require(k > 0, "k must be positive")
    val w = dsirWeights(raw, target, idCol, textCol, buckets)
    val u = (hash32(concat(lit(seed), col(idCol).cast("string"))) + lit(0.5)) / lit(4294967296.0)
    w.withColumn("draw", round(col("logw").cast("double") - log(-log(u)), 6))
      .orderBy(desc("draw"), col(idCol))
      .limit(k)
  }

  /** LEAKAGE-SAFE train/validation split (X117): near-duplicate
    * documents never straddle the split. A plain per-doc hash split
    * ([[trainValTestSplit]]) puts a document and its near-copy on
    * opposite sides with probability 2·p·(1−p) — eval contamination
    * through near-duplicates, the classic leak large-corpus training
    * setups must close (the published decontamination literature
    * treats near-dup overlap between train and eval as contamination;
    * splitting by near-dup CLUSTER closes it by construction).
    *
    * Assignment: every document joins its connected-component label
    * from the candidate-pair graph (its own id when unpaired —
    * [[Dedup.nearDupClusters]] labels only clustered nodes), and the
    * split is a deterministic md5 bucket of that REPRESENTATIVE, so
    * the whole cluster moves together, membership is reproducible
    * across runs, and the expected validation mass is
    * `valPermille`/1000 of the CLUSTERS (near-dup mass concentrates in
    * clusters, which is exactly what must stay on one side).
    *
    * Distributed shape: components are iterative min-label propagation
    * over the edge relation (edge-sized shuffles, observation-counted
    * convergence); the assignment is ONE key-partitioned left join of
    * docs against the |clustered-docs|-sized label frame plus
    * codegen'd hash arithmetic — no driver materialization, no
    * broadcast of anything corpus-sized. Holds at 100 TB. */
  def leakageSafeSplit(
      docs: DataFrame,
      idCol: String,
      pairs: DataFrame,
      valPermille: Int,
      seed: String = "split"
  ): DataFrame = {
    require(valPermille >= 0 && valPermille <= 1000,
      s"valPermille must be in [0, 1000], got $valPermille")
    val comps = Dedup.nearDupClusters(pairs)
      .withColumnRenamed("id", idCol).withColumnRenamed("comp", "__comp")
    val rep = coalesce(col("__comp"), col(idCol)).as("rep")
    docs.join(comps, Seq(idCol), "left")
      .withColumn("rep", rep)
      .withColumn("split",
        when(hash32(concat(lit(seed), col("rep").cast("string"))) % 1000 < valPermille,
          lit("val")).otherwise(lit("train")))
      .drop("__comp")
  }
}
