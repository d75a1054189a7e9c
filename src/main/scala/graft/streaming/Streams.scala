package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, StreamingQuery, Trigger}
import org.apache.spark.sql.types.StructType

/** Structured Streaming surface of the engine.
  *
  * The reference's "stream" is a daily cron batch re-landing a prefix
  * (SURVEY.md §2.g): `availableNowTo` subsumes that pattern — each
  * invocation incrementally processes only files not seen by the
  * checkpoint, then stops (Trigger.AvailableNow). Watermarked windowed
  * aggregation and gap sessionization are the standard streaming ops a
  * training-data pipeline needs on top (late-data-safe event counts,
  * per-user session rollups).
  *
  * Scale notes: all stateful operators key their state by the group
  * columns, so state is hash-partitioned across executors like any
  * shuffle; watermarks bound state size (old windows/sessions are
  * evicted), which is what makes them safe on an unbounded 100 TB/day
  * feed.
  */
object Streams {

  /** Schema-on-read NDJSON stream over a directory prefix — the
    * streaming twin of the batch bronze reader (explicit schema: no
    * inference pass, mandatory for streams). */
  def ndjsonStream(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.readStream.schema(schema).json(path)

  /** Watermarked tumbling-window aggregation: count + sum(value) per
    * (window, event_type). Late rows beyond `watermarkDelay` are
    * dropped; closed windows are emitted once (Append mode). */
  def tumblingAgg(
      events: DataFrame,
      tsCol: String = "ts",
      windowLen: String = "1 hour",
      watermarkDelay: String = "2 hours"
  ): DataFrame =
    events
      .withWatermark(tsCol, watermarkDelay)
      .groupBy(window(col(tsCol), windowLen).as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("total"))
      .select(col("w.start").as("w_start"), col("event_type"), col("n"), col("total"))

  final case class SessionEvent(user_id: Long, ts: java.sql.Timestamp, value: Double)
  final case class SessionAgg(var start: Long, var end: Long, var n: Int, var total: Double)
  final case class SessionOut(
      user_id: Long,
      session_start: java.sql.Timestamp,
      session_end: java.sql.Timestamp,
      n_events: Int,
      total: Double
  )

  /** Custom-state gap sessionization via flatMapGroupsWithState: a
    * session closes when no event arrives within `gapSeconds` of the
    * last one (enforced by event-time timeout against the watermark).
    * State per user is O(1) — just the open session's aggregate. */
  def sessionize(
      events: Dataset[SessionEvent],
      gapSeconds: Long = 1800L,
      watermarkDelay: String = "2 hours"
  ): Dataset[SessionOut] = {
    val spark = events.sparkSession
    import spark.implicits._
    val gapMs = gapSeconds * 1000L

    def flush(uid: Long, s: SessionAgg): SessionOut =
      SessionOut(uid, new java.sql.Timestamp(s.start), new java.sql.Timestamp(s.end), s.n, s.total)

    events
      .withWatermark("ts", watermarkDelay)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (uid: Long, it: Iterator[SessionEvent], state: GroupState[SessionAgg]) =>
          if (state.hasTimedOut) {
            val out = state.getOption.map(flush(uid, _)).toSeq
            state.remove()
            out.iterator
          } else {
            val sorted = it.toSeq.sortBy(_.ts.getTime)
            val closed = Seq.newBuilder[SessionOut]
            var cur = state.getOption.orNull
            for (e <- sorted) {
              val t = e.ts.getTime
              if (cur == null) cur = SessionAgg(t, t, 0, 0.0)
              else if (t - cur.end > gapMs) { closed += flush(uid, cur); cur = SessionAgg(t, t, 0, 0.0) }
              // a late (but above-watermark) event may precede the open
              // session's start — extend backwards, not just forwards
              cur.start = math.min(cur.start, t)
              cur.end = math.max(cur.end, t)
              cur.n += 1
              cur.total += e.value
            }
            if (cur != null) {
              state.update(cur)
              state.setTimeoutTimestamp(cur.end + gapMs)
            }
            closed.result().iterator
          }
      }
  }

  /** Streaming exact dedup on arbitrary key columns: keeps the first
    * arrival per key, dropping later duplicates for as long as the
    * watermark allows state to be held (`dropDuplicatesWithinWatermark`
    * — state for a key is evicted once the watermark passes its event
    * time + delay, so state size is bounded by the delay window, not
    * the stream's lifetime; the batch-side twin is [[graft.operators.Dedup.exactOnKeys]]).
    *
    * Use for ingest-time dedup of a training feed (repeated crawls,
    * at-least-once upstream delivery). */
  def dedupStream(
      events: DataFrame,
      keyCols: Seq[String],
      tsCol: String = "ts",
      watermarkDelay: String = "2 hours"
  ): DataFrame =
    events
      .withWatermark(tsCol, watermarkDelay)
      .dropDuplicatesWithinWatermark(keyCols)

  /** Incremental-batch runner: process all files not yet recorded in
    * `checkpoint`, write them to `outPath` as parquet, and stop — the
    * Structured Streaming replacement for the reference's
    * delete-prefix-and-reprocess daily batch (S9/O5). */
  def availableNowTo(df: DataFrame, outPath: String, checkpoint: String): StreamingQuery =
    df.writeStream
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", checkpoint)
      .format("parquet")
      .start(outPath)

  /** Stream-static enrichment: join a stream against a slow-changing
    * dimension table with an explicit broadcast — each micro-batch
    * probes the broadcast hash relation scan-locally, so the stream is
    * never shuffled by the join (the standard enrich-with-metadata step
    * of a streaming ingest: license, source, language tags). The static
    * side is re-resolved per batch, so a replaced underlying table is
    * picked up without restarting the query. */
  def enrich(stream: DataFrame, dim: DataFrame, keys: Seq[String], joinType: String = "left"): DataFrame =
    stream.join(broadcast(dim), keys, joinType)

  /** Watermarked stream-stream interval join: left events match right
    * events with the same key whose event time falls in
    * [leftTs - lookback, leftTs + lookahead]. Both sides are
    * watermarked, which is what BOUNDS the join state: rows older than
    * watermark + interval are evicted, so state size is
    * O(rate × (delay + interval)) — never the stream's lifetime. The
    * canonical attribution shape (purchase ↔ recent signup) that a
    * batch range-join (q45) answers offline. */
  def intervalJoin(
      left: DataFrame,
      right: DataFrame,
      key: String,
      leftTs: String,
      rightTs: String,
      lookback: String = "2 hours",
      lookahead: String = "0 seconds",
      watermarkDelay: String = "1 hour"
  ): DataFrame = {
    val l = left.withWatermark(leftTs, watermarkDelay)
    val r = right.withWatermark(rightTs, watermarkDelay)
    l.join(
      r,
      l(key) === r(key) &&
        r(rightTs) >= l(leftTs) - expr(s"INTERVAL $lookback") &&
        r(rightTs) <= l(leftTs) + expr(s"INTERVAL $lookahead")
    ).drop(r(key))
  }

  /** Continuous corpus ingestion with incremental near-exact dedup:
    * every micro-batch is deduplicated against the PERSISTED MinHash
    * signature index at `indexPath` (the streaming face of
    * [[graft.operators.Dedup.incrementalBySignature]]); surviving
    * keepers (min id per fresh signature) append to `corpusPath` and
    * their signatures append to the index — so a document ever seen, in
    * any earlier batch or earlier in the same batch, is never landed
    * twice, and the index is shared with batch ingest.
    *
    * foreachBatch rather than stream state on purpose: the dedup set
    * must outlive the stream, be shared with batch jobs, and grow
    * without watermark eviction — it is a TABLE, not stream state
    * (contrast [[dedupStream]], whose watermark-bounded state handles
    * short-horizon redelivery). Fresh signatures are localCheckpointed
    * before any write so the index read happens once per batch, never
    * mid-append.
    *
    * Delivery is EXACTLY-ONCE at batch granularity: foreachBatch itself
    * is at-least-once on retry, so each successful batch commits a
    * marker file (`_committed_<batchId>` under the index) LAST — a
    * replayed batchId finds its marker and is skipped whole. A crash
    * BETWEEN the writes and the marker is also safe: each batch's
    * corpus rows land under their own `__batch=<id>` subdirectory with
    * OVERWRITE (a replay rewrites the same partition instead of
    * appending a second copy), index rows carry a `src_batch` column
    * the replay excludes from its own dedup decision (so a partially
    * indexed batch re-decides identically) and anti-joins against
    * before re-appending — every crash point replays to the same
    * corpus and index state, no duplicates, no lost rows. Reading
    * `corpusPath` surfaces `__batch` as a lineage column via partition
    * discovery. Docs shorter than the shingle width carry no signature
    * and are dropped (route them through [[dedupStream]] on a content
    * digest instead). */
  def incrementalDedupSink(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      corpusPath: String,
      indexPath: String,
      checkpoint: String,
      numHashes: Int = 8,
      compactEvery: Int = 16
  ): StreamingQuery =
    docs.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        incrementalDedupBatch(batch, batchId, idCol, textCol, corpusPath, indexPath,
          numHashes, compactEvery)
        ()
      }
      .start()

  /** Streaming NEAR-duplicate suppression against a persisted LSH band
    * index — the approximate sibling of [[incrementalDedupSink]]: that
    * sink drops only exact-signature copies, this one drops any doc
    * whose MinHash signature collides with the indexed corpus (or with
    * a smaller-id doc of the same batch) in ANY band — boilerplate
    * re-crawls and lightly-edited copies, not just byte-identical
    * ones. The corpus at rest is represented only by its (band_idx,
    * bucket) set — `bands` small rows per kept doc, no signatures, no
    * text — so the standing state is index-sized forever and the
    * per-batch probe is one anti/semi-join pair keyed on the bucket.
    *
    * Approximate by design, exactly like [[graft.operators.Dedup
    * .lshCandidatePairs]]: a true near-dup splitting across every band
    * is missed; an unlucky band collision drops a non-dup. Within a
    * batch the rule is greedy keep-first (a doc sharing a bucket with
    * ANY smaller-id batch doc is dropped, whatever that doc's own
    * fate — the q112 semantic-dedup convention). Docs shorter than the
    * shingle width carry no signature and are dropped (route them
    * through [[dedupStream]] on a content digest instead).
    *
    * Exactly-once: same idempotent-replay protocol as
    * [[incrementalDedupSink]] — replayed batches are skipped whole via
    * the marker; a crash BEFORE the marker replays to the identical
    * corpus and index state (batch-scoped `__batch=<id>` corpus
    * overwrite + `src_batch`-tagged index rows the replay excludes
    * from its own decision), so no crash point duplicates or loses
    * rows. Index files are compacted every `compactEvery` batches. */
  def incrementalNearDupSink(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      corpusPath: String,
      indexPath: String,
      checkpoint: String,
      numHashes: Int = 8,
      bands: Int = 4,
      compactEvery: Int = 16
  ): StreamingQuery =
    docs.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        incrementalNearDupBatch(batch, batchId, idCol, textCol, corpusPath, indexPath,
          numHashes, bands, compactEvery)
        ()
      }
      .start()

  /** One batch of [[incrementalNearDupSink]], factored out so
    * idempotency and the drop rules are directly testable: returns
    * false (no-op) when `batchId` was already committed. */
  private[graft] def incrementalNearDupBatch(
      batch: DataFrame,
      batchId: Long,
      idCol: String,
      textCol: String,
      corpusPath: String,
      indexPath: String,
      numHashes: Int = 8,
      bands: Int = 4,
      compactEvery: Int = 16
  ): Boolean = {
    val spark = batch.sparkSession
    val hconf = spark.sparkContext.hadoopConfiguration
    val marker = new org.apache.hadoop.fs.Path(indexPath, s"_committed_$batchId")
    val fs = marker.getFileSystem(hconf)
    if (fs.exists(marker)) return false // replayed batch: already fully committed
    // only a MISSING index (first batch ever) falls back to empty —
    // any other read failure must fail the batch, not reset dedup
    val index =
      try spark.read.parquet(indexPath)
      catch {
        case e: org.apache.spark.sql.AnalysisException
            if e.getCondition == "PATH_NOT_FOUND" =>
          spark.createDataFrame(
            spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
            StructType(Seq(
              org.apache.spark.sql.types.StructField("band_idx", org.apache.spark.sql.types.IntegerType),
              org.apache.spark.sql.types.StructField("bucket", org.apache.spark.sql.types.StringType),
              org.apache.spark.sql.types.StructField("src_batch", org.apache.spark.sql.types.LongType))))
      }
    // Exclude this batch's own index rows from the drop decision (they
    // exist only when a prior attempt crashed between the index append
    // and the marker): the replay re-derives the same keepers instead
    // of colliding with its own partial output and dropping everything.
    val priorIndex = index
      .filter(coalesce(col("src_batch"), lit(-1L)) =!= lit(batchId))
      .select(col("band_idx"), col("bucket"))
    val bb = graft.operators.Dedup
      .bandBuckets(batch, idCol, textCol, numHashes, bands)
      .withColumnRenamed(idCol, "__did")
      .localCheckpoint(true) // three consumers below
    // cross-batch collisions: any band bucket already in the index
    val dropCross = bb.join(priorIndex, Seq("band_idx", "bucket"), "left_semi").select(col("__did"))
    // within-batch greedy keep-first: collides with a smaller batch id
    val dropIntra = bb
      .join(bb.select(col("__did").as("__other"), col("band_idx"), col("bucket")),
        Seq("band_idx", "bucket"))
      .filter(col("__other") < col("__did"))
      .select(col("__did"))
    val keepIds = bb.select(col("__did")).distinct()
      .join(dropCross.union(dropIntra).distinct(), Seq("__did"), "left_anti")
      .localCheckpoint(true)
    // Batch-scoped OVERWRITE: a replay rewrites its own partition to
    // identical content — no duplicate corpus rows at any crash point.
    batch.join(keepIds.withColumnRenamed("__did", idCol), Seq(idCol), "left_semi")
      .write.mode("overwrite").parquet(s"$corpusPath/__batch=$batchId")
    // keepers' band buckets extend the index; buckets already present
    // (other batches OR this batch's own partial append) are not
    // re-appended, so index growth ≤ bands rows per kept doc and a
    // replayed partial append adds nothing
    bb.join(keepIds, Seq("__did"), "left_semi")
      .select(col("band_idx"), col("bucket")).distinct()
      .withColumn("src_batch", lit(batchId))
      .join(index.select(col("band_idx"), col("bucket")), Seq("band_idx", "bucket"), "left_anti")
      .write.mode("append").parquet(indexPath)
    fs.create(marker, true).close() // commit point: written LAST
    if (compactEvery > 0 && (batchId + 1) % compactEvery == 0)
      compactIndex(spark, indexPath, batchId)
    true
  }

  /** Stream into a versioned snapshot table: each micro-batch MERGEs
    * into `table` by `keyCols`, so the stream materializes as a
    * time-travelable, manifest-capable table rather than an append-only
    * directory. Exactly-once EFFECT without a marker protocol: Spark
    * replays a failed batch with identical content, and MERGE by key is
    * idempotent — re-upserting the same rows commits a new version with
    * the same table state. Readers always see a complete snapshot
    * (commit is atomic), and each batch is one auditable version.
    * Retention bounds the version history the stream accumulates.
    *
    * `orderCol`: when a micro-batch carries several rows per key
    * (updates within the batch), the row with the LARGEST `orderCol`
    * value (event time / sequence number) wins — `max_by` semantics,
    * what "keep the newest" actually means. When no ordering column is
    * given, conflict resolution falls back to max over the struct of
    * non-key columns — deterministic, but LEXICOGRAPHIC IN COLUMN
    * ORDER (the retained row is the one greatest by the first non-key
    * column, then the second, …), not newest-wins; pass `orderCol`
    * whenever the stream has any notion of update order. */
  /** Streaming maintenance of a persisted LSH ANN index: every
    * micro-batch of (id, vector) rows upserts into the snapshot-table
    * index ([[graft.operators.Similarity.upsertLshIndex]] — bucket and
    * norm precomputed, merged by vector id, ONE committed version per
    * batch) so [[graft.operators.Similarity.queryLshIndexSnapshot]]
    * finds new vectors immediately after their batch lands while the
    * probed-bucket directory pruning keeps serving sub-linear.
    *
    * Exactly-once by idempotence: a replayed batch re-merges the same
    * rows onto the same keys, converging to identical content — the
    * same contract as [[snapshotMergeSink]], because it IS a keyed
    * merge underneath. Index growth is one row per distinct vector id
    * ever streamed, however many times batches replay. */
  def lshIndexUpsertSink(
      stream: DataFrame,
      tables: graft.io.SnapshotTables,
      table: String,
      idCol: String,
      vecCol: String,
      checkpoint: String,
      bits: Int = 8,
      dim: Int = 64,
      afterCommit: () => Unit = () => ()
  ): StreamingQuery =
    stream.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        if (!batch.isEmpty) {
          graft.operators.Similarity.upsertLshIndex(
            tables, table, batch.dropDuplicates(idCol), idCol, vecCol, bits, dim)
          afterCommit()
        }
        ()
      }
      .start()

  /** Streaming maintenance of a persisted IVF-PQ index — the PQ analog
    * of [[lshIndexUpsertSink]], same exactly-once-by-idempotence
    * contract: each batch's vectors are encoded with the FROZEN
    * quantizers (codebooks + the centroid mini-table persisted at
    * bootstrap) and merged by id
    * ([[graft.operators.Similarity.upsertPqIndex]]); serve any moment
    * with [[graft.operators.Similarity.queryPqIndexSnapshot]]. Pass
    * `centroids` to seed the quantizer when the index does not exist
    * yet; it is ignored afterwards. */
  def pqIndexUpsertSink(
      stream: DataFrame,
      tables: graft.io.SnapshotTables,
      table: String,
      idCol: String,
      vecCol: String,
      codebooks: DataFrame,
      dim: Int,
      m: Int,
      numCells: Int,
      checkpoint: String,
      centroids: Option[DataFrame] = None,
      afterCommit: () => Unit = () => ()
  ): StreamingQuery =
    stream.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        if (!batch.isEmpty) {
          graft.operators.Similarity.upsertPqIndex(tables, table,
            batch.dropDuplicates(idCol), idCol, vecCol, codebooks, dim, m, numCells, centroids)
          afterCommit()
        }
        ()
      }
      .start()

  /** Append-only streaming ingestion into a snapshot table — the
    * fact/event-stream shape (no keys, no conflict resolution): each
    * micro-batch FAST-APPENDS an O(batch) delta commit, and the chain
    * budget keeps read cost bounded by FOLDING the deltas (the base is
    * never rewritten by the sink's cadence; see
    * [[graft.io.SnapshotTables.compactDeltas]]). Table layout
    * (identity partitions, hidden transforms, write sort order) and
    * per-segment stats manifests apply to every appended segment, so
    * pruning and fastCount stay live as the stream runs.
    *
    * Exactly-once: foreachBatch is at-least-once on retry; each batch
    * commits with a transaction id derived from (checkpoint, batchId),
    * so a replayed batch re-presents a txn the table already retains
    * and lands nothing ([[graft.io.SnapshotTables.append]] txnId) — no
    * side marker files. Txn memory is the table's retention window;
    * retention must cover the engine's possible replay horizon (one
    * in-flight batch in practice). */
  def snapshotAppendSink(
      stream: DataFrame,
      tables: graft.io.SnapshotTables,
      table: String,
      checkpoint: String,
      afterCommit: () => Unit = () => (),
      availableNow: Boolean = false
  ): StreamingQuery = {
    // the txn namespace is the CHECKPOINT identity: a restart of the
    // same query re-presents the same ids (replay-safe), while a
    // different query writing the same table never collides. A
    // collision-resistant 128-bit digest, NOT a 32-bit hash — two
    // queries whose checkpoint hashes collide would share a namespace
    // and a matching (hash, batchId) would be silently skipped as a
    // replay: silent data loss, not a loud failure.
    val sinkId = java.security.MessageDigest.getInstance("MD5")
      .digest(checkpoint.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    val w = stream.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        if (!batch.isEmpty) {
          tables.append(batch, table, txnId = Some(s"append-sink.$sinkId.$batchId"))
          afterCommit()
        }
        ()
      }
    (if (availableNow) w.trigger(Trigger.AvailableNow()) else w).start()
  }

  /** Continuous append into a FOREIGN Iceberg v2 table — the streaming
    * face of [[graft.io.IcebergAppend]] (X126): each non-empty
    * micro-batch commits one spec-shaped snapshot external Iceberg
    * readers consume directly. EXACTLY-ONCE across restarts and
    * checkpoint loss: every batch stamps a checkpoint-scoped
    * transaction marker into its snapshot summary, and a replayed
    * batch whose marker is already on the snapshot chain is skipped —
    * the same summary-marker idempotence real Iceberg streaming sinks
    * use. Racing writers from OTHER queries still conflict loudly on
    * the metadata version file (optimistic concurrency), never
    * lost-write. */
  def icebergAppendSink(
      stream: DataFrame,
      tableDir: String,
      checkpoint: String,
      availableNow: Boolean = false
  ): StreamingQuery = {
    // checkpoint identity = replay namespace, collision-resistant
    // digest (see snapshotAppendSink for why not a 32-bit hash)
    val sinkId = java.security.MessageDigest.getInstance("MD5")
      .digest(checkpoint.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    val w = stream.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val txn = s"ice-append.$sinkId.$batchId"
        if (!batch.isEmpty &&
            !graft.io.IcebergAppend.committedTxnIds(batch.sparkSession, tableDir).contains(txn))
          graft.io.IcebergAppend.append(batch.sparkSession, tableDir, batch,
            summaryProps = Map(graft.io.IcebergAppend.TxnKey -> txn))
        ()
      }
    (if (availableNow) w.trigger(Trigger.AvailableNow()) else w).start()
  }

  /** Continuous keyed UPSERT into a FOREIGN Iceberg v2 table — the
    * merge twin of [[icebergAppendSink]]: each non-empty micro-batch
    * commits ONE overwrite snapshot (equality delete on the batch's
    * keys + the batch as a data manifest, [[graft.io.IcebergDml
    * .upsert]] — O(batch), the table is never read). EXACTLY-ONCE via
    * the same expiry-proof txn markers as the append sink. In-batch
    * key conflicts resolve to one row per key before the commit — by
    * `orderCol` when given, else the documented struct-max fallback —
    * because a batch carrying two images of one key would land both
    * (the upsert's multiset contract). */
  def icebergMergeSink(
      stream: DataFrame,
      tableDir: String,
      keyCols: Seq[String],
      checkpoint: String,
      orderCol: Option[String] = None,
      availableNow: Boolean = false
  ): StreamingQuery = {
    require(keyCols.nonEmpty, "icebergMergeSink needs at least one key column")
    val sinkId = java.security.MessageDigest.getInstance("MD5")
      .digest(checkpoint.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    val w = stream.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val txn = s"ice-merge.$sinkId.$batchId"
        if (!batch.isEmpty &&
            !graft.io.IcebergAppend.committedTxnIds(batch.sparkSession, tableDir).contains(txn)) {
          import org.apache.spark.sql.functions.{col, max, max_by, struct}
          // exact-name resolution: a column whose name contains a dot
          // (or other path chars) must not be parsed as a field path —
          // backtick-quote references, unpack the struct via getField
          def qcol(c: String) = col("`" + c.replace("`", "``") + "`")
          val rest = batch.columns.filterNot(keyCols.contains).toSeq
          val one =
            if (rest.isEmpty) batch.dropDuplicates(keyCols)
            else {
              val packed = struct(rest.map(qcol): _*)
              val pick = orderCol match {
                case Some(oc) =>
                  require(batch.columns.contains(oc),
                    s"orderCol '$oc' is not a column of the stream")
                  max_by(packed, qcol(oc))
                case None => max(packed)
              }
              batch.groupBy(keyCols.map(qcol): _*).agg(pick.as("__one"))
                .select(keyCols.map(qcol) ++ rest.map(c => col("__one").getField(c).as(c)): _*)
            }
          graft.io.IcebergDml.upsert(batch.sparkSession, tableDir, one, keyCols,
            summaryProps = Map(graft.io.IcebergAppend.TxnKey -> txn))
        }
        ()
      }
    (if (availableNow) w.trigger(Trigger.AvailableNow()) else w).start()
  }

  /** Continuous upsert-by-key into a versioned snapshot table. With
    * `mor = false` (default) each batch is a copy-on-write MERGE —
    * O(table) write per batch, zero read-side overhead. With `mor =
    * true` each batch commits an O(batch) merge-on-read delta
    * ([[graft.io.SnapshotTables.upsertMor]] — the commit never reads
    * the base table at all), readers resolve the chain, and the
    * snapshot layer's `graft.delta.maxChainLength` auto-materialize
    * keeps read cost bounded — the only commit shape that survives a
    * high-cadence stream into a 100 TB table. */
  def snapshotMergeSink(
      stream: DataFrame,
      tables: graft.io.SnapshotTables,
      table: String,
      keyCols: Seq[String],
      checkpoint: String,
      partitionCols: Seq[String] = Nil,
      orderCol: Option[String] = None,
      afterCommit: () => Unit = () => (),
      mor: Boolean = false,
      availableNow: Boolean = false
  ): StreamingQuery = {
    val w = stream.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        if (!batch.isEmpty) {
          import org.apache.spark.sql.functions.{col, max, max_by, struct}
          // a batch can carry several rows per key (updates within the
          // micro-batch): MERGE requires one source row per key, so the
          // conflict is resolved here — by orderCol when given, else by
          // the documented struct-max fallback — rather than rejected
          val rest = batch.columns.filterNot(keyCols.contains).toSeq
          val one =
            if (rest.isEmpty) batch.dropDuplicates(keyCols)
            else {
              val packed = struct(rest.map(col): _*)
              val pick = orderCol match {
                case Some(oc) =>
                  require(batch.columns.contains(oc),
                    s"orderCol '$oc' is not a column of the stream")
                  max_by(packed, col(oc))
                case None => max(packed)
              }
              batch.groupBy(keyCols.map(col): _*)
                .agg(pick.as("__r"))
                .select(keyCols.map(col) :+ col("__r.*"): _*)
            }
          if (mor && tables.currentVersion(table) > 0)
            tables.upsertMor(table, one, keyCols)
          else
            tables.merge(table, one, keyCols, partitionCols)
          afterCommit()
        }
        ()
      }
    (if (availableNow) w.trigger(Trigger.AvailableNow()) else w).start()
  }

  /** Standing heavy hitters over an unbounded stream: each micro-batch
    * is reduced to per-group frequent-items sketch STATES
    * ([[graft.operators.Sketches.topKSketches]]) and combined into a
    * versioned snapshot table, so the running top-k is queryable at any
    * moment from sketch rows only ([[graft.operators.Sketches.topKRollup]]
    * over the state table) — state size is bounded by
    * |groups|·maxItemsTracked forever, however much data streams
    * through. Each batch commits one auditable table version (time
    * travel shows the top-k as of any batch).
    *
    * Exactly-once EFFECT: sketch counts ADD, so a replayed batch
    * (foreachBatch is at-least-once on retry) must not merge twice —
    * the state carries the last applied batch id, a replay is detected
    * and skipped whole, and the snapshot commit itself is atomic (CAS),
    * so a crash mid-commit never publishes a half-merged state. */
  def topKSketchSink(
      values: DataFrame,
      groupCols: Seq[String],
      valueCol: String,
      tables: graft.io.SnapshotTables,
      table: String,
      checkpoint: String,
      maxItemsTracked: Int = 8192,
      afterCommit: () => Unit = () => ()
  ): StreamingQuery =
    values.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        if (topKSketchBatch(batch, batchId, groupCols, valueCol, tables, table, maxItemsTracked))
          afterCommit()
        ()
      }
      .start()

  /** One batch of [[topKSketchSink]], factored out so replay idempotency
    * is directly testable. Returns true iff a version was committed
    * (false: empty batch or replay-skip). */
  private[streaming] def topKSketchBatch(
      batch: DataFrame,
      batchId: Long,
      groupCols: Seq[String],
      valueCol: String,
      tables: graft.io.SnapshotTables,
      table: String,
      maxItemsTracked: Int
  ): Boolean = {
    import org.apache.spark.sql.functions._
    if (batch.isEmpty) return false
    val fresh = graft.operators.Sketches.topKSketches(batch, groupCols, valueCol, maxItemsTracked)
      .withColumn("last_batch", lit(batchId))
    val merged =
      if (tables.currentVersion(table) == 0) fresh
      else {
        val cur = tables.read(table)
        // replay: the state already contains this batch's counts —
        // combining again would double them, so the batch skips whole
        if (cur.agg(max(col("last_batch"))).head.getLong(0) >= batchId) return false
        cur.unionByName(fresh)
          .groupBy(groupCols.map(col): _*)
          .agg(expr(s"approx_top_k_combine(topk_sketch, $maxItemsTracked)").as("topk_sketch"),
            sum(col("n_rows")).as("n_rows"),
            max(col("last_batch")).as("last_batch"))
      }
    // materialize BEFORE the commit: merged still reads the current
    // version's files, and one eager cut guarantees a single state read
    tables.overwriteTable(merged.localCheckpoint(true), table)
    true
  }

  /** Standing value DISTRIBUTIONS over an unbounded stream —
    * [[topKSketchSink]]'s quantile sibling (the streaming-latency-
    * percentiles shape): per-batch
    * [[graft.operators.Sketches.quantileSketches]] states combine into
    * a versioned snapshot table via the mergeable
    * [[graft.functions.QuantileSketchCombine]]; query the standing
    * percentiles at any moment with
    * [[graft.operators.Sketches.quantileRollup]] over the state table.
    * Same bounded-state, replay-skip, atomic-commit contract as the
    * top-k sink (sketch contents add — replays must skip whole). */
  def quantileSketchSink(
      values: DataFrame,
      groupCols: Seq[String],
      valueCol: String,
      tables: graft.io.SnapshotTables,
      table: String,
      checkpoint: String,
      capacity: Int = 8192,
      afterCommit: () => Unit = () => ()
  ): StreamingQuery =
    values.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        if (quantileSketchBatch(batch, batchId, groupCols, valueCol, tables, table, capacity))
          afterCommit()
        ()
      }
      .start()

  private[streaming] def quantileSketchBatch(
      batch: DataFrame,
      batchId: Long,
      groupCols: Seq[String],
      valueCol: String,
      tables: graft.io.SnapshotTables,
      table: String,
      capacity: Int
  ): Boolean = {
    import org.apache.spark.sql.functions._
    if (batch.isEmpty) return false
    val fresh = graft.operators.Sketches.quantileSketches(batch, groupCols, valueCol, capacity)
      .withColumn("last_batch", lit(batchId))
    val merged =
      if (tables.currentVersion(table) == 0) fresh
      else {
        val cur = tables.read(table)
        if (cur.agg(max(col("last_batch"))).head.getLong(0) >= batchId) return false
        val comb = udaf(new graft.functions.QuantileSketchCombine(capacity),
          org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[graft.functions.QuantLevel]]())
        cur.unionByName(fresh)
          .groupBy(groupCols.map(col): _*)
          .agg(comb(col("quant_sketch")).as("quant_sketch"),
            sum(col("n_rows")).as("n_rows"),
            max(col("last_batch")).as("last_batch"))
      }
    tables.overwriteTable(merged.localCheckpoint(true), table)
    true
  }

  /** One batch of [[incrementalDedupSink]], factored out so idempotency
    * is directly testable: returns false (no-op) when `batchId` was
    * already committed. */
  private[graft] def incrementalDedupBatch(
      batch: DataFrame,
      batchId: Long,
      idCol: String,
      textCol: String,
      corpusPath: String,
      indexPath: String,
      numHashes: Int = 8,
      compactEvery: Int = 16
  ): Boolean = {
    val spark = batch.sparkSession
    val sigCols = (0 until numHashes).map(j => s"mh_$j")
    val hconf = spark.sparkContext.hadoopConfiguration
    val marker = new org.apache.hadoop.fs.Path(indexPath, s"_committed_$batchId")
    val fs = marker.getFileSystem(hconf)
    if (fs.exists(marker)) return false // replayed batch: already fully committed
    // only a MISSING index (first batch ever) falls back to empty —
    // any other read failure (corrupt files, permissions) must fail
    // the batch, not silently reset dedup and re-land the corpus
    val index =
      try spark.read.parquet(indexPath)
      catch {
        case e: org.apache.spark.sql.AnalysisException
            if e.getCondition == "PATH_NOT_FOUND" =>
          spark.createDataFrame(
            spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
            StructType(sigCols.map(c =>
              org.apache.spark.sql.types.StructField(c, org.apache.spark.sql.types.StringType)) :+
              org.apache.spark.sql.types.StructField("src_batch", org.apache.spark.sql.types.LongType)))
      }
    // The dedup DECISION excludes this batch's own index rows (present
    // only when a prior attempt crashed between the index append and
    // the marker): the replay must re-derive the same keepers, not see
    // its own partial output and drop everything.
    val priorIndex = index.filter(coalesce(col("src_batch"), lit(-1L)) =!= lit(batchId))
    val fresh = graft.operators.Dedup
      .minhashSignatures(batch, idCol, textCol, numHashes)
      .groupBy(sigCols.map(col): _*)
      .agg(min(col(idCol)).as(idCol))
      .join(priorIndex.select(sigCols.map(col): _*).distinct(), sigCols, "left_anti")
      .localCheckpoint(true)
    // Batch-scoped OVERWRITE: a replayed batch rewrites its own
    // partition to the identical content instead of appending a second
    // copy — the corpus write is idempotent at every crash point.
    batch.join(fresh.select(col(idCol)), Seq(idCol), "left_semi")
      .write.mode("overwrite").parquet(s"$corpusPath/__batch=$batchId")
    // Append-dedup against the FULL index (own partial rows included):
    // a replay after a partial index append re-appends nothing.
    fresh.select(sigCols.map(col): _*).withColumn("src_batch", lit(batchId))
      .join(index.select(sigCols.map(col): _*), sigCols, "left_anti")
      .write.mode("append").parquet(indexPath)
    fs.create(marker, true).close() // commit point: written LAST
    if (compactEvery > 0 && (batchId + 1) % compactEvery == 0)
      compactIndex(spark, indexPath, batchId)
    true
  }

  /** Continuous NDJSON ingestion with per-batch schema-drift auditing —
    * closing the loop [[graft.core.Conform.driftReport]] opens for
    * batch: a feed whose producer silently adds, drops or re-types a
    * field mid-stream is the normal failure mode of long-running
    * ingestion, and conform-by-cast would otherwise absorb it without
    * a trace (extra columns dropped, incompatible ones nulled).
    *
    * Each micro-batch of raw NDJSON lines is schema-inferred
    * (`spark.read.json` — the one extra pass semi-structured input
    * costs; the parse itself needs it anyway since the batch schema is
    * exactly what is being audited), audited against `spec`, and
    * landed through [[graft.core.Conform]] as typed parquet. Batches
    * whose inferred schema deviates from the spec in any way invoke
    * `onDrift(batchId, report)` — wire it to metrics/alerting; the
    * batch still lands (Conform stays permissive by design, the audit
    * is the seam beside it, never a gate). Empty batches are skipped. */
  def conformedNdjsonSink(
      lines: DataFrame,
      spec: Seq[graft.core.ColumnSpec],
      outPath: String,
      checkpoint: String,
      onDrift: (Long, Seq[graft.core.Conform.ColumnDrift]) => Unit
  ): StreamingQuery =
    lines.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val spark = batch.sparkSession
        import spark.implicits._
        val raw = batch.select(col(batch.columns.head).cast("string")).as[String]
        if (!raw.isEmpty) {
          val parsed = spark.read.json(raw)
          val report = graft.core.Conform.driftReport(parsed, spec)
          if (report.exists(_.status != "exact")) onDrift(batchId, report)
          graft.core.Conform(parsed, spec).write.mode("append").parquet(outPath)
        }
        ()
      }
      .start()

  /** Bound the signature index's file growth: each micro-batch appends
    * a parquet file set to `indexPath`, and at streaming cadence that
    * is thousands of small files — the scan-split/open-cost pathology.
    * Every `compactEvery` batches the data files are rewritten into
    * ~128 MB files, AFTER the batch's commit marker, outside the
    * exactly-once protocol.
    *
    * Crash-safe by construction rather than by atomicity: the index is
    * materialized (localCheckpoint) BEFORE any file is touched, the
    * compacted files are staged in a hidden `.compact-*` dir and
    * renamed in BEFORE the old files are deleted. Every crash window
    * therefore leaves the index with AT WORST duplicate rows (staged
    * copies visible alongside not-yet-deleted originals) — never
    * missing rows — and both dedup paths `.distinct()` the index
    * before their anti-join, so duplicates are semantically inert and
    * swept by the next compaction. Old `_committed_*` markers beyond a
    * retention horizon are pruned in the same pass (replay only ever
    * revisits the latest batch; the horizon is two compaction cycles). */
  private[graft] def compactIndex(
      spark: SparkSession,
      indexPath: String,
      batchId: Long,
      targetFileBytes: Long = 128L << 20,
      markerRetention: Long = 32
  ): Unit = {
    val dir = new org.apache.hadoop.fs.Path(indexPath)
    val fs = dir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val entries = fs.listStatus(dir).toSeq
    val dataFiles = entries.filter { s =>
      val n = s.getPath.getName
      s.isFile && !n.startsWith("_") && !n.startsWith(".")
    }
    if (dataFiles.size > 1) {
      val bytes = dataFiles.map(_.getLen).sum
      val nFiles = math.max(1, math.ceil(bytes.toDouble / targetFileBytes).toInt)
      val compacted = spark.read.parquet(indexPath).localCheckpoint(true)
      val tmp = new org.apache.hadoop.fs.Path(dir, s".compact-${java.util.UUID.randomUUID}")
      compacted.repartition(nFiles).write.mode("overwrite").parquet(tmp.toString)
      // Every staged rename must be CONFIRMED before any original is
      // deleted: a failed rename with the originals already gone would
      // lose index rows (violating the never-missing-rows contract
      // above). On any failure, abort — keep the originals, sweep the
      // staging dir, and leave the index exactly as it was.
      val staged = fs.listStatus(tmp)
        .filter(f => f.isFile && f.getPath.getName.startsWith("part-"))
      val renamed = scala.collection.mutable.ArrayBuffer.empty[org.apache.hadoop.fs.Path]
      val allPlaced = staged.forall { f =>
        val dest = new org.apache.hadoop.fs.Path(dir, f.getPath.getName)
        val ok = fs.rename(f.getPath, dest)
        if (ok) renamed += dest
        ok
      }
      if (allPlaced) {
        fs.delete(tmp, true)
        dataFiles.foreach(f => fs.delete(f.getPath, false))
      } else {
        // roll back the files already placed (duplicates of live rows —
        // removing them is safe), then drop the staging dir; the next
        // compaction cycle retries from scratch
        renamed.foreach(p => fs.delete(p, false))
        fs.delete(tmp, true)
      }
    }
    entries
      .map(_.getPath)
      .filter(p => p.getName.startsWith("_committed_") &&
        p.getName.stripPrefix("_committed_").toLong < batchId - markerRetention)
      .foreach(p => fs.delete(p, false))
  }
}
