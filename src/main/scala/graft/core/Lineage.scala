package graft.core

import org.apache.spark.sql.DataFrame

/** Lineage cutting for iterative operators (pointer-doubling connected
  * components, Lloyd iterations): each round must not replay the full
  * chain of prior rounds, so the frame is materialized and its plan
  * truncated once per round.
  *
  * Two modes, one contract:
  *  - default `localCheckpoint`: blocks live on executor block
  *    managers — no filesystem round-trip, the right choice on a
  *    healthy cluster and in local mode. An executor loss mid-run
  *    loses blocks and fails the job (localCheckpoint truncates the
  *    lineage needed to recompute them).
  *  - `checkpointDir = Some(dir)`: reliable `checkpoint` to a durable
  *    filesystem (HDFS/object store). Survives executor death — a
  *    1000-executor run over hours should pay the write, because a
  *    single lost executor otherwise restarts the whole iteration
  *    chain from round 0.
  */
object Lineage {
  def cut(df: DataFrame, checkpointDir: Option[String] = None): DataFrame =
    checkpointDir match {
      case Some(dir) =>
        val sc = df.sparkSession.sparkContext
        if (!sc.getCheckpointDir.contains(dir)) sc.setCheckpointDir(dir)
        df.checkpoint(eager = true)
      case None => df.localCheckpoint(eager = true)
    }

  /** Shuffle width proportional to the frame's actual bytes (one
    * reduce partition per ~`targetBytes`), for iterative operators
    * whose rounds execute eagerly inside the operator: a tiny frame
    * must not pay the session-wide reduce-task floor on every round
    * (pure scheduling overhead at fixture scale), while a 100 TB frame
    * reports petabyte-range stats and takes the cap — the larger of
    * the session's configured width and the frame's own partition
    * count, both of which arrive scale-proportional on a real cluster.
    * Catalyst's `defaultSizeInBytes` sentinel (stats unknown) also
    * lands on the cap, so unknown size never narrows the shuffle. */
  def widthFor(df: DataFrame, targetBytes: Long = 64L << 20): Int = {
    val bytes = df.queryExecution.optimizedPlan.stats.sizeInBytes
    val byBytes = (bytes / targetBytes) + 1
    // the conf value may be non-numeric on some platforms ("auto");
    // fall back to cluster parallelism rather than throwing
    val configured = scala.util.Try(
      df.sparkSession.conf.get("spark.sql.shuffle.partitions").toInt
    ).getOrElse(df.sparkSession.sparkContext.defaultParallelism)
    val cap = math.max(configured, df.rdd.getNumPartitions)
    byBytes.min(BigInt(cap)).max(BigInt(1)).toInt
  }
}
