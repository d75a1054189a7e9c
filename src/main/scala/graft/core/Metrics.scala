package graft.core

import org.apache.spark.sql.{DataFrame, Observation}
import org.apache.spark.sql.functions._

/** Run metrics without extra passes.
  *
  * The reference logs row counts by calling `count()` next to its real
  * action, re-executing the whole plan each time — the gold job runs
  * its plan three times (show / write / count; SURVEY §3.1 step 6). At
  * 100 TB a metric must never cost a scan: `observe` attaches the
  * counter to the write's own execution.
  */
object Metrics {

  /** Run `action` on `df` and return the row count observed DURING that
    * action — one execution, no cache, no re-scan. */
  def observedRows(df: DataFrame, name: String)(action: DataFrame => Unit): Long = {
    val obs = Observation(name)
    action(df.observe(obs, count(lit(1)).as("rows")))
    obs.get("rows").asInstanceOf[Long]
  }

  /** Wall-clock a block, returning (result, seconds) — the reference's
    * logged timer spans (job_silver.py:142-149,157,180-181). */
  def timed[T](f: => T): (T, Double) = {
    val t0 = System.nanoTime()
    val r = f
    (r, (System.nanoTime() - t0) / 1e9)
  }
}
