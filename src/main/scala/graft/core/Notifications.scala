package graft.core

/** Run-completion / failure notification formatting — the reference's
  * notification surface (O8), message-for-message
  * (reference: airflow/dags/datalake_pipeline_breweries.py:53-127;
  * repeated near-verbatim in each of the four DAGs). The reference's
  * Slack sender is print-stubbed (:147-149), so format parity IS the
  * full behavior; delivery stays a caller-side concern (`sink`
  * parameter, default println — exactly the stub).
  */
object Notifications {

  /** Duration rendering with python `str(timedelta)` semantics — the
    * exact strings the reference produces (:75-85): `H:MM:SS` with an
    * UNPADDED hour, a `N day(s), ` prefix past 24h, and python's
    * floor-mod normalization for negatives (−5s → `-1 day, 23:59:55`).
    * The reference's missing-dates fallback is the differently-padded
    * literal `00:00:00` (:73), preserved in [[runMessage]]. */
  def formatDuration(totalSeconds: Long): String = {
    val days = Math.floorDiv(totalSeconds, 86400L)
    val rem = Math.floorMod(totalSeconds, 86400L)
    val hms = f"${rem / 3600}%d:${rem % 3600 / 60}%02d:${rem % 60}%02d"
    if (days == 0) hms
    else s"$days day${if (days == 1 || days == -1) "" else "s"}, $hms"
  }

  /** Run-summary message (`create_notification_message`, :53-96).
    * `start`/`end` millis absent (the reference's AttributeError path)
    * → the `00:00:00` default. */
  def runMessage(
      jobId: String,
      parameterDate: String,
      message: String,
      startMillis: Option[Long],
      endMillis: Option[Long]
  ): String = {
    val duration = (startMillis, endMillis) match {
      case (Some(s), Some(e)) => formatDuration((e - s) / 1000L)
      case _                  => "00:00:00"
    }
    s"*Dag*: $jobId\n*Parameter Date*: $parameterDate\n*Total Time*: $duration\n*Msg*: $message"
  }

  /** Failure message (`create_failure_notification`, :99-127). */
  def failureMessage(
      taskId: String,
      jobId: String,
      logicalTime: String,
      executionTime: String,
      logUrl: String
  ): String =
    s":x: *Task Failed*\n*Task*: $taskId\n*Dag*: $jobId\n*Parameter Date*: $logicalTime\n" +
      s"*Execution Date*: $executionTime\n<$logUrl|*View Logs*>"

  /** Run `body`, then emit the reference's success message (or the
    * failure message and rethrow) through `sink` — the engine-side
    * analog of the DAG's on_failure_callback + end-of-run notify task
    * (`event_failure_tasks` :131-149). One wall clock, no extra Spark
    * actions. */
  def notified[T](jobId: String, parameterDate: String, sink: String => Unit = println)(
      body: => T
  ): T = {
    val t0 = System.currentTimeMillis()
    try {
      val r = body
      // 'Finished' is the literal every DAG passes (e.g.
      // datalake_silver_spark_dag.py:224)
      sink(runMessage(jobId, parameterDate, "Finished",
        Some(t0), Some(System.currentTimeMillis())))
      r
    } catch {
      case e: Throwable =>
        sink(failureMessage(jobId, jobId, parameterDate,
          java.time.Instant.ofEpochMilli(System.currentTimeMillis()).toString, ""))
        throw e
    }
  }
}
