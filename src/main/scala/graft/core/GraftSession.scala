package graft.core

import org.apache.spark.sql.SparkSession

/** Session factory for the graft engine.
  *
  * The reference configures its sessions per-job via `spark-submit --conf`
  * (reference: airflow/dags/datalake_silver_spark_dag.py:168-214); we
  * centralize the scale-relevant defaults instead:
  *
  *  - `spark.sql.shuffle.partitions` sized to the local core count (not the
  *    200 default) — on a real cluster this is overridden to ~2-3× total
  *    cores; AQE coalesces down from there.
  *  - AQE on (coalesce partitions + skew-join handling), which is the
  *    100 TB answer to skewed keys and mis-sized shuffles.
  *  - UTC session timezone so partition-date derivation is explicit, never
  *    wall-clock (reference hard-codes UTC−3; see
  *    graft.pipeline.PipelineConf.saoPauloDate).
  */
object GraftSession {
  // the JDK HttpServer defaults to Nagle-enabled sockets, and its
  // delayed-ACK interaction stalls every small request ~40 ms — a 4x
  // tax on the loopback wire servers (Nessie/lake/S3). Must be set
  // BEFORE the first HttpServer class-loads (its ServerConfig reads
  // properties once, statically), so it lives in the session factory
  // every entry point goes through.
  System.setProperty("sun.net.httpserver.nodelay", "true")

  def builder(appName: String = "graft", cores: Int = defaultCores): SparkSession.Builder =
    SparkSession
      .builder()
      .appName(appName)
      .config("spark.sql.shuffle.partitions", cores.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.ui.enabled", "false")

  /** Local session used by tests and the CLI mains. */
  def local(appName: String = "graft", cores: Int = defaultCores): SparkSession =
    builder(appName, cores).master(s"local[$cores]").getOrCreate()

  def defaultCores: Int =
    sys.env.get("SPARK_GRAFT_CPUS").map(_.toInt).getOrElse(Runtime.getRuntime.availableProcessors.min(32))
}
