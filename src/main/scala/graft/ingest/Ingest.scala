package graft.ingest

import com.fasterxml.jackson.databind.ObjectMapper
import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.util.LongAccumulator

/** Paginated-source ingest.
  *
  * The reference fetches a paginated REST API with a hand-rolled
  * page→node assignment across 3 Airflow tasks and a retry loop
  * (reference: airflow/dags/datalake_bronze_fetch_raw_data_api_dag.py:226-309,
  * airflow/plugins/operators/fetch_api_operator.py:22-52). Spark-first,
  * the task scheduler replaces the page distributor: `spark.range(pages)`
  * repartitioned across the cluster, each task fetching its pages inside
  * `mapPartitions` — which scales to any node count, retries per page,
  * and keeps failures task-local (a failed page retries as a task, not a
  * whole node's page list).
  */
object Ingest {

  /** Pagination plan: `ceil(total / pageSize)` pages
    * (reference: datalake_bronze_...py:262-277, 200 rows/page at :25). */
  def pageCount(totalRows: Long, pageSize: Int): Int = {
    require(pageSize > 0, "pageSize must be positive")
    (((totalRows + pageSize - 1) / pageSize).min(Int.MaxValue)).toInt
  }

  /** Reference-parity page→node assignment: contiguous near-even ranges
    * with the remainder spread over the first nodes
    * (reference: datalake_bronze_...py:226-260). Kept for invariant tests;
    * the distributed path below doesn't need it. */
  def nodesPages(pages: Int, nodes: Int): Seq[Seq[Int]] = {
    require(nodes > 0)
    val base = pages / nodes
    val rem = pages % nodes
    val sizes = Seq.tabulate(nodes)(i => base + (if (i < rem) 1 else 0))
    val starts = sizes.scanLeft(1)(_ + _)
    sizes.zip(starts).map { case (n, s) => (s until s + n).toSeq }
  }

  /** Bounded retry with fixed wait — `FetchApiOperator.execute`
    * semantics (fetch_api_operator.py:22-47): retry up to `maxRetries`,
    * sleeping `waitMillis`, rethrowing the last failure. */
  def withRetry[T](maxRetries: Int, waitMillis: Long)(f: => T): T = {
    var attempt = 0
    while (true) {
      try return f
      catch {
        case e: Exception =>
          attempt += 1
          if (attempt >= maxRetries) throw e
          Thread.sleep(waitMillis)
      }
    }
    throw new IllegalStateException("unreachable")
  }

  /** Bronze-landing validity gate — `is_valid_json` parity
    * (reference: datalake_bronze_fetch_raw_data_api_dag.py:207-224,299-309,
    * decase/utils.py:65-79): a fetched page body is landed only if it
    * parses as JSON AND is a non-empty array; each array element becomes
    * one NDJSON line (the reference's json.dumps-per-element loop).
    *
    * `strict = true` is exact reference behavior: an invalid page fails
    * the job (the DAG raises AirflowException). `strict = false` is the
    * engine mode a 100 TB ingest actually wants: the page is dropped and
    * counted in `malformedPages` (a LongAccumulator — the executor-side
    * counter that doesn't cost a second pass), so one poisoned page
    * can't kill a million-page land.
    *
    * Runs in mapPartitions (the HTTP/codec boundary where imperative
    * code belongs): the Jackson mapper is built once per partition,
    * mirroring per-task codec init. */
  def validatedNdjsonLines(
      pages: Dataset[String],
      strict: Boolean = true,
      malformedPages: Option[LongAccumulator] = None
  ): Dataset[String] = {
    val spark = pages.sparkSession
    import spark.implicits._
    pages.mapPartitions { it =>
      val mapper = new ObjectMapper()
      it.flatMap { body =>
        val parsed =
          try {
            val n = mapper.readTree(body)
            if (n != null && n.isArray && n.size > 0) Some(n) else None
          } catch { case _: Exception => None }
        parsed match {
          case Some(arr) =>
            (0 until arr.size).iterator.map(i => mapper.writeValueAsString(arr.get(i)))
          case None =>
            if (strict)
              throw new IllegalArgumentException(
                s"Invalid JSON page (not a non-empty array): ${String.valueOf(body).take(80)}")
            malformedPages.foreach(_.add(1L))
            Iterator.empty
        }
      }
    }
  }

  /** Default HTTP page fetcher — the concrete `Int => String` that
    * completes [[fetchPages]] parity with the reference's
    * FetchApiOperator (fetch_api_operator.py:22-52: GET the page URL,
    * accept only a 2xx status, raise otherwise — the raise is what
    * arms the retry loop, here [[withRetry]] inside fetchPages).
    *
    * Serialization: instances ship to executors in the task closure;
    * the JVM-level HttpClient lives in the companion (one per executor
    * JVM, built on first use) so nothing non-serializable is captured.
    * The transport is injectable (`send`) so the status/error contract
    * is unit-testable without a network; the DEFAULT transport is
    * additionally exercised over real sockets against a loopback
    * paginated API from executor tasks (LiveHttpIngestSpec — zero
    * egress forbids external calls, loopback does not).
    *
    * @param urlForPage page number → absolute URL (the reference
    *        passes the page as a query param; encode it here)
    * @param headers    constant request headers (auth tokens etc.)
    */
  final class HttpPageFetcher(
      urlForPage: Int => String,
      headers: Map[String, String] = Map.empty,
      timeoutMillis: Long = 30000L,
      send: java.net.http.HttpRequest => (Int, String) = HttpPageFetcher.defaultSend
  ) extends (Int => String) with Serializable {
    override def apply(page: Int): String = {
      val b = java.net.http.HttpRequest.newBuilder(java.net.URI.create(urlForPage(page)))
        .timeout(java.time.Duration.ofMillis(timeoutMillis))
        .GET()
      headers.foreach { case (k, v) => b.header(k, v) }
      val (status, body) = send(b.build())
      // 2xx-only, mirroring the reference's status_code check: anything
      // else throws so withRetry re-attempts and eventually rethrows
      if (status / 100 != 2)
        throw new java.io.IOException(s"HTTP $status fetching page $page")
      body
    }
  }

  object HttpPageFetcher {
    // one client per executor JVM — connection pooling across tasks
    @transient private lazy val client: java.net.http.HttpClient =
      java.net.http.HttpClient.newBuilder()
        .followRedirects(java.net.http.HttpClient.Redirect.NORMAL)
        .build()

    private def defaultSend(req: java.net.http.HttpRequest): (Int, String) = {
      val resp = client.send(req, java.net.http.HttpResponse.BodyHandlers.ofString())
      (resp.statusCode(), resp.body())
    }
  }

  /** Distributed page fetch: one row per page body. `fetcher` runs on
    * executors (build any HTTP client inside it, per task). */
  def fetchPages(
      spark: SparkSession,
      pages: Int,
      parallelism: Int,
      fetcher: Int => String,
      maxRetries: Int = 3,
      waitMillis: Long = 1000L
  ): Dataset[String] = {
    import spark.implicits._
    spark
      .range(1, pages + 1L)
      .repartition(parallelism)
      .mapPartitions(_.map(id => withRetry(maxRetries, waitMillis)(fetcher(id.toInt))))
  }
}
