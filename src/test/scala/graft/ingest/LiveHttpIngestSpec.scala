package graft.ingest

import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets

import com.sun.net.httpserver.{HttpExchange, HttpServer}
import graft.SparkSpec

/** The ingest path over a REAL network stack: the DEFAULT
  * HttpPageFetcher transport (JDK HttpClient, previously compiled but
  * never exercised — zero egress forbids external calls, loopback does
  * not) fetches a paginated JSON API served by a local HttpServer,
  * from EXECUTOR tasks, with a transient-500 page arming the retry
  * loop — the full fetch→validate→explode pipeline the reference's
  * FetchApiOperator runs against its real API
  * (fetch_api_operator.py:22-52). */
class LiveHttpIngestSpec extends SparkSpec {

  test("default HTTP transport: paginated loopback API fetched from executors, 5xx retried") {
    val hits = new java.util.concurrent.ConcurrentHashMap[Int, java.util.concurrent.atomic.AtomicInteger]()
    val server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    server.createContext("/breweries", (ex: HttpExchange) => {
      val page = ex.getRequestURI.getQuery.split('&')
        .collectFirst { case q if q.startsWith("page=") => q.stripPrefix("page=").toInt }.get
      val n = hits.computeIfAbsent(page, _ => new java.util.concurrent.atomic.AtomicInteger())
        .incrementAndGet()
      val (code, body) =
        if (page == 3 && n <= 2) (500, """{"error":"transient"}""") // arms the retry loop
        else (200,
          s"""[{"id":"b$page-1","name":"Brew $page-1","city":"C$page"},""" +
            s"""{"id":"b$page-2","name":"Brew $page-2","city":"C$page"}]""")
      val b = body.getBytes(StandardCharsets.UTF_8)
      ex.sendResponseHeaders(code, b.length)
      ex.getResponseBody.write(b)
      ex.close()
    })
    server.start()
    try {
      val base = s"http://127.0.0.1:${server.getAddress.getPort}/breweries?per_page=2&page="
      // DEFAULT transport — no injected send
      val fetcher = new Ingest.HttpPageFetcher(p => base + p)
      val pages = Ingest.fetchPages(spark, pages = 5, parallelism = 3, fetcher,
        maxRetries = 3, waitMillis = 20L)
      val lines = Ingest.validatedNdjsonLines(pages, strict = true).collect()
      assert(lines.length == 10) // 5 pages x 2 elements
      val ids = lines.map { l =>
        """"id":"([^"]+)"""".r.findFirstMatchIn(l).get.group(1)
      }.toSet
      assert(ids == (1 to 5).flatMap(p => Seq(s"b$p-1", s"b$p-2")).toSet)
      // every page was fetched over a real socket; the flaky page paid
      // its two failures and then succeeded
      assert((1 to 5).forall(p => hits.get(p).get() >= 1))
      assert(hits.get(3).get() == 3)
    } finally server.stop(0)
  }

  test("a page that never recovers exhausts retries and fails the job loudly") {
    val server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    server.createContext("/dead", (ex: HttpExchange) => {
      val b = "gone".getBytes(StandardCharsets.UTF_8)
      ex.sendResponseHeaders(503, b.length)
      ex.getResponseBody.write(b); ex.close()
    })
    server.start()
    try {
      val base = s"http://127.0.0.1:${server.getAddress.getPort}/dead?page="
      val fetcher = new Ingest.HttpPageFetcher(p => base + p)
      val e = intercept[org.apache.spark.SparkException] {
        Ingest.fetchPages(spark, pages = 1, parallelism = 1, fetcher,
          maxRetries = 2, waitMillis = 5L).collect()
      }
      assert(e.getMessage.contains("HTTP 503") ||
        Option(e.getCause).exists(_.getMessage.contains("HTTP 503")))
    } finally server.stop(0)
  }
}
