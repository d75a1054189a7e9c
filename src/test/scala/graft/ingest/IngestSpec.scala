package graft.ingest

import graft.SparkSpec

class IngestSpec extends SparkSpec {

  test("pageCount = ceil(total/pageSize)") {
    assert(Ingest.pageCount(0, 200) == 0)
    assert(Ingest.pageCount(1, 200) == 1)
    assert(Ingest.pageCount(200, 200) == 1)
    assert(Ingest.pageCount(201, 200) == 2)
    assert(Ingest.pageCount(8923, 200) == 45)
  }

  test("nodesPages covers all pages exactly once, contiguous, near-even") {
    // mirrors get_nodes_pages invariants (datalake_bronze_...py:238-260)
    for (pages <- Seq(1, 2, 3, 7, 45, 100); nodes <- Seq(1, 2, 3, 5)) {
      val plan = Ingest.nodesPages(pages, nodes)
      assert(plan.length == nodes)
      val all = plan.flatten
      assert(all.sorted == (1 to pages).toList, s"pages=$pages nodes=$nodes")
      assert(plan.forall(p => p.isEmpty || p == (p.head to p.last)))
      val sizes = plan.map(_.size)
      assert(sizes.max - sizes.min <= 1)
    }
  }

  test("withRetry retries then succeeds; rethrows after max") {
    var calls = 0
    val out = Ingest.withRetry(3, 0) {
      calls += 1
      if (calls < 3) throw new RuntimeException("boom")
      "ok"
    }
    assert(out == "ok" && calls == 3)
    var calls2 = 0
    val e = intercept[RuntimeException](Ingest.withRetry(2, 0) {
      calls2 += 1; throw new RuntimeException("always")
    })
    assert(e.getMessage == "always" && calls2 == 2)
  }

  test("validatedNdjsonLines explodes valid array pages to one line per element") {
    import spark.implicits._
    val pages = Seq(
      """[{"id":"a","n":1},{"id":"b","n":2}]""",
      """[{"id":"c","n":3}]"""
    ).toDS()
    val lines = Ingest.validatedNdjsonLines(pages).collect().toSet
    assert(lines == Set("""{"id":"a","n":1}""", """{"id":"b","n":2}""", """{"id":"c","n":3}"""))
  }

  test("validatedNdjsonLines strict mode fails on malformed/empty/non-array pages (reference parity)") {
    import spark.implicits._
    for (bad <- Seq("not json at all", "[]", """{"id":"obj-not-array"}""")) {
      val pages = Seq("""[{"ok":1}]""", bad).toDS()
      intercept[org.apache.spark.SparkException] {
        Ingest.validatedNdjsonLines(pages, strict = true).collect()
      }
    }
  }

  test("validatedNdjsonLines lenient mode drops and counts malformed pages") {
    import spark.implicits._
    val counter = spark.sparkContext.longAccumulator("malformed_pages")
    val pages = Seq("""[{"ok":1},{"ok":2}]""", "garbage{", "[]", """[{"ok":3}]""").toDS()
    val lines = Ingest.validatedNdjsonLines(pages, strict = false, Some(counter)).collect()
    assert(lines.length == 3)
    assert(counter.value == 2L)
  }

  test("HttpPageFetcher: 2xx returns the body, non-2xx throws (arming withRetry), headers/URL applied") {
    // stubbed transport — no network in this sandbox; the contract
    // under test is the status check and request construction
    val seen = new java.util.concurrent.ConcurrentLinkedQueue[java.net.http.HttpRequest]()
    def stub(statusFor: Int => Int)(req: java.net.http.HttpRequest): (Int, String) = {
      seen.add(req)
      val page = req.uri.getQuery.stripPrefix("page=").toInt
      (statusFor(page), s"payload-$page")
    }
    val ok = new Ingest.HttpPageFetcher(
      p => s"https://api.example.test/v1/rows?page=$p",
      headers = Map("Authorization" -> "Bearer t"),
      send = stub(_ => 200))
    assert(ok(7) == "payload-7")
    val req = seen.poll()
    assert(req.uri.toString == "https://api.example.test/v1/rows?page=7")
    assert(req.headers.firstValue("Authorization").get == "Bearer t")
    assert(req.method == "GET")
    // 201 is still success (2xx family), 404/500 throw with the status
    assert(new Ingest.HttpPageFetcher(p => s"http://x/?page=$p", send = stub(_ => 201))(1) == "payload-1")
    val e = intercept[java.io.IOException](
      new Ingest.HttpPageFetcher(p => s"http://x/?page=$p", send = stub(_ => 404))(3))
    assert(e.getMessage.contains("404") && e.getMessage.contains("page 3"))
  }

  test("HttpPageFetcher composes with fetchPages: transient 5xx retried on executors") {
    val cnt = new java.util.concurrent.ConcurrentHashMap[Int, Integer]()
    val flaky = new Ingest.HttpPageFetcher(
      p => s"http://api.test/?page=$p",
      send = { req =>
        val page = req.uri.getQuery.stripPrefix("page=").toInt
        val n = cnt.merge(page, 1, (a, b) => a + b)
        // page 2's first attempt returns 503; every retry succeeds
        if (page == 2 && n == 1) (503, "unavailable") else (200, s"body-$page")
      })
    val bodies = Ingest.fetchPages(spark, pages = 5, parallelism = 2, flaky,
      maxRetries = 3, waitMillis = 1).collect().toSet
    assert(bodies == (1 to 5).map(p => s"body-$p").toSet)
  }

  test("fetchPages fetches every page across partitions with retry") {
    val failOnce = new java.util.concurrent.ConcurrentHashMap[Int, Boolean]()
    val bodies = Ingest
      .fetchPages(
        spark,
        pages = 10,
        parallelism = 3,
        fetcher = { p =>
          // first attempt at page 4 fails (exercises executor-side retry)
          if (p == 4 && failOnce.putIfAbsent(p, true) == null) throw new RuntimeException("flaky")
          s"body-$p"
        },
        maxRetries = 3,
        waitMillis = 1
      )
      .collect()
      .toSet
    assert(bodies == (1 to 10).map(p => s"body-$p").toSet)
  }
}
