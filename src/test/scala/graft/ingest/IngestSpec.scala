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
