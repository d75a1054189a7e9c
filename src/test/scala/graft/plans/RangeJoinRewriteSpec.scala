package graft.plans

import graft.SparkSpec
import org.apache.spark.sql.functions._

class RangeJoinRewriteSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  private def events = Seq(
    (1L, ts("2024-01-01 10:00:00")), // on start bound
    (2L, ts("2024-01-01 12:30:00")), // inside, 3 buckets from start
    (3L, ts("2024-01-01 13:00:00")), // on end bound
    (4L, ts("2024-01-01 13:00:01")), // just outside
    (5L, ts("2024-01-02 00:00:00"))  // far outside
  ).toDF("event_id", "t")

  private def windows = Seq(
    (100L, ts("2024-01-01 10:00:00"), ts("2024-01-01 13:00:00")), // 3h: spans 4 buckets
    (200L, ts("2024-01-01 23:00:00"), ts("2024-01-02 01:00:00")),
    (300L, ts("2024-01-01 09:00:00"), ts("2024-01-01 08:00:00"))  // degenerate s > e
  ).toDF("window_id", "w_start", "w_end")

  test("keyless BETWEEN join plans as a hash join, never BNLJ") {
    val j = events.join(windows, $"t" >= $"w_start" && $"t" <= $"w_end")
    j.count() // let AQE finalize
    val plan = j.queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"),
      s"range join must be rewritten:\n$plan")
  }

  test("rewritten join returns exactly the BETWEEN matches, each once") {
    val out = events.join(windows, $"t" >= $"w_start" && $"t" <= $"w_end")
      .select("event_id", "window_id").as[(Long, Long)].collect().sorted.toSeq
    assert(out == Seq((1L, 100L), (2L, 100L), (3L, 100L), (5L, 200L)))
  }

  test("extra conjuncts survive the rewrite") {
    val out = events.join(windows,
        $"t" >= $"w_start" && $"t" <= $"w_end" && $"event_id" < lit(3))
      .select("event_id", "window_id").as[(Long, Long)].collect().sorted.toSeq
    assert(out == Seq((1L, 100L), (2L, 100L)))
  }

  test("joins that already have an equi key are left alone") {
    val evK = events.withColumn("k", $"event_id" % 2)
    val winK = windows.withColumn("k", $"window_id" % 2)
    val j = evK.join(winK, evK("k") === winK("k") && $"t" >= $"w_start" && $"t" <= $"w_end")
    val plan = j.queryExecution.optimizedPlan.toString
    assert(!plan.contains("__graft_pbkt"), s"equi join must not be rewritten:\n$plan")
    // and results still correct: only event 2 (k=0) matches window 100 (k=0)
    val out = j.select("event_id", "window_id").as[(Long, Long)].collect().sorted.toSeq
    assert(out == Seq((2L, 100L)))
  }

  test("rewrite matches a driver-computed nested loop on randomized data") {
    val rnd = new scala.util.Random(7)
    val evRows = (0 until 300).map(i =>
      (i.toLong, new java.sql.Timestamp(1700000000000L + rnd.nextInt(400000) * 1000L)))
    val winRows = (0 until 40).map(i => {
      val s = 1700000000000L + rnd.nextInt(400000) * 1000L
      (i.toLong + 1000L, new java.sql.Timestamp(s),
        new java.sql.Timestamp(s + rnd.nextInt(30000) * 1000L))
    })
    val ev = evRows.toDF("event_id", "t")
    val win = winRows.toDF("window_id", "w_start", "w_end")
    val got = ev.join(win, $"t" >= $"w_start" && $"t" <= $"w_end")
      .select("event_id", "window_id").as[(Long, Long)].collect().toSet
    val want = (for {
      (eid, t) <- evRows
      (wid, s, e) <- winRows
      if !t.before(s) && !t.after(e)
    } yield (eid, wid)).toSet
    assert(got == want)
  }

  test("outer/semi range joins are not touched") {
    val j = events.join(windows, $"t" >= $"w_start" && $"t" <= $"w_end", "left_outer")
    val plan = j.queryExecution.optimizedPlan.toString
    assert(!plan.contains("__graft_pbkt"))
    assert(j.count() == 5) // unmatched events kept
  }
}
