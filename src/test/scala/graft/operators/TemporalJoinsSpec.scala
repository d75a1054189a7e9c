package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class TemporalJoinsSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  test("asOfJoin attaches latest right payload at or before left time") {
    val left = Seq(
      (1L, 10L, ts("2024-01-01 10:00:00")),
      (2L, 10L, ts("2024-01-01 12:00:00")),
      (3L, 20L, ts("2024-01-01 09:00:00")) // user 20 has no quote yet
    ).toDF("event_id", "user_id", "ts")
    val right = Seq(
      (100L, 10L, ts("2024-01-01 09:30:00"), 1.0),
      (101L, 10L, ts("2024-01-01 11:00:00"), 2.0),
      (102L, 10L, ts("2024-01-01 12:00:00"), 3.0), // equal-ts: inclusive
      (103L, 20L, ts("2024-01-01 09:30:00"), 9.0)
    ).toDF("event_id", "user_id", "ts", "value")
    val out = TemporalJoins.asOfJoin(left, right, "user_id", "ts", "ts", "event_id", "value", "v")
      .select("event_id", "v").collect()
      .map(r => r.getLong(0) -> Option(r.get(1))).toMap
    assert(out(1L) == Some(1.0))
    assert(out(2L) == Some(3.0)) // equal timestamp wins over 11:00
    assert(out(3L) == None)
  }

  test("asOfJoin propagates a legitimately null payload from the matched row") {
    val left = Seq((1L, 10L, ts("2024-01-01 12:00:00"))).toDF("event_id", "user_id", "ts")
    val right = Seq(
      (100L, 10L, ts("2024-01-01 09:00:00"), Some(1.0)),
      (101L, 10L, ts("2024-01-01 11:00:00"), None: Option[Double]) // latest match, null payload
    ).toDF("event_id", "user_id", "ts", "value")
    val out = TemporalJoins.asOfJoin(left, right, "user_id", "ts", "ts", "event_id", "value", "v")
      .select("v").collect()
    // true as-of semantics: the matched row IS 11:00 and its payload is
    // null — must not fall back to 09:00's non-null 1.0
    assert(out.length == 1 && out(0).isNullAt(0))
  }

  test("asOfJoin forward/nearest directions and tolerance (merge_asof surface)") {
    val left = Seq(
      (1L, 10L, ts("2024-01-01 10:00:00")), // between 09:30 and 11:00: fwd=11:00, nearest=09:30
      (2L, 10L, ts("2024-01-01 10:45:00")), // nearest flips forward (15min vs 75min)
      (3L, 10L, ts("2024-01-01 12:30:00")), // after the last right: fwd=none
      (4L, 20L, ts("2024-01-01 09:00:00"))  // no right rows for user 20 at all -> none
    ).toDF("event_id", "user_id", "ts")
    val right = Seq(
      (100L, 10L, ts("2024-01-01 09:30:00"), 1.0),
      (101L, 10L, ts("2024-01-01 11:00:00"), 2.0)
    ).toDF("event_id", "user_id", "ts", "value")
    def run(dir: String, tol: Option[Double] = None) =
      TemporalJoins.asOfJoin(left, right, "user_id", "ts", "ts", "event_id", "value", "v",
        direction = dir, toleranceSeconds = tol)
        .select("event_id", "v").collect()
        .map(r => r.getLong(0) -> Option(r.get(1))).toMap
    val fwd = run("forward")
    assert(fwd == Map(1L -> Some(2.0), 2L -> Some(2.0), 3L -> None, 4L -> None))
    val near = run("nearest")
    assert(near == Map(1L -> Some(1.0), 2L -> Some(2.0), 3L -> Some(2.0), 4L -> None))
    // equidistant resolves backward (pandas): left at 10:15 sits exactly
    // between 09:30 and 11:00
    val mid = Seq((9L, 10L, ts("2024-01-01 10:15:00"))).toDF("event_id", "user_id", "ts")
    val tie = TemporalJoins.asOfJoin(mid, right, "user_id", "ts", "ts", "event_id", "value", "v",
      direction = "nearest").select("v").head.getDouble(0)
    assert(tie == 1.0)
    // tolerance nulls matches farther than the bound, per direction
    assert(run("backward", tol = Some(1800.0)) ==
      Map(1L -> Some(1.0), 2L -> None, 3L -> None, 4L -> None))
    assert(run("nearest", tol = Some(1800.0)) ==
      Map(1L -> Some(1.0), 2L -> Some(2.0), 3L -> None, 4L -> None))
  }

  test("rangeJoin matches inclusive bounds exactly once across buckets") {
    val left = Seq(
      (1L, 5L, ts("2024-01-01 10:00:00")), // on window start
      (2L, 5L, ts("2024-01-01 13:00:00")), // on window end (3h window spans 4 buckets)
      (3L, 5L, ts("2024-01-01 13:00:01")), // just past end
      (4L, 6L, ts("2024-01-01 10:30:00"))  // wrong key
    ).toDF("event_id", "user_id", "ts")
    val right = Seq(
      (5L, ts("2024-01-01 10:00:00"), ts("2024-01-01 13:00:00"), 900L)
    ).toDF("user_id", "w_start", "w_end", "window_id")
    val out = TemporalJoins.rangeJoin(left, "ts", right, "w_start", "w_end", keys = Seq("user_id"))
      .select("event_id", "window_id").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    // inclusive both ends, each pair exactly once despite multi-bucket window
    assert(out.sorted.toSeq == Seq((1L, 900L), (2L, 900L)))
  }

  test("overlapJoin emits each intersecting pair exactly once, including multi-cell and negative spans") {
    val a = Seq(
      (1L, 0L, 250L),     // spans cells 0,1,2 at width 100
      (2L, 500L, 600L),
      (3L, -150L, -40L)   // negative coordinates: floor-division cells
    ).toDF("a_id", "a_start", "a_end")
    val b = Seq(
      (10L, 100L, 400L),  // overlaps a1 across MULTIPLE shared cells
      (11L, 260L, 300L),  // disjoint from a1 (starts past 250)
      (12L, 590L, 700L),  // touches a2 at the edge
      (13L, -60L, -50L)   // inside a3, fully negative
    ).toDF("b_id", "b_start", "b_end")
    val out = TemporalJoins.overlapJoin(a, "a_start", "a_end", b, "b_start", "b_end", cellWidth = 100L)
      .select($"a_id", $"b_id").as[(Long, Long)].collect().sorted.toSeq
    assert(out == Seq((1L, 10L), (2L, 12L), (3L, 13L)), s"got $out")
    // exactly once: no duplicate pairs even though (1,10) shares cells 1 and 2
    assert(out.distinct == out)
    // equals the naive inequality join on the same data
    val naive = a.crossJoin(b)
      .filter($"a_start" <= $"b_end" && $"b_start" <= $"a_end")
      .select($"a_id", $"b_id").as[(Long, Long)].collect().sorted.toSeq
    assert(out == naive)
  }

  test("overlapJoin equals the naive inequality join on random interval sets (property)") {
    import org.scalacheck.Gen
    def sample[T](g: Gen[T]): T = Iterator.continually(g.sample).flatten.next()
    val genIntervals: Gen[List[(Long, Long)]] =
      Gen.chooseNum(5, 40).flatMap(n => Gen.listOfN(n,
        for (s <- Gen.chooseNum(-500L, 500L); w <- Gen.chooseNum(0L, 300L)) yield (s, s + w)))
    for (trial <- 1 to 5) {
      val la = sample(genIntervals).zipWithIndex.map { case ((s, e), i) => (i.toLong, s, e) }
      val lb = sample(genIntervals).zipWithIndex.map { case ((s, e), i) => (i.toLong, s, e) }
      val a = la.toDF("a_id", "a_start", "a_end")
      val b = lb.toDF("b_id", "b_start", "b_end")
      val cell = sample(Gen.oneOf(1L, 7L, 64L, 100L, 1000L))
      val got = TemporalJoins.overlapJoin(a, "a_start", "a_end", b, "b_start", "b_end", cellWidth = cell)
        .select($"a_id", $"b_id").as[(Long, Long)].collect().sorted.toSeq
      val want = (for ((ia, sa, ea) <- la; (ib, sb, eb) <- lb if sa <= eb && sb <= ea)
        yield (ia, ib)).sorted
      assert(got == want, s"trial $trial cell=$cell: grid join diverged from naive")
    }
  }
}
