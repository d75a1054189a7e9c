package graft

import org.scalatest.funsuite.AnyFunSuite

/** The cross-round perf ledger (r20): BENCH_PRIORS.json carries both
  * `prev` (the last official run's snapshot — what in-run 3x guards
  * anchor on) and `best_<field>` per-key minima that SURVIVE a
  * refresh, plus the quick-mode `drift` stamp that puts the
  * regression signal into the driver-captured artifact. Pure-function
  * pins — no Spark session needed. */
class BenchLedgerSpec extends AnyFunSuite {

  test("extractField: sf-gated, field-exact (best_queries never bleeds into queries)") {
    val txt = """{"metric":"priors","queries":{"q1":1.5,"q2":0.4},""" +
      """"best_queries":{"q1":1.0,"q2":0.3},"sf":"/data/sf0.1"}"""
    assert(Bench.extractField(txt, "/data/sf0.1", "queries") == Map("q1" -> 1.5, "q2" -> 0.4))
    assert(Bench.extractField(txt, "/data/sf0.1", "best_queries") == Map("q1" -> 1.0, "q2" -> 0.3))
    // a prior measured at a different scale factor is never a valid reference
    assert(Bench.extractField(txt, "/data/sf0.01", "queries").isEmpty)
  }

  test("foldBest: minima fold, union of keys, failures excluded, first-migration seeding") {
    // steady state: best improves only where the run beat it
    val fold = Bench.foldBest(
      seededBest = Map("a" -> 1.0, "b" -> 2.0, "gone" -> 0.7),
      seededPrev = Map("a" -> 9.9),
      now = Seq("a" -> 1.4, "b" -> 1.1, "new" -> 3.0, "failed" -> -1.0)).toMap
    assert(fold == Map("a" -> 1.0, "b" -> 1.1, "gone" -> 0.7, "new" -> 3.0))
    // 'gone' (absent this run) keeps its history; 'failed' (-1) never enters
    // first migration: no best_ map yet — the prior prev snapshot seeds it
    val seeded = Bench.foldBest(Map.empty, Map("a" -> 2.0), Seq("a" -> 2.5)).toMap
    assert(seeded == Map("a" -> 2.0))
    // a poisoned prior (-1 / 0) can't seed either path
    assert(Bench.foldBest(Map("a" -> -1.0), Map("a" -> 0.0), Seq("a" -> 2.5)).toMap
      == Map("a" -> 2.5))
  }

  test("driftFlags: >2x over a positive prior AND >=0.5s absolute; format name:now/prior") {
    val prev = Map("big" -> 2.0, "small" -> 0.1, "zero" -> 0.0)
    val flags = Bench.driftFlags(prev, Seq(
      "big" -> 4.5,     // 2.25x and multi-second: flagged
      "small" -> 0.35,  // 3.5x but sub-half-second: ambient noise, not flagged
      "zero" -> 1.0,    // no positive prior: can't drift
      "noprior" -> 9.0, // unknown span: can't drift
      "big2" -> 3.9))   // no prior entry
    assert(flags == Seq("big:4.5/2.0"))
    // exactly 2x does not flag (the bar is strict)
    assert(Bench.driftFlags(Map("q" -> 1.0), Seq("q" -> 2.0)).isEmpty)
  }
}
