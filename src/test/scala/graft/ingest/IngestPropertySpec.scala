package graft.ingest

import org.scalacheck.Gen
import org.scalatest.funsuite.AnyFunSuite

/** Property tests for the pagination planner (SURVEY §5.4), mirroring
  * the reference planner's invariants
  * (datalake_bronze_fetch_raw_data_api_dag.py:238-260). Driver-side
  * pure functions — no Spark. */
class IngestPropertySpec extends AnyFunSuite {

  private def sample[T](g: Gen[T]): T =
    Iterator.continually(g.sample).flatten.next()

  test("pageCount is the minimal p with p*pageSize >= total") {
    for (_ <- 1 to 500) {
      val total = sample(Gen.choose(0L, 5000000L))
      val size = sample(Gen.choose(1, 1000))
      val p = Ingest.pageCount(total, size)
      assert(p.toLong * size >= total)
      assert((p - 1).toLong * size < total || p == 0)
    }
  }

  test("nodesPages covers all pages exactly once, contiguous, near-even") {
    for (_ <- 1 to 500) {
      val pages = sample(Gen.choose(0, 500))
      val nodes = sample(Gen.choose(1, 20))
      val plan = Ingest.nodesPages(pages, nodes)
      assert(plan.length == nodes)
      assert(plan.flatten.sorted == (1 to pages).toList) // exactly-once cover
      assert(plan.forall(ps => ps.isEmpty || ps == (ps.head to ps.last))) // contiguous
      val sizes = plan.map(_.size)
      assert(sizes.max - sizes.min <= 1) // near-even with remainder spread
      assert(sizes.zip(sizes.tail).forall { case (a, b) => a >= b }) // remainder goes first
    }
  }
}
