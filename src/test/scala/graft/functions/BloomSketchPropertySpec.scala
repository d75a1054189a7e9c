package graft.functions

import org.scalacheck.Gen
import org.scalatest.funsuite.AnyFunSuite

/** The Bloom filter's load-bearing property is one-sided error: a
  * value that WAS inserted can never test negative (a false negative
  * would make readPrunedIn silently drop files holding real rows —
  * answer corruption, not IO waste). Pinned against arbitrary hash
  * sets and every (bits, hashes) sizing, merge orders included — pure
  * JVM, no Spark needed. */
class BloomSketchPropertySpec extends AnyFunSuite {

  private def sample[T](g: Gen[T]): T =
    Iterator.continually(g.sample).flatten.next()

  private val genHashes: Gen[List[Long]] =
    Gen.chooseNum(1, 400).flatMap(n => Gen.listOfN(n, Gen.long))

  private val genSizing: Gen[(Int, Int)] =
    for (bits <- Gen.oneOf(64, 256, 1 << 10, 1 << 14); k <- Gen.chooseNum(1, 8)) yield (bits, k)

  test("no false negatives: every inserted hash tests positive, any sizing, any merge order") {
    for (_ <- 1 to 20) {
      val (bits, k) = sample(genSizing)
      val hs = sample(genHashes)
      val agg = new BloomSketchAggregator(bits, k)
      // split into shards, reduce each, merge in reverse order —
      // partial aggregation with arbitrary merge trees
      val shards = hs.grouped(math.max(1, hs.size / 4)).toList
      val bufs = shards.map(sh => sh.foldLeft(agg.zero)(agg.reduce))
      val merged = bufs.reverse.reduce(agg.merge)
      val bitmap = agg.finish(merged)
      hs.foreach { h =>
        assert(BloomSketch.mightContain(bitmap, h, bits, k),
          s"false negative for $h at bits=$bits k=$k")
      }
    }
  }

  test("positions are always in range and deterministic") {
    for (_ <- 1 to 50) {
      val (bits, k) = sample(genSizing)
      val h = sample(Gen.long)
      val p1 = BloomSketch.positions(h, bits, k)
      val p2 = BloomSketch.positions(h, bits, k)
      assert(p1.toSeq == p2.toSeq)
      assert(p1.forall(p => p >= 0 && p < bits), s"position out of range at bits=$bits: ${p1.toSeq}")
      assert(p1.length == k)
    }
  }

  test("a sketch never claims MORE than it saw too often: empty sketch rejects everything") {
    val agg = new BloomSketchAggregator(1 << 10, 4)
    val empty = agg.finish(agg.zero)
    for (_ <- 1 to 100) {
      val h = sample(Gen.long)
      assert(!BloomSketch.mightContain(empty, h, 1 << 10, 4))
    }
  }
}
