package graft.operators

import graft.SparkSpec
import org.scalacheck.Gen

/** Property tests for the hash-derived-randomness contract (SURVEY
  * §2.i-bis X25/X39): a row's split / mixture membership is a pure
  * function of its id — stable under corpus growth, shuffling, and
  * re-runs. This is the property that makes incremental 100 TB ingest
  * reproducible, so it gets pinned against arbitrary id sets, not one
  * fixture. */
class CurationPropertySpec extends SparkSpec {
  import spark.implicits._

  private def sample[T](g: Gen[T]): T =
    Iterator.continually(g.sample).flatten.next()

  private val genIds: Gen[Set[Long]] =
    Gen.chooseNum(20, 120).flatMap(n => Gen.listOfN(n, Gen.chooseNum(0L, 100000L)).map(_.toSet))

  test("hashSplit: a row's split never changes when the corpus grows or shrinks") {
    for (_ <- 1 to 5) {
      val ids = sample(genIds)
      val (subsetIds, _) = ids.splitAt(ids.size / 2)
      def splits(s: Set[Long]): Map[Long, String] =
        Curation.hashSplit(s.toSeq.map(i => (i, s"doc $i")).toDF("id", "text"), "id")
          .select("id", "split").as[(Long, String)].collect().toMap
      val full = splits(ids)
      val sub = splits(subsetIds)
      assert(sub.forall { case (id, sp) => full(id) == sp },
        "subset rows must keep their full-corpus split")
      assert(full.values.toSet.subsetOf(Set("train", "val", "test")))
    }
  }

  test("mixSources: membership is stable under growth; rates 0 and 1000 are exact") {
    for (_ <- 1 to 5) {
      val ids = sample(genIds)
      def mk(s: Set[Long]) =
        s.toSeq.map(i => (i, s"doc $i", if (i % 2 == 0) "a" else "b")).toDF("id", "text", "source")
      val rates = Map("a" -> 400, "b" -> 700)
      def kept(s: Set[Long]): Set[Long] =
        Curation.mixSources(mk(s), "id", "source", rates).select("id").as[Long].collect().toSet
      val full = kept(ids)
      val (subsetIds, _) = ids.splitAt(ids.size / 2)
      assert(kept(subsetIds) == (full intersect subsetIds),
        "membership must be a pure function of (id, rate)")
      assert(Curation.mixSources(mk(ids), "id", "source", Map("a" -> 0, "b" -> 0)).count() == 0)
      assert(Curation.mixSources(mk(ids), "id", "source", Map.empty).count() == ids.size)
    }
  }

  test("hashSplit weights partition every row exactly once") {
    val ids = sample(genIds)
    val df = ids.toSeq.map(i => (i, s"d$i")).toDF("id", "text")
    val out = Curation.hashSplit(df, "id", Seq("x" -> 25, "y" -> 25, "z" -> 50))
    assert(out.count() == ids.size)
    assert(out.filter($"split".isNull).count() == 0)
  }
}
