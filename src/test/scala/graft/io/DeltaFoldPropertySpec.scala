package graft.io

import graft.SparkSpec
import org.scalacheck.Gen

/** Property tests for MINOR COMPACTION's fold algebra (SURVEY X95):
  * for ARBITRARY delta-op sequences, folding the chain must be
  * content-identical to the unfolded chain — which itself must match a
  * driver-side reference model of the same ops. The keyed fold's state
  * invariant ((base ⟕̸ K) ⊎ R) and the patch fold's multiset identity
  * (D' = D ⊎ (d ∖ A), A' = (A ∖ d) ⊎ a) are proved in the scaladoc;
  * these properties pin the IMPLEMENTATION against the proofs for op
  * mixes no hand-written example covers — including folds of folds. */
class DeltaFoldPropertySpec extends SparkSpec {
  import spark.implicits._

  private def sample[T](g: Gen[T]): T =
    Iterator.continually(g.sample).flatten.next()

  private def newTables() = {
    val root = java.nio.file.Files.createTempDirectory("graft-foldprop").toString
    new SnapshotTables(spark, root, previousVersionsMax = 100)
  }

  // keyed ops over a small key domain so collisions/overwrites happen
  private sealed trait Op
  private case class Append(rows: Seq[(Int, String)]) extends Op
  private case class Upsert(rows: Seq[(Int, String)]) extends Op
  private case class DeleteKeys(keys: Seq[Int]) extends Op

  private val genKey = Gen.chooseNum(0, 15)
  private def genRows(tag: String): Gen[Seq[(Int, String)]] =
    Gen.chooseNum(0, 4).flatMap(n => Gen.listOfN(n, genKey))
      .map(_.distinct.map(k => (k, s"$tag$k-${scala.util.Random.nextInt(1000)}")))

  test("keyed folds (append/upsert/delete mixes, folds of folds) equal the reference model") {
    var seed = 0
    for (round <- 1 to 6) {
      val t = newTables()
      // reference state: multiset as Vector (appends may duplicate keys;
      // an upsert/delete removes EVERY row with a touched key)
      var ref = (0 to 8).map(k => (k, s"base$k")).toVector
      t.overwriteTable(ref.toDF("id", "v"), "tab")
      val nOps = sample(Gen.chooseNum(3, 6))
      val ops: Seq[Op] = (1 to nOps).map { i =>
        seed += 1
        sample(Gen.oneOf(
          genRows(s"a$round-$i-").map(Append),
          genRows(s"u$round-$i-").map(Upsert),
          Gen.chooseNum(0, 3).flatMap(n => Gen.listOfN(n, genKey)).map(ks => DeleteKeys(ks.distinct))))
      }
      var foldedOnce = false
      ops.zipWithIndex.foreach { case (op, i) =>
        op match {
          case Append(rows) =>
            t.append(rows.toDF("id", "v"), "tab")
            ref = ref ++ rows
          case Upsert(rows) if rows.nonEmpty =>
            t.upsertMor("tab", rows.toDF("id", "v"), Seq("id"))
            val ks = rows.map(_._1).toSet
            ref = ref.filterNot(r => ks(r._1)) ++ rows
          case Upsert(_) => () // empty upsert frame: skip (requires rows)
          case DeleteKeys(ks) if ks.nonEmpty =>
            t.deleteKeysMor("tab", ks.toDF("id"))
            val s = ks.toSet
            ref = ref.filterNot(r => s(r._1))
          case DeleteKeys(_) => ()
        }
        // fold mid-sequence roughly half the time → later folds re-fold
        // the revise segment (the fold-of-fold path)
        if (i % 2 == 1 && t.chainKinds("tab", t.currentVersion("tab")).length > 2) {
          val before = t.read("tab").as[(Int, String)].collect().sorted.toSeq
          assert(t.compactDeltas("tab"))
          foldedOnce = true
          val after = t.read("tab").as[(Int, String)].collect().sorted.toSeq
          assert(after == before, s"fold changed content (round $round op $i)")
        }
      }
      if (t.chainKinds("tab", t.currentVersion("tab")).length > 2) {
        assert(t.compactDeltas("tab")); foldedOnce = true
      }
      val got = t.read("tab").as[(Int, String)].collect().sorted.toSeq
      assert(got == ref.sorted, s"round $round: folded chain diverged from reference model")
      val _ = foldedOnce
    }
  }

  test("CDC over arbitrary chains: every (from, to) diff equals the generic two-resolution truth") {
    import org.apache.spark.sql.functions.lit
    for (round <- 1 to 3) {
      val t = newTables()
      t.overwriteTable((0 to 8).map(k => (k, s"base$k")).toDF("id", "v"), "tab")
      val nOps = sample(Gen.chooseNum(4, 6))
      var freshKey = 100 // appends use FRESH keys: diffKeyed's unique-key
      // contract (an append over an existing key corrupts keyed diffs,
      // by documented design) must hold for the accounting check below
      def freshRows(tag: String): Seq[(Int, String)] = {
        val n = sample(Gen.chooseNum(0, 3))
        (1 to n).map { _ => freshKey += 1; (freshKey, s"$tag$freshKey") }
      }
      (1 to nOps).foreach { i =>
        sample(Gen.chooseNum(0, 3)) match {
          case 0 => t.append(freshRows(s"a$i-").toDF("id", "v"), "tab")
          case 1 =>
            val rows = sample(genRows(s"u$i-"))
            if (rows.nonEmpty) t.upsertMor("tab", rows.toDF("id", "v"), Seq("id"))
            else t.append(rows.toDF("id", "v"), "tab")
          case 2 =>
            val ks = sample(Gen.listOfN(2, genKey)).distinct
            t.deleteKeysMor("tab", ks.toDF("id"))
          case 3 =>
            // fold mid-line when possible, else another append
            if (t.chainKinds("tab", t.currentVersion("tab")).length > 2) t.compactDeltas("tab")
            else t.append(freshRows(s"f$i-").toDF("id", "v"), "tab")
        }
      }
      val cur = t.currentVersion("tab")
      // EVERY version pair: the engine's diff (fast paths, fold skips,
      // range unions) must equal the generic exceptAll truth
      for (from <- 1 until cur; to <- (from + 1) to cur) {
        val fast = t.diff("tab", from, to).collect().map(_.toString).toSet
        val f0 = t.readVersion("tab", from); val t0 = t.readVersion("tab", to)
        val generic = t0.exceptAll(f0).withColumn("__change", lit("insert"))
          .unionByName(f0.exceptAll(t0).withColumn("__change", lit("delete")))
          .collect().map(_.toString).toSet
        assert(fast == generic, s"round $round diff($from,$to) diverged")
        // keyed classification agrees with the multiset delta accounting
        val keyed = t.diffKeyed("tab", from, to, Seq("id"))
        val kIns = keyed.filter("__change = 'insert'").count()
        val kDel = keyed.filter("__change = 'delete'").count()
        assert(t0.count() - f0.count() == kIns - kDel,
          s"round $round keyed delta accounting broke at ($from,$to)")
      }
    }
  }

  test("patch folds (updateMor/deleteWhereMor sequences, duplicates included) equal the reference model") {
    for (round <- 1 to 5) {
      val t = newTables()
      // duplicated base rows make the multiset algebra earn its keep
      var ref = ((0 to 8) ++ (0 to 4)).map(k => (k, s"b$k")).toVector
      t.overwriteTable(ref.toDF("id", "v"), "tab")
      val nOps = sample(Gen.chooseNum(2, 5))
      (1 to nOps).foreach { i =>
        val lo = sample(genKey); val hi = math.min(15, lo + sample(Gen.chooseNum(0, 4)))
        if (sample(Gen.prob(0.5))) {
          t.updateMor("tab", Seq("v" -> org.apache.spark.sql.functions.concat(
            $"v", org.apache.spark.sql.functions.lit(s"!$i"))),
            $"id".between(lo, hi))
          ref = ref.map { case (k, v) => if (k >= lo && k <= hi) (k, s"$v!$i") else (k, v) }
        } else {
          t.deleteWhereMor("tab", $"id".between(lo, hi))
          ref = ref.filterNot { case (k, _) => k >= lo && k <= hi }
        }
        if (i % 2 == 0 && t.chainKinds("tab", t.currentVersion("tab")).length > 2)
          assert(t.compactDeltas("tab"))
      }
      if (t.chainKinds("tab", t.currentVersion("tab")).length > 2)
        assert(t.compactDeltas("tab"))
      assert(t.read("tab").as[(Int, String)].collect().sorted.toSeq == ref.sorted,
        s"round $round: folded patch chain diverged from reference model")
      // multiset multiplicity preserved exactly (not just sets)
      assert(t.read("tab").count() == ref.length)
    }
  }
}
