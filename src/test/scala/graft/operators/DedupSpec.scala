package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class DedupSpec extends SparkSpec {
  import spark.implicits._

  private def docs = Seq(
    (1L, "the quick brown fox jumps over the lazy dog"),
    (2L, "The quick brown fox jumps over the lazy dog  ".trim.toUpperCase), // case variant
    (3L, "the quick brown fox jumps over the lazy dog"), // exact copy of 1
    (4L, "a completely different document about spark engines"),
    (5L, "hi") // too short for 3-shingles
  ).toDF("doc_id", "text")

  test("exact dedup keeps min id per normalized text and counts copies") {
    val out = Dedup.exact(docs, "doc_id", "text").collect()
    val m = out.map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(m(1L) == 3L) // docs 1,2,3 normalize to the same text
    assert(m(4L) == 1L)
    assert(m(5L) == 1L)
    assert(out.length == 3)
  }

  test("minhash signatures: identical docs identical, short docs dropped") {
    val sigs = Dedup.minhashSignatures(docs, "doc_id", "text", numHashes = 8)
    val rows = sigs.collect().map(r => r.getLong(0) -> r.toSeq.tail).toMap
    assert(!rows.contains(5L)) // < 3 tokens
    assert(rows(1L) == rows(3L))
    assert(rows(1L) != rows(4L))
    assert(rows(1L).size == 8)
  }

  test("lsh candidate pairs surface the exact duplicate pair") {
    val pairs = Dedup.lshCandidatePairs(docs, "doc_id", "text", numHashes = 8, bands = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((1L, 3L)))
    assert(!pairs.exists { case (a, b) => a == 4L || b == 4L })
  }

  test("lsh hot-bucket cap drops oversized buckets, keeps normal pairs") {
    // 6 identical docs form a size-6 bucket in every band; cap=4 drops them
    val many = (docs.collect().map(r => (r.getLong(0), r.getString(1))).toSeq ++
      (10L to 15L).map(i => (i, "same same same boilerplate text here")))
      .toDF("doc_id", "text")
    val capped = Dedup.lshCandidatePairs(many, "doc_id", "text", maxBucketSize = Some(4))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(capped.contains((1L, 3L))) // normal dup pair survives
    assert(!capped.exists { case (a, b) => a >= 10L || b >= 10L }) // hot cluster dropped
    val uncapped = Dedup.lshCandidatePairs(many, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(uncapped.contains((10L, 15L))) // without the cap it floods back
    assert(capped.subsetOf(uncapped)) // the cap only ever removes pairs
    assert(capped != uncapped) // ...and here it actually does
    // the cap is never silent: drop accounting rides the pair job
    // (6 identical docs collide in all 4 bands → 4 buckets of 6 members,
    // 15 candidate pairs each)
    val obs = new org.apache.spark.sql.Observation()
    Dedup.lshCandidatePairs(many, "doc_id", "text", maxBucketSize = Some(4),
      dropMetrics = Some(obs)).count()
    assert(obs.get("dropped_buckets") == 4L)
    assert(obs.get("dropped_members") == 24L)
    assert(obs.get("dropped_candidate_pairs") == 60L) // 4 bands × 15
    // the exact audit names each dropped bucket with its pair cost
    val audit = Dedup.lshDroppedBuckets(many, "doc_id", "text", maxBucketSize = 4)
      .select("band_idx", "members", "candidate_pairs").collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2))).toSeq
    assert(audit == (0 to 3).map(b => (b, 6L, 15L)))
    assert(Dedup.lshDroppedBuckets(many, "doc_id", "text", maxBucketSize = 6).isEmpty)
  }

  test("incremental dedup drops indexed signatures, keeps min-id per fresh signature") {
    val corpus = Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "a completely different document about spark engines")
    ).toDF("doc_id", "text")
    val index = Dedup.minhashSignatures(corpus, "doc_id", "text").drop("doc_id")
    val batch = Seq(
      (10L, "the quick brown fox jumps over the lazy dog"), // already indexed -> dropped
      (11L, "an entirely new document no one has seen"),    // fresh
      (12L, "an entirely new document no one has seen"),    // batch dup of 11
      (13L, "hi") // < 3 tokens: no signature, not emitted
    ).toDF("doc_id", "text")
    val out = Dedup.incrementalBySignature(batch, "doc_id", "text", index)
      .collect().map(r => (r.getLong(0), r.getLong(2)))
    assert(out.toSeq == Seq((11L, 2L)))
  }

  test("simhash: identical docs collide, near docs are close in hamming") {
    val out = Dedup.simhash16(docs, "doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out(1L) == out(3L))
    assert(out(1L) != out(4L))
    assert((0 to 4).forall(i => out.values.forall(v => v >= 0 && v < (1 << 16))))
  }

  test("jaccard is 1 for identical docs and 0 for disjoint docs") {
    val pairs = Seq((1L, 3L), (1L, 4L)).toDF("a", "b")
    val out = Dedup.jaccard(docs, "doc_id", "text", pairs).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(out((1L, 3L)) == 1.0)
    assert(out((1L, 4L)) == 0.0)
  }

  test("fingerprint is order-sensitive") {
    val d = Seq((1L, "alpha beta gamma"), (2L, "gamma beta alpha"), (3L, "alpha beta gamma"))
      .toDF("doc_id", "text")
    val fp = Dedup.fingerprint(d, "doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(fp(1L) == fp(3L))
    assert(fp(1L) != fp(2L))
  }

  test("repeatedPassages finds cross-doc spans at their per-doc positions, merged maximally") {
    val d = Seq(
      (1L, "a b c d e f x y z"),       // shared phrase a..f at tokens [0,6)
      (2L, "q r a b c d e f s"),       // same phrase at tokens [2,8)
      (3L, "totally unrelated words only here now")
    ).toDF("doc_id", "text")
    val out = Dedup.repeatedPassages(d, "doc_id", "text", k = 5, minDocs = 2)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getLong(3))).toSeq
    // two 5-token windows per doc (pos p, p+1) merge into one 6-token span
    assert(out == Seq((1L, 0, 6, 2L), (2L, 2, 8, 2L)))
    // below the doc threshold nothing is emitted
    assert(Dedup.repeatedPassages(d, "doc_id", "text", k = 5, minDocs = 3).isEmpty)
  }

  test("repeatedPassages maxDocsPerShingle drops boilerplate shingles, drops observable") {
    // the phrase a..f appears in 4 docs (boilerplate), u..z in 2 only
    val d = Seq(
      (1L, "a b c d e f x"), (2L, "a b c d e f y"),
      (3L, "a b c d e f z"), (4L, "a b c d e f w"),
      (5L, "u v w2 x2 y2 z2 one"), (6L, "u v w2 x2 y2 z2 two")
    ).toDF("doc_id", "text")
    val uncapped = Dedup.repeatedPassages(d, "doc_id", "text", k = 5, minDocs = 2)
    assert(uncapped.select("doc_id").distinct().count() == 6)
    val obs = org.apache.spark.sql.Observation()
    val capped = Dedup.repeatedPassages(d, "doc_id", "text", k = 5, minDocs = 2,
      maxDocsPerShingle = Some(3), dropMetrics = Some(obs))
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2))).toSeq
    // only the 2-doc phrase survives the cap; spans unchanged for it
    assert(capped == Seq((5L, 0, 6), (6L, 0, 6)))
    val m = obs.getAsJava
    // 'a b c d e f' yields two k=5 shingles ([a..e], [b..f]), each in 4 docs
    assert(m.get("dropped_shingles").asInstanceOf[Long] == 2L, s"got $m")
    assert(m.get("dropped_doc_occurrences").asInstanceOf[Long] == 8L, s"got $m")
  }

  test("sortedNeighborPairs: bounded candidates, exact dups adjacent at hamming 0, partition-invariant") {
    val docs = graft.queries.Corpus.fixture(spark, "/root/testdata/sf0.001", "documents")
    val pairs = Dedup.sortedNeighborPairs(docs, "doc_id", "text", window = 3, blockBits = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    val n = docs.count()
    // candidate count is bounded by |docs| * window, whatever the data:
    // the blocking family's defining property (no hot-bucket blowup)
    assert(pairs.size <= n * 3)
    assert(pairs.nonEmpty)
    // exact duplicates share a simhash, land in the same block ADJACENT
    // in the (simhash, id) order -> always paired, at hamming 0
    val dups = Dedup.exact(docs, "doc_id", "text").filter($"n_copies" >= 2)
    if (dups.count() > 0) {
      val zeroHam = pairs.filter(_._3 == 0).flatMap(p => Seq(p._1, p._2))
      val keeper = dups.select($"keeper_id").as[Long].head()
      assert(zeroHam.contains(keeper), s"exact-dup keeper $keeper missing from hamming-0 pairs")
    }
    // the (simhash, id) neighborhood order is data-determined, so the
    // result is invariant to input partitioning
    val re = Dedup.sortedNeighborPairs(docs.repartition(7), "doc_id", "text",
      window = 3, blockBits = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(re == pairs)
    // maxHamming filters in the same pass
    val close = Dedup.sortedNeighborPairs(docs, "doc_id", "text", window = 3,
      blockBits = 4, maxHamming = Some(2))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(close == pairs.filter(_._3 <= 2))
  }

  test("redactPassages removes exactly the span tokens; span-free docs pass through") {
    val d = Seq(
      (1L, "a b c d e f x y z"),
      (2L, "q r a b c d e f s"),
      (3L, "totally unrelated words only here now")
    ).toDF("doc_id", "text")
    val spans = Dedup.repeatedPassages(d, "doc_id", "text", k = 5, minDocs = 2)
    val out = Dedup.redactPassages(d, "doc_id", "text", spans)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getInt(2), r.getInt(3))).toSeq
    assert(out == Seq(
      (1L, "x y z", 3, 6),
      (2L, "q r s", 3, 6),
      (3L, "totally unrelated words only here now", 6, 0)))
  }

  test("editDistancePairs: blocked pairs only, exact distances, minSim threshold") {
    val docs = Seq(
      (1L, "the quick brown fox jumps", "en", 25L),
      (2L, "the quick brown fox jumped", "en", 26L),   // 2 edits from doc 1
      (3L, "completely different words here", "en", 31L),
      (4L, "the quick brown fox jumps", "de", 25L),    // other lang: never paired
      (5L, "tiny", "en", 4L)                           // other length block
    ).toDF("doc_id", "text", "lang", "n_chars")
    val all = Dedup.editDistancePairs(docs, "doc_id", "text", "lang", "n_chars",
      lenBucket = 10, minSim = 0.0)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getInt(2))).toMap
    // blocks: en/[20,30) = {1,2}, en/[30,40) = {3}, de = {4}, en/[0,10) = {5}
    assert(all.keySet == Set((1L, 2L)))
    assert(all((1L, 2L)) == 2) // jumps -> jumped: substitute s->e, append d
    // threshold: sim of the pair is 1 - 2/26 ≈ 0.923 — a 0.95 floor cuts it
    assert(Dedup.editDistancePairs(docs, "doc_id", "text", "lang", "n_chars",
      lenBucket = 10, minSim = 0.95).count() == 0)
  }

  test("editDistancePairs maxBlockSize drops hot blocks whole; small blocks untouched") {
    // en/[20,30) block has 4 members (6 pairs); en/[30,40) has 2
    val docs = Seq(
      (1L, "the quick brown fox jumps", "en", 25L),
      (2L, "the quick brown fox jumped", "en", 26L),
      (3L, "the quick brown fox jumpes", "en", 26L),
      (4L, "the quick brown fox iumps!", "en", 26L),
      (5L, "completely different words here", "en", 31L),
      (6L, "completely different words herd", "en", 31L)
    ).toDF("doc_id", "text", "lang", "n_chars")
    def pairs(cap: Option[Int]) =
      Dedup.editDistancePairs(docs, "doc_id", "text", "lang", "n_chars",
        lenBucket = 10, minSim = 0.0, maxBlockSize = cap)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs(None).size == 7) // 6 + 1
    // cap 3: the 4-member hot block is dropped WHOLE, the pair from the
    // small block survives — pair count collapses from quadratic to the
    // candidate tail, the exact trade the LSH hot-bucket cap makes
    assert(pairs(Some(3)) == Set((5L, 6L)))
    // cap at the block size: nothing dropped
    assert(pairs(Some(4)).size == 7)
    // the cap is never silent: the drop metrics ride the job itself
    val obs = new org.apache.spark.sql.Observation()
    Dedup.editDistancePairs(docs, "doc_id", "text", "lang", "n_chars",
      lenBucket = 10, minSim = 0.0, maxBlockSize = Some(3), dropMetrics = Some(obs)).count()
    assert(obs.get("dropped_blocks") == 1L)
    assert(obs.get("dropped_members") == 4L)
    assert(obs.get("dropped_candidate_pairs") == 6L) // 4·3/2
    // nothing over the cap: AQE eliminates the empty anti-join build
    // side (CollectMetrics included) — the documented contract is
    // getOrEmpty, where absent means exactly zero dropped
    val obs0 = new org.apache.spark.sql.Observation()
    Dedup.editDistancePairs(docs, "doc_id", "text", "lang", "n_chars",
      lenBucket = 10, minSim = 0.0, maxBlockSize = Some(4), dropMetrics = Some(obs0)).count()
    assert(obs0.getAsJava.getOrDefault("dropped_blocks", 0L) == 0L)
    assert(obs0.getAsJava.getOrDefault("dropped_candidate_pairs", 0L) == 0L)
    // the exact per-block audit names the dropped block and its cost
    val audit = Dedup.editDistanceDroppedBlocks(docs, "doc_id", "lang", "n_chars",
      lenBucket = 10, maxBlockSize = 3).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    assert(audit == Seq(("en", 2L, 4L, 6L)))
    assert(Dedup.editDistanceDroppedBlocks(docs, "doc_id", "lang", "n_chars",
      lenBucket = 10, maxBlockSize = 4).isEmpty)
  }

  test("editDistanceVerify: pair-driven form agrees with the blocked form on its own candidates") {
    val docs = Seq(
      (1L, "the quick brown fox jumps", "en", 25L),
      (2L, "the quick brown fox jumped", "en", 26L),
      (3L, "the quick brown fox jumpes", "en", 26L),
      (4L, "completely different words here", "en", 31L),
      (5L, "completely different words herd", "en", 31L)
    ).toDF("doc_id", "text", "lang", "n_chars")
    val blocked = Dedup.editDistancePairs(docs, "doc_id", "text", "lang", "n_chars",
      lenBucket = 10, minSim = 0.0)
    // feeding the blocked form's (a,b) candidates back through the
    // pair-driven verifier reproduces its rows exactly — same
    // dist/max_len/sim contract, so the two forms compose freely
    val verified = Dedup.editDistanceVerify(docs, "doc_id", "text",
      blocked.select(col("a"), col("b")), minSim = 0.0)
    assert(verified.collect().toSeq == blocked.collect().toSeq)
    // cost is |pairs|: an explicit candidate list is honored verbatim
    val one = Dedup.editDistanceVerify(docs, "doc_id", "text",
      Seq((1L, 4L)).toDF("a", "b"))
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getInt(2))).toMap
    assert(one.keySet == Set((1L, 4L)))
    // minSim filter applies on the verified similarity
    assert(Dedup.editDistanceVerify(docs, "doc_id", "text",
      Seq((1L, 4L)).toDF("a", "b"), minSim = 0.9).count() == 0)
  }
}
