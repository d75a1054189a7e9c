package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** One ANN candidate entering MMR selection: its id, retrieval
  * relevance, and embedding (needed for candidate-candidate
  * similarity). */
final case class MmrCand(id: Long, rel: Double, vec: Seq[Double])

/** One selected result: rank (1-based) and the MMR objective value at
  * selection time. */
final case class MmrSel(id: Long, rk: Int, mmr: Double)

/** Maximal Marginal Relevance re-ranking (Carbonell & Goldstein 1998,
  * public algorithm): greedily pick the candidate maximizing
  * λ·rel(q,c) − (1−λ)·max_{s∈selected} cos(c,s) — the standard
  * diversification step after ANN retrieval (near-duplicate hits
  * crowd out coverage at λ=1; λ≈0.5-0.8 trades relevance against
  * novelty).
  *
  * Runs as a typed Aggregator over the per-query candidate group: the
  * greedy loop is inherently sequential, but the group is the FETCHED
  * candidate list (fetchK rows, not the corpus), so buffer memory is
  * fetchK·dim doubles and finish is O(fetchK²·selectK) — executor-
  * local, bounded, one group per query. The candidate multiset is
  * canonicalized (sorted by (-rel, id)) before selection, so the
  * result is independent of row order, partitioning, and merge order.
  * Ties on the MMR objective break to the smaller id — with cosine
  * folds evaluated in array order the whole selection replays
  * engine-independently (the q116 DuckDB oracle unrolls the same
  * greedy steps).
  */
class MmrAggregator(selectK: Int, lambda: Double)
    extends Aggregator[MmrCand, Seq[MmrCand], Seq[MmrSel]] {
  require(selectK >= 1, "selectK must be at least 1")
  require(lambda >= 0.0 && lambda <= 1.0, "lambda must be in [0,1]")

  override def zero: Seq[MmrCand] = Vector.empty
  override def reduce(buf: Seq[MmrCand], c: MmrCand): Seq[MmrCand] = buf :+ c
  override def merge(a: Seq[MmrCand], b: Seq[MmrCand]): Seq[MmrCand] = a ++ b

  private def cos(a: Seq[Double], b: Seq[Double]): Double = {
    var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
    while (i < a.length) { dot += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1 }
    dot / (math.sqrt(na) * math.sqrt(nb))
  }

  // The OBJECTIVE is evaluated in exact decimal arithmetic (the q91/
  // q105 round→DECIMAL contract): rel arrives on a 6-dp grid, so
  // λ·rel lands EXACTLY on a .5 boundary at 6 dp for ~1 in 10 values —
  // double rounding of that product is where engines disagree
  // (shortest-repr HALF_UP vs binary-expansion rounding). λ·rel −
  // (1−λ)·round(cos, 8) as decimals is exact, argmax compares exact
  // values, and the emitted double is the same nearest-double in
  // every engine — no final rounding exists to disagree about.
  private val lam = BigDecimal(java.math.BigDecimal.valueOf(lambda))
  private val oneMinusLam = BigDecimal(1) - lam
  private def bd(x: Double): BigDecimal = BigDecimal(java.math.BigDecimal.valueOf(x))

  override def finish(buf: Seq[MmrCand]): Seq[MmrSel] = {
    val cands = buf.sortBy(c => (-c.rel, c.id)).toVector
    val selected = scala.collection.mutable.ArrayBuffer.empty[(MmrCand, BigDecimal)]
    val remaining = scala.collection.mutable.ArrayBuffer(cands: _*)
    while (selected.size < selectK && remaining.nonEmpty) {
      var best: MmrCand = null
      var bestMmr: BigDecimal = null
      remaining.foreach { c =>
        val mmr =
          if (selected.isEmpty) lam * bd(c.rel)
          else {
            val maxSim = selected.map(s => cos(c.vec, s._1.vec)).max
            lam * bd(c.rel) - oneMinusLam * bd(maxSim).setScale(8, BigDecimal.RoundingMode.HALF_UP)
          }
        if (best == null || mmr > bestMmr || (mmr == bestMmr && c.id < best.id)) {
          best = c; bestMmr = mmr
        }
      }
      selected += ((best, bestMmr))
      remaining -= best
    }
    selected.zipWithIndex.map { case ((c, m), i) => MmrSel(c.id, i + 1, m.toDouble) }.toVector
  }

  override def bufferEncoder: Encoder[Seq[MmrCand]] = ExpressionEncoder()
  override def outputEncoder: Encoder[Seq[MmrSel]] = ExpressionEncoder()
}
