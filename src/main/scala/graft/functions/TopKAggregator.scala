package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** One (ordering value, id, payload) candidate for grouped top-k. */
final case class TopKIn(ord: Double, id: Long)

/** Grouped top-k as a typed `Aggregator[IN, BUF, OUT]` — the engine's
  * custom-UDAF exemplar (SURVEY §2.h).
  *
  * Semantics: the k largest inputs per group by (ord DESC, id ASC) —
  * identical to `row_number() OVER (ORDER BY ord DESC, id) <= k`.
  *
  * Why not the window form at scale: a window sorts EVERY row of every
  * group after a full shuffle of the fact table. This aggregator keeps
  * O(k) state per key and participates in partial aggregation, so each
  * mapper ships at most k rows per local key — on a 100 TB fact table
  * with small k, shuffle volume drops from |rows| to ~|keys|·k per
  * mapper. Buffers trim lazily at 4k to amortize sorting.
  */
class TopKAggregator(k: Int) extends Aggregator[TopKIn, Seq[TopKIn], Seq[TopKIn]] {
  require(k > 0)

  private def best(s: Seq[TopKIn], n: Int): Seq[TopKIn] =
    s.sortBy(t => (-t.ord, t.id)).take(n)

  override def zero: Seq[TopKIn] = Vector.empty

  override def reduce(buf: Seq[TopKIn], in: TopKIn): Seq[TopKIn] = {
    val b = buf :+ in
    if (b.size > 4 * k) best(b, k) else b
  }

  override def merge(a: Seq[TopKIn], b: Seq[TopKIn]): Seq[TopKIn] = best(a ++ b, k)

  override def finish(buf: Seq[TopKIn]): Seq[TopKIn] = best(buf, k)

  override def bufferEncoder: Encoder[Seq[TopKIn]] = ExpressionEncoder()
  override def outputEncoder: Encoder[Seq[TopKIn]] = ExpressionEncoder()
}
