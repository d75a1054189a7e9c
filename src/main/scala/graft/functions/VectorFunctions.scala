package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Vector math over `array<float>` embedding columns, built from
  * codegen'd higher-order functions (zip_with/aggregate) — no UDF, no
  * MLlib Vector boxing.
  *
  * Determinism contract: every element is cast to double BEFORE any
  * arithmetic and folds run left-to-right, so the same inputs produce
  * bit-identical doubles in any engine with IEEE semantics (the DuckDB
  * oracles use list_reduce with the same shape).
  */
object VectorFunctions {

  /** Left-fold sum of an array<double> expression. */
  private def fsum(arr: Column): Column =
    aggregate(arr, lit(0.0), (acc, v) => acc + v)

  /** Dot product — codegen'd primitive loop (see [[VecDot]]); same
    * left-fold double arithmetic as the HOF form, ~5-10× faster on
    * wide scans. */
  def dot(a: Column, b: Column): Column = VecDot(a, b)

  def normSq(a: Column): Column = VecDot(a, a)

  def norm(a: Column): Column = sqrt(normSq(a))

  def cosine(a: Column, b: Column): Column =
    dot(a, b) / (norm(a) * norm(b))

  def euclideanSq(a: Column, b: Column): Column =
    fsum(zip_with(a, b, (x, y) => {
      val d = x.cast("double") - y.cast("double")
      d * d
    }))

  /** Per-vector int8 scalar-quantization scale: max |x| / 127 (null for
    * an all-zero vector — quantize yields zeros). */
  def quantScale(a: Column): Column = {
    val mx = array_max(transform(a, x => abs(x.cast("double"))))
    when(mx > 0, mx / 127.0)
  }

  /** Scalar int8 quantization of an embedding: round-half-up of
    * x / scale into [-127, 127] (floor(x/scale + 0.5) — identical in
    * any IEEE engine, unlike banker's rounding). 4× smaller at rest
    * than float32 — the storage format a 100 TB embedding store
    * actually keeps, with the scale column alongside. */
  def quantizeInt8(a: Column): Column = {
    val s = quantScale(a)
    transform(a, x => coalesce(floor(x.cast("double") / s + 0.5), lit(0.0)).cast("int"))
  }

  /** Max absolute reconstruction error of [[quantizeInt8]] — the bound
    * an offline quality gate checks before swapping the store over. */
  def quantError(a: Column): Column = {
    val s = quantScale(a)
    val deq = zip_with(quantizeInt8(a), a, (q, x) =>
      abs(q.cast("double") * coalesce(s, lit(0.0)) - x.cast("double")))
    array_max(deq)
  }
}
