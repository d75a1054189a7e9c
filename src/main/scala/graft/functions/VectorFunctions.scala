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
}
