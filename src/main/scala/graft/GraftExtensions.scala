package graft

import graft.functions.VecDot
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Divide, Expression, ExpressionInfo, Multiply, Sqrt}

/** Catalyst extension point for the engine's custom expressions —
  * activate with `spark.sql.extensions=graft.GraftExtensions` (done by
  * GraftSession.builder), which makes them usable from SQL text, not
  * just the Column API:
  *
  *   SELECT vec_cosine(a.embedding, b.embedding) FROM ...
  *
  * Registered functions (all fully codegen'd — `vec_norm`/`vec_cosine`
  * compose built-in Sqrt/Divide around the custom [[graft.functions.VecDot]]):
  *  - `vec_dot(array<float|double>, array<float|double>) -> double`
  *  - `vec_norm(vec) -> double` — L2 norm
  *  - `vec_cosine(a, b) -> double` — cosine similarity
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  private def normExpr(v: Expression): Expression = Sqrt(VecDot(v, v))

  override def apply(ext: SparkSessionExtensions): Unit = {
    // keyless BETWEEN time joins -> bucketed equi-joins (never BNLJ)
    ext.injectOptimizerRule(_ => graft.plans.RangeJoinRewrite)
    ext.injectFunction((
      new FunctionIdentifier("vec_dot"),
      new ExpressionInfo(classOf[VecDot].getName, "vec_dot"),
      (children: Seq[Expression]) => VecDot(children.head, children(1))
    ))
    ext.injectFunction((
      new FunctionIdentifier("vec_norm"),
      new ExpressionInfo(classOf[VecDot].getName, "vec_norm"),
      (children: Seq[Expression]) => normExpr(children.head)
    ))
    ext.injectFunction((
      new FunctionIdentifier("vec_cosine"),
      new ExpressionInfo(classOf[VecDot].getName, "vec_cosine"),
      (children: Seq[Expression]) =>
        Divide(VecDot(children.head, children(1)),
          Multiply(normExpr(children.head), normExpr(children(1))))
    ))
  }
}
