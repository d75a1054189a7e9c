package graft

import graft.functions.VecDot
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** Catalyst extension point for the engine's custom expressions —
  * activate with `spark.sql.extensions=graft.GraftExtensions` (done by
  * GraftSession.builder), which makes them usable from SQL text, not
  * just the Column API:
  *
  *   SELECT vec_dot(a.embedding, b.embedding) FROM ...
  *
  * Registered functions:
  *  - `vec_dot(array<float|double>, array<float|double>) -> double` —
  *    codegen'd dot product ([[graft.functions.VecDot]]).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      new FunctionIdentifier("vec_dot"),
      new ExpressionInfo(classOf[VecDot].getName, "vec_dot"),
      (children: Seq[Expression]) => VecDot(children.head, children(1))
    ))
  }
}
