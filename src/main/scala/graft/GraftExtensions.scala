package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.ExpressionInfo

/** `spark.sql.extensions` entry point: loading this class registers
  * every graft custom SQL function into the session's built-in
  * function registry at session build time — a user adds
  *
  * {{{
  *   spark.sql.extensions=graft.GraftExtensions
  * }}}
  *
  * to their config (or `builder.withExtensions(new GraftExtensions)`)
  * and the whole kernel surface (`normalize_text`, `minhash_sig`,
  * `cosine_f32`, …) is callable from SQL text with no further code —
  * the standard Spark-extension-library packaging
  * (SparkSessionExtensions is the public hook; no Catalyst internals).
  * Shares the single builder list with
  * [[graft.functions.GraftFunctions.registerAll]] (the per-session
  * temp-function path), so the two registration routes cannot drift.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    graft.functions.GraftFunctions.builders.foreach { case (name, builder) =>
      ext.injectFunction((
        FunctionIdentifier(name),
        new ExpressionInfo(classOf[GraftExtensions].getName, name),
        builder))
    }
}
