package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.ExpressionInfo

/**
 * Session-extension entry point: registers every graft SQL function
 * (sketches + vector math) into a session at BUILD time, so pure-SQL users
 * get them without touching the Scala API:
 *
 * {{{
 *   spark-submit --conf spark.sql.extensions=graft.GraftExtensions …
 *   // or
 *   SparkSession.builder().withExtensions(new GraftExtensions()(_))
 * }}}
 *
 * This is the (c)-tier of the extension ladder (SURVEY §7): the same
 * builders back `SketchExpressions.register`, which installs them as temp
 * functions on an already-built session.
 */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(extensions: SparkSessionExtensions): Unit =
    graft.expressions.SketchExpressions.sqlFunctions.foreach {
      case (name, builder) =>
        extensions.injectFunction((
          new FunctionIdentifier(name),
          new ExpressionInfo("graft.expressions.SketchExpressions", name),
          builder))
    }
}
