package graft.functions

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.ExpressionInfo

/** SQL registration for the engine's native expressions, two ways:
  *
  *  - [[GraftFunctions.register]] — into an existing session's function
  *    registry (the serving path: `Engine.sql` users get the functions).
  *  - [[GraftExtensions]] — a `SparkSessionExtensions` installer for
  *    cluster-wide wiring via `spark.sql.extensions=graft.functions.GraftExtensions`.
  */
object GraftFunctions {

  private val functions: Seq[(String, Seq[org.apache.spark.sql.catalyst.expressions.Expression] =>
      org.apache.spark.sql.catalyst.expressions.Expression)] = Seq(
    "sorted_intersect_size" -> (exprs => SortedIntersectSize(exprs(0), exprs(1))))

  def register(spark: SparkSession): Unit =
    functions.foreach { case (name, builder) =>
      spark.sessionState.functionRegistry
        .createOrReplaceTempFunction(name, builder, "built-in")
    }

  private[functions] def inject(e: SparkSessionExtensions): Unit =
    functions.foreach { case (name, builder) =>
      e.injectFunction((FunctionIdentifier(name),
        new ExpressionInfo(classOf[SortedIntersectSize].getName, name),
        builder))
    }
}

/** `spark.sql.extensions` entry point. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = GraftFunctions.inject(e)
}
