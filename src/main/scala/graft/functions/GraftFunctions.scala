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

  /** Literal-int argument of a SQL call (e.g. the `n` in
    * `ngram_shingle_hashes(text, 3)`) — must fold at registration time.
    */
  private def intArg(e: org.apache.spark.sql.catalyst.expressions.Expression,
                     name: String): Int = e.eval() match {
    case i: Int => i
    case other => throw new IllegalArgumentException(
      s"$name expects a literal int argument, got $other")
  }

  private val functions: Seq[(String, String, Seq[org.apache.spark.sql.catalyst.expressions.Expression] =>
      org.apache.spark.sql.catalyst.expressions.Expression)] = Seq(
    ("sorted_intersect_size", classOf[SortedIntersectSize].getName,
      exprs => SortedIntersectSize(exprs(0), exprs(1))),
    ("ngram_shingle_hashes", classOf[NgramShingleHashes].getName,
      exprs => NgramShingleHashes(exprs(0),
        if (exprs.size > 1) intArg(exprs(1), "ngram_shingle_hashes") else 3)),
    ("minhash_band_keys", classOf[MinHashBandKeys].getName,
      exprs => MinHashBandKeys(exprs(0),
        intArg(exprs(1), "minhash_band_keys"), intArg(exprs(2), "minhash_band_keys"))),
    ("lsh_band_buckets", classOf[LshBandBuckets].getName,
      exprs => LshBandBuckets(exprs(0),
        intArg(exprs(1), "lsh_band_buckets"), intArg(exprs(2), "lsh_band_buckets"),
        intArg(exprs(3), "lsh_band_buckets"))))

  def register(spark: SparkSession): Unit =
    functions.foreach { case (name, _, builder) =>
      spark.sessionState.functionRegistry
        .createOrReplaceTempFunction(name, builder, "built-in")
    }

  private[functions] def inject(e: SparkSessionExtensions): Unit = {
    functions.foreach { case (name, className, builder) =>
      e.injectFunction((FunctionIdentifier(name),
        new ExpressionInfo(className, name),
        builder))
    }
    e.injectOptimizerRule(_ => graft.plans.IntersectSizeRewrite)
  }
}

/** `spark.sql.extensions` entry point. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = GraftFunctions.inject(e)
}
