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

  private type Exprs = Seq[org.apache.spark.sql.catalyst.expressions.Expression]

  /** Arity gate: a wrong argument count must surface as an analysis-time
    * error naming the function, not an IndexOutOfBoundsException from the
    * builder.
    */
  private def arity(name: String, exprs: Exprs, expected: String, ok: Boolean): Unit =
    if (!ok) throw new IllegalArgumentException(
      s"$name expects $expected arguments, got ${exprs.size}")

  /** Literal-int argument of a SQL call (e.g. the `n` in
    * `ngram_shingle_hashes(text, 3)`) — must fold at registration time.
    * Integral literals of any width are accepted (SQL `8` parses as int,
    * but users reasonably write `8L` too).
    */
  private def intArg(e: org.apache.spark.sql.catalyst.expressions.Expression,
                     name: String): Int = e.eval() match {
    case i: Int => i
    case l: Long if l.isValidInt => l.toInt
    case s: Short => s.toInt
    case b: Byte => b.toInt
    case other => throw new IllegalArgumentException(
      s"$name expects a literal int argument, got $other")
  }

  private val functions: Seq[(String, String, Exprs =>
      org.apache.spark.sql.catalyst.expressions.Expression)] = Seq(
    ("sorted_intersect_size", classOf[SortedIntersectSize].getName,
      exprs => {
        arity("sorted_intersect_size", exprs, "2", exprs.size == 2)
        SortedIntersectSize(exprs(0), exprs(1))
      }),
    ("ngram_shingle_hashes", classOf[NgramShingleHashes].getName,
      exprs => {
        arity("ngram_shingle_hashes", exprs, "1 or 2", exprs.size == 1 || exprs.size == 2)
        NgramShingleHashes(exprs(0),
          if (exprs.size > 1) intArg(exprs(1), "ngram_shingle_hashes") else 3)
      }),
    ("minhash_band_keys", classOf[MinHashBandKeys].getName,
      exprs => {
        arity("minhash_band_keys", exprs, "3", exprs.size == 3)
        MinHashBandKeys(exprs(0),
          intArg(exprs(1), "minhash_band_keys"), intArg(exprs(2), "minhash_band_keys"))
      }),
    ("lsh_band_buckets", classOf[LshBandBuckets].getName,
      exprs => {
        arity("lsh_band_buckets", exprs, "4", exprs.size == 4)
        LshBandBuckets(exprs(0),
          intArg(exprs(1), "lsh_band_buckets"), intArg(exprs(2), "lsh_band_buckets"),
          intArg(exprs(3), "lsh_band_buckets"))
      }),
    ("jaro_winkler", classOf[JaroWinkler].getName,
      exprs => {
        arity("jaro_winkler", exprs, "2", exprs.size == 2)
        JaroWinkler(exprs(0), exprs(1))
      }),
    ("unicode_fold", classOf[UnicodeFold].getName,
      exprs => {
        arity("unicode_fold", exprs, "1", exprs.size == 1)
        UnicodeFold(exprs(0))
      }))

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
    e.injectOptimizerRule(_ => graft.plans.EventTsPushdownRewrite)
    e.injectPlannerStrategy(_ => graft.plans.AsOfJoinStrategy)
  }
}

/** `spark.sql.extensions` entry point. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = GraftFunctions.inject(e)
}
