package graft.plans

import org.apache.spark.sql.catalyst.expressions.{ArrayDistinct, ArrayIntersect, ArraySort, Cast, EqualTo, Expression, GreaterThan, GreaterThanOrEqual, LambdaFunction, LessThan, LessThanOrEqual, Literal, Multiply, NamedLambdaVariable, Size, SortArray, TimestampDiff, UnixMicros}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{ArrayType, LongType, TimestampNTZType, TimestampType}

import graft.functions.{NgramShingleHashes, SortedIntersectSize}

/** Catalyst optimizer rules — the `Rule[LogicalPlan]` extension tier: users
  * write the declarative form, the optimizer substitutes the engine's
  * kernel when it can PROVE the substitution is value-identical.
  *
  * Install per session via `spark.experimental.extraOptimizations` or
  * cluster-wide with
  * `spark.sql.extensions=graft.functions.GraftExtensions`
  * ([[graft.functions.GraftExtensions]] injects these alongside the
  * function registrations).
  */
object IntersectSizeRewrite extends Rule[LogicalPlan] {

  /** Array elements are provably long and non-null — from the TYPE, not the
    * shape: `transform(..., x -> xxhash64(x))` yields
    * `array<bigint> containsNull=false` because xxhash64 is non-nullable, so
    * the declarative shingle pipeline qualifies without special-casing its
    * inner expression.
    */
  private def nonNullLongArray(e: Expression): Boolean = e.dataType match {
    case ArrayType(LongType, false) => true
    case _ => false
  }

  /** `cmp` is array_sort's DEFAULT ascending comparator bound to (l, r) — a
    * user-supplied lambda could impose any order, so the proof rebuilds the
    * default comparator over the same lambda variables and compares
    * semantically. Earlier optimizer rules prune the comparator's null
    * branches when the elements are provably non-null, so the null-free
    * simplification `if (l < r) -1 else if (l > r) 1 else 0` is accepted
    * too — it imposes the same ascending order.
    */
  private def isDefaultComparator(cmp: Expression, l: NamedLambdaVariable,
                                  r: NamedLambdaVariable): Boolean = {
    import org.apache.spark.sql.catalyst.expressions.{GreaterThan, If, LessThan}
    lazy val simplified = If(LessThan(l, r), Literal(-1),
      If(GreaterThan(l, r), Literal(1), Literal(0)))
    cmp.semanticEquals(ArraySort.comparator(l, r)) || cmp.semanticEquals(simplified)
  }

  /** The operand shapes that guarantee SORTED + DISTINCT long arrays — the
    * precondition of [[SortedIntersectSize]]'s two-pointer merge. (A bare
    * `array_sort` is NOT enough: `array_intersect` dedups its output, so
    * inputs with duplicate elements would change the count.)
    *
    * Beyond the engine's own [[NgramShingleHashes]], the declarative SQL
    * spellings a gateway user writes qualify when sorted+distinct is
    * provable: `array_sort(array_distinct(x))` and
    * `array_distinct(array_sort(x))` with the default comparator, and
    * `sort_array(array_distinct(x))` ascending — each over arrays whose
    * elements are provably non-null longs (null elements would sort last
    * while the merge kernel is null-intolerant, and non-long comparisons
    * aren't the kernel's ordering).
    */
  private def sortedDistinct(e: Expression): Boolean = e match {
    case _: NgramShingleHashes => true
    case ArraySort(ArrayDistinct(inner),
        LambdaFunction(cmp, Seq(l: NamedLambdaVariable, r: NamedLambdaVariable), _), _) =>
      nonNullLongArray(inner) && isDefaultComparator(cmp, l, r)
    // distinct-after-sort: array_distinct keeps first occurrences, so a
    // sorted input stays sorted
    case ArrayDistinct(ArraySort(inner,
        LambdaFunction(cmp, Seq(l: NamedLambdaVariable, r: NamedLambdaVariable), _), _)) =>
      nonNullLongArray(inner) && isDefaultComparator(cmp, l, r)
    case SortArray(ArrayDistinct(inner), Literal(true, _)) =>
      nonNullLongArray(inner)
    case _ => false
  }

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      // size(array_intersect(g1, g2)) → sorted_intersect_size(g1, g2):
      // per-pair allocation-free codegen'd merge instead of a hash set per
      // invocation (measured ~6× on the pairwise Jaccard battery).
      // legacySizeOfNull=false only: with the legacy flag size(null) is -1,
      // while the kernel is null-intolerant like the modern form.
      case Size(ArrayIntersect(l, r), false) if sortedDistinct(l) && sortedDistinct(r) =>
        SortedIntersectSize(l, r)
    }
}

/** Restores parquet predicate pushdown on timestamp-vintage `events.ts`.
  *
  * [[graft.Tables.normalizeEventTs]] presents every `ts` vintage as a
  * nano-epoch long via a derived projection, so a time predicate like
  * `ts >= <watermark-nanos>` — the one column an incremental pipeline prunes
  * by — reaches the scan as a comparison on
  * `timestampdiff(MICROSECOND, epoch, ts) * 1000` (or
  * `unix_micros(ts) * 1000`), which the parquet source cannot push: no
  * PushedFilters, no row-group skipping, a full scan of exactly the data an
  * incremental run exists to avoid. This rule rewrites such comparisons
  * against a LITERAL nano bound into the equivalent comparison on the
  * NATIVE timestamp column with exact integer-bound arithmetic
  * (×1000 ≥ L ⟺ micros ≥ ⌈L/1000⌉, etc.), turning the predicate into the
  * plain attribute-vs-literal shape the datasource pushes into row-group
  * statistics. Null semantics are preserved (a null `ts` yields null on
  * both forms); equality rewrites only when the bound is whole microseconds
  * (otherwise it cannot hold and is left for the post-scan filter to
  * reject). The raw-long vintage needs no help — its `ts` IS the stored
  * column.
  */
object EventTsPushdownRewrite extends Rule[LogicalPlan] {

  /** Matches the nano-normalization shapes of `Tables.normalizeEventTs` AS
    * THE ANALYZER LEAVES THEM, yielding the native timestamp attribute
    * underneath. The NTZ vintage's `timestampdiff(MICROSECOND, ntz-epoch,
    * ts)` is coerced by the analyzer to TIMESTAMP operands — the epoch
    * literal becomes instant 0 and `ts` gains a `cast(... as timestamp)` in
    * the session zone — so the match accepts that form, but ONLY when the
    * zone is a fixed zero offset (the cast is then micros-preserving and
    * the native-column bound is exact; under a DST zone the cast is not
    * invertible at gap/overlap instants, so the rewrite stands down).
    */
  private object NanosOfNativeTs {
    private def isZeroOffset(tz: String): Boolean =
      try java.time.ZoneId.of(tz).normalized() == java.time.ZoneOffset.UTC
      catch { case _: java.time.DateTimeException => false }

    def unapply(e: Expression): Option[Expression] = e match {
      case Multiply(TimestampDiff(unit, Literal(0L, TimestampType),
          Cast(ts, TimestampType, _, _), Some(tz)), Literal(1000L, LongType), _)
          if unit.equalsIgnoreCase("MICROSECOND") &&
            ts.dataType == TimestampNTZType && isZeroOffset(tz) =>
        Some(ts)
      case Multiply(TimestampDiff(unit, Literal(0L, TimestampNTZType), ts, _),
          Literal(1000L, LongType), _)
          if unit.equalsIgnoreCase("MICROSECOND") &&
            ts.dataType == TimestampNTZType =>
        Some(ts)
      case Multiply(UnixMicros(ts), Literal(1000L, LongType), _) => Some(ts)
      case _ => None
    }
  }

  private def floorDiv(l: Long): Long = Math.floorDiv(l, 1000L)
  private def ceilDiv(l: Long): Long = -Math.floorDiv(-l, 1000L)
  private def asNative(micros: Long, ts: Expression): Literal =
    Literal(micros, ts.dataType)

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case GreaterThanOrEqual(NanosOfNativeTs(ts), Literal(l: Long, LongType)) =>
        GreaterThanOrEqual(ts, asNative(ceilDiv(l), ts))
      case GreaterThan(NanosOfNativeTs(ts), Literal(l: Long, LongType)) =>
        GreaterThan(ts, asNative(floorDiv(l), ts))
      case LessThanOrEqual(NanosOfNativeTs(ts), Literal(l: Long, LongType)) =>
        LessThanOrEqual(ts, asNative(floorDiv(l), ts))
      case LessThan(NanosOfNativeTs(ts), Literal(l: Long, LongType)) =>
        LessThan(ts, asNative(ceilDiv(l), ts))
      // literal-first spellings mirror to the same native bounds
      case GreaterThanOrEqual(Literal(l: Long, LongType), NanosOfNativeTs(ts)) =>
        LessThanOrEqual(ts, asNative(floorDiv(l), ts))
      case GreaterThan(Literal(l: Long, LongType), NanosOfNativeTs(ts)) =>
        LessThan(ts, asNative(ceilDiv(l), ts))
      case LessThanOrEqual(Literal(l: Long, LongType), NanosOfNativeTs(ts)) =>
        GreaterThanOrEqual(ts, asNative(ceilDiv(l), ts))
      case LessThan(Literal(l: Long, LongType), NanosOfNativeTs(ts)) =>
        GreaterThan(ts, asNative(floorDiv(l), ts))
      case EqualTo(NanosOfNativeTs(ts), Literal(l: Long, LongType)) if l % 1000 == 0 =>
        EqualTo(ts, asNative(l / 1000, ts))
      case EqualTo(Literal(l: Long, LongType), NanosOfNativeTs(ts)) if l % 1000 == 0 =>
        EqualTo(asNative(l / 1000, ts), ts)
    }
}
