package graft.plans

import org.apache.spark.sql.catalyst.expressions.{ArrayDistinct, ArrayIntersect, ArraySort, Expression, LambdaFunction, Literal, NamedLambdaVariable, Size, SortArray}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{ArrayType, LongType}

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
