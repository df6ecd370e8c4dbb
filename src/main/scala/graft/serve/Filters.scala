package graft.serve

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Programmatic predicate builder — the engine-side analog of the reference
  * UI's dynamic filter construction (reference: Frontend/app.py:183-196, P5):
  * date-range, numeric-range and categorical-equality filters ANDed together.
  *
  * Specs compile to `Column` conjunctions, so Catalyst pushes them into the
  * scan like any hand-written predicate — the filters reach the parquet
  * reader's `PushedFilters` at any scale.
  */
sealed trait FilterSpec { def column: String }
/** categorical `col = 'v'` */
final case class Eq(column: String, value: Any) extends FilterSpec
/** numeric `col BETWEEN lo AND hi` */
final case class NumBetween(column: String, lo: Double, hi: Double) extends FilterSpec
/** date `col BETWEEN 'yyyy-MM-dd' AND 'yyyy-MM-dd'` (applied on a date cast) */
final case class DateBetween(column: String, lo: String, hi: String) extends FilterSpec
/** membership `col IN (...)` */
final case class In(column: String, values: Seq[Any]) extends FilterSpec

object Filters {
  def toCondition(specs: Seq[FilterSpec]): Column =
    specs.map {
      case Eq(c, v) => col(c) === lit(v)
      case NumBetween(c, lo, hi) => col(c).between(lit(lo), lit(hi))
      case DateBetween(c, lo, hi) => col(c).cast("date").between(lit(lo), lit(hi))
      case In(c, vs) => col(c).isin(vs: _*)
    }.reduceOption(_ && _).getOrElse(lit(true))
}
