package graft.fn

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Null-sentinel cleansing functions mirroring the reference's staging SQL
  * (SURVEY.md §1.3). All are pure `Column => Column` — the Spark analog of dbt
  * macros.
  */
object Cleansing {

  /** `COALESCE(col,'Unknown')` (reference: stg_sub.sql:10-15). */
  def unknown(c: Column): Column = coalesce(c, lit("Unknown"))

  /** `COALESCE(col,'not known')` (reference: stg_tag.sql:9, stg_pre.sql:11). */
  def notKnown(c: Column): Column = coalesce(c, lit("not known"))

  /** `COALESCE(col,'Does not exist or Unknown')` (reference: stg_sub.sql:15). */
  def doesNotExist(c: Column): Column = coalesce(c, lit("Does not exist or Unknown"))

  /** Null dates → `9999-12-31`
    * (reference: json_transform/macros/handle_null_dates.sql:1-3).
    */
  def handleNullDate(c: Column): Column =
    coalesce(c, to_date(lit("9999-12-31")))
}
