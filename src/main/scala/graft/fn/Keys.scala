package graft.fn

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Key-derivation helpers shared by the dimensional models.
  *
  * These are the Spark analogs of the reference's dbt macros — compile-time
  * `Column => Column` functions with zero runtime dispatch cost, exactly as dbt
  * macros are compile-time text templates (SURVEY.md §2.8).
  */
object Keys {

  /** dbt_utils.generate_surrogate_key-exact MD5 surrogate key.
    *
    * dbt_utils builds `md5(coalesce(cast(c1 as varchar),'') || '-' || ...)` —
    * every component cast to string, null → empty string, joined with `-`
    * (reference usage: masterfindata/models/Dimensions/dim_company.sql:7-12,
    * dim_address.sql:7-13, dim_filings.sql:8-15). Reproduced byte-for-byte so
    * hashes match the reference warehouse.
    *
    * Note: `concat_ws` skips nulls, which would collapse `('a',null)` and
    * `('a')` to the same hash with the wrong separator count — so coalesce each
    * component *before* joining.
    */
  def surrogateKey(cols: Column*): Column =
    md5(concat_ws("-", cols.map(c => coalesce(c.cast("string"), lit(""))): _*))

  /** Composite logical key `VERSION_TAG = CONCAT(version,'-',tag)`
    * (reference: stg_num.sql:17, stg_tag.sql:11, stg_pre.sql:12).
    */
  def versionTag(version: Column, tag: Column): Column =
    concat(version, lit("-"), tag)

  /** Ticker extraction `UPPER(SPLIT_PART(instance,'-',1))`
    * (reference: stg_sub.sql:20, dim_company.sql:15).
    */
  def ticker(instance: Column): Column =
    upper(split_part(instance, lit("-"), lit(1)))
}
