package graft.models

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.fn.{Cleansing, Keys}

/** Staging models — projection + cleansing views over the raw EDGAR tables.
  *
  * Each function is a pure `DataFrame => DataFrame` mirroring one dbt model
  * (reference: Airflow/masterfindata/models/Staging/ *.sql). Materialization is
  * the caller's concern ([[graft.graph.ModelGraph]] / [[graft.io.Materializer]]).
  */
object Staging {

  /** stg_sub (reference: masterfindata/models/Staging/stg_sub.sql:6-21). */
  def stgSub(rawSub: DataFrame): DataFrame =
    rawSub.select(
      col("adsh").as("ADSH"),
      col("cik").as("CIK"),
      col("name").as("NAME"),
      Cleansing.unknown(col("countryba")).as("COUNTRYBA"),
      Cleansing.unknown(col("stprba")).as("STPRBA"),
      Cleansing.unknown(col("cityba")).as("CITYBA"),
      Cleansing.unknown(col("zipba")).as("ZIPBA"),
      Cleansing.unknown(col("bas1")).as("BAS1"),
      Cleansing.doesNotExist(col("bas2")).as("BAS2"),
      col("baph").as("BAPH"),
      col("filed").as("FILED"),
      col("accepted").as("ACCEPTED"),
      col("instance").as("INSTANCE"),
      Keys.ticker(col("instance")).as("Ticker")
    )

  /** stg_num (reference: masterfindata/models/Staging/stg_num.sql:8-19).
    * cluster_by=['ADSH','TAG','VERSION_TAG'] is applied at materialization.
    */
  def stgNum(rawNum: DataFrame): DataFrame =
    rawNum.select(
      col("adsh").as("ADSH"),
      col("tag").as("TAG"),
      col("version").as("VERSION"),
      col("ddate").as("DDATE"),
      col("qtrs").as("QTRS"),
      col("uom").as("UOM"),
      col("value").as("VALUE"),
      col("footnote").as("FOOTNOTE"),
      Keys.versionTag(col("version"), col("tag")).as("VERSION_TAG")
    )

  /** stg_tag (reference: masterfindata/models/Staging/stg_tag.sql:6-12). */
  def stgTag(rawTag: DataFrame): DataFrame =
    rawTag.select(
      col("tag").as("TAG"),
      col("version").as("VERSION"),
      Cleansing.notKnown(col("tlabel")).as("TLABEL"),
      col("doc").as("DOC"),
      Keys.versionTag(col("version"), col("tag")).as("VERSION_TAG")
    )

  /** stg_pre (reference: masterfindata/models/Staging/stg_pre.sql:6-13). */
  def stgPre(rawPre: DataFrame): DataFrame =
    rawPre.select(
      col("adsh").as("ADSH"),
      col("stmt").as("STMT"),
      col("tag").as("TAG"),
      col("version").as("VERSION"),
      Cleansing.notKnown(col("plabel")).as("PLABEL"),
      Keys.versionTag(col("version"), col("tag")).as("VERSION_TAG")
    )
}
