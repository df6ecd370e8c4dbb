package graft.models

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.fn.Cleansing

/** Document-model path (reference dbt project `json_transform` + the pandas
  * TSV→JSON DAG `Airflow/dags/txt_to_json.py`).
  *
  * Snowflake `OBJECT_CONSTRUCT` → `struct(...)` with field aliases;
  * `ARRAY_AGG(OBJECT_CONSTRUCT(...))` → `collect_list(struct(...))`
  * (unordered in both engines — SURVEY.md §7.4#3; tests must `array_sort`
  * before comparing).
  */
object JsonModels {

  /** raw_stg_sub_modified (reference:
    * json_transform/models/staging/raw_stg_sub_modified.sql) — pass-through of
    * raw_sub with null `period` → 9999-12-31 (handle_null_date macro).
    */
  def rawStgSubModified(rawSub: DataFrame): DataFrame =
    rawSub.withColumn("period", Cleansing.handleNullDate(col("period")))

  /** stg_financial_data (reference:
    * json_transform/models/staging/stg_financial_data.sql) — wide denormalizing
    * left-join chain sub→num→tag→pre (J7).
    *
    * Scale note: at 100 TB the chain shuffles on `adsh` once and reuses that
    * partitioning for the pre join (same key prefix); the tag join is a
    * broadcast (taxonomy is small and bounded).
    */
  def stgFinancialData(rawSubModified: DataFrame, rawNum: DataFrame,
                       rawTag: DataFrame, rawPre: DataFrame): DataFrame = {
    val s = rawSubModified.select(
      col("adsh"), col("cik"), col("filed").as("filing_date"),
      col("fy").as("fiscal_year"), col("fp").as("fiscal_period"),
      col("name").as("company_name"), col("sic"),
      col("countryba"), col("stprba"), col("cityba"))
    val n = rawNum.select(
      col("adsh"), col("tag"), col("version"),
      col("ddate").as("period_end_date"), col("qtrs").as("quarters_duration"),
      col("uom").as("unit_of_measure"), col("value"), col("footnote"))
    val t = rawTag.select(
      col("tag"), col("version"),
      col("tlabel").as("tag_label"), col("doc").as("tag_description"))
    val p = rawPre.select(
      col("adsh"), col("report"), col("line"),
      col("stmt").as("statement_type"), col("tag"),
      col("plabel").as("presentation_label"))

    s.as("s")
      .join(n.as("n"), col("s.adsh") === col("n.adsh"), "left")
      .join(broadcast(t.as("t")),
        col("n.tag") === col("t.tag") && col("n.version") === col("t.version"), "left")
      .join(p.as("p"),
        col("n.adsh") === col("p.adsh") && col("n.tag") === col("p.tag"), "left")
      .select(
        col("s.adsh"), col("s.cik"), col("s.filing_date"), col("s.fiscal_year"),
        col("s.fiscal_period"), col("s.company_name"), col("s.sic"),
        col("n.tag"), col("n.version"), col("n.period_end_date"),
        col("n.quarters_duration"), col("n.unit_of_measure"),
        col("n.value").as("numeric_value"), col("n.footnote"),
        col("t.tag_label"), col("t.tag_description"),
        col("p.statement_type"), col("p.presentation_label"))
  }

  /** financial_statements_json (reference:
    * json_transform/models/json/financial_statements_json.sql:1-34) — re-nest
    * the wide table per filing: company_info struct + financial_data array of
    * structs (A3/F12).
    */
  def financialStatementsJson(stgFinancialData: DataFrame): DataFrame =
    stgFinancialData
      .groupBy(col("adsh"), col("cik"), col("company_name"), col("sic"),
        col("filing_date"), col("fiscal_year"), col("fiscal_period"))
      .agg(collect_list(struct(
        col("tag").as("tag"),
        col("tag_label").as("tag_label"),
        col("tag_description").as("tag_description"),
        col("numeric_value").as("value"),
        col("unit_of_measure").as("unit_of_measure"),
        col("period_end_date").as("period_end_date"),
        col("quarters_duration").as("quarters_duration"),
        col("statement_type").as("statement_type"),
        col("presentation_label").as("presentation_label")
      )).as("financial_data"))
      .select(
        col("adsh").as("filing_id"),
        struct(col("company_name"), col("cik"), col("sic")).as("company_info"),
        col("financial_data"),
        col("filing_date"), col("fiscal_year"), col("fiscal_period"))

  /** The pandas TSV→JSON document (reference: Airflow/dags/txt_to_json.py:60-77,
    * S7): one JSON document holding all four tables as arrays of row objects —
    * `{"sub":[...],"tag":[...],"num":[...],"pre":[...]}` as a single-row
    * DataFrame of JSON text, ready for `df.write.json` / VARIANT-style load.
    *
    * Scale note: a single all-tables document is inherently a driver-sized
    * object (the reference collects whole TSVs into pandas); kept for parity
    * but per-filing documents ([[financialStatementsJson]]) are the scalable
    * shape.
    */
  def secJsonDocument(tables: Map[String, DataFrame]): DataFrame = {
    val parts = Seq("sub", "tag", "num", "pre").map { name =>
      tables(name).agg(collect_list(struct(col("*"))).as(name))
    }
    parts.reduce(_.crossJoin(_))
      .select(to_json(struct(col("sub"), col("tag"), col("num"), col("pre"))).as("doc"))
  }
}
