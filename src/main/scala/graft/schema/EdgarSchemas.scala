package graft.schema

import org.apache.spark.sql.types._

/** Declared schemas for the four SEC EDGAR Financial Statement Data Set files.
  *
  * Mirrors the reference DDL (reference: Airflow/dags/Sec_data_pipeline.py:287-376,
  * duplicated at Airflow/dags/tsv_to_snowflake.py:126-204): RAW_SUB (36 cols),
  * RAW_TAG (9), RAW_NUM (10), RAW_PRE (10). Types per SURVEY.md §1.2 —
  * `value` keeps DecimalType(28,4) fidelity (NUMBER(28,4)); dates are DateType
  * parsed from `yyyyMMdd`; booleans arrive as 0/1 in the TSV and are read as
  * IntegerType then normalized by [[graft.io.TsvReader]].
  */
object EdgarSchemas {

  /** Columns that are BOOLEAN in the reference DDL but encoded 0/1 in the TSV. */
  val subBoolCols: Seq[String] = Seq("wksi", "prevrpt", "detail")
  val tagBoolCols: Seq[String] = Seq("custom", "abstract")
  val preBoolCols: Seq[String] = Seq("inpth", "negating")

  /** RAW_SUB — one row per filing (reference: Sec_data_pipeline.py:294-331). */
  val sub: StructType = StructType(Seq(
    StructField("adsh", StringType),
    StructField("cik", LongType),
    StructField("name", StringType),
    StructField("sic", IntegerType),
    StructField("countryba", StringType),
    StructField("stprba", StringType),
    StructField("cityba", StringType),
    StructField("zipba", StringType),
    StructField("bas1", StringType),
    StructField("bas2", StringType),
    StructField("baph", StringType),
    StructField("countryma", StringType),
    StructField("stprma", StringType),
    StructField("cityma", StringType),
    StructField("zipma", StringType),
    StructField("mas1", StringType),
    StructField("mas2", StringType),
    StructField("countryinc", StringType),
    StructField("stprinc", StringType),
    StructField("ein", LongType),
    StructField("former", StringType),
    StructField("changed", StringType),
    StructField("afs", StringType),
    StructField("wksi", IntegerType),      // BOOLEAN in DDL; 0/1 in TSV
    StructField("fye", StringType),
    StructField("form", StringType),
    StructField("period", DateType),
    StructField("fy", IntegerType),
    StructField("fp", StringType),
    StructField("filed", DateType),
    StructField("accepted", TimestampNTZType),
    StructField("prevrpt", IntegerType),   // BOOLEAN in DDL
    StructField("detail", IntegerType),    // BOOLEAN in DDL
    StructField("instance", StringType),
    StructField("nciks", IntegerType),
    StructField("aciks", StringType)
  ))

  /** RAW_TAG — taxonomy tags (reference: Sec_data_pipeline.py:334-344). */
  val tag: StructType = StructType(Seq(
    StructField("tag", StringType),
    StructField("version", StringType),
    StructField("custom", IntegerType),    // BOOLEAN in DDL
    StructField("abstract", IntegerType),  // BOOLEAN in DDL
    StructField("datatype", StringType),
    StructField("iord", StringType),       // I=instant / D=duration
    StructField("crdr", StringType),       // C / D
    StructField("tlabel", StringType),
    StructField("doc", StringType)
  ))

  /** RAW_NUM — the fact-grain numbers (reference: Sec_data_pipeline.py:347-358). */
  val num: StructType = StructType(Seq(
    StructField("adsh", StringType),
    StructField("tag", StringType),
    StructField("version", StringType),
    StructField("ddate", DateType),
    StructField("qtrs", IntegerType),
    StructField("uom", StringType),
    StructField("segments", StringType),
    StructField("coreg", StringType),
    StructField("value", DecimalType(28, 4)),
    StructField("footnote", StringType)
  ))

  /** RAW_PRE — presentation linkbase (reference: Sec_data_pipeline.py:361-372). */
  val pre: StructType = StructType(Seq(
    StructField("adsh", StringType),
    StructField("report", IntegerType),
    StructField("line", IntegerType),
    StructField("stmt", StringType),       // ∈ {BS, IS, CF, EQ, CI, SI, UN}
    StructField("inpth", IntegerType),     // BOOLEAN in DDL
    StructField("rfile", StringType),
    StructField("tag", StringType),
    StructField("version", StringType),
    StructField("plabel", StringType),
    StructField("negating", IntegerType)   // BOOLEAN in DDL
  ))

  val all: Map[String, StructType] =
    Map("sub" -> sub, "tag" -> tag, "num" -> num, "pre" -> pre)

  val boolCols: Map[String, Seq[String]] =
    Map("sub" -> subBoolCols, "tag" -> tagBoolCols, "num" -> Nil, "pre" -> preBoolCols)
}
