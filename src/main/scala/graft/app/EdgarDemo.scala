package graft.app

import org.apache.spark.sql.SparkSession

import graft.graph.ModelGraph
import graft.io.{Materializer, TsvReader}
import graft.quality.Checks

/** End-to-end EDGAR pipeline runner — the Spark analog of the reference's two
  * DAGs (ingest `Sec_data_pipeline.py` + transform `rdbms_transformation.py`):
  * COPY-load the four TSVs, build the full star-schema + document models with
  * parallel fact materialization, run the declared data-quality suite, and
  * report row counts + violations.
  *
  * Usage: EdgarDemo <tsvDir> <warehouseDir>
  */
object EdgarDemo {
  def main(args: Array[String]): Unit = {
    val Array(tsvDir, warehouse) = args.take(2)
    val spark = SparkSession.builder()
      .master(sys.env.getOrElse("SPARK_MASTER", "local[4]"))
      .appName("graft-edgar")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // 1. COPY INTO-equivalent land (S5/S6)
    val raw = TsvReader.readAll(spark, tsvDir, landTo = Some(s"$warehouse/raw"))
    raw.toSeq.sortBy(_._1).foreach { case (n, df) => println(s"raw.$n rows=${df.count()}") }

    // 2. model graph: staging → dims → facts (parallel) + JSON document model
    val mat = new Materializer(spark, s"$warehouse/models", clusterPartitions = 4)
    val models = ModelGraph.edgar(spark).run(raw, mat.apply)(spark)
    Seq("stg_sub", "dim_company", "dim_filings", "dim_date",
      "fct_balanceSheet", "fct_IncomeStatement", "fct_Cashflows",
      "financial_statements_json").foreach { n =>
      println(s"model.$n rows=${models(n).count()}")
    }

    // 3. dbt-test-equivalent data-quality report (reporting, not failing)
    val report = Checks.report(Checks.edgarSuite(raw("sub"), raw("tag"), raw("num"), raw("pre")))
    val failed = report.filter(!_.passed)
    println(s"quality checks=${report.size} violations=${failed.size}")
    failed.foreach(r => println(s"  VIOLATION ${r.name}: ${r.violations} rows"))

    spark.stop()
  }
}
