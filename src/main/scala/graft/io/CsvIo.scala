package graft.io

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** CSV source + sink with the weather-demo semantics (reference:
  * Airflow/dags/web_to_snowflake.py:38-83,122-163 — S9/F15): scraped
  * temperature/humidity rows land as CSV with `yyyy-MM-dd` dates and a
  * derived Celsius column.
  */
object CsvIo {

  val weatherSchema: StructType = StructType(Seq(
    StructField("temperature", DoubleType),
    StructField("humidity", DoubleType),
    StructField("date", DateType)))

  /** °F→°C: `round((t - 32) * 5 / 9, 2)` (reference: web_to_snowflake.py:46). */
  def fahrenheitToCelsius(t: Column): Column =
    round((t - lit(32)) * 5 / 9, 2)

  def readWeather(spark: SparkSession, path: String): DataFrame =
    spark.read.schema(weatherSchema)
      .option("header", "true")
      .option("dateFormat", "yyyy-MM-dd")
      .csv(path)
      .withColumn("temperature_celsius", fahrenheitToCelsius(col("temperature")))

  def writeWeather(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite")
      .option("header", "true")
      .option("dateFormat", "yyyy-MM-dd")
      .csv(path)
}
