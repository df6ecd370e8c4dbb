package graft.io

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.graph.{Bucketed, Incremental, Materialization, MergeInc, Model, Partitioned, Table, View}

/** Model materializer: dbt materializations → Spark write paths
  * (reference: masterfindata/dbt_project.yml:26-45, fct_balanceSheet.sql:1-6).
  *
  *  - view → temp view + lazy DataFrame (recomputed per use, like a SQL view).
  *  - table → parquet under `warehouseDir`, `cluster_by` mapped to
  *    `repartition(keys).sortWithinPartitions(keys)` (SURVEY.md §4) so files
  *    are clustered for downstream min/max pruning — the Spark analog of
  *    Snowflake clustering keys.
  *  - incremental → append rows with `watermark >= max(existing watermark)`
  *    (reference: json_transform/macros/incremental_filter.sql:1-5 — note the
  *    `>=` re-processes the boundary value; preserved as-is, SURVEY.md §7.4#7).
  */
final class Materializer(spark: SparkSession, warehouseDir: String,
                         clusterPartitions: Int = 32) {

  private def path(name: String) = s"$warehouseDir/$name"

  def apply(model: Model, df: DataFrame): DataFrame =
    materialize(model.name, df, model.materialization)

  def materialize(name: String, df: DataFrame, mat: Materialization): DataFrame =
    mat match {
      case View =>
        df.createOrReplaceTempView(name)
        df
      case Table(clusterBy, format) =>
        val out =
          if (clusterBy.isEmpty) df
          else df.repartition(clusterPartitions, clusterBy.map(col): _*)
            .sortWithinPartitions(clusterBy.map(col): _*)
        out.write.mode("overwrite").format(format).save(path(name))
        val back = spark.read.format(format).load(path(name))
        back.createOrReplaceTempView(name)
        back
      case Partitioned(partitionBy, format) =>
        // one directory per partition value; a filter on the partition
        // column prunes directories before any file is opened
        df.write.mode("overwrite").partitionBy(partitionBy: _*)
          .format(format).save(path(name))
        val back = spark.read.format(format).load(path(name))
        back.createOrReplaceTempView(name)
        back
      case Bucketed(bucketBy, numBuckets) =>
        // a previous JVM may have left the managed location behind while the
        // in-memory catalog forgot the table — clear both before writing
        spark.sql(s"DROP TABLE IF EXISTS `$name`")
        val loc = new org.apache.hadoop.fs.Path(
          spark.conf.get("spark.sql.warehouse.dir"), name)
        val fs = loc.getFileSystem(spark.sparkContext.hadoopConfiguration)
        if (fs.exists(loc)) fs.delete(loc, true)
        df.write.mode("overwrite")
          .bucketBy(numBuckets, bucketBy.head, bucketBy.tail: _*)
          .sortBy(bucketBy.head, bucketBy.tail: _*)
          .format("parquet")
          .saveAsTable(name)
        spark.table(name)
      case MergeInc(keys, partitionByOpt, deleteColOpt) =>
        val target = path(name)
        val tpath = new org.apache.hadoop.fs.Path(target)
        val fs = tpath.getFileSystem(spark.sparkContext.hadoopConfiguration)
        val delCol = deleteColOpt.map(col)
        val back = (fs.exists(tpath), partitionByOpt) match {
          case (false, partOpt) =>
            // first batch: tombstones have nothing to delete; feed metadata
            // (the delete flag) never lands in the table
            val seed0 = delCol.map(c => df.filter(!coalesce(c, lit(false)))).getOrElse(df)
            val seed = deleteColOpt.map(seed0.drop(_)).getOrElse(seed0)
            val w = seed.write.mode("overwrite")
            partOpt.fold(w)(p => w.partitionBy(p)).parquet(target)
            spark.read.parquet(target)
          case (true, Some(p)) =>
            // partition-scoped merge: only the feed's partitions are read,
            // merged, and dynamically overwritten — untouched partitions'
            // files are never opened, let alone rewritten
            val touched = df.select(col(p)).distinct().collect().map(_.get(0))
            val existingSlice = spark.read.parquet(target)
              .filter(col(p).isin(touched: _*))
            val merged = graft.operators.Scd
              .mergeUpsert(existingSlice, df, keys, deleteWhen = delCol)
              // break lineage to the target files before overwriting them
              // (self-overwrite is otherwise rejected at analysis)
              .localCheckpoint()
            merged.write.mode("overwrite")
              .option("partitionOverwriteMode", "dynamic")
              .partitionBy(p).parquet(target)
            // dynamic overwrite only replaces partitions PRESENT in the
            // output: a touched partition whose rows were all deleted writes
            // nothing and would silently survive — drop its directory
            val written = merged.select(col(p)).distinct().collect().map(_.get(0)).toSet
            touched.filterNot(written).foreach { v =>
              fs.delete(new org.apache.hadoop.fs.Path(tpath, s"$p=$v"), true)
            }
            spark.read.parquet(target)
          case (true, None) =>
            val merged = graft.operators.Scd
              .mergeUpsert(spark.read.parquet(target), df, keys, deleteWhen = delCol)
              .localCheckpoint()
            merged.write.mode("overwrite").parquet(target)
            spark.read.parquet(target)
        }
        back.createOrReplaceTempView(name)
        back
      case Incremental(wmCol) =>
        val target = path(name)
        val exists = new java.io.File(target).exists() ||
          scala.util.Try(spark.read.parquet(target).schema).isSuccess
        if (!exists) {
          df.write.mode("overwrite").parquet(target)
        } else {
          val existing = spark.read.parquet(target)
          val maxWm = existing.agg(max(col(wmCol))).head.get(0)
          val fresh =
            if (maxWm == null) df
            else df.filter(col(wmCol) >= lit(maxWm))
          fresh.write.mode("append").parquet(target)
        }
        val back = spark.read.parquet(target)
        back.createOrReplaceTempView(name)
        back
    }
}
