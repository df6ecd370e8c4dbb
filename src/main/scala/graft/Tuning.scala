package graft

import org.apache.spark.sql.SparkSession

/** Shared partitioning heuristics. */
object Tuning {

  /** Fan-out partition count for compute-bound stages — pair loops,
    * band-key passes, broadcast-join fan-out chains: 2× the executor cores
    * with a floor of 8. Used as an EXPLICIT `repartition(n, ...)` count
    * rather than relying on `spark.sql.shuffle.partitions`: these stages
    * are compute-bound, not byte-bound, and AQE (which only sees shuffle
    * bytes) would coalesce a small shuffle onto one core and serialize the
    * downstream loop.
    */
  def fanout(spark: SparkSession): Int =
    math.max(spark.sparkContext.defaultParallelism * 2, 8)
}
