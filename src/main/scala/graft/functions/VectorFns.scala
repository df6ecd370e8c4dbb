package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Vector math over `Array[Float]` embedding columns, built from Spark's
  * codegen'd higher-order functions (`zip_with`/`aggregate`) — no UDFs, so
  * whole-stage codegen stays intact around them.
  *
  * Numeric contract: every element is cast to double FIRST, then multiplied
  * and summed strictly left-to-right. That makes results bit-identical to any
  * engine that evaluates the same sequential-double formula (the DuckDB
  * oracles use the explicit `list_transform`+`list_sum` equivalent), so
  * similarity outputs survive a hash-equality gate.
  */
object VectorFns {

  /** Sequential-double dot product of two equal-length float arrays. */
  def dot(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, z) => acc + z)

  /** L2 norm, same sequential-double contract. */
  def l2norm(a: Column): Column =
    sqrt(aggregate(
      transform(a, x => x.cast("double") * x.cast("double")),
      lit(0.0), (acc, z) => acc + z))

  /** Cosine similarity. */
  def cosine(a: Column, b: Column): Column =
    dot(a, b) / (l2norm(a) * l2norm(b))

  // ---- statically-unrolled variants -------------------------------------
  // Spark's higher-order functions (aggregate/zip_with) interpret their
  // lambda per element (CodegenFallback) — a 64-dim dot via `aggregate` costs
  // ~100× a codegen'd arithmetic chain. When the dimension is known, unroll
  // into explicit GetArrayItem sums: identical left-to-right double
  // accumulation (same bits as the fold), but fully whole-stage-codegen'd.
  // Measured at sf0.1: pairwise cosine 29.5s → ~2s.

  /** Unrolled sequential-double dot product for a known dimension. */
  def dotN(a: Column, b: Column, dim: Int): Column =
    (0 until dim).map(i => a.getItem(i).cast("double") * b.getItem(i).cast("double"))
      .reduceLeft(_ + _)

  /** Unrolled L2 norm for a known dimension. */
  def l2normN(a: Column, dim: Int): Column =
    sqrt((0 until dim).map { i =>
      val x = a.getItem(i).cast("double"); x * x
    }.reduceLeft(_ + _))
}
