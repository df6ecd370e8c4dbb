package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Salted join for skewed keys — the manual fallback when AQE's skew-join
  * splitting isn't enough (e.g. one key holding >50% of a 100 TB fact).
  *
  * The big side gets a deterministic salt in [0, buckets) derived from its
  * whole row; the small side is exploded ×buckets so every (key, salt) pair
  * exists. The join result is row-identical to the unsalted inner join, but
  * the shuffle spreads each hot key over `buckets` reducers.
  */
object SkewJoin {

  def saltedInnerJoin(big: DataFrame, small: DataFrame, key: String,
                      buckets: Int = 16): DataFrame = {
    require(buckets > 0)
    val saltCol = "_graft_salt"
    val salted = big.withColumn(saltCol,
      pmod(hash(big.columns.map(col).toIndexedSeq: _*), lit(buckets)))
    val exploded = small.withColumn(saltCol,
      explode(sequence(lit(0), lit(buckets - 1))))
    salted.join(exploded, Seq(key, saltCol)).drop(saltCol)
  }
}
