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

  /** Bloom-prefiltered left-semi join — the shuffle-reduction play for
    * `fact ⋉ keyset` when the key set is selective but too large (or too
    * dynamically computed) for a broadcast-hash join: first fold the key
    * side into ONE Bloom filter (a partial-aggregated KB→MB-scale sketch
    * via [[graft.functions.BloomFilterAgg]], shipped to executors as a
    * broadcast variable, deserialized once per executor), pre-filter the
    * fact against it BEFORE the fact's exchange, then run the exact semi
    * join on the survivors. Result is row-identical to the plain semi join
    * (Bloom false positives are caught by the exact join; false negatives
    * are structurally impossible) but the fact-side shuffle carries only
    * `match_rate + fpp` of the fact instead of all of it — at 100 TB the
    * exchange is the cost, and this is the one knob that shrinks it
    * without bucketing. Spark's own InjectRuntimeFilter plays the same
    * trick for plan shapes it recognizes; this is the explicit spelling
    * for programmatic key sets (dedup survivors, audit lists, incremental
    * deltas) and it pre-filters at a caller-chosen fpp. Both halves of
    * that division of labor are plan-pinned in ScaleSpec ("runtime-filter
    * landscape"): the built-in rule FIRES on scan+selective-filter key
    * sides — don't reinvent that — and never fires on programmatic ones,
    * which is exactly this operator's lane.
    */
  def bloomSemiJoin(fact: DataFrame, keys: DataFrame, key: String,
                    expectedKeys: Long = 1L << 20,
                    fpp: Double = 0.01): DataFrame =
    bloomKeyFilter(fact, keys, key, expectedKeys, fpp)
      .join(keys.select(col(key)).distinct(), Seq(key), "left_semi")

  /** Just the pre-filter half of [[bloomSemiJoin]]: `fact` rows whose key
    * MIGHT be in `keys` (superset of the true matches, narrower by
    * ~`1 - match_rate - fpp`). Exposed separately so the reduction is
    * measurable (spec-pinned) and so callers can hang other joins on the
    * thinned fact.
    */
  def bloomKeyFilter(fact: DataFrame, keys: DataFrame, key: String,
                     expectedKeys: Long = 1L << 20,
                     fpp: Double = 0.01): DataFrame = {
    val bloomBytes = keys
      .agg(graft.functions.BloomFilterAgg(
        xxhash64(col(key)), expectedKeys, fpp).as("bloom"))
      .head().getAs[Array[Byte]](0)
    // Native codegen'd probe (BloomFilterMightContain with the filter bytes
    // as a foldable literal) — same spelling as the dedup admit tier, so the
    // probe stays inside the fact scan's whole-stage-codegen span instead of
    // crossing a ScalaUDF wall per row (ScaleSpec pins the plan UDF-free
    // and the probe Filter codegen-starred against a parquet scan).
    fact.filter(graft.functions.BloomFilterAgg.mightContainCol(
      bloomBytes, xxhash64(col(key))))
  }
}
