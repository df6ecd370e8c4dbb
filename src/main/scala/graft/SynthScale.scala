package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scale-factor synthesizer: materializes an `N×` copy of a driver testdata
  * directory (TESTDATA.md) so the engine's scaling slope can be MEASURED
  * instead of asserted — `/root/testdata` is read-only and tops out at
  * sf0.1, so the 10× datapoint has to be built here, keeping every foreign
  * key consistent so the join/agg workload shape is the real one.
  *
  * Each copy `i ∈ [0, copies)` offsets EVERY key domain by `i · KeyStride`
  * together (orderkey/custkey/partkey/suppkey move in lockstep, so
  * orders⋈customer⋈lineitem⋈part⋈supplier cardinalities scale exactly
  * linearly). `region`/`nation` stay fixed — TPC-H dimensions don't scale
  * with sf, and scaling them would change the broadcast-side shape the
  * slope is supposed to hold constant.
  *
  * Two columns are deliberately NOT byte-identical across copies, because a
  * verbatim copy would CHANGE the workload's similarity structure rather
  * than scale it (10 identical copies of each document = 45 new exact-dup
  * pairs per doc — a 45× pair blowup that makes every dedup operator look
  * super-linear when the engine is perfectly linear per pair):
  *
  *  - `documents.text` is alphabet-rotated per copy (Caesar shift of
  *    [a-z] by `i`): token/shingle SET SIZES, lengths, whitespace and
  *    punctuation are preserved exactly — the within-copy near-dup
  *    structure is isomorphic to the original corpus — while shingle
  *    spaces of different copies are disjoint, so cross-copy similarity
  *    is zero, exactly like ingesting ten same-sized shards of fresh data.
  *  - `embeddings.embedding` gets a per-copy diagonal ±1 sign flip, each
  *    dimension flipped with probability ½ under a deterministic hash of
  *    (copy, dim): norms and ALL within-copy cosines are invariant under a
  *    shared diagonal orthogonal transform, while any two distinct copies
  *    differ on ~half the dimensions, so a vector's cross-copy cosine with
  *    its own twin is a zero-mean ±-sum with σ ≈ √Σm_d² ≈ 1/8 — far below
  *    every near-dup threshold in the battery (τ ≥ 0.9) even at 4–5σ tails.
  *    (A fixed 16-dim flip set was measured too weak: one sf0.001 vector
  *    carried only 4.9% of its mass on those dims → self-cosine 0.90.)
  *
  * Every other value column (prices, dates, event timestamps, props JSON)
  * is copied verbatim: per-key group sizes stay constant and per-time-bucket
  * group sizes grow linearly — the "more users, same period" scale-up.
  *
  * Usage: `runMain graft.SynthScale <srcDir> <outDir> [copies]`, e.g.
  * `runMain graft.SynthScale /root/testdata/sf0.1 /tmp/sf1 10`.
  */
object SynthScale {

  /** Per-copy key offset — comfortably above every sf0.1 key domain
    * (asserted at run time) and comfortably below the 2^40 id offsets the
    * operators use internally for planted rows (`Dedup.plantEmbeddingNearDups`,
    * the pagerank supplier offset), so synthesized ids can never collide
    * with either.
    */
  val KeyStride: Long = 100000000L

  private val Lower = "abcdefghijklmnopqrstuvwxyz"

  /** ±1 for (copy, dim) — a 50% deterministic coin from a 64-bit mix
    * (splitmix64 finalizer constants), so any two distinct copies disagree
    * on ~half the dimensions regardless of where a vector's mass sits.
    */
  private[graft] def flipSign(copy: Int, dim: Int): Float = {
    var x = copy.toLong * 0x9E3779B97F4A7C15L + dim.toLong * 0xC2B2AE3D27D4EB4FL
    x ^= (x >>> 33); x *= 0xFF51AFD7ED558CCDL; x ^= (x >>> 33)
    if ((x & 1L) == 1L) -1.0f else 1.0f
  }

  /** Columns that carry entity keys, per table — all offset together. */
  private val keyCols: Map[String, Seq[String]] = Map(
    "customer" -> Seq("c_custkey"),
    "supplier" -> Seq("s_suppkey"),
    "part" -> Seq("p_partkey"),
    "orders" -> Seq("o_orderkey", "o_custkey"),
    "lineitem" -> Seq("l_orderkey", "l_partkey", "l_suppkey"),
    "events" -> Seq("event_id", "user_id"),
    "documents" -> Seq("doc_id"),
    "embeddings" -> Seq("vec_id"))

  /** Output file counts sized to the 10× row volume (a single huge file
    * would serialize every downstream scan's first stage).
    */
  private val outParts: Map[String, Int] = Map(
    "lineitem" -> 16, "orders" -> 8, "events" -> 8, "part" -> 4,
    "customer" -> 4, "documents" -> 4, "embeddings" -> 2, "supplier" -> 1,
    "region" -> 1, "nation" -> 1)

  /** One scaled copy of `base` for copy index `i` (i = 0 is the original). */
  def scaledCopy(table: String, base: DataFrame, i: Int): DataFrame = {
    var df = keyCols.getOrElse(table, Nil).foldLeft(base) { (d, k) =>
      d.withColumn(k, col(k) + lit(i * KeyStride))
    }
    if (table == "documents" && i > 0) {
      val shifted = Lower.drop(i % 26) + Lower.take(i % 26)
      df = df.withColumn("text", translate(col("text"), Lower, shifted))
    }
    if (table == "embeddings" && i > 0) {
      val signs: Seq[Float] =
        (0 until Tables.EmbeddingDim).map(d => flipSign(i, d))
      df = df.withColumn("embedding",
        zip_with(col("embedding"), typedLit(signs), (x, s) => x * s))
    }
    df
  }

  /** Scale one table `copies`× into `outDir/<table>.parquet`. */
  def scaleTable(spark: SparkSession, srcDir: String, outDir: String,
                 table: String, copies: Int): Long = {
    val base = spark.read.parquet(s"$srcDir/$table.parquet")
    val ks = keyCols.getOrElse(table, Nil)
    if (ks.nonEmpty) {
      val maxKey = base.agg(greatest(
          lit(0L) +: ks.map(k => max(col(k)).cast("long")): _*))
        .head.getLong(0)
      require(maxKey < KeyStride,
        s"$table: max key $maxKey >= stride $KeyStride — raise KeyStride")
    }
    val scaled =
      if (ks.isEmpty) base // fixed dimension (region/nation)
      else (0 until copies).map(i => scaledCopy(table, base, i))
        .reduce(_ unionByName _)
    scaled.repartition(outParts.getOrElse(table, 4))
      .write.mode("overwrite").parquet(s"$outDir/$table.parquet")
    spark.read.parquet(s"$outDir/$table.parquet").count()
  }

  def main(args: Array[String]): Unit = {
    val srcDir = args.lift(0).getOrElse("/root/testdata/sf0.1")
    val outDir = args.lift(1).getOrElse("/tmp/sf1")
    val copies = args.lift(2).map(_.toInt).getOrElse(10)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-synth-scale")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    Tables.names.foreach { t =>
      val n = scaleTable(spark, srcDir, outDir, t, copies)
      println(s"[synth] $t -> $n rows")
    }
    spark.stop()
  }
}
