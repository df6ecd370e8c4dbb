package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Calibration main for the approximate ANN/bitext tiers: measures the
  * MEASURED recall/agreement of each tier at its auto-sized geometry
  * against the exact baselines, so the geometry-derived gate floors
  * (`min(cap, nProbe/cells)` — see [[graft.operators.Similarity.autoNProbe]])
  * can be checked for real headroom instead of asserted. Run per data dir:
  *
  *   SPARK_GRAFT_SF_DIR=/root/testdata/sf0.01 sbt "runMain graft.Calibrate"
  *
  * Prints one JSON line: geometry, per-tier measured recall@10, bitext
  * argmax agreement, and the derived floors the battery gates will use.
  * This is a diagnostic, not a gate — the gates themselves live in
  * `annRecallInvariants` / `ivfLifecycleInvariants` / `bitextIvfInvariants`.
  */
object Calibrate {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-calibrate")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import graft.operators.Similarity

    val e = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val n = e.count()
    val dim = graft.Tables.EmbeddingDim
    val cells = Similarity.autoCells(n)
    val nProbe = Similarity.autoNProbe(cells)
    val k = 10

    def pairs(d: DataFrame): Set[(Long, Long)] =
      d.select(col("q_id"), col("neighbor_id")).collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
    val brute = pairs(Similarity.bruteForceTopK(e, k, dim = Some(dim)))
    def recall(d: DataFrame): Double =
      pairs(d).intersect(brute).size.toDouble / brute.size

    val rIvf = recall(Similarity.ivfTopKKMeans(e, k, iters = 3))
    val rIvfQ = recall(Similarity.ivfQuantizedTopK(e, k, iters = 3))
    val rPq = recall(Similarity.pqTopK(e, k))
    val rPq256 = recall(Similarity.pqTopK(e, k, m = 8, ks = 256))
    val rIvfPq = recall(Similarity.ivfPqTopK(e, k))

    val exact = Similarity.marginBitextPairs(e, k = 4, Some(dim))
      .select(col("q_id"), col("tgt_id")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val approx = Similarity.marginBitextPairsIvf(e, k = 4)
      .select(col("q_id"), col("tgt_id")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val agree = exact.count { case (q, t) => approx.get(q).contains(t) }
      .toDouble / math.max(exact.size, 1)
    val nTgt = e.filter(col("vec_id") % 2 === 1).count()
    val bCells = Similarity.autoCells(nTgt)
    val bProbe = Similarity.autoNProbe(bCells)

    println(
      s"""{"sf_dir":"$sfDir","n":$n,"cells":$cells,"nProbe":$nProbe,""" +
      s""""fraction":${nProbe.toDouble / cells},""" +
      s""""recall_ivf":$rIvf,"recall_ivf_quantized":$rIvfQ,""" +
      s""""recall_pq_16x32":$rPq,"recall_pq_8x256":$rPq256,""" +
      s""""recall_ivfpq":$rIvfPq,""" +
      s""""floor_ivfpq":${math.min(0.7, nProbe.toDouble / cells)},""" +
      s""""floor_ivf":${math.min(0.5, nProbe.toDouble / cells)},""" +
      s""""floor_ivf_quantized":${math.min(0.9, nProbe.toDouble / cells)},""" +
      s""""bitext_cells":$bCells,"bitext_nProbe":$bProbe,""" +
      s""""bitext_agreement":$agree,""" +
      s""""bitext_floor":${math.min(0.85, bProbe.toDouble / bCells)}}""")
    spark.stop()
  }
}
