package graft.operators

import org.apache.spark.ml.Pipeline
import org.apache.spark.ml.classification.LogisticRegression
import org.apache.spark.ml.feature.HashingTF
import org.apache.spark.ml.functions.vector_to_array
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Trained quality classifier — the CCNet / GPT-3 curation filter: a linear
  * model taught to distinguish a REFERENCE corpus (Wikipedia-grade text)
  * from crawl, whose score then ranks every crawl document. The reference
  * label is pluggable (`refLabel`). The synthetic corpus draws every lang /
  * source from ONE shared vocabulary, so no metadata column is learnable
  * from text; the battery entry therefore labels by a text-derived register
  * (docs mentioning "customer") — genuinely learnable, so the end-to-end
  * train→score path is exercised with a real held-out accuracy, not a
  * vacuous fit. (On a real corpus the label would be membership in a
  * curated reference set, exactly as in CCNet.)
  *
  * Built for the 100 TB shape end to end:
  *   - features are HashingTF over the shared [[TextAnalysis.tokens]]
  *     tokenization — fixed 2^18-dim sparse vectors, NO vocabulary build,
  *     no corpus-wide dictionary shuffle (the reason CCNet uses fastText's
  *     hashing trick at scale);
  *   - training is MLlib logistic regression (L-BFGS): a handful of
  *     `treeAggregate` passes, each shipping one gradient of feature-dim
  *     size per partition — the corpus itself never shuffles;
  *   - scoring broadcasts the coefficient vector and is one map-side pass.
  *
  * Train/test isolation uses the engine's deterministic md5
  * [[Sampling.hashSplit]] (train on 'train', report on all rows with their
  * split tag), so the held-out metric is reproducible across runs and
  * engines. Iterative L-BFGS is not SQL-expressible → rows-only battery
  * entry; the semantic gate is spec-pinned held-out accuracy on a planted
  * two-register corpus AND on the real corpus' language label.
  */
object QualityClassifier {

  val NumFeatures: Int = 1 << 18

  /** Train on the deterministic 80% split, score every document.
    * Output: (doc_id, split, label, p_ref, prediction).
    */
  def trainScore(d: DataFrame, refLabel: Column,
                 maxIter: Int = 25, regParam: Double = 1e-3): DataFrame = {
    val base = d.filter(col("text").isNotNull)
      .select(col("doc_id"),
        TextAnalysis.tokens(lower(col("text"))).as("toks"),
        refLabel.cast("double").as("label"),
        Sampling.hashSplit(col("doc_id")).as("split"))
    val tf = new HashingTF().setInputCol("toks").setOutputCol("features")
      .setNumFeatures(NumFeatures)
    val lr = new LogisticRegression().setMaxIter(maxIter).setRegParam(regParam)
      .setFeaturesCol("features").setLabelCol("label")
    val model = new Pipeline().setStages(Array(tf, lr))
      .fit(base.filter(col("split") === "train"))
    model.transform(base)
      .select(col("doc_id"), col("split"), col("label"),
        round(vector_to_array(col("probability")).getItem(1), 4).as("p_ref"),
        col("prediction").cast("long").as("prediction"))
  }

  /** Held-out accuracy of [[trainScore]] output on the non-train splits. */
  def heldOutAccuracy(scored: DataFrame): Double = {
    val r = scored.filter(col("split") =!= "train")
      .agg(avg((col("prediction") === col("label").cast("long"))
        .cast("double"))).head()
    if (r.isNullAt(0)) 0.0 else r.getDouble(0)
  }

  private def docs(s: SparkSession, dir: String): DataFrame =
    graft.Tables(s, dir, "documents")

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // trained curation filter scoring every document (rows-only: iterative
    // L-BFGS training is not SQL-expressible; held-out accuracy spec-pinned)
    "curate_quality_clf" -> ((s, dir) =>
      trainScore(docs(s, dir), col("text").contains("customer")))
  )

  def oracles: Map[String, String] = Map.empty
}
