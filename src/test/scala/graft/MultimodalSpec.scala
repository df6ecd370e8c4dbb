package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Multimodal

class MultimodalSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private lazy val media = Multimodal.asMediaTable(
    Seq((1L, "hello world"), (2L, "a much longer document body with more bytes"))
      .toDF("doc_id", "text"))

  test("media table: binary payload + typed metadata") {
    val r = media.select(col("media_id"), col("meta.n_bytes"), col("meta.format"))
      .collect().map(x => x.getLong(0) -> (x.getLong(1), x.getString(2))).toMap
    assert(r(1L) === ((11L, "text/plain")))
    assert(media.schema("payload").dataType.typeName === "binary")
  }

  test("decode stub: deterministic dims + pixel vector, schema stable") {
    def snap = Multimodal.decodeStub(media).orderBy("media_id")
      .select("media_id", "width", "height", "pixels").collect().map(_.toString)
    assert(snap === snap) // deterministic across runs
    val row = Multimodal.decodeStub(media).orderBy("media_id").head
    assert(row.getAs[Int]("width") >= 1 && row.getAs[Int]("height") >= 1)
    val px = row.getAs[scala.collection.Seq[Double]]("pixels")
    assert(px.size === 8)
    assert(px.forall(p => p >= 0.0 && p <= 1.0))
  }

  test("feature extraction and resize plan") {
    val feats = Multimodal.extractFeatures(Multimodal.decodeStub(media))
    assert(feats.columns.toSeq === Seq("media_id", "aspect_ratio", "mean_pixel"))
    assert(feats.count() === 2)
    val plan = Multimodal.resizePlan(Multimodal.decodeStub(media), maxSide = 8)
      .collect()
    // no output side exceeds the target box
    assert(plan.forall(r => r.getAs[Int]("out_width") <= 8 && r.getAs[Int]("out_height") <= 8))
  }

  test("frame sampling is a distributed cross product") {
    val frames = Multimodal.frameSample(media, nFrames = 3, stride = 5)
    assert(frames.count() === 6)
    assert(frames.filter(col("media_id") === 1L).collect().map(_.getInt(1)).sorted
      === Array(0, 5, 10))
  }
}
