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

  test("real PNG round trip: decoded dims and channel means match " +
    "hand-computed values") {
    // id=1: w=2, h=1, left column tone (3,7,13), right (5,11,17)
    //   → sums (8,18,30) over n=2 pixels
    // id=20: w=5, h=2, wA=2; tones (60,140,4) and (100,220,84)
    //   → sums (840,1880,520) over n=10
    val ids = Seq(1L, 20L).toDF("media_id")
    val got = Multimodal.decodeImage(Multimodal.synthPngTable(ids))
      .collect().map(r => r.getLong(0) ->
        ((r.getInt(1), r.getInt(2)),
          r.getAs[scala.collection.Seq[Double]]("pixels"))).toMap
    assert(got(1L)._1 === ((2, 1)))
    assert(got(1L)._2 === Seq(8.0 / 2 / 255, 18.0 / 2 / 255, 30.0 / 2 / 255))
    assert(got(20L)._1 === ((5, 2)))
    assert(got(20L)._2 ===
      Seq(840.0 / 10 / 255, 1880.0 / 10 / 255, 520.0 / 10 / 255))
    // and the payload really is a PNG container, not a fake
    val magic = Multimodal.synthPngTable(ids)
      .select(col("payload"), col("meta.format")).head
    assert(magic.getAs[Array[Byte]](0).take(4).toSeq
      === Seq(0x89.toByte, 'P'.toByte, 'N'.toByte, 'G'.toByte))
    assert(magic.getString(1) === "image/png")
  }

  test("image decode is lenient: undecodable payloads yield null features") {
    val bad = Seq((7L, "definitely not a png".getBytes("UTF-8")))
      .toDF("media_id", "payload")
    val r = Multimodal.decodeImage(bad).head
    assert(r.getLong(0) === 7L)
    assert(r.isNullAt(1) && r.isNullAt(2) && r.isNullAt(3))
  }

  test("frame sampling is a distributed cross product") {
    val frames = Multimodal.frameSample(media, nFrames = 3, stride = 5)
    assert(frames.count() === 6)
    assert(frames.filter(col("media_id") === 1L).collect().map(_.getInt(1)).sorted
      === Array(0, 5, 10))
  }

  test("real WAV round trip: decoded format and integer features match the id formula") {
    import graft.operators.Multimodal
    val ids = Seq(3L, 17L, 42L).toDF("media_id")
    val out = Multimodal.decodeAudio(Multimodal.synthWavTable(ids))
      .orderBy("media_id").collect()
    for (row <- out) {
      val id = row.getLong(0)
      val n = (400 + (id % 5) * 80).toInt
      val samples = (0 until n).map(j => ((id * 31 + j.toLong * 7) % 2001) - 1000)
      assert(row.getLong(1) === 8000L, "sample_rate")
      assert(row.getLong(2) === 1L, "n_channels")
      assert(row.getLong(3) === n.toLong, "n_samples")
      assert(row.getLong(4) === samples.sum, s"sum_samples for id=$id")
      assert(row.getLong(5) === samples.map(math.abs).max, s"peak_abs for id=$id")
    }
  }

  test("audio decode is lenient: undecodable payloads yield null features") {
    import graft.operators.Multimodal
    val junk = Seq(
      (1L, "not a wav at all".getBytes("UTF-8")),
      (2L, null.asInstanceOf[Array[Byte]])
    ).toDF("media_id", "payload")
    val out = Multimodal.decodeAudio(junk).orderBy("media_id").collect()
    assert(out.length === 2)
    out.foreach { r =>
      (1 to 5).foreach(i => assert(r.isNullAt(i), s"col $i should be null"))
    }
  }
}
