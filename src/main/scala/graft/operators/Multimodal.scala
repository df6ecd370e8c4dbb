package graft.operators

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.catalyst.encoders.RowEncoder
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing: media as opaque `binary` columns with typed
  * metadata structs, plus decode / feature-extract / thumbnail-resize /
  * frame-sample stages.
  *
  * The container has no image/audio codecs, so the pixel-level decode is a
  * clearly marked STUB (a deterministic fake derived from the bytes). What IS
  * real — and what matters at 100 TB — is the Spark-side shape: binary+struct
  * schema, per-partition batched processing via `mapPartitions` (the Scala
  * analog of `mapInPandas`: one iterator per partition, nothing per-row on
  * the driver), column pruning around the opaque payload, and deterministic
  * output schemas a downstream training pipeline can bank on.
  */
object Multimodal {

  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("payload", BinaryType),
    StructField("meta", StructType(Seq(
      StructField("format", StringType),
      StructField("n_bytes", LongType),
      StructField("checksum", StringType))))))

  /** Wrap any text table into a media-shaped table (payload = UTF-8 bytes) —
    * the stand-in corpus for the plumbing tests/benchmarks.
    */
  def asMediaTable(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id").as("media_id"),
      encode(col("text"), "UTF-8").as("payload"),
      struct(
        lit("text/plain").as("format"),
        octet_length(encode(col("text"), "UTF-8")).cast("long").as("n_bytes"),
        md5(encode(col("text"), "UTF-8")).as("checksum")).as("meta"))

  /** STUB decode: a real deployment plugs a codec in here (JNI/javacv/etc.);
    * the fake derives deterministic "dimensions" and a tiny "pixel" vector
    * from the payload bytes so downstream stages are exercised end-to-end.
    * Runs per-partition (batched, executor-side) — the mapInPandas shape.
    */
  def decodeStub(media: DataFrame): DataFrame = {
    val outSchema = StructType(media.schema.fields ++ Seq(
      StructField("width", IntegerType),
      StructField("height", IntegerType),
      StructField("pixels", ArrayType(DoubleType))))
    val enc = RowEncoder.encoderFor(outSchema)
    media.mapPartitions { rows =>
      rows.map { r =>
        val payload = r.getAs[Array[Byte]]("payload")
        // STUB: ??? ← codec goes here. Deterministic fake below.
        val bytes = if (payload == null) Array.emptyByteArray else payload
        val n = bytes.length
        val width = math.max(1, n % 64)
        val height = math.max(1, (n / 64) % 64 + 1)
        // tight primitive loop — this stub is benched, so no boxed foldLeft
        var h = 17L; var bi = 0
        while (bi < n) { h = h * 31 + bytes(bi); bi += 1 }
        val pixels = (0 until 8).map(i => Math.floorMod(h + i, 256L).toDouble / 255.0)
        Row.fromSeq(r.toSeq ++ Seq(width, height, pixels))
      }
    }(enc)
  }

  /** Feature extraction over decoded media — pure column math on the decoded
    * shape (codegen'd), e.g. aspect ratio + mean "pixel".
    */
  def extractFeatures(decoded: DataFrame): DataFrame =
    decoded.select(
      col("media_id"),
      round(col("width").cast("double") / col("height"), 4).as("aspect_ratio"),
      round(aggregate(col("pixels"), lit(0.0), _ + _) / size(col("pixels")), 4)
        .as("mean_pixel"))

  /** Thumbnail plan: target box while preserving aspect — arithmetic only,
    * the actual resample lives in the decode stub's seam.
    */
  def resizePlan(decoded: DataFrame, maxSide: Int): DataFrame =
    decoded.withColumn("scale",
        least(lit(1.0), lit(maxSide) / greatest(col("width"), col("height")).cast("double")))
      .select(col("media_id"), col("width"), col("height"),
        ceil(col("width") * col("scale")).cast("int").as("out_width"),
        ceil(col("height") * col("scale")).cast("int").as("out_height"))

  /** Frame sampling for video-shaped media: every k-th index up to n frames —
    * `sequence` + `explode`, fully distributed.
    */
  def frameSample(media: DataFrame, nFrames: Int, stride: Int): DataFrame =
    media.select(col("media_id"),
        explode(sequence(lit(0), lit((nFrames - 1) * stride), lit(stride))).as("frame_idx"))

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // binary payload + metadata struct (oracle checks n_bytes/checksum)
    "mm_media_metadata" -> ((s, dir) => {
      asMediaTable(graft.Tables(s, dir, "documents"))
        .select(col("media_id"), col("meta.format").as("format"),
          col("meta.n_bytes").as("n_bytes"), col("meta.checksum").as("checksum"))
    }),
    // decode(STUB) → feature extraction, per-partition batched (rows-only)
    "mm_decode_features" -> ((s, dir) => {
      extractFeatures(decodeStub(asMediaTable(graft.Tables(s, dir, "documents"))))
    }),
    // resize planning on decoded dimensions (oracle-gated: the stub's
    // width/height are pure arithmetic over octet_length(text))
    "mm_resize_plan" -> ((s, dir) => {
      resizePlan(decodeStub(asMediaTable(graft.Tables(s, dir, "documents"))), maxSide = 32)
    }),
    // frame sampling plumbing (oracle: pure arithmetic cross product)
    "mm_frame_sample" -> ((s, dir) => {
      frameSample(asMediaTable(graft.Tables(s, dir, "documents")), nFrames = 4, stride = 10)
    })
  )

  def oracles: Map[String, String] = Map(
    "mm_media_metadata" ->
      """SELECT doc_id AS media_id, 'text/plain' AS format,
        |  CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
        |  MD5(text) AS checksum
        |FROM documents""".stripMargin,
    "mm_frame_sample" ->
      """SELECT doc_id AS media_id, CAST(f AS INT) AS frame_idx
        |FROM documents, (SELECT unnest([0, 10, 20, 30]) AS f)""".stripMargin,
    // replicates decodeStub's width/height arithmetic + resizePlan's scaling
    "mm_resize_plan" ->
      """WITH wh AS (
        |  SELECT doc_id AS media_id,
        |    GREATEST(1, octet_length(encode(text)) % 64) AS width,
        |    GREATEST(1, (octet_length(encode(text)) // 64) % 64 + 1) AS height
        |  FROM documents)
        |SELECT media_id, CAST(width AS INT) AS width, CAST(height AS INT) AS height,
        |  CAST(CEIL(width * LEAST(CAST(1.0 AS DOUBLE), CAST(32.0 AS DOUBLE) / GREATEST(width, height))) AS INT) AS out_width,
        |  CAST(CEIL(height * LEAST(CAST(1.0 AS DOUBLE), CAST(32.0 AS DOUBLE) / GREATEST(width, height))) AS INT) AS out_height
        |FROM wh""".stripMargin
  )
}
