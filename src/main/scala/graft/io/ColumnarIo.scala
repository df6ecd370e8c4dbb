package graft.io

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Columnar interchange beyond the parquet default: ORC source + sink
  * (built into Spark — `orc-core` ships with the distribution; no new
  * dependency). The reference ingests through warehouse stages
  * (SURVEY §2.1 S3/S4); a lake engine additionally has to EXCHANGE columnar
  * data with Hive/Trino estates whose canonical format is ORC, so the
  * format is a first-class source/sink here, not an afterthought.
  *
  * Scale notes: hive-style `partitionBy` gives directory-level partition
  * pruning, and ORC stripes carry their own min/max statistics, so the
  * parquet file-skipping story (PushedFilters reaching the scan) holds
  * unchanged — both are spec-pinned in `IngestSpec`. zstd compression is
  * the ratio/speed default for cold interchange data.
  *
  * `io/Materializer` already writes ORC tables (`Table(format = "orc")`,
  * ScaleSpec); this module is the interchange seam — partitioned layout +
  * read-side pruning — and carries the format's oracle gate
  * (`io_orc_roundtrip`).
  */
object ColumnarIo {

  def writeOrc(df: DataFrame, path: String, partitionBy: Seq[String] = Nil): Unit = {
    val w = df.write.mode("overwrite").option("compression", "zstd")
    (if (partitionBy.nonEmpty) w.partitionBy(partitionBy: _*) else w).orc(path)
  }

  def readOrc(spark: SparkSession, path: String): DataFrame =
    spark.read.orc(path)

  /** JSONL (one JSON object per line) sink/source — the delivery format
    * training-data loaders and tokenizer pipelines actually consume, and
    * the lingua franca for corpus interchange between engines. Written as
    * gzip text (`to_json` over the full row struct — Spark's JSON writer
    * escapes control characters, quotes, and non-BMP text losslessly);
    * read back under an EXPLICIT schema so types don't degrade to
    * inference. Both directions are flat per-row projections — no shuffle.
    */
  def writeJsonl(df: DataFrame, path: String): Unit =
    df.select(to_json(struct(df.columns.map(col).toIndexedSeq: _*)).as("value"))
      .write.mode("overwrite").option("compression", "gzip").text(path)

  def readJsonl(spark: SparkSession, path: String,
                schema: org.apache.spark.sql.types.StructType): DataFrame =
    spark.read.schema(schema).json(path)

  private def orcDirFor(dir: String): String =
    graft.Tuning.scratchDirFor("graft-orc", dir)

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // parquet → partitioned zstd ORC → read back under a predicate. The
    // oracle runs the same predicate against the ORIGINAL parquet table, so
    // any value damaged in the format round trip (double bits, partition
    // column stringification, dropped rows) breaks the hash. Doubles are
    // bit-exact through ORC, so the float predicate selects the same set in
    // both engines.
    "io_orc_roundtrip" -> ((s, dir) => {
      val scratch = orcDirFor(dir)
      writeOrc(
        graft.Tables(s, dir, "orders")
          .select(col("o_orderkey"), col("o_custkey"), col("o_orderstatus"),
            col("o_totalprice"), col("o_orderpriority")),
        scratch, partitionBy = Seq("o_orderstatus"))
      readOrc(s, scratch)
        .filter(col("o_totalprice") > 150000.0)
        .select(col("o_orderkey"), col("o_custkey"), col("o_orderstatus"),
          col("o_totalprice"), col("o_orderpriority"))
    }),
    // corpus → gzip JSONL → read back under the declared schema. The oracle
    // compares the re-imported rows against the ORIGINAL table, so any
    // escaping asymmetry (quotes, newlines, unicode in document text) or
    // type degradation through the text format breaks the hash — the
    // losslessness a training-data export has to guarantee.
    "io_jsonl_roundtrip" -> ((s, dir) => {
      import org.apache.spark.sql.types._
      val scratch = s"${orcDirFor(dir)}-jsonl"
      val docs = graft.Tables(s, dir, "documents")
        .select(col("doc_id"), col("lang"), col("source"), col("n_chars"),
          col("text"))
      writeJsonl(docs, scratch)
      val schema = StructType(Seq(
        StructField("doc_id", LongType), StructField("lang", StringType),
        StructField("source", StringType), StructField("n_chars", LongType),
        StructField("text", StringType)))
      readJsonl(s, scratch, schema)
    })
  )

  def oracles: Map[String, String] = Map(
    "io_orc_roundtrip" ->
      """SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice,
        |  o_orderpriority
        |FROM orders WHERE o_totalprice > 150000.0""".stripMargin,
    "io_jsonl_roundtrip" ->
      "SELECT doc_id, lang, source, n_chars, text FROM documents"
  )
}
