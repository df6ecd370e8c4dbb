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

  private def orcDirFor(dir: String): String = {
    val tag = dir.replaceAll("[^A-Za-z0-9._-]", "_")
    s"${sys.props("java.io.tmpdir")}/graft-orc/$tag"
  }

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
    })
  )

  def oracles: Map[String, String] = Map(
    "io_orc_roundtrip" ->
      """SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice,
        |  o_orderpriority
        |FROM orders WHERE o_totalprice > 150000.0""".stripMargin
  )
}
