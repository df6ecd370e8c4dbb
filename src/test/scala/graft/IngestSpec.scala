package graft

import java.io.FileOutputStream
import java.util.zip.{ZipEntry, ZipOutputStream}

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.app.Ingest
import graft.io.TsvReader
import graft.models.JsonModels

/** Ingestion seams: quarter resolution (F14/F16), ZIP extract (S2), and the
  * TSV→JSON document round trip (S7/S8).
  */
class IngestSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("yearQuarter: reference API quarter resolution + validation") {
    assert(Ingest.yearQuarter("2024-08-02") === "2024q3")
    assert(Ingest.yearQuarter("2010-01-01") === "2010q1")
    assert(Ingest.yearQuarter("2023-12-31") === "2023q4")
    intercept[IllegalArgumentException](Ingest.yearQuarter("2024/08/02"))
    intercept[IllegalArgumentException](Ingest.yearQuarter("2008-01-01")) // below range
    intercept[IllegalArgumentException](Ingest.yearQuarter("2025-01-01")) // above range
  }

  test("ZIP extract → TsvReader → models (the S1→S2→S5 flow)") {
    val dir = java.nio.file.Files.createTempDirectory("zip").toString
    val zipPath = s"$dir/2024q3.zip"
    val zos = new ZipOutputStream(new FileOutputStream(zipPath))
    for (n <- Seq("sub", "tag", "num", "pre")) {
      zos.putNextEntry(new ZipEntry(s"$n.txt"))
      zos.write(java.nio.file.Files.readAllBytes(
        java.nio.file.Paths.get(s"${TestSpark.edgarFixtures}/$n.txt")))
      zos.closeEntry()
    }
    zos.write(Array.emptyByteArray); zos.close()
    val extracted = Ingest.extractTxt(zipPath, s"$dir/out")
    assert(extracted.toSet === Set("sub.txt", "tag.txt", "num.txt", "pre.txt"))
    val raw = TsvReader.readAll(spark, s"$dir/out",
      landTo = Some(s"$dir/land"))
    assert(raw("sub").count() === 3)
    assert(raw("num").count() === 8)
  }

  test("S7/S8: all-tables JSON document writes and reads back (VARIANT path)") {
    val raw = TsvReader.readAll(spark, TestSpark.edgarFixtures)
    val doc = JsonModels.secJsonDocument(raw)
    val dir = java.nio.file.Files.createTempDirectory("jsondoc").toString
    doc.write.mode("overwrite").text(dir) // one JSON document per line
    // schema-on-read load (S8): the document parses back with all 4 tables
    val back = spark.read.json(dir)
    assert(back.columns.sorted === Array("num", "pre", "sub", "tag"))
    assert(back.select(size(col("sub"))).head.getInt(0) === 3)
    assert(back.select(size(col("num"))).head.getInt(0) === 8)
    // spot field fidelity through the JSON round trip
    val firstSub = back.select(expr("filter(sub, x -> x.adsh = '0000320193-24-000123')[0].name"))
    assert(firstSub.head.getString(0) === "APPLE INC")
  }

  test("ORC sink/source: schema fidelity, partition pruning, predicate pushdown") {
    import graft.io.ColumnarIo
    val dir = java.nio.file.Files.createTempDirectory("graft-orc-spec").toString
    val orders = graft.Tables(spark, "/root/testdata/sf0.001", "orders")
      .select(col("o_orderkey"), col("o_custkey"), col("o_orderstatus"),
        col("o_totalprice"), col("o_orderpriority"))
    ColumnarIo.writeOrc(orders, dir, partitionBy = Seq("o_orderstatus"))

    // schema round trip: types survive the format change (the partition
    // column comes back as the directory value, still a string)
    val back = ColumnarIo.readOrc(spark, dir)
    val types = back.schema.fields.map(f => f.name -> f.dataType.simpleString).toMap
    assert(types("o_orderkey") === "bigint")
    assert(types("o_totalprice") === "double")
    assert(types("o_orderstatus") === "string")

    // content identity through the round trip
    val cols = orders.columns.map(col).toSeq
    assert(back.select(cols: _*).exceptAll(orders).count() === 0L)
    assert(orders.exceptAll(back.select(cols: _*)).count() === 0L)

    // hive-layout partition pruning: a status predicate scans only that
    // partition's files (inputFiles lists the UNPRUNED relation, so ask the
    // scan node itself which partitions survived planning)
    val pruned = back.filter(col("o_orderstatus") === "F")
    val plan = pruned.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("o_orderstatus"),
      s"no partition filter in:\n$plan")
    val scanned = pruned.queryExecution.executedPlan.collectFirst {
      case s: org.apache.spark.sql.execution.FileSourceScanExec =>
        s.selectedPartitions.toPartitionArray.map(_.urlEncodedPath).toSeq
    }.getOrElse(Seq.empty)
    assert(scanned.nonEmpty && scanned.forall(_.contains("o_orderstatus=F")),
      s"partition pruning did not restrict the scanned files: $scanned")

    // value predicate reaches the ORC scan as a pushed filter (stripe
    // min/max skipping — the same file-skipping story as parquet)
    val filtered = back.filter(col("o_totalprice") > 150000.0)
    val fplan = filtered.queryExecution.executedPlan.toString
    assert(fplan.contains("PushedFilters") && fplan.contains("o_totalprice"),
      s"no pushed filter in:\n$fplan")
    assert(filtered.count() ===
      orders.filter(col("o_totalprice") > 150000.0).count())
  }

  test("JSONL sink/source round-trips hostile text losslessly") {
    import graft.io.ColumnarIo
    import org.apache.spark.sql.types._
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-jsonl-spec").toString
    // the failure modes of a text-format export: embedded newlines (must
    // stay ONE line per row), quotes/backslashes (escaping), non-BMP
    // unicode + control chars, nulls (omitted field → null on read),
    // whitespace-significant text
    val rows = Seq(
      (1L, "line\nbreak and \"quotes\" and \\ backslash"),
      (2L, "unicode: Ωμέγα 漢字 🚀 and a  control char"),
      (3L, null.asInstanceOf[String]),
      (4L, "  \t tabs and significant trailing spaces   ")
    ).toDF("id", "text")
    ColumnarIo.writeJsonl(rows, dir)
    // gzip line files on disk, one line per row despite the embedded \n
    val gz = new java.io.File(dir).listFiles.filter(_.getName.endsWith(".gz"))
    assert(gz.nonEmpty, "JSONL files not gzip-compressed")
    val back = ColumnarIo.readJsonl(spark, dir, StructType(Seq(
      StructField("id", LongType), StructField("text", StringType))))
    assert(back.count() === 4L)
    assert(back.exceptAll(rows).count() === 0L)
    assert(rows.exceptAll(back).count() === 0L)
  }
}
