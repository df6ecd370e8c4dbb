package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir) = args
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    // dev loop: SPARK_GRAFT_ONLY=name,name dumps a subset (same contract as
    // Bench); the driver never sets it, so the gate always dumps everything.
    // Blank values count as unset and an all-typo filter fails loudly — a
    // zero-dump run exiting 0 would read as a green gate downstream.
    val only = sys.env.get("SPARK_GRAFT_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
      .filter(_.nonEmpty)
    val selected = SparkEntry.queries
      .filter { case (name, _) => only.forall(_.contains(name)) }
    require(selected.nonEmpty,
      s"SPARK_GRAFT_ONLY matched no queries: ${only.getOrElse(Set.empty).mkString(",")}")
    // A filter that DOES match is loud too: a SPARK_GRAFT_ONLY value leaked
    // into the gate environment would otherwise narrow the dump to a subset
    // while exiting green, and the gate would score only what ran.
    only.foreach { f =>
      System.err.println(
        s"[verify] *** SPARK_GRAFT_ONLY ACTIVE: dumping ${selected.size}/" +
          s"${SparkEntry.queries.size} queries (${f.toSeq.sorted.mkString(",")}) — " +
          "NOT a full correctness dump ***")
    }
    // Failures are collected, not swallowed: in round 7 six analysis-broken
    // entries silently produced no dump, the driver's correctness file just
    // omitted them, and the coverage loss was invisible until hand-diffed
    // against the previous round. Every failure is recorded and any failure
    // of an ORACLE-GATED query makes the run exit nonzero (after the dump
    // completes, so the partial artifact stays usable for diagnosis).
    val failures = selected.toSeq.flatMap { case (name, fn) =>
      try {
        fn(spark, sfDir).coalesce(1).write.mode("overwrite")
          .parquet(s"$outDir/$name")
        None
      } catch { case e: Throwable =>
        System.err.println(s"[verify] $name FAILED: ${e.getMessage}")
        Some(name -> e.toString)
      }
    }
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    // Battery self-check: every selected query must have dumped, and failures
    // are a durable artifact next to the dump. An oracled entry that failed
    // is a red gate — exit nonzero so silent coverage loss cannot read green.
    val errJson = failures
      .map { case (k, v) => s"${q(k)}: ${q(v.take(500))}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/_verify_errors.json"), errJson)
    spark.stop()
    val oracledFailures = failures.collect {
      case (n, _) if SparkEntry.oracleSql.contains(n) => n
    }
    if (failures.nonEmpty) {
      System.err.println(s"[verify] ${failures.size} quer(ies) FAILED to dump: " +
        failures.map(_._1).sorted.mkString(", "))
      if (oracledFailures.nonEmpty) {
        System.err.println(s"[verify] ${oracledFailures.size} of them are ORACLE-GATED — " +
          "this correctness dump is incomplete; exiting nonzero")
        sys.exit(1)
      }
    }
  }
}
