package graft

import com.fasterxml.jackson.databind.ObjectMapper
import org.scalatest.funsuite.AnyFunSuite

/** Pins the bench-record failure contract: a query that throws must surface
  * in the JSON line's `errors` map and must NOT appear among `queries`
  * timings — round 7 recorded six analysis-broken entries as 0.06–0.10 s
  * "improvements" because elapsed-to-fail was recorded as a score.
  */
class BenchSpec extends AnyFunSuite {
  private val mapper = new ObjectMapper()

  test("a failed entry is an error record, never a timing") {
    val line = Bench.renderJson(Seq(
      "good_query" -> Right(Bench.EntryTiming(2.5, 1.234,
        Some(Map("shuffle_bytes" -> 1024L, "spill_bytes" -> 0L)))),
      "broken_query" -> Left("org.apache.spark.sql.AnalysisException: " +
        "[DATATYPE_MISMATCH.BINARY_OP_DIFF_TYPES] \"ts\" has\nmixed types")),
      "/root/testdata/sf0.1")
    val node = mapper.readTree(line) // must be valid JSON despite \n and quotes in the message
    assert(node.get("queries").has("good_query"))
    assert(!node.get("queries").has("broken_query"))
    assert(node.get("errors").has("broken_query"))
    assert(node.get("errors").get("broken_query").asText.contains("DATATYPE_MISMATCH"))
    assert(node.get("error_count").asInt === 1)
    // queries = warm minimum; the first (cold) sample rides separately
    assert(math.abs(node.get("value").asDouble - 1.234) < 1e-9)
    assert(math.abs(node.get("cold").get("good_query").asDouble - 2.5) < 1e-9)
    assert(!node.get("cold").has("broken_query"))
    // the data-volume record rides along; a failed entry never has one
    assert(node.get("metrics").get("good_query").get("shuffle_bytes").asLong === 1024L)
    assert(!node.get("metrics").has("broken_query"))
  }

  test("a clean run has an empty errors map and zero error_count") {
    val line = Bench.renderJson(
      Seq("a" -> Right(Bench.EntryTiming(0.5, 0.5, None)),
        "b" -> Right(Bench.EntryTiming(0.25, 0.25, None))), "sf")
    val node = mapper.readTree(line)
    assert(node.get("errors").size === 0)
    assert(node.get("error_count").asInt === 0)
    assert(math.abs(node.get("value").asDouble - 0.75) < 1e-9)
    assert(node.get("queries").size === 2)
    // capture-less entries (listener raced out) are omitted, not zeroed
    assert(node.get("metrics").size === 0)
  }
}
