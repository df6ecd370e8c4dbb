package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.UnicodeFold
import graft.functions.UnicodeFold.unicodeFold

/** UnicodeFold native expression: parity with DuckDB's
  * `lower(strip_accents(nfc_normalize(x)))` on a 142-case generated fixture
  * (`unicode_fold_fixture.jsonl`, 69 cases containing DECOMPOSED combining
  * marks), the ASCII fast path, null/codegen/SQL behavior, and the
  * fold-dedup operator's group semantics.
  */
class UnicodeFoldSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("fold parity with DuckDB recipe on the generated fixture") {
    val in = getClass.getResourceAsStream("/unicode_fold_fixture.jsonl")
    val lines = scala.io.Source.fromInputStream(in, "UTF-8").getLines().toList
    assert(lines.size === 142)
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    var decomposedSeen = 0
    lines.foreach { line =>
      val node = mapper.readTree(line)
      val raw = node.get("in").asText()
      val expected = node.get("fold").asText()
      if (raw.exists(c => Character.getType(c) == Character.NON_SPACING_MARK))
        decomposedSeen += 1
      assert(UnicodeFold.fold(raw) === expected, s"input=${raw.map(_.toInt)}")
    }
    assert(decomposedSeen === 69)
  }

  test("ascii fast path is identical to the full pipeline") {
    val cases = Seq("plain", "MIXED Case", "", "  spaces  ", "123 abc XYZ")
    cases.foreach { s =>
      val viaNormalizer = java.text.Normalizer
        .normalize(s, java.text.Normalizer.Form.NFD)
        .toLowerCase(java.util.Locale.ROOT)
      assert(UnicodeFold.fold(s) === viaNormalizer)
    }
    // all-lower ascii returns the input reference (no copy)
    val s = "already lower"
    assert(UnicodeFold.fold(s) eq s)
  }

  test("expression: null-safe, codegen, SQL registration") {
    graft.functions.GraftFunctions.register(spark)
    val df = Seq(Some("CAFÉ"), Some("café"), None).toDF("t")
    val got = df.select(unicodeFold(col("t")).as("f"))
      .collect().map(r => if (r.isNullAt(0)) null else r.getString(0))
    assert(got(0) === "cafe" && got(1) === "cafe" && got(2) === null)
    val viaSql = df.selectExpr("unicode_fold(t) AS f")
      .collect().map(r => if (r.isNullAt(0)) null else r.getString(0))
    assert(viaSql.toSeq === got.toSeq)
    val e = intercept[Exception](
      Seq(1).toDF("t").selectExpr("unicode_fold(t)").collect())
    assert(e.getMessage.toLowerCase.contains("unicode_fold") ||
      e.getMessage.toLowerCase.contains("string"))
  }

  test("unicodeFoldGroups merges fold-equal raw-distinct docs only") {
    val d = Seq(
      (1L, "café table"),        // composed é
      (2L, "cafe\u0301 table"),      // decomposed é — same fold as 1
      (3L, "CAFE table"),             // case variant — same fold as 1
      (4L, "unique text"),
      (5L, "unique text"),            // byte-exact dup of 4: excluded (1 raw form)
      (6L, "other doc")
    ).toDF("doc_id", "text")
    val got = graft.operators.Dedup.unicodeFoldGroups(d, "doc_id", "text")
      .collect()
    assert(got.length === 1)
    val r = got.head
    assert(r.getAs[Long]("keep_id") === 1L)
    assert(r.getAs[Long]("n_docs") === 3L)
    assert(r.getAs[Long]("n_raw_forms") === 3L)
  }
}
