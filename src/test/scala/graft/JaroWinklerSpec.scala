package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.JaroWinkler
import graft.functions.JaroWinkler.jaroWinkler

/** Jaro-Winkler native expression: textbook values, DuckDB bit-parity on a
  * 316-pair generated fixture (`jaro_winkler_fixture.csv`, values from
  * `jaro_winkler_similarity` verbatim via `repr`), null/codegen behavior,
  * and SQL registration.
  */
class JaroWinklerSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("textbook values and conventions match DuckDB semantics") {
    val k = JaroWinkler.similarity _
    assert(k("martha", "marhta") === 0.9611111111111111)
    assert(k("dixon", "dicksonx") === 0.8133333333333332)
    assert(k("duane", "dwayne") === 0.8400000000000001)
    assert(k("CRATE", "TRACE") === 0.7333333333333334)
    // boost threshold: jaro 0.5 with common prefix 2 stays unboosted
    assert(k("abcdefgh", "abzzzzzz") === 0.5)
    // prefix cap 4: jaro 0.9333…, boost 4 * 0.1 * (1 - jaro)
    assert(k("aaaaaaaaaa", "aaaaaaaaab") === 0.96)
    // empty-string convention (DuckDB): similarity with an empty side is 0
    assert(k("", "") === 0.0)
    assert(k("a", "") === 0.0)
    assert(k("", "a") === 0.0)
    assert(k("a", "a") === 1.0)
    // window 0 at length 2: a cross-position "match" doesn't count
    assert(k("ab", "ba") === 0.0)
  }

  test("bit-level parity with DuckDB on the generated fixture") {
    val in = getClass.getResourceAsStream("/jaro_winkler_fixture.csv")
    val lines = scala.io.Source.fromInputStream(in, "UTF-8").getLines().toList
    assert(lines.head === "a,b,jw,jaro")
    var n = 0
    lines.tail.foreach { line =>
      // fields contain no quotes/commas by construction (alphabet a-h + space)
      val parts = line.split(",", -1)
      assert(parts.length === 4, line)
      val got = JaroWinkler.similarity(parts(0), parts(1))
      assert(got === parts(2).toDouble,
        s"a='${parts(0)}' b='${parts(1)}' duckdb=${parts(2)} got=$got")
      n += 1
    }
    assert(n === 316)
  }

  test("expression: null-safe, codegen path, SQL registration") {
    graft.functions.GraftFunctions.register(spark)
    val df = Seq(
      (Some("martha"), Some("marhta")),
      (None: Option[String], Some("x")),
      (Some("x"), None: Option[String])
    ).toDF("a", "b")
    val viaColumn = df.select(jaroWinkler(col("a"), col("b")).as("jw"))
      .collect().map(r => if (r.isNullAt(0)) null else r.getDouble(0))
    assert(viaColumn(0) === 0.9611111111111111)
    assert(viaColumn(1) === null && viaColumn(2) === null)
    val viaSql = df.selectExpr("jaro_winkler(a, b) AS jw")
      .collect().map(r => if (r.isNullAt(0)) null else r.getDouble(0))
    assert(viaSql.toSeq === viaColumn.toSeq)
    // wrong arity is an analysis-time error naming the function
    val e = intercept[Exception](df.selectExpr("jaro_winkler(a)").collect())
    assert(e.getMessage.contains("jaro_winkler"))
    // type mismatch is an analysis error, not a runtime cast failure
    val e2 = intercept[Exception](
      Seq((1, 2)).toDF("a", "b").selectExpr("jaro_winkler(a, b)").collect())
    assert(e2.getMessage.toLowerCase.contains("jaro_winkler") ||
      e2.getMessage.toLowerCase.contains("string"))
  }
}
