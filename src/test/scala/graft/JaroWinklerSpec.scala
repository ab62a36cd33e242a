package graft

import org.apache.spark.sql.functions._
import graft.plans.JaroWinkler

/** Pins for the native Jaro-Winkler expression: the textbook value
  * table, the 0.7 boost threshold, the 4-char prefix cap, edge cases,
  * and whole-stage-codegen participation (j30's oracle pins the
  * cross-engine equality on real data).
  */
class JaroWinklerSpec extends SparkSpec {

  private def jw(a: String, b: String): Double =
    df(s"SELECT '$a' AS a, '$b' AS b")
      .select(JaroWinkler(col("a"), col("b"))).head().getDouble(0)

  test("textbook pairs") {
    assert(math.abs(jw("martha", "marhta") - 0.9611111111111111) < 1e-15)
    assert(math.abs(jw("dixon", "dicksonx") - 0.8133333333333332) < 1e-15)
    assert(math.abs(jw("dwayne", "duane") - 0.8400000000000001) < 1e-15)
    assert(jw("abc", "abc") == 1.0)
    assert(jw("crate", "trace") == 0.7333333333333334) // no shared prefix
  }

  test("edges: empty strings, no matches, window-0 transposition") {
    assert(jw("", "abc") == 0.0 && jw("a", "") == 0.0)
    assert(jw("xyz", "abc") == 0.0)
    assert(jw("ab", "ba") == 0.0) // window 0: adjacent swap never matches
  }

  test("boost threshold 0.7: shared prefix does NOT boost a low jaro") {
    // jaro("aaxxxxxx","aayyyyyy"): m=2, t=0 -> (2/8+2/8+1)/3 = 0.5 <= 0.7
    assert(jw("aaxxxxxx", "aayyyyyy") == 0.5)
  }

  test("prefix boost caps at 4 characters") {
    val a = "abcdefgh"; val b = "abcdexyz"
    // jaro: m=5, t=0 -> (5/8+5/8+1)/3; prefix is 5 but cap is 4
    val jaro = (5.0 / 8 + 5.0 / 8 + 1.0) / 3
    assert(math.abs(jw(a, b) - (jaro + 4 * 0.1 * (1 - jaro))) < 1e-15)
  }

  test("nulls propagate; expression participates in codegen") {
    val out = df("SELECT CAST(NULL AS STRING) AS a, 'x' AS b")
      .select(JaroWinkler(col("a"), col("b")).as("s"))
    assert(out.head().isNullAt(0))
    val plan = df("SELECT 'aa' AS a, 'ab' AS b")
      .select(JaroWinkler(col("a"), col("b")))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CodegenFallback"), plan)
  }

  test("non-BMP input follows DuckDB's UTF-8 BYTE semantics") {
    // measured against DuckDB: jaro_winkler_similarity is byte-based —
    // the emoji pair scores 0.9067 under the byte model (code points
    // would give 0.6667, UTF-16 units 0.8); validated 0/2000 mismatches
    // on random pairs over {a-d, é, ß, 日, 😀, ü}
    assert(math.abs(jw("😀a", "😁a")
      - 0.9066666666666667) < 1e-12)
  }

  test("analysis-time type error for non-string SQL arguments") {
    val e = intercept[org.apache.spark.sql.AnalysisException] {
      spark.sql("SELECT jaro_winkler(1, 2)").collect()
    }
    assert(e.getMessage.contains("jaro_winkler requires (STRING, STRING)")
      || e.getMessage.contains("DATATYPE_MISMATCH"), e.getMessage)
  }

  test("SQL registration: jaro_winkler callable from spark.sql") {
    assert(spark.sql("SELECT jaro_winkler('martha', 'marhta') AS s")
      .head().getDouble(0) > 0.96)
  }
}
