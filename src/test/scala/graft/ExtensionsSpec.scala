package graft

import org.apache.spark.sql.functions._
import graft.functions.{Similarity, TextFunctions}

/** The SQL function registry wiring (plans.GraftExtensions) must make
  * the native expressions reachable from plain spark.sql and agree with
  * the Column API.
  */
class ExtensionsSpec extends SparkSpec {

  test("dot_product callable from SQL, equals Column API") {
    val r = df(
      """SELECT dot_product(array(CAST(1 AS FLOAT), CAST(2 AS FLOAT)),
        |                   array(CAST(3 AS FLOAT), CAST(4 AS FLOAT))) AS d""".stripMargin)
      .head()
    assert(r.getDouble(0) == 11.0)
  }

  test("shingle_hashes from SQL equals xxhash64 of the string shingles") {
    val viaSql = df("SELECT shingle_hashes('a b c d', 2) AS h")
      .select(explode(col("h")).as("h"))
    val viaStrings = df("SELECT 'a b c d' AS t")
      .select(explode(TextFunctions.shingles(col("t"), 2)).as("s"))
      .select(xxhash64(col("s")).as("h"))
    assert(rows(viaSql) == rows(viaStrings))
  }

  test("char_window_hashes from SQL equals xxhash64 of the raw windows") {
    val viaSql = df("SELECT char_window_hashes('abcdefgh', 4) AS h")
      .select(explode(col("h")).as("h"))
    val viaStrings = df("""SELECT explode(transform(sequence(1, 5),
                          |  i -> substring('abcdefgh', i, 4))) AS w""".stripMargin)
      .select(xxhash64(col("w")).as("h")).distinct()
    assert(rows(viaSql) == rows(viaStrings))
  }

  test("hyperplane_buckets from SQL equals the Column API") {
    val d = df("""SELECT transform(sequence(0, 15), j ->
                 |  CAST(sin(j) AS FLOAT)) AS v""".stripMargin)
    val sql = d.selectExpr("hyperplane_buckets(v, 3, 5, 16) AS b").head().getSeq[Long](0)
    val api = d.select(Similarity.hyperplaneBuckets(col("v"), 3, 5, 16).as("b"))
      .head().getSeq[Long](0)
    assert(sql == api)
  }

  test("minhash_signature aggregate from SQL") {
    val sig = df("SELECT * FROM VALUES (1L), (2L), (3L) t(h)")
      .selectExpr("minhash_signature(h, 8) AS sig").head().getSeq[Long](0)
    assert(sig.length == 8)
    // each signature slot is the min of the re-mixed hashes — stable
    val again = df("SELECT * FROM VALUES (3L), (1L), (2L) t(h)")
      .selectExpr("minhash_signature(h, 8) AS sig").head().getSeq[Long](0)
    assert(sig == again, "order-insensitive aggregate")
  }

  test("optimizer rewrites the HOF dot-product fold to the native kernel") {
    val d = df(
      """SELECT transform(sequence(0, 63), j -> CAST(sin(id * 7 + j) AS FLOAT)) AS a,
        |       transform(sequence(0, 63), j -> CAST(cos(id * 3 + j) AS FLOAT)) AS b
        |FROM range(50) t(id)""".stripMargin)
    val hof = d.select(Similarity.dotHof(col("a"), col("b")).as("dp"))
    assert(hof.queryExecution.optimizedPlan.toString.contains("dot_product"),
      s"rewrite did not fire:\n${hof.queryExecution.optimizedPlan}")
    // same results as calling the native kernel directly
    val native = d.select(graft.plans.DotProduct(col("a"), col("b")).as("dp"))
    assert(rows(hof) == rows(native))
    // SQL spelling rewrites too
    val sql = d.selectExpr(
      """aggregate(zip_with(a, b, (x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)),
        |          CAST(0 AS DOUBLE), (acc, v) -> acc + v) AS dp""".stripMargin)
    assert(sql.queryExecution.optimizedPlan.toString.contains("dot_product"))
    assert(rows(sql) == rows(native))
    // a fold that is NOT a dot product is left alone
    val sum = d.selectExpr(
      "aggregate(zip_with(a, b, (x, y) -> CAST(x AS DOUBLE) + CAST(y AS DOUBLE)), CAST(0 AS DOUBLE), (acc, v) -> acc + v) AS s")
    assert(!sum.queryExecution.optimizedPlan.toString.contains("dot_product"))
  }

  test("non-literal size argument is rejected") {
    val e = intercept[Exception] {
      df("SELECT * FROM VALUES (1) t(n)").selectExpr("shingle_hashes('a b', n)").head()
    }
    assert(e.getMessage.contains("integer literal"))
  }
}
