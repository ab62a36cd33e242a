package graft

import org.apache.spark.sql.functions._
import graft.functions.Geo
import graft.plans.PointInPolygonExpression

class PointInPolygonExprSpec extends SparkSpec {

  private val polys = Seq(
    Geo.Poly(1, Array(0, 1, 1, 0), Array(0, 0, 1, 1)),
    Geo.Poly(2, Array(2, 3, 3, 2), Array(0, 0, 1, 1)))

  private def pts = df(
    """SELECT CAST(x AS DOUBLE) AS x, CAST(y AS DOUBLE) AS y FROM VALUES
      |  (0.5, 0.5), (2.5, 0.5), (5.0, 5.0), (CAST(NULL AS DOUBLE), 0.5)
      |  t(x, y)""".stripMargin)

  test("codegen expression matches interpreted eval and UDF variant") {
    val out = pts.withColumn("cell",
      PointInPolygonExpression(col("x"), col("y"), polys))
    assert(rows(out.select("x", "cell")) == Set(
      Seq(0.5, 1), Seq(2.5, 2), Seq(5.0, null), Seq(null, null)))
    // same answers as the UDF path (no buffer)
    val viaUdf = pts.withColumn("cell",
      Geo.clusterAssigner(spark, polys, bufferDeg = 0.0)(col("x"), col("y")))
    assert(rows(out) == rows(viaUdf))
  }

  test("expression participates in whole-stage codegen") {
    val src = spark.range(100).select(
      (col("id").cast("double") / 40).as("x"), lit(0.5).as("y"))
    val out = src.withColumn("cell",
      PointInPolygonExpression(col("x"), col("y"), polys))
      .filter(col("cell").isNotNull)
    val plan = out.queryExecution.executedPlan.toString
    // '*(n)' prefixes mark operators fused into a WholeStageCodegen stage
    assert(plan.contains("*(1) Project") && plan.contains("point_in_polygon"),
      s"expected the expression inside a codegen stage:\n$plan")
    assert(!plan.contains("CodegenFallback"), "must not fall back to interpreted eval")
    // x in [0,1] → cell 1 (41 pts incl boundary eval), x in [2,2.475] → cell 2
    assert(out.count() > 0)
  }

  test("generated code actually compiles (no silent interpreter fallback)") {
    // Round-1 regression: doGenCode emitted a call target janino couldn't
    // compile and every eval silently fell back to interpreted mode. Forcing
    // CODEGEN_ONLY + fallback=false makes any compile failure a test failure.
    def run(): Set[Seq[Any]] = {
      val src = spark.range(1000).select(
        (col("id").cast("double") / 400).as("x"), lit(0.5).as("y"))
      rows(src.withColumn("cell",
          PointInPolygonExpression(col("x"), col("y"), polys))
        .groupBy("cell").count())
    }
    val interpreted = run() // default FALLBACK mode
    val prevMode = spark.conf.getOption("spark.sql.codegen.factoryMode")
    val prevFb = spark.conf.getOption("spark.sql.codegen.fallback")
    spark.conf.set("spark.sql.codegen.factoryMode", "CODEGEN_ONLY")
    spark.conf.set("spark.sql.codegen.fallback", "false")
    try {
      assert(run() == interpreted && interpreted.nonEmpty)
    } finally {
      spark.conf.set("spark.sql.codegen.factoryMode", prevMode.getOrElse("FALLBACK"))
      spark.conf.set("spark.sql.codegen.fallback", prevFb.getOrElse("true"))
    }
  }

  test("scales over a larger point set deterministically") {
    val many = spark.range(100000).select(
      ((col("id") % 40).cast("double") / 10).as("x"),
      ((col("id") % 11).cast("double") / 10).as("y"))
    val n1 = many.withColumn("c", PointInPolygonExpression(col("x"), col("y"), polys))
      .groupBy("c").count()
    val n2 = many.repartition(13)
      .withColumn("c", PointInPolygonExpression(col("x"), col("y"), polys))
      .groupBy("c").count()
    assert(rows(n1) == rows(n2))
  }
}
