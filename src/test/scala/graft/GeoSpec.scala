package graft

import org.apache.spark.sql.functions._
import graft.functions.Geo

class GeoSpec extends SparkSpec {

  private val unitSquare = Geo.Poly(1, Array(0, 1, 1, 0), Array(0, 0, 1, 1))
  // L-shape: unit square with the top-right quadrant notched out
  private val lShape = Geo.Poly(2,
    Array(0, 1, 1, 0.5, 0.5, 0), Array(0, 0, 0.5, 0.5, 1, 1))

  test("ray casting: convex and concave containment") {
    assert(Geo.contains(unitSquare, 0.5, 0.5))
    assert(!Geo.contains(unitSquare, 1.5, 0.5))
    assert(Geo.contains(lShape, 0.25, 0.75))
    assert(!Geo.contains(lShape, 0.75, 0.75), "notch must be outside")
    assert(Geo.contains(lShape, 0.75, 0.25))
  }

  test("edge distance: interior and exterior points") {
    assert(math.abs(Geo.edgeDistance(unitSquare, 0.5, 0.5) - 0.5) < 1e-12)
    assert(math.abs(Geo.edgeDistance(unitSquare, 2.0, 0.5) - 1.0) < 1e-12)
  }

  test("clusterAssigner: direct hit, buffered fallback, miss, null-safe") {
    val assign = Geo.clusterAssigner(spark, Seq(unitSquare, lShape), bufferDeg = 0.1)
    val d = df(
      """SELECT CAST(x AS DOUBLE) AS x, CAST(y AS DOUBLE) AS y, n FROM VALUES
        |  (0.75, 0.75, 'in-square-not-l'),
        |  (0.75, 1.05, 'buffered'),
        |  (5.0, 5.0, 'miss'),
        |  (CAST(NULL AS DOUBLE), 0.5, 'null')
        |  t(x, y, n)""".stripMargin)
    val got = d.withColumn("c", assign(col("x"), col("y")))
      .select("n", "c").collect().map(r => r.getString(0) -> r.get(1)).toMap
    assert(got("in-square-not-l") == 1)
    assert(got("buffered") == 1)
    assert(got("miss") == null)
    assert(got("null") == null)
  }

  test("haversine: Nairobi to Mombasa ~ 440 km") {
    val d = df("SELECT CAST(36.8219 AS DOUBLE) lon1, CAST(-1.2921 AS DOUBLE) lat1, " +
      "CAST(39.6682 AS DOUBLE) lon2, CAST(-4.0435 AS DOUBLE) lat2")
    val km = d.select(Geo.haversineKm(col("lon1"), col("lat1"), col("lon2"), col("lat2")))
      .head().getDouble(0)
    assert(km > 430 && km < 450, s"got $km")
  }

  test("W4: priority by distance to cluster edge (deepest first)") {
    val assign = Geo.clusterAssigner(spark, Seq(unitSquare), bufferDeg = 0.0)
    val edist = Geo.edgeDistanceUdf(spark, Seq(unitSquare))
    val hh = df(
      """SELECT hhid, CAST(x AS DOUBLE) AS x, CAST(y AS DOUBLE) AS y FROM VALUES
        |  ('h_edge', 0.05, 0.5), ('h_mid', 0.25, 0.5), ('h_center', 0.5, 0.5)
        |  t(hhid, x, y)""".stripMargin)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("cluster").orderBy(col("d").desc, col("hhid"))
    val ranked = hh.withColumn("cluster", assign(col("x"), col("y")))
      .withColumn("d", edist(col("cluster"), col("x"), col("y")))
      .withColumn("priority", row_number().over(w))
    val got = ranked.select("hhid", "priority").collect()
      .map(r => r.getString(0) -> r.getInt(1)).toMap
    assert(got == Map("h_center" -> 1, "h_mid" -> 2, "h_edge" -> 3))
  }

  test("edgeDistanceUdf resolves polygon by id") {
    val edist = Geo.edgeDistanceUdf(spark, Seq(unitSquare, lShape))
    val d = df("SELECT 1 AS id, CAST(0.5 AS DOUBLE) AS x, CAST(0.5 AS DOUBLE) AS y")
    assert(math.abs(d.select(edist(col("id"), col("x"), col("y"))).head().getDouble(0) - 0.5) < 1e-12)
  }
}
