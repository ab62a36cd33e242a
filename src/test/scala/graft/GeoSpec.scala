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

  test("UTM series: geometric invariants and haversine cross-check") {
    // on the central meridian easting is exactly 500000 (A = 0 kills
    // every series term) and symmetric lon offsets mirror around it
    val (e0, n0) = Geo.utmScalar(39.0, -1.0, zone = 37, south = true)
    assert(e0 == 500000.0)
    assert(n0 < 10000000.0 && n0 > 9000000.0, "1°S sits below the equator FN")
    val (eW, nW) = Geo.utmScalar(38.5, -1.0, 37, south = true)
    val (eE, nE) = Geo.utmScalar(39.5, -1.0, 37, south = true)
    assert(math.abs((500000.0 - eW) - (eE - 500000.0)) < 1e-6)
    assert(math.abs(nW - nE) < 1e-6)
    // equator northing = FN exactly
    assert(Geo.utmScalar(39.0, 0.0, 37, south = true)._2 == 10000000.0)
    // metric truth: planar UTM distance vs spherical haversine for a
    // ~15 km pair at 2° from the central meridian. Systematic gaps are
    // bounded and known: grid scale (k0 0.9996 + λ² convergence ≈
    // +0.02% here) and sphere-vs-ellipsoid radius (≤ ~0.3%); 0.5%
    // catches real formula errors (wrong radians, dropped series term
    // ⇒ percent-level+) without asserting the two models agree
    val (e1, n1) = Geo.utmScalar(37.0, -1.0, 37, south = true)
    val (e2, n2) = Geo.utmScalar(37.1, -1.1, 37, south = true)
    val planar = math.hypot(e2 - e1, n2 - n1) / 1000.0
    val hav = rows(df("SELECT 1").select(
      Geo.haversineKm(lit(37.0), lit(-1.0), lit(37.1), lit(-1.1))))
      .head.head.toString.toDouble
    assert(math.abs(planar - hav) / hav < 0.005, s"planar $planar vs haversine $hav")
    // column form == scalar form on the same inputs
    val colVals = rows(df("SELECT CAST(37.05 AS DOUBLE) AS lon, CAST(-2.5 AS DOUBLE) AS lat")
      .select(Geo.utmEasting(col("lon"), col("lat"), 37),
        Geo.utmNorthing(col("lon"), col("lat"), 37, south = true)))
      .head.map(_.toString.toDouble)
    val (es, ns) = Geo.utmScalar(37.05, -2.5, 37, south = true)
    assert(math.abs(colVals(0) - es) < 1e-6 && math.abs(colVals(1) - ns) < 1e-6)
  }

  test("clusterAssignerUtm: metric buffer semantics in true meters") {
    // ~1.1 km square at the equator (0.01° per side), zone 37
    val sq = Geo.Poly(7, Array(37.00, 37.01, 37.01, 37.00),
      Array(-1.00, -1.00, -0.99, -0.99))
    // point ~55 m east of the eastern edge (0.0005° of longitude)
    val d = df("SELECT CAST(37.0105 AS DOUBLE) AS lon, CAST(-0.995 AS DOUBLE) AS lat")
    def assignedWith(buf: Double) = rows(d.select(
      Geo.clusterAssignerUtm(spark, Seq(sq), buf, 37, south = true)(col("lon"), col("lat"))))
      .head.head
    assert(assignedWith(30.0) == null, "55 m out: a 30 m buffer must miss")
    assert(assignedWith(80.0) == 7, "an 80 m buffer must catch it")
    // containment needs no buffer at all
    val in = df("SELECT CAST(37.005 AS DOUBLE) AS lon, CAST(-0.995 AS DOUBLE) AS lat")
    assert(rows(in.select(Geo.clusterAssignerUtm(spark, Seq(sq), 0.0, 37, south = true)(
      col("lon"), col("lat")))).head.head == 7)
  }

  test("edgeDistanceUdf resolves polygon by id") {
    val edist = Geo.edgeDistanceUdf(spark, Seq(unitSquare, lShape))
    val d = df("SELECT 1 AS id, CAST(0.5 AS DOUBLE) AS x, CAST(0.5 AS DOUBLE) AS y")
    assert(math.abs(d.select(edist(col("id"), col("x"), col("y"))).head().getDouble(0) - 0.5) < 1e-12)
  }

  test("j24 grid proximity join equals the brute-force cross join") {
    // pigeonhole completeness: the 3x3 neighbor-cell equi-join must find
    // EXACTLY the pairs the O(n^2) cross join finds at the 3 km gate
    val d = "/root/testdata/sf0.001"
    val fn = graft.queries.GeoQueries.queries
      .find(_.name == "j24_grid_proximity").get.fn
    val got = fn(spark, d).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val pts = graft.core.Tables.customer(spark, d).select(col("c_custkey").as("id"),
        (lit(3400000L) + (col("c_custkey") % 40) * 2000L).as("ux"),
        (lit(-400000L) + ((col("c_custkey").cast("long") / 40).cast("long") % 40)
          * 2000L).as("uy"))
    val r = pts.select(col("id").as("rid"), col("ux").as("rux"), col("uy").as("ruy"))
    val km = Geo.haversineKm(
      col("ux") / 100000.0, col("uy") / 100000.0,
      col("rux") / 100000.0, col("ruy") / 100000.0)
    val brute = pts.crossJoin(r).filter(col("id") < col("rid"))
      .withColumn("km", km).filter(col("km") <= 3.0)
      .select("id", "rid").collect()
      .map(x => (x.getLong(0), x.getLong(1))).toSet
    assert(got == brute, s"grid ${got.size} pairs vs brute ${brute.size}")
    assert(brute.nonEmpty, "fixture must actually produce pairs")
  }

  // ---- bufferPoly ---------------------------------------------------------

  private def shoelace(p: Geo.Poly): Double =
    math.abs(Geo.signedArea2(p.xs, p.ys)) / 2

  test("bufferPoly: square buffer area matches the discretized closed form") {
    val d = 0.25
    val buf = Geo.bufferPoly(unitSquare, d)
    // A + P*d + four arc fans: each corner turns pi/2, discretized into
    // k = ceil(pi/2 * 8) = 13 chords of fan area d^2/2 * k * sin(theta/k)
    val k = math.ceil(math.Pi / 2 * 8).toInt
    val want = 1.0 + 4 * d + 4 * (d * d / 2 * k * math.sin(math.Pi / 2 / k))
    assert(math.abs(shoelace(buf) - want) < 1e-9)
    // and the true Minkowski area A + P*d + pi*d^2 within chord error
    assert(math.abs(shoelace(buf) - (1.0 + 4 * d + math.Pi * d * d)) < 1e-3)
  }

  test("bufferPoly: ring containment agrees with the exact buffered predicate") {
    val d = 0.2
    val buf = Geo.bufferPoly(unitSquare, d)
    val eps = 0.01 * d // chord sagitta bound is ~0.2% of d
    var checked = 0
    for (gx <- -30 to 40; gy <- -30 to 40) {
      val (x, y) = (gx / 20.0, gy / 20.0)
      val dist = Geo.edgeDistance(unitSquare, x, y)
      val inExact = Geo.bufferedContains(unitSquare, x, y, d)
      val inRing = Geo.contains(buf, x, y)
      // the chord-inscribed ring sits just inside the true buffer: only
      // points within eps of the d-contour may disagree
      if (math.abs(dist - d) > eps || Geo.contains(unitSquare, x, y)) {
        assert(inRing == inExact, s"($x,$y) dist=$dist ring=$inRing exact=$inExact")
        checked += 1
      }
    }
    assert(checked > 4000)
  }

  test("bufferPoly: orientation-insensitive, d=0 identity, convexity enforced") {
    val cw = Geo.Poly(3, unitSquare.xs.reverse, unitSquare.ys.reverse)
    assert(math.abs(shoelace(Geo.bufferPoly(cw, 0.25)) -
      shoelace(Geo.bufferPoly(unitSquare, 0.25))) < 1e-12)
    val id0 = Geo.bufferPoly(unitSquare, 0.0)
    assert(id0.xs.toSeq == unitSquare.xs.toSeq && id0.ys.toSeq == unitSquare.ys.toSeq)
    intercept[IllegalArgumentException] { Geo.bufferPoly(lShape, 0.1) }
  }

  test("bufferPoly composes with UTM reprojection for metric buffers") {
    // a ~2km lon/lat square near Nairobi reprojected to UTM 37S, then
    // buffered 100 m: a point 80 m past an edge is in, 150 m is not
    val lonLat = Geo.Poly(4,
      Array(36.80, 36.82, 36.82, 36.80), Array(-1.30, -1.30, -1.28, -1.28))
    val utm = Geo.reprojectPoly(lonLat, zone = 37, south = true)
    val buf = Geo.bufferPoly(utm, 100.0)
    val (cx, cy) = (utm.xs.sum / 4, utm.ys.sum / 4)
    val east = utm.xs.max // right edge x
    assert(Geo.contains(buf, east + 80.0, cy))
    assert(!Geo.contains(buf, east + 150.0, cy))
    assert(Geo.bufferedContains(utm, east + 80.0, cy, 100.0))
    assert(!Geo.bufferedContains(utm, east + 150.0, cy, 100.0))
  }
}
