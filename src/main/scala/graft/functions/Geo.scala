package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.functions._

/** Geospatial kernel (SURVEY.md §2.8): haversine distance as a pure
  * column expression, and point-in-polygon / distance-to-edge over a
  * BROADCAST polygon set (ray casting + point-to-segment), mirroring the
  * reference's overlay-with-buffered-fallback
  * (pipeline-cleaning/R/processing_utils.R:434-508,
  * anomalies_utils.R:59-166).
  *
  * Scale notes: the polygon set is trial geometry (≤ 10s of MB) — it
  * ships to every executor once via a broadcast variable; the point side
  * streams through a scalar UDF with zero shuffle. The UDF is the right
  * tool here (per SURVEY §7.3): variable-length vertex loops don't fit
  * codegen'd column expressions, and the per-row cost is a short loop
  * over a few hundred vertices.
  */
object Geo {

  /** A polygon ring: parallel vertex arrays (closed implicitly). */
  final case class Poly(id: Int, xs: Array[Double], ys: Array[Double])

  private val EarthRadiusKm = 6371.0088

  /** Great-circle distance in km between two lon/lat points (degrees). */
  def haversineKm(lon1: Column, lat1: Column, lon2: Column, lat2: Column): Column = {
    val dLat = radians(lat2 - lat1) / 2
    val dLon = radians(lon2 - lon1) / 2
    val a = pow(sin(dLat), 2) +
      cos(radians(lat1)) * cos(radians(lat2)) * pow(sin(dLon), 2)
    lit(2 * EarthRadiusKm) * atan2(sqrt(a), sqrt(lit(1.0) - a))
  }

  /** Even-odd ray casting; boundary points follow the crossing rule. */
  private[graft] def contains(p: Poly, x: Double, y: Double): Boolean = {
    var inside = false
    var i = 0
    var j = p.xs.length - 1
    while (i < p.xs.length) {
      val (xi, yi) = (p.xs(i), p.ys(i))
      val (xj, yj) = (p.xs(j), p.ys(j))
      if ((yi > y) != (yj > y) && x < (xj - xi) * (y - yi) / (yj - yi) + xi)
        inside = !inside
      j = i; i += 1
    }
    inside
  }

  /** Min distance (in coordinate units) from a point to a polygon edge. */
  private[graft] def edgeDistance(p: Poly, x: Double, y: Double): Double = {
    var best = Double.MaxValue
    var i = 0
    var j = p.xs.length - 1
    while (i < p.xs.length) {
      val (x1, y1) = (p.xs(j), p.ys(j))
      val (x2, y2) = (p.xs(i), p.ys(i))
      val (dx, dy) = (x2 - x1, y2 - y1)
      val len2 = dx * dx + dy * dy
      val t = if (len2 == 0) 0.0
        else math.max(0.0, math.min(1.0, ((x - x1) * dx + (y - y1) * dy) / len2))
      val (px, py) = (x1 + t * dx, y1 + t * dy)
      val d = math.sqrt((x - px) * (x - px) + (y - py) * (y - py))
      if (d < best) best = d
      j = i; i += 1
    }
    best
  }

  /** Cluster assignment UDF: first containing polygon (ascending id); if
    * none contains the point, the nearest polygon whose edge is within
    * `bufferDeg` (the reference's 50m/100m gBuffer fallback); else null.
    */
  def clusterAssigner(spark: SparkSession, polys: Seq[Poly], bufferDeg: Double)
      : org.apache.spark.sql.expressions.UserDefinedFunction = {
    val bc = spark.sparkContext.broadcast(polys.sortBy(_.id).toArray)
    udf((x: java.lang.Double, y: java.lang.Double) => {
      if (x == null || y == null) null
      else {
        val ps = bc.value
        var hit: Integer = null
        var i = 0
        while (hit == null && i < ps.length) {
          if (contains(ps(i), x, y)) hit = ps(i).id
          i += 1
        }
        if (hit == null && bufferDeg > 0) {
          var bestD = bufferDeg
          i = 0
          while (i < ps.length) {
            val d = edgeDistance(ps(i), x, y)
            if (d <= bestD) { bestD = d; hit = ps(i).id }
            i += 1
          }
        }
        hit
      }
    })
  }

  /** Distance (coordinate units) from each point to the named polygon's
    * edge — the reference's distance-to-cluster-edge priority metric.
    */
  def edgeDistanceUdf(spark: SparkSession, polys: Seq[Poly])
      : org.apache.spark.sql.expressions.UserDefinedFunction = {
    val bc = spark.sparkContext.broadcast(polys.map(p => p.id -> p).toMap)
    udf((id: java.lang.Integer, x: java.lang.Double, y: java.lang.Double) => {
      if (id == null || x == null || y == null) null
      else bc.value.get(id.toInt)
        .map(p => java.lang.Double.valueOf(edgeDistance(p, x, y))).orNull
    })
  }
}
