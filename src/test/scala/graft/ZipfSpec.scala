package graft

import org.apache.spark.sql.functions._

/** t48 Zipf-fit pins: the registry row against a driver-side recompute,
  * and the estimator's closed-form behavior on a perfect power law.
  */
class ZipfSpec extends SparkSpec {

  private def fit(points: Seq[(Double, Double)]): (Double, Double) = {
    // the t48 epilogue on 6dp-rounded ln points
    val r6 = (v: Double) =>
      BigDecimal(v).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val xs = points.map(p => r6(math.log(p._1)))
    val ys = points.map(p => r6(math.log(p._2)))
    val n = points.size.toDouble
    val (sx, sy) = (xs.sum, ys.sum)
    val sxx = xs.map(x => x * x).sum
    val syy = ys.map(y => y * y).sum
    val sxy = xs.zip(ys).map { case (x, y) => x * y }.sum
    val num = n * sxy - sx * sy
    (num / (n * sxx - sx * sx), num * num / ((n * sxx - sx * sx) * (n * syy - sy * sy)))
  }

  test("perfect power law freq = C/rank^s fits slope -s with r2 ~ 1") {
    val pts = (1 to 50).map(r => (r.toDouble, 1e6 / math.pow(r, 1.2)))
    val (slope, r2) = fit(pts)
    assert(math.abs(slope - (-1.2)) < 1e-4, s"slope $slope")
    assert(r2 > 0.999999, s"r2 $r2")
  }

  test("registry t48 matches a driver-side rank/fit recompute") {
    val d = "/root/testdata/sf0.001"
    val fn = graft.queries.TextAnalysis.queries.find(_.name == "t48_zipf_fit").get.fn
    val got = fn(spark, d).collect().map(r => r.getString(0) ->
      (r.getAs[Long]("n_types"), r.getAs[Double]("zipf_slope"),
        r.getAs[Double]("r2"))).toMap
    val toks = graft.functions.TextFunctions.tokens(col("text"))
    val vocab = graft.core.Tables.documents(spark, d)
      .select(col("lang"), explode(toks).as("t"))
      .groupBy("lang", "t").agg(count(lit(1)).as("c"))
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    vocab.groupBy(_._1).foreach { case (lang, xs) =>
      val top = xs.sortBy(v => (-v._3, v._2)).take(50)
        .zipWithIndex.map { case ((_, _, c), i) => ((i + 1).toDouble, c.toDouble) }
      val (slope, r2) = fit(top)
      assert(got(lang)._1 == xs.length.toLong, s"$lang n_types")
      assert(math.abs(got(lang)._2 - BigDecimal(slope)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble) < 2e-6,
        s"$lang slope ${got(lang)._2} vs $slope")
      assert(math.abs(got(lang)._3 - r2) < 1e-5, s"$lang r2 ${got(lang)._3} vs $r2")
    }
  }

  test("a boilerplate-flooded corpus flattens the head: slope far from -1") {
    // 50 tokens all with equal counts: ln(freq) constant -> slope 0
    val pts = (1 to 50).map(r => (r.toDouble, 1000.0))
    val (slope, _) = fit(pts)
    assert(math.abs(slope) < 1e-9, s"flat head must fit slope 0, got $slope")
  }
}
