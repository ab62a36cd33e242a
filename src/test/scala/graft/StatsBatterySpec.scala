package graft

import org.apache.spark.sql.functions._
import graft.operators.Sessionize

/** Round-8 stats-battery companions: w29 Holt smoothing and a35
  * chi-square independence. Oracles prove Spark == DuckDB; these pin
  * the STATISTICS — textbook values on closed-form fixtures. */
class StatsBatterySpec extends SparkSpec {

  private def series(vals: Seq[Double]) =
    spark.createDataFrame(vals.zipWithIndex.map { case (v, i) =>
      (1L, i.toLong, i.toLong, v)
    }).toDF("user_id", "ts", "event_id", "value")

  test("holt: constant series gives level = const, trend = 0") {
    val out = Sessionize.holt(series(Seq.fill(20)(7.5)),
      "user_id", "ts", "event_id", "value", alpha = 0.5, beta = 0.25)
      .select("level", "trend").collect()
    out.foreach { r =>
      assert(r.getDouble(0) == 7.5, s"level ${r.getDouble(0)}")
      assert(r.getDouble(1) == 0.0, s"trend ${r.getDouble(1)}")
    }
  }

  test("holt: linear ramp's trend converges to the slope") {
    val slope = 3.0
    val out = Sessionize.holt(series((0 until 60).map(i => 10.0 + slope * i)),
      "user_id", "ts", "event_id", "value", alpha = 0.5, beta = 0.25)
      .orderBy("event_id").select("trend").collect().map(_.getDouble(0))
    assert(math.abs(out.last - slope) < 0.01, s"final trend ${out.last}")
    // forecast tracks the next value once converged
    val lvl = Sessionize.holt(series((0 until 60).map(i => 10.0 + slope * i)),
      "user_id", "ts", "event_id", "value", alpha = 0.5, beta = 0.25)
      .orderBy("event_id").select(col("level") + col("trend")).collect()
    assert(math.abs(lvl.last.getDouble(0) - (10.0 + slope * 60)) < 0.05)
  }

  test("holt: beta = 0 degenerates to EWMA of w18") {
    val vals = Seq(3.0, 9.0, 1.0, 4.0, 4.0, 8.0)
    val h = Sessionize.holt(series(vals), "user_id", "ts", "event_id", "value",
        alpha = 0.5, beta = 0.0)
      .orderBy("event_id").select("level").collect().map(_.getDouble(0))
    val e = Sessionize.ewma(series(vals), "user_id", "ts", "event_id", "value",
        alpha = 0.5)
      .orderBy("event_id").select("ewma").collect().map(_.getDouble(0))
    assert(h.toSeq == e.toSeq)
  }

  private def days(vals: Seq[Double]) =
    spark.createDataFrame(vals.zipWithIndex.map { case (v, i) =>
      ("t", i.toLong, v)
    }).toDF("event_type", "day", "x")

  test("holt-winters: constant series is exactly level=c, trend=0, seasonal=0") {
    val out = graft.operators.Sessionize.holtWinters(days(Seq.fill(30)(5.0)),
      "event_type", "day", "x", period = 7,
      alpha = 0.5, beta = 0.25, gamma = 0.25)
      .select("level", "trend", "seasonal").collect()
    out.foreach { r =>
      assert(r.getDouble(0) == 5.0 && r.getDouble(1) == 0.0 && r.getDouble(2) == 0.0)
    }
  }

  test("holt-winters: weekly spike lands in its seasonal slot") {
    // day % 7 == 0 carries +7 on a base of 10, five full cycles
    val vals = (0 until 35).map(i => if (i % 7 == 0) 17.0 else 10.0)
    val out = graft.operators.Sessionize.holtWinters(days(vals),
      "event_type", "day", "x", period = 7,
      alpha = 0.5, beta = 0.25, gamma = 0.25)
      .orderBy("day").select("day", "seasonal").collect()
      .map(r => r.getLong(0) -> r.getDouble(1))
    val last = out.takeRight(7).toMap
    val spike = last.find(_._1 % 7 == 0).get._2
    val rest = last.filter(_._1 % 7 != 0).values
    assert(spike > 2.0, s"spike slot learned only $spike")
    assert(rest.forall(v => v < spike - 1.5),
      s"spike $spike not separated from ${rest.mkString(",")}")
  }

  test("holt-winters: gamma = 0 degenerates exactly to Holt") {
    val vals = Seq(3.0, 9.0, 1.0, 4.0, 4.0, 8.0, 2.0, 6.0)
    val hw = graft.operators.Sessionize.holtWinters(days(vals),
      "event_type", "day", "x", period = 7,
      alpha = 0.5, beta = 0.25, gamma = 0.0)
      .orderBy("day").select("level", "trend").collect()
      .map(r => (r.getDouble(0), r.getDouble(1)))
    val h = Sessionize.holt(
      spark.createDataFrame(vals.zipWithIndex.map { case (v, i) =>
        (1L, i.toLong, i.toLong, v)
      }).toDF("user_id", "ts", "event_id", "value"),
      "user_id", "ts", "event_id", "value", alpha = 0.5, beta = 0.25)
      .orderBy("event_id").select("level", "trend").collect()
      .map(r => (r.getDouble(0), r.getDouble(1)))
    assert(hw.toSeq == h.toSeq)
  }

  test("chi-square: registry row matches a driver-side recompute") {
    val row = SparkEntry.queries("a35_chi_square")(spark, "/root/testdata/sf0.001")
      .collect()(0)
    val cells = graft.core.Tables.orders(spark, "/root/testdata/sf0.001")
      .groupBy("o_orderpriority", "o_orderstatus").agg(count(lit(1)).as("n"))
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    val ps = cells.keys.map(_._1).toSeq.distinct
    val ss = cells.keys.map(_._2).toSeq.distinct
    val n = cells.values.sum.toDouble
    val rowTot = ps.map(p => p -> cells.filter(_._1._1 == p).values.sum).toMap
    val colTot = ss.map(s => s -> cells.filter(_._1._2 == s).values.sum).toMap
    val terms = for { p <- ps; s <- ss } yield {
      val o = cells.getOrElse((p, s), 0L).toDouble
      val e = rowTot(p) * colTot(s) * 1.0 / n
      BigDecimal((o - e) * (o - e) / e).setScale(6, BigDecimal.RoundingMode.HALF_UP)
    }
    val expect = terms.sum.toDouble
    assert(math.abs(row.getAs[Double]("chi2") - expect) < 1e-9,
      s"engine ${row.getAs[Double]("chi2")} vs recompute $expect")
    assert(row.getAs[Long]("dof") == (ps.size - 1).toLong * (ss.size - 1))
    assert(row.getAs[Long]("n") == n.toLong)
  }

  test("chi-square: independent margins give chi2 near 0") {
    // perfectly proportional 2x2 table built inline via the same recipe
    val obs = Seq(("a", "x", 40L), ("a", "y", 60L), ("b", "x", 20L), ("b", "y", 30L))
    val n = obs.map(_._3).sum.toDouble
    val rT = obs.groupBy(_._1).view.mapValues(_.map(_._3).sum).toMap
    val cT = obs.groupBy(_._2).view.mapValues(_.map(_._3).sum).toMap
    val chi2 = obs.map { case (p, s, o) =>
      val e = rT(p) * cT(s) / n
      (o - e) * (o - e) / e
    }.sum
    assert(chi2 < 1e-9, s"proportional table gave chi2 $chi2")
  }
}
