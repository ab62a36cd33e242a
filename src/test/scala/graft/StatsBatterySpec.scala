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

  test("benford: registry row matches a driver-side digit recompute") {
    val benford = Map(1 -> 0.301030, 2 -> 0.176091, 3 -> 0.124939,
      4 -> 0.096910, 5 -> 0.079181, 6 -> 0.066947, 7 -> 0.057992,
      8 -> 0.051153, 9 -> 0.045757)
    assert(math.abs(benford.values.sum - 1.0) < 1e-12) // literals cover the mass
    val got = SparkEntry.queries("a36_benford")(spark, "/root/testdata/sf0.001")
      .collect().map(r => r.getString(0) ->
        (r.getAs[Long]("n_orders"), r.getAs[Double]("benford_mad"))).toMap
    val digits = graft.core.Tables.orders(spark, "/root/testdata/sf0.001")
      .collect().map { r =>
        val cents = math.round(r.getAs[Double]("o_totalprice") * 100)
        r.getAs[String]("o_orderpriority") -> cents.toString.head.asDigit
      }
    digits.groupBy(_._1).foreach { case (p, xs) =>
      val n = xs.length
      val mad = (1 to 9).map { d =>
        val obs = xs.count(_._2 == d).toDouble / n
        BigDecimal(math.abs(obs - benford(d)))
          .setScale(6, BigDecimal.RoundingMode.HALF_UP)
      }.sum.toDouble / 9
      assert(got(p)._1 == n.toLong, s"$p n mismatch")
      assert(math.abs(got(p)._2 - mad) < 1e-9,
        s"$p engine ${got(p)._2} vs recompute $mad")
    }
  }

  test("theil-sen: registry row matches the median-of-pairwise-slopes rule") {
    val got = SparkEntry.queries("w33_theil_sen")(spark, "/root/testdata/sf0.001")
      .collect().map(r => r.getString(0) ->
        (r.getAs[Long]("n_pairs"), r.getAs[Double]("ts_slope"))).toMap
    val daily = graft.core.Tables.events(spark, "/root/testdata/sf0.001")
      .groupBy(col("event_type"),
        datediff(to_date(col("ts")), lit("1970-01-01")).cast("long").as("day"))
      .agg(sum(col("value").cast("decimal(18,4)")).cast("double").as("x"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
    daily.groupBy(_._1).foreach { case (t, xs) =>
      val pts = xs.map(p => (p._2, p._3)).sortBy(_._1)
      val slopes = (for {
        i <- pts.indices; j <- pts.indices if pts(i)._1 < pts(j)._1
      } yield (pts(j)._2 - pts(i)._2) / (pts(j)._1 - pts(i)._1)).sorted
      val m = slopes.length
      val med = (slopes((m + 1) / 2 - 1) + slopes((m + 2) / 2 - 1)) / 2
      assert(got(t)._1 == m.toLong, s"$t pair count mismatch")
      assert(math.abs(got(t)._2 - med) < 1e-12,
        s"$t engine ${got(t)._2} vs recompute $med")
    }
  }

  test("theil-sen rule is outlier-robust where least squares is not") {
    // y = 3x on x=0..8 with y(8) replaced by 1000: the pairwise-slope
    // median is still exactly 3 (>= 29% breakdown), while the LS slope
    // is pulled far away (the outlier sits at an endpoint, not at
    // mean(x) where LS is insensitive to it).
    val pts = (0 to 8).map(x => (x.toDouble, if (x == 8) 1000.0 else 3.0 * x))
    val slopes = (for {
      i <- pts.indices; j <- pts.indices if i < j
    } yield (pts(j)._2 - pts(i)._2) / (pts(j)._1 - pts(i)._1)).sorted
    val m = slopes.length
    val med = (slopes((m + 1) / 2 - 1) + slopes((m + 2) / 2 - 1)) / 2
    assert(med == 3.0, s"theil-sen gave $med")
    val n = pts.length
    val (sx, sy) = (pts.map(_._1).sum, pts.map(_._2).sum)
    val sxx = pts.map(p => p._1 * p._1).sum
    val sxy = pts.map(p => p._1 * p._2).sum
    val ls = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    assert(math.abs(ls - 3.0) > 5, s"LS slope $ls should be hijacked")
  }

  test("w34 decomposition: reconstruction identity and dow-constant seasonal") {
    val rows = SparkEntry.queries("w34_seasonal_decompose")(
      spark, "/root/testdata/sf0.001").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (x, tr, se, re) = (r.getAs[Double]("x"), r.getAs[Double]("trend"),
        r.getAs[Double]("seasonal"), r.getAs[Double]("resid"))
      // resid = (x - trend) - seasonal by construction — the identity
      // catches any join/column mixup
      assert(math.abs(x - tr - se - re) < 1e-9, s"row $r breaks x=t+s+r")
    }
    // seasonal is a function of (type, day % 7) only
    rows.groupBy(r => (r.getString(0), r.getAs[Long]("day") % 7)).foreach {
      case (k, rs) =>
        val ss = rs.map(_.getAs[Double]("seasonal")).distinct
        assert(ss.size == 1, s"seasonal not constant within $k: $ss")
    }
  }

  test("gini rank formula: equal values give 0, total concentration tends to 1") {
    def gini(xs: Seq[Long]): Double = {
      val sorted = xs.sorted
      val n = sorted.length.toLong
      val sx = sorted.sum
      val six = sorted.zipWithIndex.map { case (x, i) => (i + 1) * x }.sum
      (2.0 * six - (n + 1) * sx) / (n.toDouble * sx)
    }
    assert(math.abs(gini(Seq.fill(10)(500L))) < 1e-12)
    val concentrated = gini(Seq.fill(99)(0L) :+ 1000000L)
    assert(math.abs(concentrated - 0.99) < 1e-12, s"got $concentrated")
    // a38 registry row matches the same formula driver-side
    val got = SparkEntry.queries("a38_gini")(spark, "/root/testdata/sf0.001")
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2))).toMap
    val cents = graft.core.Tables.orders(spark, "/root/testdata/sf0.001")
      .join(graft.core.Tables.customer(spark, "/root/testdata/sf0.001"),
        col("o_custkey") === col("c_custkey"))
      .select(col("c_mktsegment"), round(col("o_totalprice") * 100).cast("long"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
    cents.groupBy(_._1).foreach { case (seg, xs) =>
      val expect = BigDecimal(gini(xs.map(_._2)))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(got(seg)._1 == xs.length.toLong)
      assert(math.abs(got(seg)._2 - expect) < 2e-6,
        s"$seg engine ${got(seg)._2} vs $expect")
    }
  }

  test("w35 MAD flags a planted spike that inflated-sigma z-scores would dilute") {
    val rows = SparkEntry.queries("w35_mad_outliers")(
      spark, "/root/testdata/sf0.001").collect()
    assert(rows.nonEmpty)
    // recompute med/MAD per type with the same rank rule
    val byType = rows.groupBy(_.getString(0))
    byType.foreach { case (t, rs) =>
      def medianBy(vals: Seq[(Double, Long)]): Double = {
        val s = vals.sortBy(v => (v._1, v._2)).map(_._1)
        val m = s.length
        (s((m + 1) / 2 - 1) + s((m + 2) / 2 - 1)) / 2
      }
      val xs = rs.map(r => (r.getAs[Double]("x"), r.getAs[Long]("day"))).toSeq
      val med = medianBy(xs)
      val mad = medianBy(xs.map { case (x, day) => (math.abs(x - med), day) })
      rs.foreach { r =>
        assert(math.abs(r.getAs[Double]("med") - med) < 1e-9, s"$t med")
        assert(math.abs(r.getAs[Double]("mad") - mad) < 1e-9, s"$t mad")
        val expect = math.abs(r.getAs[Double]("x") - med) > 3 * 1.4826 * mad
        assert(r.getAs[Boolean]("outlier") == expect, s"$t day flag")
      }
    }
  }
}
