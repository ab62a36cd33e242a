package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Invariant companions for the round-12 rows: the oracles prove
  * cross-engine equality; these pin the SEMANTICS on constructed
  * fixtures (AUC's rank identity, lift's independence baseline, RSI's
  * bounds and conventions, the pruning decile, the zone-map planner's
  * exhaustiveness, CCNet bucket balance).
  */
class Round12Spec extends SparkSpec {

  private val sf001 = "/root/testdata/sf0.001"
  private val sf01 = "/root/testdata/sf0.01"

  // replicate a52's U2 pipeline over a local fixture
  private def aucOf(scored: Seq[(Double, Int)]): Double = {
    val sp = spark; import sp.implicits._
    val g = scored.toDF("score", "y")
      .groupBy("score").agg(count(lit(1)).as("cnt"),
        sum(when(col("y") === 1, 1L).otherwise(0L)).as("pos"))
    val w = Window.orderBy("score").rowsBetween(Window.unboundedPreceding, -1)
    val c = g.select(col("pos"), (col("cnt") - col("pos")).as("neg"),
      coalesce(sum(col("cnt") - col("pos")).over(w), lit(0L)).as("below"))
    val r = c.agg(sum("pos").as("p"), sum("neg").as("n"),
        sum(col("pos") * (lit(2L) * col("below") + col("neg"))).as("u2"))
      .head()
    r.getLong(2).toDouble / (2L * r.getLong(0) * r.getLong(1))
  }

  test("a52 logic: perfect separation is 1.0, anti-separation 0.0, all-tied 0.5") {
    assert(aucOf(Seq((1.0, 0), (2.0, 0), (3.0, 1), (4.0, 1))) == 1.0)
    assert(aucOf(Seq((1.0, 1), (2.0, 1), (3.0, 0), (4.0, 0))) == 0.0)
    assert(aucOf(Seq((7.0, 0), (7.0, 1), (7.0, 0), (7.0, 1))) == 0.5)
  }

  test("a52 logic: ties get half credit (textbook Mann-Whitney value)") {
    // pos scores {2, 3}, neg {1, 3}: pairs (2>1)=1, (2 vs 3)=0,
    // (3>1)=1, (3==3)=0.5 -> U=2.5 of 4 -> 0.625
    assert(aucOf(Seq((1.0, 0), (3.0, 0), (2.0, 1), (3.0, 1))) == 0.625)
  }

  test("a52 output: AUC is in (0,1) and the counts match the corpus") {
    val r = SparkEntry.queries("a52_auc")(spark, sf01).head()
    assert(r.getAs[Long]("n_pos") + r.getAs[Long]("n_neg") == 500L)
    val auc = r.getAs[Double]("auc")
    assert(auc > 0.0 && auc < 1.0)
  }

  test("g34 logic: independent items have lift 1, perfect co-occurrence has lift n/supp") {
    val sp = spark; import sp.implicits._
    // 4 baskets: x in all 4, y in all 4 -> supp_xy=4, lift = 4*4/(4*4)=1
    // p,q only together in 2 -> lift = 2*4/(2*2) = 2
    val b = Seq((1L, "x"), (1L, "y"), (2L, "x"), (2L, "y"),
      (3L, "x"), (3L, "y"), (4L, "x"), (4L, "y"),
      (1L, "p"), (1L, "q"), (2L, "p"), (2L, "q")).toDF("ok", "brand")
    val s1 = b.groupBy("brand").agg(count(lit(1)).as("supp"))
    val s2 = b.select(col("ok"), col("brand").as("brand_a"))
      .join(b.select(col("ok"), col("brand").as("brand_b")), Seq("ok"))
      .filter(col("brand_a") < col("brand_b"))
      .groupBy("brand_a", "brand_b").agg(count(lit(1)).as("supp_ab"))
    val n = b.select("ok").distinct().count()
    val lifts = s2
      .join(s1.select(col("brand").as("brand_a"), col("supp").as("supp_a")), Seq("brand_a"))
      .join(s1.select(col("brand").as("brand_b"), col("supp").as("supp_b")), Seq("brand_b"))
      .select(col("brand_a"), col("brand_b"),
        (col("supp_ab").cast("double") * n
          / (col("supp_a").cast("double") * col("supp_b"))).as("lift"))
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getDouble(2)).toMap
    assert(lifts(("x", "y")) == 1.0)
    assert(lifts(("p", "q")) == 2.0)
  }

  test("g34 output: confidence <= 1, support <= min marginal share, lift positive") {
    val rs = SparkEntry.queries("g34_basket_lift")(spark, sf01).collect()
    assert(rs.nonEmpty)
    rs.foreach { r =>
      assert(r.getAs[Double]("confidence") <= 1.0)
      assert(r.getAs[Double]("support") > 0.0 && r.getAs[Double]("support") <= 1.0)
      assert(r.getAs[Double]("lift") > 0.0)
    }
  }

  test("a53 output: inclusion-exclusion estimate actually lands within the gate") {
    val r = SparkEntry.queries("a53_sketch_intersection")(spark, sf01).head()
    assert(r.getAs[Boolean]("within_10pct"))
    // overlap must be a real subset: both <= each marginal
    assert(r.getAs[Long]("exact_both") <= r.getAs[Long]("exact_a"))
    assert(r.getAs[Long]("exact_both") <= r.getAs[Long]("exact_b"))
  }

  test("w48 logic: monotone rise pins RSI to 100, flat series to 50, bounds hold") {
    val sp = spark; import sp.implicits._
    val rise = (1 to 10).map(i => (1L, i.toLong, java.sql.Timestamp.valueOf(
      f"2026-01-01 00:${i}%02d:00"), i.toDouble * 2))
    val flat = (1 to 10).map(i => (2L, (100 + i).toLong, java.sql.Timestamp.valueOf(
      f"2026-01-01 00:${i}%02d:00"), 7.0))
    val events = (rise ++ flat).toDF("user_id", "event_id", "ts", "x")
    val out = graft.operators.Sessionize.rsi(events, "user_id", "ts", "event_id", "x")
      .collect()
    val byUser = out.groupBy(_.getAs[Long]("user_id"))
    // first row of any key is the 50 convention
    byUser.values.foreach { rs =>
      val sorted = rs.sortBy(_.getAs[Long]("event_id"))
      assert(sorted.head.getAs[Double]("rsi") == 50.0)
      sorted.foreach { r =>
        val v = r.getAs[Double]("rsi")
        assert(v >= 0.0 && v <= 100.0)
      }
    }
    // strictly rising: every post-first row has zero losses -> 100
    assert(byUser(1L).sortBy(_.getAs[Long]("event_id")).tail
      .forall(_.getAs[Double]("rsi") == 100.0))
    // flat: no gains, no losses -> stays at 50
    assert(byUser(2L).forall(_.getAs[Double]("rsi") == 50.0))
  }

  test("t59 output: buckets 1..3 partition each language near-evenly, head score >= tail") {
    val rs = SparkEntry.queries("t59_ccnet_buckets")(spark, sf01).collect()
    val langs = rs.map(_.getAs[String]("lang")).distinct
    assert(langs.length == 5)
    langs.foreach { l =>
      val slice = rs.filter(_.getAs[String]("lang") == l)
        .sortBy(_.getAs[Long]("bucket"))
      assert(slice.map(_.getAs[Long]("bucket")).toSeq == Seq(1L, 2L, 3L))
      val counts = slice.map(_.getAs[Long]("n_docs"))
      assert(counts.max - counts.min <= 1, s"$l: ${counts.toSeq}")
      // bucket 1 = head = highest avg logprob (ntile ordered DESC)
      val mean = slice.map(r =>
        r.getAs[Double]("sum_logprob") / r.getAs[Long]("n_docs"))
      assert(mean(0) >= mean(2), s"$l head ${mean(0)} < tail ${mean(2)}")
    }
  }

  test("s49 output: exactly floor(n/10) per cluster pruned, cluster sizes reconcile") {
    val rs = SparkEntry.queries("s49_prototype_prune")(spark, sf01).collect()
    assert(rs.length == 500)
    rs.groupBy(_.getAs[Long]("cell_id")).foreach { case (cell, members) =>
      val n = members.head.getAs[Long]("cluster_n")
      assert(members.length.toLong == n, s"cell $cell size")
      val dropped = members.count(!_.getAs[Boolean]("keep"))
      assert(dropped.toLong == n / 10, s"cell $cell dropped $dropped of $n")
    }
  }

  test("m11 logic: synthetic gradient values are the formula's (3 or 253 horizontal)") {
    // p(x+1,y) - p(x,y) = +3 mod 256 -> |delta| is 3, except at the
    // wrap where (v+3) mod 256 drops by 253
    val r = SparkEntry.queries("m11_edge_density")(spark, sf001).head()
    val nGx = r.getAs[Long]("n_gx")
    assert(nGx == 32L * 31)
    val sumGx = r.getAs[Long]("sum_gx")
    // sum is a mix of 3s and 253s: 3*n <= sum < 253*n, and ≡ mix
    assert(sumGx >= 3 * nGx && sumGx <= 253 * nGx)
    assert((sumGx - 3 * nGx) % 250 == 0) // each wrap adds exactly 250
  }

  test("a54 logic: a diagonal table gives V = 1, a uniform table gives V = 0") {
    val sp = spark; import sp.implicits._
    def vOf(cells: Seq[(String, String, Long)]): Double = {
      val t = cells.toDF("a", "b", "o")
      val r = t.groupBy("a").agg(sum("o").as("ra"))
      val c = t.groupBy("b").agg(sum("o").as("cb"))
      val n = t.agg(sum("o").as("n"), count_distinct(col("a")).as("ka"),
        count_distinct(col("b")).as("kb"))
      val dec = "decimal(38,0)"
      val num = col("n").cast(dec) * col("o") - col("ra").cast(dec) * col("cb")
      val den = (col("n").cast(dec) * col("ra") * col("cb")).cast("double")
      val termB = (col("ra").cast(dec) * col("cb")).cast("double") / col("n")
      val sums = t.join(r, Seq("a")).join(c, Seq("b")).crossJoin(n)
        .select(round((num * num).cast("double") / den, 6)
            .cast("decimal(18,6)").as("term_a"),
          round(termB, 6).cast("decimal(18,6)").as("term_b"))
        .agg(sum("term_a").as("sa"), sum("term_b").as("sb"))
      sums.crossJoin(n).select(
        sqrt((col("n") - col("sb") + col("sa")).cast("double")
          / (col("n") * least(col("ka") - 1, col("kb") - 1))).as("v"))
        .head().getDouble(0)
    }
    // perfect association: each a maps to exactly one b
    assert(math.abs(vOf(Seq(("x", "1", 10L), ("y", "2", 10L))) - 1.0) < 1e-9)
    // independence: uniform 2x2
    assert(vOf(Seq(("x", "1", 5L), ("x", "2", 5L),
      ("y", "1", 5L), ("y", "2", 5L))) == 0.0)
  }

  test("a54 output: V in [0,1], chi2 nonnegative") {
    val r = SparkEntry.queries("a54_cramers_v")(spark, sf01).head()
    assert(r.getAs[Double]("chi2") >= 0.0)
    val v = r.getAs[Double]("cramers_v")
    assert(v >= 0.0 && v <= 1.0)
  }

  test("a55 output: deciles are even, gap reconciles with conf/rate") {
    val rs = SparkEntry.queries("a55_calibration_bins")(spark, sf01).collect()
    assert(rs.map(_.getAs[Long]("bin")).sorted.toSeq == (1L to 10L))
    assert(rs.map(_.getAs[Long]("n")).sum == 500L)
    assert(rs.map(_.getAs[Long]("n")).max
      - rs.map(_.getAs[Long]("n")).min <= 1)
    rs.foreach { r =>
      val gap = math.abs(r.getAs[Double]("mean_conf") - r.getAs[Double]("pos_rate"))
      assert(math.abs(r.getAs[Double]("gap") - gap) < 2e-6)
    }
  }

  test("g35 logic: constructed path credits first to the view, last to the click") {
    val sp = spark; import sp.implicits._
    val ts = (m: Int) => java.sql.Timestamp.valueOf(f"2026-01-01 00:$m%02d:00")
    val ev = Seq(
      (1L, 1L, ts(1), "view"), (1L, 2L, ts(2), "click"),
      (1L, 3L, ts(3), "purchase"),
      (2L, 4L, ts(5), "signup"), (2L, 5L, ts(6), "purchase"))
      .toDF("user_id", "event_id", "ts", "event_type")
    val dir = graft.core.TempDirs.scratch("graft_r12_g35_").toString
    // reuse the registry logic by staging a minimal events table
    ev.withColumn("value", lit(1.0)).withColumn("props", lit("{}"))
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val out = SparkEntry.queries("g35_attribution")(spark, dir).collect()
      .map(r => r.getString(0) -> r).toMap
    assert(out("view").getAs[Long]("first_touch") == 1L)
    assert(out("view").getAs[Long]("last_touch") == 0L)
    assert(out("click").getAs[Long]("first_touch") == 0L)
    assert(out("click").getAs[Long]("last_touch") == 1L)
    assert(out("view").getAs[Double]("linear_credit") == 0.5)
    assert(out("signup").getAs[Long]("first_touch") == 1L)
    assert(out("signup").getAs[Double]("linear_credit") == 1.0)
  }

  test("g35 output: the three models attribute the same purchase total") {
    val rs = SparkEntry.queries("g35_attribution")(spark, sf01).collect()
    val ft = rs.map(_.getAs[Long]("first_touch")).sum
    val lt = rs.map(_.getAs[Long]("last_touch")).sum
    val lin = rs.map(_.getAs[Double]("linear_credit")).sum
    assert(ft == lt)
    // linear credits sum to the same attributed-purchase count up to
    // the 6dp rounding of 1/k per touch
    assert(math.abs(lin - ft) < 0.01, s"$lin vs $ft")
  }

  test("io23 output: no false negatives anywhere, false positives bounded") {
    val rs = SparkEntry.queries("io23_bloom_pointlookup")(spark, sf01).collect()
    assert(rs.nonEmpty)
    assert(rs.forall(_.getAs[Boolean]("all_found")))
    assert(rs.forall(_.getAs[Boolean]("fp_ok")))
    assert(rs.exists(_.getAs[Long]("n_actual") > 0))
  }

  test("j31 logic: unbuffered unit diamond has area 2, perimeter 4*sqrt(2), its center as centroid") {
    val sp = spark; import sp.implicits._
    // replicate the fold on the raw (unbuffered) diamond at (1,1)
    val df = Seq((0L, Seq(1.0, 2.0, 1.0, 0.0), Seq(0.0, 1.0, 2.0, 1.0)))
      .toDF("id", "xs", "ys")
    val n = size(col("xs"))
    def xs(i: org.apache.spark.sql.Column) = element_at(col("xs"), i)
    def ys(i: org.apache.spark.sql.Column) = element_at(col("ys"), i)
    val s = aggregate(sequence(lit(1), n), lit(0.0), (acc, i) =>
      acc + (xs(i) * ys(i % n + 1) - xs(i % n + 1) * ys(i)))
    val per = aggregate(sequence(lit(1), n), lit(0.0), (acc, i) =>
      acc + sqrt((xs(i % n + 1) - xs(i)) * (xs(i % n + 1) - xs(i))
        + (ys(i % n + 1) - ys(i)) * (ys(i % n + 1) - ys(i))))
    val r = df.select((abs(s) / 2.0).as("area"), per.as("p")).head()
    assert(r.getDouble(0) == 2.0)
    assert(math.abs(r.getDouble(1) - 4.0 * math.sqrt(2.0)) < 1e-12)
  }

  test("j31 output: buffered diamonds are congruent (equal area/perimeter), centroids at cell centers") {
    val rs = SparkEntry.queries("j31_polygon_metrics")(spark, sf01).collect()
    assert(rs.length == 25)
    val areas = rs.map(_.getAs[Double]("area"))
    assert(areas.max - areas.min < 1e-8)
    assert(areas.head > 2.0) // buffering grows the ring
    rs.foreach { r =>
      val id = r.getAs[Long]("id")
      val (cx, cy) = ((id / 5) * 2 + 1.0, (id % 5) * 2 + 1.0)
      assert(math.abs(r.getAs[Double]("cx") - cx) < 1e-6, s"poly $id cx")
      assert(math.abs(r.getAs[Double]("cy") - cy) < 1e-6, s"poly $id cy")
    }
  }

  test("a56 output: U bounded in [0,1] both directions, conditioning never hurts") {
    val r = SparkEntry.queries("a56_theils_u")(spark, sf01).head()
    for (c <- Seq("u_a_given_b", "u_b_given_a")) {
      val u = r.getAs[Double](c)
      assert(u >= -1e-6 && u <= 1.0, s"$c = $u")
    }
    assert(r.getAs[Double]("h_a") > 0.0 && r.getAs[Double]("h_b") > 0.0)
  }

  test("s51 output: metrics bounded, perfect prefix implies both metrics 1") {
    val rs = SparkEntry.queries("s51_ranking_metrics")(spark, sf01).collect()
    assert(rs.length == 10)
    rs.foreach { r =>
      val (nRel, rr, ndcg) = (r.getAs[Long]("n_rel"),
        r.getAs[Double]("rr"), r.getAs[Double]("ndcg"))
      assert(nRel >= 0 && nRel <= 3)
      assert(rr >= 0.0 && rr <= 1.0)
      assert(ndcg >= 0.0 && ndcg <= 1.0 + 1e-6)
      if (nRel == 3) { assert(rr == 1.0); assert(ndcg > 0.999999) }
      if (nRel == 0) { assert(rr == 0.0); assert(ndcg == 0.0) }
    }
  }

  test("io24 output: live set is exactly the last-2-snapshot hashes, orphans exist") {
    val rs = SparkEntry.queries("io24_vacuum_planner")(spark, sf01).collect()
    val (live, orphan) = rs.partition(_.getAs[String]("status") == "live")
    assert(live.nonEmpty && orphan.nonEmpty)
    assert(live.forall(_.getAs[Long]("last_seen") >= 2))
    assert(orphan.forall(_.getAs[Long]("last_seen") == 1))
    // every orphan's partition still has a live successor file
    val liveParts = live.map(r => (r.getAs[String]("pri"), r.getAs[Long]("bkt"))).toSet
    assert(orphan.forall(r =>
      liveParts((r.getAs[String]("pri"), r.getAs[Long]("bkt")))))
  }

  test("g36 logic: latency measured from FIRST touch; pre-touch purchases don't convert") {
    val sp = spark; import sp.implicits._
    val ts = (m: Int) => java.sql.Timestamp.valueOf(f"2026-01-01 00:$m%02d:00")
    val ev = Seq(
      // user 1: purchase BEFORE any touch (ignored), touch at :02,
      // converting purchase at :05 -> latency 3 min from the :02 view
      (1L, 1L, ts(1), "purchase"), (1L, 2L, ts(2), "view"),
      (1L, 3L, ts(3), "click"), (1L, 4L, ts(5), "purchase"),
      // user 2: touch, never purchases -> no row
      (2L, 5L, ts(1), "signup"))
      .toDF("user_id", "event_id", "ts", "event_type")
      .withColumn("value", lit(1.0)).withColumn("props", lit("{}"))
    val dir = graft.core.TempDirs.scratch("graft_r12_g36_").toString
    ev.write.mode("overwrite").parquet(s"$dir/events.parquet")
    val out = SparkEntry.queries("g36_time_to_convert")(spark, dir).collect()
    assert(out.length == 1)
    assert(out.head.getAs[String]("channel") == "view")
    assert(out.head.getAs[Double]("p50_us") == 180000000.0) // 3 min
  }

  test("st23 output: streaming sketch intersection equals the a53 batch answer") {
    val batch = SparkEntry.queries("a53_sketch_intersection")(spark, sf01).head()
    val stream = SparkEntry.queries("st23_stream_sketch_intersection")(spark, sf01).head()
    for (c <- Seq("exact_a", "exact_b", "exact_both"))
      assert(batch.getAs[Long](c) == stream.getAs[Long](c), c)
    assert(stream.getAs[Boolean]("within_10pct"))
  }

  test("a57 logic: strictly increasing series maxes S, constant series zeroes it") {
    val sp = spark; import sp.implicits._
    def sOf(xs: Seq[Double]): Long = {
      val d = xs.zipWithIndex.map { case (x, i) => ("t", i.toLong, x) }
        .toDF("event_type", "day", "x")
      d.select(col("event_type"), col("day").as("d1"), col("x").as("x1"))
        .join(d.select(col("event_type"), col("day").as("d2"), col("x").as("x2")),
          Seq("event_type"))
        .filter(col("d1") < col("d2"))
        .agg(sum(when(col("x2") > col("x1"), 1L)
          .when(col("x2") < col("x1"), -1L).otherwise(0L)).as("s"))
        .head().getLong(0)
    }
    assert(sOf(Seq(1, 2, 3, 4, 5)) == 10L) // n(n-1)/2
    assert(sOf(Seq(5, 4, 3, 2, 1)) == -10L)
    assert(sOf(Seq(7, 7, 7, 7)) == 0L)
  }

  test("a57 output: |z| is finite and var carries the tie correction") {
    val rs = SparkEntry.queries("a57_mann_kendall")(spark, sf01).collect()
    assert(rs.length == 5)
    rs.foreach { r =>
      val (n, v) = (r.getAs[Long]("n_days"), r.getAs[Long]("var18"))
      assert(v <= n * (n - 1) * (2 * n + 5)) // ties only shrink it
      assert(!r.getAs[Double]("z").isNaN)
      assert(math.abs(r.getAs[Long]("s")) <= n * (n - 1) / 2)
    }
  }

  test("g37 output: LTV is cumulative and cohorts partition the signup users") {
    val rs = SparkEntry.queries("g37_cohort_ltv")(spark, sf01).collect()
    assert(rs.nonEmpty)
    rs.foreach { r =>
      val ltv = Seq("ltv_w0", "ltv_w1", "ltv_w2", "ltv_w3")
        .map(r.getAs[Double])
      assert(ltv.zip(ltv.tail).forall { case (a, b) => b >= a },
        s"cohort ${r.getAs[Long]("cohort_week")}: $ltv not cumulative")
    }
    val ev = graft.core.Tables.events(spark, sf01)
    val signups = ev.filter(col("event_type") === "signup")
      .select("user_id").distinct().count()
    assert(rs.map(_.getAs[Long]("n_users")).sum == signups)
  }

  test("p23 output: histogram reconciles to the table, risk is 1/size") {
    val rs = SparkEntry.queries("p23_anonymity_risk")(spark, sf01).collect()
    assert(rs.map(_.getAs[Long]("n_rows")).sum == 1500L) // customers at sf0.01
    assert(math.abs(rs.map(_.getAs[Double]("row_share")).sum - 1.0) < 1e-4)
    rs.foreach { r =>
      assert(r.getAs[Boolean]("below_k") == (r.getAs[Long]("class_size") < 8))
      assert(math.abs(r.getAs[Double]("reid_risk")
        - 1.0 / r.getAs[Long]("class_size")) < 1e-6)
    }
  }

  test("j32 output: path length dominates longest hop, steps reconcile with events") {
    val rs = SparkEntry.queries("j32_trajectory_length")(spark, sf01).collect()
    assert(rs.nonEmpty)
    rs.foreach { r =>
      assert(r.getAs[Double]("total_km") >= r.getAs[Double]("max_step_km"))
      assert(r.getAs[Double]("max_step_km") >= 0.0)
      assert(r.getAs[Long]("n_steps") >= 1L)
    }
    val ev = graft.core.Tables.events(spark, sf01)
    val perUser = ev.groupBy("user_id").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    // every user with >= 2 events contributes exactly n-1 steps
    val steps = rs.map(r => r.getAs[Long]("user_id") -> r.getAs[Long]("n_steps")).toMap
    perUser.filter(_._2 >= 2).foreach { case (u, n) =>
      assert(steps(u) == n - 1, s"user $u")
    }
  }

  test("t61 output: rates bounded, covered types never exceed total types") {
    val rs = SparkEntry.queries("t61_oov_coverage")(spark, sf01).collect()
    assert(rs.length == 5)
    rs.foreach { r =>
      val rate = r.getAs[Double]("oov_rate")
      assert(rate >= 0.0 && rate <= 1.0)
      assert(r.getAs[Long]("types_covered") <= r.getAs[Long]("types_total"))
      assert(r.getAs[Long]("n_oov") <= r.getAs[Long]("n_tokens"))
    }
    // the 500-word vocab is global: every language covers at most 500 types
    assert(rs.forall(_.getAs[Long]("types_covered") <= 500L))
  }

  test("a59 output: F-measures bounded in [0,1] for every series") {
    val rs = SparkEntry.queries("a59_seasonality_strength")(spark, sf01).collect()
    assert(rs.length == 5)
    rs.foreach { r =>
      for (c <- Seq("f_seasonal", "f_trend")) {
        val v = r.getAs[Double](c)
        assert(v >= 0.0 && v <= 1.0, s"$c = $v")
      }
    }
  }

  test("io22 output: planner is sound on every file and all three classes appear") {
    val rs = SparkEntry.queries("io22_zonemap_skipping")(spark, sf01).collect()
    assert(rs.forall(_.getAs[Boolean]("sound")))
    val classes = rs.map(_.getAs[String]("decision")).toSet
    assert(classes == Set("skip", "full", "partial"), classes.toString)
    // skipping must be worth it: most files skip under this predicate
    assert(rs.count(_.getAs[String]("decision") == "skip") >= rs.length / 2)
  }
}
