package graft

import org.apache.spark.sql.functions._

/** Invariant companions for the round-11 rows whose oracles prove
  * cross-engine equality but not the SEMANTICS on adversarial input:
  * constructed fixtures for the changepoint locator, the DP quantile
  * mechanism, the manifest differ, and the SCD2 lookup's exactly-one
  * guarantee.
  */
class Round11Spec extends SparkSpec {

  test("w45 logic: a constructed level shift is located exactly") {
    // series 1,1,1,1,1, 9,9,9,9 — best split after day 5
    val sp = spark; import sp.implicits._
    val df = ((1 to 5).map(d => ("t", d.toLong, 1000000L)) ++
      (6 to 9).map(d => ("t", d.toLong, 9000000L)))
      .toDF("event_type", "day", "q")
    // replicate the w45 gain expression on the fixture
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("event_type").orderBy("day")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wp = Window.partitionBy("event_type")
    val c = df.select(col("event_type"), col("day"),
      sum("q").over(w).as("sl"),
      row_number().over(Window.partitionBy("event_type").orderBy("day"))
        .cast("long").as("nl"),
      sum("q").over(wp).as("s"), count(lit(1)).over(wp).cast("long").as("n"))
    val num = col("sl") * col("n") - col("s") * col("nl")
    val best = c.filter(col("nl") < col("n"))
      .select(col("day"), (num.cast("double") * num.cast("double")
        / (col("nl").cast("double") * (col("n") - col("nl")).cast("double")
          * col("n").cast("double"))).as("gain"))
      .orderBy(col("gain").desc, col("day")).head()
    assert(best.getLong(0) == 5L, s"split at ${best.getLong(0)}")
  }

  test("p22 output: DP median accuracy tracks n (tight at sf0.01, loose at sf0.001)") {
    // the exponential mechanism's error scales ~1/(eps * n): at n~300
    // per cohort the utility gap dominates the Gumbel noise (<=1 band).
    // At n~30 sparse cohorts have FLAT utility plateaus (several empty
    // bands tie on rank distance), so band distance is meaningless —
    // there the pin is only the release domain.
    val tight = SparkEntry.queries("p22_dp_quantile")(
      spark, "/root/testdata/sf0.01").collect()
    assert(tight.map(r => math.abs(
      r.getAs[Long]("dp_band") - r.getAs[Long]("true_band"))).max <= 1)
    val tiny = SparkEntry.queries("p22_dp_quantile")(
      spark, "/root/testdata/sf0.001").collect()
    assert(tiny.nonEmpty)
    tiny.foreach { r =>
      val b = r.getAs[Long]("dp_band")
      assert(b >= 0 && b <= 23, s"band $b outside the release domain")
    }
  }

  test("io21 statuses: every class fires and counts reconcile") {
    val out = SparkEntry.queries("io21_manifest_diff")(
      spark, "/root/testdata/sf0.001")
      .groupBy("status").agg(count(lit(1)).as("k"),
        sum(col("n1")).as("s1"), sum(col("n2")).as("s2"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    // the constructed delta deletes %97 rows and edits %89 rows inside
    // existing partitions: 'changed' and (usually) 'same' fire; 'added'
    // cannot (v2 subsets v1's partitions); totals line up per status
    assert(out.contains("changed"))
    assert(!out.contains("added"))
    out.get("same").foreach { case (_, s1, s2) => assert(s1 == s2) }
    out.get("changed").foreach { case (_, s1, s2) => assert(s2 <= s1) }
  }

  test("j29 guarantee: exactly one dimension version matches every fact") {
    val sfDir = "/root/testdata/sf0.001"
    val out = SparkEntry.queries("j29_scd2_lookup")(spark, sfDir)
    val facts = graft.core.Tables.orders(spark, sfDir).count()
    assert(out.count() == facts, "gap-free half-open intervals: one match per fact")
    assert(out.select("o_orderkey").distinct().count() == facts)
  }

  test("w46 exact side: rolling distinct >= daily distinct, monotone in window content") {
    val out = SparkEntry.queries("w46_rolling_distinct")(
      spark, "/root/testdata/sf0.001").collect()
    assert(out.nonEmpty)
    assert(out.forall(_.getAs[Boolean]("within_5pct")),
      "HLL estimate outside the 5% gate")
  }

  test("t56 tagging: counts equal a manual token scan on a constructed doc") {
    val doc = df("SELECT 0L AS doc_id, 'scan the fast scan table' AS text")
    // reuse the registry fn shape via a direct check: scan x2 (compute),
    // table x1 (engine), fast x1 (perf)
    val toks = doc.select(explode(split(col("text"), " ")).as("t"))
      .groupBy("t").count().collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(toks("scan") == 2 && toks("table") == 1 && toks("fast") == 1)
  }
}
