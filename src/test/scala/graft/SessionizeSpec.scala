package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.operators.Sessionize

class SessionizeSpec extends SparkSpec {

  test("sessionize splits on gaps > threshold per key") {
    val d = df(
      """SELECT * FROM VALUES
        |  (1, TIMESTAMP'2024-01-01 00:00:00', 1),
        |  (1, TIMESTAMP'2024-01-01 00:10:00', 2),
        |  (1, TIMESTAMP'2024-01-01 02:00:00', 3),
        |  (2, TIMESTAMP'2024-01-01 00:00:00', 4)
        |  t(uid, ts, eid)""".stripMargin)
    val out = Sessionize.sessionize(d, "uid", "ts", "eid", gapMicros = 30L * 60 * 1000000)
    assert(rows(out.select("eid", "session_id")) ==
      Set(Seq(1, 1L), Seq(2, 1L), Seq(3, 2L), Seq(4, 1L)))
  }

  test("sessionize matches the SQL gap-flag cumsum formulation on random data") {
    val d = spark.range(5000).select(
      (col("id") % 37).as("uid"),
      expr("timestamp_micros(CAST(xxhash64(id, 7L) % 100000000000 AS LONG))").as("ts"),
      col("id").as("eid"))
    val gap = 60L * 1000000
    val got = Sessionize.sessionize(d, "uid", "ts", "eid", gap)
    d.createOrReplaceTempView("ev")
    val want = spark.sql(
      s"""SELECT eid, 1 + sum(CASE WHEN unix_micros(ts) - prev > $gap THEN 1 ELSE 0 END)
         |  OVER (PARTITION BY uid ORDER BY ts, eid) AS session_id
         |FROM (SELECT *, lag(unix_micros(ts)) OVER (PARTITION BY uid ORDER BY ts, eid) AS prev FROM ev)
         |""".stripMargin)
    assert(rows(got.select("eid", "session_id")) == rows(want))
  }

  test("scanPerKey handles one hot key with 200k rows (streams, no group buffer)") {
    val hot = spark.range(200000).select(
      lit(1L).as("uid"),
      expr("timestamp_micros(id * 1000000)").as("ts"),
      col("id").as("eid"))
    val out = Sessionize.sessionize(hot, "uid", "ts", "eid", gapMicros = 10L * 1000000)
    // 1s spacing, 10s gap → one single session across all 200k events
    val agg = out.agg(max("session_id"), count(lit(1))).head()
    assert(agg.getLong(0) == 1L && agg.getLong(1) == 200000L)
  }

  test("scanPerKey resets state at key boundaries and carries it within key") {
    val d = df(
      """SELECT * FROM VALUES ('a', 1, 10), ('a', 2, 20), ('b', 1, 5)
        |  t(k, i, v)""".stripMargin)
    val out = Sessionize.scanPerKey[Long](d, Seq("k"), Seq("i"),
      StructType(Seq(StructField("running", LongType)))) {
      case (st, row) =>
        val acc = st.getOrElse(0L) + row.getInt(2)
        (acc, Seq(acc))
    }
    assert(rows(out.select(col("k"), col("i"), col("running"))) ==
      Set(Seq("a", 1, 10L), Seq("a", 2, 30L), Seq("b", 1, 5L)))
  }

  test("debounce: threshold advances only on KEPT rows, boundary is strict") {
    // key 1 at t = 0s, 10s, 20s, 31s with a 30s gap: 10s and 20s are
    // dropped (within 30s of t=0), 31s is kept (31 > 30, strict);
    // a naive lag-based rule would keep nothing after 0s because each
    // row is within 30s of its PREDECESSOR, kept or not
    val d = df(
      """SELECT * FROM VALUES
        |  (1L, 100L, 0L), (1L, 101L, 10000000L),
        |  (1L, 102L, 20000000L), (1L, 103L, 31000000L),
        |  (2L, 200L, 5L)
        |  t(user_id, event_id, ts)""".stripMargin)
    val out = Sessionize.debounce(d, "user_id", "ts", "event_id",
      minGapMicros = 30000000L)
    assert(rows(out.filter(col("kept")).select(col("event_id"))) ==
      Set(Seq(100L), Seq(103L), Seq(200L)))
    // exact-boundary gap is NOT kept (strict >)
    val b = df("SELECT * FROM VALUES (1L, 1L, 0L), (1L, 2L, 30000000L) t(user_id, event_id, ts)")
    val kept = Sessionize.debounce(b, "user_id", "ts", "event_id", 30000000L)
      .filter(col("kept")).count()
    assert(kept == 1)
  }

  test("ewma matches a driver-side fold and resets per key") {
    val sess = spark; import sess.implicits._
    val rows = Seq(
      (1L, 1L, 10.0), (1L, 2L, 20.0), (1L, 3L, 40.0),
      (2L, 4L, 100.0), (2L, 5L, 0.0))
      .map { case (u, e, v) =>
        (u, e, java.sql.Timestamp.valueOf(f"2026-01-01 00:00:0$e%d"), v) }
      .toDF("user_id", "event_id", "ts", "value")
    val out = graft.operators.Sessionize.ewma(rows, "user_id", "ts",
        "event_id", "value", alpha = 0.25)
      .collect().map(r => r.getAs[Long]("event_id") -> r.getAs[Double]("ewma"))
      .toMap
    def fold(xs: Seq[Double]): Seq[Double] =
      xs.tail.scanLeft(xs.head)((y, x) => 0.25 * x + 0.75 * y)
    val u1 = fold(Seq(10.0, 20.0, 40.0))
    assert(out(1L) == u1(0) && out(2L) == u1(1) && out(3L) == u1(2))
    val u2 = fold(Seq(100.0, 0.0))
    assert(out(4L) == u2(0) && out(5L) == u2(1), "state resets at key change")
  }

  private def cusumOf(series: (String, Long, Double)*) = {
    val sess = spark; import sess.implicits._
    graft.operators.Sessionize.cusum(
        series.toDF("k", "idx", "x"), "k", "idx", "x",
        slackFrac = 0.25, threshFrac = 1.0)
      .collect()
      .map(r => (r.getAs[String]("k"), r.getAs[Long]("idx")) ->
        ((r.getAs[Double]("s_pos"), r.getAs[Double]("s_neg"),
          r.getAs[Boolean]("alarm"))))
      .toMap
  }

  test("cusum: in-control series stays at zero, no alarms") {
    // ref = 8, k = 2: deviations within ±2 never accumulate
    val out = cusumOf(("a", 1L, 8.0), ("a", 2L, 9.0), ("a", 3L, 7.0), ("a", 4L, 8.5))
    out.values.foreach { case (sp, sn, al) =>
      assert(sp == 0.0 && sn == 0.0 && !al)
    }
  }

  test("cusum: persistent upward shift accumulates, alarms at h, then resets") {
    // ref = 8 (k = 2, h = 8): shift to 13 adds 13-8-2 = 3 per step;
    // S+ = 3, 6, 9 -> alarm at idx 4 (9 > 8), reset, then S+ = 3 again
    val out = cusumOf(("a", 1L, 8.0), ("a", 2L, 13.0), ("a", 3L, 13.0),
      ("a", 4L, 13.0), ("a", 5L, 13.0))
    assert(out(("a", 2L)) == ((3.0, 0.0, false)))
    assert(out(("a", 3L)) == ((6.0, 0.0, false)))
    assert(out(("a", 4L)) == ((9.0, 0.0, true)), "alarm crosses h = |ref|")
    assert(out(("a", 5L)) == ((3.0, 0.0, false)), "state restarted after alarm")
  }

  test("cusum: downward shift drives the negative side; keys independent") {
    // key b: ref = 8, drop to 2 adds 8-2-2 = 4 per step on S-
    val out = cusumOf(("a", 1L, 8.0), ("a", 2L, 8.0),
      ("b", 1L, 8.0), ("b", 2L, 2.0), ("b", 3L, 2.0), ("b", 4L, 2.0))
    assert(out(("b", 2L)) == ((0.0, 4.0, false)))
    assert(out(("b", 3L)) == ((0.0, 8.0, false)), "boundary h is strict >")
    assert(out(("b", 4L)) == ((0.0, 12.0, true)))
    assert(out(("a", 2L)) == ((0.0, 0.0, false)), "key a untouched")
  }

  private def kalmanOf(series: (String, Long, Double)*) = {
    val sess = spark; import sess.implicits._
    graft.operators.Sessionize.kalman(
        series.toDF("k", "idx", "x").withColumn("ts",
          expr("timestamp_micros(idx)")),
        "k", "ts", "idx", "x", q = 0.25, r = 1.0)
      .collect()
      .map(r => (r.getAs[String]("k"), r.getAs[Long]("idx")) ->
        ((r.getAs[Double]("kalman_level"), r.getAs[Double]("kalman_var"))))
      .toMap
  }

  test("kalman: first row initializes at the observation with P0 = 1") {
    val out = kalmanOf(("a", 1L, 42.0))
    assert(out(("a", 1L)) == ((42.0, 1.0)))
  }

  test("kalman: constant series keeps the level exact, variance contracts to the fixed point") {
    val out = kalmanOf((1L to 30L).map(i => ("a", i, 5.0)): _*)
    val vars = (1L to 30L).map(i => out(("a", i))._2)
    (1L to 30L).foreach(i => assert(out(("a", i))._1 == 5.0, "x + K*(5-x) = x when x = 5"))
    assert(vars.sliding(2).forall(p => p(1) < p(0)), "variance strictly decreasing from P0 = 1")
    // steady state of P = (1-K)(P+q) with q = 0.25, r = 1: root of P^2 + qP - qr
    val pStar = (-0.25 + math.sqrt(0.0625 + 1.0)) / 2
    assert(math.abs(vars.last - pStar) < 1e-6)
  }

  test("kalman: hand-computed two-step update; keys independent") {
    val out = kalmanOf(("a", 1L, 0.0), ("a", 2L, 10.0), ("b", 1L, 7.0))
    // step 2: P' = 1.25, K = 1.25/2.25, x = 0 + K*10, P = (1-K)*1.25
    val k = 1.25 / 2.25
    assert(out(("a", 2L)) == ((k * 10.0, (1.0 - k) * 1.25)))
    assert(out(("b", 1L)) == ((7.0, 1.0)), "key b untouched by key a's state")
  }

  test("kalman: larger r trusts observations less (smaller gain)") {
    val sess = spark; import sess.implicits._
    val d = Seq(("a", 1L, 0.0), ("a", 2L, 10.0)).toDF("k", "idx", "x")
      .withColumn("ts", expr("timestamp_micros(idx)"))
    def levelAt2(r: Double) = graft.operators.Sessionize
      .kalman(d, "k", "ts", "idx", "x", q = 0.25, r = r)
      .filter(col("idx") === 2L).head().getAs[Double]("kalman_level")
    assert(levelAt2(4.0) < levelAt2(1.0))
  }
}
