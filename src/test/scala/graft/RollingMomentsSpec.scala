package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.operators.RollingMoments

/** Exact equivalence of the two-level bucketed trailing moments vs the
  * direct sliding RANGE frame — including the frame-edge ties the
  * decomposition must get right: rows exactly windowUs apart (old-edge
  * inclusive), peers at the same microsecond (upper-edge peers), empty
  * middle buckets, null values (counted, not summed), and single-bucket
  * partitions.
  */
class RollingMomentsSpec extends SparkSpec {

  private val W = 6L * 3600_000_000L // 6 h in µs
  private val B = 3600_000_000L      // 1 h buckets

  private def direct(df: org.apache.spark.sql.DataFrame) = {
    val w = Window.partitionBy("k").orderBy(col("us")).rangeBetween(-W, 0)
    val vd = col("v").cast("decimal(18,4)")
    df.select(col("k"), col("us"), col("id"),
      count(lit(1)).over(w).as("n"),
      coalesce(sum(vd).over(w), lit(0).cast("decimal(28,4)")).as("s1"),
      coalesce(sum(vd * vd).over(w), lit(0).cast("decimal(38,8)")).as("s2"))
  }

  private def bucketed(df: org.apache.spark.sql.DataFrame) =
    RollingMoments.trailingMoments(df, "k", "us", "v", W, B)
      .select(col("k"), col("us"), col("id"), col("n"),
        coalesce(col("s1"), lit(0)).cast("decimal(28,4)").as("s1"),
        coalesce(col("s2"), lit(0)).cast("decimal(38,8)").as("s2"))

  private def assertSame(df: org.apache.spark.sql.DataFrame): Unit = {
    val d = direct(df).collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)) ->
      (r.getLong(3), r.getDecimal(4), r.getDecimal(5))).toMap
    val b = bucketed(df).collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)) ->
      (r.getLong(3), r.getDecimal(4), r.getDecimal(5))).toMap
    assert(d.keySet == b.keySet)
    val bad = d.keys.filter { key =>
      d(key)._1 != b(key)._1 ||
        d(key)._2.compareTo(b(key)._2) != 0 || d(key)._3.compareTo(b(key)._3) != 0
    }
    assert(bad.isEmpty, bad.take(3).map(key => s"$key direct=${d(key)} bucketed=${b(key)}").mkString("; "))
  }

  private def mk(rows: Seq[(String, Long, java.lang.Double)]) =
    spark.createDataFrame(
      rows.zipWithIndex.map { case ((key, us, v), i) =>
        (key, us, Option(v).map(_.doubleValue), i.toLong)
      })
      .toDF("k", "us", "v", "id")

  test("frame-edge ties: exactly W apart, same-µs peers, empty buckets") {
    val t0 = 1000L * B // bucket 1000 start
    assertSame(mk(Seq(
      // old edge: row exactly W before another -> must be IN the frame
      ("a", t0, 1.0), ("a", t0 + W, 2.0),
      // one µs outside the frame
      ("a", t0 - 1 + W + B * 0, 3.0),
      // peers at the same microsecond: both count for each other
      ("a", t0 + W, 4.0), ("a", t0 + W, 5.0),
      // rows with empty middle buckets between them
      ("b", t0, 10.0), ("b", t0 + 5 * B + 17L, 11.0),
      // null value: counts toward n, not the sums
      ("b", t0 + 5 * B + 18L, null),
      // single row partition
      ("c", 42L * B + 7L, 9.5))))
  }

  test("dense randomized fixture agrees (cross-bucket spans, all offsets)") {
    // deterministic pseudo-random spread: 400 rows, 3 keys, offsets
    // hitting bucket starts, bucket ends, and exact window multiples
    val rows = (0 until 400).map { i =>
      val key = "k" + (i % 3)
      val us = (i * 7919L * 131L) % (30L * B) + // spread over 30 buckets
        (if (i % 11 == 0) 0L else i % 977L) // some exact bucket starts
      val v: java.lang.Double = if (i % 13 == 0) null else (i % 29) * 1.25
      (key, us + 500L * B, v)
    }
    assertSame(mk(rows))
  }

  test("events table at sf0.001 agrees end to end") {
    val ev = graft.core.Tables.events(spark, "/root/testdata/sf0.001")
      .select(col("event_type").as("k"), unix_micros(col("ts")).as("us"),
        col("value").as("v"), col("event_id").as("id"))
    assertSame(ev)
  }
}
