package graft

import org.apache.spark.sql.functions._
import graft.operators.AsOfJoin

class AsOfJoinSpec extends SparkSpec {

  private def fixture = {
    val s = spark; import s.implicits._
    val left = Seq((1L, 10L, "l1"), (1L, 20L, "l2"), (1L, 25L, "l3"),
      (2L, 5L, "l4")).toDF("k", "ts", "name")
    val right = Seq((1L, 10L, 1.0), (1L, 20L, 2.0), (3L, 1L, 9.0))
      .toDF("k", "rts", "px")
    (left, right)
  }

  test("non-strict: equal-ts right row matches; missing key yields null") {
    val (l, r) = fixture
    val got = AsOfJoin.asOf(l, r, "k", "ts", "rts")
      .collect().map(x => x.getString(2) -> Option(x.get(3))).toMap
    assert(got == Map("l1" -> Some(1.0), "l2" -> Some(2.0),
      "l3" -> Some(2.0), "l4" -> None))
  }

  test("strict: equal-ts right row is excluded") {
    val (l, r) = fixture
    val got = AsOfJoin.asOf(l, r, "k", "ts", "rts", strict = true)
      .collect().map(x => x.getString(2) -> Option(x.get(3))).toMap
    assert(got == Map("l1" -> None, "l2" -> Some(1.0),
      "l3" -> Some(2.0), "l4" -> None))
  }

  test("plan has exactly one exchange: union form never joins") {
    val (l, r) = fixture
    val plan = AsOfJoin.asOf(l, r, "k", "ts", "rts")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Join"), s"as-of must not plan a join:\n$plan")
    assert("Exchange".r.findAllIn(plan).size == 1,
      s"expected a single shuffle on the key:\n$plan")
  }

  test("ASOF LEFT null semantics: null-ts/key left rows kept unmatched; null right rows never match") {
    val s = spark; import s.implicits._
    val l = Seq((Some(1L), Some(30L), "ok"), (Some(1L), None, "null_ts"),
      (None, Some(30L), "null_key")).toDF("k", "ts", "name")
    val r = Seq((Some(1L), Some(10L), "match"), (Some(1L), None, "bad_ts"),
      (None, Some(5L), "bad_key")).toDF("k", "rts", "pay")
    val got = AsOfJoin.asOf(l, r, "k", "ts", "rts")
      .collect().map(x => x.getString(2) -> Option(x.getString(3))).toMap
    // every left row survives; only the fully-valid one matches
    assert(got == Map("ok" -> Some("match"), "null_ts" -> None,
      "null_key" -> None))
  }

  test("matched row is atomic: null payload values do NOT inherit older rows") {
    val s = spark; import s.implicits._
    val l = Seq((1L, 30L)).toDF("k", "ts")
    val r = Seq((1L, 10L, Some(5.0), None: Option[String]),
      (1L, 20L, None: Option[Double], Some("x")))
      .toDF("k", "rts", "px", "tag")
    val row = AsOfJoin.asOf(l, r, "k", "ts", "rts").collect().head
    // the as-of match is the WHOLE ts=20 row: px null, tag "x"
    assert(row.isNullAt(row.fieldIndex("px")))
    assert(row.getAs[String]("tag") == "x")
  }

  test("tolerance: stale matches null out, boundary-gap matches survive") {
    val (l, r) = fixture
    // l3 (ts 25) matches right ts 20 — gap 5s
    def run(tol: Long) =
      AsOfJoin.asOf(l, r, "k", "ts", "rts", toleranceSecs = Some(tol))
        .collect().map(x => x.getString(2) -> Option(x.get(3))).toMap
    val tight = run(4)
    assert(tight("l3").isEmpty, "5s-old match must be rejected at tol=4")
    assert(tight("l2") == Some(2.0), "exact-ts match (gap 0) always survives")
    val exact = run(5)
    assert(exact("l3") == Some(2.0), "gap == tolerance is inclusive")
  }

  test("tolerance keeps the one-exchange union plan (no join node)") {
    val (l, r) = fixture
    val plan = AsOfJoin.asOf(l, r, "k", "ts", "rts", toleranceSecs = Some(5))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Join"), "tolerance gate must stay a projection")
    assert("Exchange".r.findAllIn(plan).size == 1)
  }
}
