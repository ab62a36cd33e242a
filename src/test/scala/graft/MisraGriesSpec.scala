package graft

import org.apache.spark.sql.functions._
import graft.plans.MisraGriesTopK

class MisraGriesSpec extends SparkSpec {

  /** Adversarial stream: one heavy item above the N/(k+1) guarantee
    * threshold buried in a long tail of near-misses, scattered across
    * partitions so the merge reduction must do real work. */
  test("sketch keys are a superset of true heavy hitters at share > 1/(k+1)") {
    val k = 7
    // 'hh' appears 40 times; 200 tail items twice each; N = 440.
    // share(hh) = 40/440 = 9.1% > 1/(k+1) = 12.5%? No — use k=7 →
    // 1/8 = 12.5%; raise hh to 80: 80/480 = 16.7% > 12.5%.
    val items = (Seq.fill(80)("hh") ++ (1 to 200).flatMap(i => Seq(s"t$i", s"t$i")))
    val shuffled = new scala.util.Random(42).shuffle(items)
    val df = spark.createDataFrame(
        spark.sparkContext.parallelize(shuffled.map(Tuple1(_)), numSlices = 8))
      .toDF("w")
      .groupBy().agg(MisraGriesTopK(array(col("w")), k).as("cand"))
    val cand = df.head().getSeq[String](0)
    assert(cand.size <= k, s"sketch kept ${cand.size} > k=$k entries")
    assert(cand.contains("hh"), s"true heavy hitter lost: $cand")
  }

  test("array input loops elements; nulls and empty arrays are ignored") {
    val df = spark.sql(
      """SELECT * FROM VALUES
        |  (array('a','a','b')), (array('a')), (CAST(NULL AS ARRAY<STRING>)),
        |  (array()) t(ws)""".stripMargin)
      .groupBy().agg(MisraGriesTopK(col("ws"), 2).as("cand"))
    val cand = df.head().getSeq[String](0)
    assert(cand.contains("a"))
    assert(cand.size <= 2)
  }

  test("a27 exact two-phase result equals the naive exact computation") {
    val docs = graft.core.Tables.documents(spark, "/root/testdata/sf0.001")
    val exact = docs
      .select(explode(split(col("text"), " ")).as("word"))
      .groupBy("word").agg(count(lit(1)).as("cnt"))
    val n = docs.agg(sum(size(split(col("text"), " ")))).head().getLong(0)
    val expected = exact.filter(col("cnt") * 30 > n)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    val got = SparkEntry.queries("a27_heavy_hitters")(spark, "/root/testdata/sf0.001")
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    assert(got == expected)
    assert(got.nonEmpty, "fixture produced no heavy hitters — threshold miscalibrated")
  }
}
