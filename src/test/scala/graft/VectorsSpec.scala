package graft

import org.apache.spark.sql.functions._
import graft.operators.Vectors

/** Pins for the round-10 vector operators: centroid drift geometry on
  * constructed halves, and radius-search recall/threshold behavior the
  * s44 oracle (which replays candidates) cannot distinguish from a
  * broken exact-check.
  */
class VectorsSpec extends SparkSpec {

  private def vecDf(rows: Seq[(Long, Int, Int, Seq[Double])]) = {
    val values = rows.map { case (id, lb, hf, v) =>
      s"($id, $lb, $hf, ${v.mkString("array(", ",", ")")})"
    }.mkString(", ")
    df(s"SELECT * FROM VALUES $values t(vec_id, label, half, emb)")
      .withColumn("vec_id", col("vec_id").cast("long"))
      .withColumn("embedding", col("emb").cast("array<float>")).drop("emb")
  }

  test("centroidDrift: identical halves -> cos 1 / shift 0; orthogonal -> cos 0") {
    val same = vecDf(Seq(
      (1L, 0, 0, Seq(1.0, 0.0)), (2L, 0, 1, Seq(1.0, 0.0)),
      (3L, 0, 0, Seq(1.0, 0.0)), (4L, 0, 1, Seq(1.0, 0.0))))
    val r = Vectors.centroidDrift(same, "label", "half", "embedding").head()
    assert(r.getAs[Long]("n0") == 2 && r.getAs[Long]("n1") == 2)
    assert(math.abs(r.getAs[Double]("cos_drift") - 1.0) < 1e-9)
    assert(r.getAs[Double]("l2_shift") < 1e-9)
    val orth = vecDf(Seq(
      (1L, 0, 0, Seq(1.0, 0.0)), (2L, 0, 1, Seq(0.0, 1.0))))
    val o = Vectors.centroidDrift(orth, "label", "half", "embedding").head()
    assert(math.abs(o.getAs[Double]("cos_drift")) < 1e-9)
    assert(math.abs(o.getAs[Double]("l2_shift") - math.sqrt(2.0)) < 1e-6)
  }

  test("radiusSearchLsh: finds the planted duplicate, respects the threshold") {
    // 64-dim corpus: vec 0 is the query; vec 1 is its exact duplicate
    // (cos 1); vec 2 is near-orthogonal (alternating signs)
    val base = Seq.tabulate(64)(i => 1.0 + 0.01 * i)
    val anti = Seq.tabulate(64)(i => if (i % 2 == 0) 1.0 else -1.0)
    val d = vecDf(Seq(
      (0L, 0, 0, base), (1L, 0, 0, base), (2L, 0, 0, anti)))
    val out = Vectors.radiusSearchLsh(d, d.filter(col("vec_id") === 0),
        "vec_id", "embedding", tables = 2, bits = 6, dims = 64,
        threshold = 0.9)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    // the duplicate survives (identical vectors share every bucket);
    // the near-orthogonal vector never passes the exact re-check
    assert(out.exists { case (q, m, c) => q == 0 && m == 1 && c > 0.999 })
    assert(!out.exists { case (_, m, _) => m == 2 })
    // self-matches are excluded
    assert(!out.exists { case (q, m, _) => q == m })
  }

  test("radiusSearchLsh: excludeSelf=false keeps id-coincident cross-space matches") {
    // disjoint id spaces that happen to collide numerically: corpus id 7
    // IS a genuine match for query id 7 (ADVICE r10 — the default id
    // filter would silently drop it)
    val base = Seq.tabulate(64)(i => 1.0 + 0.01 * i)
    val corpus = vecDf(Seq((7L, 0, 0, base)))
    val queries = vecDf(Seq((7L, 0, 0, base)))
    def run(excl: Boolean) = Vectors.radiusSearchLsh(corpus, queries,
      "vec_id", "embedding", tables = 2, bits = 6, dims = 64,
      threshold = 0.9, excludeSelf = excl).count()
    assert(run(false) == 1L) // disjoint-space contract keeps the match
    assert(run(true) == 0L)  // shared-space contract drops the self-row
  }

  test("centroidDrift: a label with rows in only one half emits nothing") {
    val d = vecDf(Seq(
      (1L, 0, 0, Seq(1.0, 0.0)), (2L, 0, 1, Seq(1.0, 0.0)),
      (3L, 9, 0, Seq(0.5, 0.5)))) // label 9: all rows in half 0
    val out = Vectors.centroidDrift(d, "label", "half", "embedding")
      .collect().map(_.getAs[Int]("label")).toSet
    assert(out == Set(0), s"got $out") // no null/NaN row for label 9
  }
}
