package graft

import org.apache.spark.sql.functions._

/** Property companion for s33 (Achlioptas ±1/sqrt(k) JL projection).
  * The oracle row proves Spark == DuckDB bit-for-bit; these prove the
  * projection does what a dimensionality cut is FOR — approximate
  * distance preservation — and that the sign matrix is not degenerate.
  */
class JlProjectionSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"

  test("sign matrix is balanced and rows are distinct") {
    val signs = graft.queries.SimilaritySearch.JlSigns
    assert(signs.size == 16 && signs.forall(_.size == 64))
    signs.zipWithIndex.foreach { case (row, j) =>
      val pos = row.count(_ > 0)
      assert(pos >= 20 && pos <= 44, s"row $j unbalanced: $pos positives")
    }
    assert(signs.distinct.size == 16, "duplicate sign rows")
  }

  test("JL property: projected pairwise distances track originals") {
    val out = SparkEntry.queries("s33_jl_projection")(spark, sfDir)
      .groupBy("vec_id").agg(collect_list(struct(col("j"), col("value"))).as("p"))
      .select(col("vec_id"),
        transform(array_sort(col("p")), x => x.getField("value")).as("proj"))
    val orig = graft.core.Tables.embeddings(spark, sfDir)
      .select(col("vec_id"), col("embedding"))
    val rows = out.join(orig, "vec_id").filter(col("vec_id") < 30)
      .collect()
      .map(r => (r.getAs[scala.collection.Seq[Double]]("proj").toSeq,
        r.getAs[scala.collection.Seq[Float]]("embedding").toSeq.map(_.toDouble)))
    def d2(a: Seq[Double], b: Seq[Double]) =
      a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum
    val ratios = for {
      i <- rows.indices; k <- rows.indices if k > i
      od = d2(rows(i)._2, rows(k)._2) if od > 1e-9
    } yield d2(rows(i)._1, rows(k)._1) / od
    assert(ratios.nonEmpty)
    // E[ratio] = 1; k=16 gives loose per-pair concentration, so check
    // the MEDIAN (tight) and that individual pairs stay within 5x
    val sorted = ratios.sorted
    val median = sorted(sorted.size / 2)
    assert(median > 0.6 && median < 1.6, s"median distortion $median")
    // k=16 concentration is loose per-pair (heavy chi-square tails on
    // near-identical vectors) — the extremes are a sanity rail, not a
    // concentration claim; the median above is the tight pin
    assert(sorted.head > 0.02 && sorted.last < 10.0,
      s"extreme distortion: ${sorted.head} .. ${sorted.last}")
  }
}
