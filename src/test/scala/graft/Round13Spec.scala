package graft

import org.apache.spark.sql.functions._

/** Value pins for the round-13 rows whose oracles prove cross-engine
  * equality but not adversarial semantics: pass@k against brute-force
  * combinatorics, the Murphy decomposition's inequalities, and tombstone
  * exclusion. */
class Round13Spec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("a60: pass@5 matches brute-force binomials and dominates the biased estimator") {
    val out = SparkEntry.queries("a60_pass_at_k")(spark, sf)
      .select("task_id", "n", "c", "pass_at_1", "pass_at_5").collect()
    assert(out.nonEmpty)
    def choose(n: Long, k: Long): BigInt =
      if (k < 0 || k > n) BigInt(0)
      else (BigInt(n - k + 1) to BigInt(n)).product / (BigInt(1) to BigInt(k)).product
    out.foreach { r =>
      val (n, c) = (r.getLong(1), r.getLong(2))
      val want = 1.0 - (BigDecimal(choose(n - c, 5)) / BigDecimal(choose(n, 5))).toDouble
      val got = r.getDouble(4)
      assert(math.abs(got - want) < 1e-8,
        s"task ${r.getLong(0)}: pass@5 $got vs brute-force $want (n=$n c=$c)")
      // the unbiased estimator dominates the biased 1-(1-c/n)^k
      val biased = 1.0 - math.pow(1.0 - c.toDouble / n, 5)
      assert(got >= biased - 1e-9, s"unbiased $got < biased $biased")
      assert(got >= r.getDouble(3) - 1e-9, "pass@5 must be >= pass@1")
    }
  }

  test("a61: Murphy decomposition inequalities and ranges") {
    val r = SparkEntry.queries("a61_brier_decomposition")(spark, sf).head()
    val (brier, rel, res, unc) =
      (r.getAs[Double]("brier"), r.getAs[Double]("reliability"),
        r.getAs[Double]("resolution"), r.getAs[Double]("uncertainty"))
    assert(brier >= 0 && brier <= 1 && rel >= 0 && res >= 0)
    assert(unc >= 0 && unc <= 0.25, "uncertainty = obar(1-obar) caps at 1/4")
    // binned decomposition: brier = rel - res + unc + (within-bin
    // forecast variance) - 2(within-bin p,o covariance). With 0.1-wide
    // bins, |WBV| <= 0.05^2 and |cov| <= 0.05*0.5, so the residual is
    // bounded by ~0.053 — the identity holds to bin width, no tighter
    // (the fixture's outcome tracks its forecast, so the covariance
    // term is genuinely nonzero)
    assert(math.abs(brier - (rel - res + unc)) <= 0.053,
      s"brier $brier vs rel-res+unc ${rel - res + unc}: residual beyond bin-width bound")
    assert(res <= unc + 1e-9, "resolution cannot exceed uncertainty")
  }

  test("s52: tombstoned vectors appear as neither queries nor neighbors") {
    val out = SparkEntry.queries("s52_ann_tombstones")(spark, sf)
      .select("query_id", "neighbor_id").collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      assert(r.getLong(0) % 7 != 3, s"deleted id ${r.getLong(0)} used as query")
      assert(r.getLong(1) % 7 != 3, s"deleted id ${r.getLong(1)} returned as neighbor")
    }
  }

  test("a62: kappa reconciles with its own p_o/p_e and sits strictly below p_o") {
    val r = SparkEntry.queries("a62_cohens_kappa")(spark, sf).head()
    val (po, pe, kappa) =
      (r.getAs[Double]("p_o"), r.getAs[Double]("p_e"), r.getAs[Double]("kappa"))
    assert(kappa >= -1.0 && kappa <= 1.0)
    assert(po > pe, "fixture has genuine above-chance agreement")
    assert(kappa < po, "chance correction must shrink raw agreement")
    assert(math.abs(kappa - (po - pe) / (1.0 - pe)) < 1e-6,
      s"kappa $kappa vs identity ${(po - pe) / (1.0 - pe)}")
  }

  test("io25: compaction preserves live rows exactly, removes only tombstones") {
    val out = SparkEntry.queries("io25_tombstone_compaction")(spark, sf)
      .select("n_before", "n_removed", "n_after").collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      assert(r.getLong(0) == r.getLong(1) + r.getLong(2),
        "before = removed + after must hold per cell")
    }
    val totalAfter = out.map(_.getLong(2)).sum
    val live = spark.read.parquet(s"$sf/embeddings.parquet")
      .filter(col("vec_id") % 7 =!= 3).count()
    assert(totalAfter == live, "compacted store must hold exactly the live set")
  }

  test("a63: fitted strengths recover the fixture's true Bradley-Terry order") {
    // sf0.01, not the suite's sf0.001: ~1.5k orders give the 28 matchups
    // too few games for endpoint recovery (the gate runs at sf0.01 too)
    val out = SparkEntry.queries("a63_bradley_terry")(spark, "/root/testdata/sf0.01")
      .select("model", "pi", "share").collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2))).sortBy(_._1)
    assert(out.length == 8)
    // the fixture decides (a, b) by h % (a+b+2) < a+1 — true strengths
    // 1..8. Three MM rounds on a finite sample can transpose one
    // adjacent mid-table pair, so the pin is rank recovery, not strict
    // monotonicity: Spearman rho >= 0.9 plus exact endpoints
    val ranks = out.sortBy(_._2).map(_._1).zipWithIndex.toMap
    val n = out.length
    val d2 = out.map { case (m, _, _) => val d = ranks(m) - m.toInt; d * d }.sum
    val rho = 1.0 - 6.0 * d2 / (n * (n * n - 1.0))
    assert(rho >= 0.9, s"Spearman rho $rho below 0.9: fit lost the true order")
    assert(out.maxBy(_._2)._1 == 7L && out.minBy(_._2)._1 == 0L,
      "strongest/weakest models must land at the endpoints")
    val shareSum = out.map(_._3).sum
    assert(math.abs(shareSum - 1.0) < 1e-6, s"shares sum to $shareSum")
  }

  test("s53: upserted index serves exactly the latest generation") {
    val out = SparkEntry.queries("s53_ann_upserts")(spark, sf)
      .agg(sum("n_vectors")).head().getLong(0)
    val nVecs = spark.read.parquet(s"$sf/embeddings.parquet").count()
    assert(out == nVecs, "every id exactly once after upserts supersede")
  }

  test("reconcileStats append-only mode keeps absent ids and skips re-delivery") {
    val store = graft.core.TempDirs.scratch("st24spec_").toString
    val all = spark.range(6).select(col("id").as("doc_id"))
    def present(df: org.apache.spark.sql.DataFrame) =
      graft.operators.Multimodal.withImagePayload(df, "doc_id")
    val r1 = graft.operators.Multimodal.reconcileStats(
      spark, present(all.filter(col("doc_id") < 4)), "doc_id", "payload",
      store, dropMissing = false)
    assert((r1.decoded, r1.total) == ((4L, 4L)))
    // arrival batch overlaps batch 1 (ids 2,3 re-delivered): only the
    // genuinely new ids decode, absent ids 0,1 persist
    val r2 = graft.operators.Multimodal.reconcileStats(
      spark, present(all.filter(col("doc_id") >= 2)), "doc_id", "payload",
      store, dropMissing = false)
    assert((r2.decoded, r2.total) == ((2L, 6L)), s"got $r2")
    // full re-delivery is a no-op
    val r3 = graft.operators.Multimodal.reconcileStats(
      spark, present(all), "doc_id", "payload", store, dropMissing = false)
    assert((r3.decoded, r3.total) == ((0L, 6L)))
  }
}
