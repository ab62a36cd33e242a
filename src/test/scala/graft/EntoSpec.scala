package graft

import org.apache.spark.sql.functions._

/** Invariant companions for the g31/g32/g33 ento composites — the
  * oracle rows prove Spark == DuckDB; these prove each load-bearing
  * stage of the reference chain is actually exercised by the fixture
  * (a vacuous fixture would pass the gate while pinning nothing).
  */
class EntoSpec extends SparkSpec {

  // sf0.01: the 4-digit-custkey pad branch and the acctbal<-900 excluded
  // clusters only exist at this scale (sf0.001 has 150 customers)
  private val sfDir = "/root/testdata/sf0.01"

  private lazy val g31 =
    SparkEntry.queries("g31_ento_sponsor_tubes")(spark, sfDir).persist()
  private lazy val g32 =
    SparkEntry.queries("g32_ento_lab_template")(spark, sfDir).persist()
  private lazy val g33 =
    SparkEntry.queries("g33_ento_monitoring")(spark, sfDir).persist()

  // ---- g31 sponsor light-trap chain ---------------------------------------

  test("g31: both tube dispositions and both species survive the chain") {
    val disp = g31.select("stored_or_dissected").distinct()
      .collect().map(_.getString(0)).toSet
    assert(disp == Set("Dissected", "Sent to Storage"))
    val sp = g31.select("species").distinct().collect().map(_.getString(0)).toSet
    assert(sp == Set("An. gambiae", "An. funestus"))
  }

  test("g31: the nchar==4 zero-pad branch fires (and only on 4-char ids)") {
    val padded = g31.filter(col("hhid_leid").startsWith("0")
      && length(col("hhid_leid")) === 5)
    assert(padded.count() > 0)
    // no unpadded 4-char label may survive
    assert(g31.filter(length(col("hhid_leid")) === 4).count() == 0)
  }

  test("g31: num_samp explosion caps the per-key tube index") {
    // class c3 has count 2 only for orderkey%5==0, else 0 — so every
    // unfed_funestus tube must come from a %5==0 order, and no [n>2]
    // index can have matched (num_samp <= 2 for that class)
    val uf = g31.filter(col("sample_tube_id").isNotNull)
    assert(uf.count() > 0)
    val badIdx = SparkEntry.queries("g31_ento_sponsor_tubes")(spark, sfDir)
      .filter(col("sample_tube_id").endsWith("-3-3"))
    assert(badIdx.count() == 0, "class 3 num_samp is <= 2; idx 3 must never match")
  }

  test("g31: parity hop is 1:1 (no fan-out from the wing form)") {
    val dup = g31.groupBy("sample_tube_id").count().filter(col("count") > 1)
    assert(dup.count() == 0)
  }

  // ---- g32 lab template ---------------------------------------------------

  test("g32: only CDCD tubes pass the prefix filter") {
    assert(g32.filter(!col("sample_tube_id").startsWith("CDCD-")).count() == 0)
    assert(g32.count() > 0)
  }

  test("g32: cluster is re-derived from the ID string on both branches") {
    val le = g32.filter(col("le_id") =!= "")
    val hh = g32.filter(col("household_id") =!= "")
    assert(le.count() > 0 && hh.count() > 0)
    // LE branch: cluster must equal the number embedded between L and -
    val leBad = le.filter(
      col("cluster") =!= regexp_replace(col("le_id"), "^.*L\\s*|\\s*-.*$", "")
        .cast("bigint"))
    assert(leBad.count() == 0)
    // HH branch: cluster = first two characters of the id
    val hhBad = hh.filter(
      col("cluster") =!= substring(col("household_id"), 1, 2).cast("bigint"))
    assert(hhBad.count() == 0)
  }

  test("g32: keep-first-per-tube dedup leaves tube ids unique") {
    val dup = g32.groupBy("sample_tube_id").count().filter(col("count") > 1)
    assert(dup.count() == 0)
  }

  test("g32: uppercase + NA->'' cosmetics applied") {
    assert(g32.filter(col("species") =!= upper(col("species"))).count() == 0)
    // parity_status must be '' (not NULL) where the wing form missed
    assert(g32.filter(col("parity_status").isNull).count() == 0)
  }

  test("g32: assignment dim join broadcasts") {
    val plan = g32.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan.take(2000))
  }

  // ---- g33 monitoring recruitment/withdrawals ------------------------------

  test("g33: a withdrawn id never appears as active") {
    val w = g33.filter(col("active_or_withdrawn") === "withdrawn")
      .select("id").distinct()
    val a = g33.filter(col("active_or_withdrawn") === "active")
      .select("id").distinct()
    assert(a.join(w, Seq("id")).count() == 0)
    assert(w.count() > 0 && a.count() > 0)
  }

  test("g33: excluded-cluster override rewrites the status") {
    val excl = g33.filter(col("active_or_withdrawn") === "cluster excluded from study")
    assert(excl.count() > 0)
    // an excluded cluster must have NO rows left under any other status
    val exclClusters = excl.select("cluster_number").distinct()
    val leak = g33.filter(col("active_or_withdrawn") =!= "cluster excluded from study")
      .join(exclClusters, Seq("cluster_number"))
    assert(leak.count() == 0)
  }

  test("g33: only withdrawn rows carry a withdrawal date") {
    assert(g33.filter(col("active_or_withdrawn") === "active"
      && col("date_of_withdrawal").isNotNull).count() == 0)
    assert(g33.filter(col("active_or_withdrawn") === "withdrawn"
      && col("date_of_withdrawal").isNull).count() == 0)
  }
}
