package graft

import org.apache.spark.sql.functions._
import graft.operators.Multimodal

/** Value pins for the round-15 work beyond the cross-engine oracles:
  * the null-payload failure-ledger law (ADVICE r14) and the g41 lab
  * summary cascade/normalization branches.
  */
class Round15Spec extends SparkSpec {

  // ---- ADVICE r14: null payloads in the reconcile ledger -------------------

  test("reconcile: a null payload fails ONCE and never regrows failed_v") {
    val store = graft.core.TempDirs.scratch("m12null_").toString
    val ids = spark.range(4).select(col("id").as("doc_id"))
    // ids 0-2 carry real images; id 3 presents a NULL payload. Before
    // the sentinel hash, the (id, null) key matched no anti-join, so
    // every reconcile re-attempted the decode and appended a duplicate
    // failure row — failed_v grew without bound for that id.
    def present(sub: org.apache.spark.sql.DataFrame) =
      Multimodal.withImagePayload(sub, "doc_id")
        .withColumn("payload",
          when(col("doc_id") === 3, lit(null).cast("binary"))
            .otherwise(col("payload")))
    val r1 = Multimodal.reconcileStatsBy(
      spark, ids, "doc_id", present, "payload", store)
    assert((r1.decoded, r1.total, r1.failed) == ((3L, 3L, 1L)), s"run 1: $r1")
    val r2 = Multimodal.reconcileStatsBy(
      spark, ids, "doc_id", present, "payload", store)
    assert((r2.decoded, r2.total, r2.failed) == ((0L, 3L, 0L)), s"run 2: $r2")
    val r3 = Multimodal.reconcileStatsBy(
      spark, ids, "doc_id", present, "payload", store)
    assert((r3.decoded, r3.total, r3.failed) == ((0L, 3L, 0L)), s"run 3: $r3")
    // exactly ONE failure row ever written, under the sentinel hash
    val failedDirs = graft.core.Fs.listDir(java.nio.file.Path.of(store))
      .map(_.getFileName.toString).filter(_.startsWith("failed_v"))
    assert(failedDirs == List("failed_v1"), s"failed versions: $failedDirs")
    val failed = spark.read.parquet(s"$store/failed_v1").collect()
    assert(failed.length == 1 && failed(0).getLong(0) == 3L)
    // the sentinel is md5 of the empty byte string on BOTH hash paths
    assert(failed(0).getString(1) == "d41d8cd98f00b204e9800998ecf8427e")
    // content arriving for the id re-attempts and joins the stats table
    val r4 = Multimodal.reconcileStatsBy(
      spark, ids, "doc_id",
      sub => Multimodal.withImagePayload(sub, "doc_id"), "payload", store)
    assert((r4.decoded, r4.total, r4.failed) == ((1L, 4L, 0L)), s"run 4: $r4")
  }

  // ---- g41/g42 lab reports: cascade, normalization, latest-ties ------------

  private def labFixture(rows: Seq[(Long, String, String, String, String,
      String, String, String)]) = {
    spark.createDataFrame(rows)
      .toDF("sample", "study", "submit", "sample_status",
        "mt1", "mt2", "pend", "quar")
      .withColumn("submit", col("submit").cast("date"))
  }

  test("g41 cascade: per-status coalesce order and na_if fall-through") {
    val f = labFixture(Seq(
      // Approved prefers mt2 over mt1; pend/quar must be IGNORED
      (1L, "efficacy", "2024-01-01", "Approved",
        "other", "data_mismatch", "dbs_incomplete", "icf_status"),
      // Approved with mt2 = 'none' normalizes away -> falls to mt1
      (2L, "efficacy", "2024-01-01", "Approved",
        "tracking_issue", "none", null, null),
      // Pending prefers its own select over the mt pair
      (3L, "efficacy", "2024-01-01", "Pending",
        "other", "data_mismatch", "dbs_incomplete", null),
      // Pending with pend = '' falls to mt2
      (4L, "efficacy", "2024-01-01", "Pending",
        "other", "data_mismatch", "", null),
      // Quarantine prefers its own select
      (5L, "efficacy", "2024-01-01", "Quarantine",
        "other", "data_mismatch", null, "icf_status"),
      // Quarantine with quar = 'none' falls to the mt pair
      (6L, "efficacy", "2024-01-01", "Quarantine",
        "other", null, null, "none"),
      // every select '' / 'none' / NULL -> the cascade yields NULL
      (7L, "efficacy", "2024-01-01", "Approved", "", "none", null, null),
      // NULL status falls off the CASE -> NULL
      (8L, "efficacy", "2024-01-01", null,
        "other", "data_mismatch", "dbs_incomplete", "icf_status")))
    val out = graft.queries.LabReports.incidenceCascade(f, lab2 = false)
      .select("sample", "incidences").collect()
      .map(r => r.getLong(0) -> Option(r.getString(1))).toMap
    assert(out(1L) == Some("data_mismatch"))
    assert(out(2L) == Some("tracking_issue"))
    assert(out(3L) == Some("dbs_incomplete"))
    assert(out(4L) == Some("data_mismatch"))
    assert(out(5L) == Some("icf_status"))
    assert(out(6L) == Some("other")) // quar='none', mt2 NULL -> mt1
    assert(out(7L) == None)
    assert(out(8L) == None)
    // lab2 mode: ONLY quarantine rows contribute, from quar alone
    val out2 = graft.queries.LabReports.incidenceCascade(f, lab2 = true)
      .select("sample", "incidences").collect()
      .map(r => r.getLong(0) -> Option(r.getString(1))).toMap
    assert(out2(5L) == Some("icf_status"))
    assert(out2(1L) == None && out2(3L) == None && out2(6L) == None)
  }

  test("g41 latest-per-sample keeps ALL ties, splits tokens, maps labels") {
    val f = labFixture(Seq(
      // sample 1: two rows at the max date (ties BOTH kept), one older
      (1L, "efficacy", "2024-02-01", "Approved",
        null, "dbs_incomplete participant_issue", null, null),
      (1L, "efficacy", "2024-02-01", "Pending",
        null, null, "tracking_issue", null),
      (1L, "efficacy", "2024-01-01", "Approved",
        null, "other", null, null),
      // sample 2: a NULL cascade survives the unnest as one NULL row
      (2L, "pk", "2024-03-01", "Approved", "", "none", null, null)))
    val inc = graft.queries.LabReports.latestIncidences(
      graft.queries.LabReports.incidenceCascade(f, lab2 = false))
    val rows = inc.select("sample", "code", "incidence_long").collect()
      .map(r => (r.getLong(0), Option(r.getString(1)), Option(r.getString(2))))
      .toSet
    assert(rows == Set(
      (1L, Some("dbs_incomplete"), Some("DBS incomplete")),
      (1L, Some("participant_issue"),
        Some("Participant not preselected or wrong age")),
      (1L, Some("tracking_issue"), Some("Sample not in the tracking form")),
      (2L, None, None)), s"got $rows")
  }

  test("g41 summary: to-be-logged derives field - lab, efficacy only") {
    val field = spark.createDataFrame(
        Seq((10L, "efficacy"), (11L, "efficacy"), (12L, "efficacy"),
          (13L, "pk"), (14L, "pk")))
      .toDF("sample", "study")
    val f = labFixture(Seq(
      (10L, "efficacy", "2024-01-01", "Approved", "other", null, null, null),
      (11L, "efficacy", "2024-01-01", "Pending", null, null,
        "tracking_issue", null),
      (13L, "pk", "2024-01-01", "Approved", "other", null, null, null),
      // NULL status: excluded from every logged metric
      (12L, "efficacy", "2024-01-01", null, "other", null, null, null)))
    val d = graft.queries.LabReports.labSummary(
      graft.queries.LabReports.latestIncidences(
        graft.queries.LabReports.incidenceCascade(f, lab2 = false)), field)
      .collect()
      .map(r => r.getString(0) ->
        (Option(r.get(1)).map(_.asInstanceOf[Long]),
         Option(r.get(2)).map(_.asInstanceOf[Long]))).toMap
    assert(d("Samples collected to date (field)") == ((Some(3L), Some(2L))))
    assert(d("Samples logged in Lab") == ((Some(2L), Some(1L))))
    // 3 field - 2 logged = 1; pk NEVER gets the difference (Rmd quirk)
    assert(d("Samples to be logged in Lab") == ((Some(1L), None)))
    assert(d("Samples Approved") == ((Some(1L), Some(1L))))
    assert(d("Samples Pending") == ((Some(1L), None)))
  }

  // ---- g43: the site-UI variant family --------------------------------------

  test("g43 covers all four site-UI variants; fused pass == per-variant runs") {
    val sf = "/root/testdata/sf0.001"
    val fused = SparkEntry.queries("g43_site_ui_variants")(spark, sf).persist()
    // the reference family: cra_site_ui + icf/lab/pharmacy_site_ui
    val forms = fused.select("form").distinct().collect()
      .map(_.getString(0)).toSet
    assert(forms == Set("CRA", "ICF", "LAB", "PHARM"), s"forms: $forms")
    // parameterization law: the fused run sliced to one form equals the
    // g39-shaped engine run on that form's records alone (the variant
    // Rmds ARE the cra engine under a per-form filter + floor)
    val ev = graft.core.Tables.events(spark, sf)
      .select(col("event_id"), col("ts").cast("date").as("d"),
        col("user_id"), col("event_type"))
    for ((form, floor) <- Seq(("CRA", "2024-01-01"), ("ICF", "2024-01-08"),
        ("LAB", "2024-01-15"), ("PHARM", "2024-01-01"))) {
      val op = ev.filter(col("event_type") === "error")
        .select(col("event_id").as("inst"), col("d").as("opened"),
          expr(graft.queries.Reporting.SiteUiFormFrag).as("form"),
          concat(lit("site"), (col("user_id") % 8).cast("string")).as("site"))
        .filter(col("form") === form && col("opened") >= lit(floor).cast("date"))
        .drop("form")
      val res = ev.filter(col("event_type") === "purchase")
        .select((col("event_id") - 5).as("issue_id"), col("d").as("rd"))
        .join(op.select("inst"), col("issue_id") === col("inst"))
        .filter(col("rd") >= lit(floor).cast("date"))
        .groupBy("issue_id").agg(min("rd").as("resolved"))
      val iss = op.join(res, col("inst") === col("issue_id"), "left")
      val solo = graft.queries.Reporting
        .siteIssueSnapshots(iss, Seq("site"), "2024-01-01", 6)
      val sliced = fused.filter(col("form") === form).drop("form")
      assert(sliced.exceptAll(solo).isEmpty && solo.exceptAll(sliced).isEmpty,
        s"variant $form diverges from its solo run")
    }
    fused.unpersist()
    ()
  }

  // ---- s55: maintenance actuation laws --------------------------------------

  test("s55 actuation: live-set law per decision class, retrain on rebuild") {
    val sf = "/root/testdata/sf0.001"
    val dec = SparkEntry.queries("s54_ann_retrain_decision")(spark, sf)
      .select("cell_id", "decision", "n_total", "n_tomb").collect()
      .map(r => r.getLong(0) ->
        ((r.getString(1), r.getLong(2), r.getLong(3)))).toMap
    val out = SparkEntry.queries("s55_ann_maintenance_apply")(spark, sf)
      .collect()
    assert(out.length == dec.size, "one audit row per cell")
    out.foreach { r =>
      val (cell, decision, nb, na) =
        (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3))
      val (d0, nTotal, nTomb) = dec(cell)
      assert(decision == d0, s"cell $cell decision drifted")
      assert(nb == nTotal, s"cell $cell n_before")
      if (decision == "keep")
        // keep cells are untouched — tombstones still present, served
        // by read-time anti-joins until a later compaction
        assert(na == nb, s"keep cell $cell rewritten")
      else
        assert(na == nb - nTomb, s"cell $cell live-set law")
      // retrained centroid exists exactly for rebuild cells with
      // surviving members
      val centNull = r.isNullAt(5)
      if (decision == "rebuild" && na > 0)
        assert(!centNull, s"rebuild cell $cell has no retrained centroid")
      else assert(centNull, s"cell $cell unexpectedly retrained")
      // surviving cells carry an id manifest
      assert((na == 0) == r.isNullAt(4), s"cell $cell ids_md5 presence")
    }
  }

  test("reconcile: no scratch dirs survive a reconcile (staged decode)") {
    val store = graft.core.TempDirs.scratch("m12scr_").toString
    val ids = spark.range(3).select(col("id").as("doc_id"))
    def present(sub: org.apache.spark.sql.DataFrame) =
      Multimodal.withImagePayload(sub, "doc_id")
    Multimodal.reconcileStatsBy(spark, ids, "doc_id", present, "payload", store)
    Multimodal.reconcileStatsBy(spark, ids, "doc_id", present, "payload", store)
    val leftover = graft.core.Fs.listDir(java.nio.file.Path.of(store))
      .map(_.getFileName.toString).filter(_.startsWith("scratch_"))
    assert(leftover.isEmpty, s"scratch dirs left behind: $leftover")
  }
}
