package graft

import org.apache.spark.sql.functions._

/** Value pins for the round-14 rows beyond their cross-engine oracles:
  * g38's roster semantics (status mapping, departure exclusion, the
  * double rollup's uniqueness), g39's interval/prefix-sum engine against
  * a brute-force snapshot cross-join, and s54's decision algebra.
  */
class Round14Spec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  // ---- g38 ICF verification composite -------------------------------------

  private lazy val g38 =
    SparkEntry.queries("g38_icf_verification")(spark, sf).persist()

  test("g38: one row per (extid, study) — the double rollup holds") {
    val n = g38.count()
    val dn = g38.select("extid", "study").distinct().count()
    assert(n > 0 && n == dn, s"$n rows vs $dn distinct keys")
  }

  test("g38: statuses are roster-eligible and metrics map 1:1 to icf_stat") {
    val st = g38.select("status").distinct().collect().map(_.getString(0)).toSet
    assert(st.subsetOf(Set("in", "eos", "out")), s"unexpected statuses $st")
    val pairs = g38.select("icf_stat", "metric").distinct().collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(pairs.get("Rectification").forall(_ == "ICF Unresolved"))
    assert(pairs.get("Lost-Not Found").forall(_ == "ICF Missing"))
    assert(pairs.get("Archived").forall(_ == "ICF Archived"))
  }

  test("g38: departed extids are excluded and aging is non-negative") {
    val rep = spark.read.parquet(s"$sf/lineitem.parquet")
    val par = spark.read.parquet(s"$sf/orders.parquet")
    val dep = par
      .filter(col("o_orderpriority").isin("1-URGENT", "2-HIGH", "5-LOW"))
      .join(rep, col("o_orderkey") === col("l_orderkey"))
      .filter(col("l_returnflag") === "R" && col("l_linestatus") === "O" &&
        col("l_quantity") <= 2)
      .select(col("l_partkey").as("extid")).distinct()
    assert(g38.join(dep, Seq("extid"), "left_semi").isEmpty,
      "a departed extid survived the anti-join")
    assert(g38.filter(col("aging_days") < 0).isEmpty)
  }

  // ---- g39 site issue dashboard --------------------------------------------

  test("g39: interval/prefix-sum engine equals the brute-force snapshot grid") {
    val got = SparkEntry.queries("g39_site_issue_dashboard")(spark, sf)
    // brute force: materialize the week × issue grid exactly as the
    // DuckDB oracle does, in DataFrames
    val ev = graft.core.Tables.events(spark, sf)
      .select(col("event_id"), col("ts").cast("date").as("d"),
        col("user_id"), col("event_type"))
    val op = ev.filter(col("event_type") === "error")
      .select(col("event_id").as("inst"), col("d").as("opened"),
        concat(lit("site"), (col("user_id") % 8).cast("string")).as("site"))
    val res = ev.filter(col("event_type") === "purchase")
      .select((col("event_id") - 5).as("issue_id"), col("d").as("rd"))
      .join(op.select(col("inst")), col("issue_id") === col("inst"))
      .groupBy("issue_id").agg(min("rd").as("resolved"))
    val iss = op.join(res, col("inst") === col("issue_id"), "left")
    val weeks = spark.range(0, 6)
      .select(date_add(lit("2024-01-01").cast("date"),
        (col("id") * 7).cast("int")).as("run_date"))
    val aging = datediff(col("run_date"), col("opened"))
    val want = iss.crossJoin(weeks)
      .withColumn("bucket",
        when(col("resolved").isNotNull && col("resolved") <= col("run_date"),
          "closed")
          .when(col("opened") <= col("run_date") && aging > 14, "15d+")
          .when(col("opened") <= col("run_date") && aging > 7, "8-14d")
          .when(col("opened") <= col("run_date"), "0-7d"))
      .filter(col("bucket").isNotNull)
      .groupBy("run_date", "site", "bucket").agg(count(lit(1)).as("n"))
    assert(got.count() > 0)
    assert(got.exceptAll(want).isEmpty && want.exceptAll(got).isEmpty,
      "interval engine diverges from the brute-force snapshot grid")
  }

  test("g39: closed counts never decrease week over week per site") {
    val closed = SparkEntry.queries("g39_site_issue_dashboard")(spark, sf)
      .filter(col("bucket") === "closed")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("site").orderBy("run_date")
    val bad = closed.withColumn("prev", lag("n", 1).over(w))
      .filter(col("prev").isNotNull && col("n") < col("prev"))
    assert(bad.isEmpty, bad.collect().mkString(", "))
  }

  // ---- s54 ANN retrain decision --------------------------------------------

  private lazy val s54 =
    SparkEntry.queries("s54_ann_retrain_decision")(spark, sf).persist()

  test("s54: cells partition the corpus and fractions reconcile") {
    val nVecs = spark.read.parquet(s"$sf/embeddings.parquet").count()
    assert(s54.agg(sum("n_total")).head().getLong(0) == nVecs)
    val bad = s54.filter(
      abs(col("tomb_frac") - col("n_tomb").cast("double") / col("n_total"))
        > 1e-12)
    assert(bad.isEmpty)
  }

  // ---- reconcileStatsBy end-state invariant ---------------------------------
  // The rewrite's contract, stated once and checked after EVERY step of
  // an adversarial snapshot sequence (adds, removes, content changes,
  // corruption, reverts): the stored stats version must equal a FRESH
  // decode of exactly the current corpus's decodable payloads — no
  // stale rows, no missing rows, regardless of what the incremental
  // path reused, skipped, or failed.
  test("reconcile invariant: store == fresh decode after every snapshot") {
    import graft.operators.Multimodal
    val store = graft.core.TempDirs.scratch("m12inv_").toString
    // content selector: image formula id, or None for undecodable bytes
    def present(ids: Map[Long, Option[Long]])
        (sub: org.apache.spark.sql.DataFrame) = {
      val pairs = ids.toSeq.map { case (k, v) => (k, v.getOrElse(-1L)) }
      val sel = typedlit(pairs.toMap)
      val withSrc = sub.withColumn("__src",
        element_at(sel, col("doc_id")))
      Multimodal.withImagePayload(
          withSrc.withColumn("__orig", col("doc_id"))
            .withColumn("doc_id", col("__src")), "doc_id")
        .withColumn("payload",
          when(col("__src") === -1L, lit("corrupt!".getBytes))
            .otherwise(col("payload")))
        .withColumn("doc_id", col("__orig"))
        .drop("__src", "__orig")
    }
    def check(ids: Map[Long, Option[Long]], label: String): Unit = {
      val s = spark
      val idsDf = s.createDataFrame(ids.keys.toSeq.map(Tuple1(_)))
        .toDF("doc_id")
      val r = Multimodal.reconcileStatsBy(
        s, idsDf, "doc_id", present(ids), "payload", store)
      val stored = s.read.parquet(r.path)
      val fresh = Multimodal.reduceStats(Multimodal.decodeStats(
        present(ids)(idsDf), "doc_id", "payload"))
      assert(stored.exceptAll(fresh).isEmpty &&
        fresh.exceptAll(stored).isEmpty,
        s"$label: store diverges from a fresh decode")
      assert(r.total == fresh.count(), s"$label: total ${r.total}")
    }
    // 1: initial corpus, one undecodable payload
    check(Map(1L -> Some(1L), 2L -> Some(2L), 3L -> None), "initial")
    // 2: add ids, change id 2's content, keep the bad one
    check(Map(1L -> Some(1L), 2L -> Some(99L), 3L -> None,
      4L -> Some(4L)), "add+change")
    // 3: remove id 1, fix the bad payload, corrupt a formerly-good one
    check(Map(2L -> Some(99L), 3L -> Some(3L), 4L -> None), "remove+fix+break")
    // 4: revert id 4 to its known-bad content AND id 2 to its original
    check(Map(2L -> Some(2L), 3L -> Some(3L), 4L -> None), "revert")
    // 5: no-op re-run must decode nothing and still hold
    val idsDf = spark.createDataFrame(Seq(2L, 3L, 4L).map(Tuple1(_)))
      .toDF("doc_id")
    val last = Map(2L -> Some(2L), 3L -> Some(3L), 4L -> (None: Option[Long]))
    val r = Multimodal.reconcileStatsBy(
      spark, idsDf, "doc_id", present(last), "payload", store)
    assert(r.decoded == 0 && r.failed == 0,
      s"no-op re-run must reuse everything: $r")
  }

  test("s54: the decision column is exactly the documented CASE") {
    val bad = s54.filter(col("decision") =!=
      when(col("l2_shift") > 0.825, "rebuild")
        .when(col("tomb_frac") > 0.15, "compact")
        .otherwise("keep"))
    assert(bad.isEmpty, bad.collect().mkString(", "))
    val ds = s54.select("decision").distinct().collect().map(_.getString(0)).toSet
    assert(ds.subsetOf(Set("rebuild", "compact", "keep")))
  }
}
