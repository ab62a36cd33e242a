package graft.queries

import org.apache.spark.sql.functions._
import graft.core.{Query, Tables}
import graft.operators.{Anomalies, Resolution, Standardize, Windows}

/** Composite operators: multi-hop lookup chains (SURVEY §2.3 J12), the
  * threshold detector in the uniform anomaly schema (A12), and the
  * flagship end-to-end smoke slice (§7.2): dedup → duplicate detection →
  * anomaly projection, the thinnest full path through the engine.
  */
object Composite {

  val queries: Seq[Query] = Seq(

    // ---- J12: multi-hop lookup chain with key normalization -----------------
    // lineitem → orders → customer → nation → region, with a lpad-
    // normalized join key in the middle (the reference's ento chains
    // normalize 4-char ids before joining).
    Query("j14_multihop_chain",
      """SELECT r_name, count(*) AS n, CAST(sum(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS qty
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN (SELECT c_custkey, lpad(CAST(c_nationkey AS VARCHAR), 4, '0') AS nk FROM customer) c
        |  ON o_custkey = c_custkey
        |JOIN (SELECT lpad(CAST(n_nationkey AS VARCHAR), 4, '0') AS nk2, n_regionkey FROM nation) n
        |  ON nk = nk2
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY r_name""".stripMargin) {
      (s, d) => {
        val c = Tables.customer(s, d).select(col("c_custkey"),
          Standardize.padHhid(col("c_nationkey"), 4).as("nk"))
        val n = Tables.nation(s, d).select(
          Standardize.padHhid(col("n_nationkey"), 4).as("nk2"), col("n_regionkey"))
        Tables.lineitem(s, d)
          .join(Tables.orders(s, d), col("l_orderkey") === col("o_orderkey"))
          .join(c, col("o_custkey") === col("c_custkey"))
          .join(broadcast(n), col("nk") === col("nk2"))
          .join(broadcast(Tables.region(s, d)), col("n_regionkey") === col("r_regionkey"))
          .groupBy("r_name")
          .agg(count(lit(1)).as("n"),
            sum(col("l_quantity").cast("decimal(18,4)")).cast("double").as("qty"))
      }
    },

    // ---- A12: threshold detector in the uniform anomaly schema ---------------
    Query("a12_threshold_anomalies",
      """SELECT 'lineitem__' || CAST(l_orderkey AS VARCHAR) || '-' || CAST(l_linenumber AS VARCHAR)
        |         || '__qty_gt_49' AS resolution_id,
        |       CAST(l_orderkey AS VARCHAR) || '-' || CAST(l_linenumber AS VARCHAR) AS key,
        |       'lineitem' AS form_id, 'qty_gt_49' AS anomalies_id,
        |       'qty_gt_49: value=' || CAST(l_quantity AS VARCHAR) || ' vs threshold=49.0'
        |         AS anomalies_description,
        |       'to_do' AS resolution_status
        |FROM lineitem WHERE l_quantity > 49""".stripMargin) {
      (s, d) => Anomalies.detectThreshold(
        Tables.lineitem(s, d)
          .withColumn("__k", concat_ws("-", col("l_orderkey"), col("l_linenumber"))),
        "lineitem", "qty_gt_49", "__k", col("l_quantity"), 49.0)
    },

    // ---- §7.2 flagship slice: dedup → duplicate detector → anomaly -----------
    // "orders" as the visit form: latest order per (status, custkey) =
    // latest-per-group dedup (A10), then customers holding duplicate
    // priorities across statuses (A11), projected to the anomaly schema
    // with a sorted keylist (A5).
    // ---- A15: anomaly summary snapshot ---------------------------------------
    // The reference's end-of-run tally: consolidate every detector's
    // uniform output, count per (form_id, anomalies_id), stamp the
    // snapshot date. Ref: 05.run_anomaly_detection.R:91-96.
    Query("a15_anomaly_snapshot",
      """WITH dup AS (
        |  SELECT 'lineitem' AS form_id, 'dup_orderkey' AS anomalies_id
        |  FROM lineitem GROUP BY l_orderkey HAVING count(*) >= 2),
        |thr AS (
        |  SELECT 'lineitem' AS form_id, 'qty_gt_49' AS anomalies_id
        |  FROM lineitem WHERE l_quantity > 49)
        |SELECT form_id, anomalies_id, count(*) AS n,
        |       CAST('2026-01-01' AS DATE) AS snapshot_date
        |FROM (SELECT * FROM dup UNION ALL SELECT * FROM thr)
        |GROUP BY form_id, anomalies_id""".stripMargin) {
      (s, d) => {
        val li = Tables.lineitem(s, d)
        val dup = Anomalies.detectDuplication(li, "lineitem", "dup_orderkey",
          Seq("l_orderkey"), "l_linenumber")
        val thr = Anomalies.detectThreshold(
          li.withColumn("__k", concat_ws("-", col("l_orderkey"), col("l_linenumber"))),
          "lineitem", "qty_gt_49", "__k", col("l_quantity"), 49.0)
        Anomalies.summarize(Anomalies.consolidate(Seq(dup, thr)),
          lit(java.sql.Date.valueOf("2026-01-01")))
      }
    },

    // ---- a24: per-form anomaly-rule battery, end-to-end through the sink ----
    // Thirteen concrete rule instances mirroring the reference's per-form
    // detector scripts, consolidated (R6/R7) and routed through the
    // partitioned history sink (S6) before being read back — the full
    // 05.run_anomaly_detection.R composition in one query. Rule ↔ source:
    //   1 hh_visit_already_in_dataset  safety.R:94-105   dup (custkey, order date)
    //   2 hh_detected_multiple_clusters safety.R:108-116 >1 distinct supplier per (order, part)
    //   3 hh_more_than_3_members_returned safety.R:186-204 >3 distinct returned lines per order
    //   4 negative_balance             anomalies_utils.R detect_threshold direction='less'
    //   5 totalprice_too_high          v0.R:105-113      detect_threshold direction='more'
    //   6 hh_outside_cluster           safety.R:212-219  null-or-invalid code list
    //   7 pk_id_duplicates             pk.R:97-108       drop_na(pk) then dup groups
    //   8 mapping_mismatch             pk.R:170-186      join to source-of-truth mapping
    //   9 rdt_time_diff                efficacy.R:86-94  implausibly fast ship after order
    //  10 repeat_count_mismatch        safety.R:80-81,106-130 parent-declared vs repeat-group count
    //  11 missing_day0_registration    pk.R:120-160      child rows with no anchor-form row
    //  12 gps_time_combo               safetynew.R:191-198 x efficacy.R:86-93 conjunction
    //  13 members_left                 safety.R:164-180  died OR migrated distinct counts
    // (rule 4+5 share the threshold detector: both directions exercised.
    //  Rules 10/11 inject deterministic discrepancies — +1 declared for
    //  orderkey%97==0, anchor drops orderkey%101==7 — so each has a
    //  known-truth anomaly set on the clean synthetic data. Rules
    //  9/12/11 share ONE left lineitem⋈orders lookup — the three
    //  joined-rule predicates read a single join.)
    // Scale: every rule is one shuffle on its own group keys (or a pure
    // projection); consolidate is a union, not an exchange; the mapping
    // truth side co-partitions with its source, and the history write
    // partitions by date exactly like io01.
    Query("a24_detector_battery",
      """WITH r1 AS (
        |  SELECT 'orders__' || k || '__hh_visit_already_in_dataset' AS resolution_id,
        |         k AS key, 'orders' AS form_id,
        |         'hh_visit_already_in_dataset' AS anomalies_id,
        |         'hh_visit_already_in_dataset: ' || CAST(count(*) AS VARCHAR)
        |           || ' rows for key, ids='
        |           || string_agg(CAST(o_orderkey AS VARCHAR), ',' ORDER BY CAST(o_orderkey AS VARCHAR))
        |           AS anomalies_description,
        |         'to_do' AS resolution_status
        |  FROM (SELECT *, CAST(o_custkey AS VARCHAR) || '|' ||
        |               CAST(CAST(o_orderdate AS DATE) AS VARCHAR) AS k FROM orders)
        |  GROUP BY k HAVING count(*) >= 2),
        |r2 AS (
        |  SELECT 'lineitem__' || k || '__hh_detected_multiple_clusters' AS resolution_id,
        |         k AS key, 'lineitem' AS form_id,
        |         'hh_detected_multiple_clusters' AS anomalies_id,
        |         'hh_detected_multiple_clusters: ' || CAST(count(DISTINCT l_suppkey) AS VARCHAR)
        |           || ' distinct values, values='
        |           || string_agg(DISTINCT CAST(l_suppkey AS VARCHAR), ',' ORDER BY CAST(l_suppkey AS VARCHAR))
        |           AS anomalies_description,
        |         'to_do' AS resolution_status
        |  FROM (SELECT *, CAST(l_orderkey AS VARCHAR) || '|' ||
        |               CAST(l_partkey AS VARCHAR) AS k FROM lineitem)
        |  GROUP BY k HAVING count(DISTINCT l_suppkey) > 1),
        |r3 AS (
        |  SELECT 'lineitem__' || CAST(l_orderkey AS VARCHAR) || '__hh_more_than_3_members_returned' AS resolution_id,
        |         CAST(l_orderkey AS VARCHAR) AS key, 'lineitem' AS form_id,
        |         'hh_more_than_3_members_returned' AS anomalies_id,
        |         'hh_more_than_3_members_returned: '
        |           || CAST(count(DISTINCT CASE WHEN l_returnflag = 'R' THEN l_linenumber END) AS VARCHAR)
        |           || ' members, ids='
        |           || string_agg(DISTINCT CAST(CASE WHEN l_returnflag = 'R' THEN l_linenumber END AS VARCHAR), ','
        |                         ORDER BY CAST(CASE WHEN l_returnflag = 'R' THEN l_linenumber END AS VARCHAR))
        |           AS anomalies_description,
        |         'to_do' AS resolution_status
        |  FROM lineitem GROUP BY l_orderkey
        |  HAVING count(DISTINCT CASE WHEN l_returnflag = 'R' THEN l_linenumber END) > 3),
        |r4 AS (
        |  SELECT 'customer__' || CAST(c_custkey AS VARCHAR) || '__negative_balance' AS resolution_id,
        |         CAST(c_custkey AS VARCHAR) AS key, 'customer' AS form_id,
        |         'negative_balance' AS anomalies_id,
        |         'negative_balance: value=' || CAST(c_acctbal AS VARCHAR)
        |           || ' vs threshold=0.0' AS anomalies_description,
        |         'to_do' AS resolution_status
        |  FROM customer WHERE c_acctbal < 0),
        |r5 AS (
        |  SELECT 'orders__' || CAST(o_orderkey AS VARCHAR) || '__totalprice_too_high' AS resolution_id,
        |         CAST(o_orderkey AS VARCHAR) AS key, 'orders' AS form_id,
        |         'totalprice_too_high' AS anomalies_id,
        |         'totalprice_too_high: value=' || CAST(o_totalprice AS VARCHAR)
        |           || ' vs threshold=450000.0' AS anomalies_description,
        |         'to_do' AS resolution_status
        |  FROM orders WHERE o_totalprice > 450000),
        |r6 AS (
        |  SELECT 'customer__' || CAST(c_custkey AS VARCHAR) || '__hh_outside_cluster' AS resolution_id,
        |         CAST(c_custkey AS VARCHAR) AS key, 'customer' AS form_id,
        |         'hh_outside_cluster' AS anomalies_id,
        |         'hh_outside_cluster: code=' || coalesce(CAST(c_nationkey AS VARCHAR), 'NA')
        |           AS anomalies_description,
        |         'to_do' AS resolution_status
        |  FROM customer WHERE c_nationkey IS NULL OR c_nationkey IN (1, 4, 6)),
        |r7 AS (
        |  SELECT 'orders__' || pk || '__pk_id_duplicates' AS resolution_id,
        |         pk AS key, 'orders' AS form_id,
        |         'pk_id_duplicates' AS anomalies_id,
        |         'pk_id_duplicates: ' || CAST(count(*) AS VARCHAR)
        |           || ' rows for key, ids='
        |           || string_agg(CAST(o_orderkey AS VARCHAR), ',' ORDER BY CAST(o_orderkey AS VARCHAR))
        |           AS anomalies_description,
        |         'to_do' AS resolution_status
        |  FROM (SELECT o_orderkey,
        |               CASE WHEN o_orderpriority = '1-URGENT' THEN NULL
        |                    ELSE CAST(o_custkey AS VARCHAR) || '|' || o_orderpriority END AS pk
        |        FROM orders)
        |  WHERE pk IS NOT NULL
        |  GROUP BY pk HAVING count(*) >= 2),
        |truth AS (
        |  SELECT l_partkey, min(l_suppkey) AS expected FROM lineitem GROUP BY l_partkey),
        |r8 AS (
        |  SELECT 'lineitem__' || CAST(l_orderkey AS VARCHAR) || '-' || CAST(l_linenumber AS VARCHAR)
        |           || '__mapping_mismatch' AS resolution_id,
        |         CAST(l_orderkey AS VARCHAR) || '-' || CAST(l_linenumber AS VARCHAR) AS key,
        |         'lineitem' AS form_id, 'mapping_mismatch' AS anomalies_id,
        |         'mapping_mismatch: l_partkey=' || CAST(l_partkey AS VARCHAR)
        |           || ' got=' || CAST(l_suppkey AS VARCHAR)
        |           || ' expected=' || CAST(expected AS VARCHAR) AS anomalies_description,
        |         'to_do' AS resolution_status
        |  FROM lineitem JOIN truth USING (l_partkey)
        |  WHERE l_suppkey != expected),
        |r9 AS (
        |  SELECT 'lineitem__' || CAST(l_orderkey AS VARCHAR) || '-' || CAST(l_linenumber AS VARCHAR)
        |           || '__rdt_time_diff' AS resolution_id,
        |         CAST(l_orderkey AS VARCHAR) || '-' || CAST(l_linenumber AS VARCHAR) AS key,
        |         'lineitem' AS form_id, 'rdt_time_diff' AS anomalies_id,
        |         'rdt_time_diff: value='
        |           || CAST(CAST(date_diff('day', CAST(o_orderdate AS DATE), CAST(l_shipdate AS DATE)) AS DOUBLE) AS VARCHAR)
        |           || ' vs threshold=1.0' AS anomalies_description,
        |         'to_do' AS resolution_status
        |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |  WHERE date_diff('day', CAST(o_orderdate AS DATE), CAST(l_shipdate AS DATE)) < 1),
        |rc AS (
        |  SELECT o_orderkey, coalesce(cnt, 0) AS actual,
        |         coalesce(cnt, 0) + CASE WHEN o_orderkey % 97 = 0 THEN 1 ELSE 0 END AS declared
        |  FROM orders LEFT JOIN (SELECT l_orderkey AS o_orderkey, count(*) AS cnt
        |                         FROM lineitem GROUP BY 1) USING (o_orderkey)),
        |r10 AS (
        |  SELECT 'orders__' || CAST(o_orderkey AS VARCHAR) || '__repeat_count_mismatch' AS resolution_id,
        |         CAST(o_orderkey AS VARCHAR) AS key, 'orders' AS form_id,
        |         'repeat_count_mismatch' AS anomalies_id,
        |         'repeat_count_mismatch: declared=' || CAST(declared AS VARCHAR)
        |           || ' actual=' || CAST(actual AS VARCHAR) AS anomalies_description,
        |         'to_do' AS resolution_status
        |  FROM rc WHERE declared != actual),
        |r11 AS (
        |  SELECT 'lineitem__' || CAST(l_orderkey AS VARCHAR) || '-' || CAST(l_linenumber AS VARCHAR)
        |           || '__missing_day0_registration' AS resolution_id,
        |         CAST(l_orderkey AS VARCHAR) || '-' || CAST(l_linenumber AS VARCHAR) AS key,
        |         'lineitem' AS form_id, 'missing_day0_registration' AS anomalies_id,
        |         'missing_day0_registration: l_orderkey=' || CAST(l_orderkey AS VARCHAR)
        |           || ' has no row in the parent form' AS anomalies_description,
        |         'to_do' AS resolution_status
        |  FROM lineitem l
        |  WHERE NOT EXISTS (SELECT 1 FROM orders o
        |                    WHERE o.o_orderkey = l.l_orderkey AND o.o_orderkey % 101 != 7)),
        |r12 AS (
        |  SELECT 'lineitem__' || CAST(l_orderkey AS VARCHAR) || '-' || CAST(l_linenumber AS VARCHAR)
        |           || '__gps_time_combo' AS resolution_id,
        |         CAST(l_orderkey AS VARCHAR) || '-' || CAST(l_linenumber AS VARCHAR) AS key,
        |         'lineitem' AS form_id, 'gps_time_combo' AS anomalies_id,
        |         'gps_time_combo: accuracy=' || CAST(l_discount AS VARCHAR)
        |           || ' time_diff=' || CAST(date_diff('day', CAST(o_orderdate AS DATE), CAST(l_shipdate AS DATE)) AS VARCHAR)
        |           AS anomalies_description,
        |         'to_do' AS resolution_status
        |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |  WHERE l_discount > 0.09
        |    AND date_diff('day', CAST(o_orderdate AS DATE), CAST(l_shipdate AS DATE)) < 3),
        |r13 AS (
        |  SELECT 'lineitem__' || CAST(l_orderkey AS VARCHAR) || '__members_left' AS resolution_id,
        |         CAST(l_orderkey AS VARCHAR) AS key, 'lineitem' AS form_id,
        |         'members_left' AS anomalies_id,
        |         'members_left: died=' || CAST(count(DISTINCT CASE WHEN l_returnflag = 'R' THEN l_linenumber END) AS VARCHAR)
        |           || ' migrated=' || CAST(count(DISTINCT CASE WHEN l_returnflag = 'A' THEN l_linenumber END) AS VARCHAR)
        |           AS anomalies_description,
        |         'to_do' AS resolution_status
        |  FROM lineitem GROUP BY l_orderkey
        |  HAVING count(DISTINCT CASE WHEN l_returnflag = 'R' THEN l_linenumber END) > 3
        |      OR count(DISTINCT CASE WHEN l_returnflag = 'A' THEN l_linenumber END) > 3)
        |SELECT * FROM r1 UNION ALL SELECT * FROM r2 UNION ALL SELECT * FROM r3
        |UNION ALL SELECT * FROM r4 UNION ALL SELECT * FROM r5
        |UNION ALL SELECT * FROM r6 UNION ALL SELECT * FROM r7
        |UNION ALL SELECT * FROM r8 UNION ALL SELECT * FROM r9
        |UNION ALL SELECT * FROM r10 UNION ALL SELECT * FROM r11
        |UNION ALL SELECT * FROM r12 UNION ALL SELECT * FROM r13""".stripMargin) {
      (s, d) => {
        // (VERDICT r11 item 3 — measured resolution: caching the base
        // scans was tried and read SLOWER, 10.7-11.0 s vs 9.7 s isolated
        // at sf0.1 — parquet re-scans are NOT the battery's cost, the
        // three lineitem⋈orders shuffle joins were. The fix that landed
        // is the r9/r12/r11 three-rule fusion below: ONE join feeds all
        // per-row joined rules, removing a full data-sized join.)
        // (Round-15 optimization pass: fanning these base scans
        // (Par.fanOut) was tried and measured SLOWER — min 10.6 s vs
        // 7.4 s back-to-back — the wide-row exchange costs more than
        // the parallel partial-agg gains, the same shape as the r11
        // caching negative above. The battery keeps direct scans.)
        val orders = Tables.orders(s, d)
        val li = Tables.lineitem(s, d)
        val cust = Tables.customer(s, d)
        val r1 = Anomalies.detectDuplication(
          orders.withColumn("__dt", col("o_orderdate").cast("date")),
          "orders", "hh_visit_already_in_dataset",
          Seq("o_custkey", "__dt"), "o_orderkey")
        val r2 = Anomalies.detectDistinctMismatch(li, "lineitem",
          "hh_detected_multiple_clusters",
          Seq("l_orderkey", "l_partkey"), "l_suppkey")
        // r3 + r13 fused (VERDICT r8 item 4): both conditional distinct-
        // member rules read ONE two-level stats pass over lineitem
        // (memberStats), then emit as per-row rules over the aggregated
        // frame — one scan and no Expand where two detectors each paid a
        // scan + an Expanded distinct aggregate.
        // rowCount = true: r10's repeat-count rule reads the SAME
        // l_orderkey grouping, so its per-parent actuals ride this pass
        // instead of the former third aggregation (the old path ran
        // memberStats + an inline groupBy + detectRepeatCountMismatch's
        // internal groupBy — three l_orderkey aggs; now two). NOT
        // localCheckpoint-ed: the pin was tried (round 16) and its
        // EAGER materialization job serializes ~1-2 s that the battery's
        // independent rule subtrees otherwise overlap under AQE's
        // concurrent stage execution — two lazy consumers of one lazy
        // frame keep the concurrency and still save the third pass.
        val mstats = Anomalies.memberStats(li, Seq("l_orderkey"), Seq(
          ("died", col("l_returnflag") === "R"),
          ("migrated", col("l_returnflag") === "A")), "l_linenumber",
          rowCount = true)
        val r3r13 = Anomalies.detectRowBattery(mstats, "lineitem",
          col("l_orderkey"), Seq(
            ("hh_more_than_3_members_returned",
              concat(col("n_died").cast("string"), lit(" members, ids="),
                col("ids_died")),
              col("n_died") > 3),
            ("members_left",
              concat(lit("died="), col("n_died").cast("string"),
                lit(" migrated="), col("n_migrated").cast("string")),
              col("n_died") > 3 || col("n_migrated") > 3)))
        // r4 + r6 fused: the two stateless customer rules in one scan
        val r4r6 = Anomalies.detectRowBattery(cust, "customer",
          col("c_custkey"), Seq(
            ("negative_balance",
              concat(lit("value="), col("c_acctbal").cast("string"),
                lit(" vs threshold=0.0")),
              col("c_acctbal") < 0.0),
            ("hh_outside_cluster",
              concat(lit("code="),
                coalesce(col("c_nationkey").cast("string"), lit("NA"))),
              col("c_nationkey").isNull || col("c_nationkey").isin(1L, 4L, 6L))))
        // r5: the one stateless orders row rule, same battery form
        val r5 = Anomalies.detectRowBattery(orders, "orders",
          col("o_orderkey"), Seq(
            ("totalprice_too_high",
              concat(lit("value="), col("o_totalprice").cast("string"),
                lit(" vs threshold=450000.0")),
              col("o_totalprice") > 450000.0)))
        val r7 = Anomalies.detectDuplication(
          orders.withColumn("__pk",
              when(col("o_orderpriority") === "1-URGENT", lit(null))
                .otherwise(concat_ws("|", col("o_custkey"), col("o_orderpriority"))))
            .filter(col("__pk").isNotNull),
          "orders", "pk_id_duplicates", Seq("__pk"), "o_orderkey")
        val truth = li.groupBy("l_partkey").agg(min("l_suppkey").as("expected"))
        val r8 = Anomalies.detectMappingMismatch(li, "lineitem",
          "mapping_mismatch",
          concat_ws("-", col("l_orderkey"), col("l_linenumber")),
          "l_partkey", "l_suppkey", truth)
        // r9 + r12 + r11 fused: all three rules are stateless predicates
        // over the SAME lineitem⋈orders lookup — one LEFT join feeds the
        // two time rules AND the orphan rule (orphan = no anchor row:
        // unmatched, or the anchor form's %101==7 drop — identical rows
        // to the former detectOrphans left_anti, one fewer data-sized
        // join). orders is unique on o_orderkey, so the left join cannot
        // fan out and the time predicates are null→false on unmatched
        // rows exactly like the inner-join form.
        val joined = li.join(orders, col("l_orderkey") === col("o_orderkey"), "left")
          .withColumn("__k", concat_ws("-", col("l_orderkey"), col("l_linenumber")))
          .withColumn("__days",
            datediff(col("l_shipdate").cast("date"), col("o_orderdate").cast("date")))
        val r9r12r11 = Anomalies.detectRowBattery(joined, "lineitem",
          col("__k"), Seq(
            ("rdt_time_diff",
              concat(lit("value="), col("__days").cast("double").cast("string"),
                lit(" vs threshold=1.0")),
              col("__days").cast("double") < 1.0),
            ("gps_time_combo",
              concat(lit("accuracy="), col("l_discount").cast("string"),
                lit(" time_diff="), col("__days").cast("string")),
              col("l_discount") > 0.09 && col("__days") < 3),
            ("missing_day0_registration",
              concat(lit("l_orderkey="), col("l_orderkey").cast("string"),
                lit(" has no row in the parent form")),
              col("o_orderkey").isNull
                || pmod(col("o_orderkey"), lit(101)) === 7)))
        // r10: repeat-group cardinality vs parent-declared count — the
        // declared value is the actual count with a deterministic +1
        // discrepancy injected for orderkey % 97 == 0 families, so the
        // detector has a known-truth anomaly set. The actuals come off
        // the shared mstats pass (n_rows), and the mismatch emits as a
        // row rule directly: detectRepeatCountMismatch would groupBy
        // lineitem and join orders a SECOND time for a count already
        // sitting in `declared` (round-16 profile: two of the battery's
        // seven 600k-row shuffles were this duplicate).
        val actual = mstats.select(col("l_orderkey").as("o_orderkey"),
          col("n_rows").as("__cnt"))
        val declared = orders.join(actual, Seq("o_orderkey"), "left")
          .withColumn("__actual", coalesce(col("__cnt"), lit(0L)))
          .withColumn("__declared", col("__actual") +
            when(pmod(col("o_orderkey"), lit(97)) === 0, 1L).otherwise(0L))
        val r10 = Anomalies.detectRowBattery(declared, "orders",
          col("o_orderkey"), Seq(
            ("repeat_count_mismatch",
              concat(lit("declared="), col("__declared").cast("string"),
                lit(" actual="), col("__actual").cast("string")),
              col("__declared") =!= col("__actual"))))
        val all = Anomalies.consolidate(
          Seq(r1, r2, r3r13, r4r6, r5, r7, r8, r9r12r11, r10))
        // end-to-end: through the daily-partitioned history sink and back
        val root = graft.core.TempDirs.scratch("graft_battery_").toString
        Anomalies.writeHistory(all, root, java.time.LocalDate.parse("2026-01-01"))
        s.read.parquet(root).drop("partition_date")
      }
    },

    // ---- G5: the cleaning DAG as ONE composite -----------------------------
    // The reference's per-form cleaning chain (SURVEY §3.1,
    // 01.run_form_cleaning.R:99-178 → 02 → 05) end to end in a single
    // oracle row: resolution DELETE-then-SET → standardize (pad ids,
    // case/whitespace, derived fractional age) → detector battery over
    // the CLEANED data → consolidate → daily-partitioned history sink
    // and back. Every stage is load-bearing for the output: the DELETEs
    // shrink duplication groups, the SETs create every invalid_priority
    // anomaly, and the age detector reads the standardized derived
    // column — a chain break at any stage hash-mismatches.
    // (The resolution fixture derives deterministically from the data —
    // orderkey % 211 == 5 DELETE, % 193 == 3 SET '9-BOGUS' — standing
    // in for the human-authored sheet, which is bounded ≤20k rows by
    // the reference's tracker contract and therefore broadcast.)
    // CleaningPipelineSpec remains the heterogeneous-schema spec
    // companion (conditional stages over forms lacking GPS columns).
    Query("g05_cleaning_dag",
      """WITH resolved AS (
        |  SELECT o_orderkey, o_custkey, o_orderdate,
        |         CASE WHEN o_orderkey % 193 = 3 THEN '9-BOGUS'
        |              ELSE o_orderpriority END AS prio
        |  FROM orders WHERE o_orderkey % 211 <> 5),
        |std AS (
        |  SELECT o_orderkey,
        |         lpad(CAST(o_custkey AS VARCHAR), 8, '0') AS hhid,
        |         upper(regexp_replace(trim('  ' || prio || ' '), ' +', ' ', 'g')) AS prio_std,
        |         datediff('day', CAST(o_orderdate AS DATE), DATE '2026-08-01')
        |           / CAST(365.25 AS DOUBLE) AS age_years,
        |         CAST(o_orderdate AS DATE) AS dt
        |  FROM resolved),
        |d1 AS (
        |  SELECT 'orders__' || k || '__hh_visit_already_in_dataset' AS resolution_id,
        |         k AS key, 'orders' AS form_id,
        |         'hh_visit_already_in_dataset' AS anomalies_id,
        |         'hh_visit_already_in_dataset: ' || CAST(count(*) AS VARCHAR)
        |           || ' rows for key, ids='
        |           || string_agg(CAST(o_orderkey AS VARCHAR), ','
        |                         ORDER BY CAST(o_orderkey AS VARCHAR))
        |           AS anomalies_description,
        |         'to_do' AS resolution_status
        |  FROM (SELECT *, hhid || '|' || CAST(dt AS VARCHAR) AS k FROM std)
        |  GROUP BY k HAVING count(*) >= 2),
        |d2 AS (
        |  SELECT 'orders__' || CAST(o_orderkey AS VARCHAR) || '__invalid_priority' AS resolution_id,
        |         CAST(o_orderkey AS VARCHAR) AS key, 'orders' AS form_id,
        |         'invalid_priority' AS anomalies_id,
        |         'invalid_priority: code=' || coalesce(prio_std, 'NA') AS anomalies_description,
        |         'to_do' AS resolution_status
        |  FROM std WHERE prio_std IS NULL OR prio_std = '9-BOGUS'),
        |d3 AS (
        |  SELECT 'orders__' || CAST(o_orderkey AS VARCHAR) || '__age_out_of_range' AS resolution_id,
        |         CAST(o_orderkey AS VARCHAR) AS key, 'orders' AS form_id,
        |         'age_out_of_range' AS anomalies_id,
        |         'age_out_of_range: value=' || CAST(age_years AS VARCHAR)
        |           || ' vs threshold=33.0' AS anomalies_description,
        |         'to_do' AS resolution_status
        |  FROM std WHERE age_years > 33.0)
        |SELECT * FROM d1 UNION ALL SELECT * FROM d2
        |UNION ALL SELECT * FROM d3""".stripMargin) {
      (s, d) => {
        val orders = Tables.orders(s, d)
          .withColumn("__k", col("o_orderkey").cast("string"))
        // the "human" resolution sheet, derived deterministically
        val delRes = orders.filter(pmod(col("o_orderkey"), lit(211)) === 5)
          .select(col("__k").as("key"), lit(null).cast("string").as("column"),
            lit(null).cast("string").as("setTo"), lit("DELETE").as("operation"))
        val setRes = orders.filter(pmod(col("o_orderkey"), lit(193)) === 3)
          .select(col("__k").as("key"), lit("o_orderpriority").as("column"),
            lit("9-BOGUS").as("setTo"), lit("SET").as("operation"))
        val resolved = Resolution.applyResolution(orders,
          delRes.unionByName(setRes), "__k")
        val standardized = resolved
          .withColumn("hhid", Standardize.padHhid(col("o_custkey"), 8))
          .withColumn("prio_std", Standardize.standardizeCase(
            concat(lit("  "), col("o_orderpriority"), lit(" "))))
          .withColumn("age_years", Standardize.correctedAge(col("o_orderdate"),
            lit("2026-08-01").cast("date")))
          .withColumn("__dt", col("o_orderdate").cast("date"))
        val d1 = Anomalies.detectDuplication(standardized, "orders",
          "hh_visit_already_in_dataset", Seq("hhid", "__dt"), "o_orderkey")
        val d2 = Anomalies.detectInvalidCode(standardized, "orders",
          "invalid_priority", "o_orderkey", col("prio_std"), Seq("9-BOGUS"))
        val d3 = Anomalies.detectThreshold(standardized, "orders",
          "age_out_of_range", "o_orderkey", col("age_years"), 33.0)
        val all = Anomalies.consolidate(Seq(d1, d2, d3))
        // through the daily-partitioned history sink and back (io01 shape)
        val root = graft.core.TempDirs.scratch("graft_cleandag_").toString
        Anomalies.writeHistory(all, root, java.time.LocalDate.parse("2026-01-02"))
        s.read.parquet(root).drop("partition_date")
      }
    },

    // ---- G7: gsheets resolution round-trip ----------------------------------
    // The tracker lifecycle across runs (gsheets_src/anomalies_update.py:
    // 17-24 status split, aws_src/get_ever_resolved.py:7-9 history dedup,
    // gsheets_src/anomalies_populate.py:17-25 next-sheet assembly): two
    // simulated human-input rounds over the threshold detector's
    // anomalies, resolved exports accumulated into history, ever-resolved
    // = first-seen per resolution_id, and the NEXT sheet = anomalies
    // minus confirmed_correct ids with in_progress/blocked carried
    // forward, default to_do. The human statuses are md5-derived from
    // the resolution_id (seeds :h1/:h2) so the fixture is deterministic
    // and both engines replay it identically.
    Query("g07_resolution_roundtrip",
      """WITH anom AS (
        |  SELECT 'orders__' || CAST(o_orderkey AS VARCHAR) || '__totalprice_too_high' AS resolution_id,
        |         CAST(o_orderkey AS VARCHAR) AS key, 'orders' AS form_id,
        |         'totalprice_too_high' AS anomalies_id,
        |         'totalprice_too_high: value=' || CAST(o_totalprice AS VARCHAR)
        |           || ' vs threshold=350000.0' AS anomalies_description
        |  FROM orders WHERE o_totalprice > 350000),
        |st1 AS (
        |  SELECT resolution_id,
        |         CASE WHEN h < '20' THEN 'confirmed_correct'
        |              WHEN h < '30' THEN 'manual_resolution_done'
        |              WHEN h < '48' THEN 'in_progress'
        |              WHEN h < '58' THEN 'blocked' ELSE 'to_do' END AS resolution_status
        |  FROM (SELECT resolution_id, substring(md5(resolution_id || ':h1'), 1, 2) AS h FROM anom)),
        |st2 AS (
        |  SELECT resolution_id,
        |         CASE WHEN h < '20' THEN 'confirmed_correct'
        |              WHEN h < '30' THEN 'manual_resolution_done'
        |              WHEN h < '48' THEN 'in_progress'
        |              WHEN h < '58' THEN 'blocked' ELSE 'to_do' END AS resolution_status
        |  FROM (SELECT resolution_id, substring(md5(resolution_id || ':h2'), 1, 2) AS h FROM anom)),
        |hist AS (
        |  SELECT resolution_id, resolution_status, 1 AS run_time FROM st1
        |  WHERE resolution_status IN ('confirmed_correct', 'manual_resolution_done')
        |  UNION ALL
        |  SELECT resolution_id, resolution_status, 2 FROM st2
        |  WHERE resolution_status IN ('confirmed_correct', 'manual_resolution_done')),
        |ever AS (
        |  SELECT resolution_id, resolution_status FROM (
        |    SELECT *, row_number() OVER (PARTITION BY resolution_id ORDER BY run_time) AS rn
        |    FROM hist) WHERE rn = 1),
        |other AS (
        |  SELECT resolution_id, resolution_status FROM st2
        |  WHERE resolution_status IN ('in_progress', 'blocked'))
        |SELECT a.resolution_id, a.key, a.form_id, a.anomalies_id, a.anomalies_description,
        |       coalesce(o.resolution_status, 'to_do') AS resolution_status
        |FROM anom a
        |LEFT JOIN other o USING (resolution_id)
        |WHERE NOT EXISTS (
        |  SELECT 1 FROM ever e
        |  WHERE e.resolution_id = a.resolution_id
        |    AND e.resolution_status = 'confirmed_correct')""".stripMargin) {
      (s, d) => {
        val anom = Anomalies.detectThreshold(Tables.orders(s, d), "orders",
          "totalprice_too_high", "o_orderkey", col("o_totalprice"), 350000.0)
        // two rounds of md5-derived "human" statuses over the same sheet
        def statuses(salt: String) = {
          val h = substring(md5(concat(col("resolution_id"), lit(salt))), 1, 2)
          anom.select(col("resolution_id"),
            when(h < "20", "confirmed_correct")
              .when(h < "30", "manual_resolution_done")
              .when(h < "48", "in_progress")
              .when(h < "58", "blocked").otherwise("to_do").as("resolution_status"))
        }
        val resolvedStatuses = Seq("confirmed_correct", "manual_resolution_done")
        val hist = statuses(":h1")
          .filter(col("resolution_status").isin(resolvedStatuses: _*))
          .withColumn("run_time", lit(1))
          .unionByName(statuses(":h2")
            .filter(col("resolution_status").isin(resolvedStatuses: _*))
            .withColumn("run_time", lit(2)))
        val other = statuses(":h2")
          .filter(col("resolution_status").isin("in_progress", "blocked"))
        Resolution.populateTracker(anom, Resolution.everResolved(hist), other)
      }
    },

    // ---- G44: the ento-labs gsheets update round-trip ------------------------
    // The one S9 surface without a composite (VERDICT r14 item 5): the
    // ento-lab sheet update loop (pipeline-gsheets/gsheets_src/
    // ento_update.py:242-256) as a two-run fixture. Run 1 writes the
    // spreadsheet: three worksheets — two visible forms plus a HIDDEN
    // QC sheet that must be skipped — each with the sheets' junk
    // export headers and a leading units subheader row. Run 2 is
    // graft.sources.Connectors.entoSheetUpdate: iterate non-hidden worksheets,
    // snake-case the title into the landed filename, drop the
    // subheader positionally (iloc[1:]), replace columns wholesale
    // with the per-form VARNAME list, land one CSV per form. The
    // final table reads the landed CSVs back BY THEIR ASSIGNED NAMES
    // (selection only works if the positional rename happened) and
    // unions the forms; the oracle replays the fixture straight from
    // the source tables — a surviving subheader, a leaked hidden
    // sheet, an off-by-one drop, or a misassigned column all
    // hash-mismatch.
    Query("g44_ento_sheet_update",
      """WITH a AS (
        |  SELECT 'cdc_individual_mosquitoes.csv' AS out_file,
        |         CAST(l_shipdate AS VARCHAR) AS date_of_collection,
        |         'SA-' || CAST(l_orderkey*100 + l_linenumber AS VARCHAR)
        |           AS sample_id,
        |         CASE l_suppkey % 3 WHEN 0 THEN 'An. gambiae'
        |              WHEN 1 THEN 'An. funestus' ELSE 'Culex' END AS result
        |  FROM lineitem WHERE l_partkey % 23 = 0),
        |b AS (
        |  SELECT 'insecticide_resistance.csv' AS out_file,
        |         CAST(o_orderdate AS VARCHAR) AS date_of_collection,
        |         'TB-' || CAST(o_orderkey AS VARCHAR) AS sample_id,
        |         CASE o_custkey % 2 WHEN 0 THEN 'alive' ELSE 'dead' END
        |           AS result
        |  FROM orders WHERE o_orderkey % 29 = 0)
        |SELECT * FROM a UNION ALL SELECT * FROM b""".stripMargin) {
      (s, d) => {
        val root = graft.core.TempDirs.scratch("g44_sheets_").toString
        val sheetDir = s"$root/sheet"
        val outDir = s"$root/landed"
        // ---- run 1: the spreadsheet side --------------------------------
        val aData = Tables.lineitem(s, d)
          .filter(col("l_partkey") % 23 === 0)
          .select(col("l_shipdate").cast("string").as("c1"),
            concat(lit("SA-"),
              (col("l_orderkey") * 100 + col("l_linenumber")).cast("string"))
              .as("c2"),
            when(col("l_suppkey") % 3 === 0, "An. gambiae")
              .when(col("l_suppkey") % 3 === 1, "An. funestus")
              .otherwise("Culex").as("c3"))
        val bData = Tables.orders(s, d)
          .filter(col("o_orderkey") % 29 === 0)
          .select(col("o_orderdate").cast("string").as("c1"),
            concat(lit("TB-"), col("o_orderkey").cast("string")).as("c2"),
            when(col("o_custkey") % 2 === 0, "alive").otherwise("dead")
              .as("c3"))
        // the sheets' units subheader — FIRST data row of each export
        // (a 1-row, 1-partition df unioned ahead keeps file position 0
        // through coalesce(1)'s in-order concatenation)
        def subhead = s.createDataFrame(Seq(("date", "id", "unit")))
          .toDF("c1", "c2", "c3")
        def sheet(data: org.apache.spark.sql.DataFrame) =
          subhead.unionByName(data)
            .toDF("Date of-Collection", "Sample ID-raw", "Result Col")
        graft.sources.Connectors.publishTable(sheet(aData), s"$sheetDir/ws_a")
        graft.sources.Connectors.publishTable(sheet(bData), s"$sheetDir/ws_b")
        graft.sources.Connectors.publishTable(sheet(bData.limit(3)), s"$sheetDir/ws_h")
        graft.sources.Connectors.publishTable(s.createDataFrame(Seq(
            ("CDC Individual Mosquitoes", "ws_a", "false"),
            ("QC Internal", "ws_h", "true"),
            ("Insecticide Resistance", "ws_b", "false")))
          .toDF("title", "file", "hidden"), s"$sheetDir/worksheets.csv")
        // ---- run 2: the update loop -------------------------------------
        val varnames = Map(
          "CDC Individual Mosquitoes" ->
            Seq("date_of_collection", "sample_id", "species_pcr_complex_id"),
          "Insecticide Resistance" ->
            Seq("date_of_collection", "tube_id", "alive_or_dead"))
        val landed = graft.sources.Connectors.entoSheetUpdate(s, sheetDir, varnames, outDir)
          .toMap
        def read(title: String) = s.read.option("header", "true")
          .csv(landed(title))
        read("CDC Individual Mosquitoes")
          .select(lit("cdc_individual_mosquitoes.csv").as("out_file"),
            col("date_of_collection"), col("sample_id"),
            col("species_pcr_complex_id").as("result"))
          .unionByName(read("Insecticide Resistance")
            .select(lit("insecticide_resistance.csv").as("out_file"),
              col("date_of_collection"), col("tube_id").as("sample_id"),
              col("alive_or_dead").as("result")))
      }
    },

    Query("a16_flagship_dup_pipeline",
      """WITH latest AS (
        |  SELECT * FROM (
        |    SELECT o_custkey, o_orderstatus, o_orderkey, o_orderpriority,
        |           row_number() OVER (PARTITION BY o_custkey, o_orderstatus
        |                              ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn
        |    FROM orders) WHERE rn = 1)
        |SELECT 'orders__' || CAST(o_custkey AS VARCHAR) || '__dup_priority' AS resolution_id,
        |       CAST(o_custkey AS VARCHAR) AS key,
        |       'orders' AS form_id, 'dup_priority' AS anomalies_id,
        |       'dup_priority: ' || CAST(count(*) AS VARCHAR) || ' rows for key, ids='
        |         || string_agg(CAST(o_orderkey AS VARCHAR), ',' ORDER BY CAST(o_orderkey AS VARCHAR))
        |         AS anomalies_description,
        |       'to_do' AS resolution_status
        |FROM latest
        |GROUP BY o_custkey HAVING count(*) >= 2""".stripMargin) {
      (s, d) => {
        val latest = Windows.latestPerGroup(Tables.orders(s, d),
          Seq("o_custkey", "o_orderstatus"), Seq(col("o_orderdate"), col("o_orderkey")))
        Anomalies.detectDuplication(latest, "orders", "dup_priority",
          Seq("o_custkey"), "o_orderkey")
      }
    },

    // ---- G17: XLSForm → data dictionary ------------------------------------
    // The reference's seventh module (pipeline-data-dict/R/generate.R:
    // 19-56) as one composite: survey sheet ⟕ per-list option
    // group-concat (select_one/select_multiple list_name extraction,
    // options in SHEET order), structural rows (group/note/calculate/
    // repeat) filtered, type reduced to its first word. The sheets are
    // human-authored (≤ a few thousand rows), so the fixture derives
    // them deterministically from part on BOTH sides: every branch is
    // exercised — selects with populated lists, selects whose list has
    // no surviving options (null choices), null list_name/name choice
    // rows dropped, every structural filter hit. The options join is a
    // broadcast (bounded list count); the oracle replays the exact
    // chain with ORDER BY ord inside string_agg.
    Query("g17_data_dictionary",
      """WITH survey AS (
        |  SELECT p_partkey AS ord,
        |         CASE p_partkey % 12
        |           WHEN 0 THEN 'begin group' WHEN 1 THEN 'text'
        |           WHEN 2 THEN 'select_one l' || CAST(p_partkey % 5 AS VARCHAR)
        |           WHEN 3 THEN 'integer' WHEN 4 THEN 'note'
        |           WHEN 5 THEN 'select_multiple l' || CAST(p_partkey % 5 AS VARCHAR)
        |           WHEN 6 THEN 'calculate' WHEN 7 THEN 'date'
        |           WHEN 8 THEN 'end group' WHEN 9 THEN 'begin repeat'
        |           WHEN 10 THEN 'decimal' ELSE 'end repeat' END AS type,
        |         'q_' || CAST(p_partkey AS VARCHAR) AS name,
        |         p_name AS label
        |  FROM part),
        |choices AS (
        |  SELECT p_partkey AS ord,
        |         CASE WHEN p_partkey % 13 = 0 THEN NULL
        |              ELSE 'l' || CAST(CAST(floor(p_partkey / 3.0) AS BIGINT) % 5 AS VARCHAR) END AS list_name,
        |         CASE WHEN p_partkey % 17 = 0 THEN NULL
        |              ELSE 'opt_' || CAST(p_partkey % 23 AS VARCHAR) END AS name
        |  FROM part WHERE p_partkey % 3 = 0),
        |opts AS (
        |  SELECT list_name, string_agg(name, '; ' ORDER BY ord) AS choices
        |  FROM choices WHERE list_name IS NOT NULL AND name IS NOT NULL
        |  GROUP BY 1),
        |sl AS (
        |  SELECT type, name, label,
        |         CASE WHEN type LIKE '%select%' THEN
        |           regexp_replace(type, 'select_one |select_multiple ', '', 'g') END AS list_name
        |  FROM survey)
        |SELECT split_part(sl.type, ' ', 1) AS type, sl.name AS variable,
        |       sl.label AS question, o.choices
        |FROM sl LEFT JOIN opts o ON sl.list_name = o.list_name
        |WHERE sl.type NOT LIKE '%group%' AND sl.type <> 'note'
        |  AND sl.type <> 'calculate' AND sl.type NOT LIKE '%repeat%'""".stripMargin) {
      (s, d) => {
        val part = Tables.part(s, d)
        val m = (col("p_partkey") % 12).cast("int")
        val surveyType =
          when(m === 0, "begin group").when(m === 1, "text")
            .when(m === 2, concat(lit("select_one l"), (col("p_partkey") % 5).cast("string")))
            .when(m === 3, "integer").when(m === 4, "note")
            .when(m === 5, concat(lit("select_multiple l"), (col("p_partkey") % 5).cast("string")))
            .when(m === 6, "calculate").when(m === 7, "date")
            .when(m === 8, "end group").when(m === 9, "begin repeat")
            .when(m === 10, "decimal").otherwise("end repeat")
        val survey = part.select(col("p_partkey").as("ord"),
          surveyType.as("type"),
          concat(lit("q_"), col("p_partkey").cast("string")).as("name"),
          col("p_name").as("label"))
        val choices = part.filter(col("p_partkey") % 3 === 0)
          .select(col("p_partkey").as("ord"),
            when(col("p_partkey") % 13 === 0, lit(null).cast("string"))
              .otherwise(concat(lit("l"),
                (floor(col("p_partkey") / 3.0).cast("long") % 5).cast("string")))
              .as("list_name"),
            when(col("p_partkey") % 17 === 0, lit(null).cast("string"))
              .otherwise(concat(lit("opt_"), (col("p_partkey") % 23).cast("string")))
              .as("name"))
        graft.operators.DataDictionary.build(survey, choices)
      }
    }
  )
}
