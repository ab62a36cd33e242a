package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.core.{Query, Tables}
import graft.operators.Windows

/** Aggregation / join / window operators from SURVEY.md §2.3-2.5 expressed
  * over the driver testdata, each with a DuckDB oracle.
  *
  * Determinism rules (the driver hash-compares values with DuckDB):
  *  - double aggregations go through DECIMAL(18,4) per row so the sum is
  *    order-independent exact arithmetic on both engines, then back to
  *    double (`dsum`);
  *  - every window order includes a unique tiebreaker column;
  *  - string/list aggregations are sorted.
  */
object Relational {

  /** Order-independent exact sum of a double column (see class doc). */
  private def dsum(c: org.apache.spark.sql.Column) =
    sum(c.cast("decimal(18,4)")).cast("double")
  private def dsumSql(e: String) =
    s"CAST(sum(CAST($e AS DECIMAL(18,4))) AS DOUBLE)"

  val queries: Seq[Query] = Seq(

    // ---- A1: group count -------------------------------------------------
    // Ref semantics: pipeline-reporting/R/utils.R:23-34 (submissions per status).
    Query("a01_group_count",
      "SELECT o_orderstatus, count(*) AS n FROM orders GROUP BY o_orderstatus") {
      (s, d) => Tables.orders(s, d).groupBy("o_orderstatus").agg(count(lit(1)).as("n"))
    },

    // ---- A2: distinct count ----------------------------------------------
    Query("a02_distinct_count",
      """SELECT l_returnflag, count(DISTINCT l_orderkey) AS n_orders,
        |       count(DISTINCT l_partkey) AS n_parts
        |FROM lineitem GROUP BY l_returnflag""".stripMargin) {
      (s, d) => Tables.lineitem(s, d).groupBy("l_returnflag")
        .agg(countDistinct(col("l_orderkey")).as("n_orders"),
             countDistinct(col("l_partkey")).as("n_parts"))
    },

    // ---- A3: conditional distinct count ------------------------------------
    // Ref: n_distinct(extid[person_absent_reason=='Died']) safety.R:168-169.
    Query("a03_conditional_distinct",
      """SELECT o_orderpriority,
        |       count(DISTINCT CASE WHEN o_orderstatus = 'F' THEN o_custkey END) AS n_f_cust,
        |       count(DISTINCT CASE WHEN o_totalprice > 200000 THEN o_custkey END) AS n_big_cust
        |FROM orders GROUP BY o_orderpriority""".stripMargin) {
      (s, d) => Tables.orders(s, d).groupBy("o_orderpriority").agg(
        countDistinct(when(col("o_orderstatus") === "F", col("o_custkey"))).as("n_f_cust"),
        countDistinct(when(col("o_totalprice") > 200000, col("o_custkey"))).as("n_big_cust"))
    },

    // ---- A4: sum / max / min -----------------------------------------------
    Query("a04_sum_max_min",
      s"""SELECT l_returnflag, ${dsumSql("l_quantity")} AS sum_qty,
         |       max(l_shipdate) AS max_ship, min(l_extendedprice) AS min_price
         |FROM lineitem GROUP BY l_returnflag""".stripMargin) {
      (s, d) => Tables.lineitem(s, d).groupBy("l_returnflag").agg(
        dsum(col("l_quantity")).as("sum_qty"),
        max(col("l_shipdate")).as("max_ship"),
        min(col("l_extendedprice")).as("min_price"))
    },

    // ---- A5: string agg (sorted for determinism) ---------------------------
    // Ref: paste0(KEY, collapse=',') safety.R:97.
    Query("a05_string_agg",
      """SELECT n_regionkey, string_agg(n_name, ',' ORDER BY n_name) AS nations
        |FROM nation GROUP BY n_regionkey""".stripMargin) {
      (s, d) => Tables.nation(s, d).groupBy("n_regionkey")
        .agg(concat_ws(",", array_sort(collect_list(col("n_name")))).as("nations"))
    },

    // ---- A6: list agg (sorted array, serialized to JSON for the gate) ------
    // Ref: summarise(samples = list(sample)) monitoring/lab.Rmd:305-306.
    // The list is built as a real array aggregation; the top-level column is
    // its JSON form because the driver's pandas sort can't order raw arrays.
    Query("a06_list_agg",
      """SELECT n_regionkey, to_json(list_sort(list(n_name))) AS nation_list
        |FROM nation GROUP BY n_regionkey""".stripMargin) {
      (s, d) => Tables.nation(s, d).groupBy("n_regionkey")
        .agg(to_json(array_sort(collect_list(col("n_name")))).as("nation_list"))
    },

    // ---- A8: multi-metric summarise with derived ratios --------------------
    // Ref: prevalence_incidence.qmd:22-47.
    Query("a08_multi_metric",
      s"""SELECT l_returnflag, l_linestatus,
         |  count(*) AS n_rows,
         |  ${dsumSql("l_quantity")} AS sum_qty,
         |  ${dsumSql("l_extendedprice")} AS sum_base,
         |  ${dsumSql("l_extendedprice * (1 - l_discount)")} AS sum_disc,
         |  CAST(sum(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) / count(*) AS avg_qty
         |FROM lineitem GROUP BY l_returnflag, l_linestatus""".stripMargin) {
      (s, d) => Tables.lineitem(s, d).groupBy("l_returnflag", "l_linestatus").agg(
        count(lit(1)).as("n_rows"),
        dsum(col("l_quantity")).as("sum_qty"),
        dsum(col("l_extendedprice")).as("sum_base"),
        dsum(col("l_extendedprice") * (lit(1) - col("l_discount"))).as("sum_disc"),
        (dsum(col("l_quantity")) / count(lit(1))).as("avg_qty"))
    },

    // ---- A9: exact dedup ----------------------------------------------------
    Query("a09_dedup_exact",
      "SELECT DISTINCT o_orderstatus, o_orderpriority FROM orders") {
      (s, d) => Tables.orders(s, d).select("o_orderstatus", "o_orderpriority").distinct()
    },

    // ---- A10: latest-per-group dedup ---------------------------------------
    // Ref: end_time == max(end_time) over (visit, extid), 00.store_se_goals.R:551-556.
    Query("a10_latest_per_group",
      """SELECT o_custkey, o_orderkey, o_orderdate, o_totalprice FROM (
        |  SELECT o_custkey, o_orderkey, o_orderdate, o_totalprice,
        |         row_number() OVER (PARTITION BY o_custkey
        |                            ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn
        |  FROM orders) WHERE rn = 1""".stripMargin) {
      (s, d) => Windows.latestPerGroup(Tables.orders(s, d),
          Seq("o_custkey"), Seq(col("o_orderdate"), col("o_orderkey")))
        .select("o_custkey", "o_orderkey", "o_orderdate", "o_totalprice")
    },

    // ---- A11: duplicate detector --------------------------------------------
    // Ref: group_by(k) mutate(n=n()) filter(n>=2) + keylist, anomalies_utils.R:2-25.
    Query("a11_duplicate_detector",
      """SELECT l_orderkey, count(*) AS n,
        |       string_agg(CAST(l_linenumber AS VARCHAR), ',' ORDER BY l_linenumber) AS keylist
        |FROM lineitem GROUP BY l_orderkey HAVING count(*) >= 2""".stripMargin) {
      (s, d) => Tables.lineitem(s, d).groupBy("l_orderkey").agg(
          count(lit(1)).as("n"),
          concat_ws(",", array_sort(collect_list(col("l_linenumber"))).cast("array<string>")).as("keylist"))
        .filter(col("n") >= 2)
    },

    // ---- A13: group-all-match filter -----------------------------------------
    // Ref: households where ALL members refused, 00.store_se_goals.R:152-163.
    Query("a13_group_all_match",
      """SELECT o_custkey FROM orders GROUP BY o_custkey
        |HAVING sum(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) = count(*)""".stripMargin) {
      (s, d) => Tables.orders(s, d).groupBy("o_custkey")
        .agg(sum(when(col("o_orderstatus") === "F", 1).otherwise(0)).as("__nf"),
             count(lit(1)).as("__n"))
        .filter(col("__nf") === col("__n")).select("o_custkey")
    },

    // ---- A14: tabulation with grand total (rollup) ----------------------------
    // Ref: tabyl + adorn_totals, pipeline-analysis/data_prep/ntd.R:79-93.
    Query("a14_totals_rollup",
      """SELECT coalesce(o_orderstatus, 'Total') AS status, count(*) AS n
        |FROM orders GROUP BY ROLLUP(o_orderstatus)""".stripMargin) {
      (s, d) => Tables.orders(s, d).rollup("o_orderstatus")
        .agg(count(lit(1)).as("n"))
        .select(coalesce(col("o_orderstatus"), lit("Total")).as("status"), col("n"))
    },

    // ---- J1: big-to-big inner join (sort-merge territory at scale) -------------
    Query("j01_inner_join",
      s"""SELECT o_orderstatus, count(*) AS n, ${dsumSql("l_quantity")} AS sum_qty
         |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
         |GROUP BY o_orderstatus""".stripMargin) {
      (s, d) => Tables.lineitem(s, d)
        .join(Tables.orders(s, d), col("l_orderkey") === col("o_orderkey"))
        .groupBy("o_orderstatus")
        .agg(count(lit(1)).as("n"), dsum(col("l_quantity")).as("sum_qty"))
    },

    // ---- J2: dimension left join, explicitly broadcast --------------------------
    // Ref: form ⟕ assignments (96-row dim), 00.store_se_goals.R:548-549.
    Query("j02_broadcast_dim_join",
      """SELECT r_name, count(*) AS n_customers
        |FROM customer
        |LEFT JOIN nation ON c_nationkey = n_nationkey
        |LEFT JOIN region ON n_regionkey = r_regionkey
        |GROUP BY r_name""".stripMargin) {
      (s, d) => Tables.customer(s, d)
        .join(broadcast(Tables.nation(s, d)), col("c_nationkey") === col("n_nationkey"), "left")
        .join(broadcast(Tables.region(s, d)), col("n_regionkey") === col("r_regionkey"), "left")
        .groupBy("r_name").agg(count(lit(1)).as("n_customers"))
    },

    // ---- J3/J4: anti join (batch DELETE / set difference) ------------------------
    // Ref: processing_utils.R:369-389.
    Query("j03_anti_join",
      """SELECT c_custkey FROM customer
        |WHERE c_custkey NOT IN (SELECT o_custkey FROM orders WHERE o_orderstatus = 'F')""".stripMargin) {
      (s, d) => Tables.customer(s, d)
        .join(Tables.orders(s, d).filter(col("o_orderstatus") === "F"),
              col("c_custkey") === col("o_custkey"), "left_anti")
        .select("c_custkey")
    },

    // ---- J5: semi join -------------------------------------------------------
    // Ref: households visited but person missed, safety_status...Rmd:418.
    Query("j05_semi_join",
      """SELECT c_custkey, c_name FROM customer
        |WHERE EXISTS (SELECT 1 FROM orders
        |              WHERE o_custkey = c_custkey AND o_totalprice > 300000)""".stripMargin) {
      (s, d) => Tables.customer(s, d)
        .join(Tables.orders(s, d).filter(col("o_totalprice") > 300000),
              col("c_custkey") === col("o_custkey"), "left_semi")
        .select("c_custkey", "c_name")
    },

    // ---- J8: temporal as-of filter join -----------------------------------------
    // Ref: events before first departure per extid, 00.store_se_goals.R:229-234.
    // Keep each user's events strictly before their first 'logout' event.
    Query("j08_asof_filter",
      """SELECT e.user_id, count(*) AS n_before
        |FROM events e
        |LEFT JOIN (SELECT user_id, min(ts) AS dep_ts FROM events
        |           WHERE event_type = 'logout' GROUP BY user_id) dep
        |  ON e.user_id = dep.user_id
        |WHERE dep.dep_ts IS NULL OR e.ts < dep.dep_ts
        |GROUP BY e.user_id""".stripMargin) {
      (s, d) => {
        val ev = Tables.events(s, d)
        val dep = ev.filter(col("event_type") === "logout")
          .groupBy(col("user_id").as("dep_user")).agg(min(col("ts")).as("dep_ts"))
        ev.join(dep, col("user_id") === col("dep_user"), "left")
          .filter(col("dep_ts").isNull || col("ts") < col("dep_ts"))
          .groupBy("user_id").agg(count(lit(1)).as("n_before"))
      }
    },

    // ---- J11/R9: cross join skeleton ---------------------------------------------
    // Ref: expand_grid(visit, extid), 00.store_se_goals.R:41-45.
    Query("j11_cross_join_skeleton",
      """SELECT r_name, o_orderstatus FROM region
        |CROSS JOIN (SELECT DISTINCT o_orderstatus FROM orders)""".stripMargin) {
      (s, d) => Tables.region(s, d).select("r_name")
        .crossJoin(Tables.orders(s, d).select("o_orderstatus").distinct())
    },

    // ---- J13: join-key fallback / coalesce ------------------------------------------
    // Ref: id = hhid else recon_map else painted, randomize.R:205-208.
    Query("j13_coalesce_key",
      """SELECT coalesce(nullif(o_orderpriority, '1-URGENT'), o_orderstatus) AS k,
        |       count(*) AS n
        |FROM orders GROUP BY 1""".stripMargin) {
      (s, d) => Tables.orders(s, d)
        .groupBy(coalesce(nullif_(col("o_orderpriority"), lit("1-URGENT")),
                          col("o_orderstatus")).as("k"))
        .agg(count(lit(1)).as("n"))
    },

    // ---- W1: count over partition (no reduction) ----------------------------------
    Query("w01_count_over",
      """SELECT o_orderkey, o_custkey,
        |       count(*) OVER (PARTITION BY o_custkey) AS n_cust_orders
        |FROM orders""".stripMargin) {
      (s, d) => Windows.countOver(Tables.orders(s, d), Seq("o_custkey"), "n_cust_orders")
        .select("o_orderkey", "o_custkey", "n_cust_orders")
    },

    // ---- W3: top-k per group ---------------------------------------------------------
    Query("w03_topk_per_group",
      """SELECT o_custkey, o_orderkey, o_totalprice, rank FROM (
        |  SELECT o_custkey, o_orderkey, o_totalprice,
        |         row_number() OVER (PARTITION BY o_custkey
        |                            ORDER BY o_totalprice DESC, o_orderkey DESC) AS rank
        |  FROM orders) WHERE rank <= 3""".stripMargin) {
      (s, d) => Windows.topKPerGroup(Tables.orders(s, d), Seq("o_custkey"),
          Seq(col("o_totalprice"), col("o_orderkey")), 3)
        .select("o_custkey", "o_orderkey", "o_totalprice", "rank")
    },

    // ---- J15: bucketed range join (point-in-interval as an equi-join) --------------
    // The raw range condition the oracle states would plan as a
    // nested-loop join; RangeJoin buckets both sides so it becomes an
    // equi-join on the bucket id (RangeJoinSpec pins the plan shape).
    Query("j15_range_bucket_join",
      """SELECT c_custkey, s_suppkey FROM customer c JOIN supplier s
        |  ON c.c_acctbal >= s.s_acctbal AND c.c_acctbal < s.s_acctbal + 500""".stripMargin) {
      (s, d) => {
        val pts = Tables.customer(s, d).select("c_custkey", "c_acctbal")
        val iv = Tables.supplier(s, d).select(col("s_suppkey"),
          col("s_acctbal").as("lo"), (col("s_acctbal") + 500).as("hi"))
        graft.operators.RangeJoin.pointInInterval(pts, "c_acctbal", iv, "lo", "hi",
            bucketWidth = 500.0)
          .select("c_custkey", "s_suppkey")
      }
    },

    // ---- J16: skew-salted equi-join ------------------------------------------
    // The salting transform must be INVISIBLE in the result: salted join
    // (hot keys spread over `factor` reducers) equals the plain join the
    // oracle states. SkewSpec pins the partition-spread mechanics; this
    // row pins result equivalence on real data under the driver's hash.
    Query("j16_salted_join",
      """SELECT o_orderkey, o_custkey, c_name FROM orders
        |JOIN customer ON o_custkey = c_custkey""".stripMargin) {
      (s, d) => {
        val big = Tables.orders(s, d).select("o_orderkey", "o_custkey")
        val dim = Tables.customer(s, d)
          .select(col("c_custkey").as("o_custkey"), col("c_name"))
        graft.operators.Skew.saltedJoin(big, dim, "o_custkey", "o_orderkey",
            factor = 8)
          .select("o_orderkey", "o_custkey", "c_name")
      }
    },

    // ---- A20: one-pass table profile (generic data-quality check) ------------
    // Per-column nulls/min/max in ONE aggregation pass + a stack() melt —
    // never a scan per column. Long/string columns only in the oracle
    // row (double/timestamp → string casts are engine-formatted; the
    // operator handles them, ProfileSpec pins that side).
    Query("a20_table_profile",
      """SELECT 'o_orderkey' AS col_name, count(*) AS n_rows,
        |       CAST(sum(CASE WHEN o_orderkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_nulls,
        |       CAST(min(o_orderkey) AS VARCHAR) AS min_str,
        |       CAST(max(o_orderkey) AS VARCHAR) AS max_str FROM orders
        |UNION ALL
        |SELECT 'o_custkey', count(*),
        |       CAST(sum(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END) AS BIGINT),
        |       CAST(min(o_custkey) AS VARCHAR), CAST(max(o_custkey) AS VARCHAR) FROM orders
        |UNION ALL
        |SELECT 'o_orderstatus', count(*),
        |       CAST(sum(CASE WHEN o_orderstatus IS NULL THEN 1 ELSE 0 END) AS BIGINT),
        |       CAST(min(o_orderstatus) AS VARCHAR), CAST(max(o_orderstatus) AS VARCHAR) FROM orders
        |UNION ALL
        |SELECT 'o_orderpriority', count(*),
        |       CAST(sum(CASE WHEN o_orderpriority IS NULL THEN 1 ELSE 0 END) AS BIGINT),
        |       CAST(min(o_orderpriority) AS VARCHAR), CAST(max(o_orderpriority) AS VARCHAR) FROM orders""".stripMargin) {
      (s, d) => graft.operators.Profile.profile(Tables.orders(s, d),
          Seq("o_orderkey", "o_custkey", "o_orderstatus", "o_orderpriority"))
        .select(col("column").as("col_name"), col("n_rows"), col("n_nulls"),
          col("min_str"), col("max_str"))
    },

    // ---- A21: CUBE grouping sets ---------------------------------------------
    // All four grouping-set combinations in ONE pass (Expand + single
    // hash aggregate — not four scans unioned); NULL group keys mark the
    // rolled-up levels identically in both engines. Completes the
    // grouping-sets surface a14's ROLLUP started.
    Query("a21_cube",
      """SELECT l_returnflag, l_linestatus, count(*) AS n,
        |       CAST(sum(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS qty
        |FROM lineitem
        |GROUP BY CUBE (l_returnflag, l_linestatus)""".stripMargin) {
      (s, d) => Tables.lineitem(s, d)
        .cube("l_returnflag", "l_linestatus")
        .agg(count(lit(1)).as("n"),
          sum(col("l_quantity").cast("decimal(18,4)")).cast("double").as("qty"))
    },

    // ---- A22: incremental aggregate maintenance -------------------------------
    // combine(base, partial(delta)) == full recompute, proven by the
    // oracle aggregating the whole table: the maintained aggregate is
    // refreshed by scanning ONLY the delta (the Spark-native answer to
    // the reference's hourly full re-run). Decimal sums so the fold is
    // exact; min/max dates survive the outer join via least/greatest.
    Query("a22_incremental_agg",
      """SELECT o_orderstatus, count(*) AS n,
        |       CAST(sum(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS total,
        |       min(o_orderdate) AS first_day, max(o_orderdate) AS last_day
        |FROM orders GROUP BY 1""".stripMargin) {
      (s, d) => {
        val cutoff = lit("1995-06-01").cast("date")
        def partial(df: org.apache.spark.sql.DataFrame) =
          df.groupBy("o_orderstatus").agg(
            count(lit(1)).as("n"),
            sum(col("o_totalprice").cast("decimal(18,4)")).as("total"),
            min(col("o_orderdate")).as("first_day"),
            max(col("o_orderdate")).as("last_day"))
        val orders = Tables.orders(s, d)
        val base = partial(orders.filter(col("o_orderdate") < cutoff))
        val delta = partial(orders.filter(col("o_orderdate") >= cutoff))
        graft.operators.Incremental.combine(base, delta,
            Seq("o_orderstatus"), sums = Seq("n", "total"),
            mins = Seq("first_day"), maxs = Seq("last_day"))
          .select(col("o_orderstatus"), col("n"),
            col("total").cast("double").as("total"),
            col("first_day"), col("last_day"))
      }
    },

    // ---- A23: histogram-interpolated quantiles ---------------------------------
    // The quantile path that survives scale: two narrow passes + a
    // bins-sized reduction, vs a18's exact percentile whose global sort
    // is the thing you can't do at 100 TB. Pure IEEE +,-,*,/ and floor
    // after integer bin counts — bit-identical cross-engine, no libm.
    Query("a23_histogram_quantile",
      """WITH stats AS (SELECT min(CAST(l_extendedprice AS DOUBLE)) AS mn,
        |                      max(CAST(l_extendedprice AS DOUBLE)) AS mx,
        |                      count(l_extendedprice) AS n FROM lineitem),
        |c AS (SELECT bin, count(*) AS cnt FROM (
        |        SELECT least(floor((CAST(l_extendedprice AS DOUBLE) - mn)
        |                           / ((mx - mn) / 100)), 99) AS bin
        |        FROM lineitem, stats) GROUP BY 1),
        |cum AS (SELECT bin, cnt, sum(cnt) OVER (ORDER BY bin) AS cum FROM c),
        |qs(q) AS (VALUES (CAST(0.25 AS DOUBLE)), (CAST(0.5 AS DOUBLE)),
        |                 (CAST(0.75 AS DOUBLE)), (CAST(0.95 AS DOUBLE))),
        |sel AS (SELECT q, min(bin) AS bin FROM qs, cum, stats
        |        WHERE CAST(cum AS DOUBLE) >= q * n GROUP BY q)
        |SELECT q, mn + ((mx - mn) / 100) *
        |          (bin + (q * n - CAST(cum - cnt AS DOUBLE))
        |                 / CAST(cnt AS DOUBLE)) AS est
        |FROM sel JOIN cum USING (bin), stats""".stripMargin) {
      (s, d) => graft.operators.Profile.histogramQuantiles(
        Tables.lineitem(s, d), "l_extendedprice", bins = 100,
        qs = Seq(0.25, 0.5, 0.75, 0.95))
    },

    // ---- W9: first-per-group (ascending latest-per-group variant) -----------------
    Query("w09_first_per_group",
      """SELECT o_custkey, o_orderkey, o_orderdate FROM (
        |  SELECT o_custkey, o_orderkey, o_orderdate,
        |         row_number() OVER (PARTITION BY o_custkey
        |                            ORDER BY o_orderdate, o_orderkey) AS rn
        |  FROM orders) WHERE rn = 1""".stripMargin) {
      (s, d) => Windows.firstPerGroup(Tables.orders(s, d), Seq("o_custkey"),
          Seq(col("o_orderdate"), col("o_orderkey")))
        .select("o_custkey", "o_orderkey", "o_orderdate")
    },

    // ---- W5: lag / change ---------------------------------------------------------------
    Query("w05_lag_delta",
      """SELECT o_custkey, o_orderkey,
        |       o_totalprice - lag(o_totalprice) OVER (
        |         PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS delta
        |FROM orders""".stripMargin) {
      (s, d) => {
        val w = Window.partitionBy("o_custkey").orderBy(col("o_orderdate"), col("o_orderkey"))
        Tables.orders(s, d)
          .withColumn("delta", col("o_totalprice") - lag(col("o_totalprice"), 1).over(w))
          .select("o_custkey", "o_orderkey", "delta")
      }
    },

    // ---- W6: cumulative sum ---------------------------------------------------------------
    Query("w06_cumsum",
      """SELECT o_custkey, o_orderkey,
        |       CAST(sum(CAST(o_totalprice AS DECIMAL(18,4))) OVER (
        |         PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
        |         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running
        |FROM orders""".stripMargin) {
      (s, d) => Windows.cumSum(Tables.orders(s, d), Seq("o_custkey"),
          Seq(col("o_orderdate"), col("o_orderkey")),
          col("o_totalprice").cast("decimal(18,4)"), "running")
        .withColumn("running", col("running").cast("double"))
        .select("o_custkey", "o_orderkey", "running")
    },

    // ---- j19: interval-overlap join (bucketed, no nested loop) -------------
    // Overlap join between two interval sets (a.start <= b.end AND
    // b.start <= a.end) as a pure EQUI-join: each interval explodes to
    // the 30-day buckets it touches, candidates meet on the bucket key,
    // and the exact predicate filters inside the join. Duplicate
    // candidates (pairs sharing several buckets) are eliminated
    // allocation-free by counting a pair ONLY in the bucket containing
    // greatest(start_a, start_b) — a day both intervals cover, so the
    // bucket is always shared — no distinct, no post-join shuffle. The
    // oracle is the plain theta join; at scale the theta join is a
    // nested loop, this is a shuffle on the bucket key with fan-out
    // bounded by interval_len/30 + 1.
    Query("j19_interval_overlap",
      """WITH o AS (SELECT o_orderkey AS k,
        |         datediff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE)) AS sd
        |       FROM orders WHERE o_custkey < 300),
        |i AS (SELECT k, sd, sd + k % 20 AS ed FROM o),
        |a AS (SELECT k AS ka, sd AS sa, ed AS ea FROM i WHERE k % 2 = 0),
        |b AS (SELECT k AS kb, sd AS sb, ed AS eb FROM i WHERE k % 2 = 1)
        |SELECT ka, kb, least(ea, eb) - greatest(sa, sb) + 1 AS overlap_days
        |FROM a JOIN b ON sa <= eb AND sb <= ea""".stripMargin) {
      (s, d) => {
        val o = Tables.orders(s, d).filter(col("o_custkey") < 300)
          .select(col("o_orderkey").as("k"),
            unix_date(to_date(col("o_orderdate"))).cast("bigint").as("sd"))
          .withColumn("ed", col("sd") + col("k") % 20)
        val a = o.filter(col("k") % 2 === 0)
          .select(col("k").as("ka"), col("sd").as("sa"), col("ed").as("ea"),
            explode(expr("sequence(sd div 30, ed div 30)")).as("bkt"))
        val b = o.filter(col("k") % 2 =!= 0)
          .select(col("k").as("kb"), col("sd").as("sb"), col("ed").as("eb"),
            explode(expr("sequence(sd div 30, ed div 30)")).as("bkt"))
        a.join(b, Seq("bkt"))
          .filter(col("sa") <= col("eb") && col("sb") <= col("ea") &&
            col("bkt") === expr("greatest(sa, sb) div 30"))
          .select(col("ka"), col("kb"),
            (least(col("ea"), col("eb")) - greatest(col("sa"), col("sb")) + 1)
              .as("overlap_days"))
      }
    },

    // ---- blocked fuzzy join (entity resolution / record linkage) ----------
    // The record-linkage shape the reference's manual household-matching
    // implies: near-identical name variants reconciled by edit distance.
    // Scale design, in order: (1) canonicalize FIRST — fuzzy-match runs
    // over DISTINCT names, never over rows, so the quadratic term is
    // bounded by vocabulary size, not table size (names repeat heavily in
    // any real registry); (2) block on the first token so candidate pairs
    // only form inside a block (classic blocking — the standard recall
    // tradeoff: a typo in token 1 escapes the block, documented); (3) the
    // codegen'd levenshtein only runs on within-block candidates. The
    // distinct side is small after canonicalization → Spark broadcasts
    // the self-join; at a vocabulary too big to broadcast, the equi-join
    // on the block key shuffles both sides by block — still never all-pairs.
    Query("j18_fuzzy_blocked",
      """WITH names AS (SELECT DISTINCT p_name FROM part),
        |b AS (SELECT p_name, string_split(p_name, ' ')[1] AS blk FROM names)
        |SELECT a.p_name AS name_a, b.p_name AS name_b,
        |       levenshtein(a.p_name, b.p_name) AS dist
        |FROM b a JOIN b b ON a.blk = b.blk AND a.p_name < b.p_name
        |WHERE levenshtein(a.p_name, b.p_name) <= 3""".stripMargin) {
      (s, d) => {
        val names = Tables.part(s, d).select("p_name").distinct()
          .withColumn("blk", split(col("p_name"), " ").getItem(0))
        val left = names.select(col("p_name").as("name_a"), col("blk"))
        val right = names.select(col("p_name").as("name_b"), col("blk"))
        left.join(right, Seq("blk"))
          .filter(col("name_a") < col("name_b"))
          .withColumn("dist", levenshtein(col("name_a"), col("name_b")))
          .filter(col("dist") <= 3)
          .select("name_a", "name_b", "dist")
      }
    }
  )

  /** Spark lacks a `nullif` Column function pre-3.5 naming; inline it. */
  private def nullif_(c: org.apache.spark.sql.Column, v: org.apache.spark.sql.Column) =
    when(c === v, lit(null)).otherwise(c)
}
