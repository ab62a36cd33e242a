package graft.queries

import org.apache.spark.sql.functions._
import graft.core.{Query, Tables}
import graft.operators.{Anomalies, Standardize, Windows}

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
    }
  )
}
