package graft.queries

import org.apache.spark.sql.functions._
import graft.core.{Query, Tables}

/** Report-table computations (SURVEY.md §2.7 conditional surface): the
  * reference's status/reason decision tables (60-branch case_when
  * chains), weight-band dosing, and metric pivots with derived ratios.
  * Big when/otherwise chains constant-fold and stay inside
  * WholeStageCodegen — they cost nothing beyond the scan.
  */
object Reporting {

  val queries: Seq[Query] = Seq(

    // ---- status/reason decision table (safety_reason analog) ---------------
    // First-match-wins chain over several columns — the reference's
    // status tables; NULL falls through every branch to the default.
    Query("r06_status_decision_table",
      """SELECT o_orderkey,
        |  CASE
        |    WHEN o_orderstatus = 'F' AND o_totalprice > 300000 THEN 'closed_large'
        |    WHEN o_orderstatus = 'F' AND o_orderpriority = '1-URGENT' THEN 'closed_urgent'
        |    WHEN o_orderstatus = 'F' THEN 'closed'
        |    WHEN o_orderstatus = 'P' AND o_totalprice > 200000 THEN 'pending_review'
        |    WHEN o_orderstatus = 'P' THEN 'pending'
        |    WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 'open_priority'
        |    WHEN o_totalprice < 50000 THEN 'open_small'
        |    ELSE 'open'
        |  END AS status_reason
        |FROM orders""".stripMargin) {
      (s, d) => Tables.orders(s, d).select(col("o_orderkey"),
        when(col("o_orderstatus") === "F" && col("o_totalprice") > 300000, "closed_large")
          .when(col("o_orderstatus") === "F" && col("o_orderpriority") === "1-URGENT", "closed_urgent")
          .when(col("o_orderstatus") === "F", "closed")
          .when(col("o_orderstatus") === "P" && col("o_totalprice") > 200000, "pending_review")
          .when(col("o_orderstatus") === "P", "pending")
          .when(col("o_orderpriority").isin("1-URGENT", "2-HIGH"), "open_priority")
          .when(col("o_totalprice") < 50000, "open_small")
          .otherwise("open").as("status_reason"))
    },

    // ---- weight-band dosing (pharmacy coartem analog) -----------------------
    Query("r07_dose_bands",
      """SELECT band, count(*) AS n, CAST(sum(dose) AS BIGINT) AS total_tablets FROM (
        |  SELECT CASE WHEN l_quantity < 15 THEN '5-14kg' WHEN l_quantity < 25 THEN '15-24kg'
        |              WHEN l_quantity < 35 THEN '25-34kg' ELSE '35+kg' END AS band,
        |         CASE WHEN l_quantity < 15 THEN 1 WHEN l_quantity < 25 THEN 2
        |              WHEN l_quantity < 35 THEN 3 ELSE 4 END AS dose
        |  FROM lineitem)
        |GROUP BY band""".stripMargin) {
      (s, d) => {
        val q = col("l_quantity")
        Tables.lineitem(s, d)
          .select(
            when(q < 15, "5-14kg").when(q < 25, "15-24kg")
              .when(q < 35, "25-34kg").otherwise("35+kg").as("band"),
            when(q < 15, 1).when(q < 25, 2).when(q < 35, 3).otherwise(4).as("dose"))
          .groupBy("band")
          .agg(count(lit(1)).as("n"), sum(col("dose")).cast("bigint").as("total_tablets"))
      }
    },

    // ---- metric pivot with derived ratio (se_and_pfu metrics analog) ---------
    Query("r08_metric_ratio",
      """SELECT o_orderpriority,
        |  CAST(count(CASE WHEN o_orderstatus = 'F' THEN 1 END) AS BIGINT) AS done,
        |  CAST(count(*) AS BIGINT) AS total,
        |  count(CASE WHEN o_orderstatus = 'F' THEN 1 END) * CAST(1.0 AS DOUBLE) / count(*) AS pct_done
        |FROM orders GROUP BY o_orderpriority""".stripMargin) {
      (s, d) => Tables.orders(s, d).groupBy("o_orderpriority").agg(
        count(when(col("o_orderstatus") === "F", 1)).as("done"),
        count(lit(1)).as("total"),
        (count(when(col("o_orderstatus") === "F", 1)) * lit(1.0) / count(lit(1))).as("pct_done"))
    }
  )
}
