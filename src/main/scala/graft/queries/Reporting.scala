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
    },

    // ---- incidence rate with 95% CI (prevalence_incidence.qmd analog) -------
    // rate = cases / person-time; CI = rate * exp(±z / sqrt(cases)).
    // exp/log are libm (not correctly rounded) → outputs rounded to 6 dp
    // so sub-ulp engine differences cannot flip the compare.
    Query("r11_incidence_ci",
      """SELECT o_orderpriority AS grp,
        |       CAST(cases AS BIGINT) AS cases,
        |       round(rate, 6) AS rate,
        |       round(rate * exp(-1.959964 / sqrt(cases)), 6) AS ci_lo,
        |       round(rate * exp(1.959964 / sqrt(cases)), 6) AS ci_hi
        |FROM (
        |  SELECT o_orderpriority,
        |         CAST(count(CASE WHEN o_orderstatus = 'F' THEN 1 END) AS DOUBLE) AS cases,
        |         count(CASE WHEN o_orderstatus = 'F' THEN 1 END)
        |           * CAST(1.0 AS DOUBLE) / count(*) AS rate
        |  FROM orders GROUP BY o_orderpriority)""".stripMargin) {
      (s, d) => {
        val cases = count(when(col("o_orderstatus") === "F", 1)).cast("double")
        val rate = cases * lit(1.0) / count(lit(1))
        val z = lit(1.959964)
        Tables.orders(s, d).groupBy(col("o_orderpriority").as("grp"))
          .agg(cases.as("cases_d"), rate.as("rate_raw"))
          .select(col("grp"),
            col("cases_d").cast("bigint").as("cases"),
            round(col("rate_raw"), 6).as("rate"),
            round(col("rate_raw") * exp(z * -1 / sqrt(col("cases_d"))), 6).as("ci_lo"),
            round(col("rate_raw") * exp(z / sqrt(col("cases_d"))), 6).as("ci_hi"))
      }
    },

    // ---- scalar function sampler (SURVEY §2.7 surface in one projection) ----
    Query("r09_scalar_sampler",
      """SELECT p_partkey,
        |  substring(p_name, 1, 8) AS sub,
        |  upper(p_brand) AS up, lower(p_type) AS lo,
        |  length(p_name) AS len,
        |  concat_ws('|', p_brand, p_type) AS joined,
        |  CASE WHEN p_type LIKE '%BRASS%' THEN 1 ELSE 0 END AS has_brass,
        |  regexp_extract(p_type, '[A-Z]+$') AS last_word,
        |  round(p_retailprice, 1) AS price_r,
        |  CAST(sqrt(CAST(p_size AS DOUBLE)) AS DOUBLE) AS sq,
        |  greatest(p_size, 25) AS g, least(p_size, 25) AS l,
        |  coalesce(nullif(p_brand, 'Brand#13'), 'OTHER') AS brand_o,
        |  printf('%05d', p_size) AS padded
        |FROM part""".stripMargin) {
      (s, d) => Tables.part(s, d).select(col("p_partkey"),
        substring(col("p_name"), 1, 8).as("sub"),
        upper(col("p_brand")).as("up"), lower(col("p_type")).as("lo"),
        length(col("p_name")).as("len"),
        concat_ws("|", col("p_brand"), col("p_type")).as("joined"),
        when(col("p_type").like("%BRASS%"), 1).otherwise(0).as("has_brass"),
        regexp_extract(col("p_type"), "[A-Z]+$", 0).as("last_word"),
        round(col("p_retailprice"), 1).as("price_r"),
        sqrt(col("p_size").cast("double")).as("sq"),
        greatest(col("p_size"), lit(25)).as("g"), least(col("p_size"), lit(25)).as("l"),
        coalesce(when(col("p_brand") === "Brand#13", lit(null)).otherwise(col("p_brand")),
          lit("OTHER")).as("brand_o"),
        format_string("%05d", col("p_size")).as("padded"))
    },

    // ---- shared-base metric fan-out (§4.2 exchange reuse) --------------------
    // One filtered/joined base feeds several metric rows — the reference
    // reuses one merged tibble across ~10 report metrics; here the base
    // is cached and each metric is a row of a unioned summary.
    Query("r10_shared_base_metrics",
      """WITH base AS (
        |  SELECT o_orderkey, o_custkey, o_totalprice, o_orderstatus FROM orders
        |  WHERE o_totalprice > 1000)
        |SELECT 'n_orders' AS metric, CAST(count(*) AS DOUBLE) AS value FROM base
        |UNION ALL
        |SELECT 'n_customers', CAST(count(DISTINCT o_custkey) AS DOUBLE) FROM base
        |UNION ALL
        |SELECT 'open_share',
        |       CAST(sum(CASE WHEN o_orderstatus = 'O' THEN 1 ELSE 0 END) AS DOUBLE) / count(*)
        |FROM base
        |UNION ALL
        |SELECT 'total_value',
        |       CAST(sum(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) FROM base""".stripMargin) {
      (s, d) => {
        val base = Tables.orders(s, d)
          .filter(col("o_totalprice") > 1000)
          .select("o_orderkey", "o_custkey", "o_totalprice", "o_orderstatus")
          .cache()
        def metric(name: String, v: org.apache.spark.sql.Column) =
          base.agg(v.as("value")).select(lit(name).as("metric"), col("value"))
        metric("n_orders", count(lit(1)).cast("double"))
          .unionByName(metric("n_customers", countDistinct(col("o_custkey")).cast("double")))
          .unionByName(metric("open_share",
            sum(when(col("o_orderstatus") === "O", 1).otherwise(0)).cast("double") / count(lit(1))))
          .unionByName(metric("total_value",
            sum(col("o_totalprice").cast("decimal(18,4)")).cast("double")))
      }
    }
  )
}
