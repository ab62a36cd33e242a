package graft.queries

import org.apache.spark.sql.functions._
import graft.core.{Query, Tables}
import graft.operators.Windows

/** The goals/targets cascade (SURVEY.md §3.2, 00.store_se_goals.R) — the
  * reference's most intricate query — mapped onto the events table:
  * visit×person skeleton (R9), latest-observation dedup (A10), forward
  * fill down visits (W7), as-of departure eligibility (J8), and the
  * 100%-refusal household carry-forward to the next visit (A13 + W10).
  *
  * Scale notes: the skeleton crossJoin broadcasts the tiny visit dim;
  * per-person state flows through one shuffle on user_id shared by the
  * dedup window, the fill window, and the join — Catalyst reuses the
  * partitioning. No driver-side loops.
  */
object Goals {

  val queries: Seq[Query] = Seq(

    // ---- G1: visit targets = skeleton + latest obs + fill + as-of ----------
    Query("g01_visit_targets",
      """WITH weeks(visit, vn, wstart) AS (
        |  VALUES ('V1', 1, TIMESTAMP '2024-01-01'), ('V2', 2, TIMESTAMP '2024-01-08'),
        |         ('V3', 3, TIMESTAMP '2024-01-15'), ('V4', 4, TIMESTAMP '2024-01-22')),
        |obs AS (
        |  SELECT user_id, vn, event_type AS status FROM (
        |    SELECT user_id, 1 + (CAST(ts AS DATE) - DATE '2024-01-01') // 7 AS vn,
        |           event_type, ts, event_id,
        |           row_number() OVER (
        |             PARTITION BY user_id, 1 + (CAST(ts AS DATE) - DATE '2024-01-01') // 7
        |             ORDER BY ts DESC, event_id DESC) AS rn
        |    FROM events) WHERE rn = 1 AND vn <= 4),
        |dep AS (SELECT user_id, min(ts) AS dep_ts FROM events
        |        WHERE event_type = 'logout' GROUP BY user_id)
        |SELECT p.user_id, w.visit,
        |       last_value(o.status IGNORE NULLS) OVER (
        |         PARTITION BY p.user_id ORDER BY w.vn
        |         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS carried_status,
        |       (dep.dep_ts IS NULL OR w.wstart <= dep.dep_ts) AS eligible
        |FROM (SELECT DISTINCT user_id FROM events) p
        |CROSS JOIN weeks w
        |LEFT JOIN obs o ON o.user_id = p.user_id AND o.vn = w.vn
        |LEFT JOIN dep ON dep.user_id = p.user_id""".stripMargin) {
      (s, d) => {
        val ev = Tables.events(s, d)
        val weeks = s.sql(
          """SELECT * FROM VALUES ('V1', 1, TIMESTAMP'2024-01-01'),
            |  ('V2', 2, TIMESTAMP'2024-01-08'), ('V3', 3, TIMESTAMP'2024-01-15'),
            |  ('V4', 4, TIMESTAMP'2024-01-22') t(visit, vn, wstart)""".stripMargin)
        val vn = lit(1) + floor(datediff(to_date(col("ts")), lit("2024-01-01").cast("date")) / 7)
        val obs = Windows.latestPerGroup(
            ev.withColumn("vn", vn).filter(col("vn") <= 4),
            Seq("user_id", "vn"), Seq(col("ts"), col("event_id")))
          .select(col("user_id").as("o_user"), col("vn").as("o_vn"),
            col("event_type").as("status"))
        val dep = ev.filter(col("event_type") === "logout")
          .groupBy(col("user_id").as("d_user")).agg(min(col("ts")).as("dep_ts"))
        val skeleton = ev.select("user_id").distinct().crossJoin(broadcast(weeks))
        val joined = skeleton
          .join(obs, col("user_id") === col("o_user") && col("vn") === col("o_vn"), "left")
          .join(dep, col("user_id") === col("d_user"), "left")
        Windows.forwardFill(
            joined.withColumn("carried_status", col("status")),
            Seq("user_id"), Seq(col("vn")), Seq("carried_status"))
          .select(col("user_id"), col("visit"), col("carried_status"),
            (col("dep_ts").isNull || col("wstart") <= col("dep_ts")).as("eligible"))
      }
    },

    // ---- G2: 100%-refusal household carry-forward ---------------------------
    // Households (user_id % 25) where EVERY member active in week v had an
    // 'error' event are excluded from visit v+1 (capped at V4).
    Query("g02_full_refusal_carry",
      """WITH m AS (
        |  SELECT user_id % 25 AS hh, 1 + (CAST(ts AS DATE) - DATE '2024-01-01') // 7 AS vn,
        |         user_id,
        |         max(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS refused
        |  FROM events GROUP BY 1, 2, 3),
        |full_hh AS (
        |  SELECT hh, vn FROM m WHERE vn <= 3
        |  GROUP BY hh, vn HAVING sum(refused) = count(*))
        |SELECT hh, 'V' || CAST(vn + 1 AS VARCHAR) AS excluded_visit FROM full_hh""".stripMargin) {
      (s, d) => {
        val ev = Tables.events(s, d)
        val vn = lit(1) + floor(datediff(to_date(col("ts")), lit("2024-01-01").cast("date")) / 7)
        val m = ev.withColumn("hh", col("user_id") % 25).withColumn("vn", vn)
          .groupBy("hh", "vn", "user_id")
          .agg(max(when(col("event_type") === "error", 1).otherwise(0)).as("refused"))
        m.filter(col("vn") <= 3)
          .groupBy("hh", "vn")
          .agg(sum(col("refused")).as("nr"), count(lit(1)).as("n"))
          .filter(col("nr") === col("n"))
          .select(col("hh"), concat(lit("V"), (col("vn") + 1).cast("string")).as("excluded_visit"))
      }
    }
  )
}
