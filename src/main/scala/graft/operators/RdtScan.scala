package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.types._

/** W11: the reference's RDT incident-case state machine
  * (pipeline-analysis/data_prep/evaluate_rdts.R:82-135) — the canonical
  * example of a per-key recurrence that lag() CANNOT express: each row's
  * incident flag depends on the PREVIOUS row's computed carry state, not
  * just its stored columns.
  *
  * Semantics per person, visits in order:
  *  - a positive test is an incident case unless the person was already
  *    in a carried positive episode;
  *  - taking treatment ends the episode 14 days after the visit;
  *  - days_at_risk accrues the inter-visit gap minus 14 days per treated
  *    visit, floored at 0.
  *
  * Built on Sessionize.scanPerKey (repartition + secondary sort + one
  * streaming pass), so a million-visit person costs O(1) memory.
  */
object RdtScan {

  /** Input columns: keyCol (person), dateCol (date), `positive` boolean,
    * `treated` boolean. Adds `incident_case` boolean and
    * `days_at_risk` int.
    */
  def evaluate(df: DataFrame, keyCol: String, dateCol: String): DataFrame = {
    val dateIdx = df.schema.fieldIndex(dateCol)
    val posIdx = df.schema.fieldIndex("positive")
    val trtIdx = df.schema.fieldIndex("treated")
    // state: (lastEpochDay, inEpisode, episodeEndDay)
    Sessionize.scanPerKey[(Long, Boolean, Long)](
      df, Seq(keyCol), Seq(dateCol),
      StructType(Seq(
        StructField("incident_case", BooleanType, nullable = false),
        StructField("days_at_risk", IntegerType, nullable = false)))) {
      case (st, row) =>
        val day = row.get(dateIdx) match {
          case d: java.sql.Date       => d.toLocalDate.toEpochDay
          case d: java.time.LocalDate => d.toEpochDay
        }
        val positive = row.getBoolean(posIdx)
        val treated = row.getBoolean(trtIdx)
        val (prevDay, inEpisode, episodeEnd) = st.getOrElse((day, false, Long.MinValue))
        val stillCarried = inEpisode && day <= episodeEnd
        val incident = positive && !stillCarried
        val gap = (day - prevDay).toInt
        val risk = math.max(0, gap - (if (treated) 14 else 0))
        val nextEpisode = positive || stillCarried
        val nextEnd =
          if (treated) day + 14
          else if (stillCarried) episodeEnd
          else if (positive) Long.MaxValue // untreated positive: carried until treated
          else Long.MinValue
        ((day, nextEpisode, nextEnd), Seq(incident, risk))
    }
  }
}
