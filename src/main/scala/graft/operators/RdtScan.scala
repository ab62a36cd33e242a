package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.types._

/** W11: the reference's RDT incident-case state machine, mirroring
  * pipeline-analysis/data_prep/evaluate_rdts.R:84-131 branch for branch.
  * The canonical per-key recurrence lag() cannot express: a row's
  * incident flag can depend on the PREVIOUS row's computed flag.
  *
  * Per person, visits in visit_number order:
  *  - enrollment (first row): incident iff pan or pf is "Positive";
  *    days_since_prev / days_at_risk stay null;
  *  - later rows: days_since_prev = date gap to the previous visit;
  *    days_at_risk subtracts 14 iff the PREVIOUS visit was treated
  *    (child_took_coartem == "yes") — the protection interval follows
  *    treatment, it does not precede it;
  *  - incident_case: pan Positive → true; pf Negative → false;
  *    pf Positive → true unless the streak logic clears it (consecutive
  *    visit AND previous not known-non-incident AND previous pf Positive
  *    AND previous visit treated → false); pan non-positive with blank
  *    pf → unknown (null), exactly the reference's NA.
  *
  * Built on Sessionize.scanPerKey (repartition + secondary sort + one
  * streaming pass), so a million-visit person costs O(1) memory.
  */
object RdtScan {

  /** Input columns: keyCol (person), visitNoCol (numeric visit number),
    * dateCol (date or epoch-day integer), plus `pan_result`, `pf_result`,
    * `child_took_coartem` strings ("Positive"/"Negative"/"", "yes"/other).
    * Adds nullable `days_since_prev`, `days_at_risk`, `incident_case`.
    */
  def evaluate(df: DataFrame, keyCol: String, visitNoCol: String,
               dateCol: String): DataFrame = {
    val vnIdx = df.schema.fieldIndex(visitNoCol)
    val dateIdx = df.schema.fieldIndex(dateCol)
    val panIdx = df.schema.fieldIndex("pan_result")
    val pfIdx = df.schema.fieldIndex("pf_result")
    val coIdx = df.schema.fieldIndex("child_took_coartem")
    // state: previous row's (visit_number, epoch day, pf, coartem, incident)
    Sessionize.scanPerKey[(Long, Long, String, String, java.lang.Boolean)](
      df, Seq(keyCol), Seq(visitNoCol),
      StructType(Seq(
        StructField("days_since_prev", IntegerType, nullable = true),
        StructField("days_at_risk", IntegerType, nullable = true),
        StructField("incident_case", BooleanType, nullable = true)))) {
      case (st, row) =>
        val vn: Long = row.get(vnIdx) match {
          case i: Int  => i.toLong
          case l: Long => l
        }
        val day: Long = row.get(dateIdx) match {
          case d: java.sql.Date       => d.toLocalDate.toEpochDay
          case d: java.time.LocalDate => d.toEpochDay
          case i: Int                 => i.toLong
          case l: Long                => l
        }
        val pan = row.getString(panIdx)
        val pf = row.getString(pfIdx)
        val co = row.getString(coIdx)
        st match {
          case None => // enrollment visit: evaluate_rdts.R:87
            val inc: java.lang.Boolean = pan == "Positive" || pf == "Positive"
            ((vn, day, pf, co, inc), Seq(null, null, inc))
          case Some((pvn, pday, ppf, pco, pinc)) => // evaluate_rdts.R:94-127
            val dsp = (day - pday).toInt
            val dar = dsp - (if (pco == "yes") 14 else 0)
            val inc: java.lang.Boolean =
              if (pan == "Positive") java.lang.Boolean.TRUE
              else if (pf == "Negative") java.lang.Boolean.FALSE
              else if (pf == "Positive") {
                if (vn != pvn + 1) java.lang.Boolean.TRUE // skipped a visit
                else if (pinc != null && !pinc.booleanValue) java.lang.Boolean.TRUE
                else if (ppf != "Positive") java.lang.Boolean.TRUE
                else if (pco == "yes") java.lang.Boolean.FALSE
                else java.lang.Boolean.TRUE
              } else null // pan non-positive, pf blank: unknown (R's NA)
            ((vn, day, pf, co, inc), Seq(dsp, dar, inc))
        }
    }
  }
}
