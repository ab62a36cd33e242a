package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Slowly-changing-dimension type-2 merge: apply an incoming batch of
  * (key, attributes) to the OPEN slice of a versioned dimension
  * (valid_to IS NULL rows — closed history is immutable by definition
  * and never needs to flow through the merge).
  *
  * Per key: absent from the batch, or present with identical attributes
  * → row unchanged; present with different attributes → the open row is
  * closed at `batchDate` AND a new open version is emitted; key not in
  * the dimension → a new open row.
  *
  * Shape: ONE full-outer join (a single shuffle per side) — the two
  * output rows of a changed key come from a per-row array+explode, not
  * from unioning a second join, so the fact that some keys produce two
  * versions costs no extra exchange. At warehouse scale both sides
  * arrive hash-partitioned on the key; with a bucketed dimension the
  * join is exchange-free on the big side.
  */
object Scd2 {

  /** CONTRACT: `incoming` must have at most ONE row per key. Duplicate
    * batch keys would fan out through the full-outer join and silently
    * emit multiple open rows, breaking the one-open-row-per-key
    * invariant Scd2Spec pins. `assertUniqueKeys = true` enforces it
    * in-plan (raise_error inside a filter, so pruning can't drop it) at
    * the cost of one window exchange over the batch side — the batch is
    * the small side of an SCD2 merge, so the check is bounded; default
    * off keeps the single-join plan shape the exchange goldens pin.
    */
  def merge(current: DataFrame, incoming: DataFrame, keyCols: Seq[String],
            attrCols: Seq[String], batchDate: Column,
            assertUniqueKeys: Boolean = false): DataFrame = {
    val checked = if (!assertUniqueKeys) incoming else {
      val wk = org.apache.spark.sql.expressions.Window
        .partitionBy(keyCols.map(col): _*)
      incoming.withColumn("__kn", count(lit(1)).over(wk))
        .filter(when(col("__kn") > 1, raise_error(concat(
            lit("Scd2.merge: duplicate incoming key ("),
            concat_ws(",", keyCols.map(k => col(k).cast("string")): _*),
            lit(")")))).otherwise(lit(true)))
        .drop("__kn")
    }
    val inc = attrCols.foldLeft(checked)(
        (d, a) => d.withColumnRenamed(a, s"__in_$a"))
      .withColumn("__i", lit(true))
    val cur = current.withColumn("__c", lit(true))
    val j = cur.join(inc, keyCols, "full_outer")
    // null-safe so a null attribute value is "same as null", not "changed"
    val changed = attrCols.map(a => !(col(a) <=> col(s"__in_$a"))).reduce(_ || _)
    def ver(attr: String => Column, from: Column, to: Column) =
      struct(attrCols.map(a => attr(a).as(a))
        :+ from.cast("date").as("valid_from")
        :+ to.cast("date").as("valid_to"): _*)
    val keep  = ver(col, col("valid_from"), col("valid_to"))
    val close = ver(col, col("valid_from"), batchDate)
    val open  = ver(a => col(s"__in_$a"), batchDate, lit(null))
    j.withColumn("__vers",
        when(col("__i").isNull, array(keep))
          .when(col("__c").isNull, array(open))
          .when(!changed, array(keep))
          .otherwise(array(close, open)))
      .select(keyCols.map(col) :+ explode(col("__vers")).as("__v"): _*)
      .select(keyCols.map(col)
        ++ attrCols.map(a => col(s"__v.$a").as(a))
        :+ col("__v.valid_from").as("valid_from")
        :+ col("__v.valid_to").as("valid_to"): _*)
  }
}
