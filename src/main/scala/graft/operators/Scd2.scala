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

  def merge(current: DataFrame, incoming: DataFrame, keyCols: Seq[String],
            attrCols: Seq[String], batchDate: Column): DataFrame = {
    val inc = attrCols.foldLeft(incoming)(
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
