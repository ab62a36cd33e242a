package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Change-data-capture apply: fold a change feed (upserts + deletes)
  * onto a base snapshot, producing the post-feed snapshot.
  *
  * The merge-with-deletes companion to Scd2.merge (which keeps history;
  * this produces CURRENT state — the Delta/Hudi "merge into" shape).
  * Plan: the feed compacts to its latest change per key with ONE hash
  * aggregate (`max_by` over the order key — no window sort, map-side
  * combinable), then one full-outer join against the base. Both sides
  * shuffle on the key; at 100 TB the base is the big side and the
  * compacted feed is |changed keys|, so AQE broadcasts it when small.
  */
object Cdc {

  /** Apply `changes` to `base`.
    *
    * `changes` columns = keyCols ++ (opCol: 'U' upsert / 'D' delete)
    * ++ ordCol (a totally-ordered change sequence key, unique per key)
    * ++ payload columns, which must match `base`'s non-key columns by
    * name. The LATEST change per key wins: 'D' drops the key, 'U'
    * replaces the payload (inserting if the key is absent from base).
    * Untouched base rows pass through. Output adds `cdc_src`
    * ('base' | 'upsert').
    */
  def applyChanges(base: DataFrame, changes: DataFrame, keyCols: Seq[String],
                   opCol: String, ordCol: String): DataFrame = {
    val payload = changes.columns.toSeq
      .filterNot(c => keyCols.contains(c) || c == opCol || c == ordCol)
    require(payload.forall(base.columns.contains),
      s"change payload ${payload.mkString(",")} must exist in base")
    val latest = changes
      .groupBy(keyCols.map(col): _*)
      .agg(max_by(struct((opCol +: payload).map(col): _*),
        col(ordCol)).as("_ch"))
      .select(keyCols.map(col) ++
        Seq(col(s"_ch.$opCol").as("_op")) ++
        payload.map(p => col(s"_ch.$p").as(s"_new_$p")): _*)
    val merged = base.join(latest, keyCols, "full_outer")
      .filter(col("_op").isNull || col("_op") =!= "D")
    val outCols: Seq[Column] =
      keyCols.map(col) ++
      payload.map(p =>
        when(col("_op") === "U", col(s"_new_$p")).otherwise(col(p)).as(p)) :+
      when(col("_op").isNull, lit("base")).otherwise(lit("upsert")).as("cdc_src")
    merged.select(outCols: _*)
  }
}
