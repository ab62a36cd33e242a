package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation (SURVEY.md §7.4.4 design rules): salting for joins
  * whose hot keys overwhelm single reducers when the small side is too
  * big to broadcast and AQE's skew split isn't available (e.g. a
  * shuffle-hash join forced by memory limits).
  *
  * The big side gets a random-ish but DETERMINISTIC salt derived from a
  * unique row id (never rand(): task retries must produce identical
  * rows); the small side is exploded `factor` times so every salted key
  * finds its match. Equi-join correctness is preserved exactly; the hot
  * key's rows spread over `factor` reducers.
  */
object Skew {

  /** Inner/left salted equi-join on `key`. `rowId` must be unique per
    * big-side row (drives the deterministic salt).
    */
  def saltedJoin(big: DataFrame, small: DataFrame, key: String, rowId: String,
                 factor: Int, joinType: String = "inner"): DataFrame = {
    require(factor > 0)
    val salted = big.withColumn("__salt",
      pmod(xxhash64(col(rowId)), lit(factor)).cast("int"))
    val expanded = small
      .withColumn("__salt", explode(sequence(lit(0), lit(factor - 1))))
    val out = salted.join(expanded,
      salted(key) === expanded(key) && salted("__salt") === expanded("__salt"),
      joinType)
    out.drop(expanded(key)).drop("__salt")
  }
}
