package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton) layout keys for multi-dimensional data skipping.
  *
  * A table sorted or range-partitioned on `interleave16(x, y)` keeps rows
  * that are close in EITHER dimension close in file order, so parquet
  * row-group min/max statistics prune scans for predicates on x OR y —
  * the layout trick behind multi-dimensional clustering in lakehouse
  * engines, built here from plain codegen'd bit arithmetic (no UDF).
  *
  * Scale posture: the key is a narrow per-row projection; writing
  * `repartitionByRange(z).sortWithinPartitions(z)` gives every output
  * file a tight z-range and therefore tight min/max on BOTH source
  * dimensions (ZOrderSpec pins this on a real write).
  */
object ZOrder {

  /** 32-bit Morton interleave of two 16-bit keys: x occupies even bits,
    * y odd bits. Pure shift/and/add — stays inside WholeStageCodegen.
    *
    * Inputs are normalized with pmod(_, 65536) first: without the mask,
    * a negative input (Scala % keeps the sign) or a value over 16 bits
    * would shiftleft negative bit-terms into garbage Morton codes with
    * no error (ADVICE r7). Callers with wider domains should quantize
    * into 16 bits themselves (the mask wraps, it does not clamp).
    */
  def interleave16(x: Column, y: Column): Column = {
    val xm = pmod(x.cast("long"), lit(65536L))
    val ym = pmod(y.cast("long"), lit(65536L))
    val terms = (0 until 16).flatMap { i =>
      Seq(shiftleft(shiftright(xm, i) % 2, 2 * i),
          shiftleft(shiftright(ym, i) % 2, 2 * i + 1))
    }
    terms.reduce(_ + _)
  }

  /** Inverse of [[interleave16]]: (x, y) back out of the Morton code. */
  def deinterleave16(z: Column): (Column, Column) = {
    val x = (0 until 16).map(i => shiftleft(shiftright(z.cast("long"), 2 * i) % 2, i))
      .reduce(_ + _)
    val y = (0 until 16).map(i => shiftleft(shiftright(z.cast("long"), 2 * i + 1) % 2, i))
      .reduce(_ + _)
    (x, y)
  }

  /** Write `df` in z-order over (xCol, yCol): range-partition by the
    * Morton key and sort within partitions, so every parquet file covers
    * a contiguous z-range (= a small tile in (x, y) space).
    */
  def writeZOrdered(df: DataFrame, xCol: String, yCol: String, path: String,
      numFiles: Int = 16): Unit = {
    df.withColumn("__z", interleave16(col(xCol), col(yCol)))
      .repartitionByRange(numFiles, col("__z"))
      .sortWithinPartitions("__z")
      .drop("__z")
      .write.mode("overwrite").parquet(path)
  }
}
