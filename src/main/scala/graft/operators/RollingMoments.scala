package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Two-level bucketed evaluation of a trailing RANGE window's moments
  * (count, sum, sum-of-squares) — the scale escape for Spark's sliding
  * RANGE frames, which re-aggregate the whole frame per row so the
  * frame's ROW COUNT is a direct cost multiplier (w26's measured
  * lesson: a 24 h frame costs 4x a 6 h frame at identical semantics).
  *
  * Decomposition for a frame [t-W, t] with W an exact multiple of a
  * bucket width B (row in bucket b = floor(t/B), W = k*B):
  *
  *   frame = own-bucket prefix (rows of b at us <= t)        [peer scan]
  *         + full buckets b-k+1 .. b-1                       [bucket agg]
  *         + old-bucket suffix (rows of b-k at us >= t-W)    [as-of]
  *
  * Every term is O(1)-per-row state:
  *  - the own-bucket prefix is a growing (peer-inclusive) cumulative
  *    window, which Spark evaluates incrementally — not a sliding
  *    re-aggregation;
  *  - full-bucket sums ride a RANGE frame over the per-(key, bucket)
  *    aggregate table (rows = distinct buckets, orders of magnitude
  *    smaller than the input), joined back on (key, bucket);
  *  - the old partial bucket is total(b-k) MINUS the prefix as-of
  *    strictly-before t-W, found with the union-form as-of scan
  *    (AsOfJoin's shape): probes at (b-k, t-W) merge-sort into the
  *    prefix series, one shuffle, no join amplification.
  *
  * All moment arithmetic is DECIMAL (exact, so the subtraction in the
  * old-partial term is safe); equivalence with the direct RANGE frame
  * is therefore exact, not approximate (RollingMomentsSpec pins it on
  * ties at both frame edges).
  *
  * Cost crossover: the direct RANGE frame is O(rows * frame_rows); this
  * is O(rows) plus two bucket-table exchanges. At low frame density the
  * direct form's constant wins; as density grows the bucketed form's
  * independence from frame row count wins (ScaleSmoke measures the
  * crossover at 10x events).
  */
object RollingMoments {

  /** Trailing (n, s1, s2) per row over the inclusive frame
    * [us - windowUs, us], partitioned by `keyCol`.
    *
    * @param usCol    event time as integer microseconds, non-null
    * @param valCol   summed as DECIMAL(18,4); nulls count toward n
    *                 (count(*) frame semantics) but not the sums —
    *                 identical to sum/count OVER RANGE
    * @param windowUs trailing width in µs; bucketUs must divide it
    * @return input columns + n (long), s1 decimal, s2 decimal
    */
  def trailingMoments(df: DataFrame, keyCol: String, usCol: String,
                      valCol: String, windowUs: Long, bucketUs: Long): DataFrame = {
    require(windowUs % bucketUs == 0, "bucket width must divide the window")
    val k = (windowUs / bucketUs).toInt
    require(k >= 2, "window must span >= 2 buckets (else use the RANGE frame)")
    val reserved = Seq("__b", "__rowid", "__side", "__ob", "__ous", "__pay")
    require(df.columns.intersect(reserved).isEmpty,
      s"input may not use reserved columns ${reserved.mkString(", ")}")
    val vd = col(valCol).cast("decimal(18,4)")
    val base = df
      .withColumn("__b", floor(col(usCol) / bucketUs).cast("long"))
      .withColumn("__rowid", monotonically_increasing_id())
      .localCheckpoint(true) // rowid must be stable across the 3 legs below

    // -- own-bucket peer-inclusive prefix + bucket totals, one sort -------
    // RANGE UNBOUNDED..CURRENT includes peers at equal us, exactly the
    // target frame's inclusive upper edge; the growing frame is
    // incremental. Totals ride the same partition as whole-frame sums.
    val wPre = Window.partitionBy(keyCol, "__b").orderBy(col(usCol))
      .rangeBetween(Window.unboundedPreceding, Window.currentRow)
    val pre = base.select(
      base.columns.map(col) :+
        count(lit(1)).over(wPre).as("__pn") :+
        sum(vd).over(wPre).as("__ps1") :+
        sum(vd * vd).over(wPre).as("__ps2"): _*)

    // -- per-(key, bucket) aggregate table --------------------------------
    val buckets = base.groupBy(col(keyCol), col("__b"))
      .agg(count(lit(1)).as("__bn"), sum(vd).as("__bs1"), sum(vd * vd).as("__bs2"))

    // -- full middle buckets b-k+1 .. b-1: RANGE on the bucket INDEX ------
    // (gap-safe without a date spine), over the small bucket table
    val wMid = Window.partitionBy(keyCol).orderBy(col("__b"))
      .rangeBetween(-(k - 1), -1)
    val mid = buckets.select(col(keyCol), col("__b"),
      sum(col("__bn")).over(wMid).as("__mn"),
      sum(col("__bs1")).over(wMid).as("__ms1"),
      sum(col("__bs2")).over(wMid).as("__ms2"))

    // -- old-bucket suffix = total(b-k) - prefix strictly before t-W ------
    // union-form as-of on (key, bucket): probes sort FIRST at equal us
    // (side -1 < 0), so rows AT t-W stay in the frame and out of the
    // subtracted prefix. Peers at equal us carry equal peer-inclusive
    // prefixes, so the fill needs no uniqueness precondition. An empty
    // old bucket partitions probes alone -> null payload -> suffix 0.
    val payT = "struct<n:bigint,s1:decimal(28,4),s2:decimal(38,8)>"
    val series = pre.select(col(keyCol), col("__b").as("__ob"),
      col(usCol).as("__ous"), lit(0).as("__side"),
      struct(col("__pn").as("n"), col("__ps1").cast("decimal(28,4)").as("s1"),
        col("__ps2").cast("decimal(38,8)").as("s2")).as("__pay"),
      lit(null).cast("long").as("__rowid"))
    val probes = base.select(col(keyCol), (col("__b") - k).as("__ob"),
      (col(usCol) - windowUs).as("__ous"), lit(-1).as("__side"),
      lit(null).cast(payT).as("__pay"), col("__rowid"))
    val wFill = Window.partitionBy(keyCol, "__ob")
      .orderBy(col("__ous"), col("__side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val asof = series.unionByName(probes)
      .withColumn("__last", last(col("__pay"), ignoreNulls = true).over(wFill))
      .filter(col("__side") === -1)
      .select(col("__rowid"), col("__last.n").as("__an"),
        col("__last.s1").as("__as1"), col("__last.s2").as("__as2"))

    val oldTot = buckets.select(col(keyCol), (col("__b") + k).as("__b"),
      col("__bn").as("__on"), col("__bs1").as("__os1"), col("__bs2").as("__os2"))

    def z(c: Column) = coalesce(c, lit(0))
    pre
      .join(mid, Seq(keyCol, "__b"), "left")
      .join(oldTot, Seq(keyCol, "__b"), "left")
      .join(asof, Seq("__rowid"), "left")
      .select(df.columns.map(col) :+
        (col("__pn") + z(col("__mn")) + (z(col("__on")) - z(col("__an"))))
          .cast("long").as("n") :+
        (z(col("__ps1")) + z(col("__ms1")) + (z(col("__os1")) - z(col("__as1"))))
          .as("s1") :+
        (z(col("__ps2")) + z(col("__ms2")) + (z(col("__os2")) - z(col("__as2"))))
          .as("s2"): _*)
  }
}
