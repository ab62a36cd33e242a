package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.catalyst.encoders.{ExpressionEncoder, RowEncoder}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** W11: per-key ordered recurrence — the reference's RDT state machine
  * (pipeline-analysis/data_prep/evaluate_rdts.R:82-135), where each row's
  * output depends on the PREVIOUS row's computed value, which lag() cannot
  * express in one pass.
  *
  * Implementation: secondary sort, not groupByKey.flatMapGroups —
  * repartition by key, sort each partition by (key, order), then a single
  * mapPartitions scan carrying running state across rows of the same key.
  * This streams each partition once with O(1) state per key and never
  * buffers a whole group in memory, so a hot key (one user with millions
  * of events) cannot OOM an executor the way flatMapGroups' per-group
  * iterator materialization can when the state function needs a sort.
  */
object Sessionize {

  /** Generic per-key scan: adds columns computed by `step`, which folds
    * over the rows of one key in `order` and returns per-row extra values.
    *
    * @param step (state, row) => (newState, extraValues); state is None at
    *             the first row of each key.
    */
  def scanPerKey[S](df: DataFrame, keyCols: Seq[String], orderCols: Seq[String],
                    extraSchema: StructType)(
      step: (Option[S], Row) => (S, Seq[Any])): DataFrame = {
    val outSchema = StructType(df.schema.fields ++ extraSchema.fields)
    implicit val enc: ExpressionEncoder[Row] = ExpressionEncoder(RowEncoder.encoderFor(outSchema))
    val keyIdx = keyCols.map(df.schema.fieldIndex)
    val sorted = df
      .repartition(keyCols.map(col): _*)
      .sortWithinPartitions((keyCols ++ orderCols).map(col): _*)
    sorted.mapPartitions { it =>
      var curKey: Seq[Any] = null
      var state: Option[S] = None
      it.map { row =>
        val k = keyIdx.map(row.get)
        if (k != curKey) { curKey = k; state = None }
        val (s2, extra) = step(state, row)
        state = Some(s2)
        Row.fromSeq(row.toSeq ++ extra)
      }
    }
  }

  /** Gap-based sessionization: session_id increments when the gap since the
    * previous event of the same key exceeds `gapMicros`. The concrete
    * instance of the recurrence used by the w11 oracle query.
    */
  def sessionize(df: DataFrame, keyCol: String, tsCol: String,
                 tieBreak: String, gapMicros: Long,
                 as: String = "session_id"): DataFrame = {
    val tsIdx = df.schema.fieldIndex(tsCol)
    scanPerKey[(Long, Long)](df, Seq(keyCol), Seq(tsCol, tieBreak),
      StructType(Seq(StructField(as, LongType, nullable = false)))) {
      case (None, row) =>
        ((micros(row, tsIdx), 1L), Seq(1L))
      case (Some((prevTs, sid)), row) =>
        val t = micros(row, tsIdx)
        val id = if (t - prevTs > gapMicros) sid + 1 else sid
        ((t, id), Seq(id))
    }
  }

  /** Throttle/debounce: keep a row when strictly MORE than
    * `minGapMicros` has passed since the last KEPT row of the same key
    * (an exact-boundary gap is dropped — the strict `>` is the contract
    * the w17 oracle and SessionizeSpec pin; the first row is always
    * kept). A true recurrence — the threshold advances only on
    * kept rows, so lag()/windows cannot express it; same scan shape as
    * the RDT machine, O(1) state per key.
    */
  def debounce(df: DataFrame, keyCol: String, tsCol: String,
               tieBreak: String, minGapMicros: Long,
               as: String = "kept"): DataFrame = {
    val tsIdx = df.schema.fieldIndex(tsCol)
    scanPerKey[Long](df, Seq(keyCol), Seq(tsCol, tieBreak),
      StructType(Seq(StructField(as, BooleanType, nullable = false)))) {
      case (None, row) => (micros(row, tsIdx), Seq(true))
      case (Some(lastKept), row) =>
        val t = micros(row, tsIdx)
        if (t - lastKept > minGapMicros) (t, Seq(true))
        else (lastKept, Seq(false))
    }
  }

  /** Per-key exponentially-weighted moving average — the monitoring
    * smoother: y_1 = x_1, y_i = alpha*x_i + (1-alpha)*y_(i-1), ordered
    * by (tsCol, tieBreak) within keyCol. A TRUE linear recurrence (no
    * window function expresses it), so it rides the same secondary-sort
    * scan as debounce/sessionize: one shuffle on the key, O(1) state
    * per key. The oracle replays the identical fold as a recursive CTE
    * with the SAME operation order (alpha*x + (1-alpha)*y), so IEEE
    * rounding matches bit-for-bit.
    */
  def ewma(df: DataFrame, keyCol: String, tsCol: String, tieBreak: String,
           valCol: String, alpha: Double, as: String = "ewma"): DataFrame = {
    val vIdx = df.schema.fieldIndex(valCol)
    scanPerKey[Double](df, Seq(keyCol), Seq(tsCol, tieBreak),
      StructType(Seq(StructField(as, DoubleType, nullable = false)))) {
      case (None, row) =>
        val x = row.getAs[Number](vIdx).doubleValue; (x, Seq(x))
      case (Some(prev), row) =>
        val x = row.getAs[Number](vIdx).doubleValue
        val y = alpha * x + (1 - alpha) * prev
        (y, Seq(y))
    }
  }

  /** Per-key MACD (moving-average convergence/divergence): fast and
    * slow EWMAs, their difference (macd), and an EWMA of the macd (the
    * signal line) — the classic momentum/crossover monitor, all four
    * series from ONE secondary-sort scan with O(1) state (three
    * doubles). Dyadic alphas keep (1-alpha) exact in binary; the oracle
    * replays the fold with the IDENTICAL operation order (the w18/w29
    * contract), so results hash-match bit-for-bit.
    */
  def macd(df: DataFrame, keyCol: String, orderCol: String, valCol: String,
           aFast: Double, aSlow: Double, aSig: Double): DataFrame = {
    val vIdx = df.schema.fieldIndex(valCol)
    scanPerKey[(Double, Double, Double)](df, Seq(keyCol), Seq(orderCol),
      StructType(Seq(StructField("macd", DoubleType, nullable = false),
        StructField("sig", DoubleType, nullable = false)))) {
      case (None, row) =>
        val x = row.getAs[Number](vIdx).doubleValue
        ((x, x, 0.0), Seq(0.0, 0.0))
      case (Some((fast, slow, sig)), row) =>
        val x = row.getAs[Number](vIdx).doubleValue
        val f2 = aFast * x + (1 - aFast) * fast
        val s2 = aSlow * x + (1 - aSlow) * slow
        val m = f2 - s2
        val g2 = aSig * m + (1 - aSig) * sig
        ((f2, s2, g2), Seq(m, g2))
    }
  }

  /** Per-key Holt double-exponential smoothing (level + linear trend):
    * l_1 = x_1, b_1 = 0; then l_i = alpha*x_i + (1-alpha)*(l_(i-1) +
    * b_(i-1)) and b_i = beta*(l_i - l_(i-1)) + (1-beta)*b_(i-1). The
    * one-step forecast is l_i + b_i. Extends w18's EWMA with a trend
    * state — the monitoring forecaster for drifting series; same
    * secondary-sort scan, O(1) state per key. Dyadic alpha/beta keep
    * (1-alpha)/(1-beta) exact in binary; the oracle replays the fold
    * with the IDENTICAL operation order, so IEEE rounding matches
    * bit-for-bit (the w18 contract).
    */
  def holt(df: DataFrame, keyCol: String, tsCol: String, tieBreak: String,
           valCol: String, alpha: Double, beta: Double): DataFrame = {
    val vIdx = df.schema.fieldIndex(valCol)
    scanPerKey[(Double, Double)](df, Seq(keyCol), Seq(tsCol, tieBreak),
      StructType(Seq(StructField("level", DoubleType, nullable = false),
        StructField("trend", DoubleType, nullable = false)))) {
      case (None, row) =>
        val x = row.getAs[Number](vIdx).doubleValue
        ((x, 0.0), Seq(x, 0.0))
      case (Some((l0, b0)), row) =>
        val x = row.getAs[Number](vIdx).doubleValue
        val l = alpha * x + (1 - alpha) * (l0 + b0)
        val b = beta * (l - l0) + (1 - beta) * b0
        ((l, b), Seq(l, b))
    }
  }

  /** Per-key Wilder RSI (relative strength index): gains and losses of
    * consecutive deltas each smooth through the Wilder recurrence
    * a ← a + (g − a)·alpha, and RSI = 100 − 100/(1 + avg_gain/avg_loss)
    * — the classic bounded momentum oscillator. Same O(1)-state
    * secondary-sort scan as [[ewma]]/[[macd]]; `alpha` should be dyadic
    * (default 1/16 ≈ a Wilder period of 16) so the fold is the same
    * fixed-order IEEE sequence the recursive-CTE oracle replays.
    * Conventions at the degenerate points: no movement yet (both
    * averages 0) → 50; no losses → 100.
    */
  def rsi(df: DataFrame, keyCol: String, tsCol: String, tieBreak: String,
          valCol: String, alpha: Double = 0.0625): DataFrame = {
    val vIdx = df.schema.fieldIndex(valCol)
    scanPerKey[(Double, Double, Double)](df, Seq(keyCol), Seq(tsCol, tieBreak),
      StructType(Seq(StructField("avg_gain", DoubleType, nullable = false),
        StructField("avg_loss", DoubleType, nullable = false),
        StructField("rsi", DoubleType, nullable = false)))) {
      case (None, row) =>
        val x = row.getAs[Number](vIdx).doubleValue
        ((x, 0.0, 0.0), Seq(0.0, 0.0, 50.0))
      case (Some((px, ag0, al0)), row) =>
        val x = row.getAs[Number](vIdx).doubleValue
        val ag = ag0 + (math.max(x - px, 0.0) - ag0) * alpha
        val al = al0 + (math.max(px - x, 0.0) - al0) * alpha
        val r =
          if (ag == 0.0 && al == 0.0) 50.0
          else if (al == 0.0) 100.0
          else 100.0 - 100.0 / (1.0 + ag / al)
        ((x, ag, al), Seq(ag, al, r))
    }
  }

  /** Per-key two-sided CUSUM change-point detection (Page 1954): the
    * sequential drift detector that catches small persistent shifts a
    * fixed threshold (a12) and a rolling z-score (w26) both miss,
    * because deviations ACCUMULATE:
    *   S+_t = max(0, S+_{t-1} + (x_t - ref - k))
    *   S-_t = max(0, S-_{t-1} + (ref - x_t - k))
    * with an alarm when either side exceeds h, after which both sides
    * reset (restart detection). The in-control reference is the key's
    * first observation; slack k = slackFrac*|ref| and threshold
    * h = threshFrac*|ref| derive from it, so the operator is a single
    * pass with O(1) state and no training scan. First row emits
    * (0, 0, false) and only sets the reference.
    *
    * A true recurrence (the reset makes it non-windowable), same
    * secondary-sort scan as holt/holtWinters; the w32 oracle replays
    * the identical operation order through a recursive CTE, so doubles
    * match bit-for-bit (slackFrac/threshFrac are dyadic literals in
    * the registry row).
    */
  def cusum(df: DataFrame, keyCol: String, idxCol: String, valCol: String,
            slackFrac: Double, threshFrac: Double): DataFrame = {
    val vIdx = df.schema.fieldIndex(valCol)
    scanPerKey[(Double, Double, Double)](df, Seq(keyCol), Seq(idxCol),
      StructType(Seq(StructField("s_pos", DoubleType, nullable = false),
        StructField("s_neg", DoubleType, nullable = false),
        StructField("alarm", BooleanType, nullable = false)))) {
      case (None, row) =>
        val x = row.getAs[Number](vIdx).doubleValue
        ((x, 0.0, 0.0), Seq(0.0, 0.0, false))
      case (Some((ref, sp0, sn0)), row) =>
        val x = row.getAs[Number](vIdx).doubleValue
        val k = slackFrac * math.abs(ref)
        val h = threshFrac * math.abs(ref)
        val sp = math.max(0.0, sp0 + (x - ref - k))
        val sn = math.max(0.0, sn0 + (ref - x - k))
        val alarm = sp > h || sn > h
        ((ref, if (alarm) 0.0 else sp, if (alarm) 0.0 else sn),
          Seq(sp, sn, alarm))
    }
  }

  /** Per-key additive Holt-Winters (level + trend + period-p seasonal):
    * the full classical smoother (w18 EWMA -> w29 Holt -> this).
    * Seasonal state is a p-slot array keyed by `idxCol % p` (day
    * number, so calendar gaps keep their slot); slots start at 0 and
    * learn through the gamma update:
    *   l_t = alpha*(x_t - S[i]) + (1-alpha)*(l + b)
    *   b_t = beta*(l_t - l) + (1-beta)*b
    *   S'[i] = gamma*(x_t - l_t) + (1-gamma)*S[i]
    * First row of a key: l = x, b = 0, S untouched (the gamma update
    * is exactly 0 there). The oracle replays the identical operation
    * order with a LIST column carried through the recursive CTE, so
    * doubles match bit-for-bit. State per key: p+2 doubles.
    */
  def holtWinters(df: DataFrame, keyCol: String, idxCol: String,
                  valCol: String, period: Int,
                  alpha: Double, beta: Double, gamma: Double): DataFrame = {
    require(period > 0, s"holtWinters period must be positive, got $period")
    val vIdx = df.schema.fieldIndex(valCol)
    val iIdx = df.schema.fieldIndex(idxCol)
    scanPerKey[(Double, Double, Vector[Double])](df, Seq(keyCol), Seq(idxCol),
      StructType(Seq(StructField("level", DoubleType, nullable = false),
        StructField("trend", DoubleType, nullable = false),
        StructField("seasonal", DoubleType, nullable = false)))) {
      case (st, row) =>
        val x = row.getAs[Number](vIdx).doubleValue
        // floorMod: a negative index (pre-epoch days) must still land in
        // [0, period), where % would throw on the array access
        val slot = java.lang.Math.floorMod(row.getAs[Number](iIdx).longValue, period.toLong).toInt
        val (l0, b0, sv) = st.getOrElse((x, 0.0, Vector.fill(period)(0.0)))
        val (l, b) = st match {
          case None => (x, 0.0)
          case Some(_) =>
            val l1 = alpha * (x - sv(slot)) + (1 - alpha) * (l0 + b0)
            (l1, beta * (l1 - l0) + (1 - beta) * b0)
        }
        val sNew = gamma * (x - l) + (1 - gamma) * sv(slot)
        ((l, b, sv.updated(slot, sNew)), Seq(l, b, sNew))
    }
  }

  /** Per-key 1-D Kalman filter, local-level model (Kalman 1960; the
    * steady-state special case is w18's EWMA, which this generalizes by
    * carrying the estimate VARIANCE so the gain adapts — early
    * observations move the state a lot, later ones less):
    *   predict: P' = P + q
    *   gain:    K  = P' / (P' + r)
    *   update:  x  = x + K*(z - x),  P = (1-K)*P'
    * First row of a key initializes x = z, P = 1. Division is core IEEE
    * arithmetic (not libm), so an oracle replaying the IDENTICAL
    * operation order matches bit-for-bit — the w29/w32 contract; q and
    * r are dyadic literals in the registry row. O(1) state per key on
    * the same secondary-sort scan as holt/cusum.
    */
  def kalman(df: DataFrame, keyCol: String, tsCol: String, tieBreak: String,
             valCol: String, q: Double, r: Double): DataFrame = {
    val vIdx = df.schema.fieldIndex(valCol)
    scanPerKey[(Double, Double)](df, Seq(keyCol), Seq(tsCol, tieBreak),
      StructType(Seq(StructField("kalman_level", DoubleType, nullable = false),
        StructField("kalman_var", DoubleType, nullable = false)))) {
      case (None, row) =>
        val z = row.getAs[Number](vIdx).doubleValue
        ((z, 1.0), Seq(z, 1.0))
      case (Some((x0, p0)), row) =>
        val z = row.getAs[Number](vIdx).doubleValue
        val pPred = p0 + q
        val k = pPred / (pPred + r)
        val x = x0 + k * (z - x0)
        val p = (1.0 - k) * pPred
        ((x, p), Seq(x, p))
    }
  }

  private def micros(row: Row, i: Int): Long = row.get(i) match {
    case t: java.sql.Timestamp => t.getTime * 1000 + (t.getNanos / 1000) % 1000
    case t: java.time.Instant  => t.getEpochSecond * 1000000L + t.getNano / 1000
    case l: Long               => l
  }
}
