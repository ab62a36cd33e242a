package graft.plans

import java.nio.ByteBuffer
import scala.collection.mutable.ArrayBuffer
import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftShims
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Mergeable rank/quantile sketch (the KLL/MRL compaction scheme) as ONE
  * TypedImperativeAggregate — the quantile member of the engine's
  * sketch family (a26 HLL = distinct counts, a27 Misra-Gries = heavy
  * hitters, this = quantiles). Unlike a full sort (w-row exact
  * percentiles) or approx_percentile's opaque state, the buffer is a
  * plain level ladder: level i holds at most k doubles, each standing
  * for 2^i input rows; a full level sorts and keeps every second
  * element (odd positions — the deterministic MRL compactor), promoting
  * them one level up. State is O(k log(n/k)) doubles per group FOREVER,
  * update is amortized O(log k), and merge is level-wise concatenation
  * + the same compactor — safe under Spark's arbitrary partial-merge
  * order (any merge order yields a valid sketch; estimates may differ
  * by bounded rank error, which is why the registry row gates on the
  * BOUND, not on exact values).
  *
  * Rank-error bound (standard MRL argument): each compaction at level i
  * perturbs any rank by at most 2^i, and level i compacts at most
  * n/(k 2^i) times, so total error <= H n/k with H = number of levels
  * (log2(n/k)+1). k = 256 at n = 10^6 gives H ~ 12.9 and a worst-case
  * bound of ~5% rank error — the same order as a51's 5% gate, so the
  * gate is carried by the large slack between the worst case and
  * practice (compactions fire far less often than the bound assumes;
  * observed error at a51's scale is well under 1%). Weight is conserved
  * EXACTLY (odd
  * remainders stay at their level), so total mass always equals the
  * true row count — pinned by KllSpec.
  */
case class KllSketch(child: Expression, k: Int, fractions: Seq[Double],
                     mutableAggBufferOffset: Int = 0,
                     inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[ArrayBuffer[ArrayBuffer[Double]]] {
  require(k >= 8 && k % 2 == 0, s"k must be even and >= 8, got $k")
  require(fractions.nonEmpty && fractions.forall(f => f >= 0.0 && f <= 1.0))

  type Buf = ArrayBuffer[ArrayBuffer[Double]]

  override def createAggregationBuffer(): Buf =
    ArrayBuffer(ArrayBuffer.empty[Double])

  /** Sort level i, keep odd positions of the largest even prefix (one
    * odd leftover stays), promote the kept half with doubled weight. */
  private def compact(buf: Buf, i: Int): Unit = {
    val lvl = buf(i)
    val sorted = lvl.toArray
    java.util.Arrays.sort(sorted)
    val pairs = sorted.length / 2
    lvl.clear()
    if (sorted.length % 2 == 1) lvl += sorted(sorted.length - 1) // leftover
    if (buf.size == i + 1) buf += ArrayBuffer.empty[Double]
    val up = buf(i + 1)
    var j = 0
    while (j < pairs) { up += sorted(2 * j + 1); j += 1 }
    if (up.size >= k) compact(buf, i + 1)
  }

  override def update(buf: Buf, input: InternalRow): Buf = {
    val v = child.eval(input)
    if (v != null) {
      buf(0) += v.asInstanceOf[Double]
      if (buf(0).size >= k) compact(buf, 0)
    }
    buf
  }

  override def merge(a: Buf, b: Buf): Buf = {
    var i = 0
    while (i < b.size) {
      if (a.size == i) a += ArrayBuffer.empty[Double]
      a(i) ++= b(i)
      i += 1
    }
    i = 0
    while (i < a.size) { // bottom-up: promotions land in already-visited+1
      if (a(i).size >= k) compact(a, i)
      i += 1
    }
    a
  }

  override def eval(buf: Buf): Any = {
    val items = ArrayBuffer.empty[(Double, Long)]
    var i = 0
    var total = 0L
    while (i < buf.size) {
      val w = 1L << i
      buf(i).foreach { v => items += ((v, w)); total += w }
      i += 1
    }
    if (total == 0L) return null
    val sorted = items.sortBy(_._1).toArray
    val out = fractions.map { f =>
      val target = math.max(1L, math.ceil(f * total).toLong)
      var cum = 0L
      var j = 0
      var res = sorted(sorted.length - 1)._1
      var done = false
      while (j < sorted.length && !done) {
        cum += sorted(j)._2
        if (cum >= target) { res = sorted(j)._1; done = true }
        j += 1
      }
      res
    }.toArray
    new GenericArrayData(out)
  }

  override def serialize(buf: Buf): Array[Byte] = {
    val n = buf.map(_.size).sum
    val bb = ByteBuffer.allocate(4 + buf.size * 4 + n * 8)
    bb.putInt(buf.size)
    buf.foreach { lvl =>
      bb.putInt(lvl.size)
      lvl.foreach(bb.putDouble)
    }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Buf = {
    val bb = ByteBuffer.wrap(bytes)
    val levels = bb.getInt
    val buf: Buf = ArrayBuffer.empty
    var i = 0
    while (i < levels) {
      val sz = bb.getInt
      val lvl = new ArrayBuffer[Double](sz)
      var j = 0
      while (j < sz) { lvl += bb.getDouble; j += 1 }
      buf += lvl
      i += 1
    }
    if (buf.isEmpty) buf += ArrayBuffer.empty[Double]
    buf
  }

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def nullable: Boolean = true
  override def children: Seq[Expression] = Seq(child)
  override def prettyName: String = "kll_quantiles"

  override def withNewMutableAggBufferOffset(o: Int): KllSketch =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): KllSketch =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): Expression =
    copy(child = c.head)
}

object KllSketch {
  /** Aggregate column: kll_quantiles(value, k, fractions) →
    * array<double> of the estimated quantiles (null for empty groups).
    * The input casts to DOUBLE here so an integer/decimal column fails
    * (or coerces) at ANALYSIS time — update() trusts the Double. */
  def apply(value: Column, k: Int, fractions: Seq[Double]): Column =
    GraftShims.column(KllSketch(
        GraftShims.expression(value.cast("double")), k, fractions)
      .toAggregateExpression())
}
