package graft.plans

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}
import org.apache.spark.sql.{Column, GraftShims}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Misra–Gries frequent-items sketch over a token-array column as ONE
  * TypedImperativeAggregate: per-partition partial sketches of at most k
  * counters merge associatively (Agarwal et al., "Mergeable Summaries"),
  * so the heavy-hitter candidate set is computed with NO shuffle of the
  * item space — the only exchange is k counters per partition to a
  * single row. Feeding the aggregate the token ARRAY (update loops
  * elements in a tight JVM loop) also removes the explode a naive
  * phase-1 would pay.
  *
  * Guarantee: any item with true frequency > N/(k+1) survives in the
  * sketch (per-counter undercount is bounded by N/(k+1), and the merge
  * reduction preserves the bound), so the keys are a SUPERSET of the
  * true heavy hitters at that threshold — an exact second pass over the
  * (≤ k, broadcastable) candidates yields a provably exact answer.
  * MisraGriesSpec pins the superset property and merge associativity.
  */
case class MisraGriesTopK(child: Expression, k: Int,
                          mutableAggBufferOffset: Int = 0,
                          inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[java.util.HashMap[String, Long]] {

  require(k >= 1, "k must be >= 1")

  override def createAggregationBuffer(): java.util.HashMap[String, Long] =
    new java.util.HashMap[String, Long](k * 2)

  private def add(m: java.util.HashMap[String, Long], w: String): Unit = {
    val cur = m.get(w)
    if (cur != 0L || m.containsKey(w)) m.put(w, cur + 1L)
    else if (m.size < k) m.put(w, 1L)
    else {
      // decrement-all round: the classic MG step, O(k) amortized
      val it = m.entrySet().iterator()
      while (it.hasNext) {
        val e = it.next()
        if (e.getValue == 1L) it.remove() else e.setValue(e.getValue - 1L)
      }
    }
  }

  override def update(buf: java.util.HashMap[String, Long],
                      input: InternalRow): java.util.HashMap[String, Long] = {
    val v = child.eval(input)
    if (v != null) {
      val arr = v.asInstanceOf[ArrayData]
      var i = 0
      val n = arr.numElements()
      while (i < n) {
        if (!arr.isNullAt(i)) add(buf, arr.getUTF8String(i).toString)
        i += 1
      }
    }
    buf
  }

  override def merge(a: java.util.HashMap[String, Long],
                     b: java.util.HashMap[String, Long]): java.util.HashMap[String, Long] = {
    val itB = b.entrySet().iterator()
    while (itB.hasNext) {
      val e = itB.next()
      val prev: Long = if (a.containsKey(e.getKey)) a.get(e.getKey) else 0L
      a.put(e.getKey, prev + e.getValue)
    }
    if (a.size > k) {
      // subtract the (k+1)-th largest count from everything and drop
      // non-positives — the mergeable-summaries reduction back to k
      val vals = new Array[Long](a.size)
      var i = 0
      val it0 = a.values().iterator()
      while (it0.hasNext) { vals(i) = it0.next(); i += 1 }
      java.util.Arrays.sort(vals)
      val sub = vals(vals.length - (k + 1)) // (k+1)-th largest
      val it = a.entrySet().iterator()
      while (it.hasNext) {
        val e = it.next()
        if (e.getValue <= sub) it.remove() else e.setValue(e.getValue - sub)
      }
    }
    a
  }

  override def eval(buf: java.util.HashMap[String, Long]): Any = {
    val keys = new Array[AnyRef](buf.size)
    var i = 0
    val it = buf.keySet().iterator()
    while (it.hasNext) { keys(i) = UTF8String.fromString(it.next()); i += 1 }
    new GenericArrayData(keys)
  }

  override def serialize(buf: java.util.HashMap[String, Long]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.size)
    val it = buf.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      out.writeUTF(e.getKey)
      out.writeLong(e.getValue)
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): java.util.HashMap[String, Long] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val m = new java.util.HashMap[String, Long](n * 2)
    var i = 0
    while (i < n) { m.put(in.readUTF(), in.readLong()); i += 1 }
    m
  }

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = false
  override def children: Seq[Expression] = Seq(child)
  override def prettyName: String = "misra_gries_topk"

  override def withNewMutableAggBufferOffset(o: Int): MisraGriesTopK =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): MisraGriesTopK =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): Expression =
    copy(child = c.head)
}

object MisraGriesTopK {
  /** Aggregate column: misra_gries_topk(tokenArray) → array<string> of
    * candidate heavy hitters (≤ k). */
  def apply(tokens: Column, k: Int): Column =
    GraftShims.column(MisraGriesTopK(GraftShims.expression(tokens), k)
      .toAggregateExpression())
}
