package graft.plans

import java.nio.ByteBuffer
import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftShims
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Whole-signature MinHash as ONE TypedImperativeAggregate (SURVEY
  * §2.10.4): the k minima live in a single long[k] buffer instead of k
  * separate min-aggregate buffers, so per-group state is one object and
  * the plan carries one aggregate expression regardless of k.
  *
  * Input: the pre-hashed shingle (xxhash64 of the shingle string).
  * Output: array<long> of k minima, h_i = splitmix64-finalized
  * (hash XOR mix_i) — the same family as Similarity.minhashAggs' XOR
  * mixing, evaluated in tight JVM loops.
  */
case class MinHashSignature(child: Expression, k: Int,
                            mutableAggBufferOffset: Int = 0,
                            inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[Long]] {

  private val mixes: Array[Long] = Array.tabulate(k) { i =>
    var z = i.toLong + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z ^ (z >>> 27)
  }

  // xxhash64 finalizer — applied to (shingleHash ^ mix_i), matching the
  // distributional quality of re-hashing without the full hash cost
  private def fmix(h0: Long): Long = {
    var h = h0
    h ^= h >>> 33; h *= 0xff51afd7ed558ccdL
    h ^= h >>> 33; h *= 0xc4ceb9fe1a85ec53L
    h ^ (h >>> 33)
  }

  override def createAggregationBuffer(): Array[Long] = Array.fill(k)(Long.MaxValue)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val h = v.asInstanceOf[Long]
      var i = 0
      while (i < k) {
        val hi = fmix(h ^ mixes(i))
        if (hi < buf(i)) buf(i) = hi
        i += 1
      }
    }
    buf
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < k) { if (b(i) < a(i)) a(i) = b(i); i += 1 }
    a
  }

  override def eval(buf: Array[Long]): Any = new GenericArrayData(buf)

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(8 * k)
    buf.foreach(bb.putLong)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = ByteBuffer.wrap(bytes)
    Array.fill(k)(bb.getLong)
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false
  override def children: Seq[Expression] = Seq(child)
  override def prettyName: String = "minhash_signature"

  override def withNewMutableAggBufferOffset(o: Int): MinHashSignature =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): MinHashSignature =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): Expression =
    copy(child = c.head)
}

object MinHashSignature {
  /** Aggregate column: minhash_signature(shingleHash) → array<long>(k). */
  def apply(shingleHash: Column, k: Int): Column =
    GraftShims.column(MinHashSignature(GraftShims.expression(shingleHash), k)
      .toAggregateExpression())
}

/** Whole MinHash sketch as a SCALAR expression — one fused byte scan per
  * document producing struct(sig: array<long>(k), n: int). Replaces the
  * explode(ShingleHashes) → groupBy → MinHashSignature-aggregate chain
  * for signature computation: a narrow projection, NO shuffle at all
  * (the exploded shingle table is then only needed for candidate
  * verification). Bit-identical to the aggregate path — same shingle
  * XXH64 (seed 42), same XOR-mix + xxhash64-finalizer family — pinned
  * by MinHashSignatureSpec. `n` is the distinct-shingle count; docs
  * with fewer than `shingleN` tokens yield n = 0 and an all-MaxValue
  * signature (callers filter n > 0, as the aggregate path does
  * implicitly by having no rows to group).
  */
case class MinHashSketch(child: Expression, shingleN: Int, k: Int)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {
  require(shingleN >= 2 && k >= 1)

  @transient private lazy val mixes: Array[Long] = Array.tabulate(k) { i =>
    var z = i.toLong + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z ^ (z >>> 27)
  }

  override def dataType: DataType = org.apache.spark.sql.types.StructType(Seq(
    org.apache.spark.sql.types.StructField("sig",
      ArrayType(LongType, containsNull = false), nullable = false),
    org.apache.spark.sql.types.StructField("n",
      org.apache.spark.sql.types.IntegerType, nullable = false)))
  override def prettyName: String = "minhash_sketch"

  override def nullSafeEval(text: Any): Any =
    SketchKernel.sketch(
      text.asInstanceOf[org.apache.spark.unsafe.types.UTF8String], shingleN, mixes)

  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode = {
    val kernel = SketchKernel.getClass.getName + ".MODULE$"
    val mixesRef = ctx.addReferenceObj("mixes", mixes, "long[]")
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = $kernel.sketch($c, $shingleN, $mixesRef);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object SketchKernel {
  private final val Seed = 42L // xxhash64(col) default seed

  /** One scan: token starts, per-shingle XXH64 over the byte slice,
    * open-addressed dedup for the distinct count, k minima updated for
    * first-seen hashes only (min over duplicates equals min over
    * distinct, so skipping repeats is both correct and faster).
    */
  def sketch(text: org.apache.spark.unsafe.types.UTF8String, n: Int,
             mixes: Array[Long]): InternalRow = {
    val k = mixes.length
    val base = text.getBaseObject
    val off = text.getBaseOffset
    val len = text.numBytes
    var starts = new Array[Int](Math.max(16, len / 8))
    var nTok = 1
    starts(0) = 0
    var i = 0
    while (i < len) {
      if (org.apache.spark.unsafe.Platform.getByte(base, off + i) == ' '.toByte) {
        if (nTok == starts.length) starts = java.util.Arrays.copyOf(starts, nTok * 2)
        starts(nTok) = i + 1
        nTok += 1
      }
      i += 1
    }
    val minima = new Array[Long](k)
    java.util.Arrays.fill(minima, Long.MaxValue)
    val nShingles = nTok - n + 1
    var nDistinct = 0
    if (nShingles > 0) {
      var cap = java.lang.Integer.highestOneBit(nShingles * 4 - 1) << 1
      if (cap < 16) cap = 16
      val keys = new Array[Long](cap)
      val used = new Array[Boolean](cap)
      var s = 0
      while (s < nShingles) {
        val from = starts(s)
        val until = if (s + n < nTok) starts(s + n) - 1 else len
        val h = org.apache.spark.sql.catalyst.expressions.XXH64
          .hashUnsafeBytes(base, off + from, until - from, Seed)
        var slot = (h ^ (h >>> 32)).toInt & (cap - 1)
        var isNew = true
        while (used(slot) && isNew) {
          if (keys(slot) == h) isNew = false
          else slot = (slot + 1) & (cap - 1)
        }
        if (isNew) {
          used(slot) = true; keys(slot) = h
          nDistinct += 1
          var j = 0
          while (j < k) {
            var hj = h ^ mixes(j)
            hj ^= hj >>> 33; hj *= 0xff51afd7ed558ccdL
            hj ^= hj >>> 33; hj *= 0xc4ceb9fe1a85ec53L
            hj ^= hj >>> 33
            if (hj < minima(j)) minima(j) = hj
            j += 1
          }
        }
        s += 1
      }
    }
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
        .fromPrimitiveArray(minima), nDistinct))
  }
}

object MinHashSketch {
  /** Column-API entry. */
  def apply(text: Column, shingleN: Int, k: Int): Column =
    GraftShims.column(MinHashSketch(GraftShims.expression(text), shingleN, k))
}
