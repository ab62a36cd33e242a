package graft.plans

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Winnowing fingerprint selection (Schleimer et al. 2003) as ONE fused
  * codegen kernel: XXH64 over every k-byte window of the text, then the
  * per-window minimum (rightmost position on ties) selected by an O(n)
  * monotonic deque instead of the HOF form's O(n*w) slice/array_min
  * pass — and no per-position md5 strings at all. This is t43's
  * PRODUCTION hash family (the registry row keeps the md5-string form
  * because the oracle must replay the family in SQL — the
  * t20/dupSubstringsHashed convention); the detection guarantee (any
  * shared substring >= w+k-1 bytes yields a common fingerprint) holds
  * for any hash family, pinned by WinnowingSpec on this path too.
  *
  * Hash order is UNSIGNED (compareUnsigned), matching the uniform
  * [0, 2^64) theory; k-grams are BYTE windows (UTF-8 safe for the ASCII
  * corpus; multi-byte text selects on byte windows, which is still a
  * valid winnowing family). Returns the distinct selected hashes in
  * first-selection order; texts shorter than w+k-1 bytes yield an
  * empty array.
  */
case class WinnowingHashes(child: Expression, k: Int, w: Int)
    extends UnaryExpression {
  require(k >= 2 && w >= 2, "k-gram and window widths must be >= 2")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "winnowing_hashes"

  override def nullSafeEval(text: Any): Any =
    WinnowingKernel.select(text.asInstanceOf[UTF8String], k, w)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val kernel = WinnowingKernel.getClass.getName + ".MODULE$"
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $kernel.select($c, $k, $w);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object WinnowingHashes {
  /** Column-API entry. */
  def apply(text: org.apache.spark.sql.Column, k: Int, w: Int): org.apache.spark.sql.Column =
    org.apache.spark.sql.GraftShims.column(
      WinnowingHashes(org.apache.spark.sql.GraftShims.expression(text), k, w))
}

object WinnowingKernel {
  private final val Seed = 42L // xxhash64(col) default seed

  /** Shared by interpreted eval and generated code. */
  def select(text: UTF8String, k: Int, w: Int): ArrayData = {
    val base = text.getBaseObject
    val off = text.getBaseOffset
    val len = text.numBytes
    val nHashes = len - k + 1
    val nWindows = nHashes - w + 1
    if (nWindows <= 0)
      return UnsafeArrayData.fromPrimitiveArray(Array.emptyLongArray)
    val h = new Array[Long](nHashes)
    var p = 0
    while (p < nHashes) {
      h(p) = XXH64.hashUnsafeBytes(base, off + p, k, Seed)
      p += 1
    }
    // monotonic deque of positions, strictly increasing by unsigned
    // hash front->back; pushing pos j pops every back with hash >= h(j)
    // so among equal hashes the RIGHTMOST survives (Schleimer's rule)
    val dq = new Array[Int](nHashes)
    var head = 0
    var tail = 0 // exclusive
    // selection dedupe: a selected INSTANCE (position) is recorded once
    // even when consecutive windows re-select it; distinct hashes via
    // the same open-addressing set as ShingleKernel
    var cap = java.lang.Integer.highestOneBit(nWindows * 4 - 1) << 1
    if (cap < 16) cap = 16
    val keys = new Array[Long](cap)
    val used = new Array[Boolean](cap)
    val out = new Array[Long](nWindows)
    var nOut = 0
    var lastSel = -1
    var j = 0
    while (j < nHashes) {
      while (tail > head &&
          java.lang.Long.compareUnsigned(h(dq(tail - 1)), h(j)) >= 0)
        tail -= 1
      dq(tail) = j; tail += 1
      val s = j - w + 1 // window [s, j] complete once j >= w-1
      if (s >= 0) {
        while (dq(head) < s) head += 1
        val sel = dq(head)
        if (sel != lastSel) {
          lastSel = sel
          val hv = h(sel)
          var slot = (hv ^ (hv >>> 32)).toInt & (cap - 1)
          var isNew = true
          while (used(slot) && isNew) {
            if (keys(slot) == hv) isNew = false
            else slot = (slot + 1) & (cap - 1)
          }
          if (isNew) {
            used(slot) = true; keys(slot) = hv
            out(nOut) = hv; nOut += 1
          }
        }
      }
      j += 1
    }
    UnsafeArrayData.fromPrimitiveArray(
      if (nOut == nWindows) out else java.util.Arrays.copyOf(out, nOut))
  }
}
