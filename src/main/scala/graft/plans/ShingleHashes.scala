package graft.plans

import org.apache.spark.sql.{Column, GraftShims}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Distinct word-n-gram shingle hashes in ONE fused byte scan
  * (SURVEY §2.10 custom-expression ladder; replaces the
  * split → transform(concat_ws) → array_distinct → explode → xxhash64
  * chain that dominated the round-1 LSH profile).
  *
  * Because tokens are the single-space splits of the text, shingle i's
  * string (tokens i..i+n-1 joined by one space) is exactly the byte run
  * of the original text between token i's start and token i+n-1's end —
  * so each hash is XXH64 over a slice of the input buffer: no token
  * strings, no n-gram strings, no O(k²) array_distinct, no string array
  * to explode. Values are bit-identical to xxhash64(shingle_string)
  * (seed 42), pinned by ShingleHashesSpec.
  *
  * Returns array<long> of distinct shingle hashes in first-occurrence
  * order; fewer than n tokens yields an empty array.
  */
case class ShingleHashes(child: Expression, n: Int) extends UnaryExpression {
  require(n >= 2, "shingle width must be >= 2")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "shingle_hashes"

  override def nullSafeEval(text: Any): Any =
    ShingleKernel.hashedShingles(text.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    // MODULE$ lives on the dollar class — keep the JVM binary name.
    val kernel = ShingleKernel.getClass.getName + ".MODULE$"
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $kernel.hashedShingles($c, $n);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object ShingleKernel {
  private final val Seed = 42L // xxhash64(col) default seed

  /** Shared by interpreted eval and generated code. */
  def hashedShingles(text: UTF8String, n: Int): ArrayData = {
    val base = text.getBaseObject
    val off = text.getBaseOffset
    val len = text.numBytes
    // Token starts: 0 and every position after a 0x20 byte. UTF-8
    // multi-byte sequences never contain 0x20, so a raw byte scan is safe.
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
    val nShingles = nTok - n + 1
    if (nShingles <= 0) return UnsafeArrayData.fromPrimitiveArray(Array.emptyLongArray)
    // open-addressing long set (no sentinel: presence tracked separately)
    var cap = java.lang.Integer.highestOneBit(nShingles * 4 - 1) << 1
    if (cap < 16) cap = 16
    val keys = new Array[Long](cap)
    val used = new Array[Boolean](cap)
    val out = new Array[Long](nShingles)
    var nOut = 0
    var s = 0
    while (s < nShingles) {
      val from = starts(s)
      // end of token s+n-1: next start minus the delimiter, or text end
      val until = if (s + n < nTok) starts(s + n) - 1 else len
      val h = XXH64.hashUnsafeBytes(base, off + from, until - from, Seed)
      var slot = (h ^ (h >>> 32)).toInt & (cap - 1)
      var isNew = true
      while (used(slot) && isNew) {
        if (keys(slot) == h) isNew = false
        else slot = (slot + 1) & (cap - 1)
      }
      if (isNew) {
        used(slot) = true; keys(slot) = h
        out(nOut) = h; nOut += 1
      }
      s += 1
    }
    UnsafeArrayData.fromPrimitiveArray(
      if (nOut == nShingles) out else java.util.Arrays.copyOf(out, nOut))
  }

  /** Distinct hashes of every `width`-byte window (stride 1), in
    * first-occurrence order; len < width hashes the whole text once.
    */
  def hashedWindows(text: UTF8String, width: Int): ArrayData = {
    val base = text.getBaseObject
    val off = text.getBaseOffset
    val len = text.numBytes
    val nWin = Math.max(len - width + 1, 1)
    var cap = java.lang.Integer.highestOneBit(nWin * 4 - 1) << 1
    if (cap < 16) cap = 16
    val keys = new Array[Long](cap)
    val used = new Array[Boolean](cap)
    val out = new Array[Long](nWin)
    var nOut = 0
    var i = 0
    while (i < nWin) {
      val h = XXH64.hashUnsafeBytes(base, off + i, Math.min(width, len - i), Seed)
      var slot = (h ^ (h >>> 32)).toInt & (cap - 1)
      var isNew = true
      while (used(slot) && isNew) {
        if (keys(slot) == h) isNew = false
        else slot = (slot + 1) & (cap - 1)
      }
      if (isNew) {
        used(slot) = true; keys(slot) = h
        out(nOut) = h; nOut += 1
      }
      i += 1
    }
    UnsafeArrayData.fromPrimitiveArray(
      if (nOut == nWin) out else java.util.Arrays.copyOf(out, nOut))
  }
}

object ShingleHashes {
  /** Column-API entry. */
  def apply(text: Column, n: Int): Column =
    GraftShims.column(ShingleHashes(GraftShims.expression(text), n))
}

/** Distinct fixed-width char-window hashes in one fused byte scan — the
  * at-scale group key for exact duplicated-substring detection (t20's
  * registry row groups on raw window text because the DuckDB oracle
  * needs a cross-engine key; this expression is the 8-bytes-per-window
  * substitution its comment names). Windows are byte-aligned (the corpus
  * contract is single-byte chars); a text shorter than `width` yields
  * one hash of the whole text, matching substr(text, i, width)'s
  * clamping in the SQL formulation.
  */
case class CharWindowHashes(child: Expression, width: Int)
    extends UnaryExpression {
  require(width >= 2, "window width must be >= 2")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "char_window_hashes"

  override def nullSafeEval(text: Any): Any =
    ShingleKernel.hashedWindows(text.asInstanceOf[UTF8String], width)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val kernel = ShingleKernel.getClass.getName + ".MODULE$"
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $kernel.hashedWindows($c, $width);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object CharWindowHashes {
  /** Column-API entry. */
  def apply(text: Column, width: Int): Column =
    GraftShims.column(CharWindowHashes(GraftShims.expression(text), width))
}
