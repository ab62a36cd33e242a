package graft.plans

import org.apache.spark.sql.{Column, GraftShims}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Token-level longest-common-subsequence length as a codegen
  * expression — the kernel under ROUGE-L (summary/response evaluation:
  * Lin 2004) and token-level near-dup diffing. Spark ships levenshtein
  * (character edit distance) but nothing subsequence-based over token
  * ARRAYS; a HOF formulation exists ([[graft.operators.SparseSim]]-style
  * folds, kept as the executable spec in LcsSpec) but pays an
  * O(len) array copy per DP cell — this kernel is the true O(n·m)
  * two-row DP with zero per-cell allocation, stays inside whole-stage
  * codegen via a static kernel call (the JaroWinkler pattern).
  *
  * Equality is UTF8String equality (binary); null tokens match nothing.
  */
case class LcsTokens(left: Expression, right: Expression)
    extends BinaryExpression {

  private def isStrArr(t: DataType) = t match {
    case ArrayType(StringType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (isStrArr(left.dataType) && isStrArr(right.dataType))
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"lcs_tokens requires (ARRAY<STRING>, ARRAY<STRING>), got " +
        s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")
  override def dataType: DataType = LongType
  override def prettyName: String = "lcs_tokens"

  override def nullSafeEval(a: Any, b: Any): Any =
    LcsTokensKernel.lcs(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val kernel = LcsTokensKernel.getClass.getName + ".MODULE$"
    nullSafeCodeGen(ctx, ev, (a, b) => s"${ev.value} = $kernel.lcs($a, $b);")
  }

  override protected def withNewChildrenInternal(newLeft: Expression,
                                                 newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object LcsTokens {
  def apply(a: Column, b: Column): Column =
    GraftShims.column(LcsTokens(GraftShims.expression(a),
      GraftShims.expression(b)))
}

object LcsTokensKernel {
  /** Two-row DP; rows sized by the SHORTER side so the working set is
    * min(n,m)+1 longs regardless of argument order. */
  def lcs(ua: ArrayData, ub: ArrayData): Long = {
    val (outer, inner) =
      if (ua.numElements() >= ub.numElements()) (ua, ub) else (ub, ua)
    val n = outer.numElements()
    val m = inner.numElements()
    if (m == 0) return 0L
    // materialize the short side once: ArrayData element access is not
    // free under codegen, and the inner loop touches it n times
    val bs = new Array[UTF8String](m)
    var j = 0
    while (j < m) {
      bs(j) = if (inner.isNullAt(j)) null else inner.getUTF8String(j)
      j += 1
    }
    var prev = new Array[Long](m + 1)
    var cur = new Array[Long](m + 1)
    var i = 0
    while (i < n) {
      val ai = if (outer.isNullAt(i)) null else outer.getUTF8String(i)
      j = 0
      while (j < m) {
        val eq = ai != null && bs(j) != null && ai.equals(bs(j))
        val diag = prev(j) + (if (eq) 1L else 0L)
        val best = math.max(diag, math.max(prev(j + 1), cur(j)))
        cur(j + 1) = best
        j += 1
      }
      val t = prev; prev = cur; cur = t
      cur(0) = 0L
      i += 1
    }
    prev(m)
  }
}
