package graft.plans

import org.apache.spark.sql.{Column, GraftShims}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType, LongType}

/** Native dot product over numeric arrays (SURVEY §2.10 custom-expression
  * ladder): one primitive loop instead of the
  * zip_with(cast·cast) → aggregate(+) chain, which materializes an
  * intermediate double array per pair — per-row garbage that dominates
  * the ANN re-rank profile when every (query, candidate) pair computes a
  * 64-dim dot product.
  *
  * Semantics are EXACTLY the higher-order-function fold the oracle SQL
  * states: strict in-index-order sum of (double)a[i] * (double)b[i] —
  * same IEEE result bit-for-bit (VectorMathSpec pins equivalence) — and
  * null when either array is null, any element is null, or lengths
  * differ (zip_with pads the short side with null, which nulls the fold).
  */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  private def elemIsFloat(e: Expression): Boolean =
    e.dataType.asInstanceOf[ArrayType].elementType match {
      case FloatType  => true
      case DoubleType => false
      case t => throw new IllegalArgumentException(
        s"dot_product needs array<float|double>, got array<$t>")
    }

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "dot_product"

  override def nullSafeEval(a: Any, b: Any): Any =
    VectorKernel.dot(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData],
      elemIsFloat(left), elemIsFloat(right))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val kernel = VectorKernel.getClass.getName + ".MODULE$"
    val boxed = ctx.freshName("dotRes")
    nullSafeCodeGen(ctx, ev, (a, b) => s"""
      |java.lang.Double $boxed =
      |  $kernel.dot($a, $b, ${elemIsFloat(left)}, ${elemIsFloat(right)});
      |if ($boxed == null) { ${ev.isNull} = true; }
      |else { ${ev.value} = $boxed.doubleValue(); }
      |""".stripMargin)
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object VectorKernel {
  /** Shared by interpreted eval and generated code. Boxed return: null
    * encodes the fold's null-propagation (length mismatch / null element).
    */
  def dot(a: ArrayData, b: ArrayData,
          aFloat: Boolean, bFloat: Boolean): java.lang.Double = {
    val n = a.numElements()
    if (b.numElements() != n) return null
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      val x = if (aFloat) a.getFloat(i).toDouble else a.getDouble(i)
      val y = if (bFloat) b.getFloat(i).toDouble else b.getDouble(i)
      acc += x * y
      i += 1
    }
    java.lang.Double.valueOf(acc)
  }

  /** Argmin over a flat row-major centroid matrix; strict in-order
    * accumulation, strict `<` keeps the first minimum. Boxed return:
    * null encodes the HOF's null propagation (bad vector / empty matrix).
    */
  def nearestCell(vec: ArrayData, ids: Array[Long], mat: Array[Double],
                  dims: Int, isFloat: Boolean): java.lang.Long = {
    if (vec.numElements() != dims) return null
    var i = 0
    while (i < dims) { if (vec.isNullAt(i)) return null; i += 1 }
    var best = Double.PositiveInfinity
    var bestIdx = -1
    var c = 0
    while (c < ids.length) {
      val base = c * dims
      var acc = 0.0
      var k = 0
      while (k < dims) {
        val x = if (isFloat) vec.getFloat(k).toDouble else vec.getDouble(k)
        val d = x - mat(base + k)
        acc += d * d
        k += 1
      }
      if (acc < best) { best = acc; bestIdx = c }
      c += 1
    }
    if (bestIdx < 0) null else java.lang.Long.valueOf(ids(bestIdx))
  }

  /** Packed sign-bit buckets, one long per table. `planes` is the
    * row-major flattening of (tables*bits) × dims hyperplanes.
    */
  def hyperplaneBuckets(vec: ArrayData, planes: Array[Double],
                        tables: Int, bits: Int, dims: Int,
                        isFloat: Boolean): ArrayData = {
    val out = new Array[Long](tables)
    val n = vec.numElements()
    // HOF mirror: zip_with pads a length-mismatched side with null,
    // nulling the fold — the sign test then leaves the bit unset
    if (n == dims) {
      var anyNull = false
      var i = 0
      while (i < n && !anyNull) { anyNull = vec.isNullAt(i); i += 1 }
      if (!anyNull) {
        var t = 0
        while (t < tables) {
          var bucket = 0L
          var j = 0
          while (j < bits) {
            val base = (t * bits + j) * dims
            var acc = 0.0
            var k = 0
            while (k < dims) {
              val x = if (isFloat) vec.getFloat(k).toDouble else vec.getDouble(k)
              acc += x * planes(base + k)
              k += 1
            }
            if (acc > 0) bucket |= 1L << j
            j += 1
          }
          out(t) = bucket
          t += 1
        }
      }
    }
    org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
      .fromPrimitiveArray(out)
  }

  /** Product-quantization encode: for each of `m` contiguous subspaces
    * of `subDim` dims, the argmin code (0..k-1) over that subspace's
    * codewords. `mat` is subspace-major row-major:
    * mat[((s*k)+c)*subDim + j] = codebook(s)(c)(j). Strict in-order
    * accumulation, strict `<` keeps the first minimum — same tie-break
    * as nearestCell. Boxed-null return when the vector length isn't
    * m*subDim, any element is null, or any subspace has no finite
    * distance — all-NaN leaves no argmin (HOF null propagation).
    */
  def pqEncode(vec: ArrayData, mat: Array[Double], m: Int, subDim: Int,
               k: Int, isFloat: Boolean): ArrayData = {
    val dims = m * subDim
    if (vec.numElements() != dims) return null
    var i = 0
    while (i < dims) { if (vec.isNullAt(i)) return null; i += 1 }
    val out = new Array[Long](m)
    var s = 0
    while (s < m) {
      var best = Double.PositiveInfinity
      var bestIdx = -1
      var c = 0
      while (c < k) {
        val base = (s * k + c) * subDim
        var acc = 0.0
        var j = 0
        while (j < subDim) {
          val idx = s * subDim + j
          val x = if (isFloat) vec.getFloat(idx).toDouble else vec.getDouble(idx)
          val d = x - mat(base + j)
          acc += d * d
          j += 1
        }
        if (acc < best) { best = acc; bestIdx = c }
        c += 1
      }
      // all-NaN subspace distances leave bestIdx = -1 (NaN < best is
      // always false); mirror nearestCell and return null rather than
      // emit code -1, which downstream ADC would element_at(dtable, 0)
      if (bestIdx < 0) return null
      out(s) = bestIdx.toLong
      s += 1
    }
    org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
      .fromPrimitiveArray(out)
  }
}

object DotProduct {
  /** Column-API entry. */
  def apply(a: Column, b: Column): Column =
    GraftShims.column(DotProduct(GraftShims.expression(a), GraftShims.expression(b)))
}

/** Nearest-centroid argmin as one fused loop: squared distance to every
  * row of a constant centroid matrix, first (lowest-index) minimum wins,
  * returns that centroid's id. The matrix ships via addReferenceObj, so
  * codegen size is O(1) in nCells×dims — the HOF formulation
  * (transform(typedlit(mat), dist2) + array_min + array_position)
  * embeds the matrix in the expression tree and pays a multi-second
  * janino compile PER DISTINCT MATRIX, which dominates iterative
  * k-means where every round carries new centroids.
  *
  * Mirrors the HOF exactly (VectorMathSpec pins equivalence): strict
  * in-index-order accumulation of (x-c)^2 per centroid; null vector,
  * null element, length≠dims, or an empty matrix → null id.
  */
case class NearestCell(child: Expression, ids: Array[Long],
                       mat: Array[Double], dims: Int)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  private def elemIsFloat: Boolean =
    child.dataType.asInstanceOf[ArrayType].elementType match {
      case FloatType  => true
      case DoubleType => false
      case t => throw new IllegalArgumentException(
        s"nearest_cell needs array<float|double>, got array<$t>")
    }

  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "nearest_cell"

  override def nullSafeEval(vec: Any): Any =
    VectorKernel.nearestCell(vec.asInstanceOf[ArrayData], ids, mat, dims,
      elemIsFloat)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val kernel = VectorKernel.getClass.getName + ".MODULE$"
    val idsRef = ctx.addReferenceObj("cellIds", ids, "long[]")
    val matRef = ctx.addReferenceObj("cellMat", mat, "double[]")
    val boxed = ctx.freshName("cellRes")
    nullSafeCodeGen(ctx, ev, v => s"""
      |java.lang.Long $boxed =
      |  $kernel.nearestCell($v, $idsRef, $matRef, $dims, $elemIsFloat);
      |if ($boxed == null) { ${ev.isNull} = true; }
      |else { ${ev.value} = $boxed.longValue(); }
      |""".stripMargin)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object NearestCell {
  /** Column-API entry: `cents` as (id, row-major centroid matrix). */
  def apply(vec: Column, ids: Seq[Long], mat: Seq[Seq[Double]]): Column =
    GraftShims.column(NearestCell(GraftShims.expression(vec), ids.toArray,
      mat.flatten.toArray, if (mat.isEmpty) 0 else mat.head.length))
}

/** Signed random-hyperplane LSH buckets as one fused loop: for each of
  * `tables` hash tables, `bits` sign tests of vec · plane packed into a
  * long. The plane matrix (Similarity.hyperplanes — splitmix64-seeded,
  * deterministic) ships as one flat reference array, NOT as a literal in
  * the expression tree, so codegen size is O(1) in tables×bits×dims.
  *
  * Mirrors the higher-order-function fold exactly (SimilaritySpec pins
  * bit-identity): a null element or a length≠dims vector nulls the
  * per-plane dot, whose sign test then fails → that bit stays 0.
  */
case class HyperplaneBuckets(child: Expression, tables: Int, bits: Int, dims: Int)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  private def elemIsFloat: Boolean =
    child.dataType.asInstanceOf[ArrayType].elementType match {
      case FloatType  => true
      case DoubleType => false
      case t => throw new IllegalArgumentException(
        s"hyperplane_buckets needs array<float|double>, got array<$t>")
    }

  @transient private lazy val planes: Array[Double] =
    graft.functions.Similarity.hyperplanes(tables, bits, dims).flatten.toArray

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "hyperplane_buckets"

  override def nullSafeEval(vec: Any): Any =
    VectorKernel.hyperplaneBuckets(vec.asInstanceOf[ArrayData], planes,
      tables, bits, dims, elemIsFloat)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val kernel = VectorKernel.getClass.getName + ".MODULE$"
    val planesRef = ctx.addReferenceObj("planes", planes, "double[]")
    nullSafeCodeGen(ctx, ev, v => s"""
      |${ev.value} = $kernel.hyperplaneBuckets(
      |  $v, $planesRef, $tables, $bits, $dims, $elemIsFloat);
      |""".stripMargin)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object HyperplaneBuckets {
  /** Column-API entry. */
  def apply(vec: Column, tables: Int, bits: Int, dims: Int): Column =
    GraftShims.column(
      HyperplaneBuckets(GraftShims.expression(vec), tables, bits, dims))
}

/** Product-quantization encode as one fused loop: m argmins over a
  * constant subspace-major codeword matrix, emitted as array<long>
  * codes. The matrix ships via addReferenceObj (O(1) codegen in
  * m×k×subDim, no per-codebook recompile — the same reason NearestCell
  * exists). Mirrors the per-subspace slice+NearestCell composition
  * exactly (PqSpec pins equivalence): null vector, null element, or
  * length ≠ m*subDim → null codes array.
  */
case class PqEncode(child: Expression, mat: Array[Double],
                    m: Int, subDim: Int, k: Int)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  private def elemIsFloat: Boolean =
    child.dataType.asInstanceOf[ArrayType].elementType match {
      case FloatType  => true
      case DoubleType => false
      case t => throw new IllegalArgumentException(
        s"pq_encode needs array<float|double>, got array<$t>")
    }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "pq_encode"

  override def nullSafeEval(vec: Any): Any =
    VectorKernel.pqEncode(vec.asInstanceOf[ArrayData], mat, m, subDim, k,
      elemIsFloat)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val kernel = VectorKernel.getClass.getName + ".MODULE$"
    val matRef = ctx.addReferenceObj("pqMat", mat, "double[]")
    val boxed = ctx.freshName("pqRes")
    nullSafeCodeGen(ctx, ev, v => s"""
      |org.apache.spark.sql.catalyst.util.ArrayData $boxed =
      |  $kernel.pqEncode($v, $matRef, $m, $subDim, $k, $elemIsFloat);
      |if ($boxed == null) { ${ev.isNull} = true; }
      |else { ${ev.value} = $boxed; }
      |""".stripMargin)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object PqEncode {
  /** Column-API entry: `books` as (subspace)(codeword)(component). */
  def apply(vec: Column, books: Seq[Seq[Seq[Double]]]): Column = {
    val m = books.length
    val k = books.head.length
    val subDim = books.head.head.length
    GraftShims.column(PqEncode(GraftShims.expression(vec),
      books.flatten.flatten.toArray, m, subDim, k))
  }
}
