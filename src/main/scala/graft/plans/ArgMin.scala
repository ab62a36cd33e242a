package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftShims
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate.DeclarativeAggregate
import org.apache.spark.sql.catalyst.trees.BinaryLike
import org.apache.spark.sql.types._

/** Deterministic single-pass argmin (SURVEY §2.3 J10/J12 nearest-
  * neighbour; reference does per-row `which.min` loops, e.g.
  * randomize.R:1089-1100).
  *
  * Picks the (key, ord) pair that is lexicographically smallest by
  * (ord, key) — i.e. the row with the minimal ordering value, ties
  * broken by the smaller key, matching `row_number() OVER (ORDER BY
  * ord, key) = 1` semantics without a window (no full-pair shuffle) and
  * without the two-aggregate + O(N)-broadcast join-back shape this
  * replaces.
  *
  * Why not the built-ins: `min_by` keeps the first-encountered value on
  * ordering ties (nondeterministic under shuffle), and `min(struct)`
  * carries a struct buffer, which kicks the plan out of HashAggregate
  * into SortAggregate over every pair. This DeclarativeAggregate keeps a
  * two-primitive buffer (double, long), so it stays in whole-stage
  * codegen'd HashAggregate with map-side partial aggregation — the
  * crossJoin pairs fold down to one row per group before any exchange.
  *
  * Null ordering values are ignored (a group with only null `ord` yields
  * the sentinel (+Inf, Long.MaxValue) — callers here compute `ord` from
  * non-null arithmetic so the sentinel never escapes).
  */
case class ArgMinLongByDouble(key: Expression, ord: Expression)
    extends DeclarativeAggregate with BinaryLike[Expression] {

  override def left: Expression = key
  override def right: Expression = ord
  override def nullable: Boolean = false
  override def dataType: DataType = StructType(Seq(
    StructField("key", LongType, nullable = false),
    StructField("ord", DoubleType, nullable = false)))
  override def prettyName: String = "argmin_long_by_double"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    if (key.dataType == LongType && ord.dataType == DoubleType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"argmin_long_by_double expects (bigint, double), got " +
          s"(${key.dataType.sql}, ${ord.dataType.sql})")
  }

  private lazy val bOrd = AttributeReference("bOrd", DoubleType, nullable = false)()
  private lazy val bKey = AttributeReference("bKey", LongType, nullable = false)()

  override lazy val aggBufferAttributes: Seq[AttributeReference] = Seq(bOrd, bKey)

  override lazy val initialValues: Seq[Expression] = Seq(
    Literal(Double.PositiveInfinity), Literal(Long.MaxValue))

  // If `ord` is null the comparison is null and If takes the else branch,
  // i.e. the buffer is kept — nulls never win.
  override lazy val updateExpressions: Seq[Expression] = {
    val better = Or(LessThan(ord, bOrd),
      And(EqualTo(ord, bOrd), LessThan(key, bKey)))
    Seq(If(better, ord, bOrd), If(better, key, bKey))
  }

  override lazy val mergeExpressions: Seq[Expression] = {
    val better = Or(LessThan(bOrd.right, bOrd.left),
      And(EqualTo(bOrd.right, bOrd.left), LessThan(bKey.right, bKey.left)))
    Seq(If(better, bOrd.right, bOrd.left), If(better, bKey.right, bKey.left))
  }

  override lazy val evaluateExpression: Expression =
    CreateNamedStruct(Seq(Literal("key"), bKey, Literal("ord"), bOrd))

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): ArgMinLongByDouble =
    copy(key = newLeft, ord = newRight)
}

object ArgMin {
  /** `argmin` over a long key ordered by a double, ties to the smaller
    * key: `struct(key, ord)` of the winning row.
    */
  def longByDouble(key: Column, ord: Column): Column =
    GraftShims.column(ArgMinLongByDouble(
      GraftShims.expression(key), GraftShims.expression(ord))
      .toAggregateExpression())
}
