package graft.plans

import org.apache.spark.sql.{Column, GraftShims}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, IntegerType}
import graft.functions.Geo

/** Point-in-polygon as a native Catalyst Expression with codegen
  * (SURVEY §2.10 / prompt preference ladder: Expression > UDF): the
  * generated code calls the shared ray-casting kernel directly on
  * primitive doubles — no boxing, no Scala-function wrapper, fused into
  * the enclosing WholeStageCodegen stage. The polygon set rides along
  * as a codegen reference object (same broadcast-once semantics as the
  * UDF variant; Geo.clusterAssigner remains for buffered-fallback
  * assignment).
  *
  * Returns the first containing polygon's id (ascending), or null.
  */
case class PointInPolygonExpression(left: Expression, right: Expression,
                                    polys: Array[Geo.Poly])
    extends BinaryExpression {

  override def dataType: DataType = IntegerType
  override def nullable: Boolean = true
  override def prettyName: String = "point_in_polygon"

  override def nullSafeEval(lon: Any, lat: Any): Any =
    PointInPolygonKernel.firstContaining(polys,
      lon.asInstanceOf[Double], lat.asInstanceOf[Double])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    // JVM binary names: MODULE$ lives on the dollar class (…Kernel$), and
    // Poly's binary name is Geo$Poly — janino resolves both verbatim, while
    // the mirror-class spellings fail to compile (round-1 silent fallback).
    val polysRef = ctx.addReferenceObj("polys", polys, "graft.functions.Geo$Poly[]")
    val kernel = PointInPolygonKernel.getClass.getName + ".MODULE$"
    nullSafeCodeGen(ctx, ev, (lon, lat) => {
      val boxed = ctx.freshName("cell")
      s"""
         |Integer $boxed = $kernel.firstContaining($polysRef, $lon, $lat);
         |if ($boxed == null) { ${ev.isNull} = true; } else { ${ev.value} = $boxed.intValue(); }
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(newLeft: Expression,
                                                 newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object PointInPolygonKernel {
  /** Shared by interpreted eval and generated code. */
  def firstContaining(polys: Array[Geo.Poly], x: Double, y: Double): Integer = {
    var i = 0
    while (i < polys.length) {
      if (Geo.contains(polys(i), x, y)) return Integer.valueOf(polys(i).id)
      i += 1
    }
    null
  }
}

object PointInPolygonExpression {
  /** Column-API entry: polygons sorted by id for first-match semantics. */
  def apply(lon: Column, lat: Column, polys: Seq[Geo.Poly]): Column =
    GraftShims.column(PointInPolygonExpression(
      GraftShims.expression(lon), GraftShims.expression(lat),
      polys.sortBy(_.id).toArray))
}
