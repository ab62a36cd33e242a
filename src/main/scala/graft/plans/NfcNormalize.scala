package graft.plans

import org.apache.spark.sql.{Column, GraftShims}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode NFC normalization as a codegen expression — the text
  * canonicalization step (compose combining sequences to precomposed
  * forms) every multilingual corpus pipeline runs before hashing or
  * dedup, so that byte-different but canonically-equal strings collide.
  * Backed by java.text.Normalizer (Unicode canonical composition, the
  * same algorithm utf8proc implements — pinned cross-engine by t35's
  * oracle against DuckDB's nfc_normalize). Narrow projection; stays in
  * whole-stage codegen.
  */
case class NfcNormalize(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType
  override def prettyName: String = "nfc_normalize"

  override def nullSafeEval(text: Any): Any =
    NfcKernel.nfc(text.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val kernel = NfcKernel.getClass.getName + ".MODULE$"
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $kernel.nfc($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object NfcNormalize {
  def apply(text: Column): Column =
    GraftShims.column(NfcNormalize(GraftShims.expression(text)))
}

object NfcKernel {
  /** Fast path: NFC leaves pure-ASCII byte runs untouched, and
    * Normalizer.isNormalized is a cheap scan — only strings that
    * actually carry decomposable sequences pay the compose. */
  def nfc(text: UTF8String): UTF8String = {
    val s = text.toString
    if (java.text.Normalizer.isNormalized(s, java.text.Normalizer.Form.NFC)) text
    else UTF8String.fromString(
      java.text.Normalizer.normalize(s, java.text.Normalizer.Form.NFC))
  }
}
