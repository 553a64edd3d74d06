package graft.functions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, DoubleType}

/** Raw JVM double division/remainder for the expression language (JsExpr).
  *
  * The reference (expressions/js/JavascriptCompiler.java) emits DDIV/DREM
  * bytecode, where 1/0 = Infinity, 0/0 = NaN and % keeps the dividend sign.
  * Spark's Divide/Remainder return NULL on a zero divisor in legacy mode and
  * THROW in ANSI mode — neither matches — so these two expressions generate
  * the bare Java operator, staying inside whole-stage codegen.
  */
// Operands are always double-cast by JsExpr before construction, so no
// ExpectsInputTypes coercion is needed (AbstractDataType is private[sql]).
abstract class JvmDoubleBinary extends BinaryExpression with Serializable {
  override def dataType: DataType = DoubleType
  protected def op: String
  override def nullSafeEval(a: Any, b: Any): Any =
    if (op == "/") a.asInstanceOf[Double] / b.asInstanceOf[Double]
    else a.asInstanceOf[Double] % b.asInstanceOf[Double]
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (l, r) => s"($l $op $r)")
}

case class JvmDiv(left: Expression, right: Expression) extends JvmDoubleBinary {
  override protected def op: String = "/"
  override def prettyName: String = "jvm_div"
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

case class JvmRem(left: Expression, right: Expression) extends JvmDoubleBinary {
  override protected def op: String = "%"
  override def prettyName: String = "jvm_rem"
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}
