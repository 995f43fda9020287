package graft.functions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Native integer dot product over two array<bigint> columns — the
  * embedding queries' per-pair kernel. The previous form,
  * `aggregate(zip_with(a, b, _ * _), 0L, _ + _)`, is a higher-order
  * function: HOFs are CodegenFallback in Spark (interpreted, one lambda
  * InternalRow round-trip per element, plus the zip_with intermediate
  * array allocation) — at |pairs| x dims evaluations that interpreter
  * overhead dominates the whole query (q17 measured). This expression is
  * one static-call loop inside whole-stage codegen, no intermediate
  * array. Semantics equal the HOF form for the equal-length non-null
  * arrays the quantizer produces (spec-asserted).
  */
case class LongDot(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {

  override def inputTypes = Seq(ArrayType(LongType), ArrayType(LongType))
  override def dataType: DataType = LongType
  override def prettyName: String = "long_dot"

  override def nullSafeEval(x: Any, y: Any): Any =
    LongDot.dot(x.asInstanceOf[ArrayData], y.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.LongDot.dot($a, $b);")

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object LongDot {
  /** Codegen target — must stay public static. */
  def dot(a: ArrayData, b: ArrayData): Long = {
    val n = math.min(a.numElements(), b.numElements())
    var i = 0
    var s = 0L
    while (i < n) { s += a.getLong(i) * b.getLong(i); i += 1 }
    s
  }
}
