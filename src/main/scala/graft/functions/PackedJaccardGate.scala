package graft.functions

import graft.core.Shingler

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BinaryType, BooleanType, DataType}

/** Native Catalyst expression for the verify stage's per-pair predicate:
  * exact-Jaccard gate over two delta+varint-packed shingle sets
  * (`Shingler.packSet`), semantically identical to the ScalaUDF form
  *
  *   i >= tau * (|x| + |y| - i),  i = merge-count of the two sorted sets
  *
  * but evaluated as a direct static call inside whole-stage codegen: no
  * ScalaUDF closure dispatch, no catalyst<->Scala converter wrappers, no
  * per-row null-handling lambda — the byte arrays flow straight from the
  * unsafe row to the merge-count kernel. The kernel itself is the verified
  * [[Shingler]] packed codec (spec-equal to unpacked merge-count on
  * adversarial inputs).
  */
case class PackedJaccardGate(left: Expression, right: Expression, tau: Double)
    extends BinaryExpression with ExpectsInputTypes {

  // AbstractDataType is private[sql]; the inferred type conforms
  override def inputTypes = Seq(BinaryType, BinaryType)
  override def dataType: DataType = BooleanType
  override def prettyName: String = "packed_jaccard_gate"

  override def nullSafeEval(x: Any, y: Any): Any =
    PackedJaccardGate.gate(x.asInstanceOf[Array[Byte]],
      y.asInstanceOf[Array[Byte]], tau)

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    // tau is a Scala Double; its toString is a valid Java double literal
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.PackedJaccardGate.gate($a, $b, $tau);")

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object PackedJaccardGate {
  /** The gate kernel (also the codegen target — must stay public static). */
  def gate(x: Array[Byte], y: Array[Byte], tau: Double): Boolean = {
    val i = Shingler.intersectionSizePacked(x, y)
    i >= tau * (Shingler.packedSize(x) + Shingler.packedSize(y) - i)
  }
}
