package graft.functions

import graft.core.Shingler

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BinaryType, DataType, LongType}

/** Native Catalyst expressions over delta+varint-packed shingle sets
  * ([[Shingler.packSet]]) for the Jaccard ACCOUNTING queries (q05's
  * inter/union sizes — [[PackedJaccardGate]] covers the boolean gate):
  * evaluated as direct static calls inside whole-stage codegen, so the
  * per-pair hot path has no ScalaUDF closure dispatch and no
  * catalyst<->Scala array conversion, and the pair-join rows carry ~2-3
  * bytes per shingle instead of 8 (the packed codec is the same verified
  * [[Shingler]] kernel the pipeline's verify stage ships).
  */
case class PackedIntersectionSize(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {

  override def inputTypes = Seq(BinaryType, BinaryType)
  override def dataType: DataType = LongType
  override def prettyName: String = "packed_intersection_size"

  override def nullSafeEval(x: Any, y: Any): Any =
    PackedSetOps.inter(x.asInstanceOf[Array[Byte]], y.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.PackedSetOps.inter($a, $b);")

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Cardinality of one packed set (a streaming varint walk, no decode
  * allocation).
  */
case class PackedSetSize(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes = Seq(BinaryType)
  override def dataType: DataType = LongType
  override def prettyName: String = "packed_set_size"

  override def nullSafeEval(x: Any): Any =
    PackedSetOps.size(x.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, a => s"graft.functions.PackedSetOps.size($a)")

  override protected def withNewChildInternal(newChild: Expression)
      : Expression = copy(child = newChild)
}

object PackedSetOps {
  /** Column-level constructors — one definition of the GraftSqlBridge
    * plumbing for every call site.
    */
  def intersectionSize(a: org.apache.spark.sql.Column,
      b: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    import org.apache.spark.sql.GraftSqlBridge
    GraftSqlBridge.column(PackedIntersectionSize(
      GraftSqlBridge.expression(a), GraftSqlBridge.expression(b)))
  }
  def setSize(a: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    import org.apache.spark.sql.GraftSqlBridge
    GraftSqlBridge.column(PackedSetSize(GraftSqlBridge.expression(a)))
  }

  /** Codegen targets — must stay public static. */
  def inter(x: Array[Byte], y: Array[Byte]): Long =
    Shingler.intersectionSizePacked(x, y).toLong
  def size(x: Array[Byte]): Long = Shingler.packedSize(x).toLong
}
