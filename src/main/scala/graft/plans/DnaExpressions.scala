package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BinaryType, DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

import graft.codec.Goldman

/** Native Catalyst expressions for the hot codec path (SURVEY.md §4.2
  * phase-2 promotion): `DnaEncode`/`DnaDecode` participate in
  * whole-stage codegen via `defineCodeGen` — the generated Java calls
  * the static codec directly, with none of the Scala-UDF
  * null-wrapper/encoder boxing on either side. Registered as SQL
  * functions `dna_encode` / `dna_decode` by [[GraftExtensions]].
  */
case class DnaEncode(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == BinaryType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"dna_encode requires BINARY input, got ${child.dataType.sql}")
  override def dataType: DataType = StringType
  override def prettyName: String = "dna_encode"

  override protected def nullSafeEval(input: Any): Any =
    UTF8String.fromString(Goldman.bytesToDna(input.asInstanceOf[Array[Byte]]))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"org.apache.spark.unsafe.types.UTF8String.fromString(" +
        s"graft.codec.Goldman.bytesToDna($c))")

  override protected def withNewChildInternal(newChild: Expression): DnaEncode =
    copy(child = newChild)
}

/** dna_decode(dna, target_length_bytes) → binary. Inverse of
  * [[DnaEncode]]; fixed-width semantics (left-pad / right-truncate)
  * exactly as `plugins/utils/dna_encoding.py:63-76`.
  */
case class DnaDecode(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == StringType && right.dataType == IntegerType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"dna_decode requires (STRING, INT), got (${left.dataType.sql}, ${right.dataType.sql})")
  override def dataType: DataType = BinaryType
  override def prettyName: String = "dna_decode"

  override protected def nullSafeEval(dna: Any, len: Any): Any =
    Goldman.dnaToBytes(dna.asInstanceOf[UTF8String].toString,
      len.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (d, l) =>
      s"graft.codec.Goldman.dnaToBytes($d.toString(), $l)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DnaDecode =
    copy(left = newLeft, right = newRight)
}
