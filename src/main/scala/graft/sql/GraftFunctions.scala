package graft.sql

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Catalyst surface of the engine (SURVEY.md §7 module 5): `encode_tokens` /
  * `decode_tokens` as native expressions with whole-stage codegen, the
  * high-level one-shot API mirroring the reference's `pyppmd.compress` /
  * `pyppmd.decompress` (`/root/reference/src/pyppmd/__init__.py:126-219`),
  * and an optimizer rule folding decode(encode(x)) -> x.
  */
object GraftFunctions {

  /** Column-level auto-selected encode: array<int> -> binary (framed). */
  def encode_tokens(c: Column): Column =
    ColumnBridge.column(EncodeTokens(ColumnBridge.expression(c)))

  /** Column-level decode: binary -> array<int>; corrupt input fails the task
    * (the reference's ValueError path, `_ppmdmodule.c:549-551`). */
  def decode_tokens(c: Column): Column =
    ColumnBridge.column(DecodeTokens(ColumnBridge.expression(c)))

  /** Register SQL names + the fold rule on a session. */
  def register(spark: SparkSession): Unit = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "encode_tokens", exprs => EncodeTokens(exprs.head), "scala_udf")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "decode_tokens", exprs => DecodeTokens(exprs.head), "scala_udf")
    if (!spark.sessionState.experimentalMethods.extraOptimizations
        .contains(FoldDecodeEncode))
      spark.sessionState.experimentalMethods.extraOptimizations ++=
        Seq(FoldDecodeEncode)
  }

  /** One-shot whole-buffer API, the `pyppmd.compress(data)` analog (A1). */
  def compress(tokens: Array[Int]): Array[Byte] =
    graft.codec.TokenCodec.encodeAuto(tokens)

  /** One-shot decode, the `pyppmd.decompress(data)` analog (A2). */
  def decompress(bytes: Array[Byte]): Array[Int] =
    graft.codec.TokenCodec.decodeOrThrow(bytes)

  /** str-input one-shot, the `pyppmd.compress(str)` / `decompress_str`
    * analog (`__init__.py:83,144-145,205-219`): charset encode (UTF-8
    * default, like the reference's `encoding=` parameter), then the
    * byte-stream codec (FSST). */
  def compressText(text: String, encoding: String = "UTF-8"): Array[Byte] =
    graft.codec.Fsst.encode(text.getBytes(encoding))
  def decompressText(bytes: Array[Byte], encoding: String = "UTF-8"): String =
    new String(graft.codec.Fsst.decode(bytes), encoding)

  // codegen-callable kernels (static-shaped entry points)
  def encodeKernel(arr: ArrayData): Array[Byte] =
    graft.codec.TokenCodec.encodeAuto(arr.toIntArray())
  def decodeKernel(bytes: Array[Byte]): ArrayData =
    new GenericArrayData(graft.codec.TokenCodec.decodeOrThrow(bytes))
}

/** array<int> -> binary. Codegen emits a direct static call into the kernel,
  * keeping the expression inside the WholeStageCodegen span. */
case class EncodeTokens(child: Expression) extends UnaryExpression {
  override def dataType: DataType = BinaryType
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(IntegerType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"encode_tokens needs array<int>, got ${other.sql}")
    }
  override def nullSafeEval(v: Any): Any =
    GraftFunctions.encodeKernel(v.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.sql.GraftFunctions.encodeKernel($c)")
  override protected def withNewChildInternal(c: Expression): EncodeTokens =
    copy(child = c)
  override def prettyName: String = "encode_tokens"
}

/** binary -> array<int>. */
case class DecodeTokens(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case BinaryType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"decode_tokens needs binary, got ${other.sql}")
    }
  override def nullSafeEval(v: Any): Any =
    GraftFunctions.decodeKernel(v.asInstanceOf[Array[Byte]])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.sql.GraftFunctions.decodeKernel($c)")
  override protected def withNewChildInternal(c: Expression): DecodeTokens =
    copy(child = c)
  override def prettyName: String = "decode_tokens"
}

/** decode_tokens(encode_tokens(x)) == x by the roundtrip identity the test
  * suite enforces — fold it so test/verify pipelines skip the work
  * (SURVEY.md §4.1 "optional custom rule"). */
object FoldDecodeEncode extends Rule[LogicalPlan] {
  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case DecodeTokens(EncodeTokens(inner))
          if inner.dataType == ArrayType(IntegerType, containsNull = false) =>
        inner
    }
}
