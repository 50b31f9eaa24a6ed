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
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "compress_text", exprs => CompressText(exprs.head), "scala_udf")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "decompress_text", exprs => DecompressText(exprs.head), "scala_udf")
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

  /** Column forms of the text one-shot (UTF-8, Spark's native string
    * encoding — the reference's default `encoding=` too). */
  def compress_text(c: Column): Column =
    ColumnBridge.column(CompressText(ColumnBridge.expression(c)))
  def decompress_text(c: Column): Column =
    ColumnBridge.column(DecompressText(ColumnBridge.expression(c)))

  /** Codegen'd cosine similarity over two array<double> columns — replaces
    * the zip_with/aggregate higher-order-function tree, whose lambdas are
    * interpreted per element; this stays a tight primitive loop inside
    * WholeStageCodegen. Numerics are IDENTICAL to the HOF form (same
    * accumulation order, same 1e-12 denominator floor), so the pinned
    * similarity oracles are unaffected. */
  def cosine_sim(a: Column, b: Column): Column =
    ColumnBridge.column(CosineSim(ColumnBridge.expression(a),
      ColumnBridge.expression(b)))

  // codegen-callable kernels (static-shaped entry points)
  def compressTextKernel(s: org.apache.spark.unsafe.types.UTF8String): Array[Byte] =
    graft.codec.Fsst.encode(s.getBytes)
  def decompressTextKernel(b: Array[Byte]): org.apache.spark.unsafe.types.UTF8String =
    org.apache.spark.unsafe.types.UTF8String.fromBytes(graft.codec.Fsst.decode(b))
  def encodeKernel(arr: ArrayData): Array[Byte] =
    graft.codec.TokenCodec.encodeAuto(arr.toIntArray())
  def decodeKernel(bytes: Array[Byte]): ArrayData =
    new GenericArrayData(graft.codec.TokenCodec.decodeOrThrow(bytes))
  def cosineKernel(a: ArrayData, b: ArrayData): Double = {
    val an = a.numElements()
    val bn = b.numElements()
    val n = math.min(an, bn)
    var dot = 0.0
    var i = 0
    while (i < n) { dot += a.getDouble(i) * b.getDouble(i); i += 1 }
    var na = 0.0
    i = 0
    while (i < an) { val x = a.getDouble(i); na += x * x; i += 1 }
    var nb = 0.0
    i = 0
    while (i < bn) { val x = b.getDouble(i); nb += x * x; i += 1 }
    dot / math.max(math.sqrt(na) * math.sqrt(nb), 1e-12)
  }
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

/** (array<double>, array<double>) -> double cosine similarity; codegen
  * emits a direct static call, keeping the whole scoring pipeline inside
  * one WholeStageCodegen span. */
case class CosineSim(left: Expression, right: Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {
  override def dataType: DataType = DoubleType
  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(DoubleType, _), ArrayType(DoubleType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"cosine_sim needs two array<double>, got ${l.sql}, ${r.sql}")
    }
  override def nullSafeEval(a: Any, b: Any): Any =
    GraftFunctions.cosineKernel(a.asInstanceOf[ArrayData],
      b.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.sql.GraftFunctions.cosineKernel($a, $b)")
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CosineSim =
    copy(left = newLeft, right = newRight)
  override def prettyName: String = "cosine_sim"
}

/** string -> binary: text one-shot compress (FSST stack incl. the word
  * model) as a native expression — the `pyppmd.compress(str)` analog at
  * column level. */
case class CompressText(child: Expression) extends UnaryExpression {
  override def dataType: DataType = BinaryType
  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"compress_text needs string, got ${other.sql}")
    }
  override def nullSafeEval(v: Any): Any =
    GraftFunctions.compressTextKernel(
      v.asInstanceOf[org.apache.spark.unsafe.types.UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.sql.GraftFunctions.compressTextKernel($c)")
  override protected def withNewChildInternal(c: Expression): CompressText =
    copy(child = c)
  override def prettyName: String = "compress_text"
}

/** binary -> string: text one-shot decompress (decompress_str analog). */
case class DecompressText(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case BinaryType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"decompress_text needs binary, got ${other.sql}")
    }
  override def nullSafeEval(v: Any): Any =
    GraftFunctions.decompressTextKernel(v.asInstanceOf[Array[Byte]])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.sql.GraftFunctions.decompressTextKernel($c)")
  override protected def withNewChildInternal(c: Expression): DecompressText =
    copy(child = c)
  override def prettyName: String = "decompress_text"
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
