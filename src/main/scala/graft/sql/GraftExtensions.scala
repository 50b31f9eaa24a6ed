package graft.sql

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** SparkSessionExtensions injector — the deployment-grade registration path
  * for the engine's Catalyst surface (the analog of the reference being
  * importable as a library, `import pyppmd`): a cluster enables everything
  * with
  *
  *   --conf spark.sql.extensions=graft.sql.GraftExtensions
  *
  * and gets `encode_tokens` / `decode_tokens` / `cosine_sim` as SQL
  * functions plus the decode∘encode fold rule in the optimizer, with no
  * driver-side code. (GraftFunctions.register remains the programmatic
  * equivalent for an already-running session.)
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  override def apply(ext: SparkSessionExtensions): Unit = {
    GraftExtensions.functions.foreach { case (name, usage, builder) =>
      ext.injectFunction((
        FunctionIdentifier(name),
        new ExpressionInfo(classOf[GraftExtensions].getName, name, usage),
        builder))
    }
    ext.injectOptimizerRule(_ => FoldDecodeEncode)
    // operator-optimization time (before V2 scan pushdown):
    // array_contains(tokens, v) filters over a graft relation become
    // planning-time chunk-pruning probes via the containsToken read option
    ext.injectOptimizerRule(_ => PushTokenContains)
  }
}

object GraftExtensions {
  /** (name, usage, builder) for every SQL-exposed expression. */
  val functions: Seq[(String, String, Seq[Expression] => Expression)] = Seq(
    ("encode_tokens", "encode_tokens(array<int>) -> binary framed chunk",
      (es: Seq[Expression]) => EncodeTokens(es.head)),
    ("decode_tokens", "decode_tokens(binary) -> array<int>",
      (es: Seq[Expression]) => DecodeTokens(es.head)),
    ("cosine_sim", "cosine_sim(array<double>, array<double>) -> double",
      (es: Seq[Expression]) => CosineSim(es(0), es(1))),
    ("compress_text", "compress_text(string) -> binary framed text frame",
      (es: Seq[Expression]) => CompressText(es.head)),
    ("decompress_text", "decompress_text(binary) -> string",
      (es: Seq[Expression]) => DecompressText(es.head)))
}
