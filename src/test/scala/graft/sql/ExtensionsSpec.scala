package graft.sql

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.SparkSessionExtensions
import graft.SparkTestSession

/** GraftExtensions wiring: the injector populates a SparkSessionExtensions
  * with the engine's functions and the fold rule (full fresh-session
  * integration — spark.sql.extensions conf, SQL visibility, plan folding —
  * is driven by graft.DriveExtensions in its own JVM, since this suite's
  * shared session predates any extension injection). */
class ExtensionsSpec extends AnyFunSuite {

  test("injector registers all SQL functions and the fold rule") {
    val ext = new SparkSessionExtensions
    new GraftExtensions().apply(ext)
    val rules = org.apache.spark.sql.graft.ExtensionsBridge
      .optimizerRules(ext, SparkTestSession.spark)
    assert(rules.contains(FoldDecodeEncode))
    assert(GraftExtensions.functions.map(_._1).toSet ==
      Set("encode_tokens", "decode_tokens", "cosine_sim",
        "compress_text", "decompress_text"))
    // builders produce the right expression nodes
    import org.apache.spark.sql.catalyst.expressions.Literal
    val enc = GraftExtensions.functions.find(_._1 == "encode_tokens").get
      ._3(Seq(Literal(1)))
    assert(enc.isInstanceOf[EncodeTokens])
    val cos = GraftExtensions.functions.find(_._1 == "cosine_sim").get
      ._3(Seq(Literal(1.0), Literal(2.0)))
    assert(cos.isInstanceOf[CosineSim])
  }
}
