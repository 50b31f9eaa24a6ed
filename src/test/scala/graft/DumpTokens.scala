package graft

import graft.io.Corpus
import java.io.{BufferedOutputStream, DataOutputStream, FileOutputStream}

/** Fixture tool: serialize the deterministic corpus's token streams per
  * source (little-endian i32, rows in doc_id order) so the reference PPMd
  * codec can be run over the identical bytes — pins golden/ppmd_sizes.json
  * (FIXTURES.md "PPMd cross-reference fixture").
  * Run: sbt "Test/runMain graft.DumpTokens <nRows> <outDir>" */
object DumpTokens {
  def main(args: Array[String]): Unit = {
    val n = args(0).toLong
    val outDir = args(1)
    new java.io.File(outDir).mkdirs()
    val spark = SparkTestSession.spark
    val rows = Corpus.table(spark, n, partitions = 8)
      .collect().sortBy(_.doc_id)
    rows.groupBy(_.source).foreach { case (src, rs) =>
      val out = new DataOutputStream(new BufferedOutputStream(
        new FileOutputStream(s"$outDir/$src.bin"), 1 << 20))
      rs.foreach { r =>
        r.tokens.foreach { t => out.writeInt(java.lang.Integer.reverseBytes(t)) }
      }
      out.close()
      println(s"DUMP $src rows=${rs.length} tokens=${rs.map(_.n_tok.toLong).sum}")
    }
    spark.stop()
  }
}
