package graft

import org.apache.spark.sql.SparkSession

/** Diagnostic: per-section meta byte accounting over the oracle-scale corpus
  * (what does the 35 KB of chunk meta actually hold?). Not a test — run via
  * `sbt "Test/runMain graft.DriveMetaSizes"`. */
object DriveMetaSizes {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.driver.host", "localhost")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    val ds = graft.io.Corpus.table(spark, 5000, partitions = 8)
    val chunks = graft.engine.Encoder.encodeTable(ds,
      graft.engine.EncoderConfig(chunkTokens = 1 << 18, numPartitions = 32))
      .collect()
    var a = 0L; var b = 0L; var c = 0L; var d = 0L; var frame = 0L
    chunks.foreach { ch =>
      val r = new graft.codec.Varint.Reader(ch.meta)
      val secs = (0 until 4).map { _ =>
        val len = r.read().toInt
        r.pos += len
        len
      }
      a += secs(0); b += secs(1); c += secs(2); d += secs(3)
      frame += ch.meta.length - secs.sum
    }
    val total = a + b + c + d + frame
    println(s"SECTIONS chunks=${chunks.length} A_rowlens=$a B_srcidx=$b " +
      s"C_srcdict=$c D_docids=$d framing=$frame total=$total")
    // raw doc_id bytes for reference
    val rawDoc = chunks.map(ch =>
      graft.engine.ChunkBuilder.open(ch).map(_.doc_id.getBytes("UTF-8").length)
        .sum.toLong).sum
    println(s"RAW doc_id bytes=$rawDoc")
    spark.stop()
  }
}
