package graft

import graft.sql.GraftFunctions

/** Text one-shot compression ratio over the driver documents (the
  * decompress_str analog's quality metric; reference PPMd hits ~0.15 on its
  * text fixture). Run: sbt "Test/runMain graft.DriveTextRatio" */
object DriveTextRatio {
  def main(args: Array[String]): Unit = {
    val spark = SparkTestSession.spark
    val texts = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
      .select("text").collect().map(_.getString(0))
    val raw = texts.map(_.getBytes("UTF-8").length.toLong).sum
    val enc = texts.map(t => GraftFunctions.compressText(t).length.toLong).sum
    println(f"TEXTRATIO per-doc raw=$raw enc=$enc ratio=${enc.toDouble / raw}%.4f")
    val all = texts.mkString("\n").getBytes("UTF-8")
    val encAll = graft.codec.Fsst.encode(all).length
    println(f"TEXTRATIO concat raw=${all.length} enc=$encAll ratio=${encAll.toDouble / all.length}%.4f")
    // shared-dictionary per-doc path: one table trained on a sample,
    // broadcast, each doc coded table-free (doc_compress_shared's ratio)
    val table = graft.codec.Fsst.train(
      texts.grouped(10).map(_.head).mkString("\n").getBytes("UTF-8"))
    val encShared = texts.map(t =>
      graft.codec.Fsst.compressWith(table, t.getBytes("UTF-8")).length.toLong).sum
    println(f"TEXTRATIO shared-dict per-doc raw=$raw enc=$encShared ratio=${encShared.toDouble / raw}%.4f")
    spark.stop()
  }
}
