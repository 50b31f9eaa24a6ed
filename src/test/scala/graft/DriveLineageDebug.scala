package graft

import graft.engine._
import graft.io.Corpus
import java.nio.file.{Files, Paths}

object DriveLineageDebug {
  def main(args: Array[String]): Unit = {
    val spark = SparkTestSession.spark
    val ds = Corpus.table(spark, 5000, partitions = 8)
    val cfg = EncoderConfig(chunkTokens = 1 << 16, numPartitions = 8)
    val d1 = Files.createTempDirectory("lin1").toString
    val d2 = Files.createTempDirectory("lin2").toString
    Lineage.encodeToDir(ds, d1, cfg)
    Lineage.encodeToDir(ds, d2, cfg)
    // compare data files byte-for-byte
    val files1 = Files.list(Paths.get(d1, "data")).toArray.map(_.toString).sorted
    val files2 = Files.list(Paths.get(d2, "data")).toArray.map(_.toString).sorted
    println(s"DBG files ${files1.length} vs ${files2.length}")
    files1.zip(files2).foreach { case (a, b) =>
      val ba = Files.readAllBytes(Paths.get(a))
      val bb = Files.readAllBytes(Paths.get(b))
      println(s"DBG ${Paths.get(a).getFileName}: len ${ba.length} vs ${bb.length} equal=${java.util.Arrays.equals(ba, bb)}")
    }
    // now the resume-with-stale-data scenario
    Files.delete(Paths.get(d1, "_lineage", "part-00003.json"))
    val resumed = Lineage.encodeToDir(ds, d1, cfg)
    println(s"DBG resumed=$resumed")
    val p3 = Files.readAllBytes(Paths.get(d1, "data", "part-00003.graft"))
    val p3b = Files.readAllBytes(Paths.get(d2, "data", "part-00003.graft"))
    println(s"DBG part3 after resume: len ${p3.length} vs ${p3b.length} equal=${java.util.Arrays.equals(p3, p3b)}")
    println(s"DBG leftover inprogress: ${Files.list(Paths.get(d1, "data")).toArray.map(_.toString).count(_.contains("inprogress"))}")
    try {
      val n = Lineage.decodeFromDir(spark, d1).count()
      println(s"DBG decode rows=$n")
    } catch { case e: Throwable => println(s"DBG decode failed: ${e.getMessage.take(100)}") }
    spark.stop()
  }
}
