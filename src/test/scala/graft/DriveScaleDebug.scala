package graft

import org.apache.spark.sql.SparkSession
import graft.engine.{Decoder, Encoder, EncoderConfig}
import graft.io.Corpus

/** Scaling diagnosis matrix. Run:
  * sbt "Test/runMain graft.DriveScaleDebug <nRows> <cpusCsv> <parts> <shuffle>" */
object DriveScaleDebug {
  def main(args: Array[String]): Unit = {
    val nRows = args(0).toLong
    val cpusList = args(1).split(",").map(_.toInt)
    val parts = args(2).toInt
    val shuffle = args(3).toBoolean
    cpusList.foreach { cpus =>
      val spark = SparkSession.builder()
        .master(s"local[$cpus]")
        .appName(s"scale-dbg-$cpus")
        .config("spark.sql.shuffle.partitions", cpus.toString)
        .config("spark.driver.host", "localhost")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
      spark.sparkContext.setLogLevel("WARN")
      import spark.implicits._
      val corpus = Corpus.table(spark, nRows, partitions = parts).cache()
      val nTokens = corpus.map(_.n_tok.toLong).reduce(_ + _)
      val cfg = EncoderConfig(chunkTokens = 1 << 20,
        numPartitions = if (shuffle) parts else 0)
      Encoder.encodeTable(corpus.limit(2000), EncoderConfig(
        chunkTokens = 1 << 18, numPartitions = cpus)).count()
      val times = (1 to 2).map { _ =>
        val t0 = System.nanoTime()
        val chunks = Encoder.encodeTable(corpus, cfg).cache()
        chunks.count()
        val tEnc = (System.nanoTime() - t0) / 1e9
        val t1 = System.nanoTime()
        Decoder.decodeTable(chunks).map(_.n_tok.toLong).reduce(_ + _)
        val tDec = (System.nanoTime() - t1) / 1e9
        chunks.unpersist(true)
        (tEnc, tDec)
      }
      val gen = {
        val t0 = System.nanoTime()
        Corpus.table(spark, nRows, partitions = parts).map(_.n_tok.toLong).reduce(_ + _)
        (System.nanoTime() - t0) / 1e9
      }
      corpus.unpersist(true)
      spark.stop()
      println(f"SCALE cpus=$cpus parts=$parts shuffle=$shuffle enc=${times.map(_._1).min}%.2f dec=${times.map(_._2).min}%.2f gen=$gen%.2f tok=$nTokens")
    }
  }
}
