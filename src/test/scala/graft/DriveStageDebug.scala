package graft

import org.apache.spark.sql.SparkSession
import graft.engine.{Encoder, EncoderConfig, SeqRow}
import graft.io.Corpus

/** Stage-level timing of the encode job.
  * sbt "Test/runMain graft.DriveStageDebug <nRows> <cpus> <parts>" */
object DriveStageDebug {
  def main(args: Array[String]): Unit = {
    val nRows = args(0).toLong
    val cpus = args(1).toInt
    val parts = args(2).toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus.toString)
      .config("spark.driver.host", "localhost")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    def t(label: String)(f: => Any): Unit = {
      val t0 = System.nanoTime()
      f
      println(f"STAGE $label%-28s ${(System.nanoTime() - t0) / 1e9}%7.2f s")
    }
    val corpus = Corpus.table(spark, nRows, partitions = parts).cache()
    t("gen+cache")(corpus.map(_.n_tok.toLong).reduce(_ + _))
    t("cache read")(corpus.map(_.n_tok.toLong).reduce(_ + _))
    val cfg = EncoderConfig(chunkTokens = 1 << 20, numPartitions = parts)
    t("arrange (shuffle+sort)") {
      Encoder.arrange(corpus, cfg).map(_.n_tok.toLong).reduce(_ + _)
    }
    t("arrange again") {
      Encoder.arrange(corpus, cfg).map(_.n_tok.toLong).reduce(_ + _)
    }
    t("kernel only (no shuffle)") {
      corpus.mapPartitions(it =>
        Encoder.chunkIterator(it, org.apache.spark.TaskContext.getPartitionId(), cfg))
        .map(_.enc_bytes).reduce(_ + _)
    }
    t("full encode") {
      Encoder.encodeTable(corpus, cfg).map(_.enc_bytes).reduce(_ + _)
    }
    t("full encode again") {
      Encoder.encodeTable(corpus, cfg).map(_.enc_bytes).reduce(_ + _)
    }
    spark.stop()
  }
}

/** Warm per-stage timing of the NO-shuffle encode path.
  * sbt "Test/runMain graft.DriveStage2 <nRows> <cpus> <parts>" */
object DriveStage2 {
  def main(args: Array[String]): Unit = {
    val nRows = args(0).toLong
    val cpus = args(1).toInt
    val parts = args(2).toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus.toString)
      .config("spark.driver.host", "localhost")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    def t(label: String)(f: => Any): Unit = {
      f // warm
      val times = (1 to 2).map { _ =>
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }
      println(f"STAGE2 $label%-30s ${times.min}%7.2f s")
    }
    val corpus = Corpus.table(spark, nRows, partitions = parts).cache()
    corpus.map(_.n_tok.toLong).reduce(_ + _)
    val cfg = EncoderConfig(chunkTokens = 1 << 20, numPartitions = 0)
    t("cache read+deser+reduce")(corpus.map(_.n_tok.toLong).reduce(_ + _))
    t("sort only")(Encoder.arrange(corpus, cfg).map(_.n_tok.toLong).reduce(_ + _))
    t("kernel no sort") {
      corpus.mapPartitions(it =>
        Encoder.chunkIterator(it, org.apache.spark.TaskContext.getPartitionId(), cfg))
        .map(_.enc_bytes).reduce(_ + _)
    }
    t("sort+kernel (=encodeTable)") {
      Encoder.encodeTable(corpus, cfg).map(_.enc_bytes).reduce(_ + _)
    }
    spark.stop()
  }
}
