package graft.streaming

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.Trigger
import graft.SparkTestSession
import graft.engine._
import graft.io.Corpus
import java.nio.file.Files

class StreamingSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  test("streaming encode: micro-batches -> lineage dirs -> decode equals input") {
    import spark.implicits._
    implicit val sc = spark.sqlContext
    val input = MemoryStream[SeqRow]
    val dir = Files.createTempDirectory("graft-stream").toString
    val ckpt = Files.createTempDirectory("graft-stream-ckpt").toString
    val cfg = EncoderConfig(chunkTokens = 8192, numPartitions = 0)
    val rows = (0L until 300L).map(i => Corpus.row(42L, i))
    // AvailableNow only drains data present at start()
    input.addData(rows.take(150))
    input.addData(rows.drop(150))
    val q = StreamingEncoder
      .writeToLineageDir(input.toDS(), dir, ckpt, cfg)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination(120000)
    // decode every batch dir and compare to the union of inputs
    val batchDirs = new java.io.File(dir).listFiles().filter(_.isDirectory)
    assert(batchDirs.nonEmpty)
    val decoded = batchDirs.flatMap(d =>
      Lineage.decodeFromDir(spark, d.toString).collect())
      .map(r => r.doc_id -> r).toMap
    assert(decoded.size == 300)
    rows.foreach { r =>
      assert(decoded(r.doc_id).tokens.sameElements(r.tokens), r.doc_id)
    }
  }

  test("stateful streaming dedup drops duplicates across micro-batches") {
    import spark.implicits._
    implicit val sc = spark.sqlContext
    val input = MemoryStream[SeqRow]
    val rows = (0L until 60L).map(i => Corpus.row(42L, i))
    input.addData(rows.take(40))                      // batch 1
    input.addData(rows.drop(20) ++ rows.take(5))      // batch 2 overlaps both ends
    val q = StreamingEncoder.dedupStream(input.toDS())
      .writeStream.format("memory").queryName("dedup_stream")
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000)
    val out = spark.table("dedup_stream").collect()
    assert(out.length == 60, s"expected 60 unique rows, got ${out.length}")
    assert(out.map(_.getString(0)).distinct.length == 60)
  }

  test("watermarked windowed aggregation over a rate-like stream") {
    import spark.implicits._
    implicit val sc = spark.sqlContext
    val input = MemoryStream[(java.sql.Timestamp, String, Int)]
    val agg = StreamingEncoder.tokenRateByWindow(
      input.toDS().toDF().toDF("ts", "source", "n_tok"))
    val base = java.sql.Timestamp.valueOf("2026-01-01 10:00:00")
    def at(min: Int) = new java.sql.Timestamp(base.getTime + min * 60000L)
    input.addData(Seq((at(0), "web", 100), (at(0), "web", 50),
      (at(1), "books", 70), (at(30), "web", 10)))
    // complete mode: all windows visible without needing a later batch to
    // advance the watermark past them
    val q = agg.writeStream.format("memory").queryName("token_rate")
      .outputMode("complete").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000)
    val out = spark.table("token_rate").collect()
    assert(out.exists(r => r.getString(1) == "web" && r.getLong(3) == 150L),
      out.mkString("; "))
  }
}
