package graft.io

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestSession
import graft.engine.{Decoder, Encoder, EncoderConfig}
import java.nio.file.Files

class TableIOSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  test("sequences and chunk tables roundtrip through parquet") {
    val seqPath = Files.createTempDirectory("graft-seq").toString + "/t"
    val chunkPath = Files.createTempDirectory("graft-chunks").toString + "/t"
    val ds = Corpus.table(spark, 300, partitions = 3)
    ds.write.parquet(seqPath)

    val readBack = ParquetTableIO.readSequences(spark, seqPath)
    val chunks = Encoder.encodeTable(readBack,
      EncoderConfig(chunkTokens = 8192, numPartitions = 3))
    ParquetTableIO.writeChunks(chunks, chunkPath)

    val decoded = Decoder.decodeTable(
      ParquetTableIO.readChunks(spark, chunkPath))
      .collect().map(r => r.doc_id -> r).toMap
    val original = ds.collect().map(r => r.doc_id -> r).toMap
    assert(decoded.keySet == original.keySet)
    original.foreach { case (id, o) =>
      assert(decoded(id).tokens.sameElements(o.tokens), id)
    }
  }

  test("csv sequences survive zero-token rows (empty field reads as NULL)") {
    import spark.implicits._
    val rows = Seq(
      graft.engine.SeqRow("doc-a", Array(1, 2, 3), 3, "s"),
      graft.engine.SeqRow("doc-b", Array.emptyIntArray, 0, "s"))
    val path = Files.createTempDirectory("graft-csv0").toString + "/t"
    CsvTableIO.writeSequences(spark.createDataset(rows), path)
    val back = CsvTableIO.readSequences(spark, path).collect()
      .map(r => r.doc_id -> r).toMap
    assert(back("doc-a").tokens.toSeq == Seq(1, 2, 3))
    assert(back("doc-b").tokens.isEmpty && back("doc-b").n_tok == 0)
    // the zero-token row's chunk has an EMPTY tok_set (also a NULL-via-CSV
    // field): the chunk table must roundtrip it too
    val chunks = Encoder.encodeTable(CsvTableIO.readSequences(spark, path),
      EncoderConfig(chunkTokens = 64, maxRowsPerChunk = 1, numPartitions = 1))
    assert(chunks.collect().exists(_.tok_set.isEmpty),
      "expected a zero-token chunk with an empty sketch")
    val cpath = Files.createTempDirectory("graft-csv0c").toString + "/t"
    CsvTableIO.writeChunks(chunks, cpath)
    val dec = Decoder.decodeTable(CsvTableIO.readChunks(spark, cpath))
      .collect().map(r => r.doc_id -> r.tokens.toSeq).toMap
    assert(dec == Map("doc-a" -> Seq(1, 2, 3), "doc-b" -> Seq()))
  }

  test("orc, json and csv TableIO implementations roundtrip identically") {
    val ds = Corpus.table(spark, 200, partitions = 2)
    val original = ds.collect().map(r => r.doc_id -> r).toMap
    for ((io, write) <- Seq[(TableIO, (org.apache.spark.sql.Dataset[graft.engine.SeqRow], String) => Unit)](
        (OrcTableIO, (d, p) => d.write.orc(p)),
        (JsonTableIO, (d, p) => d.write.json(p)),
        (CsvTableIO, (d, p) => CsvTableIO.writeSequences(d, p)))) {
      val seqPath = Files.createTempDirectory("graft-seq2").toString + "/t"
      val chunkPath = Files.createTempDirectory("graft-chunks2").toString + "/t"
      write(ds, seqPath)
      val chunks = Encoder.encodeTable(io.readSequences(spark, seqPath),
        EncoderConfig(chunkTokens = 8192, numPartitions = 2))
      io.writeChunks(chunks, chunkPath)
      val decoded = Decoder.decodeTable(io.readChunks(spark, chunkPath))
        .collect().map(r => r.doc_id -> r).toMap
      assert(decoded.keySet == original.keySet, io.getClass.getSimpleName)
      original.foreach { case (id, o) =>
        assert(decoded(id).tokens.sameElements(o.tokens),
          s"${io.getClass.getSimpleName} $id")
      }
    }
  }
}
