package graft.engine

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestSession
import graft.io.Corpus
import graft.codec.{CodecId, CorruptException}

/** Engine-level tests — the reference suite recast per SURVEY.md §5:
  * roundtrip identity (test_ppmd7.py:56-92), chunk-split invariance
  * (test_ppmd7.py:23-28), threaded equivalence (ThreadDecoder.c), corrupt
  * stream error (-2). */
class EngineSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def corpusMap(n: Long): Map[String, SeqRow] =
    Corpus.table(spark, n, partitions = 4).collect().map(r => r.doc_id -> r).toMap

  test("corpus generation is deterministic across partition counts") {
    val a = Corpus.table(spark, 500, partitions = 1).collect().sortBy(_.doc_id)
    val b = Corpus.table(spark, 500, partitions = 8).collect().sortBy(_.doc_id)
    assert(a.length == b.length)
    a.zip(b).foreach { case (x, y) =>
      assert(x.doc_id == y.doc_id && x.source == y.source &&
        x.tokens.sameElements(y.tokens))
    }
  }

  test("corpus matches FIXTURES spec: schema invariants and source skew") {
    val rows = Corpus.table(spark, 2000, partitions = 4).collect()
    assert(rows.forall(r => r.n_tok == r.tokens.length && r.n_tok >= 1))
    assert(rows.forall(_.tokens.forall(t => t >= 0 && t < Corpus.V)))
    val bySrc = rows.groupBy(_.source).view.mapValues(_.length).toMap
    assert(bySrc("web") > rows.length / 2, s"skew: $bySrc")
    assert(bySrc.keySet == Set("web", "books", "code", "wiki", "forum"))
  }

  test("encode->decode roundtrip is bit-identical per row") {
    val ds = Corpus.table(spark, 1000, partitions = 4)
    val cfg = EncoderConfig(chunkTokens = 8192, numPartitions = 4)
    val chunks = Encoder.encodeTable(ds, cfg).cache()
    val decoded = Decoder.decodeTable(chunks).collect().map(r => r.doc_id -> r).toMap
    val original = corpusMap(1000)
    assert(decoded.keySet == original.keySet)
    original.foreach { case (id, o) =>
      val d = decoded(id)
      assert(d.n_tok == o.n_tok && d.source == o.source &&
        d.tokens.sameElements(o.tokens), s"row $id differs")
    }
    chunks.unpersist()
  }

  test("compressed size beats raw and uses multiple codecs") {
    val ds = Corpus.table(spark, 1000, partitions = 4)
    val chunks = Encoder.encodeTable(ds, EncoderConfig(chunkTokens = 4096,
      numPartitions = 4)).collect()
    val raw = chunks.map(_.raw_bytes).sum
    val enc = chunks.map(_.enc_bytes).sum
    assert(enc < raw, s"enc=$enc raw=$raw")
    val codecs = chunks.map(_.codec).toSet
    assert(codecs.size >= 2, s"expected codec diversity, got $codecs")
  }

  test("chunk-split invariance: 1 vs 7 partitions decode to the same table") {
    val ds = Corpus.table(spark, 600, partitions = 4)
    val one = Decoder.decodeTable(Encoder.encodeTable(ds,
      EncoderConfig(chunkTokens = 2048, numPartitions = 1)))
      .collect().map(r => r.doc_id -> r).toMap
    val seven = Decoder.decodeTable(Encoder.encodeTable(ds,
      EncoderConfig(chunkTokens = 2048, numPartitions = 7)))
      .collect().map(r => r.doc_id -> r).toMap
    assert(one.keySet == seven.keySet)
    one.foreach { case (id, a) =>
      val b = seven(id)
      assert(a.tokens.sameElements(b.tokens) && a.source == b.source)
    }
  }

  test("verifyAgainst returns empty on faithful encode") {
    val ds = Corpus.table(spark, 400, partitions = 2)
    val chunks = Encoder.encodeTable(ds, EncoderConfig(chunkTokens = 4096,
      numPartitions = 2))
    assert(Decoder.verifyAgainst(chunks, ds).count() == 0L)
  }

  test("verifyAgainst detects a mutated row and a missing row") {
    import spark.implicits._
    val rows = (0L until 100L).map(i => Corpus.row(42L, i))
    val ds = spark.createDataset(rows)
    val chunks = Encoder.encodeTable(ds, EncoderConfig(numPartitions = 2))
    // mutate one row's tokens, drop another
    val tampered = rows.map { r =>
      if (r.doc_id == "doc-000000000007")
        r.copy(tokens = r.tokens.updated(0, r.tokens(0) + 1))
      else r
    }.filterNot(_.doc_id == "doc-000000000009")
    val bad = Decoder.verifyAgainst(chunks, spark.createDataset(tampered))
      .collect().sorted
    assert(bad.toSeq == Seq("doc-000000000007", "doc-000000000009"))
  }

  test("corrupt chunk payload fails decode (error -2 analog)") {
    val ds = Corpus.table(spark, 100, partitions = 1)
    val chunks = Encoder.encodeTable(ds, EncoderConfig(numPartitions = 1))
      .collect()
    val c = chunks.head
    val badPayload = c.payload.clone()
    badPayload(badPayload.length / 2) =
      (badPayload(badPayload.length / 2) ^ 0x11).toByte
    val bad = c.copy(payload = badPayload)
    intercept[Exception] {
      Decoder.decodeTable(spark.createDataset(Seq(bad))).collect()
    }
  }

  test("report rolls up per source and codec") {
    val ds = Corpus.table(spark, 500, partitions = 2)
    val chunks = Encoder.encodeTable(ds, EncoderConfig(chunkTokens = 2048,
      numPartitions = 2))
    val rep = Encoder.report(chunks).collect()
    assert(rep.nonEmpty)
    assert(rep.map(_.n_rows).sum == 500L)
    assert(rep.forall(r => r.enc_bytes > 0 && r.n_tokens > 0))
    assert(rep.map(_.source).toSet.subsetOf(
      Set("web", "books", "code", "wiki", "forum")))
  }

  test("chunk builder golden: stable chunk framing for fixed input") {
    val rows = Array(
      SeqRow("doc-a", Array(1, 1, 1, 2, 2), 5, "web"),
      SeqRow("doc-b", Array(7, 8, 9), 3, "books"))
    val chunk = ChunkBuilder.build(0, 0, rows.map(_.doc_id),
      rows.map(_.source), rows.flatMap(_.tokens), rows.map(_.n_tok))
    assert(chunk.n_rows == 2 && chunk.n_tokens == 8)
    assert(chunk.codec == CodecId.Rle.toInt || chunk.codec == CodecId.BitPack.toInt
      || chunk.codec == CodecId.Delta.toInt || chunk.codec == CodecId.Dict.toInt)
    val back = ChunkBuilder.open(chunk).toArray
    assert(back.length == 2)
    assert(back(0).doc_id == "doc-a" && back(0).tokens.sameElements(Array(1, 1, 1, 2, 2)))
    assert(back(1).source == "books" && back(1).tokens.sameElements(Array(7, 8, 9)))
  }
}
