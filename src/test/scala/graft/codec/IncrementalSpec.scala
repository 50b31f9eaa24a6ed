package graft.codec

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen
import graft.GenChecks

/** The reference's incremental-protocol tests recast: chunk-split invariance
  * (test_ppmd7.py:23-28), chunked partial decode with needs_input
  * (test_ppmd7.py:95-166), flush-twice/feed-after-flush guards
  * (_ppmdmodule.c:261-265,868-870), unused_data (365-390). */
class IncrementalSpec extends AnyFunSuite with GenChecks {

  private def tokens(n: Int): Array[Int] =
    Array.tabulate(n)(i => (graft.io.Corpus.mix(5L, i.toLong) >>> 40).toInt % 1000)

  test("split invariance: feeding in k pieces equals one-shot, byte for byte") {
    val data = tokens(30000)
    def encodeSplit(pieces: Seq[Array[Int]]): Array[Byte] = {
      val enc = new IncrementalTokenEncoder(chunkTokens = 8192)
      pieces.foreach(enc.feed)
      enc.flush()
    }
    val oneShot = encodeSplit(Seq(data))
    forAll(Gen.choose(1, 997), trials = 20) { step =>
      val pieces = data.grouped(step).toSeq
      assert(java.util.Arrays.equals(encodeSplit(pieces), oneShot),
        s"split at $step differs")
    }
  }

  test("incremental decode with dribbled input tracks needs_input/eof") {
    val data = tokens(20000)
    val enc = new IncrementalTokenEncoder(chunkTokens = 4096)
    enc.feed(data)
    val stream = enc.flush()
    val trailing = "junk-after-endmark".getBytes
    val full = stream ++ trailing
    val dec = new IncrementalTokenDecoder
    val out = scala.collection.mutable.ArrayBuilder.make[Int]
    full.grouped(1013).foreach { piece =>
      if (!dec.eof) out ++= dec.decode(piece)
      else () // reference raises EOFError on decode-after-eof; we just stop
    }
    assert(dec.eof)
    assert(out.result().sameElements(data))
    assert(new String(dec.unusedData).startsWith("junk") ||
      dec.unusedData.length >= trailing.length - 1013) // tail may be uneaten
  }

  test("guards: feed after flush and flush twice raise") {
    val enc = new IncrementalTokenEncoder(chunkTokens = 4096)
    enc.feed(tokens(10))
    enc.flush()
    intercept[IllegalArgumentException](enc.feed(tokens(1)))
    intercept[IllegalArgumentException](enc.flush())
  }

  test("10k tiny feeds decode in linear time (offset-tracked buffer)") {
    val data = tokens(60000)
    val enc = new IncrementalTokenEncoder(chunkTokens = 1024)
    enc.feed(data)
    val stream = enc.flush() // many small frames
    val dec = new IncrementalTokenDecoder
    val out = scala.collection.mutable.ArrayBuilder.make[Int]
    val t0 = System.nanoTime()
    stream.grouped(math.max(1, stream.length / 10000)).foreach { piece =>
      if (!dec.eof) out ++= dec.decode(piece)
    }
    val sec = (System.nanoTime() - t0) / 1e9
    assert(dec.eof)
    assert(out.result().sameElements(data))
    // O(n^2) re-copying took this into many seconds territory; the
    // offset-tracked buffer keeps 10k feeds comfortably sub-second
    assert(sec < 5.0, f"10k-feed decode took $sec%.1fs - quadratic?")
  }

  test("lying frame (full length present, short contents) is Corrupt, not a stall") {
    // hand-craft a raw-codec frame with a VALID CRC that declares 100 tokens
    // but carries only 10 — the outer varint length is fully satisfied, so
    // "need more input" would stall the stream forever
    def intLE(out: Array[Byte], pos: Int, v: Int): Unit = {
      out(pos) = v.toByte; out(pos + 1) = (v >>> 8).toByte
      out(pos + 2) = (v >>> 16).toByte; out(pos + 3) = (v >>> 24).toByte
    }
    val payloadBytes = 40 // 10 tokens
    val inner = new Array[Byte](TokenCodec.Overhead + payloadBytes)
    inner(0) = TokenCodec.MagicG; inner(1) = TokenCodec.MagicT
    inner(2) = CodecId.Raw
    intLE(inner, 3, 100) // lies: declares 100 tokens
    val crc = new java.util.zip.CRC32
    crc.update(inner, 0, TokenCodec.HeaderLen + payloadBytes)
    intLE(inner, TokenCodec.HeaderLen + payloadBytes, crc.getValue.toInt)
    val stream = Array[Byte](inner.length.toByte) ++ inner // varint len < 128
    val dec = new IncrementalTokenDecoder
    intercept[CorruptException](dec.decode(stream))
  }

  test("text one-shot roundtrip (decompress_str analog)") {
    import graft.sql.GraftFunctions._
    val text = "the quick brown fox ünïcödé 日本語 " * 50
    assert(decompressText(compressText(text)) == text)
    assert(compressText(text).length < text.getBytes("UTF-8").length / 2)
  }
}
