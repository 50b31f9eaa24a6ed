package graft.codec

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen
import graft.GenChecks

/** Adversarial complement to HuffmanSpec (TokenCodecSpec.scala): the kernel
  * is load-bearing for every hpack'd chunk and FSST mode-3 block, and the
  * frame-level CRC only screens corruption on the TokenCodec path — these
  * pin its behavior standing alone under truncation and bit damage. */
class HuffmanAdversarialSpec extends AnyFunSuite with GenChecks {

  test("order-1 kernel roundtrips arbitrary byte strings") {
    forAll(Gen.oneOf(
      Gen.listOf(Gen.choose(Byte.MinValue, Byte.MaxValue)).map(_.toArray),
      Gen.listOf(Gen.oneOf('x'.toByte, 'y'.toByte, ' '.toByte)).map(_.toArray),
      Gen.const(Array.fill(3000)('q'.toByte)),
      Gen.const(Array.emptyByteArray)), trials = 120) { (data: Array[Byte]) =>
      val enc = HuffmanO1.encode(data)
      assert(HuffmanO1.decode(enc, 0, enc.length).sameElements(data))
    }
  }

  test("order-1 stage (fsst mode 5) wins on a markov source and roundtrips") {
    // class-conditioned alphabet: strong order-1 structure, no long repeats
    val rng = new graft.io.Corpus.Rng(3L)
    val data = new Array[Byte](100000)
    var prev = 0
    var i = 0
    while (i < data.length) {
      data(i) = (32 + (((prev % 7) * 17 + rng.nextInt(12)) % 64)).toByte
      prev = data(i) & 0xff
      i += 1
    }
    val enc = Fsst.encode(data)
    // an ORDER-1 mode must win (32-class 5/6, or since r3 the full-context
    // wide variant 9, which sees the exact prev byte and codes tighter)
    assert(enc(2) == 5 || enc(2) == 6 || enc(2) == 9, s"mode=${enc(2)}")
    assert(enc.length < Huffman.encode(data).length) // beats order-0
    assert(Fsst.decode(enc).sameElements(data))
    val bad = enc.clone()
    bad(enc.length / 2) = (bad(enc.length / 2) ^ 0x11).toByte
    intercept[Exception](Fsst.decode(bad))
  }

  test("truncation at every boundary throws, never mis-decodes") {
    val data = ("the quick brown fox " * 40).getBytes("UTF-8")
    val enc = Huffman.encode(data)
    var cut = 0
    while (cut < enc.length) {
      val r = try {
        val d = Huffman.decode(enc, 0, cut)
        Some(d)
      } catch {
        case TruncatedException    => None
        case _: CorruptException   => None
      }
      // a successful decode of a truncated buffer must never silently
      // produce the full-length answer from thin air
      r.foreach(d => assert(d.length < data.length || cut == enc.length))
      cut += 1
    }
  }

  test("random single-byte mutations terminate: loud error or sized output") {
    // the kernel's contract under corruption: throw Truncated/Corrupt or
    // return exactly the declared count (the frame-level CRC then catches
    // any silent bit damage) — never hang, never over/under-produce
    val data = ("abcabcababcbcbacbab" * 30).getBytes("UTF-8")
    val enc = Huffman.encode(data)
    val rng = new scala.util.Random(7)
    (1 to 200).foreach { _ =>
      val bad = enc.clone()
      val i = rng.nextInt(bad.length)
      bad(i) = (bad(i) ^ (1 << rng.nextInt(8))).toByte
      try {
        val d = Huffman.decode(bad, 0, bad.length)
        assert(d.length <= (enc.length + data.length) * 8)
      } catch {
        case TruncatedException  => ()
        case _: CorruptException => ()
      }
    }
  }
}
