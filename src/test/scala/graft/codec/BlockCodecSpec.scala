package graft.codec

import org.scalatest.funsuite.AnyFunSuite
import graft.GenChecks
import org.scalacheck.Gen

class BlockCodecSpec extends AnyFunSuite with GenChecks {

  /** mixed-archetype vector: runs ++ narrow ++ uniform ++ sorted — the shape
    * of a real chunk (many rows concatenated). */
  private def mixed(n: Int): Array[Int] = {
    val rng = new scala.util.Random(7)
    val out = new Array[Int](n)
    var i = 0
    while (i < n) {
      val kind = (i / 8192) % 4
      out(i) = kind match {
        case 0 => (i / 64) % 9
        case 1 => 30000 + rng.nextInt(128)
        case 2 => rng.nextInt(50257)
        case 3 => i % 4096
      }
      i += 1
    }
    out
  }

  test("blocks roundtrips and beats single-codec on mixed chunks") {
    val v = mixed(65536)
    val enc = TokenCodec.encodeAuto(v)
    // the entropy wrap may claim the outer frame; the structural choice
    // underneath is still the block composite
    assert(enc(2) == CodecId.Blocks || enc(2) == CodecId.HPack,
      s"got ${CodecId.name(enc(2))}")
    assert(TokenCodec.decodeOrThrow(enc).sameElements(v))
    val stats = ChunkStats.analyze(v)
    val flatBest = stats.payloadSize(stats.bestCodec) + TokenCodec.Overhead
    assert(enc.length < flatBest,
      s"blocks ${enc.length} should beat flat $flatBest")
  }

  test("blocks not used for small vectors") {
    val v = Array.tabulate(1000)(i => i % 7)
    assert(TokenCodec.encodeAuto(v)(2) != CodecId.Blocks)
  }

  test("uniform data does not pay a blocks penalty worth more than overhead") {
    // constant vector: flat RLE is ~optimal; auto must not be much bigger
    val v = Array.fill(65536)(42)
    val enc = TokenCodec.encodeAuto(v)
    assert(enc.length <= 64, s"constant 64k tokens -> ${enc.length} bytes")
    assert(TokenCodec.decodeOrThrow(enc).sameElements(v))
  }

  test("blocks corrupt and truncated are detected") {
    val v = mixed(32768)
    val enc = TokenCodec.encodeAuto(v)
    assert(enc(2) == CodecId.Blocks || enc(2) == CodecId.HPack)
    val bad = enc.clone()
    bad(enc.length / 2) = (bad(enc.length / 2) ^ 0x33).toByte
    assert(TokenCodec.decode(bad).isInstanceOf[Corrupt])
    assert(TokenCodec.decode(java.util.Arrays.copyOf(enc, enc.length / 2))
      match { case Truncated | Corrupt(_) => true; case _ => false })
  }

  test("blocks roundtrip property on random mixtures") {
    val gen = for {
      n <- Gen.choose(BlockCodec.MinTokens, BlockCodec.MinTokens * 3)
      mode <- Gen.choose(0, 3)
    } yield (n, mode)
    forAll(gen, trials = 12) { case (n, mode) =>
      val v = mode match {
        case 0 => mixed(n)
        case 1 => Array.fill(n)(3)
        case 2 => Array.tabulate(n)(identity)
        case _ => { val r = new scala.util.Random(n); Array.fill(n)(r.nextInt()) }
      }
      val enc = TokenCodec.encodeAuto(v)
      assert(TokenCodec.decodeOrThrow(enc).sameElements(v))
      assert(enc.length <= TokenCodec.Overhead + 4 * n + 64)
    }
  }
}
