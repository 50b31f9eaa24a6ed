package graft.codec

import org.scalatest.funsuite.AnyFunSuite

/** Word-level text model (Fsst modes 7/8) + the full-context order-1 coder
  * (HuffmanO1Wide, mode 9 / mode-8 id stage): roundtrip, mode selection,
  * and hostile-input behavior. */
class WordModelSpec extends AnyFunSuite {

  private def mix(z0: Long): Long = {
    var z = z0 ^ 0x9E3779B97F4A7C15L
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z ^ (z >>> 31)
  }

  /** Markov word chain over a small vocabulary — the text shape the word
    * model exists for (documents.parquet is this shape too). */
  private def markovText(nWords: Int, vocab: Int, seed: Long): Array[Byte] = {
    val words = Array.tabulate(vocab)(i => s"w${i}term${i % 7}")
    val sb = new StringBuilder
    var state = 0
    var i = 0
    while (i < nWords) {
      sb.append(words(state))
      sb.append(if (i % 17 == 16) "\n" else " ")
      // skewed transitions: few successors per state
      state = ((mix(seed + i * 31L + state) >>> 33) % 3 + state * 7).toInt % vocab
      i += 1
    }
    sb.toString.getBytes("UTF-8")
  }

  test("word-model modes win on word-structured text and roundtrip exactly") {
    val data = markovText(8000, 40, seed = 7L)
    val enc = Fsst.encode(data)
    assert(enc(2) == 7 || enc(2) == 8, s"mode ${enc(2)} selected")
    assert(java.util.Arrays.equals(Fsst.decode(enc), data))
    // the point of the model: beats the byte-context stack by a wide margin
    assert(enc.length < data.length / 5,
      s"ratio ${enc.length.toDouble / data.length}")
  }

  test("vocab > 256 falls back to mode 7 (TokenCodec id stream)") {
    val data = markovText(12000, 900, seed = 11L)
    val enc = Fsst.encode(data)
    assert(java.util.Arrays.equals(Fsst.decode(enc), data))
    if (enc(2) == 7 || enc(2) == 8)
      assert(enc(2) == 7, "mode 8 requires vocab <= 256")
  }

  test("tokenize is lossless on arbitrary byte mixes") {
    (0 until 20).foreach { t =>
      val n = 1 + (mix(t).toInt & 0x3ff)
      val data = Array.tabulate(n)(i => (mix(t * 1009L + i) & 0xff).toByte)
      val (entries, ids) = WordModel.tokenize(data)
      val back = ids.flatMap(entries(_))
      assert(back.sameElements(data), s"trial $t")
      // classes alternate: adjacent runs never merge
      assert(WordModel.unpackDict(WordModel.packDict(entries))
        .zip(entries).forall { case (a, b) => a.sameElements(b) })
    }
  }

  test("HuffmanO1Wide roundtrips and rejects hostile input") {
    val data = markovText(3000, 30, seed = 3L)
    val enc = HuffmanO1Wide.encode(data)
    assert(java.util.Arrays.equals(
      HuffmanO1Wide.decode(enc, 0, enc.length), data))
    // truncations: never a crash or silent wrong answer, always the taxonomy
    Seq(1, 16, 33, enc.length / 2).foreach { keep =>
      intercept[Exception] {
        val out = HuffmanO1Wide.decode(enc, 0, keep)
        assert(!java.util.Arrays.equals(out, data))
        throw TruncatedException // count "shorter but decoded" as handled
      }
    }
  }

  test("corrupted word-model frames fail closed (CRC or taxonomy)") {
    val data = markovText(6000, 40, seed = 5L)
    val enc = Fsst.encode(data)
    assert(enc(2) == 7 || enc(2) == 8)
    // flip one byte at a spread of positions: CRC must catch every one
    Seq(3, enc.length / 4, enc.length / 2, enc.length - 5).foreach { p =>
      val bad = enc.clone()
      bad(p) = (bad(p) ^ 0x41).toByte
      intercept[Exception](Fsst.decode(bad))
    }
    // truncation
    intercept[Exception](Fsst.decode(java.util.Arrays.copyOf(enc, enc.length / 2)))
  }
}
