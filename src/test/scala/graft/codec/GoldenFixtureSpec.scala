package graft.codec

import org.scalatest.funsuite.AnyFunSuite

/** Validates the committed exact-bytes fixture golden/rows.json against the
  * live encoder (regenerate CONSCIOUSLY via graft.MakeGolden after framing
  * changes) — the reference's golden-vector layer (test_ppmd7.py:10-19). */
class GoldenFixtureSpec extends AnyFunSuite {

  private def field(line: String, k: String): String = {
    val m = (s""""$k":("?)([^,"}]*)\\1""").r.findFirstMatchIn(line)
    m.map(_.group(2)).getOrElse(fail(s"missing $k in: $line"))
  }

  test("every committed golden row re-encodes to the identical bytes") {
    val text = java.nio.file.Files.readString(
      java.nio.file.Paths.get("golden/rows.json"))
    val entries = text.linesIterator.map(_.trim.stripSuffix(","))
      .filter(_.startsWith("{")).toSeq
    assert(entries.size == graft.MakeGolden.rows.size)
    val byName = graft.MakeGolden.rows.toMap
    entries.foreach { e =>
      val name = field(e, "name")
      val v = byName(name)
      val enc = TokenCodec.encodeAuto(v)
      val hex = enc.map(b => f"${b & 0xff}%02x").mkString
      assert(hex == field(e, "hex"), s"$name: framing changed")
      assert(CodecId.name(enc(2)) == field(e, "codec"), s"$name: codec changed")
      assert(v.length.toString == field(e, "n"))
      // and the committed bytes decode back to the original row
      val bytes = field(e, "hex").grouped(2)
        .map(Integer.parseInt(_, 16).toByte).toArray
      assert(TokenCodec.decodeOrThrow(bytes).sameElements(v), s"$name: decode")
    }
  }
}
