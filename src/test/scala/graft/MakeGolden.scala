package graft

import graft.codec._

/** Regenerates golden/rows.json — the exact-bytes regression fixture
  * (FIXTURES.md §A "Golden fixtures", analog of the reference's hard-coded
  * ciphertexts, test_ppmd7.py:10-19). Run CONSCIOUSLY after any framing
  * change: sbt "Test/runMain graft.MakeGolden" */
object MakeGolden {
  def rows: Seq[(String, Array[Int])] = Seq(
    "constant" -> Array.fill(64)(31337),
    "runny" -> Array.tabulate(96)(i => (i / 13) % 5),
    "narrow" -> Array.tabulate(80)(i => 40960 + (i * 37) % 128),
    "zipf" -> Array.tabulate(72)(i => Array(0, 1, 0, 3, 0, 1, 7, 0, 2, 15,
      1, 0, 42, 5, 1, 0, 190, 2, 0, 1, 5000, 3, 1, 0)(i % 24)),
    "hi_entropy" -> Array.tabulate(64)(i =>
      (graft.io.Corpus.mix(7L, i.toLong) >>> 33).toInt % 50257),
    "sorted" -> Array.tabulate(64)(i => i * i),
    "edge_maxval" -> Array(50256, 50256),
    "edge_single_zero" -> Array(0))

  def entryJson(name: String, v: Array[Int]): String = {
    val st = ChunkStats.analyze(v)
    val enc = TokenCodec.encodeAuto(v)
    val hex = enc.map(b => f"${b & 0xff}%02x").mkString
    // CRC32 over a frame that ends with its own CRC32 is the constant
    // residue 558161692 — a whole-frame integrity self-check.
    val crc = {
      val c = new java.util.zip.CRC32; c.update(enc); c.getValue
    }
    s"""{"name":"$name","n":${v.length},"codec":"${CodecId.name(enc(2))}",""" +
    s""""min":${st.min},"max":${st.max},"card":${st.card},""" +
    s""""run_count":${st.runCount},"enc_len":${enc.length},""" +
    s""""crc32_of_frame":$crc,"hex":"$hex"}"""
  }

  def main(args: Array[String]): Unit = {
    val out = rows.map { case (n, v) => "  " + entryJson(n, v) }
      .mkString("[\n", ",\n", "\n]\n")
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get("golden/rows.json"), out)
    println(out)
  }
}
