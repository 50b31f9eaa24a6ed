package graft

import graft.codec._

/** Regenerates the committed golden fixtures that pin engine-specific
  * bytes. Run CONSCIOUSLY after any deliberate framing/meta-format change,
  * then commit the fixtures with the code: sbt "Test/runMain graft.MakeGolden"
  *
  *  - golden/rows.json — exact-bytes token-frame regression fixture
  *    (FIXTURES.md §A, analog of the reference's hard-coded ciphertexts,
  *    test_ppmd7.py:10-19); validated by GoldenFixtureSpec.
  *  - golden/codec_histogram_n5000.parquet — per-codec rows of
  *    EngineQueries.codecHistogram at the driver's sf0.01 scale (5,000-row
  *    corpus, FIXED 32-way partitioning => pure function of the corpus);
  *    read by the DuckDB oracle twin and validated in-suite by
  *    CodecHistogramFixtureSpec. Written as ONE parquet FILE — the twin's
  *    read_parquet targets the bare path. */
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
    writeCodecHistogram("/root/repo/golden/codec_histogram_n5000.parquet")
  }

  def writeCodecHistogram(target: String): Unit = {
    import org.apache.spark.sql.SaveMode
    import org.apache.spark.sql.functions.col
    val spark = SparkTestSession.spark
    val df = graft.queries.EngineQueries
      .codecHistogram(spark, "/root/testdata/sf0.01")
      .filter(col("codec") =!= "_total")
      .orderBy(col("codec"))
      .coalesce(1)
    val tmp = java.nio.file.Files.createTempDirectory("graft-golden").toString
    df.write.mode(SaveMode.Overwrite).parquet(tmp)
    val part = new java.io.File(tmp).listFiles()
      .find(f => f.getName.startsWith("part-") && f.getName.endsWith(".parquet"))
      .getOrElse(sys.error(s"no part file written under $tmp"))
    java.nio.file.Files.move(part.toPath, java.nio.file.Paths.get(target),
      java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    println(s"wrote $target")
  }
}
