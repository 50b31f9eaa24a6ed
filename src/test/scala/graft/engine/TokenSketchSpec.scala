package graft.engine

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen
import graft.GenChecks

/** TokenSketch invariants. The one that matters for correctness is NO FALSE
  * NEGATIVES: a sketch that denies a token the chunk actually holds would
  * silently drop rows from decodeContainingToken. False positives only cost
  * a wasted decode; selectivity is asserted statistically for both modes. */
class TokenSketchSpec extends AnyFunSuite with GenChecks {

  private def bounds(toks: Array[Int]): (Int, Int) =
    if (toks.isEmpty) (Int.MaxValue, Int.MinValue) else (toks.min, toks.max)

  private val genVocabToks: Gen[Array[Int]] = // bitmap mode (range <= 2^16)
    Gen.nonEmptyListOf(Gen.choose(0, 50256)).map(_.toArray)

  private val genWideToks: Gen[Array[Int]] = // bloom mode (huge range)
    Gen.nonEmptyListOf(Gen.oneOf(
      Gen.choose(Int.MinValue, Int.MaxValue),
      Gen.choose(-5, 5))).map(_.toArray)

  test("bitmap mode: exact containment (no false negatives, no false positives)") {
    forAll(genVocabToks, trials = 80) { toks =>
      val (lo, hi) = bounds(toks)
      val sk = TokenSketch.build(toks, lo, hi)
      assert(sk.nonEmpty && sk(0) == 1, "vocab-sized range must take bitmap mode")
      val present = toks.toSet
      present.foreach(t => assert(TokenSketch.mightContain(sk, lo, t)))
      // exactness: everything in-range but absent is denied
      var t = lo
      var checked = 0
      while (t <= hi && checked < 2000) {
        if (!present(t)) assert(!TokenSketch.mightContain(sk, lo, t), s"fp at $t")
        t += 1; checked += 1
      }
    }
  }

  test("bloom mode: never a false negative; absent values mostly pruned") {
    forAll(genWideToks, trials = 60) { toks0 =>
      val toks = toks0 ++ Array(Int.MinValue, Int.MaxValue) // force huge range
      val (lo, hi) = bounds(toks)
      val sk = TokenSketch.build(toks, lo, hi)
      assert(sk.nonEmpty && sk(0) == 3, "huge range must take bloom mode")
      toks.foreach(t => assert(TokenSketch.mightContain(sk, lo, t),
        s"FALSE NEGATIVE at $t"))
      val present = toks.toSet
      val probes = (0 until 2000).map(i => 1000000 + i * 7919)
        .filterNot(present)
      val fps = probes.count(t => TokenSketch.mightContain(sk, lo, t))
      // small sets in a >=2KB bloom: fp rate should be far below half
      if (toks.length <= 500)
        assert(fps < probes.size / 2, s"$fps/${probes.size} false positives")
    }
  }

  test("bloom scales with cardinality: 100k-distinct chunk still prunes >=90%") {
    // r3's fixed 2 KB filter was ~100% FP here — zero pruning power
    val toks = Array.tabulate(100000)(i => i * 20011 + 7) // wide, all distinct
    val (lo, hi) = (toks.min, toks.max)
    val sk = TokenSketch.build(toks, lo, hi)
    assert(sk(0) == 3)
    assert(sk.length <= 1 + 5 + TokenSketch.BloomMaxBits / 8)
    toks.foreach(t => assert(TokenSketch.mightContain(sk, lo, t)))
    val present = toks.toSet
    val probes = (0 until 5000).map(i => i * 40009 + 13).filterNot(present)
    val fps = probes.count(t => TokenSketch.mightContain(sk, lo, t))
    assert(fps.toDouble / probes.size <= 0.10,
      s"$fps/${probes.size} false positives — bloom under-sized")
  }

  test("legacy mode-2 sketches (pre-r4 manifests) still read correctly") {
    // replica of the r3 writer: fixed 2 KB, k=4, shift-walk probes
    def legacyBuild(toks: Array[Int]): Array[Byte] = {
      val out = new Array[Byte](1 + TokenSketch.BloomBits / 8)
      out(0) = 2
      toks.foreach { t =>
        var h = legacyMix(t.toLong)
        (0 until TokenSketch.BloomK).foreach { _ =>
          val bit = (h & (TokenSketch.BloomBits - 1)).toInt
          out(1 + (bit >>> 3)) = (out(1 + (bit >>> 3)) | (1 << (bit & 7))).toByte
          h = h >>> 14
        }
      }
      out
    }
    val toks = Array.tabulate(400)(i => i * 104729)
    val sk = legacyBuild(toks)
    toks.foreach(t => assert(TokenSketch.mightContain(sk, toks.min, t),
      s"false negative reading legacy sketch at $t"))
    val present = toks.toSet
    val probes = (0 until 2000).map(i => 500000 + i * 7919).filterNot(present)
    val fps = probes.count(t => TokenSketch.mightContain(sk, toks.min, t))
    assert(fps < probes.size / 2, "legacy decode lost its pruning power")
  }

  // the same splitmix the engine uses (stable format constant)
  private def legacyMix(z0: Long): Long = {
    var z = z0 ^ 0x9E3779B97F4A7C15L
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z ^ (z >>> 31)
  }

  test("empty and unknown sketches never prune") {
    assert(TokenSketch.mightContain(Array.emptyByteArray, 0, 42))
    assert(TokenSketch.mightContain(null, 0, 42))
    assert(TokenSketch.mightContain(Array[Byte](99, 1, 2, 3), 0, 42)) // future mode
    // empty chunk: sketch empty AND inverted min/max sentinels exclude all
    assert(TokenSketch.build(Array.emptyIntArray, Int.MaxValue, Int.MinValue).isEmpty)
  }

  test("truncated/garbled sketches fail OPEN (no crash, no false negative)") {
    val toks = Array.tabulate(500)(i => i * 13 % 4000)
    val bm = TokenSketch.build(toks, toks.min, toks.max)
    assert(bm(0) == 1)
    val wide = TokenSketch.build(toks :+ Int.MaxValue, toks.min, Int.MaxValue)
    assert(wide(0) == 3)
    for (sk <- Seq(bm, wide); keep <- Seq(1, 2, 5, sk.length / 2)) {
      val cut = java.util.Arrays.copyOf(sk, keep)
      toks.foreach { t =>
        // must not throw, and a PRESENT token must never be denied
        assert(TokenSketch.mightContain(cut, toks.min, t),
          s"false negative on truncated sketch (mode ${sk(0)}, keep=$keep, t=$t)")
      }
    }
    // garbled mode-1 range larger than the body: fail open too
    val garbled = bm.clone()
    garbled(1) = 0xFF.toByte; garbled(2) = 0xFF.toByte // blow up the varint
    toks.foreach(t => assert(TokenSketch.mightContain(garbled, toks.min, t)))
  }

  test("chunk-TABLE containment decode: pushdown predicates + sketch prune") {
    val spark = graft.SparkTestSession.spark
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val rows = (0 until 400).map { i =>
      // disjoint per-slice token bands: value bands map to chunk subsets
      val base = (i / 100) * 1000
      SeqRow(f"doc-$i%012d", Array(base + i % 100, base + 500), 2, "s")
    }
    val chunks = Encoder.encodeTable(spark.createDataset(rows),
      EncoderConfig(chunkTokens = 64, numPartitions = 4))
    val path = java.nio.file.Files.createTempDirectory("graft-ctab").toString + "/chunks"
    graft.io.ParquetTableIO.writeChunks(chunks, path)
    val table = graft.io.ParquetTableIO.readChunks(spark, path)
    val probe = 2042 // band 2 only
    val got = Decoder.decodeContainingToken(table, probe).collect()
    val expect = rows.filter(_.tokens.contains(probe)).map(_.doc_id).toSet
    assert(got.map(_.doc_id).toSet == expect && expect.nonEmpty)
    // doc_id-range twin over the same chunk table
    val ranged = Decoder.decodeDocIdRange(table,
      "doc-000000000050", "doc-000000000059").collect()
    assert(ranged.map(_.doc_id).toSet ==
      (50 until 60).map(i => f"doc-$i%012d").toSet)
    // zone-map predicates reach the parquet scan
    val plan = table.filter(col("min_tok") <= probe && col("max_tok") >= probe)
      .queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") && plan.contains("min_tok"),
      s"chunk-table zone predicates not pushed:\n$plan")
  }

  test("sketch roundtrips through the manifest JSON and the chunk frame") {
    val spark = graft.SparkTestSession.spark
    val rows = (0 until 50).map(i =>
      SeqRow(f"doc-$i%012d", Array(i * 3, i * 3 + 1, 40000 + i), 3, "s"))
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-sketch").toString
    Lineage.encodeToDir(spark.createDataset(rows), dir,
      EncoderConfig(chunkTokens = 64, numPartitions = 2))
    val m = Lineage.readManifest(spark, dir).collect()
    assert(m.forall(_.tok_set.nonEmpty))
    // a token in exactly one row: sketch-pruned manifest finds its chunk(s),
    // decode returns exactly that row
    val probe = 40000 + 17
    val got = Lineage.decodeContainingToken(spark, dir, probe).collect()
    assert(got.map(_.doc_id).toSeq == Seq(f"doc-${17}%012d"))
    val pruned = Lineage.manifestForToken(spark, dir, probe).count()
    assert(pruned >= 1L && pruned < m.length.toLong)
  }
}
