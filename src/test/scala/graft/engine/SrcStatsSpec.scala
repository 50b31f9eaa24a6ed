package graft.engine

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen
import graft.GenChecks

/** The manifest-side per-source stats blob: whatever bytes arrive, decode
  * either returns EXACTLY what encode aggregated or None (meta-read
  * fallback) — never a wrong answer, never an exception. */
class SrcStatsSpec extends AnyFunSuite with GenChecks {

  private def aggregate(sources: Array[String], lens: Array[Int]) =
    sources.zip(lens).groupBy(_._1).map { case (s, a) =>
      (s, a.length.toLong, a.map(_._2.toLong).sum)
    }.toSeq.sortBy(_._1)

  test("encode/decode roundtrips the per-source aggregation (sorted by source)") {
    val srcGen = Gen.oneOf("web", "books", "código", "日本語", "")
    val rowGen = Gen.zip(srcGen, Gen.chooseNum(0, 1 << 20))
    forAll(Gen.listOf(rowGen)) { rows =>
      val sources = rows.map(_._1).toArray
      val lens = rows.map(_._2).toArray
      val blob = SrcStats.encode(sources, lens)
      if (rows.isEmpty) {
        // zero entries is a VALID blob (one varint 0), distinct from the
        // absent-blob "no stats" signal only in that it decodes to Nil
        assert(SrcStats.decode(blob).contains(Seq.empty))
      } else {
        assert(SrcStats.decode(blob).contains(aggregate(sources, lens)))
      }
    }
  }

  test("encode is deterministic and independent of row order") {
    val a = SrcStats.encode(Array("b", "a", "b"), Array(1, 2, 3))
    val b = SrcStats.encode(Array("a", "b", "b"), Array(2, 3, 1))
    assert(java.util.Arrays.equals(a, b))
  }

  test("absent / empty blob decodes to None (meta-read fallback)") {
    assert(SrcStats.decode(null).isEmpty)
    assert(SrcStats.decode(Array.emptyByteArray).isEmpty)
  }

  test("bit flips and truncations fail open (None), never throw or mis-decode") {
    val blob = SrcStats.encode(
      Array("web", "books", "web", "wiki"), Array(10, 20, 30, 40))
    val truth = SrcStats.decode(blob).get
    // every truncation
    (0 until blob.length).foreach { n =>
      val t = java.util.Arrays.copyOf(blob, n)
      val d = SrcStats.decode(t)
      assert(d.isEmpty || d.contains(truth), s"truncation at $n mis-decoded")
    }
    // every single-bit flip: either rejected or decodes to SOME consistent
    // aggregation — we only require no exception and no crash; flips that
    // happen to still parse change the (checksummed-at-a-higher-layer)
    // content, which the manifest CRC story covers elsewhere
    (0 until blob.length * 8).foreach { bit =>
      val t = blob.clone()
      t(bit / 8) = (t(bit / 8) ^ (1 << (bit % 8))).toByte
      SrcStats.decode(t) // must not throw
    }
    // trailing garbage is corrupt, not silently ignored
    assert(SrcStats.decode(blob :+ 0x01.toByte).isEmpty)
  }
}
