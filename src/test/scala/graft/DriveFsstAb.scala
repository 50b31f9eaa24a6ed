package graft

import graft.codec.Fsst
import graft.engine.ChunkBuilder
import graft.io.Corpus

/** A/B sizing for the FSST improvements (strided sampling, second-stage
  * code packing) over a realistic chunk's string sections.
  * Run: sbt "Test/runMain graft.DriveFsstAb <nRows>" */
object DriveFsstAb {
  def main(args: Array[String]): Unit = {
    val n = if (args.nonEmpty) args(0).toInt else 2000
    val rows = (0L until n.toLong).map(i => Corpus.row(42L, i))
    val docBlob = ChunkBuilder.packStrings(rows.map(_.doc_id).toArray)
    val srcBlob = ChunkBuilder.packStrings(
      rows.map(_.source).distinct.toArray)

    def sizes(data: Array[Byte]): (Int, Int, Int) = {
      // old behavior: prefix sample + mode-1 only
      val prefTable = Fsst.train(java.util.Arrays.copyOf(
        data, math.min(data.length, 1 << 14)))
      val prefPacked = Fsst.compressWith(prefTable, data)
      val prefTableLen = 1 + prefTable.symbols.map(_.length + 1).sum
      val old = 7 + prefTableLen + prefPacked.length // header+table+codes+crc
      val now = Fsst.encode(data).length
      (data.length, old, now)
    }
    val (dRaw, dOld, dNow) = sizes(docBlob)
    println(f"FSSTAB doc_ids  raw=$dRaw old=$dOld now=$dNow saved=${100.0 * (dOld - dNow) / dOld}%.1f%%")
    val (sRaw, sOld, sNow) = sizes(srcBlob)
    println(f"FSSTAB sources  raw=$sRaw old=$sOld now=$sNow")
    // roundtrip sanity on the auto path
    require(java.util.Arrays.equals(Fsst.decode(Fsst.encode(docBlob)), docBlob))
    println("FSSTAB roundtrip ok")
  }
}
