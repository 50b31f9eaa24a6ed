package graft

import graft.engine._
import graft.io.Corpus

/** Pure-JVM kernel microbench (no Spark): isolates encode cost per stage.
  * Run: sbt "Test/runMain graft.DriveKernelBench" */
object DriveKernelBench {
  def main(args: Array[String]): Unit = {
    val n = 5000
    val rows = (0L until n.toLong).map(i => Corpus.row(42L, i)).toArray
    val nTokens = rows.map(_.n_tok.toLong).sum
    println(s"rows=$n tokens=$nTokens")

    def time(label: String)(f: => Long): Unit = {
      // warmup
      f
      val t0 = System.nanoTime()
      val bytes = f
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"$label%-22s ${sec}%8.3f s  ${(nTokens / sec / 1e6)}%8.2f Mtok/s  out=$bytes")
    }

    val cfg = EncoderConfig(chunkTokens = 1 << 20)

    time("full chunk pipeline") {
      Encoder.chunkIterator(rows.iterator, 0, cfg).map(_.enc_bytes).sum
    }

    // stage isolation on one big concatenated chunk
    val all = rows.flatMap(_.tokens)
    val lens = rows.map(_.n_tok)
    time("analyze whole") { graft.codec.ChunkStats.analyze(all); 0L }
    time("blocks encode1") {
      val splits = graft.codec.BlockCodec.rowSplits(lens)
      graft.codec.BlockCodec.encode(all, splits).length.toLong
    }
    time("blocks encode") {
      val splits = graft.codec.BlockCodec.rowSplits(lens)
      graft.codec.BlockCodec.encode(all, splits).length.toLong
    }
    time("tokencodec auto") {
      graft.codec.TokenCodec.encodeAuto(all, lens).length.toLong
    }
    time("decode") {
      val enc = graft.codec.TokenCodec.encodeAuto(all, lens)
      val t0 = System.nanoTime()
      val out = graft.codec.TokenCodec.decodeOrThrow(enc)
      out.length.toLong
    }
    // meta path
    val docIds = rows.map(_.doc_id)
    val sources = rows.map(_.source)
    time("fsst docids") {
      graft.codec.Fsst.encode(ChunkBuilder.packStrings(docIds)).length.toLong
    }
    time("chunkbuilder.build") {
      ChunkBuilder.build(0, 0, docIds, sources, all, lens).enc_bytes
    }
  }
}

object DriveKernelBisect {
  def main(args: Array[String]): Unit = {
    val n = 5000
    val rows = (0L until n.toLong).map(i => Corpus.row(42L, i)).toArray
    val nTokens = rows.map(_.n_tok.toLong).sum
    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val a = f
      println(f"$label%-30s ${(System.nanoTime()-t0)/1e9}%8.3f s"); a
    }
    // one giant chunk via iterator
    t("iterator, chunkTokens=Max") {
      Encoder.chunkIterator(rows.iterator, 0,
        EncoderConfig(chunkTokens = Int.MaxValue, maxRowsPerChunk = Int.MaxValue))
        .map(_.enc_bytes).sum
    }
    t("iterator, chunkTokens=1M") {
      Encoder.chunkIterator(rows.iterator, 0,
        EncoderConfig(chunkTokens = 1 << 20)).map(_.enc_bytes).sum
    }
    t("iterator, chunkTokens=1M again") {
      Encoder.chunkIterator(rows.iterator, 0,
        EncoderConfig(chunkTokens = 1 << 20)).map(_.enc_bytes).sum
    }
    // 4 direct builds of ~1M token slices
    t("4 direct builds") {
      val groups = rows.grouped(1300).toArray
      groups.map { g =>
        ChunkBuilder.build(0, 0, g.map(_.doc_id), g.map(_.source),
          g.flatMap(_.tokens), g.map(_.n_tok)).enc_bytes
      }.sum
    }
  }
}
