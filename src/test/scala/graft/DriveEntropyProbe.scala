package graft

import graft.io.Corpus

/** Offline potential analysis: how far is the current auto-codec from the
  * EMPIRICAL order-0 and order-1 token entropy of the corpus? Decides
  * whether a token-level entropy stage is worth building. */
object DriveEntropyProbe {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toInt).getOrElse(5000)
    val rows = (0L until n.toLong).map(i => Corpus.row(42L, i))
    val toks = rows.flatMap(_.tokens).toArray
    val lens = rows.map(_.n_tok).toArray
    val enc = graft.codec.TokenCodec.encodeAuto(toks, lens)
    // order-0 empirical entropy
    val freq = new java.util.HashMap[Integer, Long]()
    toks.foreach(t => freq.merge(t, 1L, _ + _))
    var h0 = 0.0
    val total = toks.length.toDouble
    freq.values.forEach { c =>
      val p = c / total; h0 -= c * (math.log(p) / math.log(2)) }
    // order-1 empirical entropy (context = previous token), costed only
    // where the context has been seen; first token of each row ctx=-1
    val ctxFreq = new java.util.HashMap[Long, java.util.HashMap[Integer, Long]]()
    var off = 0
    lens.foreach { len =>
      var prev = -1
      var j = 0
      while (j < len) {
        val t = toks(off + j)
        ctxFreq.computeIfAbsent(prev.toLong, _ => new java.util.HashMap())
          .merge(t, 1L, _ + _)
        prev = t
        j += 1
      }
      off += len
    }
    var h1 = 0.0
    ctxFreq.values.forEach { m =>
      var ctxTotal = 0L
      m.values.forEach(c => ctxTotal += c)
      m.values.forEach { c =>
        val p = c.toDouble / ctxTotal
        h1 -= c * (math.log(p) / math.log(2)) }
    }
    val raw = 4.0 * toks.length
    println(f"ENTROPY tokens=${toks.length} distinct=${freq.size} " +
      f"raw=${raw / 1e6}%.1fMB enc=${enc.length / 1e6}%.2fMB (${enc.length / raw}%.4f) " +
      f"H0=${h0 / 8 / 1e6}%.2fMB (${h0 / 8 / raw}%.4f) " +
      f"H1=${h1 / 8 / 1e6}%.2fMB (${h1 / 8 / raw}%.4f, ${ctxFreq.size} ctxs)")
  }
}
