package graft.engine

/** Sequence packing — the standard pretraining-data operator that bins
  * variable-length token sequences into fixed-capacity training examples
  * (no document is ever split across bins; greedy sequential first-fit in
  * a deterministic order).
  *
  * Scale shape: packing is a sequential fold, so a global pack of 10^12
  * sequences cannot be one walk. Instead rows are hash-bucketed into
  * groups (a pure function of doc_id, so the grouping is stable across
  * runs and cluster sizes), each group is packed independently inside its
  * partition after a sortWithinPartitions — ONE shuffle, then a streaming
  * single pass per partition with O(one bin) state (groups are never
  * materialized, so a skewed group costs memory proportional to binLen,
  * not to the group). Bins never cross groups, so the result is
  * bit-deterministic regardless of parallelism — the same property the
  * codec's threaded-decode equivalence rests on.
  */
object Pack {

  /** One packed training example: concatenated docs of a single group. */
  final case class PackedBin(
      grp: Long,
      bin: Int,
      doc_ids: Seq[String],
      tokens: Array[Int],
      n_tok: Int,
      pad: Int)

  /** Pack a partition whose rows arrive sorted by (grp, order-key): walk
    * runs of equal grp, greedily filling bins; a bin closes when the next
    * row would overflow it or its group ends. Every row must satisfy
    * n_tok <= binLen (the corpus max is 4096), so every row fits some bin. */
  def packPartition(rows: Iterator[(Long, SeqRow)], binLen: Int): Iterator[Pack.PackedBin] =
    new Iterator[PackedBin] {
      private val it = rows.buffered
      private var prevGrp = 0L
      private var started = false
      private var binIdx = 0
      def hasNext: Boolean = it.hasNext
      def next(): PackedBin = {
        val g = it.head._1
        if (!started || g != prevGrp) { binIdx = 0; prevGrp = g; started = true }
        val ids = Seq.newBuilder[String]
        val toks = scala.collection.mutable.ArrayBuilder.make[Int]
        var used = 0
        var more = true
        while (more && it.hasNext && it.head._1 == g) {
          val n = it.head._2.n_tok
          require(n <= binLen,
            s"row ${it.head._2.doc_id} ($n tokens) exceeds binLen=$binLen")
          if (used + n <= binLen) {
            val r = it.next()._2
            ids += r.doc_id
            toks ++= r.tokens
            used += n
          } else more = false
        }
        val b = PackedBin(g, binIdx, ids.result(), toks.result(), used,
          binLen - used)
        binIdx += 1
        b
      }
    }
}
