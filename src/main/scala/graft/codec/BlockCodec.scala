package graft.codec

/** Block-composite codec: split the vector at caller-chosen boundaries and
  * auto-select a codec per block (Parquet v2 miniblock spirit). A chunk
  * concatenates many rows of different shapes (runs, narrow windows, zipf,
  * uniform); one whole-chunk codec wastes bits on the mixture — per-block
  * selection adapts at fine grain, which is the lightweight answer to the
  * reference's per-symbol adaptive contexts
  * (`/root/reference/src/lib/ppmd/Ppmd7.c:661-710`).
  *
  * The best split is ROW-ALIGNED: one training sequence has one statistical
  * shape, so blocks that follow row boundaries (merging small rows up to a
  * minimum) are near-homogeneous; fixed 4096 splits are the fallback when no
  * row structure is known.
  *
  * Payload: [varint nBlocks][per block: varint byteLen + full TokenCodec
  * frame of that block]. Inner frames carry their own CRC; the outer frame's
  * CRC covers everything. Blocks never nest (inner codecs are flat).
  * Encode works on slices of the chunk vector — no per-block copies.
  */
object BlockCodec {
  final val BlockLen = 4096   // fixed-split fallback granularity
  final val MinBlockTokens = 256 // merge rows until a block has at least this
  /** Only consider splitting when the vector is at least this long. */
  final val MinTokens = 2 * MinBlockTokens

  /** Block end-offsets for fixed-size splitting. */
  def fixedSplits(n: Int): Array[Int] = {
    val nBlocks = (n + BlockLen - 1) / BlockLen
    Array.tabulate(nBlocks)(b => math.min((b + 1) * BlockLen, n))
  }

  /** Row-aligned block end-offsets: greedily merge consecutive rows until a
    * block holds >= MinBlockTokens tokens (long rows stand alone). */
  def rowSplits(rowLens: Array[Int]): Array[Int] = {
    val out = scala.collection.mutable.ArrayBuilder.make[Int]
    var acc = 0
    var end = 0
    var i = 0
    while (i < rowLens.length) {
      acc += rowLens(i)
      end += rowLens(i)
      if (acc >= MinBlockTokens) { out += end; acc = 0 }
      i += 1
    }
    if (acc > 0) out += end
    out.result()
  }

  def encode(values: Array[Int], splits: Array[Int]): Array[Byte] = {
    val nBlocks = splits.length
    // per-block stats pass gives exact framed lengths -> single allocation
    val stats = new Array[ChunkStats](nBlocks)
    var total = Varint.len(nBlocks.toLong)
    var from = 0
    var b = 0
    while (b < nBlocks) {
      val st = ChunkStats.analyze(values, from, splits(b))
      stats(b) = st
      val framedLen = TokenCodec.Overhead + st.payloadSize(st.bestCodec)
      total += Varint.len(framedLen.toLong) + framedLen
      from = splits(b)
      b += 1
    }
    val out = new Array[Byte](total)
    var pos = Varint.write(out, 0, nBlocks.toLong)
    from = 0
    b = 0
    while (b < nBlocks) {
      val st = stats(b)
      val framedLen = TokenCodec.Overhead + st.payloadSize(st.bestCodec)
      pos = Varint.write(out, pos, framedLen.toLong)
      pos = TokenCodec.encodeInto(st.bestCodec, values, from, splits(b), st,
        out, pos)
      from = splits(b)
      b += 1
    }
    require(pos == total, s"blocks size model mismatch: $pos vs $total")
    out
  }

  def decode(buf: Array[Byte], pos0: Int, limit: Int, n: Int,
             out: Array[Int]): Unit = {
    val r = new Varint.Reader(buf, pos0, limit)
    val nBlocks = r.read().toInt
    if (nBlocks < 0) throw CorruptException("block count")
    var o = 0
    var b = 0
    while (b < nBlocks) {
      val len = r.read().toInt
      if (len < 0 || r.pos + len > limit) throw TruncatedException
      // decode the inner frame in place (no copy); header validated minimally
      // (outer CRC already covered these bytes)
      if (len < TokenCodec.Overhead) throw TruncatedException
      val p = r.pos
      if (buf(p) != TokenCodec.MagicG || buf(p + 1) != TokenCodec.MagicT)
        throw CorruptException("block magic")
      val bn = TokenCodec.readIntLE(buf, p + 3)
      if (bn < 0 || o + bn > n) throw CorruptException("block overrun")
      val codec = buf(p + 2)
      if (codec == CodecId.Blocks) throw CorruptException("nested blocks")
      val inner = new Array[Int](bn)
      TokenCodec.decodeBody(codec, buf, p + TokenCodec.HeaderLen,
        p + len - TokenCodec.CrcLen, bn, inner)
      System.arraycopy(inner, 0, out, o, bn)
      o += bn
      r.pos += len
      b += 1
    }
    if (o != n) throw CorruptException(s"block underrun: $o of $n")
  }
}
