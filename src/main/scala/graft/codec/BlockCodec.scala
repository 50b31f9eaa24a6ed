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
    val bos = new java.io.ByteArrayOutputStream(values.length + 64)
    writeVarint(bos, splits.length.toLong)
    var from = 0
    var b = 0
    while (b < splits.length) {
      val until = splits(b)
      val slice = java.util.Arrays.copyOfRange(values, from, until)
      val framed = TokenCodec.encodeAutoFlat(slice)
      writeVarint(bos, framed.length.toLong)
      bos.write(framed, 0, framed.length)
      from = until
      b += 1
    }
    bos.toByteArray
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
      val framed = java.util.Arrays.copyOfRange(buf, r.pos, r.pos + len)
      r.pos += len
      val vals = TokenCodec.decodeOrThrow(framed)
      if (o + vals.length > n) throw CorruptException("block overrun")
      System.arraycopy(vals, 0, out, o, vals.length)
      o += vals.length
      b += 1
    }
    if (o != n) throw CorruptException(s"block underrun: $o of $n")
  }

  private def writeVarint(bos: java.io.ByteArrayOutputStream, v0: Long): Unit = {
    var v = v0
    while ((v & ~0x7fL) != 0L) { bos.write(((v & 0x7f) | 0x80).toInt); v >>>= 7 }
    bos.write(v.toInt)
  }
}
