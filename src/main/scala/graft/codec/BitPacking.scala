package graft.codec

/** Fixed-width bit packing of non-negative Long values (width 0..32).
  *
  * Engine analog of the reference's range-coder bit emission
  * (`/root/reference/src/lib/ppmd/Ppmd7Enc.c:34-55`): where PPMd spends
  * fractional bits per symbol via arithmetic coding, the lightweight path
  * spends exactly `width` bits per value — trading a little density for
  * branch-free vectorizable loops.
  */
object BitPacking {

  /** Bits needed to represent x (x >= 0); 0 for x == 0. */
  def bitsFor(x: Long): Int =
    if (x <= 0L) 0 else 64 - java.lang.Long.numberOfLeadingZeros(x)

  def packedBytes(n: Int, width: Int): Int =
    (((n.toLong * width) + 7) / 8).toInt

  def pack(values: Array[Int], base: Long, width: Int,
           buf: Array[Byte], pos0: Int): Int =
    pack(values, 0, values.length, base, width, buf, pos0)

  /** Pack values(i) - base for i in [from, until) into buf starting at pos0,
    * width bits each. Values must satisfy 0 <= v - base < 2^width. Returns
    * end position. */
  def pack(values: Array[Int], from: Int, until: Int, base: Long, width: Int,
           buf: Array[Byte], pos0: Int): Int = {
    if (width == 0) return pos0
    var acc = 0L      // bits accumulated, LSB-first
    var nbits = 0
    var pos = pos0
    var i = from
    val n = until
    while (i < n) {
      val v = (values(i).toLong - base) & ((1L << width) - 1 | (if (width == 64) -1L else 0L))
      acc |= v << nbits
      nbits += width
      while (nbits >= 8) {
        buf(pos) = acc.toByte
        pos += 1
        acc >>>= 8
        nbits -= 8
        // width can be up to 32 so acc never holds > 39 bits before drain
      }
      i += 1
    }
    if (nbits > 0) {
      buf(pos) = acc.toByte
      pos += 1
    }
    pos
  }

  /** Unpack n values of `width` bits from buf at pos0, adding base.
    * Throws TruncatedException if buf is too short. */
  def unpack(buf: Array[Byte], pos0: Int, limit: Int, n: Int, width: Int,
             base: Long, out: Array[Int], outPos: Int): Int = {
    if (width == 0) {
      java.util.Arrays.fill(out, outPos, outPos + n, base.toInt)
      return pos0
    }
    val need = packedBytes(n, width)
    if (pos0 + need > limit) throw TruncatedException
    val mask = (1L << width) - 1
    var acc = 0L
    var nbits = 0
    var pos = pos0
    var i = 0
    while (i < n) {
      while (nbits < width) {
        acc |= (buf(pos) & 0xffL) << nbits
        pos += 1
        nbits += 8
      }
      out(outPos + i) = ((acc & mask) + base).toInt
      acc >>>= width
      nbits -= width
      i += 1
    }
    pos0 + need
  }
}
