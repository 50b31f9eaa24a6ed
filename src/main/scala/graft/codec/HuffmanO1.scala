package graft.codec

/** Order-1 canonical Huffman over a byte stream: each symbol is coded with
  * a table selected by its PRECEDING byte's class (top 5 bits -> 32
  * contexts). This is the static middle ground between the order-0 stage
  * (`Huffman`) and the reference's fully adaptive PPM contexts
  * (`/root/reference/src/lib/ppmd/Ppmd7.c` order-6 trie): two sequential
  * passes, no model state carried between blocks, chunk-parallel — but the
  * per-context code assignment captures most of text's first-order
  * structure (e.g. after a space, word-initial letters are cheap).
  *
  * Format: [u32 LE presentMask over the 32 classes]
  *         [per present class: u8 lo, u8 cntMinus1, nibble-packed lengths]
  *         [varint nSymbols][MSB-first bitstream; ctx of symbol 0 is
  *          class 0 (prev = 0)]
  * Decode is the canonical firstCode walk per class — tiny state, no
  * per-call 32K tables (this codes SIDE text, not the token hot path).
  */
object HuffmanO1 {
  final val NClass = 32
  @inline private def cls(prev: Int): Int = (prev & 0xff) >>> 3

  def encode(data: Array[Byte]): Array[Byte] = {
    val freq = Array.ofDim[Long](NClass, 256)
    var prev = 0
    var i = 0
    while (i < data.length) {
      freq(cls(prev))(data(i) & 0xff) += 1
      prev = data(i)
      i += 1
    }
    val lens = new Array[Array[Int]](NClass)
    val codes = new Array[Array[Int]](NClass)
    var mask = 0
    var c = 0
    while (c < NClass) {
      if (freq(c).exists(_ > 0)) {
        mask |= 1 << c
        lens(c) = Huffman.codeLengths(freq(c))
        codes(c) = Huffman.canonicalCodes(lens(c))
      }
      c += 1
    }
    val bos = new java.io.ByteArrayOutputStream(data.length / 2 + 512)
    bos.write(mask & 0xff); bos.write((mask >>> 8) & 0xff)
    bos.write((mask >>> 16) & 0xff); bos.write((mask >>> 24) & 0xff)
    c = 0
    while (c < NClass) {
      if ((mask & (1 << c)) != 0) {
        val l = lens(c)
        var lo = 0
        while (lo < 255 && l(lo) == 0) lo += 1
        var hi = 255
        while (hi > lo && l(hi) == 0) hi -= 1
        bos.write(lo)
        bos.write(hi - lo)
        var j = lo
        while (j <= hi) {
          val a = l(j)
          val b = if (j + 1 <= hi) l(j + 1) else 0
          bos.write((a << 4) | b)
          j += 2
        }
      }
      c += 1
    }
    var v = data.length.toLong
    while ((v & ~0x7fL) != 0L) { bos.write(((v & 0x7f) | 0x80).toInt); v >>>= 7 }
    bos.write(v.toInt)
    var acc = 0L
    var nBits = 0
    prev = 0
    i = 0
    while (i < data.length) {
      val ctx = cls(prev)
      val s = data(i) & 0xff
      acc = (acc << lens(ctx)(s)) | codes(ctx)(s).toLong
      nBits += lens(ctx)(s)
      while (nBits >= 8) {
        nBits -= 8
        bos.write(((acc >>> nBits) & 0xff).toInt)
      }
      prev = data(i)
      i += 1
    }
    if (nBits > 0) bos.write(((acc << (8 - nBits)) & 0xff).toInt)
    bos.toByteArray
  }

  // ---- shared-model variant -------------------------------------------------
  //
  // The per-chunk frame above pays the 32-class table header every chunk —
  // after front-coding, that header is the dominant FIXED cost of the doc_id
  // meta section. The shared-model variant trains the tables ONCE on a
  // table-level sample (with add-1 smoothing so EVERY byte stays encodable
  // in every context), serializes them out-of-band, and each chunk carries
  // only the bitstream — the static recast of the reference's one-model-
  // many-writes stream mode (`_ppmdmodule.c` Ppmd7Encoder).

  /** 32 classes x 256 nibble-packed code lengths = 4096 bytes, exactly. */
  final val ModelBytes = NClass * 128

  def trainModel(sample: Array[Byte]): Array[Byte] = {
    val freq = Array.ofDim[Long](NClass, 256)
    var c = 0
    while (c < NClass) { // add-1 smoothing: no (context, byte) is unencodable
      var s = 0
      while (s < 256) { freq(c)(s) = 1; s += 1 }
      c += 1
    }
    var prev = 0
    var i = 0
    while (i < sample.length) {
      freq(cls(prev))(sample(i) & 0xff) += 1
      prev = sample(i)
      i += 1
    }
    val out = new Array[Byte](ModelBytes)
    c = 0
    while (c < NClass) {
      val l = Huffman.codeLengths(freq(c))
      var j = 0
      while (j < 256) {
        out(c * 128 + (j >> 1)) = ((l(j) << 4) | l(j + 1)).toByte
        j += 2
      }
      c += 1
    }
    out
  }

  private def modelLens(model: Array[Byte]): Array[Array[Int]] = {
    if (model == null || model.length != ModelBytes)
      throw CorruptException("o1 shared model size")
    Array.tabulate(NClass) { c =>
      val l = new Array[Int](256)
      var j = 0
      while (j < 256) {
        val b = model(c * 128 + (j >> 1)) & 0xff
        l(j) = b >>> 4
        l(j + 1) = b & 0xf
        j += 2
      }
      if (l.exists(_ == 0)) throw CorruptException("o1 shared model incomplete")
      l
    }
  }

  /** Bitstream ONLY (no tables, no count — the caller's envelope carries the
    * byte count as its rawLen). */
  def encodeBitsWithModel(model: Array[Byte], data: Array[Byte]): Array[Byte] = {
    val lens = modelLens(model)
    val codes = lens.map(Huffman.canonicalCodes)
    val bos = new java.io.ByteArrayOutputStream(data.length / 2 + 64)
    var acc = 0L
    var nBits = 0
    var prev = 0
    var i = 0
    while (i < data.length) {
      val ctx = cls(prev)
      val s = data(i) & 0xff
      acc = (acc << lens(ctx)(s)) | codes(ctx)(s).toLong
      nBits += lens(ctx)(s)
      while (nBits >= 8) {
        nBits -= 8
        bos.write(((acc >>> nBits) & 0xff).toInt)
      }
      prev = data(i)
      i += 1
    }
    if (nBits > 0) bos.write(((acc << (8 - nBits)) & 0xff).toInt)
    bos.toByteArray
  }

  def decodeBitsWithModel(model: Array[Byte], bytes: Array[Byte], from: Int,
                          until: Int, count: Int): Array[Byte] = {
    if (count < 0 || count.toLong > (until - from).toLong * 8)
      throw TruncatedException
    val lens = modelLens(model)
    val firstCode = Array.ofDim[Int](NClass, Huffman.MaxLen + 1)
    val symCount = Array.ofDim[Int](NClass, Huffman.MaxLen + 1)
    val symBase = Array.ofDim[Int](NClass, Huffman.MaxLen + 1)
    val symbols = new Array[Array[Int]](NClass)
    var c = 0
    while (c < NClass) {
      val l = lens(c)
      val codes = Huffman.canonicalCodes(l)
      val syms = scala.collection.mutable.ArrayBuilder.make[Int]
      var len = 1
      var base = 0
      while (len <= Huffman.MaxLen) {
        symBase(c)(len) = base
        var s = 0
        var first = Int.MaxValue
        var n = 0
        while (s < 256) {
          if (l(s) == len) {
            if (first == Int.MaxValue) first = codes(s)
            syms += s
            n += 1
          }
          s += 1
        }
        firstCode(c)(len) = first
        symCount(c)(len) = n
        base += n
        len += 1
      }
      symbols(c) = syms.result()
      c += 1
    }
    val out = new Array[Byte](count)
    var p = from
    var acc = 0L
    var nBits = 0
    var prev = 0
    var o = 0
    while (o < count) {
      val ctx = cls(prev)
      var l = 0
      var code = 0
      var decoded = -1
      while (decoded < 0) {
        if (nBits == 0) {
          if (p >= until) throw TruncatedException
          acc = bytes(p) & 0xffL
          p += 1
          nBits = 8
        }
        nBits -= 1
        code = (code << 1) | ((acc >>> nBits) & 1L).toInt
        l += 1
        if (l > Huffman.MaxLen) throw CorruptException("o1 code overrun")
        val fc = firstCode(ctx)(l)
        if (fc != Int.MaxValue && code >= fc && code - fc < symCount(ctx)(l))
          decoded = symbols(ctx)(symBase(ctx)(l) + (code - fc))
      }
      out(o) = decoded.toByte
      prev = decoded
      o += 1
    }
    out
  }

  def decode(bytes: Array[Byte], from: Int, until: Int): Array[Byte] = {
    if (until - from < 5) throw TruncatedException
    val mask = (bytes(from) & 0xff) | ((bytes(from + 1) & 0xff) << 8) |
      ((bytes(from + 2) & 0xff) << 16) | ((bytes(from + 3) & 0xff) << 24)
    var p = from + 4
    // per-class canonical decode state: firstCode/count per length +
    // symbols ordered by (len, symbol)
    val firstCode = Array.ofDim[Int](NClass, Huffman.MaxLen + 1)
    val symCount = Array.ofDim[Int](NClass, Huffman.MaxLen + 1)
    val symBase = Array.ofDim[Int](NClass, Huffman.MaxLen + 1)
    val symbols = new Array[Array[Int]](NClass)
    var c = 0
    while (c < NClass) {
      if ((mask & (1 << c)) != 0) {
        if (p + 2 > until) throw TruncatedException
        val lo = bytes(p) & 0xff
        val cnt = (bytes(p + 1) & 0xff) + 1
        if (lo + cnt > 256) throw CorruptException("o1 alphabet range")
        p += 2
        if (p + (cnt + 1) / 2 > until) throw TruncatedException
        val lens = new Array[Int](256)
        var j = 0
        while (j < cnt) {
          val b = bytes(p) & 0xff
          lens(lo + j) = b >>> 4
          if (j + 1 < cnt) lens(lo + j + 1) = b & 0xf
          j += 2
          p += 1
        }
        val codes = Huffman.canonicalCodes(lens)
        val syms = scala.collection.mutable.ArrayBuilder.make[Int]
        var len = 1
        var base = 0
        while (len <= Huffman.MaxLen) {
          symBase(c)(len) = base
          var s = 0
          var first = Int.MaxValue
          var n = 0
          while (s < 256) {
            if (lens(s) == len) {
              if (first == Int.MaxValue) first = codes(s)
              syms += s
              n += 1
            }
            s += 1
          }
          firstCode(c)(len) = first
          symCount(c)(len) = n
          base += n
          len += 1
        }
        symbols(c) = syms.result()
      }
      c += 1
    }
    var n = 0L
    var shift = 0
    var more = true
    while (more) {
      if (p >= until) throw TruncatedException
      val b = bytes(p) & 0xff
      p += 1
      n |= (b & 0x7fL) << shift
      shift += 7
      more = (b & 0x80) != 0
      if (shift > 42) throw CorruptException("o1 count varint")
    }
    val count = n.toInt
    if (count < 0) throw CorruptException("o1 count")
    if (count > (until - p).toLong * 8) throw TruncatedException
    val out = new Array[Byte](count)
    var acc = 0L
    var nBits = 0
    var prev = 0
    var o = 0
    while (o < count) {
      val ctx = cls(prev)
      if (symbols(ctx) == null) throw CorruptException("o1 missing class")
      var l = 0
      var code = 0
      var decoded = -1
      while (decoded < 0) {
        if (nBits == 0) {
          if (p >= until) throw TruncatedException
          acc = bytes(p) & 0xffL
          p += 1
          nBits = 8
        }
        nBits -= 1
        code = (code << 1) | ((acc >>> nBits) & 1L).toInt
        l += 1
        if (l > Huffman.MaxLen) throw CorruptException("o1 code overrun")
        val fc = firstCode(ctx)(l)
        if (fc != Int.MaxValue && code >= fc && code - fc < symCount(ctx)(l))
          decoded = symbols(ctx)(symBase(ctx)(l) + (code - fc))
      }
      out(o) = decoded.toByte
      prev = decoded
      o += 1
    }
    out
  }
}
