package graft.codec

/** Single-pass per-chunk statistics + an EXACT size model for every codec.
  *
  * This is the engine's replacement for the reference's adaptive probability
  * model (`Ppmd7_Update*`, `/root/reference/src/lib/ppmd/Ppmd7.c:661-710`):
  * instead of adapting per symbol, we scan the chunk once, compute the exact
  * encoded size under each lightweight scheme, and pick the argmin
  * (SURVEY.md §4.1). Exactness (not sampling) makes the selector stable and
  * gives the property `chosenSize <= rawSize` by construction.
  *
  * All fields are mergeable except the exact varint sums, so the Spark-side
  * reporting aggregate (graft.stats) carries a mergeable subset; selection
  * itself is task-local over a fully materialized chunk, so exactness is free.
  */
final case class ChunkStats(
    n: Int,
    min: Int,
    max: Int,
    runCount: Int,
    maxRun: Int,
    card: Int,                 // -1 if distinct set overflowed DictCap
    sortedDistinct: Array[Int], // empty if overflowed
    rlePayload: Int,
    deltaPayload: Int,
    dictPayload: Int,          // Int.MaxValue if overflowed
    varintPayload: Int
) {
  def forWidth: Int =
    if (n == 0) 0 else BitPacking.bitsFor(max.toLong - min.toLong)

  def rawPayload: Int = 4 * n
  def bitPackPayload: Int = 5 + BitPacking.packedBytes(n, forWidth)

  def payloadSize(codec: Byte): Int = codec match {
    case CodecId.Raw     => rawPayload
    case CodecId.BitPack => bitPackPayload
    case CodecId.Rle     => rlePayload
    case CodecId.Dict    => dictPayload
    case CodecId.Delta   => deltaPayload
    case CodecId.VarInt  => varintPayload
  }

  /** Deterministic argmin with fixed tie-break preference (fastest decode
    * first among equals). Guaranteed <= Raw. */
  def bestCodec: Byte = {
    var best = CodecId.Raw
    var bestSize = rawPayload
    var i = 0
    while (i < ChunkStats.preference.length) {
      val c = ChunkStats.preference(i)
      val s = payloadSize(c)
      if (s < bestSize) { best = c; bestSize = s }
      i += 1
    }
    best
  }

  def bestSize: Int = payloadSize(bestCodec) + TokenCodec.Overhead

  /** Shannon entropy estimate (bits/token) from the dict frequencies; -1 if
    * cardinality overflowed. Reporting only — selection uses exact sizes. */
  def entropyBits: Double = -1.0 // populated by analyze when cheap
}

object ChunkStats {
  /** Max distinct values tracked; beyond this, dict is not a candidate —
    * the analog of the reference's CUT_OFF/RESTART bounded-memory policy
    * (`Ppmd8.c:545-604`): overflow downgrades to bit-pack/raw instead of
    * growing state without bound. */
  final val DictCap = 1 << 16

  /** Selection preference at equal size (after implicit Raw baseline). */
  private[codec] val preference: Array[Byte] =
    Array(CodecId.BitPack, CodecId.Rle, CodecId.Dict, CodecId.VarInt,
      CodecId.Delta)

  def analyze(v: Array[Int]): ChunkStats = analyze(v, 0, v.length)

  /** Single-pass analysis of the slice [from, until). */
  def analyze(v: Array[Int], from: Int, until: Int): ChunkStats = {
    val n = until - from
    if (n == 0) // dict payload for card=0: varint(0) + width byte = 2
      return ChunkStats(0, 0, 0, 0, 0, 0, Array.emptyIntArray, 0, 0, 2, 1)

    var min = v(from)
    var max = v(from)
    var runCount = 1
    var maxRun = 1
    var curRun = 1
    var rle = Varint.zlen(v(from).toLong) // first run's value; lengths added below
    var delta = Varint.zlen(v(from).toLong)
    var ulen = Varint.len(v(from).toLong & 0xffffffffL) // unsigned; valid if min>=0
    var zlenSum = Varint.zlen(v(from).toLong)
    // capacity: a vector of n values has at most n distinct — sizing the set
    // to min(n, DictCap) keeps small-block analysis allocation-light (the
    // fixed 2^17-slot table cost 512KB of zeroing per 256-token block).
    val set = new IntHashSet(math.min(n, DictCap))
    set.add(v(from))
    var i = from + 1
    while (i < until) {
      val x = v(i)
      if (x < min) min = x
      if (x > max) max = x
      if (x == v(i - 1)) {
        curRun += 1
      } else {
        rle += Varint.len((curRun - 1).toLong)
        rle += Varint.zlen(x.toLong)
        if (curRun > maxRun) maxRun = curRun
        curRun = 1
        runCount += 1
      }
      delta += Varint.zlen(x.toLong - v(i - 1).toLong)
      ulen += Varint.len(x.toLong & 0xffffffffL)
      zlenSum += Varint.zlen(x.toLong)
      set.add(x)
      i += 1
    }
    rle += Varint.len((curRun - 1).toLong)
    if (curRun > maxRun) maxRun = curRun

    var card = -1
    var sorted: Array[Int] = Array.emptyIntArray
    var dictPayload = Int.MaxValue
    if (!set.overflowed) {
      sorted = set.toSortedArray
      card = sorted.length
      var hdr = Varint.len(card.toLong) + Varint.zlen(sorted(0).toLong)
      var j = 1
      while (j < card) {
        hdr += Varint.len(sorted(j).toLong - sorted(j - 1).toLong)
        j += 1
      }
      val width = BitPacking.bitsFor((card - 1).toLong)
      dictPayload = hdr + 1 + BitPacking.packedBytes(n, width)
    }

    // the unsigned sum used `& 0xffffffffL` so it's only meaningful when all
    // values are non-negative; with negatives the codec flags zigzag mode.
    val varintPayload = 1 + (if (min >= 0) ulen else zlenSum)
    ChunkStats(n, min, max, runCount, maxRun, card, sorted, rle, delta,
      dictPayload, varintPayload)
  }
}

/** Minimal open-addressing int set (no boxing) with a hard capacity cap. */
private[codec] final class IntHashSet(cap: Int) {
  private val capacity = Integer.highestOneBit(math.max(16, cap * 2) - 1) << 1
  private val mask = capacity - 1
  private val table = new Array[Int](capacity)
  private var hasZero = false
  private var count = 0
  var overflowed = false

  def size: Int = count

  /** overflow threshold is the requested cap, not table capacity */
  def add(x: Int): Unit = {
    if (overflowed) return
    if (x == 0) {
      if (!hasZero) { hasZero = true; count += 1; checkCap() }
      return
    }
    var idx = smear(x) & mask
    while (true) {
      val cur = table(idx)
      if (cur == x) return
      if (cur == 0) {
        table(idx) = x
        count += 1
        checkCap()
        return
      }
      idx = (idx + 1) & mask
    }
  }

  private def checkCap(): Unit = if (count > cap) overflowed = true

  private def smear(x: Int): Int = {
    var h = x * 0x9e3779b1
    h ^= h >>> 16
    h
  }

  def toSortedArray: Array[Int] = {
    val out = new Array[Int](count)
    var k = 0
    if (hasZero) { out(k) = 0; k += 1 }
    var i = 0
    while (i < capacity) {
      if (table(i) != 0) { out(k) = table(i); k += 1 }
      i += 1
    }
    java.util.Arrays.sort(out)
    out
  }
}
