package graft.engine

/** The engine's row type, fixed by BASELINE.json `input_hint`:
  * one pre-tokenized training sequence. */
final case class SeqRow(
    doc_id: String,
    tokens: Array[Int],
    n_tok: Int,
    source: String)

/** One encoded column chunk: the tokens of `n_rows` consecutive sequences of
  * one partition slice, compressed under one auto-selected codec, plus the
  * framed side metadata needed to reconstruct the rows bit-identically.
  *
  * The reference keeps stream parameters out-of-band (decode with wrong
  * params silently corrupts — `/root/reference/src/ext/_ppmdmodule.c:157-174`);
  * we persist everything in-band: codec id + params live inside `payload`'s
  * framing, row boundaries + strings inside `meta`, integrity in CRCs.
  * This is the "manifest" of SURVEY.md §7 in row form. */
final case class EncodedChunk(
    chunk_id: Long, // (part_id << 32) | seq — deterministic given partitioning
    part_id: Int,
    seq: Int,
    codec: Int,           // graft.codec.CodecId of the token payload
    n_rows: Int,
    n_tokens: Long,
    raw_bytes: Long,      // 4 * n_tokens (the "store" floor)
    enc_bytes: Long,      // payload.length + meta.length
    crc32: Long,          // CRC of payload (duplicated from framing, for SQL)
    min_doc_id: String,   // chunk pruning bounds (zone-map analog)
    max_doc_id: String,
    min_tok: Int,         // token-VALUE bounds: content-predicate pruning
    max_tok: Int,         //   ("chunks that can contain token T") without decode
    tok_set: Array[Byte], // TokenSketch: exact-or-Bloom containment index
    payload: Array[Byte], // framed TokenCodec output over concatenated tokens
    meta: Array[Byte])    // framed side columns: row lens, sources, doc_ids

/** Encoder knobs. Chunk sizing is the bounded-memory policy (analog of the
  * reference's mem_size arena cap, `Ppmd7.h:17-18`): a chunk's working set is
  * ~4B * chunkTokens + strings, so the default 1M tokens keeps every task
  * well under executor memory at any cluster scale. */
final case class EncoderConfig(
    chunkTokens: Int = 1 << 20,
    maxRowsPerChunk: Int = 1 << 16,
    numPartitions: Int = 0) { // 0 = keep upstream partitioning
  require(chunkTokens > 0 && maxRowsPerChunk > 0)
}

/** Lexicographic UNSIGNED byte order over UTF-8 encodings — the order Spark
  * SQL string comparisons use (UTF8String). Java's String.compareTo orders
  * by UTF-16 code units, which DISAGREES for supplementary-plane characters
  * (a surrogate pair sorts below U+E000..U+FFFF in UTF-16 but above in
  * UTF-8). Zone-map doc_id bounds are pruned with Spark column predicates,
  * so the bounds computation and the exact row filters must all use THIS
  * order or an emoji doc_id could be pruned away while the row filter would
  * have kept it. */
object Utf8Order {
  def bytes(s: String): Array[Byte] =
    s.getBytes(java.nio.charset.StandardCharsets.UTF_8)

  def compareBytes(x: Array[Byte], y: Array[Byte]): Int = {
    var i = 0
    val n = math.min(x.length, y.length)
    while (i < n) {
      val c = (x(i) & 0xff) - (y(i) & 0xff)
      if (c != 0) return c
      i += 1
    }
    x.length - y.length
  }

  def compare(a: String, b: String): Int = compareBytes(bytes(a), bytes(b))
  @inline def lt(a: String, b: String): Boolean = compare(a, b) < 0
  @inline def gt(a: String, b: String): Boolean = compare(a, b) > 0
  @inline def lte(a: String, b: String): Boolean = compare(a, b) <= 0
  @inline def gte(a: String, b: String): Boolean = compare(a, b) >= 0

  /** Range predicate with the bound encodings hoisted out of the per-row
    * path: one getBytes per ROW, zero per-bound (a naive gte/lte pair costs
    * four encodes per row on the decode hot path). */
  def inRange(loUtf8: Array[Byte], hiUtf8: Array[Byte])(s: String): Boolean = {
    val b = bytes(s)
    compareBytes(b, loUtf8) >= 0 && compareBytes(b, hiUtf8) <= 0
  }
}

/** Per-source/per-codec rollup row used by reports and SparkEntry queries. */
final case class EncodeReport(
    source: String,
    codec_name: String,
    n_chunks: Long,
    n_rows: Long,
    n_tokens: Long,
    raw_bytes: Long,
    enc_bytes: Long)
