package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.engine._
import graft.io.Corpus

/** The engine's own operators exposed as driver queries (SURVEY.md §2
  * Table A): whole-table encode, decode, roundtrip verification, codec
  * selection histogram. Not SQL-expressible — covered by the rows-only
  * check plus the family-A ScalaTest suite (FIXTURES.md). */
object EngineQueries {

  /** Fingerprint of the corpus-generation + encode path, computed once per
    * JVM: CRC32 over a canary chunk built driver-side from 8 Corpus rows
    * through the real ChunkBuilder. Any change to row generation, the codec
    * selector, framing, or meta encoding changes this value — scratch
    * encodes keyed on it can never be silently reused across code versions. */
  lazy val codeFingerprint: String = {
    val rows = (0L until 8L).map(i => Corpus.row(42L, i))
    val c = ChunkBuilder.build(0, 0, rows.map(_.doc_id).toArray,
      rows.map(_.source).toArray, rows.flatMap(_.tokens).toArray,
      rows.map(_.n_tok).toArray)
    val crc = new java.util.zip.CRC32
    crc.update(c.payload)
    crc.update(c.meta)
    // manifest-side stats participate too: a SrcStats format change must
    // rotate the scratch dir, not resume a stats-less prior manifest
    crc.update(c.src_stats)
    java.lang.Long.toHexString(crc.getValue)
  }

  /** Synthetic-corpus rows for a data dir, derived from the dir's ACTUAL
    * documents-table row count (parquet footer metadata — O(files), no
    * Spark job) at 10 corpus rows per document: sf0.01 has 500 docs -> the
    * 5,000-row corpus every oracle fixture pins; sf0.1 has 5,000 -> 50,000.
    * Keying on data instead of the dir NAME means an arbitrarily named
    * corpus dir works (VERDICT r3 missing #4); the sf-name convention
    * remains only as a fallback for dirs without a documents table, then a
    * 2,000-row default. (sf0.001 ships the same 500-doc table as sf0.01, so
    * both map to the 5,000-row corpus — the smoke run now exercises exactly
    * the correctness-gate scale.) */
  def rowsForDir(dir: String): Long = {
    val cached = rowsCache.get(dir)
    if (cached != null) cached.longValue()
    else {
      val v: Long = graft.io.TableMeta.parquetRowCount(s"$dir/documents.parquet")
        .map(n => math.max(200L, 10L * n))
        .orElse("""sf([0-9.]+)""".r.findFirstMatchIn(dir)
          .map(g => math.max(200L, (g.group(1).toDouble * 500000).toLong)))
        .getOrElse(2000L)
      rowsCache.putIfAbsent(dir, java.lang.Long.valueOf(v))
      v
    }
  }

  // per-session memo: operators call rowsForDir several times per query and
  // the footer listing is I/O; a corpus dir's size changing MID-session is
  // outside the resume/oracle contract anyway (dirs are treated immutable)
  private val rowsCache =
    new java.util.concurrent.ConcurrentHashMap[String, java.lang.Long]()

  /** encodeRoundtrip's config: numPartitions = 0 — partition-LOCAL encode,
    * no arrange shuffle. The corpus generator already emits a fixed
    * deterministic partitioning, and every output column of the roundtrip
    * (per-source sums, mismatch count) is partitioning-invariant, so the
    * one repartition the arranged path pays (the entire token payload
    * through an exchange) buys nothing here. This is the same
    * at-scale-input-already-placed configuration the bench headline uses;
    * paths that need resume-stable membership (Lineage) keep explicit
    * partition counts. */
  private def cfgFor(s: SparkSession): EncoderConfig =
    EncoderConfig(chunkTokens = 1 << 18, numPartitions = 0)

  /** Full pipeline: synthesize corpus -> encode -> decode -> verify ->
    * per-source rollup with roundtrip mismatch count (must be 0).
    *
    * Oracled: every output column is spec-derivable — the DuckDB twin
    * recomputes n_rows/n_tokens/raw_bytes from the materialized corpus
    * parquet (identical bytes, see CorpusTable) and pins mismatches = 0,
    * which hash-checks the north-rule bit-identical roundtrip through the
    * hard channel. Compressed sizes are engine-specific and live in
    * codec_histogram + bench.json instead. */
  def encodeRoundtrip(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val ds = Corpus.table(s, rowsForDir(dir),
      partitions = s.sparkContext.defaultParallelism).cache()
    val chunks = Encoder.encodeTable(ds, cfgFor(s)).cache()
    val rep = Encoder.report(chunks)
      .groupBy(col("source"))
      .agg(sum("n_rows").as("n_rows"), sum("n_tokens").as("n_tokens"),
        sum("raw_bytes").as("raw_bytes"))
    val mism = Decoder.verifyAgainst(chunks, ds)
      .toDF("doc_id")
      .agg(count(lit(1)).as("mismatches"))
    rep.crossJoin(broadcast(mism)).orderBy(col("source"))
  }

  /** Twin over the materialized corpus (valid at the driver's sf0.01 run,
    * where rowsForDir = 5000 = the materialized row count). */
  val encodeRoundtripSql: String =
    """SELECT source, count(*) AS n_rows, CAST(sum(n_tok) AS BIGINT) AS n_tokens,
      |  CAST(4 * sum(n_tok) AS BIGINT) AS raw_bytes,
      |  CAST(0 AS BIGINT) AS mismatches
      |FROM read_parquet('/root/repo/data/oracle/corpus_n5000.parquet/*.parquet')
      |GROUP BY source ORDER BY source""".stripMargin

  /** Codec-selection histogram over the encoded chunk table, splitting the
    * token payload from the side metadata (doc_ids/sources/lens) so the
    * tokens-only ratio is directly comparable to the PPMd reference (whose
    * number covers tokens only).
    *
    * Oracled (was rows-only in r1/r2): the encode is byte-deterministic
    * given a FIXED partition count (proven by LineageSpec/ScalingBench), so
    * with numPartitions pinned at 32 the whole histogram is a pure function
    * of the corpus — per-codec rows are pinned as a golden fixture, and the
    * appended '_total' row carries n_tokens/raw_bytes that the DuckDB twin
    * recomputes from the materialized corpus parquet (the hard channel: a
    * drift in the engine's token/byte accounting breaks the compare even
    * though compressed sizes are engine-specific). */
  def codecHistogram(s: SparkSession, dir: String): DataFrame = {
    val ds = Corpus.table(s, rowsForDir(dir),
      partitions = s.sparkContext.defaultParallelism)
    // fixed partitioning (NOT defaultParallelism): chunk membership, and so
    // the histogram, must not depend on the host's core count
    val chunks = Encoder.encodeTable(ds,
      EncoderConfig(chunkTokens = 1 << 18, numPartitions = 32))
    import s.implicits._
    val perChunk = chunks.map(c =>
        (graft.codec.CodecId.name(c.codec.toByte), c.n_tokens,
          c.raw_bytes, c.payload.length.toLong, c.meta.length.toLong))
      .toDF("codec", "n_tokens", "raw_bytes", "payload_bytes", "meta_bytes")
    // per-codec rows AND the grand total from ONE aggregation pass
    // (ROLLUP's grouping-set total row, codec=null, IS the old "_total"
    // union branch) — the encode feeds a single aggregate instead of being
    // read twice through a cache
    perChunk.rollup(col("codec"))
      .agg(count(lit(1)).as("n_chunks"),
        sum("n_tokens").as("n_tokens"),
        sum("raw_bytes").as("raw_bytes"),
        sum("payload_bytes").as("payload_bytes"),
        sum("meta_bytes").as("meta_bytes"))
      .withColumn("payload_ratio",
        round(col("payload_bytes") / col("raw_bytes"), 4))
      .withColumn("codec", coalesce(col("codec"), lit("_total")))
      .orderBy(col("codec"))
  }

  /** Twin: per-codec rows from the pinned fixture (engine-specific sizes,
    * deterministic under the fixed partitioning), '_total' n_tokens and
    * raw_bytes recomputed from the corpus by DuckDB, byte sums from the
    * fixture. Valid at the driver's sf0.01 run (5000 rows). */
  val codecHistogramSql: String =
    """WITH f AS (
      |  SELECT * FROM read_parquet('/root/repo/golden/codec_histogram_n5000.parquet')),
      |c AS (
      |  SELECT CAST(sum(n_tok) AS BIGINT) AS n_tokens
      |  FROM read_parquet('/root/repo/data/oracle/corpus_n5000.parquet/*.parquet'))
      |SELECT codec, n_chunks, n_tokens, raw_bytes, payload_bytes, meta_bytes,
      |  payload_ratio
      |FROM f
      |UNION ALL
      |SELECT '_total',
      |  CAST((SELECT sum(n_chunks) FROM f) AS BIGINT), c.n_tokens,
      |  CAST(4 * c.n_tokens AS BIGINT),
      |  CAST((SELECT sum(payload_bytes) FROM f) AS BIGINT),
      |  CAST((SELECT sum(meta_bytes) FROM f) AS BIGINT),
      |  round((SELECT sum(payload_bytes) FROM f) * 1.0 / (4 * c.n_tokens), 4)
      |FROM c
      |ORDER BY codec""".stripMargin

  /** Encode the driver's documents table: deterministic whitespace+hash
    * tokenizer -> SeqRow -> encode -> decode -> verify; per-source summary.
    * Exercises the engine against non-synthetic data. */
  def encodeDocs(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val docs = s.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id").cast("string").as("doc_id"), col("text"),
        col("source"))
      .as[(String, String, String)]
      .map { case (id, text, src) =>
        val toks = Tokenize.wordIds(text)
        SeqRow(id, toks, toks.length, src)
      }.cache()
    val chunks = Encoder.encodeTable(docs,
      EncoderConfig(chunkTokens = 1 << 16, numPartitions = 4)).cache()
    val mism = Decoder.verifyAgainst(chunks, docs)
      .toDF("doc_id").agg(count(lit(1)).as("mismatches"))
    chunks.groupBy()
      .agg(sum("n_rows").as("n_rows"),
        sum("n_tokens").as("n_tokens"), sum("raw_bytes").as("raw_bytes"))
      .crossJoin(broadcast(mism))
  }

  /** Twin: the toy tokenizer yields one token per single-space-separated
    * word (documents are synthetic single-spaced; the same formula backs
    * the already-oracled doc_token_count), so n_tokens is SQL-computable
    * and mismatches pins the decode∘encode identity on real text-derived
    * token arrays. */
  val encodeDocsSql: String =
    """SELECT count(*) AS n_rows,
      |  CAST(sum(length(text) - length(replace(text, ' ', '')) + 1) AS BIGINT)
      |    AS n_tokens,
      |  CAST(4 * sum(length(text) - length(replace(text, ' ', '')) + 1) AS BIGINT)
      |    AS raw_bytes,
      |  CAST(0 AS BIGINT) AS mismatches
      |FROM documents""".stripMargin

  /** Per-source token statistics via the mergeable Aggregator (partial +
    * final combine; the selector's stats pass as a Spark aggregate). Reads
    * the MATERIALIZED corpus parquet so the DuckDB oracle twin sees the
    * identical bytes (and cross-checks the distributed merge against
    * independently computed per-row run columns). */
  def tokenStats(s: SparkSession, dir: String): DataFrame = {
    val agg = org.apache.spark.sql.functions.udaf(new graft.stats.TokenStatsAgg)
    graft.io.CorpusTable.table(s, math.min(rowsForDir(dir), 10000L))
      .groupBy(col("source"))
      .agg(agg(col("tokens")).as("stats"))
      .select(col("source"), col("stats.n_rows"), col("stats.n_tokens"),
        col("stats.min"), col("stats.max"), col("stats.run_count"),
        col("stats.max_run"), col("stats.distinct"),
        round(col("stats.mean_run"), 3).as("mean_run"))
      .orderBy(col("source"))
  }

  /** Exact distinct tokens per source with explicit SALTING for the skewed
    * key (70% of rows are source="web"): tokens are exploded, salted by
    * pmod(xxhash64(token), 64) — each distinct token lands in exactly one
    * (source, salt) bucket, so bucket-level exact distincts SUM to the exact
    * per-source distinct. The hot source's state is spread over 64 reducers
    * instead of one; at 10^12 rows this is the difference between one
    * 100GB-state reducer and 64 bounded ones. */
  def sourceDistinctTokens(s: SparkSession, dir: String): DataFrame = {
    val ds = graft.io.CorpusTable.table(s, math.min(rowsForDir(dir), 20000L))
    val exploded = ds
      .select(col("source"), explode(col("tokens")).as("token"))
      .withColumn("salt", pmod(xxhash64(col("token")), lit(64)))
    exploded
      .groupBy(col("source"), col("salt"))
      .agg(countDistinct(col("token")).as("d"))
      .groupBy(col("source"))
      .agg(sum(col("d")).as("distinct_tokens"))
      .orderBy(col("source"))
  }

  /** Approximate distinct (HyperLogLog++, rsd 1%) beside the exact salted
    * variant: at 10^12 rows the exact path costs a full shuffle of distinct
    * tokens while the sketch is a fixed few-KB state per group — the
    * standard accuracy/cost dial. Rows-only (approximate by construction);
    * QueriesSpec pins it within 5% of the exact answer. */
  def sourceApproxDistinctTokens(s: SparkSession, dir: String): DataFrame = {
    graft.io.CorpusTable.table(s, math.min(rowsForDir(dir), 20000L))
      .select(col("source"), explode(col("tokens")).as("token"))
      .groupBy(col("source"))
      .agg(approx_count_distinct(col("token"), 0.01)
        .as("approx_distinct_tokens"))
      .orderBy(col("source"))
  }

  /** Catalyst-expression surface: encode/decode as columns (whole-stage
    * codegen'd), verifying the roundtrip inside one SQL plan. The A1/A2
    * one-shot API exercised at table scale. Oracled: the DuckDB twin
    * recomputes n_rows/raw_bytes from the same parquet and pins
    * mismatches = 0 — a roundtrip-correctness check through the hard
    * channel. (Compressed sizes live in codec_histogram; they are
    * engine-specific and deliberately not oracled.) */
  def encodeExpr(s: SparkSession, dir: String): DataFrame = {
    import graft.sql.GraftFunctions._
    val ds = graft.io.CorpusTable.table(s, math.min(rowsForDir(dir), 5000L))
    ds.select(col("source"), col("tokens"),
        encode_tokens(col("tokens")).as("enc"))
      .withColumn("back", decode_tokens(col("enc")))
      .groupBy(col("source"))
      .agg(
        count(lit(1)).as("n_rows"),
        sum(expr("4 * size(tokens)")).as("raw_bytes"),
        sum(when(expr("tokens <=> back"), lit(0)).otherwise(lit(1)))
          .as("mismatches"))
      .orderBy(col("source"))
  }

  val encodeExprSql: String =
    """SELECT source, count(*) AS n_rows,
      |  CAST(sum(4 * len(tokens)) AS BIGINT) AS raw_bytes,
      |  CAST(0 AS BIGINT) AS mismatches
      |FROM read_parquet('/root/repo/data/oracle/corpus_n5000.parquet/*.parquet')
      |GROUP BY source ORDER BY source""".stripMargin

  val tokenStatsSql: String =
    """WITH c AS (
      |  SELECT * FROM read_parquet('/root/repo/data/oracle/corpus_n5000.parquet/*.parquet')),
      |flat AS (SELECT source, unnest(tokens) AS tok FROM c),
      |per_tok AS (
      |  SELECT source, count(DISTINCT tok) AS "distinct",
      |         min(tok) AS "min", max(tok) AS "max"
      |  FROM flat GROUP BY source),
      |per_row AS (
      |  SELECT source, count(*) AS n_rows, CAST(sum(n_tok) AS BIGINT) AS n_tokens,
      |         CAST(sum(row_runs) AS BIGINT) AS run_count,
      |         CAST(max(row_max_run) AS BIGINT) AS max_run
      |  FROM c GROUP BY source)
      |SELECT r.source, r.n_rows, r.n_tokens, t."min", t."max", r.run_count,
      |  r.max_run, t."distinct",
      |  round(CAST(r.n_tokens AS DOUBLE) / r.run_count, 3) AS mean_run
      |FROM per_row r JOIN per_tok t USING (source) ORDER BY source""".stripMargin

  val sourceDistinctTokensSql: String =
    """SELECT source, count(DISTINCT tok) AS distinct_tokens
      |FROM (SELECT source, unnest(tokens) AS tok
      |      FROM read_parquet('/root/repo/data/oracle/corpus_n5000.parquet/*.parquet'))
      |GROUP BY source ORDER BY source""".stripMargin

  /** Lineage roundtrip as a query: encode to a scratch dir, resume (no-op),
    * decode back, report counts — the A22 unconsumed-input analog.
    *
    * Oracled: n_tokens/decoded_rows/expected_rows are recomputed by DuckDB
    * from the materialized corpus; partitions_first_run is the configured
    * partition count (spec constant) and partitions_resumed_run = 0 pins
    * the resume-skips-everything contract through the hard channel. */
  def lineageRoundtrip(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val n = math.min(rowsForDir(dir), 5000L)
    val ds = Corpus.table(s, n, partitions = 4)
    // STABLE fingerprint-keyed scratch (same pattern as scratchGraftTable):
    // repeated bench/driver runs reuse ONE dir instead of growing /tmp
    // without bound. Truncated up front so "first run encodes everything,
    // resume skips everything" stays true — the contract the oracle pins.
    val out =
      s"${sys.props("java.io.tmpdir")}/graft_lineage_q_n${n}_v${EngineQueries.codeFingerprint}"
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(out))
    val cfg = EncoderConfig(chunkTokens = 1 << 17, numPartitions = 4)
    val first = Lineage.encodeToDir(ds, out, cfg)
    val resumed = Lineage.encodeToDir(ds, out, cfg) // must skip everything
    val decoded = Lineage.decodeFromDir(s, out).count()
    val manifest = Lineage.readManifest(s, out)
    manifest.agg(sum("n_tokens").as("n_tokens"))
      .withColumn("partitions_first_run", lit(first))
      .withColumn("partitions_resumed_run", lit(resumed))
      .withColumn("decoded_rows", lit(decoded))
      .withColumn("expected_rows", lit(n))
  }

  /** The DSv2 `format("graft")` source through the hard channel: encode the
    * corpus to a lineage dir (shared meta dictionary and all), read it back
    * as a first-class Spark source, and roll up per source WITHOUT selecting
    * tokens — the column-pruned path, which decodes only the few-KB meta
    * sections and never touches a compressed payload. Oracled: DuckDB
    * recomputes the identical rollup (counts, token sums, id bounds) from
    * the materialized corpus parquet. */
  /** ONE copy of the scratch-encode preamble both graft_source queries
    * share: corpus -> fingerprint-keyed tmp encode (resume on re-runs) ->
    * DSv2 read. The scratch path is keyed by (n, code fingerprint): the
    * first call encodes, every later one (bench re-runs, repeated
    * sessions) RESUMES and pays only the manifest check — never an
    * unbounded pile of temp copies. The fingerprint is a driver-side
    * canary encode of a few Corpus rows through the real chunk builder, so
    * a corpus-generation or encoder change in a later build changes the
    * path and re-encodes instead of silently resuming a stale prior
    * version's output. */
  private def scratchGraftDir(s: SparkSession, dir: String): String = {
    import s.implicits._
    val n = math.min(rowsForDir(dir), 5000L)
    val ds = graft.io.CorpusTable.table(s, n)
      .select(col("doc_id"), col("tokens"), col("n_tok"), col("source"))
      .as[SeqRow]
    val out =
      s"${sys.props("java.io.tmpdir")}/graft_source_q_n${n}_v${EngineQueries.codeFingerprint}"
    Lineage.encodeToDir(ds, out,
      EncoderConfig(chunkTokens = 1 << 17, numPartitions = 4))
    out
  }

  private def scratchGraftTable(s: SparkSession, dir: String): DataFrame =
    s.read.format("graft").load(scratchGraftDir(s, dir))

  def graftSource(s: SparkSession, dir: String): DataFrame = {
    scratchGraftTable(s, dir)
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_rows"),
        sum(col("n_tok").cast("long")).as("n_tokens"),
        min(col("doc_id")).as("min_doc_id"),
        max(col("doc_id")).as("max_doc_id"))
      .orderBy(col("source"))
  }

  /** The DSv2 source's MANIFEST-ONLY aggregate pushdown through the hard
    * channel: a global count/min/max/sum over the graft table answers from
    * chunk framing rows alone — zero chunks opened (GraftPushdownSpec pins
    * the plan shape; here DuckDB pins the VALUES against the same corpus).
    * Uses spark.sql so count(*) reaches the source as CountStar. */
  def graftSourceStats(s: SparkSession, dir: String): DataFrame = {
    scratchGraftTable(s, dir).createOrReplaceTempView("graft_stats_t")
    s.sql(
      """SELECT count(*) AS n_rows, min(doc_id) AS min_doc_id,
        |  max(doc_id) AS max_doc_id, sum(n_tok) AS n_tokens
        |FROM graft_stats_t""".stripMargin)
  }

  /** The r6 MANIFEST-ONLY GROUPED aggregate through the hard channel:
    * `GROUP BY source` count/sum answers from the manifest's per-chunk
    * SrcStats blobs — zero chunk opens AND zero meta reads
    * (GraftPushdownSpec pins the plan + fallback counter; here DuckDB
    * pins the VALUES against the same corpus). spark.sql so count(*)
    * reaches the source as CountStar. */
  def graftSourceGroup(s: SparkSession, dir: String): DataFrame = {
    scratchGraftTable(s, dir).createOrReplaceTempView("graft_group_t")
    s.sql(
      """SELECT source, count(*) AS n_rows, sum(n_tok) AS n_tokens
        |FROM graft_group_t GROUP BY source ORDER BY source""".stripMargin)
  }

  /** The r6 CATALOG path through the hard channel: register a
    * `GraftCatalog`, CREATE an external named table over the scratch
    * lineage dir, and roll up through `spark.table("name")` — proving a
    * pipeline consumer needs only the NAME (the ergonomic analog of the
    * reference being importable as `import pyppmd`, not by file path;
    * README.rst:30-48). The rollup rides the same manifest-only grouped
    * scan as `graft_source_group` (GraftCatalogSpec pins the plan shape
    * behind the name); DuckDB pins the values from the materialized
    * corpus. The catalog root is fingerprint-keyed like the data scratch,
    * so code changes rotate both together and re-runs reuse one root. */
  def graftCatalog(s: SparkSession, dir: String): DataFrame = {
    val out = scratchGraftDir(s, dir)
    val root =
      s"${sys.props("java.io.tmpdir")}/graft_cat_q_v${EngineQueries.codeFingerprint}"
    s.conf.set("spark.sql.catalog.graftq", classOf[graft.spark.GraftCatalog].getName)
    s.conf.set("spark.sql.catalog.graftq.root", root)
    s.sql("CREATE NAMESPACE IF NOT EXISTS graftq.q")
    s.sql(s"CREATE TABLE IF NOT EXISTS graftq.q.corpus USING graft LOCATION '$out'")
    s.sql(
      """SELECT source, count(*) AS n_rows, sum(n_tok) AS n_tokens,
        |  min(doc_id) AS min_doc_id, max(doc_id) AS max_doc_id
        |FROM graftq.q.corpus GROUP BY source ORDER BY source""".stripMargin)
  }

  // same rollup, same corpus — the oracle is shared with graft_source
  // (def, not val: graftSourceSql is declared later in this object)
  def graftCatalogSql: String = graftSourceSql

  /** The r6 STORAGE-PARTITIONED JOIN through the hard channel: two graft
    * tables arranged with the same bucket count (the `_graft_buckets`
    * layout marker — see Lineage.writeBucketMarker) join on doc_id with
    * ZERO join-side exchanges, because the scan reports
    * KeyGroupedPartitioning over the catalog-served `bucket(n, doc_id)`
    * function (GraftBucketFunction — byte-identical to the hash the writer
    * laid rows out by). The query REQUIRES the shuffle-free plan in-line
    * (the one surviving exchange is the GROUP BY's), so a silent SPJ
    * regression fails the driver run loudly instead of shuffling quietly;
    * DuckDB pins the VALUES with a self-join over the same corpus. The
    * reference analog is threaded decode agreeing with one-shot decode
    * byte-for-byte (`tests/test_ppmd7.py:54-69`): partition-parallel
    * execution must be invisible to results. */
  def graftSpj(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val n = math.min(rowsForDir(dir), 5000L)
    val ds = graft.io.CorpusTable.table(s, n)
      .select(col("doc_id"), col("tokens"), col("n_tok"), col("source"))
      .as[SeqRow]
    val N = 8 // shared bucket count: both writers arrange by pmod(h(doc_id), 8)
    // fingerprint-keyed scratch (resume on re-runs, rotates with the code);
    // the prefix is NEW in r6, so every dir here was written marker-aware
    val base =
      s"${sys.props("java.io.tmpdir")}/graft_spj_q_n${n}_v${EngineQueries.codeFingerprint}"
    val cfg = EncoderConfig(chunkTokens = 1 << 17, numPartitions = N)
    Lineage.encodeToDir(ds, s"$base/a", cfg)
    Lineage.encodeToDir(ds.filter(col("n_tok") % 2 === 0).as[SeqRow],
      s"$base/b", cfg)
    // SPJ needs catalog tables: the bucket transform resolves through the
    // table's FunctionCatalog; path-based relations have none
    s.conf.set("spark.sql.catalog.graftspj",
      classOf[graft.spark.GraftCatalog].getName)
    s.conf.set("spark.sql.catalog.graftspj.root", s"$base/cat")
    s.sql("CREATE NAMESPACE IF NOT EXISTS graftspj.q")
    s.sql(s"CREATE TABLE IF NOT EXISTS graftspj.q.a USING graft LOCATION '$base/a'")
    s.sql(s"CREATE TABLE IF NOT EXISTS graftspj.q.b USING graft LOCATION '$base/b'")
    val keys = Seq("graft.read.spj", // SPJ is OPT-IN (caps scan parallelism at
      // the bucket count in exchange for shuffle-free joins — the Iceberg
      // preserve-data-grouping trade, and a join is exactly where it wins)
      "spark.sql.sources.v2.bucketing.enabled",
      "spark.sql.sources.v2.bucketing.pushPartValues.enabled",
      "spark.sql.autoBroadcastJoinThreshold", // force a real SMJ, not broadcast
      "spark.sql.adaptive.enabled") // stable executed-plan text for the pin
    val old = keys.map(k => k -> s.conf.getOption(k))
    keys.zip(Seq("true", "true", "true", "-1", "false"))
      .foreach { case (k, v) => s.conf.set(k, v) }
    try {
      val q = s.sql(
        """SELECT a.source, count(*) AS n_rows,
          |  CAST(sum(a.n_tok) + sum(b.n_tok) AS BIGINT) AS n_tok2
          |FROM graftspj.q.a a JOIN graftspj.q.b b ON a.doc_id = b.doc_id
          |GROUP BY a.source""".stripMargin)
      val plan = q.queryExecution.executedPlan.toString
      val ex = plan.linesIterator.count(_.contains("Exchange"))
      require(ex == 1,
        s"storage-partitioned join regressed: expected ONLY the GROUP BY " +
          s"exchange, found $ex:\n$plan")
      // collected (few rows: one per source) so the conf restore below can't
      // retroactively re-plan the result the driver writes out
      val rows = q.collect().sortBy(_.getString(0)).toSeq
      s.createDataFrame(s.sparkContext.parallelize(rows, 1), q.schema)
    } finally old.foreach {
      case (k, Some(v)) => s.conf.set(k, v)
      case (k, None) => s.conf.unset(k)
    }
  }

  val graftSpjSql: String =
    """SELECT a.source, count(*) AS n_rows,
      |  CAST(sum(a.n_tok) + sum(b.n_tok) AS BIGINT) AS n_tok2
      |FROM read_parquet('/root/repo/data/oracle/corpus_n5000.parquet/*.parquet') a
      |JOIN read_parquet('/root/repo/data/oracle/corpus_n5000.parquet/*.parquet') b
      |  ON a.doc_id = b.doc_id
      |WHERE b.n_tok % 2 = 0
      |GROUP BY a.source ORDER BY a.source""".stripMargin

  val graftSourceGroupSql: String =
    """SELECT source, count(*) AS n_rows, CAST(sum(n_tok) AS BIGINT) AS n_tokens
      |FROM read_parquet('/root/repo/data/oracle/corpus_n5000.parquet/*.parquet')
      |GROUP BY source ORDER BY source""".stripMargin

  /** The r6 copy-on-write DELETE through the hard channel: encode the
    * corpus to its OWN scratch table (never shared with graft_source —
    * this one mutates), run two SQL `DELETE FROM` statements through the
    * catalog — a doc_id RANGE (zone-map classification: interior chunks
    * drop by manifest rewrite, boundary chunks decode-filter-re-encode)
    * and a `source =` predicate (SrcStats classification) — then roll up
    * the survivors per source. DuckDB pins the values by applying the
    * negated predicates to the same corpus parquet. Re-runs are
    * deterministic end-to-end: the encode RESUMES over the gen'd
    * partitions (a DELETE-rewritten partition counts as committed, so
    * deleted rows are never resurrected) and both DELETEs are idempotent.
    * Reference analog: removal is re-encoding the stream without the
    * removed spans (`tests/test_ppmd7.py:95-146`). */
  def graftDelete(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val n = math.min(rowsForDir(dir), 5000L)
    val ds = graft.io.CorpusTable.table(s, n)
      .select(col("doc_id"), col("tokens"), col("n_tok"), col("source"))
      .as[SeqRow]
    val base =
      s"${sys.props("java.io.tmpdir")}/graft_del_q_n${n}_v${EngineQueries.codeFingerprint}"
    Lineage.encodeToDir(ds, s"$base/t",
      EncoderConfig(chunkTokens = 1 << 17, numPartitions = 4))
    s.conf.set("spark.sql.catalog.graftdel", classOf[graft.spark.GraftCatalog].getName)
    s.conf.set("spark.sql.catalog.graftdel.root", s"$base/cat")
    s.sql("CREATE NAMESPACE IF NOT EXISTS graftdel.q")
    s.sql(s"CREATE TABLE IF NOT EXISTS graftdel.q.corpus USING graft LOCATION '$base/t'")
    s.sql(
      """DELETE FROM graftdel.q.corpus
        |WHERE doc_id >= 'doc-000000001000' AND doc_id < 'doc-000000002000'"""
        .stripMargin)
    s.sql("DELETE FROM graftdel.q.corpus WHERE source = 'forum'")
    s.sql(
      """SELECT source, count(*) AS n_rows, sum(n_tok) AS n_tokens,
        |  min(doc_id) AS min_doc_id, max(doc_id) AS max_doc_id
        |FROM graftdel.q.corpus GROUP BY source ORDER BY source""".stripMargin)
  }

  /** The r6 row-level UPDATE + MERGE INTO through the hard channel
    * (group-based copy-on-write rewrite: runtime group filtering reads
    * and rewrites ONLY the partitions holding matching rows): re-source
    * two fixed docs via UPDATE, MERGE one new doc in, roll up per
    * source. DuckDB pins the values by applying the same edits in SQL.
    * Idempotent end-to-end: the encode RESUMES, the UPDATE re-applies
    * the same value, and the MERGE's inserted doc matches on later runs
    * (WHEN MATCHED updates it to the identical content). */
  def graftUpdate(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val n = math.min(rowsForDir(dir), 5000L)
    val ds = graft.io.CorpusTable.table(s, n)
      .select(col("doc_id"), col("tokens"), col("n_tok"), col("source"))
      .as[SeqRow]
    val base =
      s"${sys.props("java.io.tmpdir")}/graft_upd_q_n${n}_v${EngineQueries.codeFingerprint}"
    Lineage.encodeToDir(ds, s"$base/t",
      EncoderConfig(chunkTokens = 1 << 17, numPartitions = 4))
    s.conf.set("spark.sql.catalog.graftupd", classOf[graft.spark.GraftCatalog].getName)
    s.conf.set("spark.sql.catalog.graftupd.root", s"$base/cat")
    s.sql("CREATE NAMESPACE IF NOT EXISTS graftupd.q")
    s.sql(s"CREATE TABLE IF NOT EXISTS graftupd.q.corpus USING graft LOCATION '$base/t'")
    s.sql(
      """UPDATE graftupd.q.corpus SET source = 'curated'
        |WHERE doc_id IN ('doc-000000000007', 'doc-000000000123')""".stripMargin)
    s.sql(
      """MERGE INTO graftupd.q.corpus t
        |USING (SELECT 'zzz-merged-00001' AS doc_id, array(1, 2, 3) AS tokens,
        |         3 AS n_tok, 'merged' AS source) s
        |ON t.doc_id = s.doc_id
        |WHEN MATCHED THEN UPDATE SET *
        |WHEN NOT MATCHED THEN INSERT *""".stripMargin)
    s.sql(
      """SELECT source, count(*) AS n_rows, sum(n_tok) AS n_tokens,
        |  min(doc_id) AS min_doc_id, max(doc_id) AS max_doc_id
        |FROM graftupd.q.corpus GROUP BY source ORDER BY source""".stripMargin)
  }

  val graftUpdateSql: String =
    """WITH t AS (
      |  SELECT doc_id, n_tok,
      |    CASE WHEN doc_id IN ('doc-000000000007', 'doc-000000000123')
      |         THEN 'curated' ELSE source END AS source
      |  FROM read_parquet('/root/repo/data/oracle/corpus_n5000.parquet/*.parquet')
      |  UNION ALL SELECT 'zzz-merged-00001', 3, 'merged'
      |)
      |SELECT source, count(*) AS n_rows, CAST(sum(n_tok) AS BIGINT) AS n_tokens,
      |  min(doc_id) AS min_doc_id, max(doc_id) AS max_doc_id
      |FROM t GROUP BY source ORDER BY source""".stripMargin

  val graftDeleteSql: String =
    """SELECT source, count(*) AS n_rows, CAST(sum(n_tok) AS BIGINT) AS n_tokens,
      |  min(doc_id) AS min_doc_id, max(doc_id) AS max_doc_id
      |FROM read_parquet('/root/repo/data/oracle/corpus_n5000.parquet/*.parquet')
      |WHERE NOT (doc_id >= 'doc-000000001000' AND doc_id < 'doc-000000002000')
      |  AND source <> 'forum'
      |GROUP BY source ORDER BY source""".stripMargin

  /** Token-containment pruning through the hard channel: an
    * `array_contains(tokens, v)` filter over the DSv2 source (folded into
    * the containsToken probe by GraftExtensions' rule — zone map +
    * TokenSketch chunk pruning at planning time, exact row filter in the
    * reader) rolled up so DuckDB can recompute the identical answer with
    * `list_contains` over the same corpus. */
  def graftSourceContains(s: SparkSession, dir: String): DataFrame =
    scratchGraftTable(s, dir)
      .filter(array_contains(col("tokens"), lit(0)))
      .agg(count(lit(1)).as("n_rows"),
        sum(col("n_tok").cast("long")).as("n_tokens"),
        min(col("doc_id")).as("min_doc_id"))

  val graftSourceContainsSql: String =
    """SELECT count(*) AS n_rows, CAST(sum(n_tok) AS BIGINT) AS n_tokens,
      |  min(doc_id) AS min_doc_id
      |FROM read_parquet('/root/repo/data/oracle/corpus_n5000.parquet/*.parquet')
      |WHERE list_contains(tokens, 0)""".stripMargin

  /** IN-list pushdown through the hard channel: the pushed
    * `doc_id IN (...)` prunes chunks via the binary-searched zone test
    * (UTF-8 order); DuckDB recomputes over the corpus. */
  def graftSourceIn(s: SparkSession, dir: String): DataFrame =
    scratchGraftTable(s, dir)
      .filter(col("doc_id").isin(
        "doc-000000000007", "doc-000000000123", "doc-000000004321"))
      .select(col("doc_id"), col("n_tok"))
      .orderBy(col("doc_id"))

  val graftSourceInSql: String =
    """SELECT doc_id, n_tok
      |FROM read_parquet('/root/repo/data/oracle/corpus_n5000.parquet/*.parquet')
      |WHERE doc_id IN ('doc-000000000007', 'doc-000000000123',
      |  'doc-000000004321')
      |ORDER BY doc_id""".stripMargin

  val graftSourceStatsSql: String =
    """SELECT count(*) AS n_rows, min(doc_id) AS min_doc_id,
      |  max(doc_id) AS max_doc_id, CAST(sum(n_tok) AS BIGINT) AS n_tokens
      |FROM read_parquet('/root/repo/data/oracle/corpus_n5000.parquet/*.parquet')""".stripMargin

  val graftSourceSql: String =
    """SELECT source, count(*) AS n_rows, CAST(sum(n_tok) AS BIGINT) AS n_tokens,
      |  min(doc_id) AS min_doc_id, max(doc_id) AS max_doc_id
      |FROM read_parquet('/root/repo/data/oracle/corpus_n5000.parquet/*.parquet')
      |GROUP BY source ORDER BY source""".stripMargin

  val lineageRoundtripSql: String =
    """SELECT CAST(sum(n_tok) AS BIGINT) AS n_tokens,
      |  CAST(4 AS BIGINT) AS partitions_first_run,
      |  CAST(0 AS BIGINT) AS partitions_resumed_run,
      |  count(*) AS decoded_rows, count(*) AS expected_rows
      |FROM read_parquet('/root/repo/data/oracle/corpus_n5000.parquet/*.parquet')""".stripMargin
}

/** Deterministic toy tokenizer (whitespace split, stable JVM string hash
  * into the vocab) — stands in for BPE; the engine only needs *a* fixed
  * token domain. */
object Tokenize {
  def wordIds(text: String): Array[Int] = {
    val words = text.split("\\s+").filter(_.nonEmpty)
    if (words.isEmpty) Array(0)
    else words.map(w => (w.hashCode & 0x7fffffff) % Corpus.V)
  }
}
