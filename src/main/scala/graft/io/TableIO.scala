package graft.io

import org.apache.spark.sql.{Dataset, SaveMode, SparkSession}
import graft.engine.{EncodedChunk, SeqRow}

/** Storage abstraction (SURVEY.md §7 module 6): the engine reads sequence
  * tables and persists chunk/manifest tables through this trait.
  *
  * Only the Parquet implementation is wired here — `/opt/spark/jars` carries
  * no Iceberg runtime (verified) — but the call shape is already DSv2: an
  * Iceberg implementation is `spark.table(name)` / `df.writeTo(name).append()`
  * against a catalog-qualified name, with identical dataframe schemas; no
  * engine code changes. Lineage checkpoints (graft.engine.Lineage) are
  * orthogonal: they target a filesystem dir in both cases.
  */
trait TableIO {
  def readSequences(spark: SparkSession, table: String): Dataset[SeqRow]
  def writeChunks(chunks: Dataset[EncodedChunk], table: String): Unit
  def readChunks(spark: SparkSession, table: String): Dataset[EncodedChunk]
}

private[io] object ZoneDefaults {
  import org.apache.spark.sql.DataFrame
  import org.apache.spark.sql.functions.lit

  /** Chunk tables written before the token zone map / containment sketch
    * existed lack min_tok/max_tok/tok_set: default to the conservative
    * "could contain anything" values so old tables still decode (never
    * prunes, always correct). */
  def apply(df: DataFrame): DataFrame = {
    var out = df
    if (!df.columns.contains("min_tok"))
      out = out.withColumn("min_tok", lit(Int.MinValue))
    if (!df.columns.contains("max_tok"))
      out = out.withColumn("max_tok", lit(Int.MaxValue))
    if (!df.columns.contains("tok_set"))
      out = out.withColumn("tok_set", lit(Array.emptyByteArray))
    // likewise tables written before SrcStats: empty = "no stats", readers
    // fall back to a meta read (fail open, never wrong)
    if (!out.columns.contains("src_stats"))
      out = out.withColumn("src_stats", lit(Array.emptyByteArray))
    out
  }
}

/** Path-based Parquet tables. */
object ParquetTableIO extends TableIO {
  override def readSequences(spark: SparkSession, path: String): Dataset[SeqRow] = {
    import spark.implicits._
    spark.read.parquet(path)
      .select("doc_id", "tokens", "n_tok", "source")
      .as[SeqRow]
  }

  override def writeChunks(chunks: Dataset[EncodedChunk], path: String): Unit =
    chunks.write.mode(SaveMode.Overwrite).parquet(path)

  override def readChunks(spark: SparkSession, path: String): Dataset[EncodedChunk] = {
    import spark.implicits._
    ZoneDefaults(spark.read.parquet(path)).as[EncodedChunk]
  }
}

/** Path-based ORC tables — same columnar guarantees as Parquet (binary
  * columns, predicate pushdown); one-line swap of the format. */
object OrcTableIO extends TableIO {
  override def readSequences(spark: SparkSession, path: String): Dataset[SeqRow] = {
    import spark.implicits._
    spark.read.orc(path)
      .select("doc_id", "tokens", "n_tok", "source")
      .as[SeqRow]
  }

  override def writeChunks(chunks: Dataset[EncodedChunk], path: String): Unit =
    chunks.write.mode(SaveMode.Overwrite).orc(path)

  override def readChunks(spark: SparkSession, path: String): Dataset[EncodedChunk] = {
    import spark.implicits._
    ZoneDefaults(spark.read.orc(path)).as[EncodedChunk]
  }
}

/** CSV tables — the reference's own test-corpus format (its 1.2 MB fixture
  * corpus is CSV; `/root/reference/tests` ships it alongside the golden
  * strings). CSV has neither array nor binary types: the tokens column
  * rides as a space-delimited int string, chunk payload/meta/tok_set as
  * HEX (Spark's base64() emits MIME-chunked output with embedded newlines,
  * which shreds CSV records; hex is newline-free). Reads use
  * multiLine=true for correctness with quoted newlines in string fields,
  * which makes each FILE a single task — fine for the read-once ingest
  * role (split large CSVs into many files, or convert to parquet first).
  * Ingest/interchange only. */
object CsvTableIO extends TableIO {
  import org.apache.spark.sql.functions.{coalesce, col, concat_ws, expr, hex, length, typedLit, unhex, when}

  /** Write helper for sequences (the trait is read-oriented; tests and
    * ingest converters use this to produce the CSV shape). */
  def writeSequences(ds: Dataset[SeqRow], path: String): Unit =
    ds.toDF()
      .withColumn("tokens", concat_ws(" ", col("tokens")))
      .write.mode(SaveMode.Overwrite).option("header", "true").csv(path)

  override def readSequences(spark: SparkSession, path: String): Dataset[SeqRow] = {
    import spark.implicits._
    spark.read.option("header", "true")
      // quoted fields may legitimately contain newlines (foreign doc ids /
      // sources): without multiLine the record would silently shred
      .option("multiLine", "true")
      .schema("doc_id STRING, tokens STRING, n_tok INT, source STRING")
      .csv(path)
      // a zero-token row must come back as an EMPTY array: the CSV reader
      // surfaces the empty field as NULL (its default emptyValue handling),
      // and a bare split("") would yield array(null)
      .withColumn("tokens",
        when(col("tokens").isNull || length(col("tokens")) === 0,
            expr("array()").cast("array<int>"))
          .otherwise(expr("transform(split(tokens, ' '), x -> CAST(x AS INT))")))
      // empty STRING fields also read as NULL; SeqRow fields are non-null
      .withColumn("doc_id", coalesce(col("doc_id"), typedLit("")))
      .withColumn("source", coalesce(col("source"), typedLit("")))
      .select("doc_id", "tokens", "n_tok", "source")
      .as[SeqRow]
  }

  override def writeChunks(chunks: Dataset[EncodedChunk], path: String): Unit =
    chunks.toDF()
      .withColumn("tok_set", hex(col("tok_set")))
      .withColumn("payload", hex(col("payload")))
      .withColumn("meta", hex(col("meta")))
      .withColumn("src_stats", hex(col("src_stats")))
      .write.mode(SaveMode.Overwrite).option("header", "true").csv(path)

  override def readChunks(spark: SparkSession, path: String): Dataset[EncodedChunk] = {
    import spark.implicits._
    ZoneDefaults(spark.read.option("header", "true")
        .option("multiLine", "true") // doc_id bounds may contain newlines
        .schema("chunk_id LONG, part_id INT, seq INT, codec INT, n_rows INT, " +
          "n_tokens LONG, raw_bytes LONG, enc_bytes LONG, crc32 LONG, " +
          "min_doc_id STRING, max_doc_id STRING, min_tok INT, max_tok INT, " +
          "tok_set STRING, payload STRING, meta STRING, src_stats STRING")
        .csv(path))
      // an EMPTY binary (zero-token chunk's tok_set) rides as an empty CSV
      // field, which the reader surfaces as NULL — restore the empty array;
      // same for empty-string doc_id bounds
      .withColumn("tok_set", coalesce(unhex(col("tok_set")),
        typedLit(Array.emptyByteArray)))
      .withColumn("min_doc_id", coalesce(col("min_doc_id"), typedLit("")))
      .withColumn("max_doc_id", coalesce(col("max_doc_id"), typedLit("")))
      .withColumn("payload", unhex(col("payload")))
      .withColumn("meta", unhex(col("meta")))
      // pre-SrcStats CSVs have no 17th column -> NULL -> empty ("no stats")
      .withColumn("src_stats", coalesce(unhex(col("src_stats")),
        typedLit(Array.emptyByteArray)))
      .select("chunk_id", "part_id", "seq", "codec", "n_rows", "n_tokens",
        "raw_bytes", "enc_bytes", "crc32", "min_doc_id", "max_doc_id",
        "min_tok", "max_tok", "tok_set", "payload", "meta", "src_stats")
      .as[EncodedChunk]
  }
}

/** JSON-lines tables — the interchange format. JSON has no binary type, so
  * chunk payload/meta ride as base64 strings (encoded on write, decoded on
  * read); token arrays are native JSON arrays. Row-oriented text: use for
  * ingest/debug, not as the at-scale storage layer. */
object JsonTableIO extends TableIO {
  import org.apache.spark.sql.functions.{base64, col, unbase64}

  override def readSequences(spark: SparkSession, path: String): Dataset[SeqRow] = {
    import spark.implicits._
    spark.read
      .schema("doc_id STRING, tokens ARRAY<INT>, n_tok INT, source STRING")
      .json(path)
      .select("doc_id", "tokens", "n_tok", "source")
      .as[SeqRow]
  }

  override def writeChunks(chunks: Dataset[EncodedChunk], path: String): Unit =
    chunks.toDF()
      .withColumn("tok_set", base64(col("tok_set")))
      .withColumn("payload", base64(col("payload")))
      .withColumn("meta", base64(col("meta")))
      .withColumn("src_stats", base64(col("src_stats")))
      .write.mode(SaveMode.Overwrite).json(path)

  override def readChunks(spark: SparkSession, path: String): Dataset[EncodedChunk] = {
    import spark.implicits._
    val raw = spark.read.json(path)
    var withSet =
      if (raw.columns.contains("tok_set"))
        raw.withColumn("tok_set", unbase64(col("tok_set")))
      else raw
    if (withSet.columns.contains("src_stats"))
      withSet = withSet.withColumn("src_stats", unbase64(col("src_stats")))
    ZoneDefaults(withSet)
      .withColumn("payload", unbase64(col("payload")))
      .withColumn("meta", unbase64(col("meta")))
      .select("chunk_id", "part_id", "seq", "codec", "n_rows", "n_tokens",
        "raw_bytes", "enc_bytes", "crc32", "min_doc_id", "max_doc_id",
        "min_tok", "max_tok", "tok_set", "payload", "meta", "src_stats")
      .selectExpr("CAST(chunk_id AS LONG) chunk_id",
        "CAST(part_id AS INT) part_id", "CAST(seq AS INT) seq",
        "CAST(codec AS INT) codec", "CAST(n_rows AS INT) n_rows",
        "CAST(n_tokens AS LONG) n_tokens", "CAST(raw_bytes AS LONG) raw_bytes",
        "CAST(enc_bytes AS LONG) enc_bytes", "CAST(crc32 AS LONG) crc32",
        "min_doc_id", "max_doc_id",
        "CAST(min_tok AS INT) min_tok", "CAST(max_tok AS INT) max_tok",
        "tok_set", "payload", "meta", "src_stats")
      .as[EncodedChunk]
  }
}
