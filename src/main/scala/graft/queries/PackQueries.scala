package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.engine.{Pack, SeqRow}

/** Training-data curation operators over the token corpus: deterministic
  * dataset splitting, context-length profiling, and fixed-length sequence
  * packing (the step that turns a curated corpus into training examples).
  *
  * All three are oracled: split/histogram are pure SQL in both dialects;
  * packing is pinned by an independent from-scratch Python replica
  * (tools/gen_pack_fixtures.py -> golden/pack_fixture_n5000.parquet), the
  * same whole-pipeline-fixture pattern as the LSH/minhash oracles.
  */
object PackQueries {

  /** Format-free deterministic doc key: the first 60 bits (15 hex chars) of
    * md5(doc_id). A pure function of the FULL id string — no assumption
    * about any id scheme (the previous key parsed a numeric `doc_NNN`
    * suffix and broke on any other format) — stable across runs,
    * partitionings, and cluster sizes, and exactly expressible in both SQL
    * dialects: Spark `conv(substring(md5(x),1,15),16,10)`, DuckDB
    * `('0x'||substr(md5(x),1,15))::BIGINT`. 60 bits stays clear of signed
    * overflow in both engines. */
  private[queries] def docKey(docId: String): Long =
    graft.engine.DocKey.of(docId) // single definition — layers cannot drift

  /** The same key as a Column (codegen'd builtins, no UDF). */
  private def docKeyCol(c: org.apache.spark.sql.Column) =
    conv(substring(md5(c), 1, 15), 16, 10).cast("long")

  private def rowsFor(dir: String): Long =
    math.min(EngineQueries.rowsForDir(dir), 5000L)

  /** Deterministic train/val/test split (80/10/10) by hashed doc key.
    * Hash-bucketed (not index-ranged) so membership is independent of row
    * order and ingestion batching — re-running over a grown corpus never
    * moves an old doc across splits. */
  def seqSplit(s: SparkSession, dir: String): DataFrame = {
    val h = pmod(docKeyCol(col("doc_id")), lit(1000L))
    graft.io.CorpusTable.table(s, rowsFor(dir))
      .withColumn("split",
        when(h < 800, "train").when(h < 900, "val").otherwise("test"))
      .groupBy(col("split"))
      .agg(count(lit(1)).as("n_docs"),
        sum("n_tok").cast("long").as("n_tokens"))
      .orderBy(col("split"))
  }

  val seqSplitSql: String =
    """SELECT CASE
      |    WHEN ('0x' || substr(md5(doc_id),1,15))::BIGINT % 1000 < 800 THEN 'train'
      |    WHEN ('0x' || substr(md5(doc_id),1,15))::BIGINT % 1000 < 900 THEN 'val'
      |    ELSE 'test' END AS split,
      |  count(*) AS n_docs, CAST(sum(n_tok) AS BIGINT) AS n_tokens
      |FROM read_parquet('/root/repo/data/oracle/corpus_n5000.parquet/*.parquet')
      |GROUP BY 1 ORDER BY 1""".stripMargin

  /** Context-length histogram (512-token buckets): the profile that sizes
    * packing capacity and flags truncation loss before a training run. */
  def seqLenHist(s: SparkSession, dir: String): DataFrame =
    graft.io.CorpusTable.table(s, rowsFor(dir))
      .groupBy(expr("CAST(n_tok div 512 AS BIGINT)").as("len_bucket"))
      .agg(count(lit(1)).as("n_docs"),
        sum("n_tok").cast("long").as("n_tokens"))
      .orderBy(col("len_bucket"))

  val seqLenHistSql: String =
    """SELECT CAST(n_tok // 512 AS BIGINT) AS len_bucket,
      |  count(*) AS n_docs, CAST(sum(n_tok) AS BIGINT) AS n_tokens
      |FROM read_parquet('/root/repo/data/oracle/corpus_n5000.parquet/*.parquet')
      |GROUP BY 1 ORDER BY 1""".stripMargin

  final val BinLen = 4096 // >= corpus max n_tok, so every doc fits a bin
  final val PackGroups = 32L

  /** Packed bins as a typed Dataset — the real operator (callers train on
    * `tokens`); the driver query below aggregates it. One shuffle (hash
    * repartition on grp), then a streaming per-partition pass. */
  def packedBins(s: SparkSession, dir: String): org.apache.spark.sql.Dataset[Pack.PackedBin] = {
    import s.implicits._
    graft.io.CorpusTable.table(s, rowsFor(dir))
      .select(col("doc_id"), col("tokens"), col("n_tok"), col("source"))
      .as[SeqRow]
      .map(r => (docKey(r.doc_id) % PackGroups, r))
      .toDF("grp", "row")
      .repartition(s.sparkContext.defaultParallelism, col("grp"))
      .sortWithinPartitions(col("grp"), col("row.doc_id"))
      .as[(Long, SeqRow)]
      .mapPartitions(it => Pack.packPartition(it, BinLen))
  }

  /** Per-group packing report: bins, docs, token utilization. */
  def seqPack(s: SparkSession, dir: String): DataFrame = {
    packedBins(s, dir)
      .groupBy(col("grp"))
      .agg(count(lit(1)).as("n_bins"),
        sum(size(col("doc_ids"))).cast("long").as("n_docs"),
        sum("n_tok").cast("long").as("n_tokens"),
        sum("pad").cast("long").as("pad_tokens"))
      .orderBy(col("grp"))
  }

  val seqPackSql: String =
    """SELECT grp, n_bins, n_docs, n_tokens, pad_tokens
      |FROM read_parquet('/root/repo/golden/pack_fixture_n5000.parquet')
      |ORDER BY grp""".stripMargin
}
