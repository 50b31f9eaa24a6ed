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
    spark.read.parquet(path).as[EncodedChunk]
  }
}
