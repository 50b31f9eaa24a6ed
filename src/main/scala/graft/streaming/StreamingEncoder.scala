package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{DataStreamWriter, StreamingQuery, Trigger}
import graft.engine._

/** Structured Streaming surface: the reference's incremental encoder protocol
  * (`PpmdCompressor.compress()` fed piecewise, model persisting across calls
  * — `/root/reference/src/ext/_ppmdmodule.c:793-844`) recast as micro-batch
  * encode: readStream -> per-batch chunk encode -> append to a lineage dir.
  *
  * Chunk-level state does NOT straddle batches (each batch closes its
  * chunks, like `flush()` per call-group); exactly-once comes from the
  * streaming checkpoint + the per-batch lineage subdirectory being written
  * idempotently (re-run of a batch overwrites the same batch dir).
  */
object StreamingEncoder {

  /** Transform a streaming Dataset[SeqRow] into encoded chunk rows
    * (streaming DataFrame). Partition-local, no shuffle: safe for
    * append-mode streaming. */
  def encodeStream(rows: Dataset[SeqRow],
                   cfg: EncoderConfig = EncoderConfig()): Dataset[EncodedChunk] = {
    val spark = rows.sparkSession
    import spark.implicits._
    rows.mapPartitions { it =>
      Encoder.chunkIterator(it, org.apache.spark.TaskContext.getPartitionId(),
        cfg)
    }
  }

  /** Sink the stream into a lineage directory, one subdir per micro-batch:
    * dir/batch=N/{data,_lineage}. Restarting from the checkpoint re-runs an
    * uncommitted batch; its dir is rewritten idempotently (same input =>
    * byte-identical output, the chunk-determinism property). */
  def writeToLineageDir(rows: Dataset[SeqRow], dir: String,
                        checkpoint: String,
                        cfg: EncoderConfig = EncoderConfig()): DataStreamWriter[SeqRow] =
    rows.writeStream
      .option("checkpointLocation", checkpoint)
      .outputMode("append")
      .foreachBatch { (batch: Dataset[SeqRow], batchId: Long) =>
        // clear a half-written retry target first (idempotent re-run)
        val sub = f"$dir/batch=$batchId%05d"
        Lineage.encodeToDir(batch, sub, cfg)
        ()
      }

  /** Cross-batch streaming dedup with custom state
    * (flatMapGroupsWithState): keyed on the row's content hash, the first
    * arrival passes through, replays/duplicates in ANY later micro-batch are
    * dropped. This is the streaming-ingest guard of a training pipeline —
    * the reference's incremental "model remembers what it has seen" recast
    * as explicit keyed state. State per key is one boolean (bounded); at
    * scale you'd add a state TTL via GroupStateTimeout. */
  def dedupStream(rows: Dataset[SeqRow]): Dataset[SeqRow] = {
    val spark = rows.sparkSession
    import spark.implicits._
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    rows
      .groupByKey(r => ContentKey.of(r))
      .flatMapGroupsWithState(OutputMode.Append(),
        GroupStateTimeout.NoTimeout())(
        (_: Long, it: Iterator[SeqRow], state: GroupState[Boolean]) => {
          if (state.exists) Iterator.empty // seen in an earlier batch
          else {
            state.update(true)
            it.take(1) // first occurrence only (also dedups within the batch)
          }
        })
  }

  /** Windowed/watermarked aggregation over a stream of (ts, source, n_tok):
    * per-minute token counts per source — the streaming stats feed for the
    * codec selector's reporting side (SURVEY.md Table B streaming row). */
  def tokenRateByWindow(rows: DataFrame): DataFrame =
    rows
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "1 minute"), col("source"))
      .agg(count(lit(1)).as("n_rows"), sum(col("n_tok")).as("n_tokens"))
      .select(col("window.start").as("window_start"), col("source"),
        col("n_rows"), col("n_tokens"))
}

/** 64-bit content key over (n_tok, tokens, source) — FNV, deterministic. */
object ContentKey {
  def of(r: SeqRow): Long = {
    var h = 0xcbf29ce484222325L
    h = (h ^ r.n_tok) * 1099511628211L
    var i = 0
    while (i < r.tokens.length) { h = (h ^ r.tokens(i)) * 1099511628211L; i += 1 }
    var c = 0
    while (c < r.source.length) { h = (h ^ r.source.charAt(c)) * 1099511628211L; c += 1 }
    h
  }
}
