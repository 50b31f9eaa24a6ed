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
        val sub = f"$dir/batch=$batchId%05d"
        // tree-level stream marker BEFORE the batch dir appears: batch
        // readers then apply READY-marker visibility from the first trigger
        // (without it, a half-written batch 0 in a marker-less tree would
        // read as an at-rest tree and be consumed mid-write)
        Lineage.markStreamTree(batch.sparkSession, dir)
        // READY marker after the batch fully commits (below): downstream
        // incremental readers (readStream.format("graft")) must never
        // consume a half-written batch dir — the marker, not the dir's
        // existence, is their visibility point.
        // Lineage resume needs explicit deterministic partitioning; when the
        // caller left it open, pin it to the cluster's parallelism — stable
        // for the lifetime of a deployment, which is what a batch retry sees.
        val bcfg =
          if (cfg.numPartitions > 0) cfg
          else cfg.copy(numPartitions =
            batch.sparkSession.sparkContext.defaultParallelism)
        Lineage.encodeToDir(batch, sub, bcfg)
        Lineage.markBatchReady(batch.sparkSession, sub)
        ()
      }

  /** Cross-batch streaming dedup with custom state
    * (flatMapGroupsWithState): keyed on the row's content hash, the first
    * arrival passes through, replays/duplicates in ANY later micro-batch are
    * dropped. This is the streaming-ingest guard of a training pipeline —
    * the reference's incremental "model remembers what it has seen" recast
    * as explicit keyed state. State per key is one boolean; over an
    * unbounded stream use dedupStreamTtl so total state stays bounded. */
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

  /** dedupStream with bounded state: each key's seen-bit expires `ttl`
    * after its last sighting (ProcessingTimeTimeout), so state size tracks
    * the de-dup horizon, not the stream's lifetime — the policy production
    * ingest dedup uses (exact within a window, best-effort beyond it). A
    * duplicate arriving after the TTL is treated as new. */
  def dedupStreamTtl(rows: Dataset[SeqRow], ttl: String): Dataset[SeqRow] = {
    val spark = rows.sparkSession
    import spark.implicits._
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    rows
      .groupByKey(r => ContentKey.of(r))
      .flatMapGroupsWithState(OutputMode.Append(),
        GroupStateTimeout.ProcessingTimeTimeout())(
        (_: Long, it: Iterator[SeqRow], state: GroupState[Boolean]) => {
          if (state.hasTimedOut) { state.remove(); Iterator.empty }
          else if (state.exists) {
            state.setTimeoutDuration(ttl) // sighting refreshes the horizon
            Iterator.empty
          } else {
            state.update(true)
            state.setTimeoutDuration(ttl)
            it.take(1)
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
