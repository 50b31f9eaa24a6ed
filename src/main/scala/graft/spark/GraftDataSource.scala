package graft.spark

import java.util

import org.apache.hadoop.conf.Configuration
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{GenericInternalRow, UnsafeArrayData}
import org.apache.spark.sql.connector.catalog.{SupportsRead, SupportsWrite, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.connector.write.{BatchWrite, DataWriter, DataWriterFactory, LogicalWriteInfo, PhysicalWriteInfo, SupportsTruncate, Write, WriteBuilder, WriterCommitMessage}
import org.apache.spark.sql.sources._
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.util.SerializableConfiguration

import graft.engine.{ChunkBuilder, EncoderConfig, Lineage, MetaDict, SeqRow}

/** `spark.read.format("graft").load(dir)` — a DataSourceV2 reader over a
  * lineage table dir, making the engine's storage a first-class Spark
  * source (the idiomatic analog of the reference being importable as a
  * library, `import pyppmd`):
  *
  *  - one InputPartition per CHUNK (Spark schedules chunks across the
  *    cluster — the threaded-decoder recast at source granularity);
  *  - doc_id predicates push into MANIFEST zone-map pruning at planning
  *    time: an equality/range lookup plans only the overlapping chunks,
  *    reading the (possibly parquet-compacted) manifest, never the data;
  *    all predicates are also left as residuals, so row-level semantics
  *    are exactly Spark's;
  *  - column pruning has TEETH: a projection without `tokens` decodes only
  *    the few-KB meta sections per chunk — the compressed payload is never
  *    touched (a per-source rollup over 100 TB reads ~0.1% of the bytes);
  *  - the dir's shared meta dictionary rides into every partition reader.
  */
class GraftDataSource extends TableProvider with DataSourceRegister {
  override def shortName(): String = "graft"
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    GraftTable.Schema
  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: util.Map[String, String]): Table = {
    val path = Option(properties.get("path")).getOrElse(
      throw new IllegalArgumentException(
        "graft source needs a path: spark.read.format(\"graft\").load(dir)"))
    new GraftTable(path)
  }
}

object GraftTable {
  val Schema: StructType = StructType(Seq(
    StructField("doc_id", StringType, nullable = false),
    StructField("tokens", ArrayType(IntegerType, containsNull = false),
      nullable = false),
    StructField("n_tok", IntegerType, nullable = false),
    StructField("source", StringType, nullable = false)))
}

class GraftTable(path: String) extends Table
    with SupportsRead with SupportsWrite {
  override def name(): String = s"graft:$path"
  override def schema(): StructType = GraftTable.Schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ, TableCapability.BATCH_WRITE,
      TableCapability.TRUNCATE, TableCapability.MICRO_BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new GraftScanBuilder(path)
  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder =
    new GraftWriteBuilder(path, info)
}

class GraftScanBuilder(path: String) extends ScanBuilder
    with SupportsPushDownFilters with SupportsPushDownRequiredColumns {
  private var pushed: Array[Filter] = Array.empty
  private var required: StructType = GraftTable.Schema

  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    // doc_id comparisons prune CHUNKS via the manifest zone map; rows still
    // need the exact predicate, so EVERY filter is also returned as a
    // residual for Spark to evaluate (chunk pruning is an optimization,
    // never a semantics change)
    pushed = filters.filter {
      case EqualTo("doc_id", _: String)            => true
      case GreaterThan("doc_id", _: String)        => true
      case GreaterThanOrEqual("doc_id", _: String) => true
      case LessThan("doc_id", _: String)           => true
      case LessThanOrEqual("doc_id", _: String)    => true
      case _                                       => false
    }
    filters
  }
  override def pushedFilters(): Array[Filter] = pushed
  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema
  override def build(): Scan = new GraftScan(path, pushed, required)
}

class GraftScan(path: String, pushed: Array[Filter], required: StructType)
    extends Scan with Batch {
  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def toMicroBatchStream(
      checkpointLocation: String): streaming.MicroBatchStream =
    new GraftMicroBatchStream(path, pushed, required)
  override def description(): String =
    s"graft:$path prunedFilters=[${pushed.mkString(", ")}] " +
      s"columns=[${required.fieldNames.mkString(", ")}]"

  override def planInputPartitions(): Array[InputPartition] = {
    val spark = SparkSession.active
    // a plain lineage dir is one table; a streaming batch TREE
    // (root/batch=N/...) is the union of its batches, each with its own
    // manifest and shared dictionary
    val fs = org.apache.hadoop.fs.FileSystem.get(new java.net.URI(path),
      spark.sparkContext.hadoopConfiguration)
    val dirs: Seq[String] =
      if (fs.exists(new org.apache.hadoop.fs.Path(s"$path/_lineage")))
        Seq(path)
      else {
        // visibility rule shared with the streaming reader: a marker-aware
        // tree (any ready marker present, or the tree-level stream marker
        // promising markers) exposes only READY batches — an in-flight
        // half-written batch, even the very FIRST one, is invisible to
        // batch reads too. Marker-less trees (at-rest) read in full.
        val visible = Lineage.visibleBatchDirs(spark, path)
        if (visible.isEmpty && Lineage.batchDirs(spark, path).isEmpty &&
            !Lineage.isStreamTree(spark, path))
          throw new IllegalArgumentException(
            s"$path holds neither a lineage table (_lineage/) nor batch=N " +
              "subdirectories")
        visible
      }
    GraftPlanning.partitionsForAll(spark, dirs, pushed)
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new GraftReaderFactory(
      new SerializableConfiguration(
        SparkSession.active.sparkContext.hadoopConfiguration),
      required)
}

case class GraftInputPartition(dir: String, row: Lineage.ManifestRow,
                               dict: Option[Array[Byte]]) extends InputPartition

/** One copy of dir-level planning (manifest load, zone-map pruning, dict
  * pickup) shared by the batch scan and the micro-batch stream. */
private[spark] object GraftPlanning {
  import org.apache.spark.sql.functions.col

  /** ONE Spark job for the whole dir set: the tagged per-dir manifests are
    * unioned, pruned once, collected once — a deep tree otherwise pays one
    * sequential driver-side collect per batch at planning time. */
  def partitionsForAll(spark: SparkSession, dirs: Seq[String],
                       pushed: Array[Filter]): Array[InputPartition] = {
    if (dirs.isEmpty) return Array.empty
    import spark.implicits._
    var t = dirs.map(d => Lineage.readManifest(spark, d).map(m => (d, m)))
      .reduce(_ union _)
    // manifest zone-map pruning in Spark's own (UTF8 binary) string order —
    // the same order ChunkBuilder computed the bounds in
    pushed.foreach {
      case EqualTo("doc_id", v: String) =>
        t = t.filter(col("_2.max_doc_id") >= v && col("_2.min_doc_id") <= v)
      case GreaterThan("doc_id", v: String) =>
        t = t.filter(col("_2.max_doc_id") > v)
      case GreaterThanOrEqual("doc_id", v: String) =>
        t = t.filter(col("_2.max_doc_id") >= v)
      case LessThan("doc_id", v: String) =>
        t = t.filter(col("_2.min_doc_id") < v)
      case LessThanOrEqual("doc_id", v: String) =>
        t = t.filter(col("_2.min_doc_id") <= v)
      case _ => ()
    }
    val rows = t.collect()
    val dicts: Map[String, Option[Array[Byte]]] =
      rows.iterator.map(_._1).toSet.iterator
        .map((d: String) => d -> Lineage.sharedDictBytes(spark, d)).toMap
    rows.map { case (d, m) => GraftInputPartition(d, m, dicts(d)): InputPartition }
  }
}

// ---- incremental (micro-batch) read over a batch tree ----------------------

/** Watermark over BATCH NUMBERS, not dir counts: a count-based offset
  * breaks the moment name order and arrival order diverge (e.g. the %05d
  * pad rolling over at batch 100000 — lexicographic mid-list insertion
  * would silently duplicate one batch and drop another forever). -1 =
  * nothing consumed. */
case class GraftOffset(lastBatch: Long)
    extends org.apache.spark.sql.connector.read.streaming.Offset {
  override def json(): String = s"""{"lastBatch":$lastBatch}"""
}

/** `spark.readStream.format("graft").load(root)` — consume a streaming
  * batch tree INCREMENTALLY: the offset is the highest consumed BATCH
  * NUMBER among READY subdirs (gated on the `_graft_batch_ready` marker,
  * so a half-written batch is never consumed and then skipped forever),
  * and each trigger plans exactly the chunks of the newly readied
  * batches. Batches must become ready in ascending number order — the
  * streaming sink guarantees it (sequential foreachBatch); manual trees
  * marking out of order would skip the late-marked earlier batch. Produce
  * with StreamingEncoder.writeToLineageDir, consume here — the encoded
  * corpus becomes an append-only stream with the same pruning and column
  * semantics as the batch source. */
class GraftMicroBatchStream(root: String, pushed: Array[Filter],
                            required: StructType)
    extends streaming.MicroBatchStream {
  import org.apache.spark.sql.connector.read.streaming.Offset
  private def spark = SparkSession.active

  // loud misuse check at stream construction: a missing root or a plain
  // lineage dir must not read as an eternally empty stream
  locally {
    val fs = org.apache.hadoop.fs.FileSystem.get(new java.net.URI(root),
      SparkSession.active.sparkContext.hadoopConfiguration)
    if (!fs.exists(new org.apache.hadoop.fs.Path(root)))
      throw new IllegalArgumentException(
        s"graft stream root does not exist: $root")
    if (fs.exists(new org.apache.hadoop.fs.Path(s"$root/_lineage")))
      throw new IllegalArgumentException(
        s"$root is a plain lineage dir — the streaming source reads batch " +
          "trees (StreamingEncoder.writeToLineageDir output)")
  }

  /** Ready batches as (number, dir), number-ordered. Unnumbered dirs in a
    * STREAM tree are a layout error — fail loudly, never mis-order. */
  private def readyNumbered(): Seq[(Long, String)] =
    Lineage.readyBatchDirs(spark, root).map { d =>
      val n = Lineage.batchNumber(d).getOrElse(
        throw new IllegalArgumentException(
          s"unnumbered batch dir in stream tree: $d"))
      (n, d)
    }.sortBy(_._1)

  override def initialOffset(): Offset = GraftOffset(-1L)
  override def latestOffset(): Offset =
    GraftOffset(readyNumbered().lastOption.map(_._1).getOrElse(-1L))
  override def deserializeOffset(json: String): Offset =
    """"lastBatch"\s*:\s*(-?\d+)""".r.findFirstMatchIn(json) match {
      case Some(m) => GraftOffset(m.group(1).toLong)
      case None => throw new IllegalArgumentException(
        s"corrupt graft stream offset (a garbled checkpoint must fail " +
          s"loudly, not silently re-deliver the whole tree): $json")
    }
  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()
  override def planInputPartitions(start: Offset,
                                   end: Offset): Array[InputPartition] = {
    val s0 = start.asInstanceOf[GraftOffset].lastBatch
    val e0 = end.asInstanceOf[GraftOffset].lastBatch
    val dirs = readyNumbered().filter { case (n, _) => n > s0 && n <= e0 }
      .map(_._2)
    GraftPlanning.partitionsForAll(spark, dirs, pushed)
  }
  override def createReaderFactory(): PartitionReaderFactory =
    new GraftReaderFactory(
      new SerializableConfiguration(spark.sparkContext.hadoopConfiguration),
      required)
}

class GraftReaderFactory(conf: SerializableConfiguration,
                         required: StructType) extends PartitionReaderFactory {
  override def createReader(p: InputPartition): PartitionReader[InternalRow] =
    new GraftPartitionReader(conf.value, p.asInstanceOf[GraftInputPartition],
      required)
}

// ---- write path ------------------------------------------------------------

/** `df.write.format("graft").mode("append"|"overwrite").save(dir)` — the
  * sink half of the source above, riding the SAME atomic per-partition
  * commit protocol as Lineage.encodeToDir (one copy of the delicate dance:
  * Lineage.PartitionCommitter). Semantics:
  *  - rows are chunked AS PARTITIONED (the sink never reshuffles — encode
  *    where the data lives; repartition deterministically upstream if you
  *    want resume-sound partition membership);
  *  - append mode honors SPARK's append contract: new writes land in fresh
  *    partition files (ids offset past the committed ones) — never a
  *    silent skip of new data. Concurrent appends to one dir need external
  *    coordination (the offset is computed once, driver-side);
  *  - `option("resume", "true")` switches append to encodeToDir's RESUME
  *    semantics instead: partition ids are kept and already-committed ones
  *    are skipped — for re-running the exact same deterministic write
  *    after a failure, NOT for adding new data;
  *  - overwrite truncates the table dir first (driver-side, once);
  *  - an already-published shared meta dictionary is honored; fresh dirs
  *    write self-contained chunks;
  *  - `option("chunkTokens", n)` tunes the chunk budget. */
class GraftWriteBuilder(path: String, info: LogicalWriteInfo)
    extends WriteBuilder with SupportsTruncate {
  private var doTruncate = false
  override def truncate(): WriteBuilder = { doTruncate = true; this }
  override def build(): Write = {
    val chunkTokens = Option(info.options.get("chunktokens"))
      .map(_.toInt).getOrElse(1 << 20)
    require(chunkTokens > 0, s"chunkTokens must be positive, got $chunkTokens")
    val resume = Option(info.options.get("resume")).exists(_.toBoolean)
    new GraftWrite(path, info.schema(), doTruncate, chunkTokens, resume)
  }
}

class GraftWrite(path: String, inputSchema: StructType, doTruncate: Boolean,
                 chunkTokens: Int, resume: Boolean)
    extends Write with BatchWrite {
  override def toBatch: BatchWrite = this

  override def createBatchWriterFactory(
      info: PhysicalWriteInfo): DataWriterFactory = {
    require(inputSchema.fieldNames.toSeq == GraftTable.Schema.fieldNames.toSeq,
      s"graft sink needs columns [${GraftTable.Schema.fieldNames.mkString(", ")}], " +
        s"got [${inputSchema.fieldNames.mkString(", ")}]")
    val spark = SparkSession.active
    val fs = org.apache.hadoop.fs.FileSystem.get(new java.net.URI(path),
      spark.sparkContext.hadoopConfiguration)
    import org.apache.hadoop.fs.Path
    if (doTruncate) {
      fs.delete(new Path(s"$path/data"), true)
      fs.delete(new Path(s"$path/_lineage"), true)
      fs.delete(new Path(s"$path/_manifest_parquet"), true)
      fs.delete(new Path(s"$path/_manifest_parquet.count"), false)
      // a truncated batch dir must lose its READY visibility too, or a
      // concurrent stream would consume the half-written rewrite
      fs.delete(new Path(s"$path/_graft_batch_ready"), false)
    }
    fs.mkdirs(new Path(s"$path/data"))
    fs.mkdirs(new Path(s"$path/_lineage"))
    // Spark-append contract: new data lands in FRESH partitions, offset
    // past everything committed; resume mode keeps ids (and so the skip)
    val pidOffset =
      if (resume || doTruncate) 0
      else {
        val committed = fs.listStatus(new Path(s"$path/_lineage"))
          .map(_.getPath.getName)
          .collect { case n if n.startsWith("part-") && n.endsWith(".json") =>
            n.stripPrefix("part-").stripSuffix(".json").toInt }
        if (committed.isEmpty) 0 else committed.max + 1
      }
    val dict = Lineage.sharedDictBytes(spark, path)
    new GraftWriterFactory(path,
      new SerializableConfiguration(spark.sparkContext.hadoopConfiguration),
      dict, chunkTokens, pidOffset, resume)
  }
  // per-partition commits are already durable+atomic (manifest renames);
  // the job-level commit has nothing left to do, and failed jobs leave
  // only committed partitions — exactly the resume contract
  override def commit(messages: Array[WriterCommitMessage]): Unit = ()
  override def abort(messages: Array[WriterCommitMessage]): Unit = ()
}

case class GraftCommitMessage(pid: Int, committed: Boolean)
    extends WriterCommitMessage

class GraftWriterFactory(dir: String, conf: SerializableConfiguration,
                         dict: Option[Array[Byte]], chunkTokens: Int,
                         pidOffset: Int, resume: Boolean)
    extends DataWriterFactory {
  override def createWriter(partitionId: Int,
                            taskId: Long): DataWriter[InternalRow] =
    new GraftDataWriter(dir, conf.value, pidOffset + partitionId, taskId,
      dict, chunkTokens, resume)
}

class GraftDataWriter(dir: String, conf: Configuration, pid: Int,
                      taskId: Long, dictBytes: Option[Array[Byte]],
                      chunkTokens: Int, resume: Boolean)
    extends DataWriter[InternalRow] {
  private val fs =
    org.apache.hadoop.fs.FileSystem.get(new java.net.URI(dir), conf)
  private val committer = new Lineage.PartitionCommitter(fs, dir, pid, taskId)
  // only RESUME mode may skip (re-running the same deterministic write);
  // in plain append the partition ids are fresh, so alreadyDone here means
  // a task RETRY of this very write — the committer settles that race
  private val skip = resume && committer.alreadyDone
  private val dict = dictBytes.map(MetaDict.fromBytes).orNull
  private val maxRows = 1 << 16

  private var seqNo = 0
  private val docIds = scala.collection.mutable.ArrayBuffer.empty[String]
  private val sources = scala.collection.mutable.ArrayBuffer.empty[String]
  private val lens = scala.collection.mutable.ArrayBuffer.empty[Int]
  private var toks = new Array[Int](math.min(chunkTokens, 1 << 16))
  private var nTok = 0

  override def write(row: InternalRow): Unit = if (!skip) {
    // push-mode twin of Encoder.chunkIterator's slicing: flush BEFORE
    // appending once the previous row crossed the budget — identical
    // grouping to the pull version
    if (docIds.nonEmpty && (nTok >= chunkTokens || docIds.length >= maxRows))
      flush()
    if (row.isNullAt(0) || row.isNullAt(1) || row.isNullAt(3))
      throw new IllegalArgumentException(
        "graft sink: doc_id, tokens and source must be non-null " +
          s"(partition $pid)")
    val arr = row.getArray(1).toIntArray()
    val n = row.getInt(2)
    require(n == arr.length,
      s"row ${row.getUTF8String(0)}: n_tok $n != tokens.length ${arr.length}")
    docIds += row.getUTF8String(0).toString
    sources += row.getUTF8String(3).toString
    lens += n
    if (nTok + n > toks.length) {
      val want = math.max(toks.length * 2L, nTok.toLong + n)
      toks = java.util.Arrays.copyOf(toks,
        math.min(want, Int.MaxValue - 8).toInt)
    }
    System.arraycopy(arr, 0, toks, nTok, n)
    nTok += n
  }

  private def flush(): Unit = {
    committer.add(ChunkBuilder.build(pid, seqNo, docIds.toArray,
      sources.toArray, java.util.Arrays.copyOf(toks, nTok), lens.toArray,
      dict))
    seqNo += 1
    docIds.clear(); sources.clear(); lens.clear(); nTok = 0
  }

  override def commit(): WriterCommitMessage =
    if (skip) GraftCommitMessage(pid, committed = false)
    else {
      if (docIds.nonEmpty) flush()
      GraftCommitMessage(pid, committer.commit())
    }
  override def abort(): Unit = if (!skip) committer.abort()
  override def close(): Unit = ()
}

class GraftPartitionReader(conf: Configuration, p: GraftInputPartition,
                           required: StructType)
    extends PartitionReader[InternalRow] {
  // ordinal projection map computed ONCE — no per-row string matching on
  // the innermost loop of the path this source advertises as fast
  private val ordinals: Array[Int] = required.fieldNames.map {
    case "doc_id" => 0
    case "tokens" => 1
    case "n_tok"  => 2
    case "source" => 3
    case other =>
      throw new IllegalArgumentException(s"unknown graft column $other")
  }
  private val needTokens = ordinals.contains(1)
  private val needDocId = ordinals.contains(0)
  private val dict = p.dict.map(MetaDict.fromBytes).orNull
  private val chunk = Lineage.readChunk(conf, p.dir, p.row)
  private val it: Iterator[InternalRow] =
    if (needTokens)
      ChunkBuilder.open(chunk, dict)
        .map(r => project(r.doc_id, r.tokens, r.n_tok, r.source))
    else if (needDocId) // payload never decoded
      ChunkBuilder.openSide(chunk, dict)
        .map { case (id, n, src) => project(id, null, n, src) }
    else // neither payload NOR the doc_id section (the dominant meta cost)
      ChunkBuilder.openMeta(chunk)
        .map { case (src, n) => project(null, null, n, src) }

  private def project(id: String, toks: Array[Int], n: Int,
                      src: String): InternalRow = {
    val out = new GenericInternalRow(ordinals.length)
    var i = 0
    while (i < ordinals.length) {
      ordinals(i) match {
        case 0 => out.update(i, UTF8String.fromString(id))
        case 1 => out.update(i, UnsafeArrayData.fromPrimitiveArray(toks))
        case 2 => out.setInt(i, n)
        case 3 => out.update(i, UTF8String.fromString(src))
      }
      i += 1
    }
    out
  }

  private var cur: InternalRow = _
  override def next(): Boolean =
    if (it.hasNext) { cur = it.next(); true } else false
  override def get(): InternalRow = cur
  override def close(): Unit = ()
}
