package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.col
import graft.engine._
import graft.io.Corpus

/** Scale evidence for the copy-on-write DELETE: at nRows (default 2M,
  * ~1.5B tokens) compare
  *
  *   (a) `GraftDelete.run` — the classified rewrite: Drop chunks vanish
  *       by manifest edit, Keep chunks byte-copy without decoding, only
  *       boundary chunks decode→filter→re-encode;
  *   (b) the naive alternative a user without DELETE would run: decode
  *       the whole table, filter, re-encode to a fresh dir
  *
  * for two predicate shapes a takedown sweep actually uses: a doc_id
  * RANGE (zone-map classification; layout is hash-partitioned, so every
  * partition holds a contiguous sorted run of the range — interior
  * chunks of each run Drop, two boundary chunks per partition rewrite)
  * and a `source =` delete (SrcStats classification; the (source,
  * doc_id) sort makes chunks nearly source-pure, so this is almost
  * entirely metadata Drops + verbatim copies). Each variant verifies
  * the surviving rowcount exactly, so a wrong-classification bug fails
  * the bench rather than flattering it.
  *
  * Run: sbt "Test/runMain graft.DriveDeleteBench [nRows] [cpus]"
  */
object DriveDeleteBench {
  def main(args: Array[String]): Unit = {
    val nRows = args.headOption.map(_.toLong).getOrElse(2000000L)
    val cpus = args.lift(1).getOrElse("32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.driver.host", "localhost")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    val N = 32
    val base = java.nio.file.Files.createTempDirectory("graft-del-ab").toString
    val cfg = EncoderConfig(chunkTokens = 1 << 20, numPartitions = N)

    def encode(dir: String): Double = {
      val t0 = System.nanoTime()
      Lineage.encodeToDir(Corpus.table(spark, nRows, partitions = N), dir, cfg)
      (System.nanoTime() - t0) / 1e9
    }
    def chunkCount(dir: String): Long =
      Lineage.readManifest(spark, dir).count()

    // ---- predicate shapes ---------------------------------------------------
    // ~25% of doc ids: [lo, hi) over the zero-padded decimal id space
    val lo = f"doc-${nRows / 4}%012d"
    val hi = f"doc-${nRows / 2}%012d"
    val rangeFilters: Array[org.apache.spark.sql.sources.Filter] = Array(
      org.apache.spark.sql.sources.GreaterThanOrEqual("doc_id", lo),
      org.apache.spark.sql.sources.LessThan("doc_id", hi))
    val srcFilters: Array[org.apache.spark.sql.sources.Filter] =
      Array(org.apache.spark.sql.sources.EqualTo("source", "forum"))

    def naive(src: String, out: String, keep: org.apache.spark.sql.Column)
        : Double = {
      val t0 = System.nanoTime()
      Lineage.encodeToDir(
        spark.read.format("graft").load(src).filter(keep).as[SeqRow],
        out, cfg)
      (System.nanoTime() - t0) / 1e9
    }
    def cow(dir: String,
            filters: Array[org.apache.spark.sql.sources.Filter])
        : (Double, Lineage.DeleteStats) = {
      val t0 = System.nanoTime()
      val st = graft.spark.GraftDelete.run(spark, dir, filters)
      ((System.nanoTime() - t0) / 1e9, st)
    }
    def rows(dir: String): Long =
      spark.read.format("graft").load(dir).count()

    val encSec = encode(s"$base/t_range")
    encode(s"$base/t_src")
    val chunks0 = chunkCount(s"$base/t_range")
    println(f"DELBENCH prep rows=$nRows chunks=$chunks0 encode=$encSec%.1fs")

    // range delete: cow on t_range vs naive re-encode from t_src (same bytes)
    val wantRange = rows(s"$base/t_src") // == nRows
    val naiveRangeSec = naive(s"$base/t_src", s"$base/naive_range",
      !(col("doc_id") >= lo && col("doc_id") < hi))
    val (cowRangeSec, stRange) = cow(s"$base/t_range", rangeFilters)
    val survRange = rows(s"$base/t_range")
    require(survRange == rows(s"$base/naive_range"),
      s"range survivors diverge: cow=$survRange")
    require(survRange + stRange.rowsDeleted == wantRange, s"$stRange")
    println(f"DELBENCH range cow=$cowRangeSec%.2fs naive=$naiveRangeSec%.2fs " +
      f"speedup=${naiveRangeSec / cowRangeSec}%.1fx " +
      f"dropped=${stRange.chunksDropped} rewritten=${stRange.chunksRewritten} " +
      f"copied=${stRange.chunksCopied} rowsDeleted=${stRange.rowsDeleted}")

    // source delete: t_src is still pristine (only t_range was mutated) —
    // naive side first (it reads t_src), then the in-place rewrite
    val naiveSrcSec = naive(s"$base/t_src", s"$base/naive_src",
      col("source") =!= "forum")
    val (cowSrcSec, stSrc) = cow(s"$base/t_src", srcFilters)
    val survSrc = rows(s"$base/t_src")
    require(survSrc == rows(s"$base/naive_src"),
      s"source survivors diverge: cow=$survSrc")
    println(f"DELBENCH source cow=$cowSrcSec%.2fs naive=$naiveSrcSec%.2fs " +
      f"speedup=${naiveSrcSec / cowSrcSec}%.1fx " +
      f"dropped=${stSrc.chunksDropped} rewritten=${stSrc.chunksRewritten} " +
      f"copied=${stSrc.chunksCopied} rowsDeleted=${stSrc.rowsDeleted}")

    // post-delete read path sanity: zone-pruned point read over gen'd files
    val probe = spark.read.format("graft").load(s"$base/t_range")
      .filter(col("doc_id") === f"doc-${nRows - 1}%012d").count()
    require(probe == 1, s"point read over gen'd table: $probe")

    // SPARSE shapes — the driver-side all-Keep prefilter's territory: a
    // point delete touches the one partition whose zones cover the id
    // (everything else provably Keep, never scheduled), and a no-match
    // delete schedules NOTHING at all. Cost must be ∝ affected data, not
    // table size.
    val pointId = f"doc-${nRows - 7}%012d"
    val (cowPointSec, stPoint) = cow(s"$base/t_src",
      Array(org.apache.spark.sql.sources.EqualTo("doc_id", pointId)))
    require(stPoint.rowsDeleted == 1, s"point delete: $stPoint")
    println(f"DELBENCH point cow=$cowPointSec%.3fs " +
      f"partsRewritten=${stPoint.partsRewritten} " +
      f"rewritten=${stPoint.chunksRewritten} copied=${stPoint.chunksCopied}")
    val (cowNoneSec, stNone) = cow(s"$base/t_src",
      Array(org.apache.spark.sql.sources.EqualTo("doc_id", "zzz-no-such-doc")))
    require(stNone.rowsDeleted == 0 && stNone.partsRewritten == 0,
      s"no-match delete must touch nothing: $stNone")
    println(f"DELBENCH none cow=$cowNoneSec%.3fs (zero partitions scheduled)")
    println("DELBENCH ok")
    spark.stop()
  }
}
