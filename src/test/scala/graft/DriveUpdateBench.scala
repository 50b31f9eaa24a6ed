package graft

import org.apache.spark.sql.SparkSession
import graft.engine._
import graft.io.Corpus

/** Scale evidence for group-based copy-on-write UPDATE: on an nRows-row
  * graft table (32 partitions), time
  *
  *   (a) a POINT update (one doc_id) — runtime group filtering should
  *       confine the rewrite to ONE partition, so the cost tracks the
  *       partition size, not the table;
  *   (b) a BROAD update (source = 'forum', ~1% of rows spread over every
  *       partition) — the honest worst case: every group holds a match,
  *       so the whole table rewrites (copy-on-write's documented limit;
  *       the round-7 outlook's delta-based ops are the escape if this
  *       ever dominates).
  *
  * Both verify exact row counts and the updated values afterward.
  *
  * Run: sbt "Test/runMain graft.DriveUpdateBench [nRows] [cpus]"
  */
object DriveUpdateBench {
  def main(args: Array[String]): Unit = {
    val nRows = args.headOption.map(_.toLong).getOrElse(1000000L)
    val cpus = args.lift(1).getOrElse("32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.driver.host", "localhost")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val N = 32
    val base = java.nio.file.Files.createTempDirectory("graft-upd-ab").toString
    val t0 = System.nanoTime()
    Lineage.encodeToDir(Corpus.table(spark, nRows, partitions = N),
      s"$base/t", EncoderConfig(chunkTokens = 1 << 20, numPartitions = N))
    val encSec = (System.nanoTime() - t0) / 1e9
    spark.conf.set("spark.sql.catalog.updab",
      classOf[graft.spark.GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.updab.root", s"$base/cat")
    spark.sql("CREATE NAMESPACE updab.q")
    spark.sql(s"CREATE TABLE updab.q.t USING graft LOCATION '$base/t'")
    println(f"UPDBENCH prep rows=$nRows encode=$encSec%.1fs")

    def timed(sql: String): Double = {
      val s = System.nanoTime()
      spark.sql(sql)
      (System.nanoTime() - s) / 1e9
    }
    val victim = f"doc-${nRows / 2}%012d"
    val pointSec = timed(
      s"UPDATE updab.q.t SET source = 'curated' WHERE doc_id = '$victim'")
    require(spark.sql(
      s"SELECT source FROM updab.q.t WHERE doc_id = '$victim'")
      .collect()(0).getString(0) == "curated")
    require(spark.table("updab.q.t").count() == nRows)
    println(f"UPDBENCH point update=$pointSec%.2fs (1 row of $nRows)")

    val broadSec = timed(
      "UPDATE updab.q.t SET source = 'forum-x' WHERE source = 'forum'")
    require(spark.sql(
      "SELECT count(*) FROM updab.q.t WHERE source = 'forum'")
      .collect()(0).getLong(0) == 0)
    require(spark.table("updab.q.t").count() == nRows)
    println(f"UPDBENCH broad update=$broadSec%.2fs (~1%% of rows, every " +
      f"partition affected => full copy-on-write rewrite)")
    println("UPDBENCH ok")
    spark.stop()
  }
}
