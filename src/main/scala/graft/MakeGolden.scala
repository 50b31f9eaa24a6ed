package graft

import org.apache.spark.sql.{SaveMode, SparkSession}
import org.apache.spark.sql.functions.col

/** Regenerates the committed golden fixtures that pin engine-specific bytes
  * (`sbt "runMain graft.MakeGolden"`). Today that is
  * `golden/codec_histogram_n5000.parquet`: the per-codec rows of
  * EngineQueries.codecHistogram at the driver's sf0.01 scale (5,000-row
  * corpus under the FIXED 32-way partitioning, so the histogram is a pure
  * function of the corpus bytes — LineageSpec/ScalingBench prove encode
  * determinism). Run after any DELIBERATE codec or meta-format change and
  * commit the new fixture; CodecHistogramFixtureSpec fails `sbt test` when
  * live output drifts from the fixture without this regeneration, so the
  * hard-channel evidence can't silently rot. */
object MakeGolden {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[8]")
      .appName("graft-make-golden")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.driver.host", "localhost")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    writeCodecHistogram(spark, "/root/repo/golden/codec_histogram_n5000.parquet")
    spark.stop()
  }

  /** Per-codec rows only — the '_total' row is recomputed from the corpus by
    * the DuckDB twin, so pinning it would be circular. Written as ONE parquet
    * FILE (not a directory): the twin's read_parquet targets the bare path. */
  def writeCodecHistogram(spark: SparkSession, target: String): Unit = {
    val df = graft.queries.EngineQueries
      .codecHistogram(spark, "/root/testdata/sf0.01")
      .filter(col("codec") =!= "_total")
      .orderBy(col("codec"))
      .coalesce(1)
    val tmp = java.nio.file.Files.createTempDirectory("graft-golden").toString
    df.write.mode(SaveMode.Overwrite).parquet(tmp)
    val part = new java.io.File(tmp).listFiles()
      .find(f => f.getName.startsWith("part-") && f.getName.endsWith(".parquet"))
      .getOrElse(sys.error(s"no part file written under $tmp"))
    val dst = java.nio.file.Paths.get(target)
    java.nio.file.Files.move(part.toPath, dst,
      java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    println(s"wrote $target")
  }
}
