package graft

import org.apache.spark.sql.SparkSession
import graft.engine._
import graft.io.Corpus

/** Same-JVM interleaved A/B of a doc_id join between two arranged graft
  * tables: storage-partitioned (graft.read.spj=true — the scan reports
  * KeyGroupedPartitioning over bucket(n, doc_id) and the join runs with
  * ZERO join-side exchanges) vs the ordinary shuffled sort-merge join
  * (spj off — both sides shuffle). Reps interleave so host-window drift
  * cannot masquerade as a code difference. The join is exactly the shape
  * a 100-TB curation pipeline pays most for: both sides big (no broadcast
  * escape), keyed by doc_id.
  *
  * Run: sbt "Test/runMain graft.DriveSpjBench [nRows] [cpus]"
  */
object DriveSpjBench {
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
    val N = 32 // bucket count == cores: SPJ's task count saturates the host
    val base = java.nio.file.Files.createTempDirectory("graft-spj-ab").toString
    // two corpora over the SAME doc_id domain (the generator is
    // deterministic): a 1:1 join of nRows matches
    Lineage.encodeToDir(Corpus.table(spark, nRows, partitions = N),
      s"$base/a", EncoderConfig(chunkTokens = 1 << 20, numPartitions = N))
    Lineage.encodeToDir(Corpus.table(spark, nRows, partitions = N),
      s"$base/b", EncoderConfig(chunkTokens = 1 << 20, numPartitions = N))
    spark.conf.set("spark.sql.catalog.spjab",
      classOf[graft.spark.GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.spjab.root", s"$base/cat")
    spark.sql("CREATE NAMESPACE spjab.q")
    spark.sql(s"CREATE TABLE spjab.q.a USING graft LOCATION '$base/a'")
    spark.sql(s"CREATE TABLE spjab.q.b USING graft LOCATION '$base/b'")
    // both variants: a REAL sort-merge join (no broadcast), no AQE replans
    // mid-measurement, v2 bucketing available to the spj side
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    spark.conf.set("spark.sql.sources.v2.bucketing.enabled", "true")
    spark.conf.set("spark.sql.sources.v2.bucketing.pushPartValues.enabled",
      "true")

    def joined = spark.sql(
      """SELECT count(*) AS c, sum(a.n_tok + b.n_tok) AS s
        |FROM spjab.q.a a JOIN spjab.q.b b ON a.doc_id = b.doc_id""".stripMargin)
    def run(spj: Boolean): Long = {
      spark.conf.set("graft.read.spj", spj.toString)
      val r = joined.collect()(0)
      require(r.getLong(0) == nRows, s"join rows ${r.getLong(0)} != $nRows")
      r.getLong(0)
    }
    // plan pins, once per variant: SPJ keeps only the global-agg gather
    // exchange; the shuffled plan pays two join exchanges on top of it
    def exchanges(spj: Boolean): Int = {
      spark.conf.set("graft.read.spj", spj.toString)
      joined.queryExecution.executedPlan.toString
        .linesIterator.count(_.contains("Exchange"))
    }
    val exOn = exchanges(spj = true)
    val exOff = exchanges(spj = false)
    require(exOn == 1, s"SPJ plan expected 1 exchange (agg gather), got $exOn")
    require(exOff == 3, s"shuffled plan expected 3 exchanges, got $exOff")

    def time(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    run(spj = true); run(spj = false) // warm (page cache, codegen)
    val reps = (1 to 3).map(_ => (time(run(spj = true)),
      time(run(spj = false))))
    val on = reps.map(_._1).min
    val off = reps.map(_._2).min
    println(f"SPJ-AB spj=$on%.3fs shuffled=$off%.3fs speedup=${off / on}%.2fx " +
      f"rows=$nRows buckets=$N exchanges_spj=$exOn exchanges_shuffled=$exOff")
    spark.stop()
  }
}
