package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.{col, size, sum}
import graft.engine._
import graft.io.Corpus

/** Same-JVM A/B of the DSv2 row vs columnar read path (graft.read.columnar),
  * interleaved reps so host-window drift cannot masquerade as a code
  * difference. Run: sbt "Test/runMain graft.DriveColumnarAB [nRows] [cpus]" */
object DriveColumnarAB {
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
    val dir = java.nio.file.Files.createTempDirectory("graft-ab").toString
    val parts = 128
    Lineage.encodeToDir(Corpus.table(spark, nRows, partitions = parts), dir,
      EncoderConfig(chunkTokens = 1 << 20, numPartitions = parts))

    def time(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    def g = spark.read.format("graft").load(dir)
    def full(): Unit = {
      g.select(size(col("tokens")).as("n"))
        .agg(sum(col("n").cast("long"))).as[Long].first(); ()
    }
    def rollup(): Unit = {
      g.groupBy("source").agg(sum(col("n_tok").cast("long"))).collect(); ()
    }
    // doc_id-only projection: the meta-only scan whose per-row cost is
    // dominated by doc_id materialization. toRdd.count forces every row
    // through the scan + ColumnarToRow — an agg here would ride the
    // manifest-only pushdown and never open a chunk
    def docScan(): Unit = {
      g.select("doc_id").queryExecution.toRdd.count(); ()
    }
    // warm both paths, then interleave 3 timed reps each
    Seq("true", "false").foreach { v =>
      spark.conf.set("graft.read.columnar", v); full(); rollup(); docScan()
    }
    val reps = for (_ <- 1 to 3) yield {
      spark.conf.set("graft.read.columnar", "true")
      val (fc, rc, dc) = (time(full()), time(rollup()), time(docScan()))
      spark.conf.set("graft.read.columnar", "false")
      val (fr, rr, dr) = (time(full()), time(rollup()), time(docScan()))
      (fc, rc, dc, fr, rr, dr)
    }
    def mn(xs: Seq[Double]) = xs.min
    println(f"AB full-decode columnar=${mn(reps.map(_._1))}%.2fs row=${mn(reps.map(_._4))}%.2fs | rollup columnar=${mn(reps.map(_._2))}%.2fs row=${mn(reps.map(_._5))}%.2fs | doc_id-scan columnar=${mn(reps.map(_._3))}%.2fs row=${mn(reps.map(_._6))}%.2fs (min of 3, interleaved, $nRows rows)")
    // decomposition: engine-path decode (no DSv2), planning-only, and a
    // payload-decode-only pass through the DSv2 reader (tokens w/o strings)
    def engine(): Unit = {
      Lineage.decodeFromDir(spark, dir).map(_.n_tok.toLong).reduce(_ + _); ()
    }
    engine()
    val tEng = (1 to 3).map(_ => time(engine())).min
    val tPlan = (1 to 3).map(_ =>
      time { spark.read.format("graft").load(dir).rdd.getNumPartitions; () }).min
    spark.conf.set("graft.read.columnar", "true")
    println(f"AB2 engine-decode=${tEng}%.2fs planning-only=${tPlan}%.2fs")
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
    spark.stop()
  }
}
