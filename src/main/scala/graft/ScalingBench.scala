package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.sum
import graft.engine.{Decoder, Encoder, EncoderConfig}
import graft.io.Corpus

/** N -> 4N scaling evidence (BASELINE.json north rule). No real cluster in
  * this sandbox, so the same job runs at two parallelism levels on identical
  * input — local[8] vs local[32] on the 32-vCPU host — and we report
  * throughput at both plus efficiency (tput_4N / tput_N) / 4. Results go
  * into BASELINE.md.
  *
  * Configuration is the at-scale shape: encode is PARTITION-LOCAL
  * (numPartitions=0, no shuffle) — on a real cluster you encode where the
  * data lives; a global reshuffle of the token table would move the whole
  * 100 TB through the network before compressing it. The input is generated
  * directly at the target partition count (4x cores so the task tail keeps
  * every core busy), identically at both levels.
  *
  * Run: sbt "runMain graft.ScalingBench [nRows] [cpusCsv]" */
object ScalingBench {
  def main(args: Array[String]): Unit = {
    val nRows = args.headOption.map(_.toLong).getOrElse(500000L)
    val cpusList = args.lift(1).getOrElse("8,32").split(",").map(_.toInt)
    val reps = 3
    val results = cpusList.map { cpus =>
      val spark = SparkSession.builder()
        .master(s"local[$cpus]")
        .appName(s"graft-scaling-$cpus")
        .config("spark.sql.shuffle.partitions", cpus.toString)
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.host", "localhost")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
      spark.sparkContext.setLogLevel("WARN")
      import spark.implicits._
      val parts = args.lift(2).map(_.toInt).getOrElse(256) // fixed across levels: identical chunking
      val corpus = Corpus.table(spark, nRows, partitions = parts).cache()
      val nTokens = corpus.map(_.n_tok.toLong).reduce(_ + _) // force cache
      val cfg = EncoderConfig(chunkTokens = args.lift(3).map(_.toInt).getOrElse(1 << 20), numPartitions = 0)
      // timed region is the transform itself (reduce over chunk sizes), not
      // a memory-cache write; one full-size untimed rep JIT-warms the kernels
      def encodeOnce(): Long =
        Encoder.encodeTable(corpus, cfg).map(_.enc_bytes).reduce(_ + _)
      def gcMillis(): Long = {
        import scala.jdk.CollectionConverters._
        java.lang.management.ManagementFactory.getGarbageCollectorMXBeans
          .asScala.map(_.getCollectionTime).sum
      }
      def cpuTicks(): (Long, Long) = { // (utime, stime) of this process
        val f = scala.io.Source.fromFile("/proc/self/stat").mkString.split(" ")
        (f(13).toLong, f(14).toLong)
      }
      val encBytes = encodeOnce() // warm
      val tEnc = (1 to reps).map { i =>
        val g0 = gcMillis()
        val (u0, s0) = cpuTicks()
        val t0 = System.nanoTime(); encodeOnce()
        val sec = (System.nanoTime() - t0) / 1e9
        val (u1, s1) = cpuTicks()
        System.err.println(f"[scaling] cpus=$cpus enc rep$i: $sec%.2fs gc=${gcMillis() - g0}ms user=${(u1 - u0) / 100.0}%.1fs sys=${(s1 - s0) / 100.0}%.1fs")
        sec
      }.min
      // decode timing from a materialized (cached, untimed) chunk table
      val chunks = Encoder.encodeTable(corpus, cfg).cache()
      chunks.count()
      def decodeOnce(): Long =
        Decoder.decodeTable(chunks).map(_.n_tok.toLong).reduce(_ + _)
      require(decodeOnce() == nTokens) // warm + correctness
      val tDec = (1 to reps).map { _ =>
        val t0 = System.nanoTime(); decodeOnce(); (System.nanoTime() - t0) / 1e9
      }.min
      chunks.unpersist(true)
      corpus.unpersist(true)
      spark.stop()
      println(f"""{"cpus":$cpus,"rows":$nRows,"tokens":$nTokens,"encode_sec":$tEnc%.3f,"decode_sec":$tDec%.3f,"encode_tokens_per_sec":${(nTokens / tEnc).toLong},"decode_tokens_per_sec":${(nTokens / tDec).toLong},"enc_bytes":$encBytes}""")
      (cpus, nTokens, tEnc, tDec, encBytes)
    }
    if (results.length >= 2) {
      val (c0, tok, e0, d0, bytes0) = results(0)
      val (c1, _, e1, d1, bytes1) = results(results.length - 1)
      // threaded-equivalence (ThreadDecoder.c recast): identical output bytes
      // at every parallelism level (chunking is fixed across levels)
      require(bytes0 == bytes1,
        s"parallelism changed the encoded bytes: $bytes0 vs $bytes1")
      val factor = c1.toDouble / c0
      val effEnc = (tok / e1) / (tok / e0) / factor
      val effDec = (tok / d1) / (tok / d0) / factor
      println(f"""{"scaling":"local[$c0]->local[$c1]","encode_efficiency":$effEnc%.3f,"decode_efficiency":$effDec%.3f}""")
    }
  }
}
