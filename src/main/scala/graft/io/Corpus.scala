package graft.io

import org.apache.spark.sql.{Dataset, SparkSession}
import graft.engine.SeqRow

/** Deterministic synthetic token corpus — FIXTURES.md §A, the engine's analog
  * of the reference's test fixtures (golden strings `test_ppmd7.py:10-11`,
  * the 1.2 MB CSV corpus, hypothesis fuzz inputs `test_fuzzer.py:15-22`).
  *
  * Pure function of (seed, row index): every row is generated from its own
  * splitmix64 stream keyed on mix(seed, i), so the table is byte-identical
  * across runs, partition counts, and parallelism levels — no shared Random.
  */
object Corpus {
  final val V = 50257 // vocab size

  // archetype shares per FIXTURES.md: constant 5, runny 15, narrow 25,
  // zipf 35, hi-entropy 15, edge 5 (percent)
  private val archCum = Array(0.05, 0.20, 0.45, 0.80, 0.95, 1.0)
  // source skew: web .70 books .15 code .10 wiki .04 forum .01
  private val srcCum = Array(0.70, 0.85, 0.95, 0.99, 1.0)
  private val srcName = Array("web", "books", "code", "wiki", "forum")

  def table(spark: SparkSession, nRows: Long, seed: Long = 42L,
            partitions: Int = 32): Dataset[SeqRow] = {
    import spark.implicits._
    spark.range(0L, nRows, 1L, partitions).mapPartitions { it =>
      it.map(i => row(seed, i))
    }
  }

  /** Generate row i — pure and allocation-local. */
  def row(seed: Long, i: Long): SeqRow = {
    val rng = new Rng(mix(seed, i))
    val docId = f"doc-$i%012d"
    val source = pick(rng.nextDouble(), srcCum, srcName)
    val arch = pickIdx(rng.nextDouble(), archCum)
    val tokens = arch match {
      case 0 => constant(rng)
      case 1 => runny(rng)
      case 2 => narrow(rng)
      case 3 => zipf(rng)
      case 4 => hiEntropy(rng)
      case _ => edge(rng)
    }
    SeqRow(docId, tokens, tokens.length, source)
  }

  // ---- archetypes ------------------------------------------------------------
  private def lognormalLen(rng: Rng): Int = {
    // median 512, sigma 1.0, clamp [1, 4096] (FIXTURES.md)
    val u1 = math.max(rng.nextDouble(), 1e-12)
    val u2 = rng.nextDouble()
    val z = math.sqrt(-2.0 * math.log(u1)) * math.cos(2.0 * math.Pi * u2)
    val len = math.exp(math.log(512.0) + z)
    math.max(1, math.min(4096, len.toInt))
  }

  private def constant(rng: Rng): Array[Int] = {
    val n = lognormalLen(rng)
    // one sample, repeated — Array.fill(n)(rng.nextInt(V)) would re-draw per
    // element and silently turn the RLE-winning archetype into hi-entropy
    val v = rng.nextInt(V)
    Array.fill(n)(v)
  }

  private def runny(rng: Rng): Array[Int] = {
    val n = lognormalLen(rng)
    val out = new Array[Int](n)
    var i = 0
    while (i < n) {
      val v = zipfSample(rng)
      // geometric run length, mean 32
      var run = 1
      while (run < 1024 && rng.nextDouble() > 1.0 / 32.0) run += 1
      var j = 0
      while (j < run && i < n) { out(i) = v; i += 1; j += 1 }
    }
    out
  }

  private def narrow(rng: Rng): Array[Int] = {
    val n = lognormalLen(rng)
    val k = 4 + rng.nextInt(7) // window 2^k, k in [4,10]
    val width = 1 << k
    val base = rng.nextInt(V - width)
    Array.fill(n)(base + rng.nextInt(width))
  }

  private def zipf(rng: Rng): Array[Int] =
    Array.fill(lognormalLen(rng))(zipfSample(rng))

  private def hiEntropy(rng: Rng): Array[Int] =
    Array.fill(lognormalLen(rng))(rng.nextInt(V))

  private def edge(rng: Rng): Array[Int] = rng.nextInt(4) match {
    case 0 => Array.fill(1 + rng.nextInt(2))(V - 1) // len {1,2} max tokens
    case 1 => new Array[Int](lognormalLen(rng))     // all zeros
    case 2 => // sawtooth
      val n = lognormalLen(rng)
      val period = 1 + rng.nextInt(255)
      Array.tabulate(n)(j => j % (period + 1))
    case _ => Array(0) // minimal row
  }

  /** Zipf(s=1.1) over [0, V) via inverse-CDF approximation:
    * k = (1 + u*(V^(1-s) - 1))^(1/(1-s)), 1-s = -0.1. */
  private val vPow = math.pow(V.toDouble, -0.1)
  private def zipfSample(rng: Rng): Int = {
    val u = rng.nextDouble()
    val k = math.pow(1.0 + u * (vPow - 1.0), -10.0)
    val v = k.toInt - 1
    if (v < 0) 0 else if (v >= V) V - 1 else v
  }

  // ---- prng -------------------------------------------------------------------
  private def pickIdx(u: Double, cum: Array[Double]): Int = {
    var i = 0
    while (i < cum.length - 1 && u >= cum(i)) i += 1
    i
  }
  private def pick(u: Double, cum: Array[Double], names: Array[String]): String =
    names(pickIdx(u, cum))

  def mix(seed: Long, i: Long): Long = {
    var z = seed ^ (i * 0x9E3779B97F4A7C15L)
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z ^ (z >>> 31)
  }

  /** splitmix64 — public-domain PRNG (Steele et al.), deterministic per row. */
  final class Rng(private var s: Long) {
    def nextLong(): Long = {
      s += 0x9E3779B97F4A7C15L
      var z = s
      z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
      z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
      z ^ (z >>> 31)
    }
    def nextDouble(): Double = (nextLong() >>> 11) * 1.1102230246251565e-16
    def nextInt(bound: Int): Int = ((nextLong() >>> 1) % bound).toInt
  }
}
