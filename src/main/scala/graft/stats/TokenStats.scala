package graft.stats

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import graft.codec.ChunkStats

/** Mergeable per-group token statistics — the Spark-aggregate face of the
  * selector's stats pass (SURVEY.md §7 module 2). The reference's analog is
  * the adaptive model's frequency tables (`Ppmd7.c:661-710`); ours are
  * associative partial aggregates so Catalyst can combine map-side
  * (partial) and reduce-side (final) without ever moving token arrays.
  *
  * Semantics notes:
  *  - `runCount`/`maxRun` count runs WITHIN each array (rows are the codec's
  *    block unit; cross-row runs don't exist in the encoded form).
  *  - `distinct` is exact up to DistinctCap, then marked overflowed — the
  *    same bounded-memory policy as the codec's dict path (A18/A19 analog).
  */
final case class TokenStats(
    n_rows: Long, n_tokens: Long, min: Int, max: Int,
    run_count: Long, max_run: Long,
    distinct: Long, // -1 if overflowed (lower bound = DistinctCap)
    mean_run: Double)

final case class StatsBuf(
    var nRows: Long, var nTokens: Long, var min: Int, var max: Int,
    var runCount: Long, var maxRun: Long,
    var distinct: Array[Int], // sorted unique values
    var overflow: Boolean)

class TokenStatsAgg extends Aggregator[Array[Int], StatsBuf, TokenStats] {
  import TokenStatsAgg._

  override def zero: StatsBuf =
    StatsBuf(0L, 0L, Int.MaxValue, Int.MinValue, 0L, 0L, Array.emptyIntArray,
      overflow = false)

  override def reduce(b: StatsBuf, tokens: Array[Int]): StatsBuf = {
    if (tokens == null || tokens.isEmpty) { b.nRows += 1; return b }
    val st = ChunkStats.analyze(tokens)
    b.nRows += 1
    b.nTokens += tokens.length
    if (st.min < b.min) b.min = st.min
    if (st.max > b.max) b.max = st.max
    b.runCount += st.runCount
    if (st.maxRun > b.maxRun) b.maxRun = st.maxRun
    if (!b.overflow) {
      if (st.card < 0) b.overflow = true
      else {
        b.distinct = mergeSorted(b.distinct, st.sortedDistinct)
        if (b.distinct.length > DistinctCap) b.overflow = true
      }
    }
    b
  }

  override def merge(a: StatsBuf, b: StatsBuf): StatsBuf = {
    a.nRows += b.nRows
    a.nTokens += b.nTokens
    if (b.min < a.min) a.min = b.min
    if (b.max > a.max) a.max = b.max
    a.runCount += b.runCount
    if (b.maxRun > a.maxRun) a.maxRun = b.maxRun
    if (a.overflow || b.overflow) a.overflow = true
    else {
      a.distinct = mergeSorted(a.distinct, b.distinct)
      if (a.distinct.length > DistinctCap) a.overflow = true
    }
    a
  }

  override def finish(b: StatsBuf): TokenStats =
    TokenStats(b.nRows, b.nTokens,
      if (b.nTokens == 0) 0 else b.min,
      if (b.nTokens == 0) 0 else b.max,
      b.runCount, b.maxRun,
      if (b.overflow) -1L else b.distinct.length.toLong,
      if (b.runCount == 0) 0.0 else b.nTokens.toDouble / b.runCount)

  override def bufferEncoder: Encoder[StatsBuf] = Encoders.product[StatsBuf]
  override def outputEncoder: Encoder[TokenStats] = Encoders.product[TokenStats]
}

object TokenStatsAgg {
  /** Same bound as the codec's dict cap. */
  final val DistinctCap: Int = graft.codec.ChunkStats.DictCap

  /** Merge two sorted unique arrays into one sorted unique array. */
  def mergeSorted(a: Array[Int], b: Array[Int]): Array[Int] = {
    if (a.isEmpty) return b
    if (b.isEmpty) return a
    val out = new Array[Int](a.length + b.length)
    var i = 0; var j = 0; var k = 0
    while (i < a.length && j < b.length) {
      val av = a(i); val bv = b(j)
      if (av == bv) { out(k) = av; i += 1; j += 1 }
      else if (av < bv) { out(k) = av; i += 1 }
      else { out(k) = bv; j += 1 }
      k += 1
    }
    while (i < a.length) { out(k) = a(i); i += 1; k += 1 }
    while (j < b.length) { out(k) = b(j); j += 1; k += 1 }
    if (k == out.length) out else java.util.Arrays.copyOf(out, k)
  }
}
