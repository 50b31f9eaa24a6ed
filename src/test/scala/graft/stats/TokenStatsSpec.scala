package graft.stats

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkTestSession
import graft.io.Corpus

class TokenStatsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  test("aggregator matches a driver-side exact computation") {
    import spark.implicits._
    val rows = (0L until 400L).map(i => Corpus.row(42L, i))
    val ds = spark.createDataset(rows).repartition(7)
    val agg = udaf(new TokenStatsAgg)
    val got = ds.toDF().agg(agg(col("tokens")).as("s"))
      .select("s.*").as[TokenStats].first()
    val allTokens = rows.map(_.tokens)
    assert(got.n_rows == 400L)
    assert(got.n_tokens == allTokens.map(_.length.toLong).sum)
    assert(got.min == allTokens.flatten.min)
    assert(got.max == allTokens.flatten.max)
    val exactRuns = allTokens.map(t =>
      1 + (1 until t.length).count(i => t(i) != t(i - 1))).map(_.toLong).sum
    assert(got.run_count == exactRuns)
    assert(got.distinct == allTokens.flatten.distinct.length.toLong)
  }

  test("merge is associative across partitionings") {
    import spark.implicits._
    val rows = (0L until 300L).map(i => Corpus.row(42L, i))
    val agg = udaf(new TokenStatsAgg)
    def run(parts: Int): TokenStats =
      spark.createDataset(rows).repartition(parts).toDF()
        .agg(agg(col("tokens")).as("s")).select("s.*").as[TokenStats].first()
    assert(run(1) == run(13))
  }

  test("distinct overflows to -1 beyond the cap") {
    import spark.implicits._
    val wide = (0 until 80).map(i =>
      Array.tabulate(1000)(j => i * 1000 + j)) // 80k distinct
    val agg = udaf(new TokenStatsAgg)
    val got = spark.createDataset(wide).repartition(4).toDF("tokens")
      .agg(agg(col("tokens")).as("s")).select("s.*").as[TokenStats].first()
    assert(got.distinct == -1L)
  }
}
