package graft.queries

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestSession

/** q12 is only worth having if the bucketing actually eliminates the join
  * shuffle — assert it on the physical plan, and the result against a
  * plain (shuffled) twin. */
class BucketedJoinSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  test("bucketed sort-merge join has no shuffle below the join") {
    val df = RelationalQueries.q12BucketedJoin(spark, sf)
    val plan = df.queryExecution.executedPlan.toString
    val joinAt = plan.indexOf("SortMergeJoin")
    assert(joinAt >= 0, s"expected SortMergeJoin in:\n$plan")
    // everything BELOW the join (scans of the bucketed tables) must be
    // exchange-free; the only allowed Exchange is above it (final agg)
    val below = plan.substring(joinAt)
    assert(!below.contains("Exchange"),
      s"shuffle below the bucketed join:\n$below")
  }

  test("bucketed join result equals the plain shuffled join") {
    import org.apache.spark.sql.functions._
    val got = RelationalQueries.q12BucketedJoin(spark, sf).collect().map(_.toSeq)
    val o = spark.read.parquet(s"$sf/orders.parquet")
    val l = spark.read.parquet(s"$sf/lineitem.parquet")
    val want = o.join(l, o("o_orderkey") === l("l_orderkey"))
      .groupBy(col("o_orderstatus"))
      .agg(count(lit(1)).as("n_lines"),
        round(sum(col("l_extendedprice")), 2).as("revenue"))
      .orderBy(col("o_orderstatus")).collect().map(_.toSeq)
    assert(got.toSeq == want.toSeq)
  }
}
