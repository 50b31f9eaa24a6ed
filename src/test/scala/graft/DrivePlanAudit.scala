package graft

import graft.queries._

/** Prints formatted physical plans of representative queries for the plan
  * audit (PLANS.md). Run: sbt "Test/runMain graft.DrivePlanAudit" */
object DrivePlanAudit {
  def main(args: Array[String]): Unit = {
    val spark = SparkTestSession.spark
    val sf = "/root/testdata/sf0.01"
    def show(name: String, df: org.apache.spark.sql.DataFrame): Unit = {
      println(s"\n===== $name =====")
      println(df.queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted")))
    }
    show("q3_broadcast_join (filter pushdown + broadcast + pruning)",
      RelationalQueries.q3BroadcastJoin(spark, sf))
    show("q1_agg (partial/final agg)", RelationalQueries.q1Agg(spark, sf))
    show("doc_token_count (column pruning)", TextQueries.tokenCount(spark, sf))
    show("ann_bruteforce (broadcast + window topk)",
      AnnQueries.annBruteForce(spark, sf))
    show("source_distinct_tokens (salted two-phase distinct)",
      EngineQueries.sourceDistinctTokens(spark, sf))
    show("dedup_exact (32-byte digest shuffle key, not the document)",
      DedupQueries.dedupExact(spark, sf))
    show("dedup_minhash (max-bucket guard: aggregate + left-semi)",
      DedupQueries.dedupMinhash(spark, sf))
    show("seq_pack (single hash exchange + in-partition sort, no collect)",
      PackQueries.seqPack(spark, sf))
    show("q12_bucketed_join (no exchange below the sort-merge join)",
      RelationalQueries.q12BucketedJoin(spark, sf))
    show("ann_ivf (probe equi-join only: NO full-corpus cross join; the " +
      "exact-recall audit lives in the separate ann_recall query)",
      AnnQueries.annIvf(spark, sf))
    show("dedup_embedding (banded guard: aggregate + left-semi, drop-frac " +
      "broadcast)", AnnQueries.dedupEmbedding(spark, sf))
    show("q13_pivot (single-scan conditional aggregation)",
      RelationalQueries.q13Pivot(spark, sf))
    show("doc_compress_shared (train-once sample + broadcast table + " +
      "partition-local code; the aggregate is the only shuffle)",
      TextQueries.docCompressShared(spark, sf))
    // round-5 DSv2 pushdown surface
    show("graft_source_stats (manifest-only aggregate: zero chunk opens)",
      EngineQueries.graftSourceStats(spark, sf))
    show("graft_source_contains (array_contains -> containment probe: " +
      "zone map + TokenSketch chunk pruning at planning, exact residual)",
      EngineQueries.graftSourceContains(spark, sf))
    show("graft_source_in (pushed doc_id IN-list: binary-searched UTF-8 " +
      "zone test)", EngineQueries.graftSourceIn(spark, sf))
    spark.stop()
  }
}
