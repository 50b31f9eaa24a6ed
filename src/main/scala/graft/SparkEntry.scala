package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.queries._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` spans three families:
  *  - engine operators (encode/decode/roundtrip/lineage; SURVEY.md §2
  *    Table A) — not SQL-expressible, rows-only check + ScalaTest suite;
  *  - relational coverage (Table B) — each with a DuckDB-ANSI oracle twin;
  *  - training-pipeline operators (dedup / similarity / text / multimodal)
  *    — oracled where exactly expressible in both dialects.
  */
object SparkEntry {

  /** Flagship query on sf=0.001: full corpus->encode->decode->verify rollup;
    * driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    EngineQueries.encodeRoundtrip(spark, "/root/testdata/sf0.001")

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // engine operators (rows-only)
    "encode_roundtrip" -> (EngineQueries.encodeRoundtrip _),
    "encode_docs" -> (EngineQueries.encodeDocs _),
    "codec_histogram" -> (EngineQueries.codecHistogram _),
    "lineage_roundtrip" -> (EngineQueries.lineageRoundtrip _),
    "graft_source" -> (EngineQueries.graftSource _),
    "graft_source_stats" -> (EngineQueries.graftSourceStats _),
    "graft_source_group" -> (EngineQueries.graftSourceGroup _),
    "graft_source_contains" -> (EngineQueries.graftSourceContains _),
    "dedup_clusters" -> (DedupQueries.dedupClusters _),
    "graft_source_in" -> (EngineQueries.graftSourceIn _),
    "graft_catalog" -> (EngineQueries.graftCatalog _),
    "graft_spj" -> (EngineQueries.graftSpj _),
    "graft_delete" -> (EngineQueries.graftDelete _),
    "graft_update" -> (EngineQueries.graftUpdate _),
    "encode_expr" -> (EngineQueries.encodeExpr _),
    "token_stats" -> (EngineQueries.tokenStats _),
    "source_distinct_tokens" -> (EngineQueries.sourceDistinctTokens _),
    "source_approx_distinct" -> (EngineQueries.sourceApproxDistinctTokens _),
    // relational coverage (oracled)
    "q1_agg" -> (RelationalQueries.q1Agg _),
    "q2_join_agg" -> (RelationalQueries.q2JoinAgg _),
    "q3_broadcast_join" -> (RelationalQueries.q3BroadcastJoin _),
    "q4_window" -> (RelationalQueries.q4Window _),
    "q5_topk" -> (RelationalQueries.q5TopK _),
    "q6_distinct" -> (RelationalQueries.q6Distinct _),
    "q7_setop" -> (RelationalQueries.q7SetOp _),
    "q8_semi_anti" -> (RelationalQueries.q8SemiAnti _),
    "q9_scalar_fns" -> (RelationalQueries.q9ScalarFns _),
    "q10_rollup" -> (RelationalQueries.q10Rollup _),
    "q11_time_window" -> (RelationalQueries.q11TimeWindow _),
    "q12_bucketed_join" -> (RelationalQueries.q12BucketedJoin _),
    "q13_pivot" -> (RelationalQueries.q13Pivot _),
    // text pipeline
    "doc_token_count" -> (TextQueries.tokenCount _),
    "doc_token_count_bpe" -> (TextQueries.tokenCountBpe _),
    "doc_quality" -> (TextQueries.qualityScore _),
    "doc_langid" -> (TextQueries.langId _),
    "doc_fingerprint" -> (TextQueries.fingerprint _),
    "doc_compress_shared" -> (TextQueries.docCompressShared _),
    // dedup pipeline
    "dedup_exact" -> (DedupQueries.dedupExact _),
    "dedup_minhash" -> (DedupQueries.dedupMinhash _),
    "dedup_simhash" -> (DedupQueries.dedupSimhash _),
    "dedup_tokens" -> (DedupQueries.dedupTokens _),
    "dedup_ngram" -> (DedupQueries.dedupNgram _),
    // similarity search
    "ann_bruteforce" -> (AnnQueries.annBruteForce _),
    "ann_lsh" -> (AnnQueries.annLsh _),
    "ann_ivf" -> (AnnQueries.annIvf _),
    "ann_recall" -> (AnnQueries.annRecall _),
    "dedup_embedding" -> (AnnQueries.dedupEmbedding _),
    // training-data curation
    "seq_split" -> (PackQueries.seqSplit _),
    "seq_len_hist" -> (PackQueries.seqLenHist _),
    "seq_pack" -> (PackQueries.seqPack _),
    // multimodal plumbing
    "multimodal_features" -> (MultimodalQueries.multimodalFeatures _),
  )

  /** DuckDB-ANSI oracle twins (same column names/order as the Spark side;
    * tables resolve to the sfDir parquet files). Engine/sketch queries are
    * deliberately absent (not SQL-expressible) -> rows-only check. */
  def oracleSql: Map[String, String] = Map(
    "q1_agg" -> RelationalQueries.q1Sql,
    "q2_join_agg" -> RelationalQueries.q2Sql,
    "q3_broadcast_join" -> RelationalQueries.q3Sql,
    "q4_window" -> RelationalQueries.q4Sql,
    "q5_topk" -> RelationalQueries.q5Sql,
    "q6_distinct" -> RelationalQueries.q6Sql,
    "q7_setop" -> RelationalQueries.q7Sql,
    "q8_semi_anti" -> RelationalQueries.q8Sql,
    "q9_scalar_fns" -> RelationalQueries.q9Sql,
    "q10_rollup" -> RelationalQueries.q10Sql,
    "q11_time_window" -> RelationalQueries.q11Sql,
    "q12_bucketed_join" -> RelationalQueries.q12Sql,
    "q13_pivot" -> RelationalQueries.q13Sql,
    "doc_token_count" -> TextQueries.tokenCountSql,
    "doc_quality" -> TextQueries.qualityScoreSql,
    "dedup_exact" -> DedupQueries.dedupExactSql,
    "ann_bruteforce" -> AnnQueries.annBruteForceSql,
    // corpus-table twins: the query materializes the deterministic corpus
    // to /root/repo/data/oracle/corpus_n5000.parquet (CorpusTable.ensure);
    // DuckDB recomputes over the identical bytes
    "token_stats" -> EngineQueries.tokenStatsSql,
    // per-codec rows: deterministic golden fixture (engine-specific sizes
    // under a FIXED partitioning); '_total' row: corpus-recomputed tokens
    "codec_histogram" -> EngineQueries.codecHistogramSql,
    "encode_roundtrip" -> EngineQueries.encodeRoundtripSql,
    "encode_docs" -> EngineQueries.encodeDocsSql,
    "lineage_roundtrip" -> EngineQueries.lineageRoundtripSql,
    // the DSv2 format("graft") read path: rollup recomputed by DuckDB from
    // the materialized corpus — column-pruned source scan in the hard channel
    "graft_source" -> EngineQueries.graftSourceSql,
    "graft_source_stats" -> EngineQueries.graftSourceStatsSql,
    "graft_source_group" -> EngineQueries.graftSourceGroupSql,
    "graft_source_contains" -> EngineQueries.graftSourceContainsSql,
    "dedup_clusters" -> DedupQueries.dedupClustersSql,
    "graft_source_in" -> EngineQueries.graftSourceInSql,
    // named-table path: CREATE TABLE ... USING graft + spark.table — same
    // manifest-only grouped scan, reached through a catalog NAME
    "graft_catalog" -> EngineQueries.graftCatalogSql,
    // storage-partitioned join: shuffle-free same-bucketing join, values
    // recomputed by a DuckDB self-join over the same corpus (the query
    // itself asserts the zero-join-exchange plan in-line)
    "graft_spj" -> EngineQueries.graftSpjSql,
    "graft_delete" -> EngineQueries.graftDeleteSql,
    "graft_update" -> EngineQueries.graftUpdateSql,
    "seq_split" -> PackQueries.seqSplitSql,
    "seq_len_hist" -> PackQueries.seqLenHistSql,
    // packing is a sequential fold (not ANSI-SQL-expressible): pinned by an
    // independent Python replica, tools/gen_pack_fixtures.py
    "seq_pack" -> PackQueries.seqPackSql,
    "source_distinct_tokens" -> EngineQueries.sourceDistinctTokensSql,
    "encode_expr" -> EngineQueries.encodeExprSql,
    "dedup_tokens" -> DedupQueries.dedupTokensSql,
    // fixture twins: independent Python recomputation of the text kernels
    // (tools/gen_doc_fixtures.py -> golden/doc_fixtures_sf0.01.parquet)
    "doc_token_count_bpe" -> TextQueries.tokenCountBpeSql,
    "doc_compress_shared" -> TextQueries.docCompressSharedSql,
    "doc_fingerprint" -> TextQueries.fingerprintSql,
    "doc_langid" -> TextQueries.langIdSql,
    // whole-operator replicas: tools/gen_ann_fixtures.py reimplements the
    // LSH bucketing + cosine + guard from scratch in Python and pins the
    // full expected output
    "ann_lsh" -> AnnQueries.annLshSql,
    "ann_ivf" -> AnnQueries.annIvfSql,
    "ann_recall" -> AnnQueries.annRecallSql,
    "dedup_embedding" -> AnnQueries.dedupEmbeddingSql,
    "multimodal_features" -> MultimodalQueries.multimodalFeaturesSql,
    "dedup_minhash" -> DedupQueries.dedupMinhashSql,
    "dedup_simhash" -> DedupQueries.dedupSimhashSql,
    "dedup_ngram" -> DedupQueries.dedupNgramSql,
  )
}
