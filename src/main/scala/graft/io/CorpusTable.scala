package graft.io

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Materialized face of the deterministic corpus: writes the seed-42 token
  * table (FIXTURES.md §A) to parquet once per row count, so the SAME bytes
  * are visible to Spark queries and to the driver's DuckDB oracle — the
  * engine's analog of the reference pinning its test inputs as files
  * (the `tests/data` fixtures, golden strings `test_ppmd7.py:10-11`).
  *
  * Two extra per-row columns make run statistics SQL-checkable without
  * trusting the engine's own stats kernel: `row_runs` / `row_max_run` are
  * computed here by a straight loop, independent of ChunkStats/TokenStatsAgg
  * (whose distributed merge they then cross-check via the DuckDB twin).
  */
object CorpusTable {

  /** Repo-local scratch root (driver verifies at sf0.01 => corpus_n5000). */
  final val Root = "/root/repo/data/oracle"

  def path(nRows: Long): String = s"$Root/corpus_n$nRows.parquet"

  /** Materialize (idempotent — keyed by row count, content is a pure
    * function of it) and return the parquet path. */
  def ensure(s: SparkSession, nRows: Long): String = {
    val p = path(nRows)
    val done = new java.io.File(p, "_SUCCESS")
    if (!done.isFile) {
      import s.implicits._
      Corpus.table(s, nRows, partitions = s.sparkContext.defaultParallelism)
        .map { r =>
          var runs = 0
          var maxRun = 0
          var i = 0
          while (i < r.tokens.length) {
            var j = i + 1
            while (j < r.tokens.length && r.tokens(j) == r.tokens(i)) j += 1
            runs += 1
            if (j - i > maxRun) maxRun = j - i
            i = j
          }
          (r.doc_id, r.tokens, r.n_tok, r.source, runs, maxRun)
        }
        .toDF("doc_id", "tokens", "n_tok", "source", "row_runs", "row_max_run")
        .write.mode("overwrite").parquet(p)
    }
    p
  }

  /** The materialized corpus as a DataFrame (base + stats columns). */
  def table(s: SparkSession, nRows: Long): DataFrame =
    s.read.parquet(ensure(s, nRows))
}
