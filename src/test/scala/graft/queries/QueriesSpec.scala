package graft.queries

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestSession
import graft.io.Corpus

/** Smoke + semantic checks for the driver query families (the oracled ones
  * are verified externally against DuckDB; these cover the rows-only ones). */
class QueriesSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  test("salted exact-distinct equals naive distinct per source") {
    val got = EngineQueries.sourceDistinctTokens(spark, sf)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val n = math.min(EngineQueries.rowsForDir(sf), 20000L)
    val rows = Corpus.table(spark, n, partitions = 4).collect()
    val naive = rows.groupBy(_.source)
      .map { case (s, rs) => s -> rs.flatMap(_.tokens).distinct.length.toLong }
    assert(got == naive)
  }

  test("approx distinct lands within 5% of the exact salted distinct") {
    val exact = EngineQueries.sourceDistinctTokens(spark, sf)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val approx = EngineQueries.sourceApproxDistinctTokens(spark, sf)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(approx.keySet == exact.keySet)
    exact.foreach { case (src, ex) =>
      val ap = approx(src)
      assert(math.abs(ap - ex).toDouble / ex < 0.05, s"$src: $ap vs $ex")
    }
  }

  test("entry() returns rows with zero mismatches") {
    val out = graft.SparkEntry.entry(spark).collect()
    assert(out.nonEmpty)
    val mi = out.head.fieldIndex("mismatches")
    assert(out.forall(_.getLong(mi) == 0L))
  }

  test("every SparkEntry query returns rows on sf0.001") {
    val failures = graft.SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (name, fn) =>
        try {
          if (fn(spark, sf).count() > 0) None else Some(s"$name: 0 rows")
        } catch { case e: Throwable => Some(s"$name: ${e.getMessage}") }
    }
    assert(failures.isEmpty, failures.mkString("; "))
  }

  test("oracleSql keys are a subset of queries keys") {
    val extra = graft.SparkEntry.oracleSql.keySet -- graft.SparkEntry.queries.keySet
    assert(extra.isEmpty, s"oracle without query: $extra")
  }
}
