package graft.queries

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestSession
import org.apache.spark.sql.functions.col

/** Pins the LIVE codec_histogram output to the committed golden fixture —
  * the same parquet the DuckDB oracle twin reads. Drift in the codec
  * selector, chunk slicing, or meta format now fails HERE, in-suite, instead
  * of only in the driver's external correctness run. After a DELIBERATE
  * format change, regenerate via `sbt "Test/runMain graft.MakeGolden"` and commit
  * the new fixture alongside the code. */
class CodecHistogramFixtureSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  test("live histogram matches the golden fixture; _total row sums it") {
    val live = EngineQueries.codecHistogram(spark, "/root/testdata/sf0.01")
      .collect().map(r => r.getString(0) -> r).toMap
    val fixture = spark.read
      .parquet("/root/repo/golden/codec_histogram_n5000.parquet")
      .orderBy(col("codec")).collect()
    assert(fixture.nonEmpty, "fixture is empty — run graft.MakeGolden")
    fixture.foreach { f =>
      val l = live.getOrElse(f.getString(0),
        fail(s"live output lost codec row '${f.getString(0)}'"))
      (0 until f.length).foreach { i =>
        assert(l.get(i) == f.get(i),
          s"codec ${f.getString(0)} col $i: live ${l.get(i)} vs fixture ${f.get(i)}")
      }
    }
    assert(live.keySet == fixture.map(_.getString(0)).toSet + "_total",
      "per-codec row set drifted from the fixture")
    // the '_total' row the oracle twin recomputes must equal the fixture sums
    val t = live("_total")
    def sumCol(i: Int): Long = fixture.map(_.getLong(i)).sum
    (1 to 5).foreach { i =>
      assert(t.getLong(i) == sumCol(i), s"_total col $i vs fixture sum")
    }
  }
}
