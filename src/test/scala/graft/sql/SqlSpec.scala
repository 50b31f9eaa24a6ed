package graft.sql

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkTestSession
import graft.io.Corpus

class SqlSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("encode_tokens/decode_tokens column roundtrip") {
    val ds = Corpus.table(spark, 200, partitions = 2)
    val out = ds.select(col("doc_id"), col("tokens"),
        GraftFunctions.decode_tokens(
          GraftFunctions.encode_tokens(col("tokens"))).as("back"))
      .filter(expr("tokens <=> back") === lit(false))
    assert(out.count() == 0L)
  }

  test("SQL-registered functions work and compress") {
    GraftFunctions.register(spark)
    Corpus.table(spark, 100, partitions = 1).createOrReplaceTempView("corpus_sql")
    val row = spark.sql(
      """SELECT sum(length(encode_tokens(tokens))) AS enc,
        |       sum(4 * size(tokens)) AS raw,
        |       sum(CASE WHEN decode_tokens(encode_tokens(tokens)) = tokens
        |                THEN 0 ELSE 1 END) AS mismatches
        |FROM corpus_sql""".stripMargin).collect()(0)
    assert(row.getLong(2) == 0L, "roundtrip mismatch")
    assert(row.getLong(0) < row.getLong(1), "no compression")
  }

  test("compress_text/decompress_text column roundtrip incl. unicode") {
    val docs = Seq("short", "", "日本語 ∞ 😀 text",
      ("the quick brown fox jumps over the lazy dog " * 60).trim)
      .toDF("text")
    val out = docs.select(col("text"),
        GraftFunctions.decompress_text(
          GraftFunctions.compress_text(col("text"))).as("back"))
      .collect()
    out.foreach(r => assert(r.getString(0) == r.getString(1)))
    // repetitive text must compress through the column form
    val enc = docs.select(
      org.apache.spark.sql.functions.length(
        GraftFunctions.compress_text(col("text"))).as("n")).collect()
    assert(enc.last.getInt(0) < 2640 / 3, s"no compression: ${enc.last}")
  }

  test("fold rule removes decode(encode(x)) from the optimized plan") {
    GraftFunctions.register(spark)
    val ds = Corpus.table(spark, 50, partitions = 1)
    val df = ds.select(GraftFunctions.decode_tokens(
      GraftFunctions.encode_tokens(col("tokens"))).as("t"))
    val optimized = df.queryExecution.optimizedPlan.toString
    assert(!optimized.contains("encode_tokens"),
      s"encode_tokens survived optimization:\n$optimized")
  }

  test("expression stays inside WholeStageCodegen") {
    val ds = Corpus.table(spark, 50, partitions = 1)
    val df = ds.select(GraftFunctions.encode_tokens(col("tokens")).as("b"))
    // the '*(n)' prefix marks operators inside a WholeStageCodegen stage
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.linesIterator.next().trim.startsWith("*("),
      s"encode projection not codegen'd:\n$plan")
    assert(df.select(sum(length(col("b")))).first().getLong(0) > 0)
  }

  test("cosine_sim matches the HOF formulation bit-exactly and codegens") {
    import org.apache.spark.sql.functions.{aggregate, zip_with, sqrt, greatest, lit, abs}
    val vecs = Seq(
      (Array(1.0, 2.0, 3.0), Array(3.0, 2.0, 1.0)),
      (Array(0.0, 0.0), Array(0.0, 0.0)), // zero norm -> 1e-12 floor
      (Array(0.25, -0.5, 0.125, 9.0), Array(-1.0, 2.5, 0.75, 0.001)))
      .toDF("a", "b")
    val hof = {
      val dot = aggregate(zip_with(col("a"), col("b"), (x, y) => x * y),
        lit(0.0d), (acc, x) => acc + x)
      val na = sqrt(aggregate(col("a"), lit(0.0d), (acc, x) => acc + x * x))
      val nb = sqrt(aggregate(col("b"), lit(0.0d), (acc, x) => acc + x * x))
      dot / greatest(na * nb, lit(1e-12d))
    }
    val out = vecs.select(GraftFunctions.cosine_sim(col("a"), col("b")).as("k"),
      hof.as("h"))
    out.collect().foreach(r =>
      assert(java.lang.Double.doubleToLongBits(r.getDouble(0)) ==
        java.lang.Double.doubleToLongBits(r.getDouble(1)), r.toString))
    // codegen check needs a distributed source (a local relation collapses
    // to LocalTableScan with no codegen stage at all)
    val ds = graft.io.Corpus.table(spark, 20, partitions = 1)
      .selectExpr("transform(tokens, t -> cast(t as double)) as a")
      .select(col("a"), col("a").as("b"))
    val plan2 = ds.select(GraftFunctions.cosine_sim(col("a"), col("b")))
      .queryExecution.executedPlan.toString
    assert(plan2.linesIterator.next().trim.startsWith("*("),
      s"cosine_sim projection not codegen'd:\n$plan2")
  }

  test("corrupt binary fails decode_tokens (reference ValueError analog)") {
    val bad = Seq(Tuple1(Array[Byte](1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 11, 12)))
      .toDF("b")
    intercept[Exception] {
      bad.select(GraftFunctions.decode_tokens(col("b"))).collect()
    }
  }

  test("one-shot compress/decompress API (pyppmd.compress analog)") {
    val toks = Array.tabulate(10000)(i => (i % 97) + 3)
    val enc = GraftFunctions.compress(toks)
    assert(enc.length < 4 * toks.length)
    assert(GraftFunctions.decompress(enc).sameElements(toks))
  }
}
