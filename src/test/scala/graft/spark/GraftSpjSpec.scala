package graft.spark

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col
import org.apache.spark.unsafe.types.UTF8String

import graft.engine.{EncoderConfig, Lineage, SeqRow}

/** Storage-partitioned joins: two graft tables arranged with the same
  * bucket count join on doc_id with ZERO shuffle exchanges, because the
  * scan reports KeyGroupedPartitioning over the catalog-served
  * `bucket(n, doc_id)` function and the writers recorded (and defend) the
  * layout marker that makes the report truthful. */
class GraftSpjSpec extends AnyFunSuite {
  private lazy val spark = {
    val s = graft.SparkTestSession.spark
    s.conf.set("spark.sql.catalog.spj", classOf[GraftCatalog].getName)
    s.conf.set("spark.sql.catalog.spj.root",
      java.nio.file.Files.createTempDirectory("graft-spj-root").toString)
    s
  }

  private val N = 4 // bucket count shared by the co-located tables

  private def rows(salt: Int, n: Int): Seq[SeqRow] =
    (0 until n).map { i =>
      SeqRow(f"doc-$i%06d", Array.tabulate(6)(t => (i * 11 + salt + t) % 999),
        6, if (i % 3 == 0) "books" else "web")
    }

  private def encode(rs: Seq[SeqRow], parts: Int): String = {
    val d = java.nio.file.Files.createTempDirectory("graft-spj").toString
    import spark.implicits._
    Lineage.encodeToDir(spark.createDataset(rs), d,
      EncoderConfig(chunkTokens = 1 << 9, numPartitions = parts))
    d
  }

  private lazy val dirA = encode(rows(0, 600), N)
  private lazy val dirB = encode(rows(5, 400), N) // shared doc_id prefix set

  private lazy val tablesReady: Unit = {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS spj.t")
    spark.sql(s"CREATE TABLE spj.t.a USING graft LOCATION '$dirA'")
    spark.sql(s"CREATE TABLE spj.t.b USING graft LOCATION '$dirB'")
  }

  private def exchanges(df: DataFrame): Int =
    df.queryExecution.executedPlan.toString
      .linesIterator.count(_.contains("Exchange"))

  /** Run `body` with SPJ prerequisites on; restore after. */
  private def withSpj[T](body: => T): T = {
    val keys = Seq("graft.read.spj", // the opt-in (Iceberg preserve-data-grouping analog)
      "spark.sql.sources.v2.bucketing.enabled",
      "spark.sql.sources.v2.bucketing.pushPartValues.enabled",
      "spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.enabled")
    val old = keys.map(k => k -> spark.conf.getOption(k))
    spark.conf.set("graft.read.spj", "true")
    spark.conf.set("spark.sql.sources.v2.bucketing.enabled", "true")
    spark.conf.set("spark.sql.sources.v2.bucketing.pushPartValues.enabled", "true")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force SMJ
    spark.conf.set("spark.sql.adaptive.enabled", "false") // stable plan text
    try body
    finally old.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("bucket function is row-for-row identical to Spark's repartition assignment") {
    import spark.implicits._
    val ids = (0 until 512).map(i => f"doc-$i%06d") ++
      Seq("", "a", "é漢😀", "zzzz", "doc-000000")
    for (n <- Seq(1, 2, 4, 7, 32)) {
      val assigned = ids.toDF("doc_id")
        .repartition(n, col("doc_id"))
        .select(col("doc_id"),
          org.apache.spark.sql.functions.spark_partition_id().as("p"))
        .collect().map(r => r.getString(0) -> r.getInt(1)).toMap
      ids.foreach { id =>
        val got = GraftBucketFunction.bucket(n, UTF8String.fromString(id))
        assert(got == assigned(id),
          s"bucket($n, '$id'): function=$got spark=${assigned(id)}")
      }
    }
    // and the magic-invoke / produceResult pair agree with it
    val bound = GraftBucketFunction.bind(new org.apache.spark.sql.types.StructType()
      .add("n", org.apache.spark.sql.types.IntegerType)
      .add("v", org.apache.spark.sql.types.StringType))
      .asInstanceOf[GraftBucketBound]
    val row = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](7, UTF8String.fromString("doc-000123")))
    assert(bound.produceResult(row) ==
      GraftBucketFunction.bucket(7, UTF8String.fromString("doc-000123")))
  }

  test("same-n graft tables join on doc_id with zero exchanges, rows exact") {
    tablesReady
    withSpj {
      val joined = spark.sql(
        """SELECT a.doc_id, a.n_tok AS na, b.n_tok AS nb
          |FROM spj.t.a a JOIN spj.t.b b ON a.doc_id = b.doc_id""".stripMargin)
      val plan = joined.queryExecution.executedPlan.toString
      assert(exchanges(joined) == 0, s"expected shuffle-free join:\n$plan")
      val got = joined.collect()
      assert(got.length == 400, s"join rows: ${got.length}")
      assert(got.forall(r => r.getInt(1) == 6 && r.getInt(2) == 6))
      // the same join WITHOUT the bucketing conf shuffles both sides and
      // returns the identical result — SPJ is a plan property, not semantics
      spark.conf.set("spark.sql.sources.v2.bucketing.enabled", "false")
      val off = spark.sql(
        """SELECT a.doc_id, a.n_tok AS na, b.n_tok AS nb
          |FROM spj.t.a a JOIN spj.t.b b ON a.doc_id = b.doc_id""".stripMargin)
      assert(exchanges(off) >= 2, "control: shuffles expected without SPJ")
      assert(off.collect().map(_.getString(0)).sorted.toSeq ==
        got.map(_.getString(0)).sorted.toSeq)
    }
  }

  test("join-with-aggregation: only the aggregation exchanges, and SPJ survives zone pruning") {
    tablesReady
    withSpj {
      val q = spark.sql(
        """SELECT a.source, count(*) AS pairs, sum(b.n_tok) AS st
          |FROM spj.t.a a JOIN spj.t.b b ON a.doc_id = b.doc_id
          |WHERE a.doc_id >= 'doc-000100'
          |GROUP BY a.source""".stripMargin)
      val plan = q.queryExecution.executedPlan.toString
      // exactly ONE exchange: the GROUP BY's — the join itself is co-located
      assert(exchanges(q) == 1, s"expected only the aggregation exchange:\n$plan")
      val got = q.collect().map(r =>
        (r.getString(0), r.getLong(1), r.getLong(2))).toSet
      // oracle: 300 surviving join rows (ids 100..399), source by i % 3
      assert(got == Set(("books", 100L, 600L), ("web", 200L, 1200L)), s"$got")
    }
  }

  test("storage-partitioned shuffle: a NON-graft side shuffles INTO graft's bucketing (one exchange)") {
    tablesReady
    import spark.implicits._
    withSpj {
      spark.conf.set("spark.sql.sources.v2.bucketing.shuffle.enabled", "true")
      try {
        val dim = (0 until 300).map(i => (f"doc-$i%06d", i)).toDF("doc_id", "v")
        val q = spark.table("spj.t.a").join(dim, "doc_id")
          .selectExpr("doc_id", "n_tok", "v")
        val plan = q.queryExecution.executedPlan.toString
        // ONE exchange — the dim side, re-clustered by OUR bucket function
        // (Spark evaluates GraftBucketBound.invoke per dim row); the graft
        // side reads in place. A non-SPJ plan shuffles both sides.
        assert(exchanges(q) == 1, s"expected one dim-side exchange:\n$plan")
        assert(plan.contains("keygroupedpartitioning"),
          s"dim exchange must target graft's bucketing:\n$plan")
        val got = q.collect()
        assert(got.length == 300 && got.forall(_.getInt(1) == 6))
      } finally spark.conf
        .unset("spark.sql.sources.v2.bucketing.shuffle.enabled")
    }
  }

  test("mismatched bucket counts or a missing marker fall back to shuffles") {
    tablesReady
    val dirC = encode(rows(9, 300), N + 1) // different n
    spark.sql(s"CREATE TABLE spj.t.c USING graft LOCATION '$dirC'")
    withSpj {
      val q = spark.sql(
        "SELECT a.doc_id FROM spj.t.a a JOIN spj.t.c c ON a.doc_id = c.doc_id")
      assert(exchanges(q) >= 1, "mismatched n must shuffle")
      assert(q.collect().length == 300)
    }
  }

  test("an unarranged append DELETES the marker; the join goes back to shuffling") {
    import spark.implicits._
    val dirD = encode(rows(2, 300), N)
    val fs = org.apache.hadoop.fs.FileSystem.get(new java.net.URI(dirD),
      spark.sparkContext.hadoopConfiguration)
    assert(Lineage.readBucketMarker(fs, dirD).contains(N))
    // DSv2 append WITHOUT arrange: rows land as-partitioned — the bucket
    // contract no longer holds, and the writer must withdraw the marker
    spark.createDataset(Seq(SeqRow("zzz-append", Array(1, 2), 2, "web")))
      .toDF().coalesce(1)
      .write.format("graft").mode("append").save(dirD)
    assert(Lineage.readBucketMarker(fs, dirD).isEmpty,
      "unarranged append must clear the bucket marker")
    spark.sql(s"CREATE TABLE spj.t.d USING graft LOCATION '$dirD'")
    withSpj {
      val q = spark.sql(
        "SELECT a.doc_id FROM spj.t.a a JOIN spj.t.d d ON a.doc_id = d.doc_id")
      assert(exchanges(q) >= 1, "marker-less table must shuffle")
      assert(q.collect().length == 300)
    }
  }

  test("an arranged same-n append PRESERVES the marker and SPJ still works") {
    import spark.implicits._
    val dirE = encode(rows(3, 200), N)
    val fs = org.apache.hadoop.fs.FileSystem.get(new java.net.URI(dirE),
      spark.sparkContext.hadoopConfiguration)
    // arranged append: part ids offset by a multiple of N, residues intact
    spark.createDataset(rows(3, 200).map(r =>
        r.copy(doc_id = "x" + r.doc_id)))
      .toDF().write.format("graft").mode("append")
      .option("arrange", N).save(dirE)
    assert(Lineage.readBucketMarker(fs, dirE).contains(N),
      "same-n arranged append keeps the marker")
    spark.sql(s"CREATE TABLE spj.t.e USING graft LOCATION '$dirE'")
    withSpj {
      val q = spark.sql(
        "SELECT a.doc_id FROM spj.t.a a JOIN spj.t.e e ON a.doc_id = e.doc_id")
      assert(exchanges(q) == 0,
        s"appended same-n table should still SPJ:\n${q.queryExecution.executedPlan}")
      assert(q.collect().length == 200)
    }
  }

  test("encodeToDir marker lifecycle: fresh write records n, mismatched re-run clears it") {
    import spark.implicits._
    val d = java.nio.file.Files.createTempDirectory("graft-spj-mk").toString
    val fs = org.apache.hadoop.fs.FileSystem.get(new java.net.URI(d),
      spark.sparkContext.hadoopConfiguration)
    Lineage.encodeToDir(spark.createDataset(rows(1, 100)), d,
      EncoderConfig(chunkTokens = 1 << 9, numPartitions = 3))
    assert(Lineage.readBucketMarker(fs, d).contains(3))
    // a second encode with a DIFFERENT count into the same dir (misuse the
    // resume contract already forbids) must at minimum withdraw the marker
    Lineage.encodeToDir(spark.createDataset(rows(1, 100)), d,
      EncoderConfig(chunkTokens = 1 << 9, numPartitions = 5))
    assert(Lineage.readBucketMarker(fs, d).isEmpty)
  }
}
