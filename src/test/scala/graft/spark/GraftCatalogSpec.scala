package graft.spark

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions.col
import graft.engine.{EncoderConfig, Lineage, SeqRow}

/** Named graft tables through a DSv2 TableCatalog: CREATE/DROP/RENAME,
  * managed vs external semantics, CTAS + INSERT INTO, and — the point —
  * every pushdown the path-based source has arriving intact behind
  * `spark.table("name")`. */
class GraftCatalogSpec extends AnyFunSuite {
  private lazy val spark = {
    val s = graft.SparkTestSession.spark
    s.conf.set("spark.sql.catalog.gcat", classOf[GraftCatalog].getName)
    s.conf.set("spark.sql.catalog.gcat.root", catRoot)
    s
  }
  private lazy val catRoot =
    java.nio.file.Files.createTempDirectory("graft-cat-root").toString

  private lazy val dataDir = {
    val rs = (0 until 900).map { i =>
      SeqRow(f"doc-$i%08d", Array.tabulate(10)(t => (i * 7 + t) % 50000), 10,
        if (i % 3 == 0) "books" else "web")
    }
    val d = java.nio.file.Files.createTempDirectory("graft-cat-data").toString
    import spark.implicits._
    Lineage.encodeToDir(spark.createDataset(rs), d,
      EncoderConfig(chunkTokens = 1 << 11, numPartitions = 2))
    d
  }

  test("CREATE TABLE ... USING graft LOCATION: spark.table reads with pushdown intact") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS gcat.corpora")
    spark.sql(s"CREATE TABLE gcat.corpora.web USING graft LOCATION '$dataDir'")
    val t = spark.table("gcat.corpora.web")
    assert(t.count() == 900L)
    // global aggregate rides the manifest-only scan behind the NAME
    val agg = spark.sql(
      "SELECT count(*) c, sum(n_tok) st FROM gcat.corpora.web")
    assert(agg.queryExecution.executedPlan.toString
      .contains("manifest-only aggregate"))
    val r = agg.collect()(0)
    assert(r.getLong(0) == 900L && r.getLong(1) == 9000L)
    // GROUP BY source rides the grouped manifest scan
    val grp = spark.sql(
      "SELECT source, count(*) c FROM gcat.corpora.web GROUP BY source")
    assert(grp.queryExecution.executedPlan.toString
      .contains("manifest-only grouped aggregate"))
    assert(grp.collect().map(x => x.getString(0) -> x.getLong(1)).toMap ==
      Map("books" -> 300L, "web" -> 600L))
    // doc_id IN pruning plans fewer chunks than the full scan
    spark.conf.set("graft.read.maxPartitionBytes", "1") // chunk-per-task
    try {
      def parts(df: org.apache.spark.sql.DataFrame): Int =
        df.queryExecution.executedPlan.collect {
          case b: org.apache.spark.sql.execution.datasources.v2.BatchScanExec => b
        }.map(_.inputPartitions.size).sum
      val all = parts(spark.table("gcat.corpora.web").select("doc_id"))
      val pruned = parts(spark.table("gcat.corpora.web")
        .filter(col("doc_id") === "doc-00000005").select("doc_id"))
      assert(pruned < all && pruned >= 1, s"pruned=$pruned all=$all")
    } finally spark.conf.unset("graft.read.maxPartitionBytes")
  }

  test("external DROP keeps data; table identity and listing behave") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS gcat.droptest")
    spark.sql(s"CREATE TABLE gcat.droptest.ext USING graft LOCATION '$dataDir'")
    assert(spark.sql("SHOW TABLES IN gcat.droptest").collect()
      .map(_.getString(1)).contains("ext"))
    spark.sql("DROP TABLE gcat.droptest.ext")
    assert(!spark.catalog.tableExists("gcat.droptest.ext"))
    // the data dir survives an external drop — re-registering sees all rows
    spark.sql(s"CREATE TABLE gcat.droptest.ext2 USING graft LOCATION '$dataDir'")
    assert(spark.table("gcat.droptest.ext2").count() == 900L)
  }

  test("managed CTAS + INSERT INTO; managed DROP deletes the data dir") {
    import spark.implicits._
    spark.sql("CREATE NAMESPACE IF NOT EXISTS gcat.managed")
    spark.table("gcat.corpora.web").limit(0) // ensure catalog initialized
    val src = (0 until 40).map(i =>
      SeqRow(f"m-$i%04d", Array.tabulate(6)(t => i + t), 6, "ctas"))
    spark.createDataset(src).createOrReplaceTempView("ctas_src")
    spark.sql(
      """CREATE TABLE gcat.managed.t USING graft AS
        |SELECT doc_id, tokens, n_tok, source FROM ctas_src""".stripMargin)
    assert(spark.table("gcat.managed.t").count() == 40L)
    // managed location lives under the catalog root
    val dataDirF = new java.io.File(s"$catRoot/managed/t")
    assert(dataDirF.isDirectory, s"managed data dir missing: $dataDirF")
    spark.sql(
      """INSERT INTO gcat.managed.t
        |SELECT concat('i-', doc_id), tokens, n_tok, 'ins' FROM ctas_src""".stripMargin)
    assert(spark.table("gcat.managed.t").count() == 80L)
    assert(spark.table("gcat.managed.t")
      .filter(col("source") === "ins").count() == 40L)
    spark.sql("DROP TABLE gcat.managed.t")
    assert(!dataDirF.exists(), "managed DROP must delete the data dir")
  }

  test("a freshly created managed table is readable (empty) before the first INSERT") {
    import spark.implicits._
    spark.sql("CREATE NAMESPACE IF NOT EXISTS gcat.fresh")
    spark.sql(
      """CREATE TABLE gcat.fresh.t (doc_id STRING, tokens ARRAY<INT>,
        |n_tok INT, source STRING) USING graft""".stripMargin)
    // SELECT between CREATE and first INSERT: the empty result, not an error
    assert(spark.table("gcat.fresh.t").count() == 0L)
    assert(spark.sql("SELECT count(*), sum(n_tok) FROM gcat.fresh.t")
      .collect()(0).getLong(0) == 0L)
    // and the first INSERT lands normally
    val src = (0 until 7).map(i =>
      SeqRow(f"f-$i%04d", Array(1, 2), 2, "fresh"))
    spark.createDataset(src).createOrReplaceTempView("fresh_src")
    spark.sql(
      """INSERT INTO gcat.fresh.t
        |SELECT doc_id, tokens, n_tok, source FROM fresh_src""".stripMargin)
    assert(spark.table("gcat.fresh.t").count() == 7L)
    spark.sql("DROP TABLE gcat.fresh.t")
  }

  test("RENAME moves managed data with the name; external rename is pointer-only") {
    import spark.implicits._
    spark.sql("CREATE NAMESPACE IF NOT EXISTS gcat.ren")
    val src = (0 until 10).map(i =>
      SeqRow(f"r-$i%04d", Array.tabulate(4)(t => i + t), 4, "ren"))
    spark.createDataset(src).createOrReplaceTempView("ren_src")
    spark.sql(
      """CREATE TABLE gcat.ren.a USING graft AS
        |SELECT doc_id, tokens, n_tok, source FROM ren_src""".stripMargin)
    // v2 RENAME destination is resolved inside the source's catalog, so it
    // is written WITHOUT the catalog prefix (same contract as Iceberg)
    spark.sql("ALTER TABLE gcat.ren.a RENAME TO ren.b")
    assert(!spark.catalog.tableExists("gcat.ren.a"))
    assert(spark.table("gcat.ren.b").count() == 10L)
    assert(new java.io.File(s"$catRoot/ren/b").isDirectory)
    assert(!new java.io.File(s"$catRoot/ren/a").exists())
    // external: rename must NOT touch the data location
    spark.sql(s"CREATE TABLE gcat.ren.e USING graft LOCATION '$dataDir'")
    spark.sql("ALTER TABLE gcat.ren.e RENAME TO ren.f")
    assert(spark.table("gcat.ren.f").count() == 900L)
    assert(new java.io.File(dataDir).isDirectory)
  }

  test("schema and layout guards: wrong CTAS schema, PARTITIONED BY, bad names all refuse") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS gcat.guards")
    val e1 = intercept[Exception](spark.sql(
      "CREATE TABLE gcat.guards.bad USING graft AS SELECT 1 AS x"))
    assert(e1.getMessage.contains("fixed schema"), e1.getMessage)
    val e2 = intercept[Exception](spark.sql(
      s"""CREATE TABLE gcat.guards.p (doc_id STRING, tokens ARRAY<INT>,
         |n_tok INT, source STRING) USING graft PARTITIONED BY (source)
         |LOCATION '$dataDir'""".stripMargin))
    assert(e2.getMessage.contains("PARTITIONED BY"), e2.getMessage)
    // missing namespace fails as such, not with a filesystem error
    val e3 = intercept[Exception](spark.sql(
      s"CREATE TABLE gcat.nosuchns.t USING graft LOCATION '$dataDir'"))
    assert(e3.getMessage.toLowerCase.contains("namespace") ||
      e3.getMessage.toLowerCase.contains("schema"), e3.getMessage)
  }

  test("namespaces: list, non-empty drop refuses, cascade preserves external data") {
    spark.sql("CREATE NAMESPACE gcat.nstest")
    assert(spark.sql("SHOW NAMESPACES IN gcat").collect()
      .map(_.getString(0)).contains("nstest"))
    spark.sql(s"CREATE TABLE gcat.nstest.t USING graft LOCATION '$dataDir'")
    intercept[Exception](spark.sql("DROP NAMESPACE gcat.nstest"))
    spark.sql("DROP NAMESPACE gcat.nstest CASCADE")
    assert(!spark.sql("SHOW NAMESPACES IN gcat").collect()
      .map(_.getString(0)).contains("nstest"))
    // the externally-located data survived the cascade
    assert(new java.io.File(dataDir).isDirectory)
    spark.sql(s"CREATE TABLE gcat.corpora.resurvey USING graft LOCATION '$dataDir'")
    assert(spark.table("gcat.corpora.resurvey").count() == 900L)
  }

  test("readStream.table: incremental consumption through the catalog name") {
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("graft-cat-ss").toString
    val ckpt = java.nio.file.Files.createTempDirectory("graft-cat-ss-ck").toString
    Lineage.markStreamTree(spark, root)
    def writeBatch(b: Int): Unit = {
      val d = f"$root/batch=$b%05d"
      Lineage.encodeToDir(spark.createDataset((0 until 50).map(i =>
        SeqRow(f"s-$b%02d-$i%04d", Array(b, i), 2, "s"))), d,
        EncoderConfig(chunkTokens = 1 << 10, numPartitions = 1))
      Lineage.markBatchReady(spark, d)
    }
    writeBatch(0); writeBatch(1)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS gcat.stream")
    spark.sql(s"CREATE TABLE gcat.stream.t USING graft LOCATION '$root'")
    val got = scala.collection.mutable.Set.empty[String]
    val q = spark.readStream.table("gcat.stream.t")
      .writeStream.option("checkpointLocation", ckpt)
      .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
        got ++= df.collect().map(_.getString(0)); ()
      }
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination(120000)
    assert(got.size == 100, s"stream-by-name saw ${got.size} rows")
  }

  test("writeStream.toTable on a never-written managed table converts it to a stream tree") {
    import spark.implicits._
    spark.sql("CREATE NAMESPACE IF NOT EXISTS gcat.ssink")
    spark.sql(
      """CREATE TABLE gcat.ssink.t (doc_id STRING, tokens ARRAY<INT>,
        |n_tok INT, source STRING) USING graft""".stripMargin)
    val ckpt = java.nio.file.Files.createTempDirectory("graft-cat-sw-ck").toString
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val in = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[SeqRow]
    in.addData((0 until 30).map(i => SeqRow(f"w-$i%04d", Array(i), 1, "s")))
    val q = in.toDS().toDF("doc_id", "tokens", "n_tok", "source")
      .writeStream.option("checkpointLocation", ckpt)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .toTable("gcat.ssink.t")
    q.awaitTermination(120000)
    // the managed placeholder became a batch tree; batch SELECT sees epochs
    assert(spark.table("gcat.ssink.t").count() == 30L)
    // a NON-empty plain table still refuses the streaming sink loudly
    val in2 = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[SeqRow]
    in2.addData(SeqRow("x", Array(1), 1, "s"))
    val q2 = in2.toDS().toDF("doc_id", "tokens", "n_tok", "source")
      .writeStream.option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("graft-cat-sw-ck2").toString)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .format("graft").option("path", dataDir).start()
    val e = intercept[Exception](q2.awaitTermination(120000))
    assert(e.getMessage.contains("plain lineage table") ||
      Option(e.getCause).exists(_.getMessage.contains("plain lineage table")),
      s"${e.getMessage}")
  }

  test("VERSION AS OF maps to untilBatch over a batch tree; plain tables refuse it") {
    import spark.implicits._
    // build a 2-batch tree via the streaming sink's dir layout primitives:
    // write two batches through encodeToDir under batch=N subdirs + READY
    val tree = java.nio.file.Files.createTempDirectory("graft-cat-tree").toString
    Lineage.markStreamTree(spark, tree)
    def writeBatch(n: Long, rows: Seq[SeqRow]): Unit = {
      val d = s"$tree/batch=$n"
      Lineage.encodeToDir(spark.createDataset(rows), d,
        EncoderConfig(chunkTokens = 1 << 11, numPartitions = 1))
      Lineage.markBatchReady(spark, d)
    }
    writeBatch(0, (0 until 5).map(i =>
      SeqRow(f"b0-$i", Array(1, 2, 3), 3, "s")))
    writeBatch(1, (0 until 7).map(i =>
      SeqRow(f"b1-$i", Array(4, 5, 6), 3, "s")))
    spark.sql(s"CREATE TABLE gcat.corpora.tree USING graft LOCATION '$tree'")
    assert(spark.table("gcat.corpora.tree").count() == 12L)
    assert(spark.sql(
      "SELECT count(*) FROM gcat.corpora.tree VERSION AS OF 0")
      .collect()(0).getLong(0) == 5L)
    // a plain lineage table refuses time travel loudly (same as the option)
    val e = intercept[Exception](spark.sql(
      "SELECT * FROM gcat.corpora.web VERSION AS OF 0").collect())
    assert(e.getMessage.contains("untilBatch") ||
      Option(e.getCause).exists(_.getMessage.contains("untilBatch")),
      s"${e.getMessage} / ${Option(e.getCause).map(_.getMessage)}")
  }
}
