package graft.spark

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions.col

import graft.engine.{EncoderConfig, Lineage, SeqRow}

/** Copy-on-write DELETE (`SupportsDelete`): rows leave the table exactly,
  * interior chunks of an aligned range drop metadata-only, untouched
  * partitions keep their original files byte-for-byte, and every scan
  * capability (zone pruning, manifest-only grouped aggregates, SPJ) stays
  * correct over the rewritten generations. */
class GraftDeleteSpec extends AnyFunSuite {
  private lazy val spark = {
    val s = graft.SparkTestSession.spark
    s.conf.set("spark.sql.catalog.gdel", classOf[GraftCatalog].getName)
    s.conf.set("spark.sql.catalog.gdel.root",
      java.nio.file.Files.createTempDirectory("graft-del-cat").toString)
    s.sql("CREATE NAMESPACE IF NOT EXISTS gdel.q")
    s
  }

  private def mkRows(n: Int): Seq[SeqRow] =
    (0 until n).map { i =>
      SeqRow(f"doc-$i%05d", Array.tabulate(8)(t => (i * 7 + t) % 1000), 8,
        if (i % 3 == 0) "books" else "web")
    }

  private def fsFor(dir: String) =
    org.apache.hadoop.fs.FileSystem.get(new java.net.URI(dir),
      spark.sparkContext.hadoopConfiguration)

  private def lsData(dir: String): Map[String, Long] = {
    val fs = fsFor(dir)
    fs.listStatus(new org.apache.hadoop.fs.Path(s"$dir/data"))
      .map(f => f.getPath.getName -> f.getLen).toMap
  }

  test("aligned range delete: interior partitions drop metadata-only, " +
      "boundaries rewrite, untouched partitions keep their files") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-del-range").toString
    // DETERMINISTIC range layout (RangePartitioner samples, so its
    // boundaries wobble): four sequential single-partition appends — the
    // sink assigns part ids 0..3 by pidOffset, each sorted with tight zones
    val all = mkRows(1200)
    for (g <- 0 until 4)
      spark.createDataset(all.slice(g * 300, (g + 1) * 300)).toDF().coalesce(1)
        .write.format("graft").option("chunkTokens", "512").mode("append")
        .save(dir)
    spark.sql(s"CREATE TABLE gdel.q.r USING graft LOCATION '$dir'")
    val before = lsData(dir)
    assert(spark.table("gdel.q.r").count() == 1200)

    // part 0 = docs 0..299 untouched; part 1 = 300..599 boundary-rewritten;
    // part 2 = 600..899 fully dropped; part 3 = 900..1199 untouched
    val lo = "doc-00350"; val hi = "doc-00900"
    spark.sql(
      s"DELETE FROM gdel.q.r WHERE doc_id >= '$lo' AND doc_id < '$hi'")

    val survivors = all.filterNot(r => r.doc_id >= lo && r.doc_id < hi)
    val got = spark.table("gdel.q.r")
      .as[SeqRow].collect().sortBy(_.doc_id)
    assert(got.length == survivors.length, s"rows after delete: ${got.length}")
    got.zip(survivors.sortBy(_.doc_id)).foreach { case (g, w) =>
      assert(g.doc_id == w.doc_id && g.tokens.sameElements(w.tokens) &&
        g.n_tok == w.n_tok && g.source == w.source, s"row ${w.doc_id}")
    }

    val after = lsData(dir)
    val fs = fsFor(dir)
    // a partition fully INSIDE the deleted range became an empty gen-1 file
    // (zero bytes = nothing was decoded or re-encoded: a pure metadata drop)
    val emptied = after.filter { case (n, len) => n.endsWith(".g1.graft") &&
      len == 0 }
    assert(emptied.nonEmpty, s"expected an all-dropped partition: $after")
    // a partition fully OUTSIDE kept its ORIGINAL file, byte count intact
    val untouched = after.keys.filter(n => before.contains(n) &&
      after(n) == before(n) && !n.matches(""".*\.g\d+\.graft"""))
    assert(untouched.nonEmpty, s"expected an untouched partition: $after")
    // every rewritten partition's old generation is retired
    after.keys.filter(_.endsWith(".g1.graft")).foreach { n =>
      val old = n.replace(".g1", "")
      assert(!after.contains(old), s"superseded $old still present")
    }
    // zone-pruned point reads still work over the new generation
    assert(spark.table("gdel.q.r")
      .filter(col("doc_id") === "doc-01100").count() == 1)
    assert(fs.exists(new org.apache.hadoop.fs.Path(s"$dir/_lineage")))
  }

  test("source delete on a hash-arranged table: exact rows via the rewrite " +
      "path, SrcStats refreshed so grouped pushdown stays exact") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-del-src").toString
    Lineage.encodeToDir(spark.createDataset(mkRows(900)), dir,
      EncoderConfig(chunkTokens = 1 << 10, numPartitions = 3))
    spark.sql(s"CREATE TABLE gdel.q.s USING graft LOCATION '$dir'")
    spark.sql("DELETE FROM gdel.q.s WHERE source = 'books'")
    // exactness: every 'books' row gone, every 'web' row intact
    val got = spark.table("gdel.q.s").as[SeqRow].collect()
    val want = mkRows(900).filterNot(_.source == "books")
    assert(got.length == want.length)
    assert(got.map(_.doc_id).sorted.toSeq == want.map(_.doc_id).sorted)
    assert(got.forall(_.source == "web"))
    // the manifest-only grouped aggregate answers from REWRITTEN SrcStats
    spark.table("gdel.q.s").createOrReplaceTempView("gdel_s")
    val agg = spark.sql(
      "SELECT source, count(*) c, sum(n_tok) st FROM gdel_s GROUP BY source")
    assert(agg.queryExecution.executedPlan.toString
      .contains("manifest-only grouped aggregate"),
      "grouped pushdown must survive the delete")
    val row = agg.collect()
    assert(row.length == 1 && row(0).getString(0) == "web" &&
      row(0).getLong(1) == want.length.toLong &&
      row(0).getLong(2) == want.length.toLong * 8)
    // idempotence: the same delete again touches nothing
    val again = GraftDelete.run(spark, dir,
      Array(org.apache.spark.sql.sources.EqualTo("source", "books")))
    assert(again == Lineage.DeleteStats(0, 0, 0, 0, 0), s"$again")
  }

  test("unconditional DELETE empties the table and resume does not " +
      "resurrect the rows") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-del-all").toString
    val ds = spark.createDataset(mkRows(300))
    Lineage.encodeToDir(ds, dir,
      EncoderConfig(chunkTokens = 1 << 10, numPartitions = 2))
    spark.sql(s"CREATE TABLE gdel.q.a USING graft LOCATION '$dir'")
    spark.sql("DELETE FROM gdel.q.a")
    assert(spark.table("gdel.q.a").count() == 0)
    // a resume of the SAME encode sees the gen-1 manifests as committed —
    // re-running the job must not re-add what the delete removed
    val encoded = Lineage.encodeToDir(ds, dir,
      EncoderConfig(chunkTokens = 1 << 10, numPartitions = 2))
    assert(encoded == 0, s"resume re-encoded $encoded partitions")
    assert(spark.table("gdel.q.a").count() == 0)
  }

  test("repeated deletes stack generations; appends after a delete land " +
      "in fresh partitions") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-del-gen").toString
    Lineage.encodeToDir(spark.createDataset(mkRows(400)), dir,
      EncoderConfig(chunkTokens = 1 << 10, numPartitions = 2))
    spark.sql(s"CREATE TABLE gdel.q.g USING graft LOCATION '$dir'")
    spark.sql("DELETE FROM gdel.q.g WHERE n_tok < 0") // matches nothing
    assert(spark.table("gdel.q.g").count() == 400) // untouched (Maybe, 0 hits)
    spark.sql("DELETE FROM gdel.q.g WHERE doc_id = 'doc-00007'")
    // IN-shape (zone-pruned classification); a duplicate value is legal
    spark.sql(
      "DELETE FROM gdel.q.g WHERE doc_id IN ('doc-00008', 'doc-00008')")
    assert(spark.table("gdel.q.g").count() == 398)
    // an append after deletes offsets PAST the gen'd partitions
    spark.createDataset(Seq(SeqRow("zzz-new", Array(1, 2, 3), 3, "web")))
      .toDF().coalesce(1)
      .write.format("graft").mode("append").save(dir)
    assert(spark.table("gdel.q.g").count() == 399)
    val names = fsFor(dir)
      .listStatus(new org.apache.hadoop.fs.Path(s"$dir/_lineage"))
      .map(_.getPath.getName).filter(_.endsWith(".json")).sorted
    assert(names.exists(_.contains(".g")), s"expected gen'd manifests: ${names.toSeq}")
    assert(names.exists(n => Lineage.manifestPidGen(n).exists(_._1 >= 2)),
      s"append should land at a fresh part id: ${names.toSeq}")
  }

  test("untranslatable predicates route through the row-level rewrite; " +
      "stream trees refuse DELETE") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-del-no").toString
    Lineage.encodeToDir(spark.createDataset(mkRows(60)), dir,
      EncoderConfig(chunkTokens = 1 << 10, numPartitions = 1))
    spark.sql(s"CREATE TABLE gdel.q.n USING graft LOCATION '$dir'")
    // canDeleteWhere refuses array_contains (no metadata classification),
    // so Spark falls back to the group-based copy-on-write rewrite —
    // exact removal, no refusal (GraftRowLevelSpec covers the mechanics)
    spark.sql("DELETE FROM gdel.q.n WHERE array_contains(tokens, 999)")
    assert(spark.table("gdel.q.n").count() == 60) // token 999 never occurs
    val withTok = mkRows(60).count(_.tokens.contains(5))
    spark.sql("DELETE FROM gdel.q.n WHERE array_contains(tokens, 5)")
    assert(spark.table("gdel.q.n").count() == 60L - withTok)

    // a batch tree (streaming-sink layout) refuses DELETE by design
    val tree = java.nio.file.Files.createTempDirectory("graft-del-tree").toString
    val b0 = s"$tree/batch=00000"
    Lineage.encodeToDir(spark.createDataset(mkRows(30)), b0,
      EncoderConfig(chunkTokens = 1 << 10, numPartitions = 1))
    spark.sql(s"CREATE TABLE gdel.q.t USING graft LOCATION '$tree'")
    val e2 = intercept[Exception] {
      spark.sql("DELETE FROM gdel.q.t WHERE doc_id = 'doc-00001'")
    }
    assert(e2.getMessage.contains("immutable history"), e2.getMessage)
  }

  test("a delete PRESERVES the SPJ bucket marker and the shuffle-free join") {
    import spark.implicits._
    val n = 4
    def enc(salt: Int): String = {
      val d = java.nio.file.Files.createTempDirectory("graft-del-spj").toString
      Lineage.encodeToDir(spark.createDataset(mkRows(600)), d,
        EncoderConfig(chunkTokens = 1 << 10, numPartitions = n))
      d
    }
    val da = enc(0); val db = enc(1)
    spark.sql(s"CREATE TABLE gdel.q.ja USING graft LOCATION '$da'")
    spark.sql(s"CREATE TABLE gdel.q.jb USING graft LOCATION '$db'")
    spark.sql("DELETE FROM gdel.q.ja WHERE doc_id < 'doc-00100'")
    assert(Lineage.readBucketMarker(fsFor(da), da).contains(n),
      "delete only removes rows; residues (and so the marker) must survive")
    val keys = Seq("graft.read.spj", "spark.sql.sources.v2.bucketing.enabled",
      "spark.sql.autoBroadcastJoinThreshold", "spark.sql.adaptive.enabled")
    val old = keys.map(k => k -> spark.conf.getOption(k))
    keys.zip(Seq("true", "true", "-1", "false"))
      .foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      val q = spark.sql(
        """SELECT a.doc_id FROM gdel.q.ja a JOIN gdel.q.jb b
          |ON a.doc_id = b.doc_id""".stripMargin)
      val plan = q.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"), s"expected shuffle-free join:\n$plan")
      assert(q.count() == 500) // 600 minus the 100 deleted
    } finally old.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }
}
