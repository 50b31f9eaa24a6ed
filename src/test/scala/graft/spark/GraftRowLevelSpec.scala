package graft.spark

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.engine.{EncoderConfig, Lineage, SeqRow}

/** Group-based copy-on-write UPDATE / MERGE INTO / arbitrary-predicate
  * DELETE: runtime group filtering rewrites ONLY the partitions holding
  * matching rows (untouched partitions keep their files byte-for-byte),
  * content identity holds row-for-row through every verb, MERGE inserts
  * land in a fresh partition, and the guards (tree refusal, null SET,
  * n_tok consistency, SPJ marker) fire. */
class GraftRowLevelSpec extends AnyFunSuite {
  private lazy val spark = {
    val s = graft.SparkTestSession.spark
    s.conf.set("spark.sql.catalog.grl", classOf[GraftCatalog].getName)
    s.conf.set("spark.sql.catalog.grl.root",
      java.nio.file.Files.createTempDirectory("graft-rl-cat").toString)
    s.sql("CREATE NAMESPACE IF NOT EXISTS grl.q")
    s
  }

  private def mkRows(n: Int): Seq[SeqRow] =
    (0 until n).map(i =>
      SeqRow(f"doc-$i%05d", Array.tabulate(8)(t => (i + t) % 90), 8,
        if (i % 3 == 0) "books" else "web"))

  private def mk(name: String, n: Int, parts: Int): String = {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory(s"graft-rl-$name").toString
    Lineage.encodeToDir(spark.createDataset(mkRows(n)), dir,
      EncoderConfig(chunkTokens = 1 << 9, numPartitions = parts))
    spark.sql(s"CREATE TABLE grl.q.$name USING graft LOCATION '$dir'")
    dir
  }

  private def fsFor(dir: String) =
    org.apache.hadoop.fs.FileSystem.get(new java.net.URI(dir),
      spark.sparkContext.hadoopConfiguration)

  private def dataFiles(dir: String): Map[String, Long] =
    fsFor(dir).listStatus(new org.apache.hadoop.fs.Path(s"$dir/data"))
      .map(f => f.getPath.getName -> f.getLen).toMap

  test("UPDATE rewrites only the matching group; untouched partitions " +
      "keep their files; content identity holds row-for-row") {
    import spark.implicits._
    val dir = mk("u", 900, 3)
    val before = dataFiles(dir)
    val victimPart = spark.read.format("graft").load(dir)
      .filter(col("doc_id") === "doc-00007")
      .select(col("_part_id")).collect()(0).getInt(0)
    spark.sql(
      "UPDATE grl.q.u SET source = 'curated' WHERE doc_id = 'doc-00007'")

    val t = spark.table("grl.q.u")
    assert(t.count() == 900)
    assert(t.filter(col("source") === "curated")
      .select(col("doc_id")).as[String].collect().toSeq == Seq("doc-00007"))
    // exact content: every non-victim row identical, victim only re-sourced
    val got = t.as[SeqRow].collect().sortBy(_.doc_id)
    val want = mkRows(900).map(r =>
      if (r.doc_id == "doc-00007") r.copy(source = "curated") else r)
      .sortBy(_.doc_id)
    got.zip(want).foreach { case (g, w) =>
      assert(g.doc_id == w.doc_id && g.source == w.source &&
        g.n_tok == w.n_tok && g.tokens.sameElements(w.tokens), g.doc_id)
    }
    // ONLY the victim group was rewritten: the other two part files
    // survive byte-for-byte; the victim is superseded by an empty gen
    val after = dataFiles(dir)
    val untouched = before.keys.filter(k =>
      after.get(k).contains(before(k)) &&
        !k.startsWith(f"part-$victimPart%05d"))
    assert(untouched.size == 2, s"before=$before after=$after")
    assert(after.keys.exists(_.startsWith(f"part-$victimPart%05d.g")),
      s"victim group must be superseded: $after")
  }

  test("MERGE INTO: matched rows update in place, inserts land in a " +
      "FRESH partition; arbitrary-predicate DELETE routes through the " +
      "rewrite and removes exactly the matching rows") {
    import spark.implicits._
    val dir = mk("m", 600, 2)
    spark.createDataset(Seq(
      SeqRow("doc-00008", Array(1, 2, 3), 3, "patched"),
      SeqRow("zzz-new-1", Array(4, 5, 6), 3, "fresh")))
      .createOrReplaceTempView("grl_src")
    spark.sql(
      """MERGE INTO grl.q.m t USING grl_src s ON t.doc_id = s.doc_id
        |WHEN MATCHED THEN UPDATE SET *
        |WHEN NOT MATCHED THEN INSERT *""".stripMargin)
    val t = spark.read.format("graft").load(dir)
    assert(t.count() == 601)
    assert(t.filter(col("doc_id") === "doc-00008")
      .select(col("n_tok")).collect()(0).getInt(0) == 3)
    // the insert landed in a partition past the original two
    val freshPart = t.filter(col("source") === "fresh")
      .select(col("_part_id")).collect()(0).getInt(0)
    assert(freshPart >= 2, s"$freshPart")

    // DELETE with a predicate SupportsDelete cannot take (array_contains)
    spark.sql(
      "DELETE FROM grl.q.m WHERE array_contains(tokens, 4) AND source = 'fresh'")
    val after = spark.table("grl.q.m")
    assert(after.count() == 600)
    assert(after.filter(col("source") === "fresh").count() == 0)
    // survivors intact row-for-row (doc-00008 carries its merged content)
    val ids = after.select(col("doc_id")).as[String].collect().sorted
    assert(ids.toSeq == mkRows(600).map(_.doc_id).sorted.toSeq)
  }

  test("deletable-shape DELETE still takes the metadata fast path (no " +
      "fresh partition), while the rewrite path moves survivors") {
    val dir = mk("f", 400, 2)
    def partIds = fsFor(dir)
      .listStatus(new org.apache.hadoop.fs.Path(s"$dir/_lineage"))
      .flatMap(s => Lineage.manifestPidGen(s.getPath.getName)).map(_._1).toSet
    spark.sql("DELETE FROM grl.q.f WHERE doc_id = 'doc-00005'")
    assert(partIds == Set(0, 1), s"fast path must not add partitions: $partIds")
    spark.sql("UPDATE grl.q.f SET source = 'x' WHERE doc_id = 'doc-00006'")
    assert(partIds.exists(_ >= 2), s"rewrite adds a fresh partition: $partIds")
    assert(spark.table("grl.q.f").count() == 399)
  }

  test("an UPDATE clears the SPJ bucket marker (survivors move " +
      "partitions — hash placement no longer holds)") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-rl-spj").toString
    Lineage.encodeToDir(spark.createDataset(mkRows(300)), dir,
      EncoderConfig(chunkTokens = 1 << 9, numPartitions = 4))
    spark.sql(s"CREATE TABLE grl.q.s USING graft LOCATION '$dir'")
    assert(Lineage.readBucketMarker(fsFor(dir), dir).contains(4))
    spark.sql("UPDATE grl.q.s SET source = 'y' WHERE doc_id = 'doc-00001'")
    assert(Lineage.readBucketMarker(fsFor(dir), dir).isEmpty,
      "marker must err toward deletion after a rewrite")
    assert(spark.table("grl.q.s").count() == 300)
  }

  test("guards: batch trees refuse row-level DML; a null SET refuses; " +
      "an inconsistent n_tok refuses") {
    import spark.implicits._
    val tree = java.nio.file.Files.createTempDirectory("graft-rl-tree").toString
    Lineage.encodeToDir(spark.createDataset(mkRows(30)), s"$tree/batch=00000",
      EncoderConfig(chunkTokens = 1 << 9, numPartitions = 1))
    spark.sql(s"CREATE TABLE grl.q.t USING graft LOCATION '$tree'")
    val e = intercept[Exception] {
      spark.sql("UPDATE grl.q.t SET source = 'z' WHERE doc_id = 'doc-00001'")
    }
    assert(e.getMessage.contains("immutable history"), e.getMessage)

    mk("g", 60, 1)
    val e2 = intercept[Exception] {
      spark.sql("UPDATE grl.q.g SET source = NULL WHERE doc_id = 'doc-00001'")
    }
    assert(e2.getMessage.toLowerCase.contains("null"), e2.getMessage)
    val e3 = intercept[Exception] {
      spark.sql("UPDATE grl.q.g SET n_tok = 99 WHERE doc_id = 'doc-00002'")
    }
    assert(e3.getMessage.contains("n_tok"), e3.getMessage)
    // failed statements left the table intact
    assert(spark.table("grl.q.g").count() == 60)
  }
}
