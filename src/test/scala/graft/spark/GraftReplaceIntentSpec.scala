package graft.spark

import org.scalatest.funsuite.AnyFunSuite

import graft.engine.{ChunkBuilder, EncoderConfig, Lineage, SeqRow}

/** Replace-commit intent (row-level UPDATE/MERGE crash recovery): a crash
  * between the fresh-group swaps and the scanned-group retirements used to
  * leave survivors duplicated permanently (ADVICE r6, medium). The intent
  * file + recovery close the hole:
  *   - all fresh pids committed -> roll FORWARD (finish the retirement);
  *   - any fresh pid missing    -> roll BACK (remove the landed fresh
  *     pids, restoring the pre-DML table);
  * and a completed commit leaves no intent behind. */
class GraftReplaceIntentSpec extends AnyFunSuite {
  private lazy val spark = graft.SparkTestSession.spark

  private def mkRows(n: Int): Seq[SeqRow] =
    (0 until n).map(i =>
      SeqRow(f"doc-$i%05d", Array.tabulate(8)(t => (i + t) % 90), 8, "web"))

  private def mk(name: String, n: Int, parts: Int): String = {
    import spark.implicits._
    val dir =
      java.nio.file.Files.createTempDirectory(s"graft-intent-$name").toString
    Lineage.encodeToDir(spark.createDataset(mkRows(n)), dir,
      EncoderConfig(chunkTokens = 1 << 9, numPartitions = parts))
    dir
  }

  private def fsFor(dir: String) =
    org.apache.hadoop.fs.FileSystem.get(new java.net.URI(dir),
      spark.sparkContext.hadoopConfiguration)

  /** Commit a real fresh group holding `rows` at `pid` (the adds half of a
    * replace commit). */
  private def addFreshGroup(dir: String, pid: Int, rows: Seq[SeqRow]): Unit = {
    val fs = fsFor(dir)
    val stager = new Lineage.GroupStager(fs, dir, pid, "test-attempt")
    stager.add(ChunkBuilder.build(pid, 0, rows.map(_.doc_id).toArray,
      rows.map(_.source).toArray, rows.flatMap(_.tokens).toArray,
      rows.map(_.n_tok).toArray))
    val (staged, mrows) = stager.finish().get
    Lineage.swapInGroup(fs, dir, pid, Some(staged), mrows)
  }

  private def tableRows(dir: String): Set[String] = {
    import spark.implicits._
    Lineage.decodeFromDir(spark, dir).map(_.doc_id).collect().toSet
  }

  test("roll forward: adds complete, crash before retirement -> recovery " +
      "finishes the retirement and the duplicates disappear") {
    val dir = mk("fwd", 300, 3)
    val fs = fsFor(dir)
    val all = tableRows(dir)
    // the dead commit's plan: partition 1's rows were rewritten verbatim
    // into fresh pid 3, pid 1 was to be retired. _part_id gives the EXACT
    // membership (zone ranges overlap across hash partitions).
    val rows1: Seq[SeqRow] = {
      import org.apache.spark.sql.functions.col
      spark.read.format("graft").load(dir)
        .select(col("doc_id"), col("tokens"), col("n_tok"), col("source"),
          col("_part_id"))
        .where(col("_part_id") === 1)
        .collect()
        .map(r => SeqRow(r.getString(0),
          r.getSeq[Int](1).toArray, r.getInt(2), r.getString(3)))
        .toSeq
    }
    assert(rows1.nonEmpty)
    addFreshGroup(dir, 3, rows1) // adds landed
    Lineage.writeReplaceIntent(fs, dir, Seq(3), Seq(1))
    // crash here: pid 1 not retired -> its rows exist twice
    assert(Lineage.readManifest(spark, dir).collect()
      .filter(_.part_id == 1).nonEmpty)
    assert(Lineage.recoverReplaceIntent(fs, dir))
    // retired: pid 1's top generation is empty; content identical to the
    // pre-crash table (rows1 now live in pid 3 only) — the COUNT check is
    // what catches surviving duplicates, the set compare alone would not
    val after = tableRows(dir)
    assert(after == all)
    assert(Lineage.decodeFromDir(spark, dir).count() == all.size.toLong,
      "row count must match — duplicates would survive a missed retirement")
    val m1After = Lineage.readManifest(spark, dir).collect()
      .filter(_.part_id == 1)
    assert(m1After.isEmpty, "retired group must expose zero chunks")
    assert(!fs.exists(new org.apache.hadoop.fs.Path(
      s"$dir/_lineage/_replace_intent.json")))
    // idempotent: nothing left to recover
    assert(!Lineage.recoverReplaceIntent(fs, dir))
  }

  test("roll back: a fresh pid missing -> recovery removes the landed " +
      "fresh groups and the table reads exactly as before the DML") {
    val dir = mk("back", 300, 3)
    val fs = fsFor(dir)
    val before = tableRows(dir)
    // the dead commit planned fresh pids 3 AND 4 but only 3 landed
    addFreshGroup(dir, 3,
      Seq(SeqRow("zzz-rolled-back", Array(1, 2, 3), 3, "web")))
    Lineage.writeReplaceIntent(fs, dir, Seq(3, 4), Seq(0, 1))
    assert(Lineage.recoverReplaceIntent(fs, dir))
    assert(tableRows(dir) == before,
      "roll back must restore the pre-DML content")
    assert(!fs.exists(new org.apache.hadoop.fs.Path(
      s"$dir/_lineage/_replace_intent.json")))
  }

  test("vacuum resolves a pending intent before sweeping") {
    val dir = mk("vac", 200, 2)
    val fs = fsFor(dir)
    val before = tableRows(dir)
    addFreshGroup(dir, 2,
      Seq(SeqRow("zzz-vacuum-case", Array(9), 1, "web")))
    Lineage.writeReplaceIntent(fs, dir, Seq(2, 3), Seq(0))
    Lineage.vacuum(spark.sparkContext.hadoopConfiguration, dir)
    assert(tableRows(dir) == before)
    assert(!fs.exists(new org.apache.hadoop.fs.Path(
      s"$dir/_lineage/_replace_intent.json")))
  }

  test("a completed UPDATE leaves no intent file") {
    import spark.implicits._
    spark.conf.set("spark.sql.catalog.gint", classOf[GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.gint.root",
      java.nio.file.Files.createTempDirectory("graft-intent-cat").toString)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS gint.q")
    val dir = mk("sql", 300, 3)
    spark.sql(s"CREATE TABLE gint.q.t USING graft LOCATION '$dir'")
    spark.sql(
      "UPDATE gint.q.t SET source = 'curated' WHERE doc_id = 'doc-00007'")
    assert(!fsFor(dir).exists(new org.apache.hadoop.fs.Path(
      s"$dir/_lineage/_replace_intent.json")))
    val cur = spark.table("gint.q.t").where("source = 'curated'")
      .select("doc_id").as[String].collect().toSeq
    assert(cur == Seq("doc-00007"))
  }
}
