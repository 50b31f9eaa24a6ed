package graft.spark

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.engine.{EncoderConfig, Lineage, SeqRow}

/** `GraftDelete.deleteIds` — the bulk takedown a curation pipeline runs on
  * a dedup loser-set: exact removal, IN-style zone pruning (clean chunks
  * never decoded), loud byte cap, end-to-end dedup→delete integration. */
class GraftDeleteIdsSpec extends AnyFunSuite {
  private lazy val spark = graft.SparkTestSession.spark

  /** 900 docs where every third TOKEN CONTENT repeats 3× under distinct
    * doc_ids — an exact-dup corpus with a known loser set. */
  private def mkDupRows(n: Int): Seq[SeqRow] =
    (0 until n).map { i =>
      val group = i / 3 // three consecutive ids share one content
      SeqRow(f"doc-$i%05d", Array.tabulate(10)(t => (group * 13 + t) % 700),
        10, if (group % 5 == 0) "books" else "web")
    }

  test("dedup losers -> deleteIds leaves exactly one doc per content, " +
      "clean chunks are never decoded, and re-running is a no-op") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-delids").toString
    val rows = mkDupRows(900)
    Lineage.encodeToDir(spark.createDataset(rows), dir,
      EncoderConfig(chunkTokens = 1 << 9, numPartitions = 3))
    val t = spark.read.format("graft").load(dir)

    // the dedup step: keeper = min doc_id per identical token content
    val losers = t.groupBy(col("tokens"))
      .agg(min(col("doc_id")).as("keeper"), collect_list(col("doc_id")).as("all"))
      .select(explode(col("all")).as("doc_id"), col("keeper"))
      .filter(col("doc_id") =!= col("keeper"))
      .select(col("doc_id")).as[String]
    val nLosers = losers.count()
    assert(nLosers == 600, s"$nLosers") // 300 groups x 2 losers

    val st = GraftDelete.deleteIds(spark, dir, losers)
    assert(st.rowsDeleted == 600, s"$st")
    val survivors = spark.read.format("graft").load(dir)
    assert(survivors.count() == 300)
    // content-unique, and every keeper is the group minimum
    assert(survivors.groupBy(col("tokens")).count()
      .filter(col("count") > 1).count() == 0)
    assert(survivors.select(col("doc_id")).as[String].collect().toSet ==
      rows.grouped(3).map(_.head.doc_id).toSet)

    // idempotent re-run: every chunk now provably holds no listed id
    val again = GraftDelete.deleteIds(spark, dir, losers)
    assert(again == Lineage.DeleteStats(0, 0, 0, 0, 0), s"$again")
  }

  test("zone pruning: ids confined to one partition's range leave the " +
      "other partitions' files untouched on disk") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-delids-z").toString
    // sequential single-partition appends => tight per-partition zones
    val all = (0 until 800).map(i =>
      SeqRow(f"doc-$i%05d", Array.tabulate(6)(t => (i + t) % 90), 6, "web"))
    for (g <- 0 until 4)
      spark.createDataset(all.slice(g * 200, (g + 1) * 200)).toDF().coalesce(1)
        .write.format("graft").option("chunkTokens", "256").mode("append")
        .save(dir)
    val fs = org.apache.hadoop.fs.FileSystem.get(new java.net.URI(dir),
      spark.sparkContext.hadoopConfiguration)
    def mtimes = fs.listStatus(new org.apache.hadoop.fs.Path(s"$dir/data"))
      .map(f => f.getPath.getName -> f.getModificationTime).toMap
    val before = mtimes
    // ids all inside partition 1's range (docs 200-399)
    val ids = spark.createDataset(Seq("doc-00201", "doc-00250", "doc-00399"))
    val st = GraftDelete.deleteIds(spark, dir, ids)
    assert(st.rowsDeleted == 3 && st.partsRewritten == 1, s"$st")
    val after = mtimes
    val untouched = before.keys.filter(k => after.get(k).contains(before(k)))
    assert(untouched.size == 3, s"before=$before after=$after")
    assert(spark.read.format("graft").load(dir).count() == 797)
  }

  test("the byte cap refuses loudly; an empty id set is a no-op") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-delids-cap").toString
    Lineage.encodeToDir(spark.createDataset(mkDupRows(30)), dir,
      EncoderConfig(chunkTokens = 1 << 9, numPartitions = 1))
    val big = spark.createDataset((0 until 1000).map(i => f"doc-$i%05d"))
    val e = intercept[IllegalArgumentException] {
      GraftDelete.deleteIds(spark, dir, big, maxIdBytes = 100)
    }
    assert(e.getMessage.contains("split the delete"), e.getMessage)
    assert(spark.read.format("graft").load(dir).count() == 30)
    assert(GraftDelete.deleteIds(spark, dir, spark.emptyDataset[String]) ==
      Lineage.DeleteStats(0, 0, 0, 0, 0))
  }
}
