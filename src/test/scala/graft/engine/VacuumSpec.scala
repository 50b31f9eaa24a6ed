package graft.engine

import org.scalatest.funsuite.AnyFunSuite
import org.apache.hadoop.fs.Path

/** `Lineage.vacuum`: reclaims exactly the three garbage classes a crash
  * can strand (stale .inprogress attempts, superseded generations, TTL-old
  * gen>0 data with no manifest) and touches NOTHING live — fresh attempts,
  * gen-0 resume state, and every committed file survive, and the table
  * reads identically afterward. */
class VacuumSpec extends AnyFunSuite {
  private lazy val spark = graft.SparkTestSession.spark
  private def conf = spark.sparkContext.hadoopConfiguration
  private def fsFor(dir: String) =
    org.apache.hadoop.fs.FileSystem.get(new java.net.URI(dir), conf)

  private def mkTable(n: Int): String = {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-vac").toString
    val rows = (0 until n).map(i =>
      SeqRow(f"doc-$i%05d", Array.tabulate(6)(t => (i + t) % 90), 6,
        if (i % 2 == 0) "web" else "books"))
    Lineage.encodeToDir(spark.createDataset(rows), dir,
      EncoderConfig(chunkTokens = 1 << 9, numPartitions = 2))
    dir
  }

  private def touch(dir: String, rel: String): Path = {
    val fs = fsFor(dir)
    val p = new Path(s"$dir/$rel")
    val out = fs.create(p, true)
    out.write("junk".getBytes("UTF-8"))
    out.close()
    p
  }

  test("vacuum removes stale inprogress + crash-stranded generations, " +
      "spares live state, and the table reads the same") {
    import spark.implicits._
    val dir = mkTable(400)
    val fs = fsFor(dir)
    val before = spark.read.format("graft").load(dir)
      .as[SeqRow].collect().map(_.doc_id).sorted

    // (a) stale + fresh .inprogress attempt files
    touch(dir, "data/part-00000.graft.inprogress-stale")
    touch(dir, "_lineage/part-00000.json.inprogress-stale")
    val fresh = touch(dir, "data/part-00001.graft.inprogress-fresh")
    // (b) a crash between a DELETE's commit and retirement: fabricate the
    // OLD generation lingering under a committed gen-1 — do a real delete,
    // then resurrect fake gen-0 leftovers for partition 0
    val st = Lineage.deleteRewrite(spark, dir,
      _ => Lineage.DeleteClass.Maybe, (r: SeqRow) => r.doc_id == "doc-00003")
    assert(st.rowsDeleted == 1, s"$st")
    // the rewritten partition (now at gen 1) is the one whose stranded
    // gen-0 files we fabricate — the untouched partition is still LIVE at
    // gen 0 and must not be overwritten
    val rewrittenPart = fs.listStatus(new Path(s"$dir/_lineage"))
      .map(_.getPath.getName).collectFirst {
        case n if n.endsWith(".g1.json") => n.stripSuffix(".g1.json")
      }.get
    val strandedM = touch(dir, s"_lineage/$rewrittenPart.json")
    val strandedD = touch(dir, s"data/$rewrittenPart.graft")
    // (c) an abandoned gen-2 data file with no manifest
    val abandoned = touch(dir, "data/part-00001.g2.graft")

    // age the stale artifacts; leave `fresh` at now
    val old = System.currentTimeMillis() - 48L * 3600 * 1000
    Seq("data/part-00000.graft.inprogress-stale",
      "_lineage/part-00000.json.inprogress-stale",
      "data/part-00001.g2.graft")
      .foreach(r => fs.setTimes(new Path(s"$dir/$r"), old, -1))

    val v = Lineage.vacuum(conf, dir, olderThanMs = 3600 * 1000)
    assert(v.inprogressRemoved == 2, s"$v")
    assert(v.supersededRemoved == 2, s"$v") // stranded gen-0 json + graft
    assert(v.orphanDataRemoved == 1, s"$v")
    assert(fs.exists(fresh), "a fresh attempt file must survive")
    assert(!fs.exists(strandedM) && !fs.exists(strandedD))
    assert(!fs.exists(abandoned))

    val after = spark.read.format("graft").load(dir)
      .as[SeqRow].collect().map(_.doc_id).sorted
    assert(after.toSeq == before.filterNot(_ == "doc-00003").toSeq)

    // idempotent: a second vacuum finds nothing
    assert(Lineage.vacuum(conf, dir, olderThanMs = 3600 * 1000) ==
      Lineage.VacuumStats(0, 0, 0))
  }

  test("vacuum on a clean just-encoded table is a no-op (gen-0 data and " +
      "manifests untouched)") {
    val dir = mkTable(100)
    val fs = fsFor(dir)
    val filesBefore =
      (fs.listStatus(new Path(s"$dir/data")) ++
        fs.listStatus(new Path(s"$dir/_lineage"))).map(_.getPath.getName).sorted
    assert(Lineage.vacuum(conf, dir, olderThanMs = 0) ==
      Lineage.VacuumStats(0, 0, 0))
    val filesAfter =
      (fs.listStatus(new Path(s"$dir/data")) ++
        fs.listStatus(new Path(s"$dir/_lineage"))).map(_.getPath.getName).sorted
    assert(filesAfter.toSeq == filesBefore.toSeq)
  }
}
