package graft.queries

import org.scalatest.funsuite.AnyFunSuite

/** Positive detection checks for the near-dup sketches: the driver corpus
  * has no real near-duplicates (best_jaccard 0 everywhere), so these verify
  * on constructed ones that the operators actually FIND near-dups, not just
  * avoid false positives. Kernel-level (the Spark plumbing is exercised by
  * the driver queries). */
class DedupDetectionSpec extends AnyFunSuite {

  // varied text (distinct shingles) with ONE localized edit — repeated text
  // collapses the shingle set and an edit touches every repetition
  private val base = (0 until 150)
    .map(i => s"alpha$i bravo${i * 7 % 91} charlie${i * 13 % 77}")
    .mkString(" ")
  private val nearDup = base.replace("alpha50", "delta50")
  private val unrelated = (0 until 150)
    .map(i => s"xray$i yankee${i * 3 % 53} zulu${i * 11 % 67}")
    .mkString(" ")

  test("minhash band keys collide for near-dups, not for unrelated docs") {
    def keys(t: String) =
      Shingles.minhashBandKeys(Shingles.wordShingles(t, 3), 32, 8).toSet
    val kBase = keys(base)
    assert(kBase.intersect(keys(nearDup)).nonEmpty,
      "near-dup shares no LSH band — recall failure")
    assert(kBase.intersect(keys(unrelated)).isEmpty,
      "unrelated doc shares a band — precision failure")
  }

  test("exact jaccard of shingle sets ranks near-dup far above unrelated") {
    def jac(a: Array[Long], b: Array[Long]): Double = {
      val sa = a.toSet; val sb = b.toSet
      sa.intersect(sb).size.toDouble / sa.union(sb).size
    }
    val gBase = Shingles.wordShingles(base, 3)
    assert(jac(gBase, Shingles.wordShingles(nearDup, 3)) > 0.5)
    assert(jac(gBase, Shingles.wordShingles(unrelated, 3)) < 0.05)
  }

  test("simhash hamming distance separates near-dup from unrelated") {
    def sh(t: String) = Shingles.simhash(Shingles.wordShingles(t, 3))
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    assert(ham(sh(base), sh(nearDup)) <= 8,
      s"near-dup hamming ${ham(sh(base), sh(nearDup))} > 8")
    assert(ham(sh(base), sh(unrelated)) > 16,
      s"unrelated hamming ${ham(sh(base), sh(unrelated))} too low")
  }

  test("char n-gram shingles behave the same way") {
    def jac(a: Array[Long], b: Array[Long]): Double = {
      val sa = a.toSet; val sb = b.toSet
      sa.intersect(sb).size.toDouble / sa.union(sb).size
    }
    val gBase = Shingles.charShingles(base, 4)
    assert(jac(gBase, Shingles.charShingles(nearDup, 4)) > 0.6)
    assert(jac(gBase, Shingles.charShingles(unrelated, 4)) < 0.1)
  }

  test("max-bucket guard bounds a pathological 10k-copy hot bucket") {
    val spark = graft.SparkTestSession.spark
    import spark.implicits._
    // 10k byte-identical copies: every band bucket holds all 10k docs —
    // ungated, the self-join would expand to ~5*10^7 pairs in one reducer
    val copies = (0L until 10000L).map(i =>
      (i, base, "en", "src0", base.length.toLong))
    val docs = (copies :+ ((10000L, nearDup, "en", "src0", nearDup.length.toLong)))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val dir = java.nio.file.Files.createTempDirectory("dedup-hot").toString
    docs.write.parquet(s"$dir/documents.parquet")
    val t0 = System.nanoTime()
    val out = DedupQueries.dedupMinhash(spark, dir).collect()
    val sec = (System.nanoTime() - t0) / 1e9
    assert(out.length == 10001)
    // the hot bucket was dropped: candidate counts stay bounded by the guard
    val maxCand = out.map(r => r.getLong(2)).max
    assert(maxCand <= DedupQueries.MaxBucket.toLong * 8,
      s"guard failed: $maxCand candidates")
    // exact copies remain the job of dedup_exact — prove it catches them
    val exact = DedupQueries.dedupExact(spark, dir).collect()(0)
    assert(exact.getLong(3) == 9999L, s"redundant_docs: $exact") // 10k copies - keeper
    info(f"10k-copy corpus completed in $sec%.1fs, max candidates $maxCand")
  }

  test("spark-side minhash query surfaces an injected near-dup pair") {
    val spark = graft.SparkTestSession.spark
    import spark.implicits._
    // write a small documents table with an injected near-dup into a temp dir
    val docs = Seq(
      (0L, base, "en", "src0", base.length.toLong),
      (1L, nearDup, "en", "src0", nearDup.length.toLong),
      (2L, unrelated, "en", "src1", unrelated.length.toLong),
      (3L, "tiny text", "en", "src1", 9L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val dir = java.nio.file.Files.createTempDirectory("dedup-docs").toString
    docs.write.parquet(s"$dir/documents.parquet")
    val out = DedupQueries.dedupMinhash(spark, dir).collect()
      .map(r => r.getLong(0) -> r.getDouble(3)).toMap
    assert(out(0L) > 0.5 && out(1L) > 0.5,
      s"injected near-dup not found: $out")
    assert(out(2L) == 0.0 && out(3L) == 0.0, s"false positive: $out")
  }

  test("dedupClusters releases its checkpoint generations (no pinned blocks)") {
    val spark = graft.SparkTestSession.spark
    import spark.implicits._
    val docs = Seq(
      (0L, base, "en", "src0", base.length.toLong),
      (1L, nearDup, "en", "src0", nearDup.length.toLong),
      (2L, base + " tail", "en", "src0", (base.length + 5).toLong),
      (3L, unrelated, "en", "src1", unrelated.length.toLong))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val dir = java.nio.file.Files.createTempDirectory("dedup-cl").toString
    docs.write.parquet(s"$dir/documents.parquet")
    val before = spark.sparkContext.getPersistentRDDs.keySet.toSet
    val res = DedupQueries.dedupClusters(spark, dir)
    val rows = res.collect().map(r => (r.getLong(0), r.getLong(1)))
    // docs 0/1/2 are one near-dup cluster; 3 is clean (no row)
    assert(rows.toSeq == Seq((0L, 3L)), s"clusters were ${rows.toSeq}")
    // the ~25 per-round label generations were released inside the query;
    // only the (one-row-per-cluster) RESULT checkpoint may remain pinned
    val leaked = spark.sparkContext.getPersistentRDDs.keySet.toSet -- before
    leaked.foreach { id =>
      val r = spark.sparkContext.getPersistentRDDs(id)
      info(s"leaked RDD $id: ${r.name} / ${r.toString} level=${r.getStorageLevel}")
    }
    assert(leaked.size <= 1,
      s"dedupClusters left ${leaked.size} pinned RDDs: $leaked")
    leaked.foreach(id =>
      spark.sparkContext.getPersistentRDDs(id).unpersist(blocking = true))

    // the DISTRIBUTED propagation path (the 100-TB shape): force the
    // driver union-find bound to 0 and pin the identical result + the
    // same no-leak contract
    spark.conf.set("graft.cluster.maxLocalPairs", "0")
    try {
      val before2 = spark.sparkContext.getPersistentRDDs.keySet.toSet
      val rows2 = DedupQueries.dedupClusters(spark, dir).collect()
        .map(r => (r.getLong(0), r.getLong(1)))
      assert(rows2.toSeq == Seq((0L, 3L)),
        s"distributed path diverged: ${rows2.toSeq}")
      val leaked2 = spark.sparkContext.getPersistentRDDs.keySet.toSet -- before2
      assert(leaked2.size <= 1,
        s"distributed dedupClusters left ${leaked2.size} pinned RDDs: $leaked2")
      leaked2.foreach(id =>
        spark.sparkContext.getPersistentRDDs(id).unpersist(blocking = true))
    } finally spark.conf.unset("graft.cluster.maxLocalPairs")
  }
}
