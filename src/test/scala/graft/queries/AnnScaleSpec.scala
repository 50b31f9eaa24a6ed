package graft.queries

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Scale behavior of the similarity sketches: the parameters must ADAPT to
  * corpus size. At 50k+ vectors a CONSTANT 8-plane LSH puts every bucket
  * over the MaxBucket guard — the guard then drops all of them and the
  * operator reports zero near-dups with a straight face. planesFor(N) keeps
  * expected bucket size ~TargetBucket, so planted duplicates stay findable
  * and the dropped fraction stays observable (and ~0) in the output. */
class AnnScaleSpec extends AnyFunSuite {

  private def mix(z0: Long): Long = {
    var z = z0 ^ 0x9E3779B97F4A7C15L
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z ^ (z >>> 31)
  }

  /** Deterministic pseudo-random vector, components in [-1, 1). */
  private def vec(seed: Long, dim: Int): Array[Float] =
    Array.tabulate(dim) { d =>
      ((mix(seed * 1000003L + d) >>> 11).toDouble *
        1.1102230246251565e-16 * 2.0 - 1.0).toFloat
    }

  test("planesFor scales with N; kFor tracks sqrt(N)") {
    assert(Hyperplanes.planesFor(0) == 8)
    assert(Hyperplanes.planesFor(500) == 8) // sf0.01 fixture scale: unchanged
    assert(Hyperplanes.planesFor(4096) == 8)
    assert(Hyperplanes.planesFor(4097) == 9)
    assert(Hyperplanes.planesFor(50200) == 12)
    assert(Hyperplanes.planesFor(1L << 40) == 28) // clamped
    assert(Ivf.kFor(0) == 4)
    assert(Ivf.kFor(500) == 23)
    assert(Ivf.kFor(50200) == 225)
    assert(Ivf.kFor(1L << 50) == 4096) // clamped
  }

  private val dim = 16
  private val nBase = 50000
  private val nPlanted = 200

  /** 50k distinct pseudo-random vectors + 200 planted exact copies of the
    * first 200 (ids 100000+i): 200 guaranteed cos=1.0 near-dup pairs, and
    * every query id (vec_id < 5) has a known exact twin. */
  private lazy val raw50k = {
    val spark = graft.SparkTestSession.spark
    import spark.implicits._
    val rows = (0 until nBase).map(i => (i.toLong, vec(i, dim))) ++
      (0 until nPlanted).map(i => (100000L + i, vec(i, dim)))
    rows.toDF("vec_id", "embedding")
      .repartition(8, col("vec_id"))
      .cache()
  }

  test("adaptive planes keep near-dup recall alive at 50k vectors " +
      "(constant 8 planes would guard-drop every bucket)") {
    val spark = graft.SparkTestSession.spark
    import spark.implicits._
    val raw = raw50k

    val out = AnnQueries.dedupEmbeddingOver(spark, raw).cache()
    assert(out.count() == (nBase + nPlanted).toLong)

    // every planted pair found: exact copies share a bucket in EVERY band,
    // and with planesFor(50200)=12 x 2 bands a pair is lost only if both
    // its buckets sit over the guard cap (~1% of the ~10% per-band hot
    // tail squared — measured 0 of 200 on this corpus)
    val found = out.filter(col("n_near_dups") > 0)
      .select(col("vec_id")).as[Long].collect().toSet
    val missing = (0 until nPlanted).filter(i =>
      !found(i.toLong) || !found(100000L + i))
    assert(missing.isEmpty, s"planted near-dups lost: $missing")

    // degradation is observable and bounded: sign-LSH's skewed bucket tail
    // puts ~10% of (row, band) entries over the cap at this scale — the
    // operator REPORTS it instead of hiding it
    val frac = out.select(col("dropped_bucket_frac")).as[Double].first()
    assert(frac > 0.0 && frac < 0.2,
      s"dropped_bucket_frac=$frac at adaptive planes")

    // the round-2 failure mode, demonstrated: at a constant 8 planes the
    // expected bucket is ~196 > MaxBucket=128 — the guard drops ~87% of
    // rows (measured), so near-dup recall collapses while the output
    // looks like "no duplicates"
    val at8 = raw.as[(Long, Array[Float])]
      .map { case (id, v) =>
        (id, Hyperplanes.bucket(v.map(_.toDouble), 8)) }
      .toDF("vec_id", "bucket")
    val (kept8, stats8) = DedupQueries.guardBucketsWithStats(at8, "bucket")
    val keptN = kept8.count()
    assert(keptN < (nBase + nPlanted) / 5L,
      s"expected constant-8-plane guard to drop most rows, kept $keptN")
    val frac8 = stats8.as[Double].first()
    assert(frac8 > 0.8, s"dropped_bucket_frac at 8 planes: $frac8")
    out.unpersist()
  }

  test("session knobs retune sketch parameters without a rebuild") {
    val spark = graft.SparkTestSession.spark
    assert(Hyperplanes.targetBucket(spark) == 16L)
    assert(Ivf.maxK(spark) == 4096)
    assert(DedupQueries.maxBucket(spark) == 128)
    spark.conf.set("graft.lsh.targetBucket", "4")
    spark.conf.set("graft.ivf.maxK", "64")
    spark.conf.set("graft.dedup.maxBucket", "32")
    try {
      assert(Hyperplanes.planesFor(16384, Hyperplanes.targetBucket(spark)) == 12)
      assert(Ivf.kFor(1000000, Ivf.maxK(spark)) == 64)
      assert(DedupQueries.maxBucket(spark) == 32)
    } finally {
      spark.conf.unset("graft.lsh.targetBucket")
      spark.conf.unset("graft.ivf.maxK")
      spark.conf.unset("graft.dedup.maxBucket")
    }
  }

  test("banded ann_lsh and adaptive-k ann_ivf find each query's planted " +
      "exact twin at 50k vectors") {
    val spark = graft.SparkTestSession.spark
    import spark.implicits._
    // every query (vec_id < 5) has an exact copy at 100000+q: the copy
    // shares EVERY band bucket and the query's own IVF cluster, so both
    // sketches must return it as top-1 (cos = 1.0) — end-to-end recall
    // evidence at a scale where the round-2 constants returned nothing
    val lsh = AnnQueries.annLshOver(spark, raw50k).collect()
    assert(lsh.length == 5)
    lsh.foreach { r =>
      val q = r.getLong(0)
      assert(r.getLong(2) == 100000L + q, // lsh_top1
        s"q=$q lsh_top1=${r.getLong(2)} (candidates=${r.getLong(1)})")
      assert(r.getLong(1) > 0L)
    }
    val (qIds, ivfTop, _) = AnnQueries.ivfTopAndSizesOver(spark, raw50k)
    val ivf = qIds.join(ivfTop, Seq("q_id")).orderBy(col("q_id")).collect()
    assert(ivf.length == 5)
    ivf.foreach { r =>
      val q = r.getLong(0)
      assert(r.getLong(1) == 100000L + q, // ivf_top1
        s"q=$q ivf_top1=${r.getLong(1)}")
    }
  }
}
