package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Similarity search over the `embeddings` table (vec_id, embedding
  * array<float>, label): brute-force cosine top-k baseline and a
  * random-hyperplane LSH-bucketed variant as the scale path.
  *
  * Scale note (100 TB): brute force is the correctness baseline — a
  * broadcast of the (small, fixed) query set against a full scan, which is
  * exactly how a production brute-force pass shapes up (queries broadcast,
  * corpus scanned once, per-partition top-k then global top-k via
  * window/limit). The LSH variant prunes the scan to matching buckets:
  * candidates shrink by the bucket selectivity, and the bucket join is an
  * equi-join Spark shuffles by key. */
object AnnQueries {

  private def emb(s: SparkSession, dir: String): DataFrame =
    s.read.parquet(s"$dir/embeddings.parquet")

  /** Cosine similarity as a native codegen'd expression (CosineSim): one
    * tight primitive loop inside WholeStageCodegen, numerically identical
    * to the zip_with/aggregate HOF tree it replaced (same accumulation
    * order), which paid per-element interpreted-lambda overhead. */
  private def cosineExpr(a: String, b: String) =
    graft.sql.GraftFunctions.cosine_sim(col(a), col(b))

  /** Brute-force exact top-5 cosine neighbors for query vectors
    * (vec_id < 5), excluding self. */
  def annBruteForce(s: SparkSession, dir: String): DataFrame = {
    val e = emb(s, dir)
      .select(col("vec_id"),
        transform(col("embedding"), x => x.cast("double")).as("vec"))
    val q = e.filter(col("vec_id") < lit(5))
      .select(col("vec_id").as("q_id"), col("vec").as("q_vec"))
    val scored = e.crossJoin(broadcast(q))
      .filter(col("vec_id") =!= col("q_id"))
      .withColumn("cos", cosineExpr("q_vec", "vec"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("q_id"))
      .orderBy(col("cos").desc, col("vec_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= lit(5))
      .select(col("q_id"), col("rank"), col("vec_id").as("neighbor_id"),
        round(col("cos"), 4).as("cos"))
      .orderBy(col("q_id"), col("rank"))
  }

  /** Oracle twin: DuckDB computes the identical double-precision cosine via
    * explicit per-element recursion-free unnest aggregation. */
  val annBruteForceSql: String =
    """WITH e AS (
      |  SELECT vec_id, [CAST(x AS DOUBLE) FOR x IN embedding] AS vec
      |  FROM embeddings),
      |q AS (SELECT vec_id AS q_id, vec AS q_vec FROM e WHERE vec_id < 5),
      |scored AS (
      |  SELECT q.q_id, e.vec_id,
      |    list_sum(list_transform(list_zip(q.q_vec, e.vec),
      |      p -> p[1] * p[2])) /
      |    greatest(sqrt(list_sum(list_transform(q.q_vec, x -> x * x))) *
      |             sqrt(list_sum(list_transform(e.vec, x -> x * x))), 1e-12)
      |      AS cos
      |  FROM e CROSS JOIN q WHERE e.vec_id <> q.q_id),
      |ranked AS (
      |  SELECT q_id, vec_id,
      |    row_number() OVER (PARTITION BY q_id ORDER BY cos DESC, vec_id)
      |      AS rank, cos
      |  FROM scored)
      |SELECT q_id, rank, vec_id AS neighbor_id, round(cos, 4) AS cos
      |FROM ranked WHERE rank <= 5 ORDER BY q_id, rank""".stripMargin

  /** LSH-bucketed ANN: 8 deterministic random hyperplanes -> 8-bit bucket
    * (256 buckets); neighbors searched only within the query's bucket.
    * Reports per-query bucket size, found top-1, and whether it agrees with
    * brute force (recall evidence). Oracled against an independent Python
    * replica of the whole operator (tools/gen_ann_fixtures.py). */
  def annLsh(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val e = emb(s, dir).select(col("vec_id"),
      transform(col("embedding"), x => x.cast("double")).as("vec"))
      .as[(Long, Array[Double])]
      .map { case (id, v) => (id, v, Hyperplanes.bucket(v)) }
      .toDF("vec_id", "vec", "bucket")
      .cache()
    val q = e.filter(col("vec_id") < lit(5))
      .select(col("vec_id").as("q_id"), col("vec").as("q_vec"),
        col("bucket").as("q_bucket"))
    val inBucket = e.join(broadcast(q), col("bucket") === col("q_bucket") &&
        col("vec_id") =!= col("q_id"))
      .withColumn("cos", cosineExpr("q_vec", "vec"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("q_id")).orderBy(col("cos").desc, col("vec_id"))
    val top = inBucket.withColumn("rank", row_number().over(w))
      .filter(col("rank") === lit(1))
      .select(col("q_id"), col("vec_id").as("lsh_top1"),
        round(col("cos"), 4).as("lsh_cos"))
    val bucketSizes = inBucket.groupBy(col("q_id"))
      .agg(count(lit(1)).as("bucket_candidates"))
    q.select(col("q_id"))
      .join(bucketSizes, Seq("q_id"), "left")
      .join(top, Seq("q_id"), "left")
      .na.fill(Map("bucket_candidates" -> 0L, "lsh_top1" -> -1L,
        "lsh_cos" -> 0.0))
      .orderBy(col("q_id"))
  }

  val annIvfSql: String =
    """SELECT q_id, ivf_top1, ivf_cos, brute_top1, probed_candidates,
      |  top1_agrees
      |FROM read_parquet('/root/repo/golden/ann_ivf_sf0.01.parquet')
      |ORDER BY q_id""".stripMargin

  val annLshSql: String =
    """SELECT q_id, bucket_candidates, lsh_top1, lsh_cos
      |FROM read_parquet('/root/repo/golden/ann_lsh_sf0.01.parquet')
      |ORDER BY q_id""".stripMargin

  val dedupEmbeddingSql: String =
    """SELECT vec_id, bucket, n_near_dups, max_cos
      |FROM read_parquet('/root/repo/golden/dedup_embedding_sf0.01.parquet')
      |ORDER BY vec_id""".stripMargin

  /** IVF (inverted-file) ANN: coarse-quantize vectors to K centroids
    * (deterministic k-means: splitmix-seeded centroids + 2 Lloyd iterations
    * over a sample), build the inverted lists as a (cluster -> vectors)
    * table, then search only the nProbe closest clusters per query.
    *
    * Scale shape: the centroid table is tiny (K x dim) and broadcast; list
    * assignment is a map; the probe join is an equi-join on cluster id.
    * At 10^9 vectors you'd raise K to keep list length ~ sqrt(N). Reports
    * per query the IVF top-1 vs brute-force top-1 (recall evidence). */
  def annIvf(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val e = emb(s, dir).select(col("vec_id"),
      transform(col("embedding"), x => x.cast("double")).as("vec"))
      .as[(Long, Array[Double])]
      .cache()
    // Deterministic coarse quantizer trained on an O(k) sample: modulo
    // thinning for spread, then a HARD row cap before the collect — the
    // driver sees at most k*128 vectors no matter how large the table is
    // (k-means init/refinement only needs O(k) points, not O(N)). The
    // collected sample is sorted by vec_id so training does not depend on
    // partition/arrival order (limit's pick is layout-dependent; the sort
    // pins everything after it).
    val k = 16
    val sample = e.filter(_._1 % 7 == 0).limit(k * 128).collect()
      .sortBy(_._1).map(_._2)
    val centroids = Ivf.train(sample, k = k, iters = 2)
    val bcCentroids = s.sparkContext.broadcast(centroids)
    val assigned = e.map { case (id, v) =>
      (id, v, Ivf.nearestCentroid(bcCentroids.value, v)) }
      .toDF("vec_id", "vec", "cluster")
      .cache()
    val queries = assigned.as[(Long, Array[Double], Int)]
      .filter(_._1 < 5)
      .map { case (id, v, _) =>
        (id, v, Ivf.nearestClusters(bcCentroids.value, v, nProbe = 4)) }
      .toDF("q_id", "q_vec", "probe")
      .select(col("q_id"), col("q_vec"), explode(col("probe")).as("cluster"))
    val probed = assigned.join(broadcast(queries), Seq("cluster"))
      .filter(col("vec_id") =!= col("q_id"))
      .withColumn("cos", cosineExpr("q_vec", "vec"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("q_id")).orderBy(col("cos").desc, col("vec_id"))
    val ivfTop = probed.withColumn("rank", row_number().over(w))
      .filter(col("rank") === lit(1))
      .select(col("q_id"), col("vec_id").as("ivf_top1"),
        round(col("cos"), 4).as("ivf_cos"))
    val bruteTop = annBruteForce(s, dir).filter(col("rank") === lit(1))
      .select(col("q_id"), col("neighbor_id").as("brute_top1"))
    val probeSizes = probed.groupBy(col("q_id"))
      .agg(count(lit(1)).as("probed_candidates"))
    ivfTop.join(bruteTop, Seq("q_id"), "full_outer")
      .join(probeSizes, Seq("q_id"), "left")
      .withColumn("top1_agrees", col("ivf_top1") === col("brute_top1"))
      .na.fill(Map("probed_candidates" -> 0L))
      .orderBy(col("q_id"))
  }

  /** Embedding near-dup: cosine >= 0.95 pairs found via LSH buckets;
    * per-vector summary (never empty); oracled against the independent
    * Python replica (incl. the guard). A max-bucket guard drops buckets
    * bigger than DedupQueries.MaxBucket before the self-join — one
    * degenerate bucket (the failure mode of fixed-plane LSH on clustered
    * embeddings) otherwise costs O(b^2) pairs in a single reducer. At
    * 10^9-vector scale you'd also raise NPlanes so expected bucket size
    * stays bounded (buckets scale 2^planes). */
  def dedupEmbedding(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val e = emb(s, dir).select(col("vec_id"),
      transform(col("embedding"), x => x.cast("double")).as("vec"))
      .as[(Long, Array[Double])]
      .map { case (id, v) => (id, v, Hyperplanes.bucket(v)) }
      .toDF("vec_id", "vec", "bucket")
      .cache()
    val guarded = DedupQueries.guardBuckets(e, "bucket")
    val a = guarded.as("a"); val b = guarded.as("b")
    val pairs = a.join(b, col("a.bucket") === col("b.bucket") &&
        col("a.vec_id") < col("b.vec_id"))
      .withColumn("cos",
        graft.sql.GraftFunctions.cosine_sim(col("a.vec"), col("b.vec")))
      .filter(col("cos") >= lit(0.95d))
      .select(col("a.vec_id").as("id_a"), col("b.vec_id").as("id_b"),
        col("cos"))
    val perVec = pairs.select(col("id_a").as("vec_id"), col("cos"))
      .union(pairs.select(col("id_b").as("vec_id"), col("cos")))
      .groupBy(col("vec_id"))
      .agg(count(lit(1)).as("n_near_dups"), round(max(col("cos")), 4).as("max_cos"))
    e.select(col("vec_id"), col("bucket"))
      .join(perVec, Seq("vec_id"), "left")
      .na.fill(Map("n_near_dups" -> 0L, "max_cos" -> 0.0))
      .orderBy(col("vec_id"))
  }
}

/** Deterministic k-means-lite coarse quantizer (no Spark deps, no RNG). */
object Ivf {
  /** Seeded centroids (splitmix over (k, dim)) refined by `iters` Lloyd
    * steps over the sample. Pure function of its inputs. */
  def train(sample: Array[Array[Double]], k: Int, iters: Int)
      : Array[Array[Double]] = {
    require(sample.nonEmpty)
    val dim = sample(0).length
    // init from evenly-strided sample points (deterministic, data-scaled —
    // synthetic-scale init off the data distribution collapses to one list)
    var cents = Array.tabulate(k)(c => sample((c * sample.length) / k).clone())
    var it = 0
    while (it < iters) {
      val sums = Array.fill(k)(new Array[Double](dim))
      val counts = new Array[Int](k)
      sample.foreach { v =>
        val c = nearestCentroid(cents, v)
        counts(c) += 1
        var d = 0
        while (d < dim) { sums(c)(d) += v(d); d += 1 }
      }
      cents = Array.tabulate(k) { c =>
        if (counts(c) == 0) cents(c)
        else sums(c).map(_ / counts(c))
      }
      it += 1
    }
    cents
  }

  private def dist2(a: Array[Double], b: Array[Double]): Double = {
    var s = 0.0
    var d = 0
    while (d < a.length) { val x = a(d) - b(d); s += x * x; d += 1 }
    s
  }

  def nearestCentroid(cents: Array[Array[Double]], v: Array[Double]): Int = {
    var best = 0
    var bd = dist2(cents(0), v)
    var c = 1
    while (c < cents.length) {
      val d = dist2(cents(c), v)
      if (d < bd) { bd = d; best = c }
      c += 1
    }
    best
  }

  def nearestClusters(cents: Array[Array[Double]], v: Array[Double],
                      nProbe: Int): Array[Int] =
    cents.indices.sortBy(c => dist2(cents(c), v)).take(nProbe).toArray
}

/** Deterministic random hyperplanes for sign-LSH (no Spark deps). */
object Hyperplanes {
  /** 8 planes -> 256 buckets: at corpus scale (500-5000 vectors) buckets
    * hold a handful of candidates; at 10^9-vector scale you'd raise planes
    * to keep bucket cardinality bounded (buckets scale 2^planes). */
  final val NPlanes = 8
  /** plane p, dim d -> weight in [-1, 1), splitmix64-derived. Unsigned
    * shift is load-bearing: a signed shift folds every weight into [-2, 0),
    * pointing all normals into one orthant and collapsing the buckets. */
  def weight(p: Int, d: Int): Double = {
    var z = (p.toLong << 32 | d.toLong) ^ 0x9E3779B97F4A7C15L
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z ^= z >>> 31
    (z >>> 11).toDouble * 1.1102230246251565e-16 * 2.0 - 1.0
  }

  def bucket(vec: Array[Double]): Int = {
    var out = 0
    var p = 0
    while (p < NPlanes) {
      var dot = 0.0
      var d = 0
      while (d < vec.length) { dot += weight(p, d) * vec(d); d += 1 }
      if (dot > 0) out |= (1 << p)
      p += 1
    }
    out
  }
}
