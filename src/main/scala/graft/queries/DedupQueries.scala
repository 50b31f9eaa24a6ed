package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deduplication operators for a training-data pipeline: exact, MinHash+LSH,
  * SimHash, n-gram Jaccard. All distributed shapes are scale-honest: no
  * collect(), candidate generation via shuffle joins on bucket keys, exact
  * verification only inside buckets (never all-pairs).
  *
  * Scale note (100 TB): the LSH band join is the classic
  * shingle->minhash->band->bucket-join pipeline; bucket keys are salted by
  * band index so one hot bucket cannot hotspot a reducer; the per-bucket
  * pair expansion is capped by guardBuckets (bucket sizes are tiny for
  * non-duplicate corpora, and buckets above MaxBucket are dropped before
  * the self-join the way production dedup pipelines do — a bucket of b
  * members costs O(b^2) candidate pairs in ONE reducer, so a single
  * 10k-copy document would otherwise pin the job on 5*10^7 pairs). Docs in
  * a dropped bucket are still seen through their other bands, and exact
  * copies — the only way a bucket gets that hot — are already caught by
  * dedup_exact / dedup_tokens. */
object DedupQueries {

  /** Bucket-size cap for all LSH-family self-joins: caps the worst-case
    * per-bucket pair expansion at MaxBucket^2/2 (~8k pairs), independent of
    * corpus size or duplication rate. Tunable per session via
    * `graft.dedup.maxBucket` (a config change, not a rebuild — the oracle
    * replicas pin the default). */
  final val MaxBucket = 128

  private[queries] def maxBucket(s: SparkSession): Int =
    s.conf.get("graft.dedup.maxBucket", MaxBucket.toString).toInt

  /** Keep only bucket rows whose `key` bucket has <= MaxBucket members —
    * an aggregate + left-semi join, both plain shuffles on the 8-byte key;
    * no bucket's member list is ever materialized on one node. */
  private[queries] def guardBuckets(buckets: DataFrame, key: String,
                                    cap: Int = MaxBucket): DataFrame =
    guardBucketsWithStats(buckets, key, cap)._1

  /** guardBuckets plus the observability row the guard owes its callers:
    * a 1-row frame with `dropped_bucket_frac` = fraction of input ROWS that
    * sat in over-cap buckets and were dropped. Callers surface it as an
    * output column so scale degradation is visible in the result, never
    * silent (a guard that quietly drops every bucket looks identical to
    * "no duplicates" otherwise). */
  private[queries] def guardBucketsWithStats(buckets: DataFrame, key: String,
      cap: Int = MaxBucket): (DataFrame, DataFrame) = {
    // deliberately NOT cached: the frame is read by two separate actions
    // at most (semi-join build + the 1-row stats aggregate), and a cache
    // here outlives the query — session-lifetime pinned blocks nobody
    // releases. Recomputing the per-bucket count once is cheaper than a
    // leak on a long-lived session.
    val sizes = buckets.groupBy(col(key))
      .agg(count(lit(1)).as("__bucket_n"))
    val small = sizes.filter(col("__bucket_n") <= cap).select(col(key))
    val kept = buckets.join(small, Seq(key), "left_semi")
    val stats = sizes.agg(
      round(coalesce(
        sum(when(col("__bucket_n") > cap, col("__bucket_n"))).cast("double") /
          sum(col("__bucket_n")), lit(0.0)), 4).as("dropped_bucket_frac"))
    (kept, stats)
  }

  private def docs(s: SparkSession, dir: String): DataFrame =
    s.read.parquet(s"$dir/documents.parquet")

  /** Exact dedup summary. The grouping key is sha2-256 of the text, not the
    * text itself: the shuffle moves 64-byte hex digests instead of whole
    * documents (at 100 TB that IS the job), and a 256-bit collision is
    * beyond cosmic-ray odds, so digest-distinct == text-distinct (the
    * DuckDB oracle groups by the raw text and must agree). */
  def dedupExact(s: SparkSession, dir: String): DataFrame = {
    val perText = docs(s, dir).groupBy(sha2(col("text"), 256).as("text_key"))
      .agg(count(lit(1)).as("n"), min(col("doc_id")).as("keeper"))
    perText.agg(
      sum(col("n")).cast("long").as("total_docs"),
      count(lit(1)).as("distinct_texts"),
      sum(when(col("n") > 1, lit(1)).otherwise(lit(0))).cast("long")
        .as("dup_groups"),
      sum(when(col("n") > 1, col("n") - 1).otherwise(lit(0))).cast("long")
        .as("redundant_docs"))
  }

  val dedupExactSql: String =
    """WITH g AS (SELECT text, count(*) AS n FROM documents GROUP BY text)
      |SELECT CAST(sum(n) AS BIGINT) AS total_docs,
      |  count(*) AS distinct_texts,
      |  CAST(sum(CASE WHEN n > 1 THEN 1 ELSE 0 END) AS BIGINT) AS dup_groups,
      |  CAST(sum(CASE WHEN n > 1 THEN n - 1 ELSE 0 END) AS BIGINT)
      |    AS redundant_docs
      |FROM g""".stripMargin

  // Whole-operator oracle twins: tools/gen_dedup_fixtures.py reimplements
  // shingling, minhash band keys, simhash, the guard, and exact Jaccard in
  // Python from scratch and pins the expected outputs at sf0.01.
  val dedupMinhashSql: String =
    """SELECT doc_id, n_shingles, n_candidates, best_jaccard
      |FROM read_parquet('/root/repo/golden/dedup_minhash_sf0.01.parquet')
      |ORDER BY doc_id""".stripMargin

  val dedupSimhashSql: String =
    """SELECT doc_id, simhash, n_near, min_hamming
      |FROM read_parquet('/root/repo/golden/dedup_simhash_sf0.01.parquet')
      |ORDER BY doc_id""".stripMargin

  val dedupNgramSql: String =
    """SELECT doc_id, n_ngrams, n_candidates, best_ngram_jaccard
      |FROM read_parquet('/root/repo/golden/dedup_ngram_sf0.01.parquet')
      |ORDER BY doc_id""".stripMargin

  /** Per-doc word 3-shingle set, hashed to longs (shared by the near-dup
    * family). */
  private def shingled(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    docs(s, dir).select(col("doc_id").cast("long"), col("text"))
      .as[(Long, String)]
      .map { case (id, text) => (id, Shingles.wordShingles(text, 3)) }
      .toDF("doc_id", "shingles")
  }

  /** MinHash + LSH near-dup: 32 minhashes, 8 bands x 4 rows; candidates =
    * same (band, bucket); verified with exact Jaccard on shingle sets via
    * array_intersect/array_union (codegen'd, no UDF). Output: per-doc
    * candidate count and best Jaccard (never empty). */
  /** Jaccard-verified minhash candidate pairs (id_a < id_b, jaccard
    * rounded HALF-UP to 4 places) — ONE copy shared by the per-doc summary
    * (dedupMinhash) and the cluster extraction (dedupClusters). */
  private def verifiedCandidates(s: SparkSession,
                                 sh: DataFrame): DataFrame = {
    import s.implicits._
    val sigs = sh.as[(Long, Array[Long])]
      .map { case (id, shingles) =>
        (id, Shingles.minhashBandKeys(shingles, nHashes = 32, bands = 8)) }
      .toDF("doc_id", "band_keys")
    val buckets = guardBuckets(sigs.select(col("doc_id"),
      explode(col("band_keys")).as("band_key")), "band_key", maxBucket(s))
    // candidate pairs: self-join inside buckets; a<b kills mirror duplicates
    val a = buckets.as("a"); val b = buckets.as("b")
    val cand = a.join(b, col("a.band_key") === col("b.band_key") &&
        col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("id_a"), col("b.doc_id").as("id_b"))
      .distinct()
    cand
      .join(sh.select(col("doc_id").as("id_a"), col("shingles").as("sh_a")), "id_a")
      .join(sh.select(col("doc_id").as("id_b"), col("shingles").as("sh_b")), "id_b")
      .withColumn("jaccard", round(
        size(array_intersect(col("sh_a"), col("sh_b"))).cast("double") /
          greatest(size(array_union(col("sh_a"), col("sh_b"))), lit(1)), 4))
      .select(col("id_a"), col("id_b"), col("jaccard"))
  }

  def dedupMinhash(s: SparkSession, dir: String): DataFrame = {
    val sh = shingled(s, dir).cache()
    val withSets = verifiedCandidates(s, sh)
    val perDoc = withSets.select(col("id_a").as("doc_id"), col("jaccard"))
      .union(withSets.select(col("id_b").as("doc_id"), col("jaccard")))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_candidates"),
        round(max(col("jaccard")), 4).as("best_jaccard"))
    sh.select(col("doc_id"), size(col("shingles")).as("n_shingles"))
      .join(perDoc, Seq("doc_id"), "left")
      .na.fill(Map("n_candidates" -> 0L, "best_jaccard" -> 0.0))
      .orderBy(col("doc_id"))
  }

  /** Duplicate-cluster extraction — the step a training pipeline runs
    * AFTER near-dup detection: connected components over the verified
    * pairs (jaccard >= 0.8), one row per cluster with its canonical
    * representative (min doc_id — the doc a dedup pass would KEEP) and
    * size.
    *
    * Algorithm: iterative min-label propagation. Each round is one
    * join + min-aggregation over (long, long) rows — 16-byte shuffle
    * records regardless of document size — and converges in O(cluster
    * diameter) rounds; near-dup clusters are stars/cliques of tiny
    * diameter, so a handful of rounds suffices at any corpus scale (the
    * driver loop moves no data, only counts). `localCheckpoint` cuts the
    * per-round lineage so the plan does not grow exponentially. A hard
    * iteration cap fails LOUDLY — a silently unconverged clustering would
    * undercount duplicates. Oracled vs an independent Python union-find
    * over the same pairs (tools/gen_cluster_fixture.py). */
  def dedupClusters(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val sc = s.sparkContext
    // eager localCheckpoint + the set of storage blocks it pinned: the
    // ONLY way to release a superseded generation deterministically
    // (Dataset.unpersist covers cacheManager entries, not checkpoint
    // blocks; without this, every round's generation stays pinned until
    // the driver GCs the last reference)
    def checkpointTracked(df: DataFrame): (DataFrame, Set[Int]) = {
      val before = sc.getPersistentRDDs.keySet.toSet
      val cp = df.localCheckpoint(true)
      (cp, sc.getPersistentRDDs.keySet.toSet -- before)
    }
    def release(ids: Set[Int]): Unit =
      ids.foreach(id =>
        sc.getPersistentRDDs.get(id).foreach(_.unpersist(blocking = false)))
    val sh = shingled(s, dir).cache()
    val pairs = verifiedCandidates(s, sh)
      .filter(col("jaccard") >= 0.8)
      .select(col("id_a"), col("id_b"))
      .cache()
    val nPairs = pairs.count()
    // a clean corpus has no verified pairs: the empty cluster table IS the
    // answer (and the sum-potential below would be a null decimal)
    if (nPairs == 0L) {
      sh.unpersist(); pairs.unpersist()
      return s.emptyDataset[(Long, Long)].toDF("cluster_rep", "size")
    }
    // BOUNDED driver fast path: a verified near-dup pair set is 16 bytes a
    // row, and below `graft.cluster.maxLocalPairs` (default 4M pairs =
    // 64 MB — the same driver-budget stance as the training collects) a
    // driver-side union-find reaches the identical fixpoint (component
    // minimum as representative) in ONE collect instead of O(diameter)
    // join+aggregate rounds of fixed Spark overhead each. Past the bound —
    // the 100-TB path — the distributed min-label propagation below runs
    // unchanged (cost per round independent of document size; the loop is
    // exercised in-suite with the bound forced to 0).
    val maxLocal = s.conf.get("graft.cluster.maxLocalPairs",
      (1L << 22).toString).toLong
    if (nPairs <= maxLocal) {
      val edgeArr = pairs.as[(Long, Long)].collect()
      val parent = new java.util.HashMap[Long, Long]()
      def find(x0: Long): Long = {
        var root = x0
        while (parent.getOrDefault(root, root) != root)
          root = parent.getOrDefault(root, root)
        var x = x0
        while (parent.getOrDefault(x, x) != root) {
          val next = parent.getOrDefault(x, x); parent.put(x, root); x = next
        }
        root
      }
      edgeArr.foreach { case (a, b) =>
        val ra = find(a); val rb = find(b)
        // union toward the smaller root: the final root IS the component
        // minimum, exactly the min-label fixpoint
        if (ra < rb) parent.put(rb, ra)
        else if (rb < ra) parent.put(ra, rb)
      }
      val sizes = new java.util.TreeMap[Long, Long]()
      val seen = new java.util.HashSet[Long]()
      edgeArr.foreach { case (a, b) =>
        Seq(a, b).foreach { id =>
          if (seen.add(id)) {
            val r = find(id)
            sizes.put(r, sizes.getOrDefault(r, 0L) + 1L)
          }
        }
      }
      sh.unpersist(); pairs.unpersist()
      import scala.jdk.CollectionConverters._
      return s.createDataset(
          sizes.entrySet().iterator().asScala
            .map(e => (e.getKey.longValue(), e.getValue.longValue())).toSeq)
        .toDF("cluster_rep", "size")
        .orderBy(col("cluster_rep"))
    }
    val edges = pairs
      .union(pairs.select(col("id_b").as("id_a"), col("id_a").as("id_b")))
      .toDF("src", "dst")
      .cache()
    // start one round ahead: label(id) = min(id, min neighbor id) is
    // exactly what the first propagation round produced from the identity
    // labeling, for the same one shuffle the old distinct() cost — the
    // fixpoint (component minimum) is unchanged, the loop converges one
    // round earlier
    var (labels, labelIds) = checkpointTracked(
      edges.groupBy(col("src").as("id"))
        .agg(min(least(col("src"), col("dst"))).as("label")))
    // labels only ever DECREASE (min-propagation), so the label sum is a
    // strictly decreasing potential: unchanged sum == converged. One cheap
    // aggregate per round instead of a change-detection join.
    var prevSum = BigDecimal(-1)
    var converged = false
    var iter = 0
    val maxIter = 25
    while (!converged && iter < maxIter) {
      // every node adopts the minimum of its own and its neighbors' labels
      val viaEdges = edges
        .join(labels.select(col("id").as("src"), col("label")), "src")
        .select(col("dst").as("id"), col("label"))
      val (next, nextIds) = checkpointTracked(
        labels.select(col("id"), col("label")).union(viaEdges)
          .groupBy(col("id")).agg(min(col("label")).as("label")))
      val sum = BigDecimal(next
        .agg(org.apache.spark.sql.functions.sum(col("label").cast("decimal(38,0)")))
        .collect()(0).getDecimal(0))
      converged = sum == prevSum
      prevSum = sum
      release(labelIds) // the superseded generation, eagerly
      labels = next; labelIds = nextIds
      iter += 1
    }
    if (!converged) throw new IllegalStateException(
      s"dedup_clusters did not converge in $maxIter rounds — raise the cap")
    // checkpoint the (one-row-per-CLUSTER, much smaller than per-doc
    // labels) result eagerly so the per-doc generation can be released
    // too: the returned frame pins exactly one small block, which the
    // ContextCleaner reclaims when the caller drops it
    val (result, _) = checkpointTracked(
      labels.groupBy(col("label").as("cluster_rep"))
        .agg(count(lit(1)).as("size"))
        .orderBy(col("cluster_rep")))
    release(labelIds)
    sh.unpersist(); pairs.unpersist(); edges.unpersist()
    result
  }

  val dedupClustersSql: String =
    """SELECT cluster_rep, size
      |FROM read_parquet('/root/repo/golden/dedup_clusters_sf0.01.parquet')
      |ORDER BY cluster_rep""".stripMargin

  /** SimHash near-dup: 64-bit simhash over shingle hashes; blocking on four
    * 16-bit sub-bands (two matching sub-bands <=> hamming-close candidates);
    * verify hamming <= 8. Output per doc (never empty). */
  def dedupSimhash(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val sims = docs(s, dir).select(col("doc_id").cast("long"), col("text"))
      .as[(Long, String)]
      .map { case (id, text) =>
        (id, Shingles.simhash(Shingles.wordShingles(text, 3))) }
      .toDF("doc_id", "simhash")
      .cache()
    val banded = sims.select(col("doc_id"), col("simhash"),
      explode(expr(
        "array(" +
          "named_struct('band', 0, 'key', shiftright(simhash, 48) & 65535)," +
          "named_struct('band', 1, 'key', shiftright(simhash, 32) & 65535)," +
          "named_struct('band', 2, 'key', shiftright(simhash, 16) & 65535)," +
          "named_struct('band', 3, 'key', simhash & 65535))")).as("b"))
      .select(col("doc_id"), col("simhash"),
        concat(col("b.band"), lit(":"), col("b.key")).as("band_key"))
    val guarded = guardBuckets(banded, "band_key", maxBucket(s))
    val a = guarded.as("a"); val b = guarded.as("b")
    val cand = a.join(b, col("a.band_key") === col("b.band_key") &&
        col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("id_a"), col("a.simhash").as("sh_a"),
        col("b.doc_id").as("id_b"), col("b.simhash").as("sh_b"))
      .distinct()
      .withColumn("hamming",
        bit_count(col("sh_a").bitwiseXOR(col("sh_b"))))
      .filter(col("hamming") <= lit(8))
    val perDoc = cand.select(col("id_a").as("doc_id"), col("hamming"))
      .union(cand.select(col("id_b").as("doc_id"), col("hamming")))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_near"), min(col("hamming")).as("min_hamming"))
    sims.select(col("doc_id"), col("simhash"))
      .join(perDoc, Seq("doc_id"), "left")
      .na.fill(Map("n_near" -> 0L, "min_hamming" -> 64))
      .orderBy(col("doc_id"))
  }

  /** Character n-gram Jaccard near-dup: char-4-gram shingles (robust to
    * word-boundary noise, unlike word shingles), MinHash-banded candidate
    * generation, exact Jaccard verification via array_intersect/union.
    * Per-doc output (never empty). */
  def dedupNgram(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val sh = docs(s, dir).select(col("doc_id").cast("long"), col("text"))
      .as[(Long, String)]
      .map { case (id, text) => (id, Shingles.charShingles(text, 4)) }
      .toDF("doc_id", "shingles")
      .cache()
    val buckets = guardBuckets(sh.as[(Long, Array[Long])]
      .map { case (id, g) => (id, Shingles.minhashBandKeys(g, 16, 4)) }
      .toDF("doc_id", "band_keys")
      .select(col("doc_id"), explode(col("band_keys")).as("band_key")),
      "band_key", maxBucket(s))
    val a = buckets.as("a"); val b = buckets.as("b")
    val cand = a.join(b, col("a.band_key") === col("b.band_key") &&
        col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("id_a"), col("b.doc_id").as("id_b"))
      .distinct()
      .join(sh.select(col("doc_id").as("id_a"), col("shingles").as("g_a")), "id_a")
      .join(sh.select(col("doc_id").as("id_b"), col("shingles").as("g_b")), "id_b")
      .withColumn("jaccard", round(
        size(array_intersect(col("g_a"), col("g_b"))).cast("double") /
          greatest(size(array_union(col("g_a"), col("g_b"))), lit(1)), 4))
      .select(col("id_a"), col("id_b"), col("jaccard"))
    val perDoc = cand.select(col("id_a").as("doc_id"), col("jaccard"))
      .union(cand.select(col("id_b").as("doc_id"), col("jaccard")))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_candidates"),
        round(max(col("jaccard")), 4).as("best_ngram_jaccard"))
    sh.select(col("doc_id"), size(col("shingles")).as("n_ngrams"))
      .join(perDoc, Seq("doc_id"), "left")
      .na.fill(Map("n_candidates" -> 0L, "best_ngram_jaccard" -> 0.0))
      .orderBy(col("doc_id"))
  }

  /** Token-array exact dedup over the synthetic corpus: content-hash
    * grouping on the tokens column itself (the engine-side dedup shape —
    * the shuffle key is an 8-byte FNV of the array, never the array).
    * Oracled: the DuckDB twin groups the SAME materialized parquet by the
    * raw token list, so a hash collision or drift would surface. */
  def dedupTokens(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val n = EngineQueries.rowsForDir(dir)
    val ds = graft.io.CorpusTable.table(s, n)
      .select(col("doc_id"), col("tokens"))
      .as[(String, Array[Int])]
    val hashed = ds.map { case (id, toks) => (id, Shingles.hashTokens(toks)) }
      .toDF("doc_id", "content_hash")
    val groups = hashed.groupBy(col("content_hash"))
      .agg(count(lit(1)).as("n"), min(col("doc_id")).as("keeper"))
    groups.agg(
      sum(col("n")).cast("long").as("total_rows"),
      count(lit(1)).as("distinct_contents"),
      sum(when(col("n") > 1, col("n") - 1).otherwise(lit(0))).cast("long")
        .as("redundant_rows"))
  }

  val dedupTokensSql: String =
    """WITH g AS (
      |  SELECT tokens, count(*) AS n
      |  FROM read_parquet('/root/repo/data/oracle/corpus_n5000.parquet/*.parquet')
      |  GROUP BY tokens)
      |SELECT CAST(sum(n) AS BIGINT) AS total_rows,
      |  count(*) AS distinct_contents,
      |  CAST(sum(CASE WHEN n > 1 THEN n - 1 ELSE 0 END) AS BIGINT)
      |    AS redundant_rows
      |FROM g""".stripMargin
}

/** Deterministic shingle/sketch kernels (no Spark deps). */
object Shingles {
  /** Hashed character k-gram set (sorted unique). */
  def charShingles(text: String, k: Int): Array[Long] = {
    if (text.length < k) return Array(hash(text, 1))
    val set = new java.util.TreeSet[java.lang.Long]()
    var i = 0
    while (i + k <= text.length) {
      var h = 0xcbf29ce484222325L
      var j = 0
      while (j < k) { h = (h ^ text.charAt(i + j)) * 1099511628211L; j += 1 }
      set.add(h)
      i += 1
    }
    val out = new Array[Long](set.size())
    val it = set.iterator(); var j = 0
    while (it.hasNext) { out(j) = it.next(); j += 1 }
    out
  }

  def wordShingles(text: String, k: Int): Array[Long] = {
    val words = text.split(" ")
    if (words.length < k) return Array(hash(text, 0))
    val set = new java.util.TreeSet[java.lang.Long]()
    var i = 0
    while (i + k <= words.length) {
      var h = 0xcbf29ce484222325L
      var j = 0
      while (j < k) {
        val w = words(i + j)
        var c = 0
        while (c < w.length) { h = (h ^ w.charAt(c)) * 1099511628211L; c += 1 }
        h = (h ^ ' ') * 1099511628211L
        j += 1
      }
      set.add(h)
      i += 1
    }
    val out = new Array[Long](set.size())
    val it = set.iterator(); var j = 0
    while (it.hasNext) { out(j) = it.next(); j += 1 }
    out
  }

  def hash(s: String, seed: Long): Long = {
    var h = 0xcbf29ce484222325L ^ seed
    var i = 0
    while (i < s.length) { h = (h ^ s.charAt(i)) * 1099511628211L; i += 1 }
    h
  }

  private def mix(z0: Long): Long = {
    var z = z0
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z ^ (z >>> 31)
  }

  /** nHashes minhashes -> `bands` band keys (hash of each row group). */
  def minhashBandKeys(shingles: Array[Long], nHashes: Int, bands: Int)
      : Array[Long] = {
    val sig = new Array[Long](nHashes)
    java.util.Arrays.fill(sig, Long.MaxValue)
    var i = 0
    while (i < shingles.length) {
      var h = 0
      while (h < nHashes) {
        val v = mix(shingles(i) ^ (h.toLong * 0x9E3779B97F4A7C15L))
        if (v < sig(h)) sig(h) = v
        h += 1
      }
      i += 1
    }
    val rows = nHashes / bands
    val keys = new Array[Long](bands)
    var b = 0
    while (b < bands) {
      var h = 0xcbf29ce484222325L ^ b.toLong // band index salts the bucket key
      var r = 0
      while (r < rows) { h = (h ^ sig(b * rows + r)) * 1099511628211L; r += 1 }
      keys(b) = h
      b += 1
    }
    keys
  }

  def simhash(shingles: Array[Long]): Long = {
    val acc = new Array[Int](64)
    var i = 0
    while (i < shingles.length) {
      val h = mix(shingles(i))
      var b = 0
      while (b < 64) {
        if (((h >>> b) & 1L) == 1L) acc(b) += 1 else acc(b) -= 1
        b += 1
      }
      i += 1
    }
    var out = 0L
    var b = 0
    while (b < 64) { if (acc(b) > 0) out |= (1L << b); b += 1 }
    out
  }

  def hashTokens(tokens: Array[Int]): Long = {
    var h = 0xcbf29ce484222325L
    var i = 0
    while (i < tokens.length) { h = (h ^ tokens(i)) * 1099511628211L; i += 1 }
    h
  }
}
