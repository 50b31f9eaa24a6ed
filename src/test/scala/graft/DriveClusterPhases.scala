package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

object DriveClusterPhases {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.driver.host", "localhost")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    val dir = "/root/testdata/sf0.1"
    def t[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime(); val a = f
      println(f"PHASE $name ${(System.nanoTime()-t0)/1e9}%.3f"); a
    }
    // mirror the stages of dedupClusters by hand
    (1 to 2).foreach { rep =>
      val docs = spark.read.parquet(s"$dir/documents.parquet")
      val sh = t("shingle") {
        val x = docs.select(col("doc_id").cast("long"), col("text"))
          .as[(Long, String)]
          .map { case (id, text) => (id, graft.queries.Shingles.wordShingles(text, 3)) }
          .toDF("doc_id", "shingles").cache()
        x.count(); x
      }
      val sigs = t("sigs") {
        val x = sh.as[(Long, Array[Long])]
          .map { case (id, s) => (id, graft.queries.Shingles.minhashBandKeys(s, 32, 8)) }
          .toDF("doc_id", "band_keys")
        x.write.format("noop").mode("overwrite").save(); x
      }
      val banded = sigs.select(col("doc_id"), explode(col("band_keys")).as("band_key"))
      val sizes = banded.groupBy(col("band_key")).agg(count(lit(1)).as("n"))
      val small = sizes.filter(col("n") <= 128).select(col("band_key"))
      val guarded = t("guard") {
        val x = banded.join(small, Seq("band_key"), "left_semi")
        x.write.format("noop").mode("overwrite").save(); x
      }
      val cand = t("selfjoin") {
        val a = guarded.as("a"); val b = guarded.as("b")
        val x = a.join(b, col("a.band_key") === col("b.band_key") &&
            col("a.doc_id") < col("b.doc_id"))
          .select(col("a.doc_id").as("id_a"), col("b.doc_id").as("id_b"))
          .distinct()
        x.write.format("noop").mode("overwrite").save(); x
      }
      val pairs = t("jaccard") {
        val x = cand
          .join(sh.select(col("doc_id").as("id_a"), col("shingles").as("sh_a")), "id_a")
          .join(sh.select(col("doc_id").as("id_b"), col("shingles").as("sh_b")), "id_b")
          .withColumn("jaccard", round(
            size(array_intersect(col("sh_a"), col("sh_b"))).cast("double") /
              greatest(size(array_union(col("sh_a"), col("sh_b"))), lit(1)), 4))
          .filter(col("jaccard") >= 0.8)
          .select(col("id_a"), col("id_b")).cache()
        println("  pairs=" + x.count()); x
      }
      t("collect+uf") { pairs.as[(Long, Long)].collect().length }
      t("full_query") { graft.queries.DedupQueries.dedupClusters(spark, dir).count() }
      sh.unpersist(); pairs.unpersist()
      println(s"--- rep $rep")
    }
    spark.stop()
  }
}
