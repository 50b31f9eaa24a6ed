package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.{array_contains, col, lit}
import graft.engine.{EncoderConfig, Lineage}
import graft.io.Corpus

/** Deployment smoke for the plain `sbt package` jar under spark-submit:
  * proves the DSv2 registration (META-INF/services/DataSourceRegister),
  * the session extensions, and the full encode -> format("graft") read
  * path all work from the jar alone — the cluster story, end to end.
  *
  *   sbt package
  *   spark-submit --master local[4] \
  *     --conf spark.sql.extensions=graft.sql.GraftExtensions \
  *     --class graft.SubmitSmoke target/scala-2.13/<jar>
  *
  * Prints SUBMIT_SMOKE_OK on success; any failure exits nonzero. */
object SubmitSmoke {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = java.nio.file.Files.createTempDirectory("graft-submit").toString
    Lineage.encodeToDir(Corpus.table(spark, 500, partitions = 4), dir,
      EncoderConfig(chunkTokens = 1 << 12, numPartitions = 4))
    val g = spark.read.format("graft").load(dir) // DataSourceRegister lookup
    require(g.count() == 500L, "count through the pushed aggregate")
    val rolled = g.groupBy("source").count().count()
    require(rolled >= 1L, "column-pruned rollup")
    // the extensions' rule path (array_contains -> containment probe):
    // the PLAN must show the folded probe (proof the rule fired from the
    // jar) and the count must equal the driver-side recomputation
    val probedDf = g.filter(array_contains(col("tokens"), lit(0)))
    require(probedDf.queryExecution.executedPlan.toString
        .contains("containsToken=0"),
      "PushTokenContains rule did not fold the filter into the scan")
    val expected = (0L until 500L)
      .count(i => Corpus.row(42L, i).tokens.contains(0)).toLong
    require(probedDf.count() == expected,
      s"containment count mismatch (expected $expected)")
    // SQL function surface from the extensions
    val dec = spark.sql("SELECT decode_tokens(encode_tokens(array(1,2,3)))")
      .collect()(0).getSeq[Int](0)
    require(dec == Seq(1, 2, 3), "extensions functions resolve from the jar")
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
    println("SUBMIT_SMOKE_OK")
    spark.stop()
  }
}
