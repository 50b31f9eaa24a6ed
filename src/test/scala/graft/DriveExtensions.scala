package graft

import org.apache.spark.sql.SparkSession

/** Fresh-JVM integration of the spark.sql.extensions deployment path (each
  * sbt runMain forks its own JVM, so this session is built WITH the
  * extensions conf — impossible inside the shared-test-session suites).
  * Run: sbt "Test/runMain graft.DriveExtensions" — prints EXT OK lines. */
object DriveExtensions {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[2]")
      .appName("graft-extensions")
      .config("spark.sql.extensions", "graft.sql.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .config("spark.driver.host", "localhost")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // SQL-visible functions with zero driver-side registration
    val row = spark.sql(
      """SELECT decode_tokens(encode_tokens(array(1, 2, 3))) AS back,
        |       cosine_sim(array(1.0d, 0.0d), array(1.0d, 0.0d)) AS c
        |""".stripMargin).collect()(0)
    require(row.getSeq[Int](0) == Seq(1, 2, 3), row.toString)
    require(row.getDouble(1) == 1.0, row.toString)
    println("EXT OK sql functions resolve and evaluate")
    // optimizer rule injected: decode(encode(x)) folds away (non-literal
    // source, or the whole query constant-folds into a LocalRelation and
    // the check is vacuous)
    val plan = spark.range(5)
      .selectExpr("array(cast(id AS int)) AS tokens")
      .selectExpr("decode_tokens(encode_tokens(tokens)) AS back")
      .queryExecution.optimizedPlan.toString
    require(!plan.toLowerCase.contains("encode_tokens("),
      s"fold rule not applied:\n$plan")
    println("EXT OK fold rule active in optimizer")
    spark.stop()
  }
}
