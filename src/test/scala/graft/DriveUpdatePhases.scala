package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart}
import graft.queries.EngineQueries

object DriveUpdatePhases {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.driver.host", "localhost")
      .config("spark.sql.extensions", "graft.sql.GraftExtensions")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = "/root/testdata/sf0.1"
    val starts = new java.util.concurrent.ConcurrentHashMap[Int, (Long, String)]()
    @volatile var jobs = List.empty[(Int, Double, String)]
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit =
        starts.put(j.jobId, (System.nanoTime(),
          Option(j.properties.getProperty("spark.job.description")).getOrElse("")))
      override def onJobEnd(j: SparkListenerJobEnd): Unit = {
        val s = starts.get(j.jobId)
        if (s != null) jobs = (j.jobId, (System.nanoTime()-s._1)/1e9, s._2) :: jobs
      }
    })
    def t[A](name: String)(f: => A): A = {
      jobs = Nil
      val t0 = System.nanoTime(); val a = f
      val wall = (System.nanoTime()-t0)/1e9
      Thread.sleep(100)
      val js = jobs.sortBy(_._1)
      println(f"PHASE $name $wall%.3f jobs=${js.size} jobtime=${js.map(_._2).sum}%.3f")
      js.foreach { case (id, d, desc) => println(f"  job $id $d%.3f $desc") }
      a
    }
    EngineQueries.graftUpdate(spark, dir).count() // warm + scratch
    val n = 5000L
    val base = s"${sys.props("java.io.tmpdir")}/graft_upd_q_n${n}_v${EngineQueries.codeFingerprint}"
    spark.conf.set("spark.sql.catalog.graftupd", classOf[graft.spark.GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.graftupd.root", s"$base/cat")
    (1 to 2).foreach { rep =>
      t("update") {
        spark.sql("""UPDATE graftupd.q.corpus SET source = 'curated'
          |WHERE doc_id IN ('doc-000000000007', 'doc-000000000123')""".stripMargin)
      }
      t("merge") {
        spark.sql("""MERGE INTO graftupd.q.corpus t
          |USING (SELECT 'zzz-merged-00001' AS doc_id, array(1, 2, 3) AS tokens,
          |         3 AS n_tok, 'merged' AS source) s
          |ON t.doc_id = s.doc_id
          |WHEN MATCHED THEN UPDATE SET *
          |WHEN NOT MATCHED THEN INSERT *""".stripMargin)
      }
      println(s"--- rep $rep done")
    }
    spark.stop()
  }
}
