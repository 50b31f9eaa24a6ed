package graft.queries

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkTestSession
import graft.engine.SeqRow

/** Sequence-packing invariants. The driver-facing aggregate is oracled
  * against an independent Python replica (tools/gen_pack_fixtures.py);
  * these cover the operator's structural guarantees. */
class PackSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  private lazy val bins = PackQueries.packedBins(spark, sf).collect()
  private lazy val corpus: Map[String, SeqRow] = {
    import spark.implicits._
    graft.io.CorpusTable.table(spark,
        math.min(EngineQueries.rowsForDir(sf), 5000L))
      .select("doc_id", "tokens", "n_tok", "source").as[SeqRow]
      .collect().map(r => r.doc_id -> r).toMap
  }

  test("every doc appears in exactly one bin; token concat is preserved") {
    val packedDocs = bins.flatMap(_.doc_ids)
    assert(packedDocs.length == packedDocs.distinct.length)
    assert(packedDocs.toSet == corpus.keySet)
    bins.foreach { b =>
      val expect = b.doc_ids.toArray.flatMap(id => corpus(id).tokens)
      assert(b.tokens.sameElements(expect), s"grp=${b.grp} bin=${b.bin}")
      assert(b.n_tok == expect.length && b.pad == PackQueries.BinLen - b.n_tok)
    }
  }

  test("bins never overflow and packing is maximally greedy") {
    bins.groupBy(_.grp).foreach { case (g, bs0) =>
      val bs = bs0.sortBy(_.bin)
      assert(bs.map(_.bin).sameElements(bs.indices), s"grp=$g bin ids")
      bs.foreach(b => assert(b.n_tok <= PackQueries.BinLen && b.n_tok > 0))
      // greedy: a closed bin could not also have held the doc that OPENS
      // the next bin
      bs.sliding(2).foreach {
        case Array(a, b) =>
          val nextFirst = corpus(b.doc_ids.head).n_tok
          assert(a.n_tok + nextFirst > PackQueries.BinLen,
            s"grp=$g bin=${a.bin} left ${a.pad} pad but next doc is $nextFirst")
        case _ => ()
      }
    }
  }

  test("packing is deterministic across parallelism levels") {
    val a = PackQueries.seqPack(spark, sf).collect().map(_.toSeq).toSeq
    val before = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "3")
    try {
      val b = PackQueries.seqPack(spark, sf).collect().map(_.toSeq).toSeq
      assert(a == b)
    } finally spark.conf.set("spark.sql.shuffle.partitions", before)
  }
}
