package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: opaque binary payloads + typed metadata,
  * batch feature extraction over partitions.
  *
  * The decode step is STUBBED (this container has no image/audio libs): the
  * "decoder" is a deterministic fake that derives features from the payload
  * bytes (length, crc32, byte-entropy, fake width/height from a seeded
  * hash). Everything Spark-side is real and tested: the binary column
  * schema, the partition-batched extraction (mapPartitions so a real
  * decoder would amortize model/codec init per batch, the same shape a
  * Pandas-UDF/mapInPandas pipeline has), and the downstream aggregation. */
object MultimodalQueries {

  final case class MediaRow(media_id: Long, modality: String,
                            payload: Array[Byte], source: String)
  final case class MediaFeatures(media_id: Long, modality: String,
                                 n_bytes: Long, crc32: Long,
                                 byte_entropy: Double,
                                 fake_width: Int, fake_height: Int)

  /** Build a media table from documents (text bytes standing in for image
    * bytes), run batched feature extraction, aggregate per modality. */
  def multimodalFeatures(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val media = s.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id").cast("long"), col("text"), col("source"))
      .as[(Long, String, String)]
      .map { case (id, text, src) =>
        val modality = id % 3 match {
          case 0 => "image"; case 1 => "audio"; case _ => "video"
        }
        MediaRow(id, modality, text.getBytes("UTF-8"), src)
      }
    // partition-batched extraction: one "decoder" per partition, not per row
    val feats = media.mapPartitions { it =>
      val decoder = new StubDecoder // expensive init amortized per batch
      it.map(m => decoder.extract(m))
    }
    feats.toDF()
      .groupBy(col("modality"))
      .agg(count(lit(1)).as("n"),
        sum(col("n_bytes")).as("total_bytes"),
        round(avg(col("byte_entropy")), 4).as("avg_entropy"),
        max(col("fake_width")).as("max_width"))
      .orderBy(col("modality"))
  }

  /** Oracle twin: an independent Python replica of the stub extractor and
    * the rollup (tools/gen_ivf_multimodal_fixtures.py) pins the expected
    * output at sf0.01. */
  val multimodalFeaturesSql: String =
    """SELECT modality, n, total_bytes, avg_entropy, max_width
      |FROM read_parquet('/root/repo/golden/multimodal_sf0.01.parquet')
      |ORDER BY modality""".stripMargin

  /** STUB decoder — deterministic fake in place of a real image/audio codec
    * (none available in this container). A real deployment swaps `extract`
    * for the actual decode + feature model; the Spark plumbing is unchanged. */
  final class StubDecoder {
    def extract(m: MediaRow): MediaFeatures = {
      val crc = new java.util.zip.CRC32
      crc.update(m.payload)
      val hist = new Array[Int](256)
      var i = 0
      while (i < m.payload.length) { hist(m.payload(i) & 0xff) += 1; i += 1 }
      var h = 0.0
      val n = math.max(1, m.payload.length)
      var b = 0
      while (b < 256) {
        if (hist(b) > 0) {
          val p = hist(b).toDouble / n
          h -= p * math.log(p) / math.log(2.0)
        }
        b += 1
      }
      val seed = crc.getValue
      MediaFeatures(m.media_id, m.modality, m.payload.length.toLong,
        seed, h, 64 + (seed % 512).toInt, 64 + ((seed >> 16) % 512).toInt)
    }
  }
}
