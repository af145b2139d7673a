package graft

import org.apache.spark.sql.functions._
import graft.operators.Multimodal

/** The multimodal plumbing contract: binary payload + typed metadata in,
  * deterministic features and frame slices out — the parts a real codec
  * would plug into unchanged.
  */
class MultimodalSpec extends SparkSpec {

  lazy val media = Multimodal.mediaFromDocuments(Tables.documents(spark, sf0001))

  test("media table: binary payload, typed metadata struct, 3 modalities") {
    val schema = media.schema
    assert(schema("media_bytes").dataType.typeName === "binary")
    assert(schema("meta").dataType.typeName === "struct")
    val types = media.select("media_type").distinct()
      .collect().map(_.getString(0)).toSet
    assert(types === Set("image", "audio", "video"))
  }

  test("feature extraction is deterministic and byte-faithful") {
    val feats = Multimodal.extractFeatures(media)
    val row = feats.filter(col("doc_id") === 0).collect().head
    val text = Tables.documents(spark, sf0001)
      .filter(col("doc_id") === 0).select("text").collect().head.getString(0)
    val bytes = text.getBytes("UTF-8").map(_ & 0xff)
    assert(row.getAs[Long]("n_bytes") === bytes.length.toLong)
    assert(row.getAs[Double]("f_mean") ===
      bytes.map(_.toLong).sum.toDouble / bytes.length)
    assert(row.getAs[Int]("f_range") === bytes.max - bytes.min)
    // run twice → identical (partition-order independence)
    assert(feats.collect().toSeq === Multimodal.extractFeatures(media).collect().toSeq)
  }

  test("frame sampling yields n fixed-width slices inside the payload") {
    val frames = Multimodal.frameSample(media, nFrames = 4, frameBytes = 16)
    val r = frames.limit(5).collect()
    assert(r.nonEmpty)
    r.foreach { row =>
      val fs = row.getSeq[Array[Byte]](1)
      assert(fs.length === 4)
      assert(fs.forall(_.length <= 16))
      assert(fs.head.length === 16) // payloads are all > 16 bytes
    }
  }
}
