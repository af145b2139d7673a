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

  test("real PNG decode recovers a known golden image exactly") {
    // hand-built 3x2 gray image — decode must return these pixels, not
    // byte math over the encoded stream
    val img = new java.awt.image.BufferedImage(
      3, 2, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
    val px = Seq(Seq(0, 128, 255), Seq(10, 20, 30))
    for (y <- 0 until 2; x <- 0 until 3)
      img.getRaster.setSample(x, y, 0, px(y)(x))
    val out = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", out)
    val sp = spark
    import sp.implicits._
    val media = Seq((7L, out.toByteArray)).toDF("doc_id", "png_bytes")
    val row = Multimodal.decodeImages(media).collect().head
    assert(row.getAs[Int]("width") === 3)
    assert(row.getAs[Int]("height") === 2)
    assert(row.getAs[Long]("n_pixels") === 6L)
    assert(row.getAs[Long]("pixel_sum") === px.flatten.sum.toLong)
    assert(row.getAs[Int]("pixel_min") === 0)
    assert(row.getAs[Int]("pixel_max") === 255)
    assert(row.getAs[Double]("pixel_mean") === px.flatten.sum.toDouble / 6)
  }

  test("image encode -> PNG -> decode round trip matches the pixel law") {
    val docs = Tables.documents(spark, sf0001).limit(50)
    val stats = Multimodal.decodeImages(Multimodal.imageMedia(docs)).collect()
    assert(stats.length === 50)
    stats.foreach { r =>
      val id = r.getAs[Long]("doc_id")
      val (w, h) = Multimodal.imageDims(id)
      val expected = for (y <- 0 until h; x <- 0 until w)
        yield Multimodal.pixelValue(id, x, y)
      assert(r.getAs[Int]("width") === w)
      assert(r.getAs[Int]("height") === h)
      assert(r.getAs[Long]("pixel_sum") === expected.map(_.toLong).sum,
        s"doc $id: PNG round trip altered pixels")
      assert(r.getAs[Int]("pixel_min") === expected.min)
      assert(r.getAs[Int]("pixel_max") === expected.max)
    }
  }

  test("real WAV decode recovers a known golden clip exactly") {
    // a javax.sound-ENCODED clip (AudioSystem.write), decoded by our
    // hand-rolled-header-independent decode path — the two ends of the
    // codec share no code in either direction
    val samples = Seq[Short](0, 1000, -1000, 32767, -32768, 42)
    val bb = java.nio.ByteBuffer.allocate(samples.length * 2)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    samples.foreach(bb.putShort)
    val fmt = new javax.sound.sampled.AudioFormat(8000f, 16, 1, true, false)
    val ais = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(bb.array()), fmt, samples.length)
    val out = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(ais,
      javax.sound.sampled.AudioFileFormat.Type.WAVE, out)
    val sp = spark
    import sp.implicits._
    val row = Multimodal.decodeAudio(
      Seq((3L, out.toByteArray)).toDF("doc_id", "wav_bytes")).collect().head
    assert(row.getAs[Int]("sample_rate") === 8000)
    assert(row.getAs[Int]("channels") === 1)
    assert(row.getAs[Long]("n_samples") === samples.length.toLong)
    assert(row.getAs[Long]("sample_sum") === samples.map(_.toLong).sum)
    assert(row.getAs[Int]("sample_min") === -32768)
    assert(row.getAs[Int]("sample_max") === 32767)
  }

  test("audio encode -> WAV -> decode round trip matches the sample law") {
    val docs = Tables.documents(spark, sf0001).limit(50)
    val stats = Multimodal.decodeAudio(Multimodal.audioMedia(docs)).collect()
    assert(stats.length === 50)
    stats.foreach { r =>
      val id = r.getAs[Long]("doc_id")
      val n = Multimodal.audioLen(id)
      val expected = (0 until n).map(Multimodal.sampleValue(id, _))
      assert(r.getAs[Int]("sample_rate") === 16000)
      assert(r.getAs[Long]("n_samples") === n.toLong)
      assert(r.getAs[Long]("sample_sum") === expected.map(_.toLong).sum,
        s"doc $id: WAV round trip altered samples")
      assert(r.getAs[Int]("sample_min") === expected.min)
      assert(r.getAs[Int]("sample_max") === expected.max)
    }
  }

  test("crossModalSearch ranks embeddings by cosine to the projected media features") {
    val docs = Tables.documents(spark, sf0001)
    val embs = Tables.embeddings(spark, sf0001)
    val got = Multimodal.crossModalSearch(docs, embs, nQueries = 2, k = 5)
      .collect()
    assert(got.length === 10)
    // recompute the whole chain in plain Scala for query 0
    val text = docs.filter(col("doc_id") === 0)
      .select("text").collect().head.getString(0)
    val vals = text.getBytes("UTF-8").map(_ & 0xff)
    val f = Array(vals.map(_.toLong).sum.toDouble / vals.length,
      (vals.max - vals.min).toDouble, (vals.length % 256).toDouble)
    def w(i: Int, j: Int): Double = (((i * 31 + j * 17) % 13) - 6) / 6.0
    val q = (0 until 64).map(j => f(0) * w(0, j) + f(1) * w(1, j) + f(2) * w(2, j))
    val qn = math.sqrt(q.map(x => x * x).sum)
    val sims = embs.collect().map { r =>
      val e = r.getSeq[Float](r.fieldIndex("embedding")).map(_.toDouble)
      val d = e.zip(q).map { case (a, b) => a * b }.sum
      r.getAs[Long]("vec_id") -> d / (math.sqrt(e.map(x => x * x).sum) * qn)
    }
    val expected = sims.sortBy { case (id, s) => (-s, id) }.take(5)
    val gotQ0 = got.filter(_.getAs[Long]("query_id") == 0L)
      .sortBy(_.getAs[Long]("rank"))
    assert(gotQ0.map(_.getAs[Long]("neighbor_id")).toSeq ===
      expected.map(_._1).toSeq)
    gotQ0.zip(expected).foreach { case (r, (_, s)) =>
      assert(math.abs(r.getAs[Double]("sim") - s) < 1e-6)
    }
  }

  test("crossModalIvfPq: index serve recalls the brute tier's neighbors") {
    val brute = Multimodal.crossModalSearch(Tables.documents(spark, sf0001),
        Tables.embeddings(spark, sf0001), nQueries = 5, k = 10)
      .collect()
      .groupBy(_.getAs[Long]("query_id"))
      .map { case (q, rs) => q -> rs.map(_.getAs[Long]("neighbor_id")).toSet }
    val served = Multimodal.crossModalIvfPq(spark, sf0001,
        nQueries = 5, k = 10).collect()
      .groupBy(_.getAs[Long]("query_id"))
      .map { case (q, rs) => q -> rs.map(_.getAs[Long]("neighbor_id")).toSet }
    assert(served.keySet === brute.keySet)
    // the ADC shortlist is L2-based while the contract is cosine, so
    // perfect agreement is not expected — but the index serve must
    // recover the bulk of the brute tier's top-k
    val recalls = brute.map { case (q, truth) =>
      served(q).intersect(truth).size.toDouble / truth.size }
    val mean = recalls.sum / recalls.size
    assert(mean >= 0.6, f"mean recall $mean%.2f below the 0.6 floor")
    // and every emitted similarity must be an exact cosine (spot check:
    // served sims are drawn from the same rounded-cosine domain)
    Multimodal.crossModalIvfPq(spark, sf0001, nQueries = 2, k = 3)
      .collect().foreach { r =>
        assert(math.abs(r.getAs[Double]("sim")) <= 1.0 + 1e-9) }
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
