package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing (driver north-star "multimodal columns"):
  * image/audio/video payloads ride as opaque BINARY columns next to a
  * typed metadata struct; decode / feature-extraction / frame-sampling run
  * as partition-wise batch passes over a typed Dataset.
  *
  * The Spark side is real — binary schema, typed Encoders, mapPartitions
  * batch shape (one decoder instance per partition, the pattern that
  * amortizes model/codec init at scale), deterministic output. The IMAGE
  * path decodes for real: [[imageMedia]] encodes deterministic grayscale
  * PNGs with the JDK's `javax.imageio` and [[decodeImages]] decodes them
  * back to exact pixel statistics — a true encode → PNG → decode round
  * trip (PNG is lossless, so the stats are oracle-computable in closed
  * form from doc_id alone). The AUDIO path likewise decodes for real:
  * [[audioMedia]] hand-writes RIFF/WAVE PCM containers and
  * [[decodeAudio]] parses them back with `javax.sound.sampled`. Only
  * VIDEO keeps [[decodeStub]] (the JDK ships no video codec): fixed
  * integer arithmetic over the raw bytes. Swapping in ffmpeg changes
  * only that one function — the schema, partitioning and batch shape
  * stay as tested.
  *
  * At 100 TB: binary payloads dominate row size, so the media scan prunes
  * to (id, media_bytes) only when features are requested (columnar
  * projection does this for free), and feature extraction is
  * embarrassingly parallel with zero shuffle.
  */
object Multimodal {

  /** A media row: opaque payload + typed metadata. */
  case class MediaRecord(doc_id: Long, media_type: String,
                         media_bytes: Array[Byte],
                         meta_width: Int, meta_height: Int,
                         meta_sample_rate: Int)

  /** Deterministic per-document features from the "decoded" payload. */
  case class MediaFeatures(doc_id: Long, media_type: String, n_bytes: Long,
                           f_mean: Double, f_range: Int, f_mod: Int)

  /** Synthesizes the media table from `documents`: the UTF-8 text bytes
    * stand in for the encoded payload; metadata derives deterministically
    * from doc_id so the oracle can reproduce it.
    */
  def mediaFromDocuments(documents: DataFrame): DataFrame =
    documents.select(
      col("doc_id"),
      element_at(typedlit(Seq("image", "audio", "video")),
        (col("doc_id") % 3 + 1).cast("int")).as("media_type"),
      encode(col("text"), "UTF-8").as("media_bytes"),
      struct(
        (col("doc_id") % 1920 + 1).cast("int").as("width"),
        (col("doc_id") % 1080 + 1).cast("int").as("height"),
        lit(16000).as("sample_rate")).as("meta"))

  /** STUB decoder ??? — stands in for libjpeg/libsndfile/ffmpeg, which are
    * not in this container. Features are fixed integer arithmetic over the
    * raw bytes (exact sum → IEEE division), so results are deterministic
    * and partition-order independent.
    */
  def decodeStub(r: MediaRecord): MediaFeatures = {
    val bytes = r.media_bytes
    val n = bytes.length
    val vals = bytes.map(b => b & 0xff)
    val mean = if (n > 0) vals.map(_.toLong).sum.toDouble / n else 0.0
    val range = if (n > 0) vals.max - vals.min else 0
    // mean is an exact-integer sum divided once (IEEE-deterministic),
    // so it needs no rounding to be oracle-reproducible
    MediaFeatures(r.doc_id, r.media_type, n.toLong, mean, range, n % 256)
  }

  /** Feature extraction as a partition-wise batch pass: one decoder
    * "instance" per partition (the init cost a real codec amortizes),
    * then a per-record map. No shuffle.
    */
  def extractFeatures(media: DataFrame): DataFrame = {
    val ds: Dataset[MediaRecord] = media.select(
        col("doc_id"), col("media_type"), col("media_bytes"),
        col("meta.width").as("meta_width"),
        col("meta.height").as("meta_height"),
        col("meta.sample_rate").as("meta_sample_rate"))
      .as(Encoders.product[MediaRecord])
    ds.mapPartitions { it =>
      // real codecs initialize here, once per partition
      it.map(decodeStub)
    }(Encoders.product[MediaFeatures])
      .toDF()
      .orderBy("doc_id")
  }

  /** Decoded-image statistics: exact integers (and one IEEE division for
    * the mean), so the row is engine-reproducible.
    */
  case class ImageStats(doc_id: Long, width: Int, height: Int,
                        n_pixels: Long, pixel_sum: Long,
                        pixel_min: Int, pixel_max: Int, pixel_mean: Double)

  /** The deterministic pixel law shared by the encoder, the decoder test
    * and the SQL oracle: an image's gray value at (x, y) is a fixed
    * integer function of doc_id. Dimensions likewise — small and coprime
    * moduli so widths × heights vary across docs.
    */
  def imageDims(docId: Long): (Int, Int) =
    ((docId % 13 + 4).toInt, (docId % 11 + 4).toInt)

  def pixelValue(docId: Long, x: Int, y: Int): Int =
    ((docId * 31 + x * 7 + y * 13) % 256).toInt

  /** REAL image payloads: a deterministic grayscale PNG per document,
    * encoded with the JDK's ImageIO in the same mapPartitions seat a
    * production encoder occupies. The PNG byte stream itself is never
    * oracled (encoder byte layout is a JDK implementation detail); the
    * DECODED pixels are, because PNG is lossless.
    */
  def imageMedia(documents: DataFrame): DataFrame = {
    // single-file source → spread the encode work across cores
    val ds = documents.repartition(col("doc_id"))
      .select(col("doc_id")).as(Encoders.scalaLong)
    ds.mapPartitions { it =>
      it.map { docId =>
        val (w, h) = imageDims(docId)
        val img = new java.awt.image.BufferedImage(
          w, h, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
        val raster = img.getRaster
        for (y <- 0 until h; x <- 0 until w)
          raster.setSample(x, y, 0, pixelValue(docId, x, y))
        val out = new java.io.ByteArrayOutputStream()
        javax.imageio.ImageIO.write(img, "png", out)
        (docId, out.toByteArray)
      }
    }(Encoders.tuple(Encoders.scalaLong, Encoders.BINARY))
      .toDF("doc_id", "png_bytes")
  }

  /** REAL image decode: `javax.imageio.ImageIO.read` over the PNG
    * payloads, one reader context per partition, emitting exact
    * width/height/pixel statistics. Zero shuffle — the 100 TB shape is a
    * columnar scan of (doc_id, png_bytes) with the decode embarrassingly
    * parallel; the final orderBy is the oracle-determinism contract.
    */
  def decodeImages(images: DataFrame): DataFrame = {
    val ds = images.select(col("doc_id"), col("png_bytes"))
      .as(Encoders.tuple(Encoders.scalaLong, Encoders.BINARY))
    ds.mapPartitions { it =>
      it.map { case (docId, bytes) =>
        val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
        require(img != null, s"doc $docId: payload is not a decodable image")
        val (w, h) = (img.getWidth, img.getHeight)
        val raster = img.getRaster
        var sum = 0L; var min = 255; var max = 0
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            val v = raster.getSample(x, y, 0)
            sum += v; if (v < min) min = v; if (v > max) max = v
            x += 1
          }
          y += 1
        }
        val n = w.toLong * h
        ImageStats(docId, w, h, n, sum, min, max, sum.toDouble / n)
      }
    }(Encoders.product[ImageStats])
      .toDF()
      .orderBy("doc_id")
  }

  /** Decoded-audio statistics: exact integers over the PCM samples. */
  case class AudioStats(doc_id: Long, sample_rate: Int, channels: Int,
                        n_samples: Long, sample_sum: Long,
                        sample_min: Int, sample_max: Int)

  /** The deterministic sample law shared by the WAV encoder, the decoder
    * test and the SQL oracle: 16-bit signed PCM, mono, 16 kHz.
    */
  def audioLen(docId: Long): Int = (docId % 100 + 50).toInt

  def sampleValue(docId: Long, i: Int): Int =
    ((docId * 37 + i * 11) % 65536).toInt - 32768

  /** REAL audio payloads: a deterministic PCM WAV per document. The RIFF
    * container is written BY HAND (44-byte canonical header +
    * little-endian samples) so [[decodeAudio]]'s `javax.sound` path must
    * genuinely parse the container — encoder and decoder share no code.
    */
  def audioMedia(documents: DataFrame): DataFrame = {
    val ds = documents.repartition(col("doc_id"))
      .select(col("doc_id")).as(Encoders.scalaLong)
    ds.mapPartitions { it =>
      it.map { docId =>
        val n = audioLen(docId)
        val dataLen = n * 2
        val bb = java.nio.ByteBuffer.allocate(44 + dataLen)
          .order(java.nio.ByteOrder.LITTLE_ENDIAN)
        bb.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataLen)
          .put("WAVE".getBytes("US-ASCII"))
          .put("fmt ".getBytes("US-ASCII")).putInt(16)
          .putShort(1)               // PCM
          .putShort(1)               // mono
          .putInt(16000)             // sample rate
          .putInt(16000 * 2)         // byte rate
          .putShort(2)               // block align
          .putShort(16)              // bits per sample
          .put("data".getBytes("US-ASCII")).putInt(dataLen)
        (0 until n).foreach(i => bb.putShort(sampleValue(docId, i).toShort))
        (docId, bb.array())
      }
    }(Encoders.tuple(Encoders.scalaLong, Encoders.BINARY))
      .toDF("doc_id", "wav_bytes")
  }

  /** REAL audio decode: `javax.sound.sampled.AudioSystem` parses the
    * RIFF/WAVE container (format, rate, channels) and streams the PCM
    * frames; exact integer sample statistics come out. Same
    * zero-shuffle mapPartitions shape as [[decodeImages]].
    */
  def decodeAudio(audio: DataFrame): DataFrame = {
    val ds = audio.select(col("doc_id"), col("wav_bytes"))
      .as(Encoders.tuple(Encoders.scalaLong, Encoders.BINARY))
    ds.mapPartitions { it =>
      it.map { case (docId, bytes) =>
        val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
          new java.io.ByteArrayInputStream(bytes))
        val fmt = ais.getFormat
        require(fmt.getSampleSizeInBits == 16 && !fmt.isBigEndian,
          s"doc $docId: unexpected PCM layout $fmt")
        val data = ais.readAllBytes()
        ais.close()
        var sum = 0L; var min = Int.MaxValue; var max = Int.MinValue
        var i = 0
        while (i + 1 < data.length) {
          val v = ((data(i) & 0xff) | (data(i + 1) << 8)).toShort.toInt
          sum += v; if (v < min) min = v; if (v > max) max = v
          i += 2
        }
        AudioStats(docId, fmt.getSampleRate.toInt, fmt.getChannels,
          data.length / 2L, sum, min, max)
      }
    }(Encoders.product[AudioStats])
      .toDF()
      .orderBy("doc_id")
  }

  /** RESIZE plumbing for image payloads: nearest-neighbor stride
    * sampling down to `target` units (a real implementation resamples
    * pixels; the plumbing — metadata-driven target, payload→payload
    * transform, size census, content digest — is what downstream
    * consumers depend on, and the stub keeps it deterministic over the
    * text stand-in payload). `target` must be a power of two: the stride
    * position i·n/target is then EXACT in double arithmetic, so the
    * sampled positions are engine-identical (an arbitrary target would
    * make floor(i·n/target) rounding-sensitive cross-engine).
    * Payloads already at or under target pass through untouched.
    */
  def resizeSample(media: DataFrame, target: Int): DataFrame = {
    require(target > 0 && (target & (target - 1)) == 0,
      s"target=$target must be a power of two (exact stride arithmetic)")
    val s = decode(col("media_bytes"), "UTF-8")
    val n = length(s)
    val resized = when(n <= target, s).otherwise(
      concat_ws("", transform(sequence(lit(0), lit(target - 1)), i =>
        s.substr((i.cast("long") * n.cast("long") / lit(target.toLong))
          .cast("int") + 1, lit(1)))))
    media.filter(col("media_type") === "image")
      .select(col("doc_id"), resized.as("r"))
      .groupBy(lit("image").as("media_type"))
      .agg(count(lit(1)).as("n_docs"),
           sum(length(col("r")).cast("long")).as("sum_resized_len"),
           min(md5(col("r"))).as("min_digest"))
  }

  /** Frame sampling for video payloads: n evenly-spaced fixed-width byte
    * slices (a real implementation seeks keyframes; the slice plumbing —
    * offsets, bounds, array<binary> output — is what downstream consumers
    * depend on). Pure expression work via slice-per-index.
    */
  def frameSample(media: DataFrame, nFrames: Int, frameBytes: Int): DataFrame = {
    val n = length(col("media_bytes"))
    media.filter(col("media_type") === "video")
      .select(col("doc_id"),
        transform(sequence(lit(0), lit(nFrames - 1)), i => {
          val offset = (i * greatest(n - frameBytes, lit(0))
            .cast("int") / lit(math.max(nFrames - 1, 1))).cast("int") + 1
          col("media_bytes").substr(offset, lit(frameBytes))
        }).as("frames"))
  }

  /** Oracle-facing census of [[frameSample]]: per video doc, frame count,
    * total sampled bytes, and a content digest of the concatenated
    * frames — byte-exact evidence the offsets/bounds/slices are the ones
    * the spec claims (the text stand-in payloads are ASCII, so the SQL
    * oracle reproduces the slices with substring arithmetic).
    */
  def frameCensus(media: DataFrame, nFrames: Int, frameBytes: Int): DataFrame = {
    val all = concat((0 until nFrames).map(i =>
      element_at(col("frames"), i + 1)): _*)
    frameSample(media, nFrames, frameBytes)
      .select(col("doc_id"),
        size(col("frames")).cast("long").as("n_frames"),
        length(all).cast("long").as("n_frame_bytes"),
        md5(all).as("digest"))
      .orderBy("doc_id")
  }

  /** The deterministic ALIGNMENT HEAD standing in for a trained
    * cross-modal projection (CLIP's image tower + linear head): maps the
    * media feature triple into the text-embedding space. Closed-form
    * weights so the SQL oracle reproduces the projection bit-exactly; a
    * trained head is a drop-in — same (features → dim-D vector) shape,
    * broadcast the real weight matrix instead of inlining constants.
    */
  private def alignmentWeight(i: Int, j: Int): Double =
    (((i * 31 + j * 17) % 13) - 6) / 6.0

  /** CROSS-MODAL retrieval (q_crossmodal_search) — media-to-text search,
    * the composition a multimodal corpus actually serves ("find the
    * documents nearest this image"): decoded media features
    * ([[extractFeatures]] — the stub seat a real image/audio encoder
    * occupies) pass through the [[alignmentWeight]] head into the
    * embedding space and rank against the embeddings table by cosine
    * under the suite's ONE ranked-top-k contract
    * ([[Similarity.rankedTopK]] — same tie-break and rounding as every
    * other search, so swapping a real encoder/head changes scores, never
    * rank semantics).
    *
    * Scale shape: the media scan prunes to (id, bytes), features are a
    * zero-shuffle partition-wise pass, the projected queries broadcast
    * (query-count-sized), and the corpus side is one scan + bounded
    * partial top-k per query — the [[Similarity.bruteForceTopK]] plan
    * with the query side fed by another modality; a corpus that
    * outgrows brute force graduates the same projected vectors onto the
    * IVF-PQ serving stack unchanged.
    */
  def crossModalSearch(documents: DataFrame, embeddings: DataFrame,
                       nQueries: Int = 5, k: Int = 10,
                       dim: Int = 64): DataFrame = {
    import graft.functions.VectorMath.{asDouble, dot, l2Norm}
    val queries = crossModalQueries(documents, nQueries, dim)
      .select(col("query_id"), col("embedding").as("q_emb"))
      .withColumn("q_nrm", l2Norm(col("q_emb")))
    val base = embeddings.repartition(col("vec_id"))
      .select(col("vec_id"), asDouble(col("embedding")).as("emb"))
      .withColumn("nrm", l2Norm(col("emb")))
    val scored = base.crossJoin(broadcast(queries))
      .select(col("query_id"), col("vec_id").as("cand_id"),
        (dot(col("emb"), col("q_emb")) / (col("nrm") * col("q_nrm")))
          .as("s"))
    Similarity.rankedTopK(scored, k, "sim")
  }

  /** The projected cross-modal query vectors as an embeddings-shaped
    * (query_id, embedding) frame — the seam [[crossModalSearch]] and
    * [[crossModalIvfPq]] share, so brute force and the index serve rank
    * EXACTLY the same queries. */
  private[graft] def crossModalQueries(documents: DataFrame, nQueries: Int,
                                       dim: Int): DataFrame = {
    val feats = extractFeatures(mediaFromDocuments(documents))
      .filter(col("doc_id") < nQueries)
    val proj = array((0 until dim).map { j =>
      (col("f_mean") * lit(alignmentWeight(0, j))) +
        (col("f_range").cast("double") * lit(alignmentWeight(1, j))) +
        (col("f_mod").cast("double") * lit(alignmentWeight(2, j)))
    }: _*)
    feats.select(col("doc_id").as("query_id"), proj.as("embedding"))
  }

  /** CROSS-MODAL retrieval at index scale (q_crossmodal_ivfpq) — the
    * "corpus outgrows brute force" graduation [[crossModalSearch]]'s
    * scaladoc promises, as a query: the SAME projected media vectors
    * served from the persisted IVF-PQ index over the embeddings table
    * ([[Similarity.buildIvfPqIndex]]), through the from-files ADC
    * shortlist, then exact-COSINE re-ranked on the shortlist so the
    * emitted contract (query_id, rank, neighbor_id, sim) matches the
    * brute tier's ranked-top-k semantics. Nothing cross-modal exists in
    * the index machinery — the external queries are just another
    * embeddings-shaped frame, which is the point.
    *
    * Query ids are offset out of the vec_id space during the serve (the
    * serve's self-match guard compares ids; an external query id that
    * happens to collide with a vec_id must not silently exclude that
    * candidate) and mapped back on emission.
    *
    * Scale shape: index build is corpus-linear and amortized across
    * releases; the serve probes nprobe cells, reads codes not vectors,
    * and the cosine re-rank touches |Q|·m raw vectors — the |Q|·|D|
    * brute cross join becomes cell-bounded candidate scoring. The
    * shortlist runs deeper than the same-metric serves (m=200): the ADC
    * stage estimates L2 while the emitted contract is cosine, so the
    * re-rank needs headroom to recover cosine-top-k from an L2-ordered
    * candidate list (recall floor locked in MultimodalSpec).
    */
  def crossModalIvfPq(spark: org.apache.spark.sql.SparkSession,
                      sfDir: String, nQueries: Int = 5, k: Int = 10,
                      m: Int = 200, nprobe: Int = 6, trainIters: Int = 2,
                      dim: Int = 64): DataFrame = {
    val off = 1000000000L
    val emb = graft.Tables.embeddings(spark, sfDir)
    val dir = Similarity.newIndexDir()
    Similarity.buildIvfPqIndex(emb, dir, trainIters)
    val queries = crossModalQueries(
        graft.Tables.documents(spark, sfDir), nQueries, dim)
      .select((col("query_id") + lit(off)).as("query_id"), col("embedding"))
    Similarity.searchIvfPqIndexCosineRerank(spark, dir, emb, queries,
        k, m, nprobe)
      .select((col("query_id") - lit(off)).as("query_id"), col("rank"),
        col("neighbor_id"), col("sim"))
      .orderBy("query_id", "rank")
  }
}
