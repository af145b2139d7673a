package graft.functions

import org.apache.spark.sql.{Column, DataFrame, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Count-Min Sketch over token streams (the brief's "novel sketch" slot):
  * a depth×width counter matrix where reduce increments one bucket per
  * row per depth and merge is elementwise addition — fully associative,
  * so the distributed partial-aggregation tree cannot perturb the result.
  *
  * Hashing is the same md5→60-bit base used by MinHash/SimHash with
  * universal-hash rows over the Mersenne prime, so the ENTIRE sketch is
  * reproducible in ANSI SQL — the oracle rebuilds the matrix and the
  * estimates from scratch (rare for a sketch; possible because every
  * ingredient is deterministic and engine-neutral).
  */
object CountMin {

  val Depth = 4
  val Width = 1024
  val P: Long = graft.operators.NearDup.MinhashP

  /** Row-hash params, from the shared seeded generator. */
  def params(seed: Long): Seq[(Long, Long)] =
    graft.operators.NearDup.minhashParams(Depth, seed)

  def bucket(h: Long, a: Long, b: Long): Int =
    (java.lang.Math.floorMod(a * java.lang.Math.floorMod(h, P) + b, P) % Width).toInt

  case class CMSBuf(counts: Array[Long])

  class CMSAgg(seed: Long) extends Aggregator[Long, CMSBuf, Seq[Long]] {
    private val ps = params(seed)
    def zero: CMSBuf = CMSBuf(new Array[Long](Depth * Width))
    def reduce(buf: CMSBuf, h: Long): CMSBuf = {
      var i = 0
      while (i < Depth) {
        buf.counts(i * Width + bucket(h, ps(i)._1, ps(i)._2)) += 1
        i += 1
      }
      buf
    }
    def merge(x: CMSBuf, y: CMSBuf): CMSBuf = {
      var i = 0
      while (i < x.counts.length) { x.counts(i) += y.counts(i); i += 1 }
      x
    }
    def finish(r: CMSBuf): Seq[Long] = r.counts.toSeq
    def bufferEncoder: Encoder[CMSBuf] = Encoders.product[CMSBuf]
    def outputEncoder: Encoder[Seq[Long]] = {
      import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
      ExpressionEncoder[Seq[Long]]()
    }
  }

  /** Same md5→60-bit hash as the Spark expression, computed driver-side
    * for probe terms.
    */
  def md5Hash60Local(s: String): Long = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8"))
    val hex = d.map("%02x".format(_)).mkString.take(15)
    java.lang.Long.parseLong(hex, 16)
  }

  /** Point estimate for a term from a collected sketch. */
  def estimate(sketch: Seq[Long], term: String, seed: Long): Long = {
    val h = md5Hash60Local(term)
    params(seed).zipWithIndex.map { case ((a, b), i) =>
      sketch(i * Width + bucket(h, a, b))
    }.min
  }

  /** Heavy-term audit: build the sketch over every token of the corpus
    * (distributed, mergeable partials), then compare the CMS estimate
    * against the exact count for a fixed probe list. CMS guarantees
    * estimate ≥ exact; at this width collisions are rare enough that the
    * oracle checks exact equality of the estimates themselves.
    */
  def cmsTermCounts(documents: DataFrame, probes: Seq[String],
                    seed: Long = 42L): DataFrame = {
    val spark = documents.sparkSession
    // one corpus pass: persist the tokenized+hashed stream so the sketch
    // aggregation and the exact probe counts share the same scan
    val toks = documents.repartition(col("doc_id"))
      .select(explode(graft.operators.TextAnalysis.tokens(col("text"))).as("term"))
      .withColumn("hv", graft.operators.NearDup.md5Hash60(col("term")))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      .transform(graft.CacheRegistry.track)
    val cms = udaf(new CMSAgg(seed), Encoders.scalaLong)
    val sketch: Seq[Long] = toks.agg(cms(col("hv")).as("sk"))
      .head().getSeq[Long](0)
    // probe list is tiny — collect the exact counts and build the result
    // driver-side, then release the token cache deterministically
    val exact: Map[String, Long] = toks.filter(col("term").isin(probes: _*))
      .groupBy("term").agg(count(lit(1)).as("exact_count"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    toks.unpersist(blocking = false)
    import spark.implicits._
    probes.map(t => (t, estimate(sketch, t, seed), exact.getOrElse(t, 0L)))
      .toDF("term", "cms_estimate", "exact_count")
      .orderBy("term")
  }
}
