package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The composed end-to-end training-data pipeline — the artifact an
  * LLM-data user actually ships (driver north-star; each stage exists as
  * its own oracled operator, this proves they agree on schemas and
  * compose): quality-filter → exact-dup drop → near-dup drop →
  * deterministic split → per-split token accounting.
  *
  * Stage order matters and is the production order: filter cheap per-row
  * quality FIRST (shrinks every later stage), dedup second (exact before
  * near — near-dup pair generation is the expensive stage, so it runs on
  * the smallest surviving corpus), split LAST (so train/valid/test stay
  * leak-free: a near-dup pair can never straddle a split boundary when
  * the dup is dropped before splitting).
  *
  * Scale shape: every stage is a scan + hash shuffle on a
  * high-cardinality key (doc_id / fingerprint / simhash band), no stage
  * materializes to the driver, and the one shared subplan (the filtered
  * corpus) is persisted once and reused by all three consumers.
  */
object Pipeline {

  /** (split, n_docs, ws_tokens, bpe_tokens) of the surviving corpus. */
  def e2e(documents: DataFrame, qualityMin: Double = 0.5): DataFrame = {
    // stage 1: quality filter (TextAnalysis.qualityScore's composite) —
    // per-row work, no shuffle, drops low-quality docs before anything
    // expensive runs
    val scores = TextAnalysis.qualityScore(documents)
      .select(col("doc_id"), col("quality_score"))
      .filter(col("quality_score") >= qualityMin)
    val docsQ = documents.join(scores, "doc_id")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      .transform(graft.CacheRegistry.track)

    // stage 2: exact-dup drop — identical content shares a fingerprint
    // (TextAnalysis.fingerprints); keep the lowest doc_id per fingerprint.
    // Docs too short to shingle (null fingerprint) are all kept: at scale
    // that partition is the one potential hot key, and it never joins
    // (null != null), it only passes through the keep-filter.
    val fp = TextAnalysis.fingerprintsUnordered(docsQ).select("doc_id", "fingerprint")
    val survivorsExact = fp
      .withColumn("min_id", min(col("doc_id")).over(Window.partitionBy("fingerprint")))
      .filter(col("fingerprint").isNull || col("doc_id") === col("min_id"))
      .select("doc_id")
    val docsD = docsQ.join(survivorsExact, Seq("doc_id"), "left_semi")

    // stage 3: near-dup drop — SimHash hamming<=3 pairs (a_id < b_id);
    // the higher id of every pair is dropped. Deterministic regardless of
    // chain structure: b survives iff NO lower-id doc is within the
    // hamming radius.
    val ndDropped = NearDup.simhashPairs(docsD, 3)
      .select(col("b_id").as("doc_id")).distinct()
    val docsND = docsD.join(ndDropped, Seq("doc_id"), "left_anti")

    // stage 4: content-stable 80/10/10 split (same md5-mod-100 routing as
    // TextAnalysis.hashSplit) + per-split token accounting (same token
    // definitions as TextAnalysis.tokenCounts)
    docsND
      .withColumn("h",
        pmod(NearDup.md5Hash60(col("doc_id").cast("string")), lit(100)))
      .withColumn("split",
        when(col("h") < 80, "train").when(col("h") < 90, "valid")
          .otherwise("test"))
      .withColumn("lower_text", lower(col("text")))
      .groupBy("split")
      .agg(count(lit(1)).as("n_docs"),
           sum(size(split(trim(col("lower_text")), "\\s+")).cast("long")).as("ws_tokens"),
           sum(size(regexp_extract_all(col("lower_text"),
             lit(TextAnalysis.bpePattern), lit(0))).cast("long")).as("bpe_tokens"))
      .orderBy("split")
  }
}
