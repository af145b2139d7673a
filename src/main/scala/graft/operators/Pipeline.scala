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

  /** The CURATION pipeline — the round-5 composition over the gate-style
    * operators: Gopher rule gates → repetition filter → duplicate-cluster
    * BEST-COPY rewrite → per-language token accounting. Differs from
    * [[e2e]] in two production-relevant ways: filtering is boolean gates
    * (not a soft score), and near-dup handling keeps the best-QUALITY
    * member of each cluster instead of the lowest id — "keep the best
    * copy, not the first copy".
    *
    * Scale shape: gates and repetition signals are per-doc scan+agg; the
    * cluster stage runs components-label-propagation on the gated
    * survivors only; the final census is one hash agg keyed by lang. The
    * gated corpus is persisted once and shared by the cluster stage's two
    * consumers (pair generation + quality ranking).
    */
  def curate(documents: DataFrame, repTau: Double = 0.08): DataFrame = {
    // stage 1+2: boolean gates + repetition cutoff (both per-row passes)
    val gates = TextAnalysis.gopherRulesUnordered(documents)
      .filter(col("pass") === 1).select("doc_id")
    val rep = TextAnalysis.repetitionSignalsUnordered(documents)
      .filter(col("top_bigram_frac") <= repTau).select("doc_id")
    val kept = documents.join(gates, Seq("doc_id"), "left_semi")
      .join(rep, Seq("doc_id"), "left_semi")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      .transform(graft.CacheRegistry.track)

    // stage 3: duplicate clusters over the SURVIVING corpus; keep the
    // best-quality member per cluster (ties to lowest doc_id), pass
    // through every unclustered doc
    val comps = NearDup.duplicateComponentsUnordered(kept, 3)
    val quality = TextAnalysis.qualityScore(kept)
      .select(col("doc_id"), col("quality_score"))
    val best = comps.join(quality, "doc_id")
      .groupBy("cluster_id")
      .agg(min(struct((-col("quality_score")).as("nq"), col("doc_id").as("id"))).as("m"))
      .select(col("m.id").as("doc_id"))
    val unclustered = kept.select("doc_id")
      .join(comps.select("doc_id"), Seq("doc_id"), "left_anti")
    val finalDocs = kept.join(unclustered.unionByName(best), Seq("doc_id"), "left_semi")

    // stage 4: per-language census with the BPE-ish token accounting
    finalDocs
      .withColumn("lower_text", lower(col("text")))
      .groupBy("lang")
      .agg(count(lit(1)).as("n_docs"),
           sum(size(regexp_extract_all(col("lower_text"),
             lit(TextAnalysis.bpePattern), lit(0))).cast("long")).as("bpe_tokens"))
      .orderBy("lang")
  }
}
