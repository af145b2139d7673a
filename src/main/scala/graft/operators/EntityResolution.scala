package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import Similarity.quant6

/** Multi-attribute ENTITY RESOLUTION over the `part` catalog — the
  * record-linkage stage a training-data pipeline runs on its metadata
  * tables (product/author/source catalogs) before joining them to the
  * corpus, distinct from document near-dup: records match on a FUSED
  * score across several attributes, and each resolved entity elects a
  * canonical "golden record" (survivorship).
  *
  * Reference scope: rtacconi/kinesis-test processes one record stream
  * with no linkage stage (consumer.py:92-130 relays records verbatim);
  * this family is part of the mandated beyond-the-reference
  * LLM-pipeline surface (dedup at the ENTITY level rather than the
  * document level).
  *
  * The pipeline, each stage scale-shaped:
  *
  *  1. BLOCKING — each record enters exactly ONE block, keyed by the
  *     rarest token of its name (min document frequency, ties to the
  *     lexicographically smallest token): the classic cheapest-block
  *     device. Block sizes are bounded by the rarest token's df, so the
  *     candidate-pair space is sum(df_rarest²), never |catalog|² — the
  *     same banded-not-all-pairs contract as NearDup. The df table is
  *     vocabulary-sized and rides a broadcast join.
  *  2. SCORING — candidate pairs within a block get a fused match
  *     score: 0.6·Jaccard(name tokens) + 0.2·[brand equal] +
  *     0.2·[type equal], quantized (quant6) so both engines threshold
  *     identical values. Jaccard is |∩| / (|A|+|B|−|∩|) over DISTINCT
  *     token sets — computed with array_intersect + sizes, no unnest
  *     rejoin.
  *  3. MATCH GRAPH → ENTITIES — pairs at score ≥ threshold become
  *     undirected edges; [[NearDup.componentsFromEdges]] (the shared
  *     min-label-propagation fixpoint, localCheckpoint rounds) labels
  *     each component by its min key. Records with no match edge are
  *     singleton entities labelled by their own key — coalesced after a
  *     left join, never pushed through the fixpoint.
  *  4. SURVIVORSHIP — per entity, the canonical record is the
  *     highest-retailprice member (ties to the lowest key): argmax via
  *     min over a (−price, key, …) struct, the same device as
  *     [[NearDup.clusterRepresentatives]] — one hash aggregation, no
  *     entity-keyed window.
  */
object EntityResolution {

  /** Distinct lowercase alphanumeric tokens of a name — mirrors the
    * corpus tokenizer (split on `[^a-z0-9]+`, drop empties) so the
    * oracle twin's string_split_regex expression is character-identical.
    */
  private def nameTokens(name: Column): Column =
    array_distinct(filter(split(lower(name), "[^a-z0-9]+"), t => t =!= ""))

  /** Per-record resolution frame: every part with its blocking key and
    * resolved entity id (plus the attributes survivorship needs).
    * Shared spine of [[resolveParts]] and [[canonicalParts]].
    */
  private def resolvedParts(part: DataFrame, threshold: Double): DataFrame = {
    val base = part.select(col("p_partkey"), col("p_name"), col("p_brand"),
      col("p_type"), col("p_retailprice"),
      nameTokens(col("p_name")).as("toks"))
    val tok = base.select(col("p_partkey"), explode(col("toks")).as("t"))
    val df = tok.groupBy("t").agg(count(lit(1)).as("df"))
    // rarest token per record: min over the (df, token) struct == the
    // oracle's row_number ORDER BY df, t — one agg, no window
    val blk = tok.join(broadcast(df), "t")
      .groupBy("p_partkey")
      .agg(min(struct(col("df"), col("t"))).as("m"))
      .select(col("p_partkey"), col("m.t").as("bkey"))
    val rec = base.join(blk, "p_partkey")
    val a = rec.select(col("p_partkey").as("a_id"), col("bkey"),
      col("toks").as("a_toks"), col("p_brand").as("a_brand"),
      col("p_type").as("a_type"))
    val b = rec.select(col("p_partkey").as("b_id"), col("bkey"),
      col("toks").as("b_toks"), col("p_brand").as("b_brand"),
      col("p_type").as("b_type"))
    // shuffle on the block key; a_id < b_id halves the pair space
    val isz = size(array_intersect(col("a_toks"), col("b_toks")))
      .cast("double")
    val usz = (size(col("a_toks")) + size(col("b_toks"))).cast("double") - isz
    // association order matches the SQL twin term for term:
    // (0.6 * |∩|) / |∪| + 0.2*brand + 0.2*type, left to right
    val score = quant6(
      lit(0.6) * isz / usz
        + lit(0.2) * when(col("a_brand") === col("b_brand"), 1.0).otherwise(0.0)
        + lit(0.2) * when(col("a_type") === col("b_type"), 1.0).otherwise(0.0))
    val edges = a.join(b, Seq("bkey"))
      .filter(col("a_id") < col("b_id") && score >= threshold)
      .select("a_id", "b_id")
    // the fixpoint's shuffle width scales with the CATALOG, not the
    // session (same device as NearDup.duplicateComponentsUnordered:
    // every loop job launches while the conf is set, and the labels
    // frame is localCheckpoint-materialized by loop exit, so downstream
    // consumers shuffle at the restored session width)
    val spark = part.sparkSession
    val width = NearDup.fixpointWidth(part)
    val prevWidth = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", width.toString)
    val comps =
      try NearDup.componentsFromEdges(edges)
        .select(col("id").as("p_partkey"), col("lbl"))
      finally spark.conf.set("spark.sql.shuffle.partitions", prevWidth)
    rec.join(comps, Seq("p_partkey"), "left")
      .withColumn("entity_id", coalesce(col("lbl"), col("p_partkey")))
  }

  /** q_entity_resolve: the per-record assignment — every part, its
    * blocking key, and the entity it resolved to.
    */
  def resolveParts(part: DataFrame, threshold: Double = 0.8): DataFrame =
    resolvedParts(part, threshold)
      .select(col("p_partkey"), col("bkey").as("block_key"), col("entity_id"))
      .orderBy("p_partkey")

  /** q_entity_canonical: the golden-record census — per entity, the
    * membership/brand/type spread, the price range the duplicates span,
    * and the surviving canonical record (highest price, ties to the
    * lowest key).
    */
  def canonicalParts(part: DataFrame, threshold: Double = 0.8): DataFrame =
    resolvedParts(part, threshold)
      .groupBy("entity_id")
      .agg(count(lit(1)).as("n_members"),
        countDistinct(col("p_brand")).as("n_brands"),
        countDistinct(col("p_type")).as("n_types"),
        min(col("p_retailprice")).as("price_min"),
        max(col("p_retailprice")).as("price_max"),
        min(struct((-col("p_retailprice")).as("np"), col("p_partkey"),
          col("p_name"))).as("c"))
      .select(col("entity_id"), col("n_members"), col("n_brands"),
        col("n_types"), col("price_min"), col("price_max"),
        col("c.p_partkey").as("canonical_key"),
        col("c.p_name").as("canonical_name"))
      .orderBy("entity_id")
}
