package graft

import graft.operators.TextAnalysis

/** Invariants of the sequence-packing operator (the per-(lang,bin)
  * aggregate is oracled; these prove the packing semantics itself).
  */
class TextAnalysisSpec extends SparkSpec {

  test("sequencePacking conserves docs/tokens and bounds bins by budget + one doc") {
    val budget = 512L
    val docs = Tables.documents(spark, sf0001)
    val packed = TextAnalysis.sequencePacking(docs, budget).collect()

    // conservation: every doc and every token lands in exactly one bin
    val totalDocs = packed.map(_.getAs[Long]("n_docs")).sum
    assert(totalDocs === docs.count())
    val totalTokens = packed.map(_.getAs[Long]("bin_tokens")).sum
    val exactTokens = docs
      .select(org.apache.spark.sql.functions.sum(
        org.apache.spark.sql.functions.size(
          TextAnalysis.tokens(org.apache.spark.sql.functions.col("text")))
          .cast("long")))
      .head().getLong(0)
    assert(totalTokens === exactTokens)

    // capacity: offset-based first-fit lets a bin overflow by at most its
    // largest (= last) document, so bin_tokens minus that doc stays under
    // budget for every bin
    packed.foreach { r =>
      val slack = r.getAs[Long]("bin_tokens") - r.getAs[Long]("max_doc_tokens")
      assert(slack < budget,
        s"bin (${r.getAs[String]("lang")}, ${r.getAs[Long]("bin")}) " +
          s"holds $slack tokens beyond its largest doc — exceeds budget $budget")
    }
  }
}
