package graft

import org.scalacheck.{Gen, Prop, Test => SCTest}
import graft.operators.{Landing, NearDup}

/** Dedup semantics: scalacheck properties for the exact path, and the
  * sketch-vs-exact equivalence the MinHash query's shared oracle relies on.
  */
class DedupSpec extends SparkSpec {

  private val rowsGen =
    Gen.listOf(Gen.zip(Gen.choose(0, 20), Gen.choose(0, 5)))

  test("dropDuplicates is idempotent and key-complete (property)") {
    val sp = spark
    import sp.implicits._
    val prop = Prop.forAll(rowsGen) { rows =>
      val df = rows.toDF("k", "v")
      val once = Landing.dedup(df, Seq("k", "v"))
      val twice = Landing.dedup(once, Seq("k", "v"))
      val a = once.collect().map(r => (r.getInt(0), r.getInt(1))).toSet
      val b = twice.collect().map(r => (r.getInt(0), r.getInt(1))).toSet
      a == b && a == rows.toSet // idempotent, and exactly the distinct pairs
    }
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(20), prop)
    assert(res.passed, res.status.toString)
  }

  test("MinHash+LSH pairs equal the exact jaccard pairs at threshold 0.5") {
    val docs = Tables.documents(spark, sf0001)
    val exact = NearDup.jaccardPairs(docs, 3, 0.5, 100)
      .select("a_id", "b_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val sketch = NearDup.minhashPairs(docs, 3, 0.5, 100)
      .select("a_id", "b_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(exact.nonEmpty, "testdata should contain planted near-dups")
    assert(sketch === exact)
  }

  test("identical documents share a min-shingle fingerprint; distinct ones don't") {
    val sp = spark
    import sp.implicits._
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog near the river bank"),
      (2L, "the quick brown fox jumps over the lazy dog near the river bank"),
      (3L, "a totally different set of words about distributed columnar engines"))
      .toDF("doc_id", "text")
    val fp = graft.operators.TextAnalysis.fingerprints(docs)
      .collect().map(r => r.getLong(0) -> r.getString(2)).toMap
    assert(fp(1L) === fp(2L))
    assert(fp(1L) !== fp(3L))
  }

  test("identical documents collide at hamming 0 in simhashPairs") {
    val sp = spark
    import sp.implicits._
    val docs = Seq(
      (1L, "spark shuffles the sorted aggregation across executor partitions"),
      (2L, "spark shuffles the sorted aggregation across executor partitions"),
      (3L, "a completely different document about stream processing windows"))
      .toDF("doc_id", "text")
    val pairs = NearDup.simhashPairs(docs, 3)
      .select("a_id", "b_id", "hamming").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(pairs.toSeq === Seq((1L, 2L, 0L)))
  }

  test("duplicateComponents collapses a transitive chain into one cluster") {
    val sp = spark
    import sp.implicits._
    // a ~ b (identical), b ~ c (identical) ⇒ {a,b,c} must be ONE cluster
    // labeled by the minimum id, even though a ~ c is only transitive;
    // d/e form a second identical pair; f is a singleton (no pair → no row)
    val same1 = "spark shuffles the sorted aggregation across executor partitions"
    val same2 = "watermarks bound the streaming state store growth per batch"
    val docs = Seq(
      (10L, same1), (11L, same1), (12L, same1),
      (20L, same2), (21L, same2),
      (30L, "a completely different document about columnar file formats"))
      .toDF("doc_id", "text")
    val comps = NearDup.duplicateComponents(docs, 3).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(comps === Seq((10L, 10L), (11L, 10L), (12L, 10L), (20L, 20L), (21L, 20L)))
    CacheRegistry.release()
  }

  test("approx_count_distinct lands within 5x rsd of the exact count") {
    val orders = Tables.orders(spark, sf0001)
    val exact = operators.Warehouse.distinctBuyers(orders)
      .select("o_orderstatus", "n_buyers").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val approx = operators.Warehouse.approxDistinctBuyers(orders)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(approx.keySet === exact.keySet)
    approx.foreach { case (k, a) =>
      val e = exact(k).toDouble
      assert(math.abs(a - e) / e <= 5 * 0.02,
        s"status $k: approx $a vs exact $e beyond 5x rsd")
    }
  }
}
