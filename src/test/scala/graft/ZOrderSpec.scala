package graft

import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SCTest}
import graft.functions.ZOrder
import graft.operators.Events

/** The Morton-key layout device: the codegen'd bit-interleave must agree
  * with a reference implementation, and the layout scan must keep both
  * predicates at the parquet scan (the stats-skipping contract).
  */
class ZOrderSpec extends SparkSpec {

  /** Reference Morton interleave — the obvious bit loop. */
  private def mortonRef(a: Int, b: Int): Long =
    (0 until 16).foldLeft(0L) { (acc, i) =>
      acc |
        (((a >> i) & 1).toLong << (2 * i + 1)) |
        (((b >> i) & 1).toLong << (2 * i))
    }

  test("interleave16 equals the reference bit loop over random 16-bit pairs (property)") {
    val sp = spark
    import sp.implicits._
    val pairGen = Gen.zip(Gen.choose(0, 65535), Gen.choose(0, 65535))
    val prop = Prop.forAll(Gen.listOfN(64, pairGen)) { pairs =>
      val got = pairs.toDF("a", "b")
        .select(ZOrder.interleave16(col("a"), col("b")).as("z"))
        .collect().map(_.getLong(0)).toSeq
      got == pairs.map { case (a, b) => mortonRef(a, b) }
    }
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(10), prop)
    assert(res.passed, res.status.toString)
  }

  test("z-key locality: fixing one dimension, the key is monotone in the other") {
    val sp = spark
    import sp.implicits._
    // monotonicity per dimension is what makes range predicates map to
    // contiguous-ish key ranges (the skipping story); spot-check both axes
    val keys = (0 to 255).map(i => (i, 7)).toDF("a", "b")
      .select(ZOrder.interleave16(col("a"), col("b")).as("z"))
      .collect().map(_.getLong(0)).toSeq
    assert(keys == keys.sorted, "z-key not monotone in dimension a")
    val keysB = (0 to 255).map(i => (7, i)).toDF("a", "b")
      .select(ZOrder.interleave16(col("a"), col("b")).as("z"))
      .collect().map(_.getLong(0)).toSeq
    assert(keysB == keysB.sorted, "z-key not monotone in dimension b")
  }

  test("q_zorder_scan: values survive the layout and both predicates reach the scan") {
    val ev = Tables.events(spark, sf0001)
    val got = Events.zorderScan(spark, ev).collect()
    val want = ev.withColumn("day", dayofmonth(col("ts")))
      .filter(col("user_id") <= 7 && col("day").between(8, 14))
      .groupBy("event_type")
      .agg(count(lit(1)).as("n_events"),
           sum(col("value").cast("decimal(18,2)")).cast("double").as("sum_value"))
      .orderBy("event_type").collect()
    assert(got.toSeq === want.toSeq, "layout changed the values")
    assert(got.nonEmpty, "empty probe window proves nothing")
    // both dimensions' predicates must reach the parquet scan — that is
    // what turns the z-clustered row-group stats into skipped IO
    val plan = Events.zorderScan(spark, ev).queryExecution.executedPlan.toString
    assert(plan.contains("LessThanOrEqual(user_id,7)"),
      "user_id predicate not pushed:\n" + plan.take(2000))
    assert(plan.contains("GreaterThanOrEqual(day,8)"),
      "day predicate not pushed:\n" + plan.take(2000))
  }
}
