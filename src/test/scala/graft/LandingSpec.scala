package graft

import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SCTest}
import graft.operators.Landing

/** Landing-pipeline properties promised in SURVEY §5: partition-key
  * totality over arbitrary timestamps, and idempotence of the landing
  * write itself.
  */
class LandingSpec extends SparkSpec {

  test("partition key derivation is total over arbitrary timestamps (property)") {
    val sp = spark
    import sp.implicits._
    // micros across 1900-2100 — far beyond any event-time the pipeline sees
    val usGen = Gen.choose(-2208988800000000L, 4102444800000000L)
    val prop = Prop.forAll(Gen.listOfN(200, usGen)) { usList =>
      val df = Landing.withTimeBuckets(
        usList.toDF("us").withColumn("ts", timestamp_micros($"us")), col("ts"))
      val rows = df.select("y", "m", "d", "h").collect()
      rows.length == usList.length && rows.forall { r =>
        !r.anyNull &&
        r.getInt(0) >= 1900 && r.getInt(0) <= 2100 &&
        r.getInt(1) >= 1 && r.getInt(1) <= 12 &&
        r.getInt(2) >= 1 && r.getInt(2) <= 31 &&
        r.getInt(3) >= 0 && r.getInt(3) <= 23
      }
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(5), prop)
    assert(res.passed, res.status.toString)
  }

  test("landing twice yields identical partition counts (idempotence)") {
    val out = s"${sys.props("java.io.tmpdir")}/graft_test_land_idem"
    val ev = Tables.events(spark, sf0001)
    val a = Landing.landPartitionedJson(ev, col("ts"), Seq("event_id"), out)
      .orderBy("y", "m", "d", "h").collect().toSeq
    val b = Landing.landPartitionedJson(ev, col("ts"), Seq("event_id"), out)
      .orderBy("y", "m", "d", "h").collect().toSeq
    assert(a === b)
    assert(a.nonEmpty)
  }
}
