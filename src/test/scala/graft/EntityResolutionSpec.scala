package graft

import java.io.ByteArrayOutputStream
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.operators.EntityResolution

/** Entity-resolution laws the oracle can't see directly: the min-label
  * component invariant, singleton coalesce, survivorship argmax, and the
  * plan shape that keeps the pipeline banded at 100 TB.
  */
class EntityResolutionSpec extends SparkSpec {

  private def part: DataFrame = Tables.part(spark, sf0001)

  test("resolveParts: total (every record exactly once), min-label law, " +
       "singletons resolve to their own key") {
    val res = EntityResolution.resolveParts(part).collect()
    val keys = res.map(_.getLong(0))
    val nParts = part.count()
    assert(keys.length === nParts && keys.distinct.length === keys.length,
      "resolution must assign every part exactly one entity")
    // min-label: each entity's id IS the smallest member key (the
    // componentsFromEdges contract), which also covers singletons —
    // a lone member's entity_id must equal its own key
    val byEntity = res.groupBy(_.getLong(2))
    byEntity.foreach { case (ent, members) =>
      assert(ent === members.map(_.getLong(0)).min,
        s"entity $ent is not the min member key")
    }
    assert(byEntity.exists(_._2.length > 1),
      "sf0.001 part names should yield at least one multi-member entity")
    assert(byEntity.exists(_._2.length === 1),
      "expected singleton entities too (coalesce branch must be exercised)")
    CacheRegistry.release()
  }

  test("canonicalParts: survivorship elects max-retailprice (ties to the " +
       "lowest key) and censuses agree with the per-record frame") {
    val sp = spark
    import sp.implicits._
    val assign = EntityResolution.resolveParts(part)
      .select("p_partkey", "entity_id")
    val expected = part.join(assign, "p_partkey")
      .select($"entity_id", $"p_partkey", $"p_name", $"p_retailprice")
      .collect()
      .groupBy(_.getLong(0))
      .map { case (ent, ms) =>
        val canon = ms.minBy(r => (-r.getDouble(3), r.getLong(1)))
        (ent, (ms.length.toLong, ms.map(_.getDouble(3)).min,
          ms.map(_.getDouble(3)).max, canon.getLong(1), canon.getString(2)))
      }
    val got = EntityResolution.canonicalParts(part).collect().map { r =>
      (r.getLong(0), (r.getLong(1), r.getDouble(4), r.getDouble(5),
        r.getLong(6), r.getString(7)))
    }.toMap
    assert(got === expected)
    CacheRegistry.release()
  }

  test("threshold monotonicity: raising the threshold never merges more") {
    // fewer edges can only split components — entity count is monotone
    // non-decreasing in the threshold (a cheap law the oracle twin's
    // fixed threshold can't check)
    val loose = EntityResolution.resolveParts(part, 0.7)
      .select("entity_id").distinct().count()
    val tight = EntityResolution.resolveParts(part, 0.9)
      .select("entity_id").distinct().count()
    assert(loose <= tight,
      s"0.7-threshold entities ($loose) exceed 0.9-threshold ($tight)")
    CacheRegistry.release()
  }

  test("streaming incremental linkage drains to the batch result " +
       "(entity merge across batches is exact)") {
    // the streaming form re-resolves the merged SIGNATURE store each
    // micro-batch, so a record bridging two earlier entities must merge
    // them — drained assignment ≡ batch assignment, bit for bit
    val sp = spark
    import sp.implicits._
    val drained = streaming.StreamOps.streamEntityResolve(sp, sf0001)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    val batch = EntityResolution.resolveParts(part)
      .select("p_partkey", "entity_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(drained === batch)
    CacheRegistry.release()
  }

  test("plan: df table broadcasts into blocking, no cartesian, no window " +
       "anywhere (survivorship is one hash agg)") {
    val out = new ByteArrayOutputStream()
    Console.withOut(new java.io.PrintStream(out)) {
      EntityResolution.canonicalParts(part).explain("formatted")
    }
    val p = out.toString
    assert(!p.contains("CartesianProduct"),
      "entity resolution grew a cartesian — pair space must stay banded")
    assert(p.contains("BroadcastHashJoin"),
      "the vocabulary-sized df table must ride a broadcast join")
    assert(!p.contains("windowspecdefinition"),
      "survivorship must be the min-struct agg, never an entity-keyed window")
    CacheRegistry.release()
  }
}
