package graft

import java.nio.file.{Files, Paths}
import java.util.UUID
import org.apache.spark.sql.functions._
import graft.streaming.{StreamConfig, StreamOps}

/** The migration surface: reference env vars in, reference behavior out. */
class StreamConfigSpec extends SparkSpec {

  test("fromEnv mirrors the reference's names and defaults") {
    val defaults = StreamConfig.fromEnv(Map.empty, fallbackRoot = "/tmp/x")
    assert(defaults.batchSize === 1000) // consumer.py:255 default
    assert(defaults.prefix === "js")    // consumer.py:257 'js/' key prefix
    assert(defaults.shardNumber.isEmpty)
    val cfg = StreamConfig.fromEnv(Map(
      "BUCKET_NAME" -> "/tmp/bucket", "PREFIX" -> "landed",
      "BATCH_SIZE" -> "500", "SHARD_NUMBER" -> "3"))
    assert(cfg.outDir === "/tmp/bucket/landed")
    assert(cfg.batchSize === 500)
    assert(cfg.shardNumber === Some(3))
  }

  test("SHARD_NUMBER parity mode lands exactly that shard's records") {
    val root = Paths.get(sys.props("java.io.tmpdir"),
      s"graft_test_cfg_${UUID.randomUUID().toString.take(8)}")
    Files.createDirectories(root)
    val cfg = StreamConfig.fromEnv(Map(
      "BUCKET_NAME" -> root.toString, "SHARD_NUMBER" -> "3"))
    StreamConfig.landConfigured(spark, sf0001, cfg)
    val landed = spark.read
      .schema(StreamOps.landedDataSchema).json(cfg.outDir)
    assert(landed.count() > 0)
    assert(landed.filter(col("shard_id") =!= 3).count() === 0)
    val expected = Tables.events(spark, sf0001)
      .filter(pmod(col("user_id"), lit(8)) === 3).count()
    assert(landed.count() === expected)
  }
}
