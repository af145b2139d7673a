package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** The reference engine's core "query": land clickstream events into a
  * time-partitioned file layout, deduplicated.
  *
  * Reference: consumer.py:221-232 derives an S3 key `y=Y/m=M/d=D/h=H/` from
  * the FIRST record of each batch (so a batch straddling an hour boundary is
  * mis-filed); consumer.py:301-303 dedups only when the stored checkpoint
  * sequence number reappears inside the current batch. We improve on both:
  * per-RECORD partition derivation via `partitionBy`, and record-level dedup
  * on the event key — semantics the reference intends but cannot deliver.
  *
  * Scale notes: `partitionBy("y","m","d","h")` gives directory-level
  * partition pruning for downstream readers; dedup is a hash shuffle on the
  * event key only (no sort), and at 100 TB would be bounded per event-time
  * range by first repartitioning on (y,m,d) so each output partition is
  * written by a narrow set of tasks.
  */
object Landing {

  /** Adds y/m/d/h integer partition columns from a timestamp column.
    * Mirrors consumer.py:226-232 (non-zero-padded components — int columns
    * reproduce that naturally in directory names).
    */
  def withTimeBuckets(df: DataFrame, ts: Column): DataFrame =
    df.withColumn("y", year(ts))
      .withColumn("m", month(ts))
      .withColumn("d", dayofmonth(ts))
      .withColumn("h", hour(ts))

  /** Record-level exact dedup on a key — the correct form of the
    * reference's batch-overlap check (consumer.py:292-303).
    */
  def dedup(df: DataFrame, keys: Seq[String]): DataFrame =
    df.dropDuplicates(keys)

  /** The landed row shape: time buckets + a uuid() land_id (reference
    * consumer.py:244 names S3 objects with uuid4 — nondeterministic, so
    * oracle-facing aggregates drop it).
    */
  def bucketedWithLandId(df: DataFrame, ts: Column): DataFrame =
    withTimeBuckets(df, ts).withColumn("land_id", expr("uuid()"))

  /** THE landing write, shared by every landing path (batch, compaction
    * input, streaming micro-batch): repartition on (y,m,d) so each output
    * partition is written by a narrow set of tasks — without it every task
    * holds a writer per open hour-bucket and the job emits tens of
    * thousands of tiny files at 100 TB. Returns the data-file schema
    * (partition cols live in directory names) so read-back never needs a
    * schema-inference pass over just-written JSON.
    */
  def writeLandedJson(bucketed: DataFrame, outDir: String,
                      mode: String = "overwrite"): StructType = {
    bucketed
      .repartition(col("y"), col("m"), col("d"))
      .write.mode(mode)
      .partitionBy("y", "m", "d", "h")
      .json(outDir)
    dataFileSchema(bucketed)
  }

  /** Data-file schema of a landed frame: everything except the partition
    * columns, which live in directory names.
    */
  def dataFileSchema(bucketed: DataFrame): StructType =
    StructType(bucketed.schema.filterNot(f =>
      Seq("y", "m", "d", "h").contains(f.name)))

  /** Batch landing pipeline: dedup → bucket → partitioned JSON files.
    * Returns the landed row count per partition, read back from the sink
    * (proves the roundtrip like the reference's put_object + later replay).
    */
  def landPartitionedJson(df: DataFrame, ts: Column, key: Seq[String],
                          outDir: String): DataFrame = {
    val bucketed = bucketedWithLandId(dedup(df, key), ts)
    val dataSchema = writeLandedJson(bucketed, outDir)
    df.sparkSession.read.schema(dataSchema).json(outDir)
      .groupBy("y", "m", "d", "h")
      .agg(count(lit(1)).as("n_events"))
  }

  /** Full land→compact cycle over fresh temp dirs: dedup + bucket +
    * hour-partitioned JSON landing, then day-level parquet compaction.
    * (The streaming ingest variant of the same layout is measured
    * separately by q_stream_land.)
    */
  def landCompactCycle(df: DataFrame, ts: Column, key: Seq[String]): DataFrame = {
    val runId = java.util.UUID.randomUUID().toString.take(8)
    val tmp = sys.props("java.io.tmpdir")
    val outDir = s"$tmp/graft_compact_in/$runId"
    val compactDir = s"$tmp/graft_compact_out/$runId"
    val dataSchema = writeLandedJson(
      bucketedWithLandId(dedup(df, key), ts), outDir)
    compactLanded(df.sparkSession, outDir, dataSchema, compactDir)
  }

  /** Compaction pass over a landed batch=N/y=/m=/d=/h= JSON layout: read
    * every batch directory, rewrite as parquet partitioned by (y,m,d)
    * with one writer task per day — the small-file management step every
    * streaming landing needs (hour-level JSON appends compact into
    * day-level columnar files; downstream readers get partition pruning
    * plus parquet stats instead of thousands of tiny JSON objects).
    * Returns per-day counts read back from the compacted layout.
    */
  def compactLanded(spark: org.apache.spark.sql.SparkSession,
                    landedDir: String, dataSchema: StructType,
                    compactDir: String): DataFrame = {
    val landed = spark.read.schema(dataSchema).json(landedDir)
    landed
      .repartition(col("y"), col("m"), col("d"))
      .write.mode("overwrite")
      .partitionBy("y", "m", "d")
      .parquet(compactDir)
    spark.read.parquet(compactDir)
      .groupBy("y", "m", "d")
      .agg(count(lit(1)).as("n_events"))
      .orderBy("y", "m", "d")
  }
}
