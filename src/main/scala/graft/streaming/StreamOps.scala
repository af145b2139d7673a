package graft.streaming

import java.util.UUID
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types._
import graft.operators.Landing

/** The streaming engine — the reference's actual identity (SURVEY §2.9):
  * a micro-batch consumer that lands deduplicated events into a
  * time-partitioned layout with checkpoint/resume.
  *
  * Reference mapping:
  *  - poll loop consumer.py:282-314            → micro-batch trigger
  *    (Trigger.AvailableNow in tests/queries; ProcessingTime in production)
  *  - TRIM_HORIZON replay consumer.py:96       → file source reads from the
  *    start of the directory listing
  *  - DynamoDB lease/checkpoint consumer.py:133-218 → checkpointLocation
  *    (offset WAL + commit log; resume is automatic on restart)
  *  - batch-overlap dup check consumer.py:301-303   → watermarked
  *    record-level dropDuplicatesWithinWatermark — strictly stronger
  *  - one-process-per-shard consumer.py:260,277-278 → source partitions →
  *    tasks, all shards in one query
  *  - envelope projection consumer.py:120-130  → sequence_number/shard_id
  *    metadata columns
  *
  * The Kinesis connector itself cannot run offline; the file source is the
  * stand-in behind the same DataFrame surface (the reference's own test
  * seam: pure core, effectful edge — consumer_test.py). Every transform is
  * the SAME batch function used by the batch queries, applied inside
  * readStream/foreachBatch.
  */
object StreamOps {

  /** STATE-STORE PROVIDER seam. The default HDFSBackedStateStoreProvider
    * keeps every stateful operator's state on the executor HEAP (disk is
    * only the checkpoint copy); at 100× the session/join/dedup state the
    * scale probes measure, heap-resident state is the first thing to fall
    * over. RocksDBStateStoreProvider (bundled with Spark + rocksdbjni)
    * keeps working state off-heap with native spill — the production
    * configuration for large state. Selected per session via
    * env SPARK_GRAFT_STATESTORE (rocksdb | hdfs; unset = Spark default)
    * or programmatically; applied by every stream builder in this object,
    * so all q_stream_* queries run identically under either provider
    * (asserted in StreamingSpec, measured in StreamScaleProbe).
    */
  val RocksDbProvider =
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"
  val HdfsProvider =
    "org.apache.spark.sql.execution.streaming.state.HDFSBackedStateStoreProvider"

  def configureStateStore(spark: SparkSession,
                          provider: Option[String] =
                            sys.env.get("SPARK_GRAFT_STATESTORE")): Unit =
    provider.map(_.toLowerCase).foreach {
      case "rocksdb" =>
        spark.conf.set("spark.sql.streaming.stateStore.providerClass", RocksDbProvider)
      case "hdfs" =>
        spark.conf.set("spark.sql.streaming.stateStore.providerClass", HdfsProvider)
      case other => throw new IllegalArgumentException(
        s"unknown state-store provider '$other' — expected rocksdb or hdfs")
    }

  /** Flat events schema as stored: ts = parquet TIMESTAMP(µs,
    * isAdjustedToUTC=false) = Spark TIMESTAMP_NTZ; [[withEnvelope]]
    * converts to the engine-native session-TZ TimestampType immediately
    * (session pinned UTC, so the instant is unchanged).
    *
    * NOTE: streaming requires the µs-generation driver output
    * (2026-08-13+). A file stream source needs its schema fixed up
    * front, so unlike [[graft.Tables.events]] — which branches on the
    * footer type at read time and still loads the legacy
    * TIMESTAMP(NANOS) generation — this schema is pinned to the current
    * generation; pointing a stream at a legacy nanos file fails on a
    * parquet type mismatch by design rather than silently mis-scaling.
    */
  val rawSchema: StructType = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", TimestampNTZType),
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("props", StringType)))

  /** rawSchema with ts as a µs-long — the shape tests synthesize rows in
    * before [[encodeRawTs]] restores the stored NTZ representation.
    */
  val rawUsSchema: StructType = StructType(rawSchema.map(f =>
    if (f.name == "ts") f.copy(dataType = LongType) else f))

  /** Encode a µs-long ts column back to the stored representation
    * (TIMESTAMP_NTZ µs, what the driver's events.parquet carries) so
    * test-staged stream files are indistinguishable from warehouse ones.
    */
  def encodeRawTs(df: DataFrame): DataFrame =
    df.withColumn("ts", timestamp_micros(col("ts")).cast("timestamp_ntz"))

  /** The file stream source lists a DIRECTORY; the warehouse ships
    * events as a single parquet file. Stage it: a per-sf temp dir holding
    * a symlink to the file (the "stream head" the source replays from).
    */
  def stageStreamDir(sfDir: String): String = {
    import java.nio.file.{Files, LinkOption, Paths}
    import scala.jdk.CollectionConverters._
    val dir = Paths.get(sys.props("java.io.tmpdir"), "graft_stream_src",
      graft.sources.GraftShards.stagingKey(sfDir))
    Files.createDirectories(dir)
    val target = Paths.get(sfDir, "events.parquet")
    // the driver ships events as ONE file; amplified warehouses (MakeSf1)
    // ship a DIRECTORY of part files. The file stream source lists files,
    // not subdirs, so stage one symlink per data file either way.
    def listClosing[A](p: java.nio.file.Path)(
        f: Iterator[java.nio.file.Path] => A): A = {
      val s = Files.list(p)
      try f(s.iterator().asScala) finally s.close()
    }
    val targets: Seq[(java.nio.file.Path, String)] =
      if (Files.isDirectory(target))
        listClosing(target)(_
          .filter(p => p.getFileName.toString.endsWith(".parquet"))
          .toSeq).sortBy(_.getFileName.toString).zipWithIndex
          .map { case (p, i) => (p, f"events_part$i%05d.parquet") }
      else Seq((target, "events.parquet"))
    // clear every staged link NOT in the current target set first: a
    // source that shrank (fewer part files) or changed shape
    // (single-file <-> directory) must not leave dangling links (a
    // listing crash) or extra live ones (silent double-streaming)
    val wanted = targets.map(_._2).toSet
    listClosing(dir)(_
      .filter(p => Files.isSymbolicLink(p) &&
        !wanted.contains(p.getFileName.toString))
      .toSeq).foreach(Files.delete(_))
    targets.foreach { case (t, name) =>
      val link = dir.resolve(name)
      // NOFOLLOW: a dangling symlink must be replaced, not trip the create
      if (Files.exists(link, LinkOption.NOFOLLOW_LINKS) &&
          (!Files.isSymbolicLink(link) || Files.readSymbolicLink(link) != t))
        Files.delete(link)
      if (!Files.exists(link, LinkOption.NOFOLLOW_LINKS))
        Files.createSymbolicLink(link, t)
    }
    dir.toString
  }

  /** Streaming scan of the events table (S1 stand-in, T2 replay-from-head)
    * plus the record envelope (S3): sequence_number (the per-shard
    * monotone id) and shard_id (hash-partition of the key, like Kinesis
    * partition-key → shard routing).
    */
  def eventsStream(spark: SparkSession, sfDir: String, nShards: Int = 8): DataFrame =
    eventsStreamFromDir(spark, stageStreamDir(sfDir), nShards)

  /** Same, over an arbitrary staging directory (tests append files to it
    * to simulate new stream arrivals / at-least-once redelivery).
    * maxFilesPerTrigger is a SOURCE option (the reference's BATCH_SIZE
    * fetch cap, consumer.py:255) — it bounds how much input each
    * micro-batch drains.
    */
  /** The envelope projection (S3): native-micros ts, sequence_number, and
    * shard routing — applied identically to the stream reader and to the
    * empty frame [[landedDataSchema]] derives from, so the landed schema
    * can never drift from the write path.
    */
  def withEnvelope(df: DataFrame, nShards: Int = 8): DataFrame =
    df.withColumn("ts", col("ts").cast("timestamp"))
      .withColumn("sequence_number", col("event_id"))
      .withColumn("shard_id", pmod(col("user_id"), lit(nShards)))

  def eventsStreamFromDir(spark: SparkSession, streamDir: String,
                          nShards: Int = 8,
                          maxFilesPerTrigger: Option[Int] = None): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    configureStateStore(spark)
    val reader = spark.readStream.schema(rawSchema)
    maxFilesPerTrigger.foreach(n => reader.option("maxFilesPerTrigger", n))
    withEnvelope(reader.parquet(streamDir), nShards)
  }

  /** The ONE record-dedup discipline (T4 done right — the reference
    * misses dups that straddle batch boundaries; state here covers the
    * full watermark window and expires after it). Shared by every
    * ingest source — file stand-in, DSv2 shards, the configured
    * pipeline — so their dedup semantics can never drift while their
    * outputs are asserted identical against a shared oracle.
    */
  def dedupEventsFrame(df: DataFrame): DataFrame =
    df.withWatermark("ts", "1 hour")
      .dropDuplicatesWithinWatermark("event_id")

  /** The watermarked, record-deduplicated event stream over the file
    * source.
    */
  def dedupedEvents(spark: SparkSession, streamDir: String,
                    maxFilesPerTrigger: Option[Int] = None,
                    nShards: Int = 8): DataFrame =
    dedupEventsFrame(eventsStreamFromDir(spark, streamDir,
      nShards = nShards, maxFilesPerTrigger = maxFilesPerTrigger))

  /** One micro-batch of the landing sink: partitioned JSON under a
    * DETERMINISTIC per-batch directory, written with overwrite. Replaying
    * a batch after a crash between sink write and offset commit (the
    * reference's duplicate window, consumer.py:298-308) overwrites its own
    * previous output instead of appending a duplicate — the idempotent-
    * foreachBatch pattern that upgrades at-least-once to exactly-once.
    * A4: batchId is the monotone counter the reference keeps in
    * leaseCounter (consumer.py:189).
    */
  def landBatch(batch: DataFrame, outDir: String, batchId: Long): Unit = {
    // P4 empty-batch guard (consumer.py:236); the batch is persisted so
    // the guard's probe and the landing write share one computation of
    // the deduped micro-batch instead of executing its plan twice
    batch.persist()
    try {
      if (!batch.isEmpty) {
        Landing.writeLandedJson(
          Landing.bucketedWithLandId(batch, col("ts")),
          s"$outDir/batch=$batchId")
        ()
      }
    } finally batch.unpersist(blocking = false)
  }

  /** The reference's whole pipeline, streaming: dedup → idempotent
    * foreachBatch landing (S4). Offsets commit to checkpointLocation per
    * micro-batch (S5); restart resumes from the last committed batch
    * (S6/T3). Returns after the AvailableNow run drains the source.
    */
  def landStream(spark: SparkSession, sfDir: String, outDir: String,
                 checkpointDir: String): Unit =
    landStreamFromDir(spark, stageStreamDir(sfDir), outDir, checkpointDir)

  def landStreamFromDir(spark: SparkSession, streamDir: String, outDir: String,
                        checkpointDir: String): Unit = {
    val q = dedupedEvents(spark, streamDir)
      .writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        landBatch(batch, outDir, batchId)
      }
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
  }

  /** Oracle-facing form of [[landStream]]: run the full streaming pipeline
    * into fresh temp dirs, then aggregate the landed files per
    * (y,m,d,h) — same contract as the batch q_land_partitioned.
    */
  def streamLandCounts(spark: SparkSession, sfDir: String): DataFrame = {
    val runId = UUID.randomUUID().toString.take(8)
    val tmp = sys.props("java.io.tmpdir")
    val outDir = s"$tmp/graft_stream_land/$runId"
    val ckDir = s"$tmp/graft_stream_ck/$runId"
    landStream(spark, sfDir, outDir, ckDir)
    spark.read.schema(landedDataSchema).json(outDir)
      .groupBy("y", "m", "d", "h")
      .agg(count(lit(1)).as("n_events"))
      .orderBy("y", "m", "d", "h")
  }

  /** The engine event stream read through the [[graft.sources.GraftShards]]
    * DSv2 source instead of the parquet file stand-in — S1 as a real
    * `MicroBatchStream`: per-shard envelope lines → payload parse →
    * exactly the (event_id, ts, user_id, event_type, value, props,
    * sequence_number, shard_id) frame [[withEnvelope]] produces, so every
    * downstream stage (dedup, landing, windows) is byte-identical across
    * the two sources. `batchSize` is the per-shard GetRecords cap
    * (BATCH_SIZE, consumer.py:255) — with AvailableNow the source drains
    * in ceil(maxShardLen/batchSize) micro-batches. `errorOpts` is the P7
    * fault-injection surface (graft.errors.* reader options).
    */
  def shardsEventStream(spark: SparkSession, shardDir: String,
                        batchSize: Option[Int] = None,
                        errorOpts: Map[String, String] = Map.empty)
      : DataFrame = {
    configureStateStore(spark)
    val reader = spark.readStream.format("graft-shards")
      .option("path", shardDir)
      .option("kinesis.startingPosition", "TRIM_HORIZON")
      .options(errorOpts)
    batchSize.foreach(b =>
      reader.option("kinesis.maxFetchRecordsPerShard", b.toLong))
    reader.load()
      .select(
        from_json(col("data").cast("string"),
          graft.sources.GraftShards.payloadSchema).as("p"),
        col("sequenceNumber"), col("shardId"))
      .select(
        col("p.event_id").as("event_id"),
        timestamp_micros(col("p.ts_us")).as("ts"),
        col("p.user_id").as("user_id"),
        col("p.event_type").as("event_type"),
        col("p.value").as("value"),
        col("p.props").as("props"),
        col("sequenceNumber").cast("long").as("sequence_number"),
        substring(col("shardId"), 9, 12).cast("int").as("shard_id"))
  }

  /** [[streamLandCounts]] over the DSv2 source (q_stream_land_dsv2):
    * stage the shard files, run dedup → idempotent landing through the
    * real MicroBatchStream, and aggregate the landed layout — oracle
    * shared VERBATIM with q_stream_land (both sources must land the same
    * events). The 10k per-shard cap drains sf0.01 in one batch and sf0.1
    * in three, so the bench-scale run provably pages through the offset
    * log (the spec's BATCH_SIZE=tiny proof covers the many-batch case).
    */
  def streamLandCountsShards(spark: SparkSession, sfDir: String): DataFrame = {
    val shardDir = graft.sources.GraftShards.stageShardDir(spark, sfDir)
    val runId = UUID.randomUUID().toString.take(8)
    val tmp = sys.props("java.io.tmpdir")
    val outDir = s"$tmp/graft_stream_land_dsv2/$runId"
    val ckDir = s"$tmp/graft_stream_ck_dsv2/$runId"
    val q = dedupEventsFrame(
        shardsEventStream(spark, shardDir, batchSize = Some(10000)))
      .writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        landBatch(batch, outDir, batchId)
      }
      .option("checkpointLocation", ckDir)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    spark.read.schema(landedDataSchema).json(outDir)
      .groupBy("y", "m", "d", "h")
      .agg(count(lit(1)).as("n_events"))
      .orderBy("y", "m", "d", "h")
  }

  /** One micro-batch of the MERGE-shaped LANDING UPSERT: late-corrected
    * events REPLACE their originals in the landed parquet layout, keyed
    * on event_id — the correction path the reference's append-only sink
    * (consumer.py:244 put_object) lacks: once a bad record lands there,
    * it lands forever. MERGE semantics over plain parquet via dynamic
    * partition overwrite: (1) the batch's touched (y,m,d) day partitions
    * are identified — the days its corrections LAND in, plus the days
    * its event_ids currently LIVE in (so a correction whose ts moves an
    * event across days also evicts the stale original from the old day,
    * instead of leaving a duplicate event_id behind), (2) those
    * partitions' surviving rows are the anti-join of the base against
    * the batch's event_ids, (3) survivors + corrections rewrite ONLY the
    * touched partitions (partitionOverwriteMode=dynamic) — untouched
    * days are never written. Idempotent on crash-replay: a replayed
    * batch anti-joins its own previous corrections out and rewrites the
    * same rows (corrections are self-contained), so at-least-once
    * delivery upgrades to exactly-once state.
    *
    * 100 TB shape: the REWRITE cost scales with the corrected days'
    * data, not the table (late corrections cluster in recent days); the
    * anti-join is a hash shuffle of only those partitions on event_id;
    * the day list is broadcast. Locating where the batch's event_ids
    * live is the one table-wide step — a scan pruned to the event_id
    * column plus directory-derived partition values, with the batch's
    * ids broadcast into the semi-join (and a runtime bloom filter
    * eligible to inject); a table format (Delta/Iceberg/Hudi) or a
    * key→partition index would bound it further, which is exactly what
    * those formats exist for — this is the honest cost of MERGE over
    * bare parquet. The localCheckpoint is load-bearing — it
    * materializes the merged rows before the write, because the plan
    * reads the same partitions the write replaces.
    */
  def upsertBatch(batch: DataFrame, baseDir: String): Unit = {
    val spark = batch.sparkSession
    import spark.implicits._
    val bucketed = Landing.withTimeBuckets(batch, col("ts"))
    if (!bucketed.isEmpty) {
      val base = spark.read.parquet(baseDir)
      val ids = bucketed.select("event_id")
      // the touched-day list is the documented broadcast-sized scalar —
      // collected once so it can drive the joins AND the emptied-day
      // cleanup below without recomputing the base-table location scan
      val dayList = bucketed.select("y", "m", "d")
        .union(base.join(broadcast(ids), Seq("event_id"), "left_semi")
          .select("y", "m", "d"))
        .distinct().collect()
        .map(r => (r.getInt(0), r.getInt(1), r.getInt(2)))
      val days = dayList.toSeq.toDF("y", "m", "d")
      val kept = base
        .join(broadcast(days), Seq("y", "m", "d"), "left_semi")
        .join(broadcast(ids), Seq("event_id"), "left_anti")
      val merged = kept.unionByName(bucketed.select(kept.columns.map(col): _*))
        .repartition(col("y"), col("m"), col("d"))
        .localCheckpoint()
      merged.write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("y", "m", "d")
        .parquet(baseDir)
      // dynamic overwrite only rewrites partitions PRESENT in `merged`;
      // a source day left EMPTY by cross-day corrections (every resident
      // event moved to another day) carries no rows, so its stale
      // directory must be dropped explicitly or the old copies survive
      val remaining = merged.select("y", "m", "d").distinct().collect()
        .map(r => (r.getInt(0), r.getInt(1), r.getInt(2))).toSet
      val emptied = dayList.filterNot(remaining)
      if (emptied.nonEmpty) {
        // resolve the filesystem FROM the path, not the default FS: if
        // baseDir is s3a://... while the default is hdfs://, the default
        // FS would silently delete nothing and the stale day survives
        val fs = new org.apache.hadoop.fs.Path(baseDir).getFileSystem(
          spark.sparkContext.hadoopConfiguration)
        emptied.foreach { case (yy, mm, dd) =>
          fs.delete(new org.apache.hadoop.fs.Path(
            s"$baseDir/y=$yy/m=$mm/d=$dd"), true)
        }
      }
    }
  }

  /** Oracle-facing landing-upsert cycle: land the full corpus as the
    * base parquet layout, stream deterministic corrections (every 10th
    * event redelivered with value+1000 and a corrected flag) in
    * event_id-range micro-batches through [[upsertBatch]], then
    * aggregate the post-upsert state per day — counts prove corrections
    * REPLACED their originals (no appends), the corrected sum proves the
    * new values landed.
    */
  def streamLandUpsert(spark: SparkSession, sfDir: String,
                       nBatches: Int = 3): DataFrame = {
    val runId = UUID.randomUUID().toString.take(8)
    val baseDir = s"${sys.props("java.io.tmpdir")}/graft_upsert/$runId/base"
    val ev = graft.Tables.events(spark, sfDir)
      .select(col("event_id"), col("user_id"), col("event_type"), col("ts"),
              col("value"), lit(0).as("corrected"))
    Landing.withTimeBuckets(ev, col("ts"))
      .repartition(col("y"), col("m"), col("d"))
      .write.mode("overwrite").partitionBy("y", "m", "d").parquet(baseDir)
    val corrections = ev.filter(col("event_id") % 10 === 0)
      .withColumn("value", col("value") + lit(1000.0))
      .withColumn("corrected", lit(1))
    val root = stageRanges(corrections, "event_id", nBatches)
    val q = spark.readStream.schema(corrections.schema)
      .option("maxFilesPerTrigger", 1)
      .parquet(s"$root/src")
      .writeStream
      .foreachBatch { (batch: DataFrame, _: Long) =>
        upsertBatch(batch, baseDir)
      }
      .option("checkpointLocation", s"$root/ck")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    spark.read.parquet(baseDir)
      .groupBy("y", "m", "d")
      .agg(count(lit(1)).as("n_events"),
           sum(col("corrected")).cast("long").as("n_corrected"),
           sum(col("value").cast("decimal(18,2)")).cast("double").as("sum_value"))
      .orderBy("y", "m", "d")
  }

  /** Data-file schema of the landed JSON layout (partition cols y/m/d/h
    * and batch are directory-encoded and discovered on read). Derived BY
    * CONSTRUCTION from the same envelope + landing transforms the write
    * path applies to an empty frame — a hand-maintained copy would drift
    * silently (JSON schema-on-read nulls mismatched fields, it never
    * errors).
    */
  lazy val landedDataSchema: StructType = {
    val spark = SparkSession.active
    val empty = spark.createDataFrame(
      new java.util.ArrayList[org.apache.spark.sql.Row](), rawSchema)
    Landing.dataFileSchema(
      Landing.bucketedWithLandId(withEnvelope(empty), col("ts")))
  }

  /** Stream-static join: the event stream joined to a static dimension
    * (user → segment; broadcast-sized, so each micro-batch does a
    * broadcast hash join with no stream-side shuffle), aggregated per
    * segment. The static side is re-resolvable per batch — the pattern
    * for slowly-refreshed dimension tables next to a hot stream.
    */
  def streamSegmentRevenue(spark: SparkSession, sfDir: String): DataFrame = {
    val table = s"graft_stream_seg_${UUID.randomUUID().toString.take(8)}"
    // static dim derived deterministically from the warehouse so the
    // oracle can rebuild it: every user in a segment by id
    val profiles = graft.Tables.events(spark, sfDir)
      .select(col("user_id")).distinct()
      .withColumn("segment", pmod(col("user_id"), lit(5)))
    val q = eventsStream(spark, sfDir)
      .join(broadcast(profiles), "user_id")
      .groupBy("segment")
      .agg(count(lit(1)).as("n_events"),
           sum(col("value").cast("decimal(18,2)")).cast("double").as("sum_value"))
      .writeStream
      .format("memory")
      .queryName(table)
      .outputMode("complete")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    spark.table(table).orderBy("segment")
  }

  /** Streaming tumbling event-time window aggregation (T8) with a
    * watermark (T5): AvailableNow + complete mode into a memory sink,
    * returned as a DataFrame matching the batch tumblingCounts contract.
    */
  def streamTumblingCounts(spark: SparkSession, sfDir: String,
                           hours: Int): DataFrame = {
    val table = s"graft_stream_win_${UUID.randomUUID().toString.take(8)}"
    val q = eventsStream(spark, sfDir)
      .withWatermark("ts", "1 hour")
      .groupBy(window(col("ts"), s"$hours hours").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n_events"),
           sum(col("value").cast("decimal(18,2)")).cast("double").as("sum_value"))
      .writeStream
      .format("memory")
      .queryName(table)
      .outputMode("complete")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    spark.table(table)
      .select(unix_seconds(col("w.start")).as("window_start_s"),
              col("event_type"), col("n_events"), col("sum_value"))
      .orderBy("window_start_s", "event_type")
  }

  /** Streaming SLIDING event-time window aggregation (T8's third window
    * shape, completing the batch/streaming matrix next to tumbling and
    * session): each event lands in width/slide overlapping windows — the
    * state store holds that many panes per (window, type) key, expired
    * together by the watermark. Same output contract as the batch
    * [[graft.operators.Events.slidingCounts]].
    */
  def streamSlidingCounts(spark: SparkSession, sfDir: String,
                          widthHours: Int, slideHours: Int): DataFrame = {
    val table = s"graft_stream_slide_${UUID.randomUUID().toString.take(8)}"
    val q = eventsStream(spark, sfDir)
      .withWatermark("ts", "1 hour")
      .groupBy(window(col("ts"), s"$widthHours hours", s"$slideHours hours").as("w"),
               col("event_type"))
      .agg(count(lit(1)).as("n_events"),
           sum(col("value").cast("decimal(18,2)")).cast("double").as("sum_value"))
      .writeStream
      .format("memory")
      .queryName(table)
      .outputMode("complete")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    spark.table(table)
      .select(unix_seconds(col("w.start")).as("window_start_s"),
              col("event_type"), col("n_events"), col("sum_value"))
      .orderBy("window_start_s", "event_type")
  }

  /** Streaming windowed-DAU, APPROXIMATE form — the streaming twin of
    * the batch [[graft.operators.Events.slidingDistinctUsers]], closing
    * the batch/streaming matrix's last asymmetric cell: Structured
    * Streaming disallows EXACT distinct aggregation (countDistinct
    * state is unbounded per window and not incrementally mergeable),
    * which is why q_sliding_distinct is batch-only BY ENGINE
    * CONSTRAINT. The production answer is the HLL++ sketch:
    * approx_count_distinct is a mergeable aggregate, so each window's
    * state is one sketch (KB, not user-set-sized) updated per
    * micro-batch. Output mode: this harness run is BOUNDED
    * (AvailableNow over a finite file stream), so the query uses
    * `complete` mode — the final watermark never passes the trailing
    * windows, and complete mode is what makes them emit; under complete
    * the watermark does NOT evict window state (all windows stay live in
    * the store, and a memory-sink complete table grows with the window
    * count). On an UNBOUNDED production stream the same query runs in
    * `update`/`append` mode, where the declared 1-hour watermark
    * genuinely expires each window's sketch once the watermark passes
    * its end — per-window state is a KB sketch either way; the mode only
    * decides whether closed windows are retained or evicted.
    * rsd=0.02 bounds the relative error; sketch internals are not
    * oracle-reproducible, so this estimate-only form is the PRODUCTION
    * operator Bench times (SparkEntry.benchForms), while
    * q_stream_sliding_distinct declares [[streamSlidingDistinctAudit]]
    * — the bounded-pass form whose in_bound flag the DuckDB oracle
    * asserts (same design as q_approx_distinct); the rsd-bound
    * scalatest certifies it besides. n_events rides along exactly —
    * the count agg is unaffected by the sketch.
    */
  def streamSlidingDistinct(spark: SparkSession, sfDir: String,
                            widthHours: Int, slideHours: Int,
                            rsd: Double = 0.02): DataFrame = {
    val table = s"graft_stream_sdist_${UUID.randomUUID().toString.take(8)}"
    val q = eventsStream(spark, sfDir)
      .withWatermark("ts", "1 hour")
      .groupBy(window(col("ts"), s"$widthHours hours", s"$slideHours hours").as("w"))
      .agg(approx_count_distinct(col("user_id"), rsd).as("n_users_approx"),
           count(lit(1)).as("n_events"))
      .writeStream
      .format("memory")
      .queryName(table)
      .outputMode("complete")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    spark.table(table)
      .select(unix_seconds(col("w.start")).as("window_start_s"),
              col("n_users_approx"), col("n_events"))
      .orderBy("window_start_s")
  }

  /** BOUNDED-PASS oracle form of [[streamSlidingDistinct]]
    * (q_stream_sliding_distinct): the streamed HLL++ estimate is
    * engine-specific, so the oracled output carries the EXACT per-window
    * distinct count (the batch [[graft.operators.Events
    * .slidingDistinctUsers]] twin over the same corpus) plus `in_bound`
    * — whether the streamed estimate landed within the documented 5·rsd
    * band. The DuckDB oracle asserts in_bound = 1 on every window, so
    * the sketch's error bound is enforced by the hash gate itself. The
    * exact twin is the audit's cost (a batch countDistinct per window),
    * paid only here — production reads the estimate-only stream.
    */
  def streamSlidingDistinctAudit(spark: SparkSession, sfDir: String,
                                 widthHours: Int, slideHours: Int,
                                 rsd: Double = 0.02): DataFrame = {
    val approx = streamSlidingDistinct(spark, sfDir, widthHours, slideHours, rsd)
    val exact = graft.operators.Events.slidingDistinctUsers(
      graft.Tables.events(spark, sfDir), widthHours, slideHours)
    approx.select(col("window_start_s"), col("n_users_approx"))
      .join(exact, Seq("window_start_s"))
      .select(col("window_start_s"), col("n_users"), col("n_events"),
        (abs(col("n_users_approx") - col("n_users")).cast("double") <=
          lit(5 * rsd) * col("n_users").cast("double"))
          .cast("long").as("in_bound"))
      .orderBy("window_start_s")
  }

  /** STREAM-STREAM interval join (the last big Structured Streaming
    * operator class next to windowed aggs and custom state): purchases
    * joined to the same user's views from the preceding hour, both sides
    * unbounded streams. The time-range predicate plus both watermarks is
    * what makes this runnable: Spark derives how long a view must be
    * buffered before no future purchase can match it (view watermark +
    * join range) and evicts join state past that bound — without the
    * range condition the state store would have to keep both streams
    * forever. Append mode: each matched pair is emitted exactly once.
    */
  def streamIntervalJoin(spark: SparkSession, sfDir: String): DataFrame = {
    val table = s"graft_stream_ssj_${UUID.randomUUID().toString.take(8)}"
    val purchases = eventsStream(spark, sfDir)
      .filter(col("event_type") === "purchase")
      .select(col("event_id").as("p_id"), col("user_id").as("p_user"),
              col("ts").as("p_ts"))
      .withWatermark("p_ts", "1 hour")
    val views = eventsStream(spark, sfDir)
      .filter(col("event_type") === "view")
      .select(col("event_id").as("v_id"), col("user_id").as("v_user"),
              col("ts").as("v_ts"))
      .withWatermark("v_ts", "2 hours")
    val q = purchases.join(views,
        expr("p_user = v_user AND v_ts >= p_ts - interval 1 hour AND v_ts <= p_ts"))
      .writeStream
      .format("memory")
      .queryName(table)
      .outputMode("append")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    spark.table(table)
      .select(col("p_id"), col("v_id"),
              (unix_micros(col("p_ts")) - unix_micros(col("v_ts"))).as("lag_us"))
      .orderBy("p_id", "v_id")
  }

  /** Stream-stream LEFT OUTER interval join: every purchase emits exactly
    * once — paired with each same-user view from the preceding hour, or
    * alone (v_id = −1) once the watermark PROVES no such view can still
    * arrive. The subtlety outer stream joins add over inner
    * ([[streamIntervalJoin]]): an unmatched row can only be emitted when
    * its join state expires, and state expiry is driven by the GLOBAL
    * watermark (the min across both sources) — at the end of a finite
    * replay the watermark stops advancing and rows buffered near the end
    * would wait forever. The production answer is staged here
    * deterministically: far-future sentinel rows on BOTH sides (two
    * files, +30d and +60d, each its own micro-batch) push both source
    * watermarks past every real event, and the second sentinel batch
    * flushes the state the first one unlocked. Sentinels carry user −1
    * (joinable only to each other) and are filtered from the drained
    * output, so the result equals the batch left join — which is the
    * oracle. `joinType = "fullOuter"` additionally emits each view no
    * purchase followed within the hour (p_id = −1), state-expired by the
    * same watermark machinery — the batch full join twin.
    *
    * IMPORTANT — replay flush vs production semantics: the sentinels are
    * FINITE-REPLAY flush machinery only, not part of the operator. On a
    * live unbounded stream the watermark advances on its own as new
    * events arrive, unmatched rows expire and emit continuously, and no
    * sentinel staging is needed (or wanted) — deploy the bare
    * join+watermark pipeline exactly as built here, minus
    * [[stageOuterJoinDir]]. Outer-join state stays bounded either way:
    * the EXPLAINS state-boundedness probe measures outer state equal to
    * the inner twin's.
    */
  /** Staged (events + two sentinel batches) dir per sfDir — the content
    * is a pure function of the input table, so one staging serves every
    * outer-join variant and every bench rep in the JVM.
    */
  private val ssjoStaged =
    new java.util.concurrent.ConcurrentHashMap[String, String]()

  /** One per-JVM parent for the staged outer-join dirs, removed at exit —
    * same discipline as Events.zorderRoot / Warehouse.bucketedRoot, so
    * repeated verify/bench runs never leak staged event copies.
    */
  private lazy val ssjoRoot: String = {
    val dir = new java.io.File(
      s"${sys.props("java.io.tmpdir")}/graft_ssjo/" +
        UUID.randomUUID().toString)
    Runtime.getRuntime.addShutdownHook(new Thread(() =>
      try org.apache.commons.io.FileUtils.deleteDirectory(dir)
      catch { case scala.util.control.NonFatal(_) => () }))
    dir.toString
  }

  private def stageOuterJoinDir(spark: SparkSession, sfDir: String): String =
    ssjoStaged.computeIfAbsent(sfDir, { _ =>
      import java.nio.file.{Files, Paths}
      val runId = UUID.randomUUID().toString.take(8)
      val root = s"$ssjoRoot/$runId"
      Files.createDirectories(Paths.get(root))
      val raw = spark.read.parquet(s"$sfDir/events.parquet")
      def stageFile(df: DataFrame, name: String, mtime: Long): Unit = {
        val stagedir = s"$root/stage_$name"
        df.coalesce(1).write.parquet(stagedir)
        val listing = Files.list(Paths.get(stagedir))
        val part =
          try listing.toArray.map(_.toString).find(_.endsWith(".parquet")).get
          finally listing.close()
        val target = Paths.get(s"$root/$name.parquet")
        Files.move(Paths.get(part), target)
        org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(stagedir))
        Files.setLastModifiedTime(target,
          java.nio.file.attribute.FileTime.fromMillis(mtime))
      }
      def sentinels(days: Int): DataFrame = raw.agg(max(col("ts")).as("m"))
        .select(explode(array(lit("view"), lit("purchase"))).as("event_type"),
                expr(s"timestampadd(DAY, $days, m)").as("ts"))
        .select(lit(-1L).as("event_id"), col("ts"), lit(-1L).as("user_id"),
                col("event_type"), lit(0.0).as("value"), lit("{}").as("props"))
      stageFile(raw, "range0", 1000000000000L)
      stageFile(sentinels(30), "range1", 1000000060000L)
      stageFile(sentinels(60), "range2", 1000000120000L)
      root
    })

  def streamIntervalJoinOuter(spark: SparkSession, sfDir: String,
                              joinType: String = "leftOuter"): DataFrame = {
    val table = s"graft_stream_ssjo_${UUID.randomUUID().toString.take(8)}"
    val root = stageOuterJoinDir(spark, sfDir)

    val purchases = eventsStreamFromDir(spark, root, maxFilesPerTrigger = Some(1))
      .filter(col("event_type") === "purchase")
      .select(col("event_id").as("p_id"), col("user_id").as("p_user"),
              col("ts").as("p_ts"))
      .withWatermark("p_ts", "1 hour")
    val views = eventsStreamFromDir(spark, root, maxFilesPerTrigger = Some(1))
      .filter(col("event_type") === "view")
      .select(col("event_id").as("v_id"), col("user_id").as("v_user"),
              col("ts").as("v_ts"))
      .withWatermark("v_ts", "2 hours")
    val q = purchases.join(views,
        expr("p_user = v_user AND v_ts >= p_ts - interval 1 hour AND v_ts <= p_ts"),
        joinType)
      .writeStream
      .format("memory")
      .queryName(table)
      .outputMode("append")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    // sentinels (user −1 on either side) out; unmatched sides surface as
    // −1 ids. fullOuter adds the view-only rows leftOuter suppresses.
    spark.table(table)
      .filter(coalesce(col("p_user"), lit(0L)) >= 0L &&
              coalesce(col("v_user"), lit(0L)) >= 0L)
      .select(coalesce(col("p_id"), lit(-1L)).as("p_id"),
              coalesce(col("v_id"), lit(-1L)).as("v_id"),
              coalesce(unix_micros(col("p_ts")) - unix_micros(col("v_ts")),
                lit(-1L)).as("lag_us"))
      .orderBy("p_id", "v_id")
  }

  /** Per-user state carried by the custom-state API. Money is carried as
    * exact integer cents (derived via the same decimal(18,2) cast the
    * whole suite uses) so state merges are order-independent.
    */
  case class UserEvent(user_id: Long, us: Long, cents: Long)
  case class UserState(n_events: Long, sum_cents: Long, last_us: Long)
  case class UserSummary(user_id: Long, n_events: Long, sum_cents: Long, last_us: Long)

  /** Custom keyed state via mapGroupsWithState (the
    * KeyValueGroupedDataset state API — the general form of the
    * reference's per-shard leaseCounter state, consumer.py:189, but keyed
    * by user): per user, a running event count, an exact value sum (kept
    * in integer cents so merge order cannot perturb it), and the last
    * event time. State lives in the state store under the checkpoint and
    * survives restarts like any other stateful operator.
    */
  def streamUserState(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    import org.apache.spark.sql.{Encoder, Encoders}
    implicit val ueEnc: Encoder[UserEvent] = Encoders.product[UserEvent]
    implicit val usEnc: Encoder[UserState] = Encoders.product[UserState]
    implicit val outEnc: Encoder[UserSummary] = Encoders.product[UserSummary]
    implicit val keyEnc: Encoder[Long] = Encoders.scalaLong

    val table = s"graft_stream_state_${UUID.randomUUID().toString.take(8)}"
    val events = eventsStream(spark, sfDir)
      .select(col("user_id"), unix_micros(col("ts")).as("us"),
        (col("value").cast("decimal(18,2)") * 100).cast("long").as("cents"))
      .as[UserEvent](ueEnc)

    def update(user: Long, rows: Iterator[UserEvent],
               state: GroupState[UserState]): UserSummary = {
      var s = state.getOption.getOrElse(UserState(0L, 0L, Long.MinValue))
      rows.foreach { e =>
        s = UserState(s.n_events + 1, s.sum_cents + e.cents,
          math.max(s.last_us, e.us))
      }
      state.update(s)
      UserSummary(user, s.n_events, s.sum_cents, s.last_us)
    }

    val q = events
      .groupByKey(_.user_id)(keyEnc)
      .mapGroupsWithState[UserState, UserSummary](GroupStateTimeout.NoTimeout())(update)
      .writeStream
      .format("memory")
      .queryName(table)
      .outputMode(OutputMode.Update())
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    // Update-mode memory sink appends one row per key per batch; the final
    // state per user is the row from the LAST batch that touched the key.
    val t = spark.table(table)
    t.groupBy("user_id")
      .agg(max(struct(col("n_events"), col("sum_cents"), col("last_us"))).as("s"))
      .select(col("user_id"), col("s.n_events"), col("s.sum_cents"), col("s.last_us"))
      .orderBy("user_id")
  }

  case class TypedEvent(user_id: Long, event_type: String)
  case class TypeCounts(counts: Map[String, Long])
  case class TypeCount(user_id: Long, event_type: String, n_events: Long)

  /** flatMapGroupsWithState — the multi-row-emission form of the custom
    * state API: per user the state is a per-event-type counter map, and
    * each batch emits the updated (user, type, count) rows. Counters are
    * monotone, so the final state per (user, type) is the max across
    * update-mode emissions.
    */
  def streamTypeCounts(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    import org.apache.spark.sql.{Encoder, Encoders}
    implicit val inEnc: Encoder[TypedEvent] = Encoders.product[TypedEvent]
    implicit val stEnc: Encoder[TypeCounts] = Encoders.product[TypeCounts]
    implicit val outEnc: Encoder[TypeCount] = Encoders.product[TypeCount]
    implicit val keyEnc: Encoder[Long] = Encoders.scalaLong

    val table = s"graft_stream_flat_${UUID.randomUUID().toString.take(8)}"
    val events = eventsStream(spark, sfDir)
      .select(col("user_id"), col("event_type"))
      .as[TypedEvent](inEnc)

    def update(user: Long, rows: Iterator[TypedEvent],
               state: GroupState[TypeCounts]): Iterator[TypeCount] = {
      var counts = state.getOption.map(_.counts).getOrElse(Map.empty[String, Long])
      var touched = Set.empty[String]
      rows.foreach { e =>
        counts = counts.updated(e.event_type, counts.getOrElse(e.event_type, 0L) + 1)
        touched += e.event_type
      }
      state.update(TypeCounts(counts))
      touched.iterator.map(t => TypeCount(user, t, counts(t)))
    }

    val q = events
      .groupByKey(_.user_id)(keyEnc)
      .flatMapGroupsWithState[TypeCounts, TypeCount](
        OutputMode.Update(), GroupStateTimeout.NoTimeout())(update)
      .writeStream
      .format("memory")
      .queryName(table)
      .outputMode(OutputMode.Update())
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    spark.table(table)
      .groupBy("user_id", "event_type")
      .agg(max(col("n_events")).as("n_events"))
      .orderBy("user_id", "event_type")
  }

  /** Document stream schema for [[streamHistDedup]] (the staged files
    * carry only the columns fingerprinting needs).
    */
  val docSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("text", StringType)))

  /** One micro-batch of STREAMING DEDUP AGAINST A HISTORICAL STORE: the
    * batch's document fingerprints anti-join the accumulated fingerprint
    * store (stream-static, re-resolved per batch so earlier batches'
    * writes are visible), within-batch ties keep the lowest doc_id, and
    * the survivors' fingerprints are appended to the store — the
    * incremental-crawl dedup the reference's cross-batch gap
    * (consumer.py:301-303) points at: its dup check only ever saw ONE
    * previous batch; this store remembers all of them, across restarts.
    *
    * Idempotent on replay: both writes overwrite a deterministic
    * batch=N directory, and the store read excludes the batch's OWN
    * generation (batch < batchId), so a crash-replayed batch rebuilds
    * its output instead of anti-joining against its own fingerprints
    * and emitting nothing.
    *
    * 100 TB shape: the anti-join is a hash shuffle on the fingerprint
    * key (store side is fingerprint-only — one skinny string column,
    * never documents); null fingerprints (< n tokens) bypass the join
    * entirely, so the degenerate hot key never shuffles.
    */
  /** Accumulated-store read for the incremental dedup sinks: all
    * generations STRICTLY BEFORE `batchId` (a crash-replayed batch must
    * not anti-join against its own previous write), or an empty frame on
    * the first batch.
    */
  private def storeBefore(spark: SparkSession, storeDir: String,
                          batchId: Long, schema: StructType): DataFrame = {
    val p = java.nio.file.Paths.get(storeDir)
    val hasData = java.nio.file.Files.isDirectory(p) && {
      val listing = java.nio.file.Files.list(p)
      try listing.anyMatch(_.getFileName.toString.startsWith("batch="))
      finally listing.close()
    }
    if (hasData)
      spark.read.parquet(storeDir).filter(col("batch") < batchId)
        .select(schema.fieldNames.map(col): _*)
    else spark.createDataFrame(
      new java.util.ArrayList[org.apache.spark.sql.Row](), schema)
  }

  def histDedupBatch(batch: DataFrame, batchId: Long, storeDir: String,
                     outDir: String): Unit = {
    val spark = batch.sparkSession
    val fps = graft.operators.TextAnalysis.fingerprintsUnordered(batch)
      .select("doc_id", "fingerprint").persist()
    try {
      val store = storeBefore(spark, storeDir, batchId,
        StructType(Seq(StructField("fingerprint", StringType))))
      val winners = fps.filter(col("fingerprint").isNotNull)
        .join(store, Seq("fingerprint"), "left_anti")
        .groupBy("fingerprint").agg(min(col("doc_id")).as("doc_id"))
        .persist()
      try {
        winners.select("doc_id", "fingerprint")
          .unionByName(fps.filter(col("fingerprint").isNull)
            .select("doc_id", "fingerprint"))
          .write.mode("overwrite").parquet(s"$outDir/batch=$batchId")
        winners.select("fingerprint")
          .write.mode("overwrite").parquet(s"$storeDir/batch=$batchId")
      } finally winners.unpersist(blocking = false)
    } finally fps.unpersist(blocking = false)
  }

  /** The shared micro-batch runner for the document-stream sinks: one
    * staged file per trigger, AvailableNow drain, checkpointed offsets —
    * the incremental dedup/quarantine sinks differ only in their
    * per-batch function.
    */
  private def runDocBatches(spark: SparkSession, srcDir: String,
                            ckDir: String)(
                            f: (DataFrame, Long) => Unit): Unit =
    runStagedBatches(spark, docSchema, srcDir, ckDir)(f)

  /** Schema-general form of the staged micro-batch runner (the document
    * sinks read docSchema; [[streamSq8]] reads the embeddings schema).
    */
  private def runStagedBatches(spark: SparkSession, schema: StructType,
                               srcDir: String, ckDir: String)(
                               f: (DataFrame, Long) => Unit): Unit = {
    configureStateStore(spark)
    val q = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1) // one staged file per micro-batch
      .parquet(srcDir)
      .writeStream
      .foreachBatch(f)
      .option("checkpointLocation", ckDir)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
  }

  /** STREAMING CHUNKING: documents arrive in micro-batches and are
    * chunked statelessly at ingest — the stream side of the RAG-prep
    * stage (chunk as you crawl, embed downstream). Chunks are doc-local,
    * so no cross-batch state exists; each micro-batch writes its chunks
    * to an idempotent batch=N overwrite, and the drained union is
    * bit-identical to the batch chunker — q_stream_chunks shares
    * q_chunk_overlap's oracle, the same device as the q_cms pair.
    *
    * 100 TB shape: identical to the batch chunker (pure map stage per
    * batch); the only added cost is the sink's append discipline.
    */
  def streamChunks(spark: SparkSession, sfDir: String, nBatches: Int = 3,
                   size: Int = 64, stride: Int = 48): DataFrame = {
    val root = stageDocRanges(spark, sfDir, nBatches)
    runDocBatches(spark, s"$root/src", s"$root/ck") { (batch, batchId) =>
      graft.operators.TextAnalysis.chunkDocumentsUnordered(batch, size, stride)
        .write.mode("overwrite").parquet(s"$root/out/batch=$batchId")
      ()
    }
    val chunkSchema = StructType(Seq(StructField("doc_id", LongType),
      StructField("chunk_id", LongType), StructField("start_tok", LongType),
      StructField("n_tok", LongType), StructField("chunk_hash", StringType)))
    spark.read.schema(chunkSchema).parquet(s"$root/out")
      .select("doc_id", "chunk_id", "start_tok", "n_tok", "chunk_hash")
      .orderBy("doc_id", "chunk_id")
  }

  /** The historical-dedup stream over an arbitrary staged directory
    * (tests append files across runs; the store and checkpoint persist,
    * so a duplicate arriving in a LATER RUN is still dropped).
    */
  def histDedupStreamFromDir(spark: SparkSession, srcDir: String,
                             outDir: String, storeDir: String,
                             ckDir: String): Unit =
    runDocBatches(spark, srcDir, ckDir) { (batch, batchId) =>
      histDedupBatch(batch, batchId, storeDir, outDir)
    }

  /** Stage the documents table as `nBatches` contiguous doc_id ranges,
    * one parquet file each with strictly increasing mtimes, so the file
    * source replays them in range order one micro-batch apiece
    * (maxFilesPerTrigger=1). Returns the fresh run root; the staged
    * source lives under `<root>/src`.
    */
  def stageDocRanges(spark: SparkSession, sfDir: String,
                     nBatches: Int): String =
    stageRanges(graft.Tables.documents(spark, sfDir).select("doc_id", "text"),
      "doc_id", nBatches)

  /** Generic form: stage ANY keyed table as contiguous id ranges. */
  def stageRanges(df: DataFrame, idCol: String, nBatches: Int): String = {
    import java.nio.file.{Files, Paths}
    val runId = UUID.randomUUID().toString.take(8)
    val parent = s"${sys.props("java.io.tmpdir")}/graft_docstream"
    // hygiene: every run leaves its staging root behind (the caller's
    // frame serves lazily FROM the artifacts, so the run itself can
    // never delete it) — on a long-lived host these accumulate without
    // bound (measured: 1063 roots / 8.5 GB after 17 bench+verify
    // rounds). Sweep siblings older than 2 h at stage time: far beyond
    // any single bench/verify run's lifetime, so concurrent processes
    // are never touched.
    val cutoff = System.currentTimeMillis() - 2L * 3600 * 1000
    val p = Paths.get(parent)
    if (Files.isDirectory(p)) {
      val listing = Files.list(p)
      try listing.toArray.map(_.asInstanceOf[java.nio.file.Path]).foreach { d =>
        if (Files.getLastModifiedTime(d).toMillis < cutoff)
          try org.apache.commons.io.FileUtils.deleteDirectory(d.toFile)
          catch { case scala.util.control.NonFatal(_) => () }
      } finally listing.close()
    }
    val root = s"$parent/$runId"
    val srcDir = s"$root/src"
    Files.createDirectories(Paths.get(srcDir))
    val bounds = df.agg(min(col(idCol)), max(col(idCol))).head()
    val (lo, hi) = (bounds.getLong(0), bounds.getLong(1))
    val span = (hi - lo + nBatches) / nBatches // ceil so ranges cover hi
    (0 until nBatches).foreach { i =>
      val stagedir = s"$srcDir/stage$i"
      df.filter(col(idCol) >= lo + i * span &&
                col(idCol) < lo + (i + 1) * span)
        .coalesce(1).write.parquet(stagedir)
      val listing = Files.list(Paths.get(stagedir))
      val part =
        try listing.toArray.map(_.toString).find(_.endsWith(".parquet")).get
        finally listing.close()
      val target = Paths.get(s"$srcDir/range$i.parquet")
      Files.move(Paths.get(part), target)
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(stagedir))
      // strictly increasing mtimes pin the source's replay order
      Files.setLastModifiedTime(target,
        java.nio.file.attribute.FileTime.fromMillis(1000000000000L + i * 60000L))
    }
    root
  }

  /** Stage one more micro-batch AFTER a [[stageRanges]] run: written as
    * `range<idx>.parquet` with the next mtime in the sequence, so the
    * file source replays it LAST — the staging device every
    * re-delivery / revision scenario shares.
    */
  private def stageLateBatch(df: DataFrame, root: String, idx: Int): Unit = {
    import java.nio.file.{Files, Paths}
    val stagedir = s"$root/latestage"
    df.coalesce(1).write.parquet(stagedir)
    val listing = Files.list(Paths.get(stagedir))
    val part =
      try listing.toArray.map(_.toString).find(_.endsWith(".parquet")).get
      finally listing.close()
    val target = Paths.get(s"$root/src/range$idx.parquet")
    Files.move(Paths.get(part), target)
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(stagedir))
    Files.setLastModifiedTime(target,
      java.nio.file.attribute.FileTime.fromMillis(
        1000000000000L + idx * 60000L))
  }

  /** Oracle-facing form: stage the documents table as contiguous
    * doc_id-range batches (range order ⇒ the global survivor set is the
    * min-doc_id-per-fingerprint the batch oracle computes), run the
    * historical-dedup stream, read back the landed survivors.
    */
  def streamHistDedup(spark: SparkSession, sfDir: String,
                      nBatches: Int = 3): DataFrame = {
    val root = stageDocRanges(spark, sfDir, nBatches)
    histDedupStreamFromDir(spark, s"$root/src", s"$root/out",
      s"$root/store", s"$root/ck")
    spark.read.parquet(s"$root/out").select("doc_id", "fingerprint")
      .orderBy("doc_id")
  }

  /** One micro-batch of STREAMING NEAR-DUP dedup vs a historical simhash
    * store — the incremental-crawl form: a new document is dropped when
    * it is within hamming distance 3 of ANY document from an earlier
    * batch (4×15-bit pigeonhole banding makes the check exact, never
    * all-pairs). The store indexes every seen document's banded
    * fingerprint — crawl-index semantics: earlier batches are "the
    * corpus", survivors or not — while INTRA-batch near-dups are left to
    * the batch near-dup pass (q_neardup_simhash composes before this at
    * ingest time), keeping the two concerns — batch dedup, incremental
    * dedup — separately testable, as real pipelines split them.
    *
    * 100 TB shape: the join is a hash shuffle on the (band, band_key)
    * cell; the store ships 4 skinny (2 longs + 2 ints) rows per seen doc,
    * never text; same idempotent batch=N overwrite discipline as
    * [[histDedupBatch]].
    */
  def nearDedupBatch(batch: DataFrame, batchId: Long, storeDir: String,
                     outDir: String): Unit = {
    val spark = batch.sparkSession
    val sh = graft.operators.NearDup.simhashUnordered(batch)
      .select("doc_id", "simhash").persist()
    try {
      val banded = sh.select(col("doc_id"), col("simhash"),
        posexplode(array((0 until 4).map(b =>
          shiftright(col("simhash"), b * 15) % lit(1L << 15)): _*))
          .as(Seq("band", "band_key")))
      val store = storeBefore(spark, storeDir, batchId, StructType(Seq(
        StructField("doc_id", LongType), StructField("simhash", LongType),
        StructField("band", IntegerType), StructField("band_key", LongType))))
      val hits = banded.as("n").join(store.as("o"),
          col("n.band") === col("o.band") && col("n.band_key") === col("o.band_key"))
        .filter(bit_count(col("n.simhash").bitwiseXOR(col("o.simhash"))) <= 3)
        .select(col("n.doc_id")).distinct()
      sh.join(hits, Seq("doc_id"), "left_anti")
        .write.mode("overwrite").parquet(s"$outDir/batch=$batchId")
      banded.write.mode("overwrite").parquet(s"$storeDir/batch=$batchId")
    } finally sh.unpersist(blocking = false)
  }

  /** Oracle-facing form: contiguous doc_id-range batches (same staging as
    * [[streamHistDedup]]), so "earlier batch" is derivable from doc_id in
    * the SQL oracle.
    */
  def streamNearDedup(spark: SparkSession, sfDir: String,
                      nBatches: Int = 3): DataFrame = {
    val root = stageDocRanges(spark, sfDir, nBatches)
    runDocBatches(spark, s"$root/src", s"$root/ck") { (batch, batchId) =>
      nearDedupBatch(batch, batchId, s"$root/store", s"$root/out")
    }
    spark.read.parquet(s"$root/out").select("doc_id", "simhash")
      .orderBy("doc_id")
  }

  /** STREAMING ENTITY RESOLUTION: catalog records arrive in micro-batches
    * and are incrementally linked against everything seen so far — the
    * crawl-time record-linkage form of
    * [[graft.operators.EntityResolution]], including ENTITY MERGE: a new
    * record that bridges two previously-separate entities collapses them
    * (the case per-record incremental matchers cannot express).
    *
    * Per micro-batch, three idempotent writes (batch=N / gen=N overwrite
    * discipline, crash-replay safe):
    *
    *  1. the record ENVELOPE (key, signature key, brand, type) appends —
    *     records are touched exactly once, at ingest;
    *  2. the SIGNATURE STORE merges: previous generation ∪ the batch's
    *     signatures, re-grouped by (toks, brand, type) with min sig_id —
    *     min is associative, so the merged store after batch N equals the
    *     batch computation over all records so far;
    *  3. the ENTITY MAP re-resolves the merged signature store through
    *     the SAME [[graft.operators.EntityResolution.resolveSigs]] core
    *     the batch operator runs. Re-resolving signatures (not records)
    *     every batch is the honest scalable shape: the signature table is
    *     the part of the data that SATURATES (bounded by the attribute
    *     combination space — measured flat across a 10× record decade,
    *     EXPLAINS r17) while records grow without bound, and it is
    *     exactly what makes merges exact instead of approximated.
    *
    * The drained result (envelope ⋈ final entity map) is therefore
    * bit-identical to the batch operator on the full catalog —
    * q_stream_entity shares q_entity_resolve's resolution chain oracle
    * (the q_stream_scd2 verbatim-share device), minus the block_key
    * column (ingest envelopes don't carry blocking internals).
    */
  def streamEntityResolve(spark: SparkSession, sfDir: String,
                          nBatches: Int = 3): DataFrame = {
    import graft.operators.EntityResolution
    val root = stageRanges(
      graft.Tables.part(spark, sfDir)
        .select("p_partkey", "p_name", "p_brand", "p_type"),
      "p_partkey", nBatches)
    val partSchema = StructType(Seq(
      StructField("p_partkey", LongType), StructField("p_name", StringType),
      StructField("p_brand", StringType), StructField("p_type", StringType)))
    val sigSchema = StructType(Seq(
      StructField("toks", ArrayType(StringType)),
      StructField("p_brand", StringType), StructField("p_type", StringType),
      StructField("sig_id", LongType)))
    runStagedBatches(spark, partSchema, s"$root/src", s"$root/ck") {
      (batch, batchId) =>
        val based = EntityResolution.withSignature(batch)
        based.select("p_partkey", "skey", "p_brand", "p_type")
          .write.mode("overwrite").parquet(s"$root/rec/batch=$batchId")
        val prev =
          if (batchId == 0)
            spark.createDataFrame(
              new java.util.ArrayList[org.apache.spark.sql.Row](), sigSchema)
          else spark.read.schema(sigSchema)
            .parquet(s"$root/sig/gen=${batchId - 1}")
        val merged = EntityResolution.sigsOf(
          prev.unionByName(
            EntityResolution.sigsOf(based)
              .select("toks", "p_brand", "p_type", "sig_id")),
          keyCol = "sig_id")
        merged.select("toks", "p_brand", "p_type", "sig_id")
          .write.mode("overwrite").parquet(s"$root/sig/gen=$batchId")
        val sigStore = spark.read.schema(sigSchema)
          .parquet(s"$root/sig/gen=$batchId")
          .withColumn("skey", array_join(col("toks"), " "))
          .withColumn("m", size(col("toks")))
        EntityResolution.resolveSigs(sigStore, 0.8, sigStore)
          .select("skey", "p_brand", "p_type", "entity_id")
          .write.mode("overwrite").parquet(s"$root/ent/gen=$batchId")
        ()
    }
    val recSchema = StructType(Seq(
      StructField("p_partkey", LongType), StructField("skey", StringType),
      StructField("p_brand", StringType), StructField("p_type", StringType)))
    val entSchema = StructType(Seq(
      StructField("skey", StringType), StructField("p_brand", StringType),
      StructField("p_type", StringType), StructField("entity_id", LongType)))
    spark.read.schema(recSchema).parquet(s"$root/rec")
      .join(spark.read.schema(entSchema).parquet(s"$root/ent/gen=${nBatches - 1}"),
        Seq("skey", "p_brand", "p_type"))
      .select("p_partkey", "entity_id")
      .orderBy("p_partkey")
  }

  /** STREAMING QUARANTINE (dead-letter queue): each micro-batch splits
    * into parseable and malformed payloads — good rows land, bad rows go
    * to a quarantine sink with the raw payload preserved for forensics —
    * so one poison record costs one row, never the stream (the
    * route-don't-die discipline the reference's defensive record loop
    * implies, upgraded from skip to quarantine-with-evidence).
    * Corruption is injected in-plan (every 7th event; the testdata is
    * read-only) exactly as in the batch q_quarantine. Both sinks use the
    * idempotent batch=N overwrite.
    */
  def streamQuarantine(spark: SparkSession, sfDir: String): DataFrame = {
    import graft.operators.Events
    val runId = UUID.randomUUID().toString.take(8)
    val tmp = sys.props("java.io.tmpdir")
    val goodDir = s"$tmp/graft_quarantine/$runId/good"
    val badDir = s"$tmp/graft_quarantine/$runId/bad"
    val ckDir = s"$tmp/graft_quarantine/$runId/ck"
    configureStateStore(spark)
    val q = eventsStream(spark, sfDir)
      .withColumn("raw",
        when(pmod(col("event_id"), lit(7)) === 0,
          regexp_replace(col("props"), "\\{", "<")).otherwise(col("props")))
      .withColumn("parsed", from_json(col("raw"), Events.propsSchema))
      .writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        batch.persist()
        try {
          // PERMISSIVE from_json: malformed input -> all-null FIELDS
          // struct; the mandatory field is the parse-success test
          batch.filter(col("parsed.k").isNotNull)
            .select("event_id", "event_type", "parsed.k")
            .write.mode("overwrite").parquet(s"$goodDir/batch=$batchId")
          batch.filter(col("parsed.k").isNull)
            .select(col("event_id"), col("event_type"),
                    col("raw").as("payload"))
            .write.mode("overwrite").parquet(s"$badDir/batch=$batchId")
          ()
        } finally batch.unpersist(blocking = false)
      }
      .option("checkpointLocation", ckDir)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    // explicit read-back schemas: a batch with zero rows on one side
    // writes no part files, and schema inference would fail there
    val goodSchema = StructType(Seq(StructField("event_id", LongType),
      StructField("event_type", StringType), StructField("k", LongType)))
    val badSchema = StructType(Seq(StructField("event_id", LongType),
      StructField("event_type", StringType), StructField("payload", StringType)))
    val good = spark.read.schema(goodSchema).parquet(goodDir)
      .groupBy("event_type")
      .agg(count(lit(1)).as("n_parsed"), sum(col("k")).as("sum_k_parsed"))
    val bad = spark.read.schema(badSchema).parquet(badDir)
      .groupBy("event_type").agg(count(lit(1)).as("n_quarantined"))
    good.join(bad, Seq("event_type"), "full_outer")
      .select(col("event_type"),
        coalesce(col("n_parsed"), lit(0L)).as("n_parsed"),
        coalesce(col("n_quarantined"), lit(0L)).as("n_quarantined"),
        col("sum_k_parsed"))
      .orderBy("event_type")
  }

  /** STREAMING IVF INGEST: vectors arrive in micro-batches and are
    * assigned to the already-built coarse codebook — the index-update
    * path of a production ANN system (the index trains offline; new
    * embeddings stream in). The codebook is collected once
    * (codebook-sized driver state, the documented acceptable scalar) and
    * inlined as a LITERAL scoring expression
    * ([[graft.operators.Similarity.assignByLiteralCodebook]]) — the
    * per-row argmin runs with ZERO join and zero shuffle before the
    * census agg, which is the only stateful operator. Identical
    * arithmetic and tie-break to the batch assignment, so the final
    * census is bit-identical to q_ivf_assign and shares its oracle.
    */
  def streamIvfAssign(spark: SparkSession, sfDir: String,
                      nBatches: Int = 3): DataFrame = {
    import graft.operators.Similarity
    val emb = graft.Tables.embeddings(spark, sfDir)
    val root = stageRanges(emb, "vec_id", nBatches)
    configureStateStore(spark)
    val cb = Similarity.coarseCodebook(emb).collect()
      .map(r => (r.getInt(0), r.getSeq[Double](1), r.getDouble(2))).toSeq
    val table = s"graft_stream_ivf_${UUID.randomUUID().toString.take(8)}"
    val q = spark.readStream.schema(emb.schema)
      .option("maxFilesPerTrigger", 1)
      .parquet(s"$root/src")
      .withColumn("assigned", Similarity.assignByLiteralCodebook(
        graft.functions.VectorMath.asDouble(col("embedding")), cb))
      .groupBy("label", "assigned")
      .agg(count(lit(1)).as("n_vectors"))
      .writeStream
      .format("memory").queryName(table)
      .outputMode("complete")
      .option("checkpointLocation", s"$root/ck")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    spark.table(table).orderBy("label", "assigned")
  }

  /** STREAMING RAG INGEST: documents arrive in micro-batches and flow
    * through the WHOLE ingest side of the RAG stack — chunked, embedded
    * (the deterministic hash-derived encoder stand-in), and assigned to
    * the offline-trained coarse codebook — the path a production
    * retrieval system runs as it crawls (the index trains offline; new
    * chunks stream in). Composes [[streamChunks]]' chunk-at-ingest with
    * [[streamIvfAssign]]'s literal-codebook zero-join argmin at CHUNK
    * granularity: the codebook is collected once (codebook-sized driver
    * state) and inlined, so each micro-batch is pure per-row expression
    * work until the census agg — the only stateful operator.
    *
    * Chunking, embedding, and assignment are all stateless per
    * document, so the drained census is bit-identical to the batch
    * equivalent and the oracle rebuilds it standalone: chunk CTEs →
    * hash embeddings → label-centroid codebook → argmin census.
    */
  def streamChunkEmbed(spark: SparkSession, sfDir: String,
                       nBatches: Int = 3, size: Int = 64, stride: Int = 48,
                       dims: Int = 8, nLabels: Int = 8): DataFrame = {
    import graft.operators.Similarity
    val root = stageDocRanges(spark, sfDir, nBatches)
    configureStateStore(spark)
    val docs = graft.Tables.documents(spark, sfDir).select("doc_id", "text")
    val cb = Similarity.coarseCodebook(
        Similarity.chunkEmbeddings(docs, size, stride, dims, nLabels))
      .collect()
      .map(r => (r.getInt(0), r.getSeq[Double](1), r.getDouble(2))).toSeq
    val table = s"graft_stream_cemb_${UUID.randomUUID().toString.take(8)}"
    val q = spark.readStream.schema(docSchema)
      .option("maxFilesPerTrigger", 1)
      .parquet(s"$root/src")
      .transform(b => Similarity.chunkEmbeddingsFrom(
        graft.operators.TextAnalysis.chunkDocumentsUnordered(b, size, stride)
          .withColumn("vec_id", col("doc_id") * lit(1000000L) + col("chunk_id")),
        dims, nLabels))
      .withColumn("assigned", Similarity.assignByLiteralCodebook(
        graft.functions.VectorMath.asDouble(col("embedding")), cb))
      .groupBy("label", "assigned")
      .agg(count(lit(1)).as("n_chunks"))
      .writeStream
      .format("memory").queryName(table)
      .outputMode("complete")
      .option("checkpointLocation", s"$root/ck")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    spark.table(table).orderBy("label", "assigned")
  }

  /** STREAMING SQ8 INGEST: vectors are int8-quantized as they arrive —
    * quantize-on-write, the form a production vector store actually runs
    * (raw floats never land; codes + one scale per vector do). The
    * census is per-vector stateless expression work, so each micro-batch
    * writes an idempotent batch=N overwrite and the drained union is
    * bit-identical to the batch census — q_stream_sq8 shares
    * q_embed_quantize's oracle (the q_cms / q_stream_chunks device).
    */
  def streamSq8(spark: SparkSession, sfDir: String,
                nBatches: Int = 3): DataFrame = {
    import graft.operators.Similarity
    val emb = graft.Tables.embeddings(spark, sfDir)
    val root = stageRanges(emb, "vec_id", nBatches)
    runStagedBatches(spark, emb.schema, s"$root/src", s"$root/ck") {
      (batch, batchId) =>
        Similarity.sq8QuantizeUnordered(batch)
          .write.mode("overwrite").parquet(s"$root/out/batch=$batchId")
        ()
    }
    val censusSchema = StructType(Seq(StructField("vec_id", LongType),
      StructField("n_dims", LongType), StructField("scale", DoubleType),
      StructField("sum_code", LongType), StructField("n_sat", LongType),
      StructField("l2_err", DoubleType)))
    spark.read.schema(censusSchema).parquet(s"$root/out")
      .select("vec_id", "n_dims", "scale", "sum_code", "n_sat", "l2_err")
      .orderBy("vec_id")
  }

  /** STREAMING Count-Min heavy-term audit: the same seeded CMS Aggregator
    * as the batch q_cms_heavy, aggregated ACROSS micro-batches by the
    * streaming engine (complete mode; the sketch matrix is the operator
    * state). The sketch's merge is elementwise addition — fully
    * associative and commutative — so slicing the corpus into
    * micro-batches CANNOT change the final matrix: the streaming result
    * is bit-identical to the batch sketch and shares its full SQL oracle.
    * That property (mergeable sketch ⇒ batch/streaming agreement) is
    * exactly why production pipelines put sketches, not exact
    * distinct-counts, in their streaming layer.
    */
  def streamCmsHeavy(spark: SparkSession, sfDir: String,
                     probes: Seq[String], seed: Long = 42L): DataFrame = {
    import graft.functions.CountMin
    val root = stageDocRanges(spark, sfDir, 3)
    val table = s"graft_stream_cms_${UUID.randomUUID().toString.take(8)}"
    configureStateStore(spark)
    val cms = org.apache.spark.sql.functions.udaf(
      new CountMin.CMSAgg(seed), org.apache.spark.sql.Encoders.scalaLong)
    val q = spark.readStream.schema(docSchema)
      .option("maxFilesPerTrigger", 1)
      .parquet(s"$root/src")
      .select(explode(graft.operators.TextAnalysis.tokens(col("text"))).as("term"))
      .select(graft.operators.NearDup.md5Hash60(col("term")).as("hv"))
      .agg(cms(col("hv")).as("sk"))
      .writeStream
      .format("memory").queryName(table)
      .outputMode("complete")
      .option("checkpointLocation", s"$root/ck")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    val sketch = spark.table(table).head().getSeq[Long](0)
    // exact probe counts from the same corpus (batch side, as in the
    // batch audit — the probe list is tiny)
    val exact: Map[String, Long] = graft.Tables.documents(spark, sfDir)
      .select(explode(graft.operators.TextAnalysis.tokens(col("text"))).as("term"))
      .filter(col("term").isin(probes: _*))
      .groupBy("term").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    import spark.implicits._
    probes.map(t => (t, CountMin.estimate(sketch, t, seed), exact.getOrElse(t, 0L)))
      .toDF("term", "cms_estimate", "exact_count")
      .orderBy("term")
  }

  /** STREAMING RATE-ANOMALY MONITORING (q_stream_anomaly) — the batch
    * MAD scorer ([[graft.operators.Events.anomalyMad]]) fed from the
    * live stream: each micro-batch lands its (event_type, hour-bucket)
    * counts under a DETERMINISTIC per-batch directory (the [[landBatch]]
    * idempotence device — a crash-replayed batch overwrites its own
    * partial counts instead of double-counting), and the drained store
    * merges by bucket before the robust z-score pass. Counts are
    * additive across micro-batches, so the merged table is bit-identical
    * to the batch bucketing — q_anomaly_mad's oracle is shared verbatim,
    * and the scorer itself is the SAME code via
    * [[graft.operators.Events.anomalyMadFromCounts]]: batch and stream
    * monitoring can never drift.
    *
    * 100 TB shape: per-batch state is the batch's bucket census
    * (|types|·hours-touched rows — tiny), the store grows by bucket
    * rows not events, and the scoring pass aggregates the bucket table
    * only. A production deployment would run this on a sliding
    * retention window of batch dirs; the scorer is indifferent.
    */
  def streamAnomalyMad(spark: SparkSession, sfDir: String): DataFrame = {
    val runId = UUID.randomUUID().toString.take(8)
    val tmp = sys.props("java.io.tmpdir")
    val store = s"$tmp/graft_stream_anom/$runId/store"
    val ck = s"$tmp/graft_stream_anom/$runId/ck"
    val q = dedupedEvents(spark, stageStreamDir(sfDir))
      .writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        if (!batch.isEmpty) {
          graft.operators.Landing.withTimeBuckets(batch, col("ts"))
            .groupBy("event_type", "y", "m", "d", "h")
            .agg(count(lit(1)).as("n_events"))
            .coalesce(1)
            .write.mode("overwrite").parquet(s"$store/batch=$batchId")
          ()
        }
      }
      .option("checkpointLocation", ck)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    val merged = spark.read.parquet(store)
      .groupBy("event_type", "y", "m", "d", "h")
      .agg(sum(col("n_events")).as("n_events"))
    graft.operators.Events.anomalyMadFromCounts(merged)
  }

  /** Document stream schema for the language-aware census streams
    * ([[streamPiiCensus]], [[streamBottomK]] — their operators key on
    * lang, which [[docSchema]]'s fingerprint-only staging drops). */
  val langDocSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("text", StringType),
    StructField("lang", StringType)))

  private def stageLangDocs(spark: SparkSession, sfDir: String,
                            nBatches: Int): String =
    stageRanges(graft.Tables.documents(spark, sfDir)
      .select("doc_id", "text", "lang"), "doc_id", nBatches)

  /** STREAMING PII SCRUB CENSUS (q_stream_pii) — the scrub-at-ingest
    * deployment: each micro-batch runs the SAME census the batch pass
    * runs ([[graft.operators.TextAnalysis.piiRedactCensus]] — one code
    * path, zero drift) and lands its per-language counts under a
    * deterministic batch=N directory (the [[streamAnomalyMad]]
    * idempotence device: a crash-replayed batch overwrites its own
    * partial census instead of double-counting). Every census column is
    * a per-document sum, so the drained store merges additively into a
    * table bit-identical to the batch census — q_pii_redact's oracle is
    * shared verbatim.
    *
    * 100 TB shape: per-batch state is |langs| rows; the store grows by
    * census rows, never documents; the merge aggregates the census
    * table only. This is the shape a compliance monitor actually wants:
    * PII rates per ingest batch for free (the batch=N dirs ARE the
    * per-batch report), corpus totals one additive agg away.
    */
  def streamPiiCensus(spark: SparkSession, sfDir: String): DataFrame = {
    val runId = UUID.randomUUID().toString.take(8)
    val tmp = sys.props("java.io.tmpdir")
    val store = s"$tmp/graft_stream_pii/$runId/store"
    val ck = s"$tmp/graft_stream_pii/$runId/ck"
    val root = stageLangDocs(spark, sfDir, 3)
    val q = spark.readStream.schema(langDocSchema)
      .option("maxFilesPerTrigger", 1)
      .parquet(s"$root/src")
      .writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        if (!batch.isEmpty) {
          graft.operators.TextAnalysis.piiRedactCensus(batch)
            .coalesce(1)
            .write.mode("overwrite").parquet(s"$store/batch=$batchId")
          ()
        }
      }
      .option("checkpointLocation", ck)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    spark.read.parquet(store).groupBy("lang")
      .agg(sum("n_docs").as("n_docs"),
        sum("n_docs_pii").as("n_docs_pii"),
        sum("n_emails").as("n_emails"),
        sum("n_ips").as("n_ips"),
        sum("n_phones").as("n_phones"),
        sum("chars_redacted").as("chars_redacted"))
      .orderBy("lang")
  }

  /** STREAMING BOTTOM-K SAMPLE MAINTENANCE (q_stream_bottomk) — the
    * mergeable-sketch law live: bottom-k of a union is the bottom-k of
    * the per-part bottom-k's, so each micro-batch keeps only ITS k
    * smallest content hashes per language (k·|langs| rows of state, the
    * whole point of a sketch) and the drained sketches re-rank through
    * the SAME [[graft.operators.TextAnalysis.bottomKFrom]] cut the
    * batch sampler uses — the merged sample is exactly the corpus
    * sample, q_bottomk_sample's oracle shared verbatim. The merge
    * deduplicates on (lang, doc_id) first: sketch union is a SET union,
    * so a re-delivered document cannot occupy two ranks.
    *
    * 100 TB shape: per-batch cost is the batch's hash scan + its own
    * tiny rank; the store holds ≤ k·|langs| rows per batch; the final
    * cut ranks a sketch-sized table, never the corpus.
    */
  def streamBottomK(spark: SparkSession, sfDir: String,
                    k: Int = 50): DataFrame = {
    val runId = UUID.randomUUID().toString.take(8)
    val tmp = sys.props("java.io.tmpdir")
    val store = s"$tmp/graft_stream_bottomk/$runId/store"
    val ck = s"$tmp/graft_stream_bottomk/$runId/ck"
    val root = stageLangDocs(spark, sfDir, 3)
    val q = spark.readStream.schema(langDocSchema)
      .option("maxFilesPerTrigger", 1)
      .parquet(s"$root/src")
      .writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        if (!batch.isEmpty) {
          graft.operators.TextAnalysis.bottomKSample(batch, k)
            .select("lang", "doc_id", "h")
            .coalesce(1)
            .write.mode("overwrite").parquet(s"$store/batch=$batchId")
          ()
        }
      }
      .option("checkpointLocation", ck)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    graft.operators.TextAnalysis.bottomKFrom(
      spark.read.parquet(store).dropDuplicates("lang", "doc_id"), k)
  }

  /** STREAMING DRIFT MONITOR (q_stream_drift) — the distribution-shift
    * audit ([[graft.operators.Pipeline.distShift]]) running at ingest:
    * the incoming snapshot streams in micro-batches, each batch lands
    * its per-(lang, term) token-frequency census under a deterministic
    * batch=N dir (the [[streamAnomalyMad]] idempotence device — replay
    * overwrites, never double-counts), and tf counts are ADDITIVE, so
    * the drained store merges by sum into exactly the batch tf table —
    * the divergence then runs through the SAME
    * [[graft.operators.Pipeline.distShiftFromTf]] core against the
    * reference corpus, and q_dist_shift's oracle is shared verbatim:
    * batch drift and at-ingest drift can never disagree.
    *
    * 100 TB shape: per-batch state is the batch's (lang, term) census —
    * vocabulary-bounded, not document-bounded; the store grows by
    * census rows; the divergence pass aggregates two tf tables and
    * never revisits documents. This is what a corpus-refresh monitor
    * wants live: per-ingest-batch vocabulary deltas for free (the
    * batch=N dirs), corpus-level KL/JS one additive merge away.
    */
  def streamDriftMonitor(spark: SparkSession, sfDir: String): DataFrame = {
    val runId = UUID.randomUUID().toString.take(8)
    val tmp = sys.props("java.io.tmpdir")
    val store = s"$tmp/graft_stream_drift/$runId/store"
    val ck = s"$tmp/graft_stream_drift/$runId/ck"
    val docs = graft.Tables.documents(spark, sfDir)
    // the incoming snapshot (the q_dist_shift B-side laws) is what streams
    val incoming = docs.filter(pmod(col("doc_id"), lit(11L)) =!= 0)
      .select(col("doc_id"),
        when(pmod(col("doc_id"), lit(5L)) === 0,
          concat(col("text"), lit(" rev2"))).otherwise(col("text")).as("text"),
        col("lang"))
    val root = stageRanges(incoming, "doc_id", 3)
    val q = spark.readStream.schema(langDocSchema)
      .option("maxFilesPerTrigger", 1)
      .parquet(s"$root/src")
      .writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        if (!batch.isEmpty) {
          graft.operators.Pipeline.tfCensus(batch, "tfb")
            .coalesce(1)
            .write.mode("overwrite").parquet(s"$store/batch=$batchId")
          ()
        }
      }
      .option("checkpointLocation", ck)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    val tfb = spark.read.parquet(store)
      .groupBy("lang", "t").agg(sum("tfb").as("tfb"))
    val reference = docs.filter(pmod(col("doc_id"), lit(7L)) =!= 0)
      .select(col("doc_id"), col("lang"), col("text"))
    graft.operators.Pipeline.distShiftFromTf(
      graft.operators.Pipeline.tfCensus(reference, "tfa"), tfb)
  }

  /** STREAMING FORECAST BACKTEST (q_stream_forecast) — the seasonal-
    * naive backtest ([[graft.operators.Events.forecastNaive]]) fed from
    * the live stream, the [[streamAnomalyMad]] device one op over: each
    * micro-batch lands its (event_type, epoch-hour) counts under a
    * deterministic batch=N dir (replay overwrites, never double-counts),
    * counts merge ADDITIVELY into exactly the batch hourly table, and
    * the backtest runs through the SAME
    * [[graft.operators.Events.forecastFromHourly]] core —
    * q_forecast_naive's oracle shared verbatim. A production monitor
    * gets the forecast-vs-actual residual per type refreshed each
    * ingest without rescanning history.
    */
  def streamForecast(spark: SparkSession, sfDir: String): DataFrame = {
    val runId = UUID.randomUUID().toString.take(8)
    val tmp = sys.props("java.io.tmpdir")
    val store = s"$tmp/graft_stream_fcst/$runId/store"
    val ck = s"$tmp/graft_stream_fcst/$runId/ck"
    val q = dedupedEvents(spark, stageStreamDir(sfDir))
      .writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        if (!batch.isEmpty) {
          graft.operators.Events.hourlyTypeCounts(batch)
            .coalesce(1)
            .write.mode("overwrite").parquet(s"$store/batch=$batchId")
          ()
        }
      }
      .option("checkpointLocation", ck)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    graft.operators.Events.forecastFromHourly(
      spark.read.parquet(store)
        .groupBy("event_type", "hr").agg(sum(col("x")).as("x")))
  }

  /** STREAMING CONFORMAL CALIBRATION (q_stream_conformal) — the
    * split-conformal interval census maintained at ingest: per-batch
    * ADDITIVE hourly type counts land under batch=N dirs (the
    * [[streamForecast]] state law — replay overwrites, a split hour
    * merges by sum), and the drained merge feeds the SAME
    * [[graft.operators.Events.conformalFromHourly]] assembly —
    * q_conformal's oracle shared VERBATIM. A production monitor gets
    * its calibrated forecast bands re-fit each ingest without
    * rescanning event history; per-batch state is touched
    * (type, hour) count rows, never event rows.
    */
  def streamConformal(spark: SparkSession, sfDir: String): DataFrame = {
    val runId = UUID.randomUUID().toString.take(8)
    val tmp = sys.props("java.io.tmpdir")
    val store = s"$tmp/graft_stream_conf/$runId/store"
    val ck = s"$tmp/graft_stream_conf/$runId/ck"
    val q = dedupedEvents(spark, stageStreamDir(sfDir))
      .writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        if (!batch.isEmpty) {
          graft.operators.Events.hourlyTypeCounts(batch)
            .coalesce(1)
            .write.mode("overwrite").parquet(s"$store/batch=$batchId")
          ()
        }
      }
      .option("checkpointLocation", ck)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    graft.operators.Events.conformalFromHourly(
      spark.read.parquet(store)
        .groupBy("event_type", "hr").agg(sum(col("x")).as("x")))
  }

  /** STREAMING DP COUNT RELEASE (q_stream_dp) — the private histogram
    * maintained at ingest: each micro-batch lands its (event_type, day)
    * cell counts under a deterministic batch=N dir, and the RELEASE
    * draws Laplace noise once per cell over the additively-merged
    * counts ([[graft.operators.Pipeline.dpReleaseFromCells]] — noise at
    * release time, never per batch: per-batch draws would break the
    * privacy accounting, leak batch boundaries, and make replay
    * non-idempotent). Shares q_dp_counts' oracle verbatim, so the
    * at-ingest release can never drift from the batch release.
    *
    * 100 TB shape: per-batch state is one count row per touched cell
    * (group-cardinality, never event-cardinality); the drain is a hash
    * agg over |batches|·|touched cells| rows; the noise is per-cell
    * scalar math.
    */
  def streamDpRelease(spark: SparkSession, sfDir: String,
                      epsilon: Double = 1.0): DataFrame = {
    val runId = UUID.randomUUID().toString.take(8)
    val tmp = sys.props("java.io.tmpdir")
    val store = s"$tmp/graft_stream_dp/$runId/store"
    val ck = s"$tmp/graft_stream_dp/$runId/ck"
    val q = dedupedEvents(spark, stageStreamDir(sfDir))
      .writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        if (!batch.isEmpty) {
          batch
            .select(col("event_type"),
              date_format(col("ts"), "yyyy-MM-dd").as("day"))
            .groupBy("event_type", "day").agg(count(lit(1)).as("n_true"))
            .coalesce(1)
            .write.mode("overwrite").parquet(s"$store/batch=$batchId")
          ()
        }
      }
      .option("checkpointLocation", ck)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    graft.operators.Pipeline.dpReleaseFromCells(
      spark.read.parquet(store)
        .groupBy("event_type", "day")
        .agg(sum(col("n_true")).as("n_true")),
      epsilon)
  }

  /** STREAMING PERCENTILE MONITOR (q_stream_percentiles) — p50/p95/p99
    * of the value column per event type, maintained at ingest the way
    * an SLO dashboard maintains latency quantiles: each micro-batch
    * lands its FIXED-BIN histogram (the Prometheus histogram_quantile
    * design — bin counts are additive, so per-batch histograms merge
    * by sum; exact percentiles need the sorted data and floating bin
    * edges depend on global min/max, neither merges), and the drained
    * estimate interpolates inside the crossing bin over the merged
    * census ([[graft.operators.Events.percentilesFromBins]]). The
    * estimator is DETERMINISTIC for a given dataset — unlike a sketch,
    * it is fully oracle-reproducible, so this query hash-matches a SQL
    * twin of the same binned computation. Error law (spec-locked): the
    * crossing bin contains the ⌈p·N⌉-th order statistic, so the
    * estimate lands within one bin width of that value; vs the
    * INTERPOLATED quantile the gap can additionally span a sparse
    * tail's distance between observations — bin width is the knob.
    *
    * 100 TB shape: per-batch state is |types|·|bins| count rows; the
    * merge is a hash agg over censuses; the crossing scan is a window
    * over the bin CENSUS, never the data.
    */
  def streamPercentiles(spark: SparkSession, sfDir: String,
                        binW: Double = 4.0, nBins: Int = 128,
                        ps: Seq[Double] = Seq(0.5, 0.95, 0.99))
      : DataFrame = {
    val runId = UUID.randomUUID().toString.take(8)
    val tmp = sys.props("java.io.tmpdir")
    val store = s"$tmp/graft_stream_pct/$runId/store"
    val ck = s"$tmp/graft_stream_pct/$runId/ck"
    val q = dedupedEvents(spark, stageStreamDir(sfDir))
      .writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        if (!batch.isEmpty) {
          graft.operators.Events.valueBins(batch, binW, nBins)
            .coalesce(1)
            .write.mode("overwrite").parquet(s"$store/batch=$batchId")
          ()
        }
      }
      .option("checkpointLocation", ck)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    graft.operators.Events.percentilesFromBins(
      spark.read.parquet(store)
        .groupBy("event_type", "bin").agg(sum(col("n")).as("n")),
      binW, ps)
  }

  /** STREAMING SKEW MONITOR (q_stream_skew) — the join-key skew
    * diagnosis ([[graft.operators.Events.skewAudit]]) maintained at
    * ingest: per micro-batch, per audited key column, the batch's key
    * counts land under batch=N dirs; group sizes are ADDITIVE across
    * batches, so the drained merge reproduces exactly the batch
    * audit's group table and the census shares q_skew_audit's oracle
    * verbatim. This is the monitor that catches a hot key WHILE it is
    * forming (a viral user, a bot storm) — before the nightly join
    * discovers it as a straggler. State is key-cardinality per
    * audited column, never row-cardinality.
    */
  def streamSkewMonitor(spark: SparkSession, sfDir: String,
                        keys: Seq[String] = Seq("event_type", "user_id"))
      : DataFrame = {
    val runId = UUID.randomUUID().toString.take(8)
    val tmp = sys.props("java.io.tmpdir")
    val store = s"$tmp/graft_stream_skew/$runId/store"
    val ck = s"$tmp/graft_stream_skew/$runId/ck"
    val q = dedupedEvents(spark, stageStreamDir(sfDir))
      .writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        if (!batch.isEmpty) {
          keys.map { c =>
            batch.groupBy(col(c).cast("string").as("k"))
              .agg(count(lit(1)).as("n"))
              .select(lit(c).as("key_col"), col("k"), col("n"))
          }.reduce(_ unionByName _)
            .coalesce(1)
            .write.mode("overwrite").parquet(s"$store/batch=$batchId")
          ()
        }
      }
      .option("checkpointLocation", ck)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    val merged = spark.read.parquet(store)
      .groupBy("key_col", "k").agg(sum(col("n")).as("n"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      .transform(graft.CacheRegistry.track)
    keys.map { c =>
      graft.operators.Events.skewCensusFromGroups(
        merged.filter(col("key_col") === c).select(col("k"), col("n")), c)
    }.reduce(_ unionByName _).orderBy("key_col")
  }

  /** STREAMING MATERIALIZED VIEW (q_stream_mv) — the incremental
    * aggregate view a warehouse actually runs: each micro-batch lands
    * its partial (event_type, day) count/sum rows under a
    * deterministic batch=N dir ([[graft.operators.Events.mvPartial]],
    * the same partial unit the batch refresh merges), and the served
    * view is the additive merge of the accumulated partials
    * ([[graft.operators.Events.mvMergeRows]] + mvServe) — so the
    * at-ingest view shares q_mv_merge's oracle verbatim and can never
    * drift from the batch-refresh cycle. Replayed batches overwrite
    * their own dirs (replay-idempotent, unlike merging into one live
    * store inside the batch body, where a crash-replay would
    * double-count its own partial).
    *
    * 100 TB shape: per-batch state is group-cardinality-sized (one
    * partial row per touched (type, day) cell), the merge is a hash
    * agg over partial rows — |batches|·|touched cells|, never the
    * fact history — and serving is a projection of the merged view.
    */
  def streamMv(spark: SparkSession, sfDir: String): DataFrame = {
    val runId = UUID.randomUUID().toString.take(8)
    val tmp = sys.props("java.io.tmpdir")
    val store = s"$tmp/graft_stream_mv/$runId/store"
    val ck = s"$tmp/graft_stream_mv/$runId/ck"
    val q = dedupedEvents(spark, stageStreamDir(sfDir))
      .writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        if (!batch.isEmpty) {
          graft.operators.Events.mvPartial(batch)
            .coalesce(1)
            .write.mode("overwrite").parquet(s"$store/batch=$batchId")
          ()
        }
      }
      .option("checkpointLocation", ck)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    graft.operators.Events.mvServe(
      graft.operators.Events.mvMergeRows(spark.read.parquet(store)))
  }

  /** STREAMING RETRACT-STREAM MV (q_stream_mv_retract) — the CDC form
    * of [[streamMv]]: each micro-batch emits its SIGNED delta partials
    * ([[graft.operators.Events.retractDeltas]] — inserts for the
    * batch's facts, retract+reinsert pairs for its corrections),
    * pre-aggregated per cell and landed under batch=N dirs; the served
    * view is the additive merge of signed DECIMAL partials. However the
    * change stream was batched — and wherever a correction lands
    * relative to the fact it corrects — the merged view equals the
    * one-shot GROUP BY over the corrected history: q_mv_retract's
    * oracle shared verbatim. Replay-idempotent per batch (own-dir
    * overwrite); state is group-cardinality signed partials.
    */
  def streamMvRetract(spark: SparkSession, sfDir: String): DataFrame = {
    val runId = UUID.randomUUID().toString.take(8)
    val tmp = sys.props("java.io.tmpdir")
    val store = s"$tmp/graft_stream_mvr/$runId/store"
    val ck = s"$tmp/graft_stream_mvr/$runId/ck"
    val q = dedupedEvents(spark, stageStreamDir(sfDir))
      .writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        if (!batch.isEmpty) {
          graft.operators.Events.retractDeltas(batch)
            .groupBy("event_type", "day")
            .agg(sum(col("dn")).as("n_events"),
              sum(col("dv")).cast("decimal(18,2)").as("sum_value"))
            .coalesce(1)
            .write.mode("overwrite").parquet(s"$store/batch=$batchId")
          ()
        }
      }
      .option("checkpointLocation", ck)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    graft.operators.Events.mvServe(
      graft.operators.Events.mvMergeRows(spark.read.parquet(store)))
  }

  /** STREAMING A/B MONITOR (q_stream_ab) — the experiment read-out kept
    * live as events arrive (the dashboard every running experiment is
    * watched on): each micro-batch lands its ADDITIVE per-user partials
    * ([[graft.operators.Experiment.abUserPartial]] — event counts,
    * conversion counts, DECIMAL revenue) under a deterministic batch=N
    * dir (replay overwrites, never double-counts); the drained partials
    * merge by user-keyed sum into exactly the one-shot per-user frame,
    * and the SAME [[graft.operators.Experiment.abMetricsFromUsers]]
    * read-out runs over it — q_ab_metrics' oracle shared VERBATIM, so
    * the at-ingest z/t statistics can never drift from the batch
    * analysis.
    *
    * 100 TB shape: per-batch state is touched-user rows (the partials
    * are user-keyed counts/sums); the drain is one user-keyed hash agg
    * over |batches|·|touched users| partial rows, never the event
    * history; the statistic math is a 1-row reduction.
    */
  def streamAb(spark: SparkSession, sfDir: String): DataFrame = {
    val runId = UUID.randomUUID().toString.take(8)
    val tmp = sys.props("java.io.tmpdir")
    val store = s"$tmp/graft_stream_ab/$runId/store"
    val ck = s"$tmp/graft_stream_ab/$runId/ck"
    val q = dedupedEvents(spark, stageStreamDir(sfDir))
      .writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        if (!batch.isEmpty) {
          graft.operators.Experiment.abUserPartial(batch)
            .coalesce(1)
            .write.mode("overwrite").parquet(s"$store/batch=$batchId")
          ()
        }
      }
      .option("checkpointLocation", ck)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    graft.operators.Experiment.abMetricsFromUsers(
      graft.operators.Experiment.abUsersFromPartials(
        spark.read.parquet(store)))
  }

  /** STREAMING COHORT LTV (q_stream_ltv) — the payback dashboard kept
    * current at ingest: each micro-batch lands its ADDITIVE
    * per-(user, day) partials ([[graft.operators.Events.ltvUserDays]] —
    * event counts + DECIMAL revenue; a user-day split across batches
    * merges by sum) under a deterministic batch=N dir (replay
    * overwrites); the drained partials merge by (user, day) and feed
    * the SAME [[graft.operators.Events.ltvFromUserDays]] assembly —
    * q_ltv_cohort's oracle shared VERBATIM. Per-batch state is
    * touched-user-day rows, never the event history.
    */
  def streamLtv(spark: SparkSession, sfDir: String): DataFrame = {
    val runId = UUID.randomUUID().toString.take(8)
    val tmp = sys.props("java.io.tmpdir")
    val store = s"$tmp/graft_stream_ltv/$runId/store"
    val ck = s"$tmp/graft_stream_ltv/$runId/ck"
    val q = dedupedEvents(spark, stageStreamDir(sfDir))
      .writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        if (!batch.isEmpty) {
          graft.operators.Events.ltvUserDays(batch)
            .coalesce(1)
            .write.mode("overwrite").parquet(s"$store/batch=$batchId")
          ()
        }
      }
      .option("checkpointLocation", ck)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    graft.operators.Events.ltvFromUserDays(
      spark.read.parquet(store)
        .groupBy("user_id", "day")
        .agg(sum(col("n_events")).as("n_events"),
          sum(col("revenue")).cast("decimal(18,2)").as("revenue")))
  }

  /** STREAMING DELETION QUEUE (q_stream_forget) — right-to-be-forgotten
    * as it actually deploys: erasure requests ARRIVE OVER TIME, and each
    * micro-batch of requests is applied incrementally to the live
    * user-bucketed store via the SAME [[graft.operators.Landing
    * .eraseVictims]] unit the one-shot pass uses (rewrite only that
    * request batch's buckets; drop buckets the erasure empties). The
    * final census reads the post-queue store and shares q_forget's
    * oracle verbatim: a victim set split across N request batches must
    * leave exactly the store one bulk erasure leaves. Idempotent per
    * request (a replayed batch finds no victim rows and rewrites the
    * same survivors), so crash-replay converges.
    *
    * 100 TB shape: per-request cost is the request's buckets, never the
    * store; the store is rewritten incrementally, bucket by touched
    * bucket, exactly as a compliance queue drains in production.
    */
  def streamForget(spark: SparkSession, sfDir: String,
                   victimMod: Long = 97L, nBuckets: Int = 16,
                   nBatches: Int = 3): DataFrame = {
    val runId = UUID.randomUUID().toString.take(8)
    val tmp = sys.props("java.io.tmpdir")
    val baseDir = s"$tmp/graft_stream_forget/$runId/base"
    val ck = s"$tmp/graft_stream_forget/$runId/ck"
    val ev = graft.Tables.events(spark, sfDir)
    graft.operators.Landing.landUserBucketed(ev, nBuckets, baseDir)
    val before = spark.read.parquet(baseDir)
      .groupBy("event_type").agg(count(lit(1)).as("n_before"))
      .localCheckpoint()
    val victims = ev.filter(pmod(col("user_id"), lit(victimMod)) === 0)
      .select("user_id").distinct()
    val root = stageRanges(victims, "user_id", nBatches)
    val q = spark.readStream
      .schema(StructType(Seq(StructField("user_id", LongType))))
      .option("maxFilesPerTrigger", 1)
      .parquet(s"$root/src")
      .writeStream
      .foreachBatch { (batch: DataFrame, _: Long) =>
        if (!batch.isEmpty) {
          graft.operators.Landing.eraseVictims(spark, baseDir, batch, nBuckets)
        }
      }
      .option("checkpointLocation", ck)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    graft.operators.Landing.forgetCensus(spark, baseDir, before)
  }

  /** STREAMING CONTINGENCY AUDIT (q_stream_chi2) — the χ² independence
    * census ([[graft.operators.Pipeline.chi2Independence]]) at ingest:
    * per micro-batch, the batch's (lang, source) cell counts land under
    * a deterministic batch=N dir; cell counts are ADDITIVE, so the
    * drained store merges by sum into exactly the batch contingency
    * table and the χ² pass runs through the SAME
    * [[graft.operators.Pipeline.chi2FromCounts]] core — q_chi2's
    * oracle shared verbatim. Per-batch state is |langs|·|sources| rows.
    */
  def streamChi2(spark: SparkSession, sfDir: String): DataFrame = {
    val runId = UUID.randomUUID().toString.take(8)
    val tmp = sys.props("java.io.tmpdir")
    val store = s"$tmp/graft_stream_chi2/$runId/store"
    val ck = s"$tmp/graft_stream_chi2/$runId/ck"
    val schema = StructType(Seq(
      StructField("doc_id", LongType),
      StructField("lang", StringType),
      StructField("source", StringType)))
    val root = stageRanges(graft.Tables.documents(spark, sfDir)
      .select("doc_id", "lang", "source"), "doc_id", 3)
    val q = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1)
      .parquet(s"$root/src")
      .writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        if (!batch.isEmpty) {
          batch.groupBy("lang", "source").agg(count(lit(1)).as("n_obs"))
            .coalesce(1)
            .write.mode("overwrite").parquet(s"$store/batch=$batchId")
          ()
        }
      }
      .option("checkpointLocation", ck)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    graft.operators.Pipeline.chi2FromCounts(
      spark.read.parquet(store)
        .groupBy("lang", "source").agg(sum(col("n_obs")).as("n_obs")))
  }

  /** STREAMING K-ANONYMITY monitor (q_stream_kanon) — the
    * re-identification audit ([[graft.operators.Pipeline
    * .kAnonymityCensus]]) maintained as subject records arrive (the
    * CDC-feed compliance monitor): per micro-batch, the batch's
    * quasi-identifier class counts land under a deterministic batch=N
    * dir; class counts are ADDITIVE on the QI tuple, so the drained
    * store merges by sum into exactly the batch class table and the
    * banding runs through the SAME [[graft.operators.Pipeline
    * .kanonFromClasses]] core — q_kanon's oracle shared verbatim. The
    * per-batch dirs double as the per-ingest risk report; state is
    * class-cardinality, never row-cardinality.
    */
  def streamKanon(spark: SparkSession, sfDir: String): DataFrame = {
    val runId = UUID.randomUUID().toString.take(8)
    val tmp = sys.props("java.io.tmpdir")
    val store = s"$tmp/graft_stream_kanon/$runId/store"
    val ck = s"$tmp/graft_stream_kanon/$runId/ck"
    val cust = graft.Tables.customer(spark, sfDir)
    val root = stageRanges(cust, "c_custkey", 3)
    val q = spark.readStream.schema(cust.schema)
      .option("maxFilesPerTrigger", 1)
      .parquet(s"$root/src")
      .writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        if (!batch.isEmpty) {
          batch.select(col("c_nationkey"), col("c_mktsegment"),
              floor(col("c_acctbal") / lit(1000.0)).cast("long")
                .as("bal_bucket"))
            .groupBy("c_nationkey", "c_mktsegment", "bal_bucket")
            .agg(count(lit(1)).as("k"))
            .coalesce(1)
            .write.mode("overwrite").parquet(s"$store/batch=$batchId")
          ()
        }
      }
      .option("checkpointLocation", ck)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    graft.operators.Pipeline.kanonFromClasses(
      spark.read.parquet(store)
        .groupBy("c_nationkey", "c_mktsegment", "bal_bucket")
        .agg(sum(col("k")).as("k")))
  }

  /** STREAMING REFERENTIAL-INTEGRITY monitor (q_stream_ri) — the
    * events.user_id → customer edge of [[graft.operators.Pipeline
    * .riAudit]] checked at ingest, the CDC-feed pattern that catches an
    * out-of-order load (child arriving before parent) the moment it
    * happens instead of at the nightly audit: per micro-batch, the
    * batch's events pre-aggregate to per-user counts, left-join the
    * FROZEN customer dimension (broadcast — dimension-sized), and the
    * per-key (n_rows, n_orphan_rows) land under a deterministic
    * batch=N dir. Both counts are additive on the key and orphan-ness
    * is per-key static, so the drained store merges by sum into
    * exactly the batch key counts and the census assembles through the
    * SAME [[graft.operators.Pipeline.riFromKeyCounts]] core — the
    * batch audit's events-edge oracle shared verbatim. State is
    * distinct-FK-cardinality (the q_stream_profile distinct-store
    * class), never event-cardinality; the per-batch dirs double as the
    * per-ingest violation report.
    */
  def streamRiMonitor(spark: SparkSession, sfDir: String): DataFrame = {
    val runId = UUID.randomUUID().toString.take(8)
    val tmp = sys.props("java.io.tmpdir")
    val store = s"$tmp/graft_stream_ri/$runId/store"
    val ck = s"$tmp/graft_stream_ri/$runId/ck"
    val ev = graft.Tables.events(spark, sfDir).select("event_id", "user_id")
    val parentKeys = graft.Tables.customer(spark, sfDir)
      .select(col("c_custkey").cast("long").as("_pk"))
    val root = stageRanges(ev, "event_id", 3)
    val q = spark.readStream.schema(ev.schema)
      .option("maxFilesPerTrigger", 1)
      .parquet(s"$root/src")
      .writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        if (!batch.isEmpty) {
          batch.select(col("user_id").cast("long").as("_fk"))
            .groupBy("_fk").agg(count(lit(1)).as("n_rows"))
            .join(broadcast(parentKeys), col("_fk") === col("_pk"), "left")
            .select(col("_fk"), col("n_rows"),
              when(col("_pk").isNull, col("n_rows")).otherwise(lit(0L))
                .as("n_orphan_rows"))
            .coalesce(1)
            .write.mode("overwrite").parquet(s"$store/batch=$batchId")
          ()
        }
      }
      .option("checkpointLocation", ck)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    graft.operators.Pipeline.riFromKeyCounts("events.user_id -> customer",
      spark.read.parquet(store)
        .groupBy("_fk")
        .agg(sum(col("n_rows")).as("n_rows"),
          sum(col("n_orphan_rows")).as("n_orphan_rows")))
  }

  /** STREAMING TABLE PROFILE (q_stream_profile) — the ANALYZE census
    * ([[graft.operators.Pipeline.profileTable]]) maintained at ingest,
    * the data-quality monitor pattern (profile every arriving batch,
    * keep corpus statistics current without rescanning): each
    * micro-batch lands TWO artifacts under deterministic batch=N dirs —
    * its moment row ([[graft.operators.Pipeline.profileMomentAggs]]:
    * counts, min/max, exact sums, all in native exact types) and its
    * per-column distinct value set. Moments merge by (sum, min, max,
    * sum) — exact in long/DECIMAL, so the merged row is bit-identical
    * to the one-pass aggregate; distincts merge by SET UNION (the only
    * non-additive stat), then both feed the SAME
    * [[graft.operators.Pipeline.profileAssemble]] projection —
    * q_profile's oracle is shared verbatim, and the per-batch moment
    * rows double as the per-ingest data-quality report.
    *
    * 100 TB shape: per-batch moment state is ONE row. The distinct
    * stat is the one non-additive profile statistic, so it ships in
    * two tiers: the DEFAULT is a mergeable per-column DataSketches HLL
    * ([[graft.operators.Pipeline.profileDistinctSketches]]) — ONE
    * sketch row per batch, ≤ ~2.5 KB per column at lgK=12 regardless
    * of cardinality, so the accumulated state is (batches × columns ×
    * sketch)-sized, never corpus-sized; estimates carry the HLL ±1.6%
    * band and grade BOUNDED-PASS (the q_approx_distinct class):
    * q_stream_profile_sketch declares [[streamProfileSketchAudit]],
    * whose in-bound flag the DuckDB oracle asserts, while Bench times
    * this estimate-only form (SparkEntry.benchForms) — bench prices
    * the production plan, Verify prices the gate. The EXACT value store
    * ([[graft.operators.Pipeline.profileDistinctValues]]) stays as the
    * opt-in tier for dimension-sized columns, where it is both cheap
    * and hash-matched against q_profile's shared oracle — at 100 TB it
    * converges on a several-× copy of a key column, which is why it is
    * not the default. Replayed batches overwrite their own dirs: all
    * stores are replay-idempotent.
    */
  def streamProfile(spark: SparkSession, sfDir: String,
                    exactDistincts: Boolean = false): DataFrame = {
    val runId = UUID.randomUUID().toString.take(8)
    val tmp = sys.props("java.io.tmpdir")
    streamProfileAt(spark, sfDir,
      s"$tmp/graft_stream_profile/$runId", exactDistincts)
  }

  /** BOUNDED-PASS oracle form of the sketch-tier [[streamProfile]]
    * (q_stream_profile_sketch): the per-column HLL distinct ESTIMATES
    * are engine-specific, so the oracled output keeps every exact
    * column of the profile (moments merge exactly — they already
    * hash-match q_profile's oracle) and replaces the estimate with
    * `n_distinct_in_bound` — whether it landed within the documented
    * 3-sigma band (|est − exact| ≤ max(1, 0.05·exact) at lgK=12) of the
    * batch-exact distinct. The DuckDB oracle asserts the flag = 1 per
    * column, so the sketch's error bound is enforced by the hash gate
    * itself; the exact twin (one batch multi-countDistinct) is the
    * audit's cost, paid only here.
    */
  def streamProfileSketchAudit(spark: SparkSession, sfDir: String): DataFrame = {
    val sketch = streamProfile(spark, sfDir)
    val exact = graft.operators.Pipeline
      .profileTable(graft.Tables.lineitem(spark, sfDir))
      .select(col("col_name"), col("n_distinct").as("n_distinct_exact"))
    sketch.join(exact, Seq("col_name"))
      .select(col("col_name"), col("n_rows"), col("n_nulls"),
        (abs(col("n_distinct") - col("n_distinct_exact")).cast("double") <=
          greatest(lit(1.0), lit(0.05) * col("n_distinct_exact").cast("double")))
          .cast("long").as("n_distinct_in_bound"),
        col("min_num"), col("max_num"), col("avg_num"),
        col("min_len"), col("max_len"))
      .orderBy("col_name")
  }

  /** [[streamProfile]] against a caller-chosen run root — the testable
    * form: specs assert the accumulated distinct-state SIZE (the scale
    * claim) directly on `root`/store. */
  private[graft] def streamProfileAt(spark: SparkSession, sfDir: String,
                                     root0: String,
                                     exactDistincts: Boolean): DataFrame = {
    import graft.operators.Pipeline
    val store = s"$root0/store"
    val ck = s"$root0/ck"
    val li = graft.Tables.lineitem(spark, sfDir)
    val root = stageRanges(li, "l_orderkey", 3)
    val q = spark.readStream.schema(li.schema)
      .option("maxFilesPerTrigger", 1)
      .parquet(s"$root/src")
      .writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        if (!batch.isEmpty) {
          // repartition spread (the profileTable/aggSuite device, r17):
          // each staged batch is ONE parquet file, so the 42-aggregate
          // moment pass and the 11-column distinct/sketch state
          // otherwise run their partial phase on a single split's task.
          // Aggregation values are partitioning-blind (moments exact;
          // HLL registers are per-value maxima, order- and
          // partitioning-independent — the documented determinism law).
          val b = batch.repartition(col("l_orderkey"))
          val m = Pipeline.profileMomentAggs
          b.agg(m.head, m.tail: _*)
            .coalesce(1)
            .write.mode("overwrite").parquet(s"$store/moments/batch=$batchId")
          val dstate =
            if (exactDistincts) Pipeline.profileDistinctValues(b)
            else Pipeline.profileDistinctSketches(b)
          dstate.coalesce(1)
            .write.mode("overwrite").parquet(s"$store/dvals/batch=$batchId")
          ()
        }
      }
      .option("checkpointLocation", ck)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    val moments = Pipeline.profileMergeMoments(
      spark.read.parquet(s"$store/moments"))
    // the drain selects its own columns first, which also drops the
    // inferred batch=N partition column BEFORE merging — every batch's
    // copy would otherwise survive the exact tier's distinct
    val distincts =
      if (exactDistincts) Pipeline.profileDistinctCounts(
        spark.read.parquet(s"$store/dvals"))
      else Pipeline.profileDistinctCountsFromSketches(
        spark.read.parquet(s"$store/dvals").select(
          Pipeline.profileAllCols.map(c => col(s"${c}_hll")): _*))
    Pipeline.profileAssemble(moments.crossJoin(distincts))
  }

  /** One micro-batch of the CHUNK-STORE UPSERT — the maintenance loop a
    * RAG/embedding store runs as documents are re-crawled: the batch's
    * documents are chunked at ingest, each new chunk is flagged if its
    * chunk_hash already exists in the ACCUMULATED store from a different
    * document (the q_stream_histdedup shape at chunk granularity), and
    * the store is MERGED by document — a re-delivered document REPLACES
    * all of its old chunks (a shorter revision must not leave stale tail
    * chunks behind; (doc_id, chunk_id) remains the storage key).
    *
    * Same MERGE-over-parquet discipline as [[upsertBatch]]: the store is
    * hash-bucketed on doc_id, only the batch's touched buckets are
    * rewritten (survivors = bucket members anti-joined on the batch's
    * doc_ids), dynamic partition overwrite leaves other buckets alone,
    * and the localCheckpoint materializes the merge before the write
    * reads the files it replaces. The STORAGE merge is idempotent on
    * crash-replay (the re-run anti-joins its own chunks out and
    * rewrites the same (doc_id, chunk_id) rows); the dup_store flags are
    * at-least-once, not exactly-once — they reflect whatever store state
    * the attempt observed, so a replay that finds the crashed attempt's
    * same-batch sibling docs already landed can flag a shared-hash chunk
    * the uninterrupted run would not have.
    *
    * 100 TB shape: rewrite cost scales with the touched buckets, not the
    * store; the dup-flag join is a hash shuffle on the 16-byte
    * chunk_hash; the doc_id anti-join key set is batch-sized and
    * broadcast. A doc's bucket is a pure function of doc_id, so an
    * upsert can never strand chunks in an untouched bucket.
    */
  def chunkUpsertBatch(batch: DataFrame, storeDir: String,
                       size: Int = 64, stride: Int = 48,
                       nBuckets: Int = 16): Unit = {
    val spark = batch.sparkSession
    if (batch.isEmpty) return
    val chunkStoreSchema = StructType(Seq(
      StructField("doc_id", LongType), StructField("chunk_id", LongType),
      StructField("start_tok", LongType), StructField("n_tok", LongType),
      StructField("chunk_hash", StringType),
      StructField("dup_store", IntegerType),
      StructField("bucket", IntegerType)))
    val storePath = new org.apache.hadoop.fs.Path(storeDir)
    val fs = storePath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    // explicit schema: a pre-created-but-empty store dir must read as an
    // empty store, not fail schema inference
    val store =
      if (fs.exists(storePath))
        spark.read.schema(chunkStoreSchema).parquet(storeDir)
      else spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], chunkStoreSchema)
    val chunks = graft.operators.TextAnalysis
      .chunkDocumentsUnordered(batch, size, stride)
    // dup-at-insert: the hash already lives in the store under ANOTHER
    // document (own old chunks are about to be replaced, not duplicated)
    val dup = chunks.join(
        store.select(col("chunk_hash").as("h"), col("doc_id").as("od")),
        col("chunk_hash") === col("h") && col("doc_id") =!= col("od"),
        "left_semi")
      .select(col("doc_id"), col("chunk_id"))
      .withColumn("dup_store", lit(1))
    val flagged = chunks.join(dup, Seq("doc_id", "chunk_id"), "left")
      .na.fill(0, Seq("dup_store"))
      .withColumn("bucket", pmod(col("doc_id"), lit(nBuckets.toLong)).cast("int"))
    val ids = chunks.select("doc_id").distinct()
    val touched = flagged.select("bucket").distinct()
    val kept = store
      .join(broadcast(touched), Seq("bucket"), "left_semi")
      .join(broadcast(ids), Seq("doc_id"), "left_anti")
    val merged = kept.unionByName(flagged.select(kept.columns.map(col): _*))
      .repartition(col("bucket"))
      .localCheckpoint()
    merged.write.mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("bucket")
      .parquet(storeDir)
  }

  /** Oracle-facing chunk-store maintenance cycle: the documents table
    * arrives in doc_id-range micro-batches and is chunked+upserted into
    * the store; a FINAL batch re-delivers every 10th document REVISED
    * (text doubled — a deterministic re-crawl), whose chunks replace the
    * originals. The emitted census per document — chunk count, token
    * total, how many chunks were already in the store under another
    * document at insert time — proves both halves: replacement (revised
    * docs report their REVISED chunk counts, originals gone) and
    * cross-batch chunk dedup (dup flags reflect the accumulated store
    * at each batch's insert time, reproduced in SQL from the range
    * staging law).
    */
  def streamChunkUpsert(spark: SparkSession, sfDir: String,
                        nBatches: Int = 3, size: Int = 64,
                        stride: Int = 48): DataFrame = {
    val root = stageDocRanges(spark, sfDir, nBatches)
    // stage the revision batch AFTER the ranges (mtime order = replay
    // order): every 10th doc re-delivered with doubled text
    stageLateBatch(graft.Tables.documents(spark, sfDir)
      .filter(col("doc_id") % 10 === 0)
      .select(col("doc_id"),
        concat(col("text"), lit(" "), col("text")).as("text")),
      root, nBatches)
    runDocBatches(spark, s"$root/src", s"$root/ck") { (batch, _) =>
      chunkUpsertBatch(batch, s"$root/store", size, stride)
    }
    spark.read.parquet(s"$root/store")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_chunks"),
           sum(col("n_tok")).as("n_tok_total"),
           sum(col("dup_store")).cast("long").as("n_dup_store"))
      .withColumn("revised", (col("doc_id") % 10 === 0).cast("int"))
      .orderBy("doc_id")
  }

  /** One micro-batch of lexical-index maintenance: the batch's
    * documents are tokenized to postings and REPLACE their own prior
    * rows in the doc_id-bucketed store (anti-join by doc_id over the
    * touched buckets only, then a dynamic-partition overwrite — the
    * [[chunkUpsertBatch]] storage discipline on the BM25 posting
    * table). Re-delivery therefore cannot duplicate a document's
    * postings, which the serve hash would expose instantly (a doubled
    * tf changes every score the document participates in).
    */
  def lexicalUpsertBatch(batch: DataFrame, storeDir: String,
                         nBuckets: Int = 16): Unit = {
    val spark = batch.sparkSession
    if (batch.isEmpty) return
    val postingSchema = StructType(Seq(
      StructField("doc_id", LongType), StructField("term", StringType),
      StructField("tf", LongType), StructField("bucket", IntegerType)))
    val storePath = new org.apache.hadoop.fs.Path(storeDir)
    val fs = storePath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val store =
      if (fs.exists(storePath))
        spark.read.schema(postingSchema).parquet(storeDir)
      else spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], postingSchema)
    val fresh = graft.operators.TextAnalysis.docPostings(batch)
      .withColumn("bucket",
        pmod(col("doc_id"), lit(nBuckets.toLong)).cast("int"))
    val ids = batch.select("doc_id").distinct()
    val touched = fresh.select("bucket").distinct()
    val kept = store
      .join(broadcast(touched), Seq("bucket"), "left_semi")
      .join(broadcast(ids), Seq("doc_id"), "left_anti")
    val merged = kept.unionByName(fresh.select(kept.columns.map(col): _*))
      .repartition(col("bucket"))
      .localCheckpoint()
    merged.write.mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("bucket")
      .parquet(storeDir)
  }

  /** One micro-batch of POSITIONAL-index maintenance —
    * [[lexicalUpsertBatch]]'s storage discipline on the (doc_id, pos,
    * term) table: a re-delivered document REPLACES its position rows
    * (anti-join by doc_id over touched buckets, dynamic-partition
    * overwrite), so replay cannot duplicate positions — a doubled
    * position list would double phrase counts, which the shared serve
    * hash would expose instantly.
    */
  def positionalUpsertBatch(batch: DataFrame, storeDir: String,
                            nBuckets: Int = 16): Unit = {
    val spark = batch.sparkSession
    if (batch.isEmpty) return
    val posSchema = StructType(Seq(
      StructField("doc_id", LongType), StructField("pos", IntegerType),
      StructField("term", StringType), StructField("bucket", IntegerType)))
    val storePath = new org.apache.hadoop.fs.Path(storeDir)
    val fs = storePath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val store =
      if (fs.exists(storePath))
        spark.read.schema(posSchema).parquet(storeDir)
      else spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], posSchema)
    val fresh = graft.operators.TextAnalysis.positionalPostings(batch)
      .withColumn("bucket",
        pmod(col("doc_id"), lit(nBuckets.toLong)).cast("int"))
    val ids = batch.select("doc_id").distinct()
    val touched = fresh.select("bucket").distinct()
    val kept = store
      .join(broadcast(touched), Seq("bucket"), "left_semi")
      .join(broadcast(ids), Seq("doc_id"), "left_anti")
    val merged = kept.unionByName(fresh.select(kept.columns.map(col): _*))
      .repartition(col("bucket"))
      .localCheckpoint()
    merged.write.mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("bucket")
      .parquet(storeDir)
  }

  /** STREAMING POSITIONAL-INDEX FRESHNESS (q_stream_phrase_fresh) — the
    * [[streamBm25Fresh]] loop for the phrase tier: documents arrive in
    * micro-batches (the last one re-delivering every third doc — the
    * re-crawl), each batch upserts its position rows into the bucketed
    * store, and the drained store serves the phrase workload. Shares
    * q_phrase_topk's oracle verbatim: a live-maintained positional
    * index must lose nothing vs the offline build.
    */
  def streamPhraseFresh(spark: SparkSession, sfDir: String,
                        nBatches: Int = 3, nQueries: Long = 10,
                        k: Int = 5): DataFrame = {
    val docs = graft.Tables.documents(spark, sfDir).select("doc_id", "text")
    val root = stageRanges(docs, "doc_id", nBatches)
    stageLateBatch(docs.filter(col("doc_id") % 3 === 0), root, nBatches)
    runDocBatches(spark, s"$root/src", s"$root/ck") { (batch, _) =>
      positionalUpsertBatch(batch, s"$root/store")
    }
    graft.operators.TextAnalysis.searchPositionalIndex(
      spark, s"$root/store", graft.Tables.documents(spark, sfDir),
      nQueries, k)
  }

  /** One micro-batch of incremental SCD2 maintenance — the CDC loop
    * that keeps a type-2 dimension current as its change stream lands.
    * Batches must arrive in event-time order (the staging law here;
    * a production feed gets this from watermarked reordering): within
    * that contract, the merge is
    *
    *   1. REWIND: drop any version a user gained at-or-after this
    *      batch's first event for them, and re-open the version such a
    *      drop truncated — which makes a crash-replay of the same
    *      batch a no-op (rewind-and-reapply idempotence, spec-locked)
    *      while being a no-op itself on first delivery;
    *   2. CHANGE-POINTS: the batch's state runs, with each user's
    *      FIRST batch event compared against their open version's
    *      state, so an unchanged state extends silently;
    *   3. MERGE: close the open version at the user's first change
    *      point, append the batch's versions (last one open-ended).
    *
    * Store discipline is [[lexicalUpsertBatch]]'s: user_id-bucketed,
    * touched-buckets-only anti-join + dynamic-partition overwrite.
    * Per-batch cost scales with the batch and the touched users'
    * version rows, never the accumulated dimension.
    */
  def scd2UpsertBatch(batch: DataFrame, storeDir: String,
                      nBuckets: Int = 16): Unit = {
    val spark = batch.sparkSession
    if (batch.isEmpty) return
    val verSchema = StructType(Seq(
      StructField("user_id", LongType), StructField("state", StringType),
      StructField("valid_from_us", LongType),
      StructField("valid_to_us", LongType),
      StructField("bucket", IntegerType)))
    val storePath = new org.apache.hadoop.fs.Path(storeDir)
    val fs = storePath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val store0 =
      if (fs.exists(storePath)) spark.read.schema(verSchema).parquet(storeDir)
      else spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], verSchema)
    val ev = batch.select(col("user_id"), col("event_id"),
      col("event_type"), col("us"))
    val bounds = ev.groupBy("user_id").agg(min(col("us")).as("m"))
    // rewind: versions from a replayed attempt of THIS batch start
    // at-or-after m and are dropped; the version such an attempt closed
    // had valid_to >= m and re-opens. First deliveries rewind nothing.
    val store = store0.join(broadcast(bounds), Seq("user_id"), "left")
      .filter(col("m").isNull || col("valid_from_us") < col("m"))
      .withColumn("valid_to_us",
        when(col("m").isNotNull && col("valid_to_us") >= col("m"),
          lit(null).cast("long")).otherwise(col("valid_to_us")))
      .drop("m")
    val open = store.filter(col("valid_to_us").isNull)
      .select(col("user_id"), col("state").as("open_state"))
    val w = org.apache.spark.sql.expressions.Window.partitionBy("user_id").orderBy("us", "event_id")
    val flagged = ev
      .withColumn("prev_type", lag(col("event_type"), 1).over(w))
      .join(open, Seq("user_id"), "left")
      .filter(when(col("prev_type").isNull,
          col("open_state").isNull || col("open_state") =!= col("event_type"))
        .otherwise(col("prev_type") =!= col("event_type")))
    val newVers = flagged
      .withColumn("valid_to_us", lead(col("us"), 1).over(w))
      .select(col("user_id"), col("event_type").as("state"),
        col("us").as("valid_from_us"), col("valid_to_us"))
    val firstChg = flagged.groupBy("user_id").agg(min(col("us")).as("close_us"))
    val closedOpen = store.filter(col("valid_to_us").isNull)
      .join(broadcast(firstChg), Seq("user_id"))
      .select(col("user_id"), col("state"), col("valid_from_us"),
        col("close_us").as("valid_to_us"))
    val batchUsers = ev.select("user_id").distinct()
    val withBucket = (df: DataFrame) => df.withColumn("bucket",
      pmod(col("user_id"), lit(nBuckets.toLong)).cast("int"))
    val touched = withBucket(batchUsers).select("bucket").distinct()
    val chgUsers = firstChg.select("user_id")
    // keep: rows of touched buckets, minus the open rows the merge
    // replaces (users with a change point); the store frame already
    // carries `bucket` from the partitioned read
    val kept = store
      .join(broadcast(touched), Seq("bucket"), "left_semi")
      .join(broadcast(chgUsers.withColumn("c", lit(1))), Seq("user_id"), "left")
      .filter(col("valid_to_us").isNotNull || col("c").isNull)
      .drop("c")
    val merged = kept
      .unionByName(withBucket(closedOpen).select(kept.columns.map(col): _*))
      .unionByName(withBucket(newVers).select(kept.columns.map(col): _*))
      .repartition(col("bucket"))
      .localCheckpoint()
    merged.write.mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("bucket")
      .parquet(storeDir)
  }

  /** Serve the maintained dimension: version numbers and the current
    * flag derive from the stored intervals (a change-point store never
    * persists ordinals — renumbering under merge would be a write
    * amplifier), so the serve is one user_id-partitioned window over
    * version-count-sized groups.
    */
  def scd2FromStore(spark: SparkSession, storeDir: String): DataFrame = {
    val wv = org.apache.spark.sql.expressions.Window.partitionBy("user_id").orderBy("valid_from_us")
    spark.read.parquet(storeDir)
      .withColumn("version_no", row_number().over(wv).cast("long"))
      .select(col("user_id"), col("state"), col("version_no"),
        col("valid_from_us"), col("valid_to_us"),
        col("valid_to_us").isNull.cast("int").as("is_current"))
      .orderBy("user_id", "version_no")
  }

  /** STREAMING SCD2 (q_stream_scd2): the events change stream arrives
    * in event-time-ordered micro-batches and the type-2 dimension is
    * maintained incrementally ([[scd2UpsertBatch]]); the drained store
    * must equal the one-shot batch [[graft.operators.Events.scd2]] —
    * the query shares q_scd2's oracle verbatim, which catches a
    * version duplicated by a bad merge, a run split across a batch
    * boundary, or an open version closed at the wrong instant.
    */
  def streamScd2(spark: SparkSession, sfDir: String,
                 nBatches: Int = 3): DataFrame = {
    val ev = graft.Tables.events(spark, sfDir)
      .select(col("event_id"), unix_micros(col("ts")).as("us"),
        col("user_id"), col("event_type"))
    // time-range staging: contiguous us ranges ARE the in-order contract
    val root = stageRanges(ev, "us", nBatches)
    runStagedBatches(spark, ev.schema, s"$root/src", s"$root/ck") {
      (batch, _) => scd2UpsertBatch(batch, s"$root/store")
    }
    scd2FromStore(spark, s"$root/store")
  }

  /** STREAMING LEXICAL FRESHNESS (q_stream_bm25_fresh): the BM25
    * posting store maintained live — documents arrive in micro-batches
    * and each batch's postings replace that document's rows in the
    * store ([[lexicalUpsertBatch]]); a final staged batch RE-DELIVERS
    * every third document unchanged, so replace-not-duplicate is
    * exercised, not just claimed. The drained serve
    * ([[graft.operators.TextAnalysis.searchLexicalIndex]] over the
    * accumulated store) must equal the one-shot inline BM25 — the
    * query shares q_bm25_topk's oracle verbatim, the lexical twin of
    * [[streamDocFresh]]'s vector loop: both halves of the hybrid tier
    * now stay fresh under streaming ingest.
    *
    * 100 TB shape: per batch one tokenize + hash-agg over the BATCH,
    * a touched-buckets-only anti-join against the store, and a
    * dynamic-partition overwrite of those buckets — cost scales with
    * the batch and the touched slice, never the accumulated corpus.
    * Global stats (n_docs, avgdl, df) are not maintained state; they
    * recompute from the store at serve time in one aggregation.
    */
  def streamBm25Fresh(spark: SparkSession, sfDir: String,
                      nBatches: Int = 3, nQueries: Long = 10,
                      k: Int = 5): DataFrame = {
    val docs = graft.Tables.documents(spark, sfDir).select("doc_id", "text")
    val root = stageRanges(docs, "doc_id", nBatches)
    stageLateBatch(docs.filter(col("doc_id") % 3 === 0), root, nBatches)
    runDocBatches(spark, s"$root/src", s"$root/ck") { (batch, _) =>
      lexicalUpsertBatch(batch, s"$root/store")
    }
    graft.operators.TextAnalysis.searchLexicalIndex(
      spark, s"$root/store", nQueries, k)
  }

  /** STREAMING JOIN-VIEW MAINTENANCE (q_stream_mv_join) — incremental
    * view maintenance for a JOIN, the capability the MV family's
    * aggregate merges cannot express: the orders⋈lineitem enriched view
    * is kept current as BOTH sides arrive interleaved across
    * micro-batches (batch i carries orders range i and lineitem range
    * i+1 mod n, so every pair has one side arriving after the other —
    * both delta directions are exercised, not just the easy
    * static-dimension case). Per batch the classic delta-join law:
    * ΔV = ΔL ⋈ (O_prev ∪ ΔO)  ∪  L_prev ⋈ ΔO — each (order, line) pair
    * joins in EXACTLY the batch where its later side lands, so the
    * accumulated view deltas union to precisely the one-shot join (the
    * oracle), with no pair duplicated and none lost.
    *
    * Replay idempotence: base-side partials and view deltas land under
    * their own batch=N partitions (dynamic-overwrite insertInto);
    * "previous" state is the base store FILTERED to batch < N via the
    * partition column, so a crashed batch that already wrote its own
    * partials recomputes the identical delta. 100 TB shape: BOTH base
    * stores are BUCKETED TABLES on the join key (bucketBy(8, okey) +
    * batch partitions), so the per-batch delta joins read the
    * accumulated history WITHOUT an Exchange on the store side — only
    * the batch-sized delta shuffles; history is never re-joined and
    * never re-shuffled. The delta law is distributed over the union
    * (ΔL⋈O_prev ∪ ΔL⋈ΔO ∪ L_prev⋈ΔO) so the bucketed sides join
    * directly instead of losing their partitioning under a union.
    * PlanSpec locks the zero-Exchange-above-store-scan property.
    */
  def streamMvJoin(spark: SparkSession, sfDir: String,
                   nBatches: Int = 3): DataFrame =
    streamMvJoinFrames(spark, graft.Tables.orders(spark, sfDir),
      graft.Tables.lineitem(spark, sfDir), nBatches)

  /** Schema of one MV base-store side: the envelope minus the tag, plus
    * the batch partition column.
    */
  private val mvBaseSchema = StructType(Seq(
    StructField("okey", LongType), StructField("lnum", IntegerType),
    StructField("odate", StringType),
    StructField("price", org.apache.spark.sql.types.DecimalType(18, 2)),
    StructField("batch", LongType)))

  /** Create the two EMPTY bucketed base stores the join-view maintainer
    * accumulates into: bucketBy(8, okey) + batch partitions. Bucketing
    * on the JOIN KEY is what makes every later delta join read history
    * WITHOUT an Exchange on the store side — the q_bucketed_join layout
    * discipline applied at store level.
    */
  /** Default MV-store bucket count: the session's shuffle parallelism.
    * Bucket count is a SCALE knob, not a constant — each bucket is one
    * task in every later history join, so 8 buckets on a 32-core
    * machine (or a 1000-core cluster) caps the store-side read at 8-way
    * parallelism. Measured at the 16× probe: 8 buckets regressed the
    * delta loop ~60% vs matching the core count.
    */
  private def mvBuckets(spark: SparkSession): Int =
    spark.conf.get("spark.sql.shuffle.partitions", "32").toInt.max(8)

  private[graft] def createMvBaseTables(spark: SparkSession,
                                        oTable: String, lTable: String,
                                        nBuckets: Int = 0): Unit = {
    val buckets = if (nBuckets > 0) nBuckets else mvBuckets(spark)
    Seq(oTable, lTable).foreach { t =>
      spark.sql(s"DROP TABLE IF EXISTS $t")
      // the in-memory catalog forgets tables across JVMs but dirs stay
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(
        spark.conf.get("spark.sql.warehouse.dir")
          .stripPrefix("file:") + s"/$t"))
      spark.createDataFrame(
          spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], mvBaseSchema)
        .write.mode("overwrite")
        .bucketBy(buckets, "okey").sortBy("okey")
        .partitionBy("batch")
        .saveAsTable(t)
    }
  }

  /** Per-session MAINTAINER clone for [[appendMvBase]]: shared
    * SparkContext and catalog, isolated SQLConf, with dynamic
    * partition-overwrite set ONCE at creation. insertInto honors only
    * the session conf (the writer-level option is ignored on that path
    * — measured: each batch statically overwrote the WHOLE table), and
    * toggling the conf around each batch on the caller's session would
    * leak dynamic-overwrite semantics into any concurrent write on that
    * session. Weak keys: a dropped caller session releases its clone.
    */
  private val maintainers =
    new java.util.WeakHashMap[SparkSession, SparkSession]()
  private def maintainerSession(spark: SparkSession): SparkSession =
    maintainers.synchronized {
      val existing = maintainers.get(spark)
      if (existing != null) existing
      else {
        val m = spark.newSession()
        m.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
        maintainers.put(spark, m)
        m
      }
    }

  /** Land one batch's base partials under their batch=N partition:
    * dynamic-overwrite insertInto — replay-idempotent (a crashed batch
    * rewrites exactly its own partition) AND bucket-preserving (the
    * files carry the bucket suffix; verified in LandingSpec).
    * insertInto maps columns BY POSITION: partials first, batch last.
    * The write runs on the [[maintainerSession]] clone; the partial
    * crosses sessions via a global temp view (context-scoped, unlike
    * session temp views — the catalog tables are shared anyway).
    */
  private[graft] def appendMvBase(partial: DataFrame, table: String,
                                  batchId: Long): Unit = {
    val maint = maintainerSession(partial.sparkSession)
    val vn = s"graft_mvj_partial_${batchId}_" +
      java.util.UUID.randomUUID().toString.take(8).replace("-", "")
    partial.createOrReplaceGlobalTempView(vn)
    try maint.table(s"global_temp.$vn")
      .select(col("okey"), col("lnum"), col("odate"), col("price"))
      .withColumn("batch", lit(batchId))
      .write.mode("overwrite")
      .insertInto(table)
    finally { partial.sparkSession.catalog.dropGlobalTempView(vn); () }
  }

  /** The per-batch delta-join law, distributed over the union so the
    * BUCKETED store sides join directly (a union would erase their
    * output partitioning): ΔV = ΔL⋈O_prev ∪ ΔL⋈ΔO ∪ L_prev⋈ΔO.
    * O_prev/L_prev scans carry the bucket layout (no Exchange above
    * them — PlanSpec-locked); only the batch-sized deltas shuffle.
    */
  private[graft] def mvDeltaJoin(oPrev: DataFrame, lPrev: DataFrame,
                                 oNew: DataFrame, lNew: DataFrame)
      : DataFrame = {
    val lNewS = lNew.select(col("okey"), col("lnum"), col("price"))
    val oNewS = oNew.select(col("okey"), col("odate"))
    lNewS.join(oPrev.select(col("okey"), col("odate")), Seq("okey"))
      .unionByName(lNewS.join(oNewS, Seq("okey")))
      .unionByName(lPrev.select(col("okey"), col("lnum"), col("price"))
        .join(oNewS, Seq("okey")))
      .select(col("okey"), col("lnum"), col("odate"), col("price"))
  }

  /** DEPLOYMENT-AWARE base-store layout default: bucketed stores pay a
    * write-side shuffle so every later history join is exchange-free —
    * a NETWORK saving a single-JVM local master cannot realize (its
    * Exchange is a memcpy while the layout's sort/merge costs stay
    * real: 1.37× in-suite, 49-54 s vs 31 s at the 16× probe, 3.5× at
    * sf1). Local masters therefore default to plain batch-dir stores;
    * any distributed master keeps the bucketed layout. Both paths are
    * oracle-equal (StreamingSpec locks the shared hash) and explicitly
    * selectable via the parameter; PlanSpec locks the cluster layout's
    * zero-Exchange property independently of this default.
    */
  private[graft] def defaultBucketedStores(spark: SparkSession): Boolean = {
    // single-JVM masters only: local / local[K] / local[*]. The
    // local-cluster[...] test master forks REAL executor JVMs with
    // serialized Exchange traffic — it gets the cluster layout (the
    // ClusterProbe tool measures exactly that boundary).
    val m = spark.sparkContext.master
    !(m == "local" || m.startsWith("local["))
  }

  /** Frames-parametric core of [[streamMvJoin]] (the ScaleProbe seam). */
  /** `bucketedStores` selects the base-store layout: bucketed tables
    * (cluster default — zero Exchange above the history scans; total
    * shuffle volume ≈ one pass over the facts regardless of batch
    * count) vs plain batch=N parquet dirs (local default — no
    * write-side bucketing shuffle, but every batch re-shuffles the
    * WHOLE accumulated history: total shuffle ≈ facts·(nBatches−1)/2
    * per side). The crossover is the history/batch ratio — ScaleProbe
    * measures both at depth; `None` picks by [[defaultBucketedStores]].
    */
  def streamMvJoinFrames(spark: SparkSession, ordersRaw: DataFrame,
                         linesRaw: DataFrame, nBatches: Int = 3,
                         bucketedStores: Option[Boolean] = None): DataFrame = {
    val bucketed = bucketedStores.getOrElse(defaultBucketedStores(spark))
    import java.nio.file.{Files, Paths}
    val runId = UUID.randomUUID().toString.take(8)
    val root = s"${sys.props("java.io.tmpdir")}/graft_stream_mvj/$runId"
    Files.createDirectories(Paths.get(s"$root/src"))
    val orders = ordersRaw
      .select(lit("o").as("tag"), col("o_orderkey").as("okey"),
        lit(0).as("lnum"),
        date_format(col("o_orderdate"), "yyyy-MM-dd").as("odate"),
        lit(null).cast("decimal(18,2)").as("price"))
    val lines = linesRaw
      .select(lit("l").as("tag"), col("l_orderkey").as("okey"),
        col("l_linenumber").as("lnum"),
        lit(null).cast("string").as("odate"),
        col("l_extendedprice").cast("decimal(18,2)").as("price"))
    val bounds = orders.agg(min(col("okey")), max(col("okey"))).head()
    val (lo, hi) = (bounds.getLong(0), bounds.getLong(1))
    val span = (hi - lo + nBatches) / nBatches
    def range(df: DataFrame, i: Int) =
      df.filter(col("okey") >= lo + i * span && col("okey") < lo + (i + 1) * span)
    (0 until nBatches).foreach { i =>
      val stagedir = s"$root/stage$i"
      range(orders, i).unionByName(range(lines, (i + 1) % nBatches))
        .coalesce(1).write.parquet(stagedir)
      val listing = Files.list(Paths.get(stagedir))
      val part =
        try listing.toArray.map(_.toString).find(_.endsWith(".parquet")).get
        finally listing.close()
      val target = Paths.get(s"$root/src/range$i.parquet")
      Files.move(Paths.get(part), target)
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(stagedir))
      Files.setLastModifiedTime(target,
        java.nio.file.attribute.FileTime.fromMillis(1000000000000L + i * 60000L))
    }
    val envSchema = StructType(Seq(
      StructField("tag", StringType), StructField("okey", LongType),
      StructField("lnum", IntegerType), StructField("odate", StringType),
      StructField("price", org.apache.spark.sql.types.DecimalType(18, 2))))
    val (oTable, lTable) = (s"graft_mvj_obase_$runId", s"graft_mvj_lbase_$runId")
    if (bucketed) createMvBaseTables(spark, oTable, lTable)
    def readBaseDir(dir: String, beforeBatch: Long): DataFrame = {
      val p = new org.apache.hadoop.fs.Path(dir)
      val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
      if (fs.exists(p))
        spark.read.parquet(dir).filter(col("batch") < beforeBatch)
      else spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], mvBaseSchema)
    }
    runStagedBatches(spark, envSchema, s"$root/src", s"$root/ck") {
      (batch, batchId) =>
        if (!batch.isEmpty) {
          val oNew = batch.filter(col("tag") === "o")
            .select(col("okey"), col("lnum"), col("odate"), col("price"))
            .localCheckpoint()
          val lNew = batch.filter(col("tag") === "l")
            .select(col("okey"), col("lnum"), col("odate"), col("price"))
            .localCheckpoint()
          val oPrev =
            if (bucketed)
              spark.table(oTable).filter(col("batch") < batchId)
            else readBaseDir(s"$root/obase", batchId)
          val lPrev =
            if (bucketed)
              spark.table(lTable).filter(col("batch") < batchId)
            else readBaseDir(s"$root/lbase", batchId)
          val dv = mvDeltaJoin(oPrev, lPrev, oNew, lNew)
          // NO coalesce(1): view deltas and base partials are
          // fact-sized (unlike the census partials the other monitors
          // land), so they write at natural parallelism — the probe
          // caught a single-threaded write serializing 3M-row deltas
          dv.write.mode("overwrite").parquet(s"$root/view/batch=$batchId")
          if (bucketed) {
            // dynamic-overwrite insertInto = the replayable batch=N
            // write that PRESERVES the table's bucket layout (bucket-
            // suffixed files per partition)
            appendMvBase(oNew, oTable, batchId)
            appendMvBase(lNew, lTable, batchId)
          } else {
            // batch=N dir supplies the partition value on read
            oNew.write.mode("overwrite").parquet(s"$root/obase/batch=$batchId")
            lNew.write.mode("overwrite").parquet(s"$root/lbase/batch=$batchId")
          }
          ()
        }
    }
    // the view parquet is self-contained — the base tables are per-run
    // working state and are dropped with the drain
    if (bucketed)
      Seq(oTable, lTable).foreach(t => spark.sql(s"DROP TABLE IF EXISTS $t"))
    // (okey, lnum, price) is a unique key of the view at every SF —
    // (okey, lnum) alone is NOT, so price joins the sort to make the
    // emitted order total (tie order would otherwise be plan-dependent)
    spark.read.parquet(s"$root/view")
      .select(col("okey").as("o_orderkey"), col("lnum"),
        col("odate"), col("price").cast("double").as("price"))
      .orderBy("o_orderkey", "lnum", "price")
  }

  /** One micro-batch of BINARY-CODE-store maintenance —
    * [[lexicalUpsertBatch]]'s storage discipline on the (vec_id,
    * code_lo, code_hi) table: the batch's vectors are sign-bit
    * quantized and REPLACE their code rows (anti-join by vec_id over
    * touched buckets, dynamic-partition overwrite), so a re-delivered
    * vector cannot leave a stale or duplicate code — a duplicate would
    * surface a phantom candidate, which the shared serve hash would
    * expose instantly.
    */
  def binaryUpsertBatch(batch: DataFrame, storeDir: String,
                        nBuckets: Int = 16): Unit = {
    val spark = batch.sparkSession
    if (batch.isEmpty) return
    val codeSchema = StructType(Seq(
      StructField("vec_id", LongType), StructField("code_lo", LongType),
      StructField("code_hi", LongType), StructField("bucket", IntegerType)))
    val storePath = new org.apache.hadoop.fs.Path(storeDir)
    val fs = storePath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val store =
      if (fs.exists(storePath))
        spark.read.schema(codeSchema).parquet(storeDir)
      else spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], codeSchema)
    val fresh = graft.operators.Similarity.binaryQuantizeUnordered(batch)
      .select("vec_id", "code_lo", "code_hi")
      .withColumn("bucket",
        pmod(col("vec_id"), lit(nBuckets.toLong)).cast("int"))
    val ids = batch.select("vec_id").distinct()
    val touched = fresh.select("bucket").distinct()
    val kept = store
      .join(broadcast(touched), Seq("bucket"), "left_semi")
      .join(broadcast(ids), Seq("vec_id"), "left_anti")
    val merged = kept.unionByName(fresh.select(kept.columns.map(col): _*))
      .repartition(col("bucket"))
      .localCheckpoint()
    merged.write.mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("bucket")
      .parquet(storeDir)
  }

  /** STREAMING BINARY-INDEX FRESHNESS (q_stream_binary_fresh) — the
    * quantize-at-ingest loop for the 1-bit tier: vectors arrive in
    * micro-batches, each batch is sign-bit encoded and upserted into
    * the vec_id-bucketed code store ([[binaryUpsertBatch]] — replace-
    * not-duplicate; a staged final batch RE-DELIVERS every third id to
    * exercise it), and the drained store serves the same two-stage
    * Hamming-shortlist + cosine-re-rank search the offline build
    * serves — q_hamming_search's oracle shared VERBATIM, so streamed
    * maintenance provably loses nothing vs the one-shot build.
    *
    * 100 TB shape: per batch the encode is map-only over the batch,
    * the upsert rewrites only touched buckets (batch-sized), and the
    * serve scans 16-byte codes, never vectors.
    */
  def streamBinaryFresh(spark: SparkSession, sfDir: String,
                        nBatches: Int = 3, nQueries: Int = 20,
                        k: Int = 10, m: Int = 50): DataFrame = {
    val emb = graft.Tables.embeddings(spark, sfDir)
    val root = stageRanges(emb, "vec_id", nBatches)
    stageLateBatch(emb.filter(col("vec_id") % 3 === 0), root, nBatches)
    runStagedBatches(spark, emb.schema, s"$root/src", s"$root/ck") {
      (batch, _) => binaryUpsertBatch(batch, s"$root/store")
    }
    graft.operators.Similarity.searchBinaryIndex(
      spark, s"$root/store", emb, nQueries, k, m)
  }

  /** STREAMING INDEX MAINTENANCE — the loop that keeps a persisted
    * IVF-PQ index fresh as vectors arrive: the index is built OFFLINE on
    * the historical slice (vec_id >= splitId), then each micro-batch of
    * new vectors is UPSERTED against the frozen saved codebooks — a
    * [[graft.operators.Similarity.deleteFromIvfPqIndex]] tombstone at
    * gen−1 (kills any earlier delivery of the same ids, a no-op for
    * first deliveries) plus a
    * [[graft.operators.Similarity.appendToIvfPqIndex]] at gen = batch+1.
    * A final staged batch RE-DELIVERS every third streamed id (the
    * re-crawl), so replace-not-duplicate is exercised, not just claimed.
    *
    * Served census after the drain = the frozen-codebook search over the
    * full corpus — exactly q_ivfpq_append's semantics, so the two share
    * an oracle: the streamed maintenance path must lose nothing vs the
    * one-shot batch append.
    *
    * 100 TB shape: per batch, one broadcast-argmin pass per quantizer
    * over the BATCH only, a batch-sized tombstone append, and a gen=N
    * dynamic-partition write (idempotent on crash replay — a re-run
    * rewrites its own generation directory; re-appended tombstone rows
    * are harmless duplicates). Codebook-sized driver state only; the
    * serve-side tombstone set is bounded by delivered-twice ids until
    * [[graft.operators.Similarity.compactIvfPqIndex]] folds it away.
    */
  def streamIndexUpsert(spark: SparkSession, sfDir: String,
                        splitId: Long = 100, nBatches: Int = 3,
                        nQueries: Int = 20, k: Int = 10,
                        nprobe: Int = 2, trainIters: Int = 2): DataFrame = {
    import java.nio.file.{Files, Paths}
    val emb = graft.Tables.embeddings(spark, sfDir)
    // offline build on the historical slice; the stream maintains the rest
    val fresh = emb.filter(col("vec_id") < splitId)
    val root = stageRanges(fresh, "vec_id", nBatches)
    val indexDir = s"$root/index"
    graft.operators.Similarity.buildIvfPqIndex(
      emb.filter(col("vec_id") >= splitId), indexDir, trainIters)
    // stage the re-delivery batch after the ranges (mtime order = replay
    // order): every third streamed id arrives again, same embedding
    stageLateBatch(fresh.filter(col("vec_id") % 3 === 0), root, nBatches)
    runStagedBatches(spark, emb.schema, s"$root/src", s"$root/ck") {
      (batch, batchId) =>
        if (!batch.isEmpty) {
          val gen = batchId + 1
          graft.operators.Similarity.deleteFromIvfPqIndex(
            batch.select("vec_id"), indexDir, uptoGen = gen - 1)
          graft.operators.Similarity.appendToIvfPqIndex(batch, indexDir, gen)
        }
    }
    graft.operators.Similarity.searchIvfPqIndex(spark, indexDir,
      emb.filter(col("vec_id") < nQueries)
        .select(col("vec_id").as("query_id"), col("embedding")),
      k, nprobe)
  }

  /** STREAMING RAG FRESHNESS end-to-end at CHUNK granularity — the loop
    * a live retrieval deployment runs: the persisted IVF-PQ index is
    * built OFFLINE over the chunk embeddings of the historical corpus
    * (doc_id >= splitDoc); then documents arrive in micro-batches and
    * each batch is chunked at ingest, embedded (the shared
    * [[graft.operators.Similarity.chunkEmbeddingsFrom]] law), and
    * UPSERTED into the index against the frozen saved codebooks
    * (tombstone at gen−1 + append at gen — [[streamIndexUpsert]]'s
    * discipline at chunk granularity). After the drain, RAG queries
    * (the chunks of the first nQueryDocs documents — which themselves
    * ARRIVED VIA THE STREAM) are served from the updated artifacts
    * through the from-files shortlist + exact re-rank, with provenance.
    *
    * The oracle rebuilds the same frozen-codebook semantics in SQL:
    * quantizers trained on the historical chunk slice only, cells/codes
    * over every chunk — retrieving the streamed docs' chunks proves the
    * index is fresh; hash-matching proves the streamed maintenance path
    * equals a one-shot frozen-codebook batch build.
    *
    * 100 TB shape: per batch, chunking/embedding are map-only over the
    * batch, the upsert is batch-sized (broadcast-argmin + gen=N
    * dynamic-partition write), and the serve is the bounded
    * nprobe × cell scan — nothing in the loop touches the accumulated
    * corpus except the delete-set-sized tombstone anti-join.
    */
  def streamRagFresh(spark: SparkSession, sfDir: String,
                     splitDoc: Long = 100, nBatches: Int = 3,
                     k: Int = 5, m: Int = 15, nprobe: Int = 2,
                     trainIters: Int = 2, size: Int = 64, stride: Int = 48,
                     dims: Int = 8, nLabels: Int = 8,
                     nQueryDocs: Int = 10): DataFrame = {
    import graft.operators.{Similarity, TextAnalysis}
    val docs = graft.Tables.documents(spark, sfDir)
    // chunk rows WITH their embedding — the chunk-VECTOR-store row a
    // serving tier owns: raw vector for exact re-rank, span for
    // provenance. The serve below reads THIS store, it never re-chunks
    // or re-encodes the corpus (with a real encoder that would be a
    // full inference pass per query batch).
    def storeRowsOf(d: DataFrame): DataFrame = {
      val chunks = TextAnalysis.chunkDocumentsUnordered(d, size, stride)
        .withColumn("vec_id", col("doc_id") * lit(1000000L) + col("chunk_id"))
      Similarity.chunkEmbeddingsFrom(chunks, dims, nLabels)
        .join(chunks.select("vec_id", "doc_id", "chunk_id",
          "start_tok", "n_tok"), "vec_id")
    }
    val root = stageRanges(
      docs.filter(col("doc_id") < splitDoc).select("doc_id", "text"),
      "doc_id", nBatches)
    val indexDir = s"$root/index"
    val storeDir = s"$root/vecstore"
    // offline: historical slice → index artifacts + its vector-store rows
    val init = storeRowsOf(docs.filter(col("doc_id") >= splitDoc))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      .transform(graft.CacheRegistry.track)
    Similarity.buildIvfPqIndex(init, indexDir, trainIters)
    init.write.mode("overwrite").parquet(s"$storeDir/batch=init")
    // each arriving batch: chunk + embed at ingest, upsert the INDEX
    // (frozen codebooks, tombstone at gen−1 + append at gen) and land
    // the batch's store rows in an idempotent batch=N dir. Batches here
    // are disjoint doc ranges; a re-crawl world would rewrite the
    // touched store buckets instead — chunkUpsertBatch's device, owned
    // by q_stream_chunk_upsert.
    runDocBatches(spark, s"$root/src", s"$root/ck") { (batch, batchId) =>
      if (!batch.isEmpty) {
        val rows = storeRowsOf(batch).persist()
        val gen = batchId + 1
        Similarity.deleteFromIvfPqIndex(rows.select("vec_id"), indexDir,
          uptoGen = gen - 1)
        Similarity.appendToIvfPqIndex(rows, indexDir, gen)
        rows.write.mode("overwrite").parquet(s"$storeDir/batch=$batchId")
        rows.unpersist()
        ()
      }
    }
    // serve FROM THE ARTIFACTS: queries, re-rank vectors, and
    // provenance all come from the accumulated store + saved index
    val store = spark.read.parquet(storeDir)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      .transform(graft.CacheRegistry.track)
    val hits = Similarity.searchIvfPqIndexRerank(spark, indexDir,
      store.select("vec_id", "label", "embedding"),
      nQueries = nQueryDocs * 1000000, k = k, m = m, nprobe = nprobe)
    Similarity.ragProvenance(hits,
        store.select("vec_id", "doc_id", "chunk_id", "start_tok", "n_tok"))
      .orderBy("q_doc_id", "q_chunk_id", "rank")
  }

  /** STREAMING DOC-TIER FRESHNESS — [[streamIndexUpsert]]'s device one
    * level up ([[streamRagFresh]] keeps the CHUNK index fresh; this
    * keeps the DOC-level retrieval tier of q_doc_ivfpq fresh): the
    * doc-tier IVF-PQ index is built OFFLINE over the POOLED vectors
    * ([[graft.operators.Similarity.docVectors]]) of the historical
    * corpus (doc_id >= splitDoc); documents then arrive in
    * micro-batches and each batch is chunked → embedded → MEAN-POOLED
    * at ingest (pooling is doc-local, so a batch pools identically to
    * the batch-free corpus) and upserted against the frozen saved
    * codebooks — tombstone at gen−1 + append at gen. A final staged
    * batch RE-DELIVERS every third streamed doc unchanged (the
    * re-crawl), exercising replace-not-duplicate at the pooled tier.
    * After the drain, doc queries are served from the artifacts; the
    * drained serve equals a one-shot frozen-codebook build over every
    * pooled vector, which is what the oracle computes.
    *
    * 100 TB shape: per batch, chunk/embed/pool are map + one
    * batch-sized hash agg; the upsert is batch-sized; the serve is the
    * bounded nprobe × cell scan. Nothing reprocesses the accumulated
    * corpus.
    */
  /** Per-process memo of [[streamDocFresh]]'s OFFLINE doc-tier index
    * build, keyed by (corpus dir, split, train iters) → the built
    * artifact directory. The build is the one-time amortized asset of
    * the deployment this query models (the stream keeps a PRE-BUILT
    * frozen-codebook index fresh; rebuilding it per invocation charges
    * an offline cost to the streaming path) — same pricing principle as
    * Pipeline's packedMemo. Because each run MUTATES its index
    * (tombstones + generation appends), the memo holds a pristine
    * build and every invocation works on a fresh file-level COPY — so
    * results are bit-identical to an inline build (the build is
    * deterministic: it is oracle-hash-matched), reps just stop
    * re-paying it.
    */
  private val docIndexMemo =
    new java.util.concurrent.ConcurrentHashMap[String, String]()

  private def copyTree(src: java.nio.file.Path,
                       dst: java.nio.file.Path): Unit = {
    import java.nio.file.{Files, StandardCopyOption}
    val it = Files.walk(src).iterator()
    while (it.hasNext) {
      val p = it.next()
      val t = dst.resolve(src.relativize(p))
      if (Files.isDirectory(p)) { Files.createDirectories(t); () }
      else { Files.copy(p, t, StandardCopyOption.REPLACE_EXISTING); () }
    }
  }

  def streamDocFresh(spark: SparkSession, sfDir: String,
                     splitDoc: Long = 100, nBatches: Int = 3,
                     nQueryDocs: Long = 10, k: Int = 5, nprobe: Int = 2,
                     trainIters: Int = 2): DataFrame = {
    import java.nio.file.{Files, Paths}
    import graft.operators.Similarity
    val docs = graft.Tables.documents(spark, sfDir)
    val fresh = docs.filter(col("doc_id") < splitDoc).select("doc_id", "text")
    val root = stageRanges(fresh, "doc_id", nBatches)
    val indexDir = s"$root/index"
    val built = docIndexMemo.computeIfAbsent(
      s"$sfDir|$splitDoc|$trainIters", _ => {
        val d = Files.createTempDirectory("graft_docfresh_idx").toString
        Similarity.buildIvfPqIndex(
          Similarity.docVectors(docs.filter(col("doc_id") >= splitDoc)),
          d, trainIters)
        d
      })
    copyTree(Paths.get(built), Paths.get(indexDir))
    // re-delivery batch staged after the ranges: same text, so the
    // upsert must REPLACE (tombstone + re-append), never duplicate
    stageLateBatch(fresh.filter(col("doc_id") % 3 === 0), root, nBatches)
    runDocBatches(spark, s"$root/src", s"$root/ck") { (batch, batchId) =>
      if (!batch.isEmpty) {
        val rows = Similarity.docVectors(batch).persist()
        val gen = batchId + 1
        Similarity.deleteFromIvfPqIndex(rows.select("vec_id"), indexDir,
          uptoGen = gen - 1)
        Similarity.appendToIvfPqIndex(rows, indexDir, gen)
        rows.unpersist()
        ()
      }
    }
    Similarity.searchIvfPqIndex(spark, indexDir,
      Similarity.docVectors(docs.filter(col("doc_id") < nQueryDocs))
        .select(col("vec_id").as("query_id"), col("embedding")),
      k, nprobe)
  }

  /** Streaming gap-based sessionization via session_window (T8): start is
    * the first event time, end is last + gap — emitted as (start, last
    * event) micros to match the batch sessionize contract.
    */
  def streamSessionize(spark: SparkSession, sfDir: String,
                       gapMinutes: Int): DataFrame = {
    val table = s"graft_stream_sess_${UUID.randomUUID().toString.take(8)}"
    val gapUs = gapMinutes * 60L * 1000000L
    val q = eventsStream(spark, sfDir)
      .withWatermark("ts", "1 hour")
      .groupBy(session_window(col("ts"), s"$gapMinutes minutes").as("w"),
               col("user_id"))
      .agg(count(lit(1)).as("n_events"),
           sum(col("value").cast("decimal(18,2)")).cast("double").as("sum_value"))
      .writeStream
      .format("memory")
      .queryName(table)
      .outputMode("complete")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    spark.table(table)
      .select(col("user_id"),
              unix_micros(col("w.start")).as("session_start_us"),
              (unix_micros(col("w.end")) - gapUs).as("session_end_us"),
              col("n_events"), col("sum_value"))
      .orderBy("user_id", "session_start_us")
  }

  /** DYNAMIC-gap sessionization: the gap is a per-event expression (a
    * purchase holds the session open 60 minutes, anything else 30) —
    * the form real engagement analytics needs, since "how long before
    * the visit is over" depends on what the user just did. Each event
    * contributes the interval [ts, ts+gap(event)); overlapping
    * intervals merge, so a session's end is the MAX extension among its
    * events, not the last event's — which is why the batch twin (the
    * oracle) is a running-max interval merge (cummax gaps-and-islands),
    * not a lag() gap check. Same complete-mode drain as
    * [[streamSessionize]]; session_end_us here is the merged window end
    * (start of the silence that closed the session).
    */
  def streamSessionizeDynamic(spark: SparkSession, sfDir: String): DataFrame = {
    val table = s"graft_stream_sessd_${UUID.randomUUID().toString.take(8)}"
    val gap = when(col("event_type") === "purchase", lit("60 minutes"))
      .otherwise(lit("30 minutes"))
    val q = eventsStream(spark, sfDir)
      .withWatermark("ts", "1 hour")
      .groupBy(session_window(col("ts"), gap).as("w"), col("user_id"))
      .agg(count(lit(1)).as("n_events"),
           sum(col("value").cast("decimal(18,2)")).cast("double").as("sum_value"))
      .writeStream
      .format("memory")
      .queryName(table)
      .outputMode("complete")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    spark.table(table)
      .select(col("user_id"),
              unix_micros(col("w.start")).as("session_start_us"),
              unix_micros(col("w.end")).as("session_end_us"),
              col("n_events"), col("sum_value"))
      .orderBy("user_id", "session_start_us")
  }
}
