package graft.tools

import java.util.concurrent.atomic.AtomicLong
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.{NearDup, Pipeline, TextAnalysis}

/** Dev probe: decompose q_pipeline_curate's sf10 wall-time VARIANCE
  * (BENCH_r15 3-rep spread [502, 629, 1057] s — the widest in the
  * suite). Runs the pipeline's stages separately per rep with
  * task-metric deltas (GC, spill, shuffle) around each, so a wide rep
  * attributes to a STAGE and a CAUSE (GC pressure vs spill vs fixpoint
  * re-iteration) instead of staying a mystery median.
  *
  * Stage map (mirrors Pipeline.curatedDocsWithGates):
  *   gates   — Gopher rule pass over all docs
  *   rep     — repetition-signal pass over all docs
  *   kept    — gated corpus semi-joins + MEMORY_AND_DISK persist
  *   comps   — duplicate-components label-propagation fixpoint on kept
  *   curate  — the full declared query (includes best-copy + census)
  *
  * Usage: runMain graft.tools.CurateProbe [sfDir] (REPS via
  * SPARK_GRAFT_PROBE_REPS, default 3).
  */
object CurateProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/tmp/graft_sf10"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val reps = sys.env.getOrElse("SPARK_GRAFT_PROBE_REPS", "3").toInt
    // the spill-pressure knob under test: at sf10 the components
    // fixpoint's pair joins sort ~10^8-row partitions; more, smaller
    // shuffle partitions shrink each task's sort buffer below the
    // spill threshold. Since round 17 the comps stage sizes its own
    // width from input stats (NearDup.fixpointWidth) — this SESSION
    // knob now prices the surrounding stages; to force the fixpoint
    // itself to a candidate width, set SPARK_GRAFT_FIXPOINT_PARTS.
    val parts = sys.env.getOrElse("SPARK_GRAFT_SHUFFLE_PARTS", cpus)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]").config("spark.sql.shuffle.partitions", parts)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val gc = new AtomicLong; val memSpill = new AtomicLong
    val diskSpill = new AtomicLong; val shufW = new AtomicLong
    val runT = new AtomicLong
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onTaskEnd(
            t: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
          val m = t.taskMetrics
          if (m != null) {
            gc.addAndGet(m.jvmGCTime)
            memSpill.addAndGet(m.memoryBytesSpilled)
            diskSpill.addAndGet(m.diskBytesSpilled)
            shufW.addAndGet(m.shuffleWriteMetrics.bytesWritten)
            runT.addAndGet(m.executorRunTime)
            ()
          }
        }
      })

    def mib(b: Long): String = f"${b / 1048576.0}%.0f"
    def stage(rep: Int, name: String)(f: => Long): Unit = {
      val (g0, m0, d0, s0, r0) =
        (gc.get, memSpill.get, diskSpill.get, shufW.get, runT.get)
      val t0 = System.nanoTime()
      val n = f
      val dt = (System.nanoTime() - t0) / 1e9
      println(f"CURATE rep=$rep stage=$name%-7s wall=$dt%7.1f s " +
        f"rows=$n%10d gc=${(gc.get - g0) / 1000.0}%7.1f s " +
        s"memSpill=${mib(memSpill.get - m0)} MiB " +
        s"diskSpill=${mib(diskSpill.get - d0)} MiB " +
        s"shufW=${mib(shufW.get - s0)} MiB " +
        f"cpu=${(runT.get - r0) / 1000.0}%8.1f s")
    }

    for (r <- 1 to reps) {
      val docs = graft.Tables.documents(spark, sfDir)
      stage(r, "gates")(TextAnalysis.gopherRulesUnordered(docs)
        .filter(col("pass") === 1).count())
      stage(r, "rep")(TextAnalysis.repetitionSignalsUnordered(docs)
        .filter(col("top_bigram_frac") <= 0.08).count())
      val gates = TextAnalysis.gopherRulesUnordered(docs)
        .filter(col("pass") === 1).select("doc_id")
      val repOk = TextAnalysis.repetitionSignalsUnordered(docs)
        .filter(col("top_bigram_frac") <= 0.08).select("doc_id")
      val kept = docs.join(gates, Seq("doc_id"), "left_semi")
        .join(repOk, Seq("doc_id"), "left_semi")
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      stage(r, "kept")(kept.count())
      stage(r, "comps")(NearDup.duplicateComponentsUnordered(kept, 3).count())
      stage(r, "curate") {
        Pipeline.curate(docs, 0.08)
          .write.format("noop").mode("overwrite").save()
        0L
      }
      kept.unpersist(true)
      spark.catalog.clearCache()
      graft.CacheRegistry.release()
    }
    spark.stop()
  }
}
