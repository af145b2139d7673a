package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession

/** Dev tool: per-JOB wall-clock decomposition of one named query — the
  * multi-job pipelines (streaming drains, IVF-PQ maintenance, fixpoints)
  * hide their cost from a single explain(); this prints every Spark job's
  * duration and call site so the expensive pass is identifiable.
  * Usage: runMain graft.tools.JobProfile <query> <sfDir> [runs]
  */
object JobProfile {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val runs = if (args.length > 2) args(2).toInt else 1
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val b0 = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
    // probe knob: SPARK_GRAFT_EXTRA_CONF="key=value;key=value"
    val spark = sys.env.get("SPARK_GRAFT_EXTRA_CONF").toSeq
      .flatMap(_.split(";")).map(_.trim).filter(_.contains("="))
      .foldLeft(b0) { (b, kv) =>
        val Array(k, v) = kv.split("=", 2); b.config(k, v)
      }.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val starts = new java.util.concurrent.ConcurrentHashMap[Int, (Long, String)]()
    val rows = new java.util.concurrent.ConcurrentLinkedQueue[(Int, Double, String)]()
    val stages = new java.util.concurrent.ConcurrentLinkedQueue[(Int, Int, Long, String)]()
    // [input bytes, shuffle-read bytes, shuffle-write bytes,
    //  executor run ms, spill bytes]
    val bytes = new java.util.concurrent.atomic.AtomicLongArray(5)
    val listener = new SparkListener {
      override def onJobStart(e: SparkListenerJobStart): Unit = {
        val site = Option(e.properties)
          .flatMap(p => Option(p.getProperty("callSite.short"))).getOrElse("?")
        starts.put(e.jobId, (System.nanoTime(), site)); ()
      }
      override def onJobEnd(e: SparkListenerJobEnd): Unit = {
        Option(starts.remove(e.jobId)).foreach { case (t0, site) =>
          rows.add((e.jobId, (System.nanoTime() - t0) / 1e9, site)); ()
        }
      }
      override def onStageCompleted(e: SparkListenerStageCompleted): Unit = {
        val si = e.stageInfo
        stages.add((si.stageId, si.numTasks,
          si.completionTime.getOrElse(0L) - si.submissionTime.getOrElse(0L),
          si.name))
        // machine-independent work evidence: bytes and task-time sums
        val m = si.taskMetrics
        if (m != null) {
          bytes.addAndGet(0, m.inputMetrics.bytesRead)
          bytes.addAndGet(1, m.shuffleReadMetrics.totalBytesRead)
          bytes.addAndGet(2, m.shuffleWriteMetrics.bytesWritten)
          bytes.addAndGet(3, m.executorRunTime)
          bytes.addAndGet(4, m.memoryBytesSpilled + m.diskBytesSpilled)
          ()
        }
      }
    }
    spark.sparkContext.addSparkListener(listener)

    // untimed warmup of shared tables, as Bench does
    for (t <- Seq(graft.Tables.documents _, graft.Tables.embeddings _,
                  graft.Tables.events _, graft.Tables.lineitem _,
                  graft.Tables.part _))
      try t(spark, sfDir).write.format("noop").mode("overwrite").save()
      catch { case scala.util.control.NonFatal(_) => () }
    spark.catalog.clearCache()
    rows.clear()
    (0 until 5).foreach(bytes.set(_, 0L))

    (1 to runs).foreach { i =>
      val t0 = System.nanoTime()
      graft.SparkEntry.queries(name)(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
      val dt = (System.nanoTime() - t0) / 1e9
      // listener events drain asynchronously; settle before reading
      var last = -1
      while (rows.size != last) { last = rows.size; Thread.sleep(300) }
      println(f"== RUN $i: $dt%.2f s, ${rows.size} jobs ==")
      println(f"   work: input=${bytes.get(0) / 1e6}%.1f MB  " +
        f"shufRead=${bytes.get(1) / 1e6}%.1f MB  " +
        f"shufWrite=${bytes.get(2) / 1e6}%.1f MB  " +
        f"taskTime=${bytes.get(3) / 1e3}%.1f s  " +
        f"spill=${bytes.get(4) / 1e6}%.1f MB")
      (0 until 5).foreach(bytes.set(_, 0L))
      val all = {
        import scala.jdk.CollectionConverters._
        rows.iterator().asScala.toSeq.sortBy(_._1)
      }
      val bySite = all.groupBy(_._3).map { case (s, js) =>
        (s, js.map(_._2).sum, js.size)
      }.toSeq.sortBy(-_._2)
      println("-- top call sites by total job seconds --")
      bySite.take(25).foreach { case (s, tot, n) =>
        println(f"  $tot%8.2f s  ($n%4d jobs)  $s")
      }
      println("-- slowest individual jobs --")
      all.sortBy(-_._2).take(20).foreach { case (id, d, s) =>
        println(f"  job $id%4d  $d%7.2f s  $s")
      }
      println("-- slowest stages --")
      val st = {
        import scala.jdk.CollectionConverters._
        stages.iterator().asScala.toSeq
      }
      st.sortBy(-_._3).take(20).foreach { case (sid, nt, ms, nm) =>
        println(f"  stage $sid%4d  ${ms / 1000.0}%7.2f s  $nt%4d tasks  ${nm.take(140)}")
      }
      stages.clear()
      rows.clear()
      spark.catalog.clearCache()
      import scala.jdk.CollectionConverters._
      spark.catalog.listTables().collect()
        .filter(_.name.startsWith("graft_stream_"))
        .foreach(t => spark.catalog.dropTempView(t.name))
    }
    spark.stop()
  }
}
