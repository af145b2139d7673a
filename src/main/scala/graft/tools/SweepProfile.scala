package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession

/** Dev tool: one-run wall + job count + hottest stages for MANY queries
  * in a single session — the round-17 sweep that finds serial hot stages
  * (few tasks, long duration) across the suite.
  * Usage: runMain graft.tools.SweepProfile <query,query,...|all> [sfDir]
  */
object SweepProfile {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val names: Seq[String] =
      if (args(0) == "all") graft.SparkEntry.queries.keys.toSeq.sorted
      else args(0).split(",").map(_.trim).filter(_.nonEmpty).toSeq
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val stages = new java.util.concurrent.ConcurrentLinkedQueue[(Int, Long, Int)]()
    val jobs = new java.util.concurrent.atomic.AtomicInteger(0)
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(e: SparkListenerStageCompleted): Unit = {
        val si = e.stageInfo
        stages.add((si.numTasks,
          si.completionTime.getOrElse(0L) - si.submissionTime.getOrElse(0L),
          si.stageId)); ()
      }
      override def onJobEnd(e: org.apache.spark.scheduler.SparkListenerJobEnd)
          : Unit = { jobs.incrementAndGet(); () }
    })

    for (t <- Seq(graft.Tables.documents _, graft.Tables.embeddings _,
                  graft.Tables.events _, graft.Tables.lineitem _,
                  graft.Tables.part _, graft.Tables.orders _,
                  graft.Tables.customer _, graft.Tables.supplier _))
      try t(spark, sfDir).write.format("noop").mode("overwrite").save()
      catch { case scala.util.control.NonFatal(_) => () }
    spark.catalog.clearCache()

    for (n <- names) {
      stages.clear(); jobs.set(0)
      val t0 = System.nanoTime()
      val ok = try {
        graft.SparkEntry.queries(n)(spark, sfDir)
          .write.format("noop").mode("overwrite").save(); true
      } catch { case scala.util.control.NonFatal(e) =>
        println(s"QQ $n FAILED ${e.getMessage}"); false
      }
      val dt = (System.nanoTime() - t0) / 1e9
      var last = -1
      while (stages.size != last) { last = stages.size; Thread.sleep(200) }
      if (ok) {
        val st = {
          import scala.jdk.CollectionConverters._
          stages.iterator().asScala.toSeq
        }
        val top = st.sortBy(-_._2).take(5)
          .map { case (nt, ms, _) => f"${ms / 1000.0}%.1fs/${nt}t" }
          .mkString(" ")
        println(f"QQ $n%-28s ${dt}%6.2f s  ${jobs.get()}%4d jobs  top: $top")
      }
      spark.catalog.clearCache()
      spark.catalog.listTables().collect()
        .filter(_.name.startsWith("graft_stream_"))
        .foreach(t => spark.catalog.dropTempView(t.name))
    }
    spark.stop()
  }
}
