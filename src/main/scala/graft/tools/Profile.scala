package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.{NearDup, TextAnalysis}

/** Dev tool: stage-by-stage timing of the near-dup index build. */
object Profile {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]").config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = graft.Tables.documents(spark, sfDir)
    def time(name: String)(f: => Long): Unit = (1 to 2).foreach { i =>
      val t0 = System.nanoTime()
      val n = f
      println(f"STAGE $name#$i: ${(System.nanoTime() - t0) / 1e9}%.2f s ($n rows)")
    }
    time("tokens")(docs.select(TextAnalysis.tokens(col("text")).as("t"))
      .selectExpr("sum(size(t))").collect().head.getLong(0))
    time("shingleSets")(NearDup.shingleSets(docs, 3)
      .selectExpr("sum(size(sh))").collect().head.getLong(0))
    time("explode")(NearDup.shingleSets(docs, 3)
      .select(explode(col("sh"))).count())
    time("invertedIndex")(NearDup.invertedIndex(NearDup.shingleSets(docs, 3), 100).count())
    time("full")(NearDup.jaccardPairs(docs, 3, 0.5, 100).count())
    spark.stop()
  }
}
