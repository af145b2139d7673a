package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev probe: wall-clock evidence that AQE's skew-join split rescues a
  * planted-hot-key sort-merge join — the skewed fact-fact join shape
  * that dominates 100 TB warehouses. Runs the SAME join with the skew
  * rule off and on and prints both times plus whether the adaptive plan
  * carries the skew=true marker.
  *
  * Usage: SkewProbe [nRows] (default 20M; 90% of rows share one key)
  */
object SkewProbe {
  def main(args: Array[String]): Unit = {
    val n = if (args.length > 0) args(0).toLong else 20000000L
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]").config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.autoBroadcastJoinThreshold", "-1")
      .config("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
      .config("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
      .config("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "8MB")
      .config("spark.sql.adaptive.advisoryPartitionSizeInBytes", "8MB")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def planted: DataFrame = {
      val fact = spark.range(n).select(
        when(pmod(col("id"), lit(10L)) < 9, lit(7L))
          .otherwise(pmod(col("id"), lit(1000L))).as("k"),
        col("id").as("v"))
      val dim = spark.range(n / 100).select(
        pmod(col("id"), lit(1000L)).as("k"), col("id").as("w"))
      fact.join(dim, "k").agg(sum(col("v") + col("w")).as("s"))
    }

    def time(name: String, skewOn: Boolean): Unit = {
      spark.conf.set("spark.sql.adaptive.skewJoin.enabled", skewOn.toString)
      val df = planted
      val t0 = System.nanoTime()
      val r = df.collect().head.getLong(0)
      val secs = (System.nanoTime() - t0) / 1e9
      val marked = df.queryExecution.executedPlan.toString.contains("skew=true")
      println(f"SKEW $name: $secs%.1f s (skew=true in plan: $marked, sum=$r)")
    }

    time("skewjoin_off", skewOn = false)
    time("skewjoin_on", skewOn = true)
    spark.stop()
  }
}
