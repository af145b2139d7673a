package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.EntityResolution

/** Stage-cost probe for the entity-resolution chain — signature count
  * and end-to-end wall at SPARK_GRAFT_SF_DIR, so decade readings
  * decompose into named stages instead of guesses. (The r17 record-level
  * prototype this probe first measured spent 25 of its 27 s scoring the
  * 18M record pairs the degenerate single-rarest blocking produced at
  * sf0.1; the signature-level rewrite holds the same corpus at ~7 s.)
  */
object ERProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val part = graft.Tables.part(spark, d)
    def time[A](lbl: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      System.err.println(f"[erprobe] $lbl: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    val sigs = part.select(
      array_sort(array_distinct(filter(split(lower(col("p_name")), "[^a-z0-9]+"),
        t => t =!= ""))).as("toks"),
      col("p_brand"), col("p_type")).distinct()
    time("signature census") {
      System.err.println("records=" + part.count() + " sigs=" + sigs.count())
    }
    time("full resolve") {
      System.err.println("rows=" + EntityResolution.resolveParts(part).count())
    }
    time("canonical") {
      System.err.println("entities=" + EntityResolution.canonicalParts(part).count())
    }
    spark.stop()
  }
}
