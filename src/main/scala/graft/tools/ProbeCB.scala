package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev-only one-off: dump a trained coarse codebook at full double
  * precision for cross-engine comparison. Not part of the library.
  *
  * Usage: ProbeCB <sfDir> <outJsonPath> [iters]
  */
object ProbeCB {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: ProbeCB <sfDir> <outJsonPath> [iters]")
    val (sfDir, outPath) = (args(0), args(1))
    val iters = if (args.length > 2) args(2).toInt else 2
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val emb = graft.Tables.embeddings(spark, sfDir)
    val rows = graft.operators.Similarity.kmeansTrain(emb, iters).collect()
    val out = new java.io.PrintWriter(outPath)
    out.println("{")
    out.println(rows.map(r => "\"" + r.get(0) + "_" + r.get(1) + "\": " +
      "%.17g".format(r.get(2).asInstanceOf[Double])).mkString(",\n"))
    out.println("}")
    out.close()
    spark.stop()
  }
}
