package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev-only one-off: dump the trained coarse codebook at full double
  * precision for cross-engine comparison. Not part of the library.
  */
object ProbeCB {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val emb = graft.Tables.embeddings(spark, "/root/testdata/sf0.1")
    val cb = graft.operators.Similarity.kmeansTrain(emb, 2)
    // kmeansTrain output: (clabel, dim, mean_val?) — check schema
    cb.printSchema()
    val rows = cb.collect()
    val out = new java.io.PrintWriter("/tmp/spark_cb.json")
    out.println("{")
    out.println(rows.map(r => "\"" + r.get(0) + "_" + r.get(1) + "\": " +
      "%.17g".format(r.get(2).asInstanceOf[Double])).mkString(",\n"))
    out.println("}")
    out.close()
    spark.stop()
  }
}
