package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // JIT/classload warmup on a synthetic range — otherwise whichever
    // query happens to run first is charged ~5 s of one-time JVM warmup
    // (codegen compiler, parquet/noop writer classloading) that belongs
    // to no query. The warmup touches no benchmark table and no query
    // plan, so per-query numbers stay honest.
    spark.range(1 << 20).selectExpr("sum(id) as s", "count(distinct id % 1000) as d")
      .write.format("noop").mode("overwrite").save()
    // noop sink materializes every projected column through the whole plan
    // (a bare count() would let Catalyst prune expression work). Cache is
    // cleared between queries so each timing is isolated: persisted
    // subtrees (near-dup index, ANN base) otherwise accumulate heap
    // across 50+ queries and GC pressure skews later measurements.
    val results = SparkEntry.queries.map { case (name, fn) =>
      val t0 = System.nanoTime()
      val ok =
        try { fn(spark, sfDir).write.format("noop").mode("overwrite").save(); true }
        catch { case e: Throwable =>
          System.err.println(s"[bench] $name FAILED: ${e.getMessage}")
          false
        }
      val dt = (System.nanoTime() - t0) / 1e9
      spark.catalog.clearCache()
      // streaming memory sinks register UUID-named temp views that the
      // CacheManager does not own — drop them or their full results pile
      // up on the driver heap across the run
      spark.catalog.listTables().collect()
        .filter(_.name.startsWith("graft_stream_"))
        .foreach(t => spark.catalog.dropTempView(t.name))
      // a failed query records a negative sentinel, never a fake fast time
      name -> (if (ok) dt else -dt)
    }
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = if (results.nonEmpty) results.values.sum else 0.0
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
