package graft

import graft.functions.{GraftFunctions, SketchExpressions}
import org.apache.spark.sql.functions._

/** The registered SQL surface of the custom codegen'd expressions must
  * agree exactly with the Column API (they build the same Expression).
  */
class SqlFunctionsSpec extends SparkSpec {

  test("registered SQL functions equal the Column API on the same inputs") {
    GraftFunctions.register(spark)
    val row = spark.sql(
      """SELECT
        |  simhash60(array(CAST(1 AS BIGINT), CAST(2 AS BIGINT), CAST(3 AS BIGINT))) AS h,
        |  vec_dot(array(1.0D, 2.0D), array(3.0D, 4.0D)) AS d,
        |  word_ngrams(array('a', 'b', 'c'), 2) AS g,
        |  minhash_sig(array(CAST(7 AS BIGINT), CAST(9 AS BIGINT)), 4, 42) AS m
        |""".stripMargin).head()

    val sp = spark
    import sp.implicits._
    val colApi = Seq((Seq(1L, 2L, 3L), Seq(1.0, 2.0), Seq(3.0, 4.0), Seq(7L, 9L)))
      .toDF("hs", "x", "y", "mh")
      .select(
        SketchExpressions.simhash60(col("hs")).as("h"),
        SketchExpressions.vecDot(col("x"), col("y")).as("d"),
        SketchExpressions.wordNGrams(col("mh").cast("array<string>"), 2).as("g0"),
        SketchExpressions.minhashSig(col("mh"), 4, 42L).as("m"))
      .head()

    assert(row.getAs[Long]("h") === colApi.getAs[Long]("h"))
    assert(row.getAs[Double]("d") === 11.0)
    assert(row.getAs[Double]("d") === colApi.getAs[Double]("d"))
    assert(row.getSeq[String](2) === Seq("a b", "b c"))
    assert(row.getSeq[Long](3) === colApi.getSeq[Long](3))
  }

  test("sketch parameters must be literals: a column-valued n is rejected") {
    GraftFunctions.register(spark)
    val e = intercept[Exception] {
      spark.sql("SELECT word_ngrams(array('a','b'), CAST(rand()*2 AS INT))").head()
    }
    assert(e.getMessage.contains("integer literal"),
      s"expected the literal-parameter error, got: ${e.getMessage}")
  }
}
