package graft.functions

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}
import org.apache.spark.sql.types.{IntegerType, LongType}

import SketchExpressions._

/** SQL surface for the engine's custom codegen'd expressions (§2.10):
  * the same Catalyst Expressions the Column API wraps, exposed to
  * `spark.sql(...)` by name so a SQL-only user of the library gets the
  * sketch kernels too.
  *
  * Two registration paths, same builders:
  *  - [[GraftFunctions.register]] on a live session (notebooks, tests,
  *    the q_simhash_sql query);
  *  - [[GraftExtensions]] via
  *    `--conf spark.sql.extensions=graft.functions.GraftExtensions`
  *    (cluster deployment — applied at session build, the
  *    SparkSessionExtensions mechanism).
  *
  * Sketch parameters (n-gram width, MinHash k/seed) must be foldable
  * literals: they parameterize codegen itself (the hash coefficients are
  * baked into the generated kernel), so a column-valued parameter cannot
  * compile to a single kernel — rejected at analysis with a clear error
  * rather than at runtime.
  */
object GraftFunctions {

  private def intLit(e: Expression, fn: String): Int = e match {
    case Literal(v: Int, IntegerType) => v
    case other => throw new IllegalArgumentException(
      s"$fn: parameter must be an integer literal, got $other")
  }

  private def longLit(e: Expression, fn: String): Long = e match {
    case Literal(v: Int, IntegerType) => v.toLong
    case Literal(v: Long, LongType) => v
    case other => throw new IllegalArgumentException(
      s"$fn: parameter must be an integer literal, got $other")
  }

  /** (name, info, builder) triples in the exact shape both
    * FunctionRegistry.registerFunction and
    * SparkSessionExtensions.injectFunction consume.
    */
  val all: Seq[(FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)] = Seq(
    (FunctionIdentifier("simhash60"),
      new ExpressionInfo(classOf[SimHash60].getName, "simhash60"),
      (args: Seq[Expression]) => SimHash60(args.head)),
    (FunctionIdentifier("vec_dot"),
      new ExpressionInfo(classOf[VecDot].getName, "vec_dot"),
      (args: Seq[Expression]) => VecDot(args(0), args(1))),
    (FunctionIdentifier("word_ngrams"),
      new ExpressionInfo(classOf[WordNGrams].getName, "word_ngrams"),
      (args: Seq[Expression]) => WordNGrams(args(0), intLit(args(1), "word_ngrams"))),
    (FunctionIdentifier("minhash_sig"),
      new ExpressionInfo(classOf[MinHashSig].getName, "minhash_sig"),
      (args: Seq[Expression]) =>
        MinHashSig(args(0), intLit(args(1), "minhash_sig"), longLit(args(2), "minhash_sig"))))

  /** Idempotent registration on a live session. */
  def register(spark: SparkSession): Unit =
    all.foreach { case (id, info, builder) =>
      spark.sessionState.functionRegistry.registerFunction(id, info, builder)
    }
}

/** `spark.sql.extensions` entry point — injects the same functions at
  * session build time.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    GraftFunctions.all.foreach(ext.injectFunction)
}
