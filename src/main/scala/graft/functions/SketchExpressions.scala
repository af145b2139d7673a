package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._

/** JVM kernels for the sketch expressions — static methods so the
  * generated code calls straight into compiled bytecode. Each kernel is a
  * single left-to-right pass whose arithmetic is EXACTLY the semantics of
  * the higher-order-function formulation it replaces (and therefore of the
  * DuckDB oracle): same fold order, same modular arithmetic, same
  * tie-breaks. Only the evaluation engine changes.
  */
object SketchOps {

  /** 60-bit SimHash from token hashes: bit j set iff the ±1 vote sum of
    * bit j over all hashes is positive. One pass, int[60] votes.
    */
  def simhash60(hs: ArrayData): Long = {
    val n = hs.numElements()
    val votes = new Array[Int](60)
    var i = 0
    while (i < n) {
      val h = hs.getLong(i)
      var j = 0
      while (j < 60) {
        if (((h >> j) & 1L) == 1L) votes(j) += 1 else votes(j) -= 1
        j += 1
      }
      i += 1
    }
    var out = 0L
    var j = 0
    while (j < 60) { if (votes(j) > 0) out |= (1L << j); j += 1 }
    out
  }

  /** k-permutation MinHash signature: sig_k = min_i (a_k·(h_i mod p) + b_k)
    * mod p over the Mersenne prime p=2^31-1. All intermediates < 2^62.
    */
  def minhashSig(hs: ArrayData, as: Array[Long], bs: Array[Long], p: Long): ArrayData = {
    val k = as.length
    val n = hs.numElements()
    val mins = Array.fill(k)(Long.MaxValue)
    var i = 0
    while (i < n) {
      val hm = java.lang.Math.floorMod(hs.getLong(i), p)
      var j = 0
      while (j < k) {
        val v = java.lang.Math.floorMod(as(j) * hm + bs(j), p)
        if (v < mins(j)) mins(j) = v
        j += 1
      }
      i += 1
    }
    new GenericArrayData(mins)
  }

  /** Space-joined word n-grams in one pass (semantics of
    * transform(sequence, i -> concat_ws(" ", slice(toks, i+1, n))) — which
    * interpreted costs a slice allocation per position).
    */
  def wordNGrams(toks: ArrayData, n: Int): ArrayData = {
    val cnt = toks.numElements()
    if (cnt < n) return new GenericArrayData(Array.empty[Any])
    val out = new Array[Any](cnt - n + 1)
    var i = 0
    while (i <= cnt - n) {
      val sb = new java.lang.StringBuilder()
      var j = 0
      while (j < n) {
        if (j > 0) sb.append(' ')
        sb.append(toks.getUTF8String(i + j).toString)
        j += 1
      }
      out(i) = org.apache.spark.unsafe.types.UTF8String.fromString(sb.toString)
      i += 1
    }
    new GenericArrayData(out)
  }

  /** Dot product, strict left-to-right accumulation (bitwise identical to
    * the aggregate-fold formulation and DuckDB's list_dot_product).
    */
  def vecDot(x: ArrayData, y: ArrayData): Double = {
    val n = math.min(x.numElements(), y.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) { acc += x.getDouble(i) * y.getDouble(i); i += 1 }
    acc
  }
}

/** Custom Catalyst expressions for the sketch kernels (SURVEY §2.10 /
  * build-brief "custom Expression beats UDF"): typed, null-safe, and
  * codegen'd via doGenCode, so they stay inside WholeStageCodegen spans
  * instead of dropping to interpreted higher-order-function evaluation —
  * the HOF forms re-walk each array once per permutation/bit (k×n lambda
  * invocations per row); these kernels do one pass.
  */
object SketchExpressions {

  case class SimHash60(child: Expression) extends UnaryExpression {
    override def dataType: DataType = LongType
    override protected def nullSafeEval(input: Any): Any =
      SketchOps.simhash60(input.asInstanceOf[ArrayData])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, c => s"graft.functions.SketchOps.simhash60($c)")
    override protected def withNewChildInternal(newChild: Expression): SimHash60 =
      copy(child = newChild)
    override def prettyName: String = "simhash60"
  }

  case class MinHashSig(child: Expression, k: Int, seed: Long)
      extends UnaryExpression {
    @transient private lazy val params: (Array[Long], Array[Long]) = {
      val ps = graft.operators.NearDup.minhashParams(k, seed)
      (ps.map(_._1).toArray, ps.map(_._2).toArray)
    }
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override protected def nullSafeEval(input: Any): Any =
      SketchOps.minhashSig(input.asInstanceOf[ArrayData],
        params._1, params._2, graft.operators.NearDup.MinhashP)
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val aRef = ctx.addReferenceObj("mhAs", params._1, "long[]")
      val bRef = ctx.addReferenceObj("mhBs", params._2, "long[]")
      val p = graft.operators.NearDup.MinhashP
      defineCodeGen(ctx, ev, c =>
        s"graft.functions.SketchOps.minhashSig($c, $aRef, $bRef, ${p}L)")
    }
    override protected def withNewChildInternal(newChild: Expression): MinHashSig =
      copy(child = newChild)
    override def prettyName: String = "minhash_sig"
  }

  case class WordNGrams(child: Expression, n: Int) extends UnaryExpression {
    override def dataType: DataType = ArrayType(StringType, containsNull = false)
    override protected def nullSafeEval(input: Any): Any =
      SketchOps.wordNGrams(input.asInstanceOf[ArrayData], n)
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, c => s"graft.functions.SketchOps.wordNGrams($c, $n)")
    override protected def withNewChildInternal(newChild: Expression): WordNGrams =
      copy(child = newChild)
    override def prettyName: String = "word_ngrams"
  }

  case class VecDot(left: Expression, right: Expression) extends BinaryExpression {
    override def dataType: DataType = DoubleType
    override protected def nullSafeEval(a: Any, b: Any): Any =
      SketchOps.vecDot(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, (a, b) => s"graft.functions.SketchOps.vecDot($a, $b)")
    override protected def withNewChildrenInternal(newLeft: Expression,
                                                   newRight: Expression): VecDot =
      copy(left = newLeft, right = newRight)
    override def prettyName: String = "vec_dot"
  }

  // Column-facing wrappers (via the in-namespace ColumnBridge,
  // since Spark 4 scopes ExpressionUtils private[sql])
  def simhash60(hs: Column): Column =
    ColumnBridge.column(SimHash60(ColumnBridge.expression(hs)))

  def minhashSig(hs: Column, k: Int, seed: Long): Column =
    ColumnBridge.column(MinHashSig(ColumnBridge.expression(hs), k, seed))

  def vecDot(a: Column, b: Column): Column =
    ColumnBridge.column(VecDot(ColumnBridge.expression(a),
                                  ColumnBridge.expression(b)))

  def wordNGrams(toks: Column, n: Int): Column =
    ColumnBridge.column(WordNGrams(ColumnBridge.expression(toks), n))
}
