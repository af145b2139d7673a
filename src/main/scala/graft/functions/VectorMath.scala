package graft.functions

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Vector math over `array<float>` embedding columns (SURVEY F10/J5;
  * driver north-star "similarity search").
  *
  * All scalar ops are higher-order-function compositions (zip_with +
  * aggregate) — codegen'd Catalyst expressions, no UDFs in the hot path.
  * Arithmetic is double-precision with a strict left-to-right fold, so the
  * result is bitwise deterministic and reproducible by the DuckDB oracle.
  *
  * The one custom piece is [[TopKAgg]], a typed Aggregator: a bounded
  * top-k with map-side partial aggregation. A window-function top-k
  * shuffles every (query, candidate) pair; the Aggregator shuffles at most
  * k rows per map partition per query — the difference between O(|Q|·|C|)
  * and O(|Q|·k·partitions) shuffle bytes at 100 TB.
  */
object VectorMath {

  /** Cast a float[] embedding to double[] once, up front. */
  def asDouble(v: Column): Column = v.cast("array<double>")

  /** Dot product: a custom codegen'd expression doing one strict
    * left-to-right pass — bitwise identical to the equivalent
    * zip_with+aggregate fold (and DuckDB's list_dot_product), but it stays
    * inside WholeStageCodegen instead of interpreted HOF evaluation.
    */
  def dot(a: Column, b: Column): Column = SketchExpressions.vecDot(a, b)

  /** L2 norm. sqrt is IEEE-754 correctly rounded — cross-engine exact. */
  def l2Norm(a: Column): Column = sqrt(dot(a, a))

  /** Cosine similarity of two double[] vectors. */
  def cosine(a: Column, b: Column): Column = dot(a, b) / (l2Norm(a) * l2Norm(b))

  /** One (score, id) candidate entering the top-k. */
  case class ScoredId(score: Double, id: Long)

  /** Aggregation buffer: the current top-k, sorted (score desc, id asc). */
  case class TopKBuf(items: Seq[ScoredId])

  /** (score desc, id asc) — a total order, so ties are deterministic. */
  private val ord: Ordering[ScoredId] =
    Ordering.by((s: ScoredId) => (-s.score, s.id))

  /** Bounded top-k Aggregator. Buffer is a k-bounded sorted list; reduce
    * drops candidates below the current k-th score without growing the
    * buffer, merge is a bounded sorted-merge. Registered via
    * functions.udaf it becomes a declarative aggregate with partial
    * (map-side) aggregation — the §2.10 UDAF surface.
    */
  class TopKAgg(k: Int) extends Aggregator[ScoredId, TopKBuf, Seq[ScoredId]] {
    def zero: TopKBuf = TopKBuf(Seq.empty)
    def reduce(b: TopKBuf, a: ScoredId): TopKBuf =
      if (b.items.size < k || ord.lt(a, b.items.last))
        TopKBuf((b.items :+ a).sorted(ord).take(k))
      else b
    def merge(x: TopKBuf, y: TopKBuf): TopKBuf =
      TopKBuf((x.items ++ y.items).sorted(ord).take(k))
    def finish(r: TopKBuf): Seq[ScoredId] = r.items
    def bufferEncoder: Encoder[TopKBuf] = Encoders.product[TopKBuf]
    def outputEncoder: Encoder[Seq[ScoredId]] = {
      import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
      ExpressionEncoder[Seq[ScoredId]]()
    }
  }

  /** Column-function form: topK(k)(scoreCol, idCol) → array<struct<score,id>>. */
  def topK(k: Int): (Column, Column) => Column = {
    val fn = udaf(new TopKAgg(k), Encoders.product[ScoredId])
    (score, id) => fn(score, id)
  }
}
