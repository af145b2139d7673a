package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Z-order (Morton) keys for multi-dimensional data layout.
  *
  * A table sorted on ONE column gives parquet row-group min/max stats
  * perfect skipping on that column and none on any other. Interleaving
  * the bits of two columns' scaled values produces a single sort key
  * under which row-groups stay rectangular in BOTH dimensions — a
  * predicate on either column (or both) skips most groups. This is the
  * layout decision behind OPTIMIZE ZORDER in lakehouse engines, built
  * here from plain bitwise Catalyst expressions (shiftleft / & / |), so
  * the key computation stays inside whole-stage codegen — no UDF.
  *
  * The caller scales each dimension to 16 bits ([[scale16]]) from its
  * min/max; [[interleave16]] then spreads and merges the bits into one
  * 32-bit key. Writing is one range-repartition + within-partition sort
  * on the key — exactly the shuffle a single-column sort would pay, so
  * two-dimensional skipping costs nothing extra at write time.
  */
object ZOrder {

  /** Spread the low 16 bits of `c` so bit i lands at position 2i —
    * the classic mask-and-shift ladder, fully codegen'd.
    */
  def spread16(c: Column): Column = {
    val x0 = c.cast("long").bitwiseAND(lit(0xFFFFL))
    val x1 = x0.bitwiseOR(shiftleft(x0, 8)).bitwiseAND(lit(0x00FF00FFL))
    val x2 = x1.bitwiseOR(shiftleft(x1, 4)).bitwiseAND(lit(0x0F0F0F0FL))
    val x3 = x2.bitwiseOR(shiftleft(x2, 2)).bitwiseAND(lit(0x33333333L))
    x3.bitwiseOR(shiftleft(x3, 1)).bitwiseAND(lit(0x55555555L))
  }

  /** Morton key of two 16-bit values: a's bits at odd positions, b's at
    * even — adjacent keys are adjacent in BOTH dimensions.
    */
  def interleave16(a: Column, b: Column): Column =
    shiftleft(spread16(a), 1).bitwiseOR(spread16(b))

  /** Scale a numeric column to [0, 65535] given its closed [lo, hi]
    * range (true integral division via SQL `div` = IntegralDivide, so
    * the scaling stays exact; hi == lo degrades to 0 rather than
    * dividing by zero). Caveat: (c - lo) * 65535 overflows long for
    * ranges wider than ~2^47 — far beyond any id/day dimension here,
    * but a caller with such a range should pre-shift the dimension.
    */
  def scale16(c: Column, lo: Column, hi: Column): Column =
    when(hi > lo,
      call_function("div",
        (c.cast("long") - lo.cast("long")) * lit(65535L),
        hi.cast("long") - lo.cast("long")))
      .otherwise(lit(0L))
}
