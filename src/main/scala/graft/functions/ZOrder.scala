package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Morton (Z-order) interleaving for data-skipping cluster sorts — the
  * arithmetic behind a lakehouse OPTIMIZE ZORDER BY: sorting by the
  * interleaved key places rows that are close in BOTH dimensions into the
  * same files, so per-file min/max stats become narrow on every clustered
  * column at once and a predicate on EITHER dimension skips most files
  * (a linear sort gives that property to its leading column only).
  *
  * Pure bitwise column arithmetic (the standard mask-shift bit spread) —
  * codegen'd, no UDF, no shuffle of its own; the key costs a few ALU ops
  * per row wherever the caller sorts by it.
  */
object ZOrder {

  /** Spread the low 16 bits of a non-negative long: bit i moves to bit 2i. */
  private def spread16(c: Column): Column = {
    val m = c.bitwiseAND(lit(0xFFFFL))
    val s1 = m.bitwiseOR(shiftleft(m, 8)).bitwiseAND(lit(0x00FF00FFL))
    val s2 = s1.bitwiseOR(shiftleft(s1, 4)).bitwiseAND(lit(0x0F0F0F0FL))
    val s3 = s2.bitwiseOR(shiftleft(s2, 2)).bitwiseAND(lit(0x33333333L))
    s3.bitwiseOR(shiftleft(s3, 1)).bitwiseAND(lit(0x55555555L))
  }

  /** 32-bit Morton key of two dimension values: bit i of `a` lands at
    * result bit 2i, bit i of `b` at bit 2i+1. Each input contributes its
    * LOW 16 BITS — the caller supplies non-negative ints already on a
    * bounded grid (a rank, a bin index, a day number; quantize first if
    * the raw column is unbounded, exactly as OPTIMIZE ZORDER computes
    * range ranks before interleaving).
    */
  def mortonKey(a: Column, b: Column): Column =
    spread16(a.cast("long")).bitwiseOR(shiftleft(spread16(b.cast("long")), 1))
}
