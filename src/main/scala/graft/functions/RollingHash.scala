package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.graftbridge.{ColumnBridge, MinWindowHash, PolyHash}

/** Column-API facade over the native rolling-hash Catalyst expressions
  * (see org.apache.spark.sql.graftbridge.RollingHashExpressions).
  */
object RollingHash {

  /** Whole-document polynomial fingerprint as a Column. */
  def polyHash(c: Column): Column = ColumnBridge.column(PolyHash(expr(c)))

  /** Minimum k-byte-window rolling hash as a Column. */
  def minWindowHash(c: Column, k: Int): Column =
    ColumnBridge.column(MinWindowHash(expr(c), k))

  private def expr(c: Column) = ColumnBridge.expression(c)
}
