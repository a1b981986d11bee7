package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.{ColumnBridge, DotProductDouble}

/** Column-level vector math over `array<float>` embedding columns.
  *
  * Everything is computed in DOUBLE regardless of the storage type: two
  * engines summing the same float32 inputs in double agree to ~1e-15 no
  * matter the summation order, so results survive a `round(_, 6)` oracle
  * hash-compare. Summing in float32 would not (error ~1e-6).
  *
  * Backed by the native codegen'd `DotProductDouble` kernel (see
  * org.apache.spark.sql.graftbridge.SketchExpressions) — the higher-order
  * function composition (`aggregate(zip_with(...))`) computes the identical
  * value but evaluates interpreted, an order of magnitude slower on
  * pairwise scoring paths.
  */
object VectorFunctions {

  /** Dot product of two float/double-array columns, accumulated in double. */
  def dotD(a: Column, b: Column): Column =
    ColumnBridge.column(DotProductDouble(
      ColumnBridge.expression(a), ColumnBridge.expression(b)))

  /** L2 norm in double. */
  def normD(a: Column): Column = sqrt(dotD(a, a))

  /** Cosine similarity in double (same formula as DuckDB's
    * `list_cosine_similarity` over double lists).
    */
  def cosineD(a: Column, b: Column): Column = dotD(a, b) / (normD(a) * normD(b))

  /** Cosine from a precomputed dot and per-side norms — same double ops as
    * `cosineD`, but lets the join precompute each row's norm once instead of
    * re-deriving both norms per candidate pair.
    */
  def cosineWithNorms(dot: Column, normA: Column, normB: Column): Column =
    dot / (normA * normB)
}
