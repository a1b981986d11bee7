package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Column-level vector math over `array<float>` embedding columns.
  *
  * Everything is computed in DOUBLE regardless of the storage type: two
  * engines summing the same float32 inputs in double agree to ~1e-15 no
  * matter the summation order, so results survive a `round(_, 6)` oracle
  * hash-compare. Summing in float32 would not (error ~1e-6).
  *
  * These are Catalyst higher-order functions (`zip_with`/`aggregate`) — no
  * UDF, no serialization boundary, safe to evaluate per-row across a
  * billion-row fleet.
  */
object VectorFunctions {

  /** Dot product of two float-array columns, accumulated in double. */
  def dotD(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0),
      (acc, v) => acc + v)

  /** L2 norm in double. */
  def normD(a: Column): Column = sqrt(dotD(a, a))

  /** Cosine similarity in double (same formula as DuckDB's
    * `list_cosine_similarity` over double lists).
    */
  def cosineD(a: Column, b: Column): Column = dotD(a, b) / (normD(a) * normD(b))
}
