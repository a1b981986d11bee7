package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Engine-portable double emission helpers.
  *
  * IEEE-754 has a signed zero, and engines disagree on which one `round`
  * emits for a tiny negative input: Spark's `round` normalizes `-0.0` to
  * `0.0`, DuckDB's keeps the sign bit. The two values compare `==` but hash
  * to different bytes, so a byte-hash cross-check (the driver's oracle
  * compare) flags a match failure on data that is numerically identical —
  * exactly what happened to x21_dsir_weights in round 2 (one doc's weight
  * rounded to `0.0` in Spark and `-0.0` in DuckDB).
  *
  * `x + 0.0` normalizes: IEEE addition defines `-0.0 + 0.0 = 0.0`, and for
  * every other double (including NaN and infinities) it is the identity.
  * Apply [[roundZ]] to every rounded-double emission whose value can be
  * negative, and mirror `+ 0.0` in the oracle SQL twin.
  */
object Doubles {

  /** `-0.0`-normalized value: identity for every double except `-0.0 → 0.0`. */
  def normZero(c: Column): Column = c + lit(0.0)

  /** `round` to `scale` digits with the `-0.0` result normalized to `0.0` —
    * use for any rounded DOUBLE emission whose argument can be negative, so
    * both engines emit byte-identical zeros. Do not use on DECIMAL columns
    * (the `+ 0.0` would widen the type to double and change the schema).
    */
  def roundZ(c: Column, scale: Int): Column = normZero(round(c, scale))
}
