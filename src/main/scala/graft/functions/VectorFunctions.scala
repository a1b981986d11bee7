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

  /** The shuffle-free nearest-centroid substrate (round-17 optimization).
    *
    * Every centroid-assignment operator used the same plan: corpus
    * crossJoin(broadcast(cents)) into k rows per vector, then a
    * CORPUS-SIZED exchange — groupBy(vec_id).agg(max(struct(cos,
    * -centroid_id)), first(embedding), ...) — just to pick each vector's
    * argmax cell. The exchange is pure overhead (guide §2.4): the argmax
    * over a BOUNDED centroid set is a per-row expression. These helpers
    * fold the centroid frame into ONE sorted struct-array row
    * (`centroidTableFrame`, cross-joined as a one-row broadcast — the s5
    * codebook shape; no driver collect), compute the rounded cosines as
    * an array column (`centCosines` — the native CentroidCosines kernel,
    * each slot the EXACT expression the join form evaluated per pair,
    * sized by the table so Lloyd refinement dropping an empty cluster
    * mid-loop just shrinks the row), and read the winner per row
    * (`argmaxCentroidId` / array_max). Tie-break equivalence:
    * max(struct(cos, -id)) picks the max cosine then the SMALLEST id;
    * `array_position(coss, array_max(coss))` returns the FIRST slot
    * holding the max, and the table is sorted id-ascending — the same
    * winner.
    *
    * At fleet scale this removes a full corpus-sized shuffle (with the
    * embedding arrays riding it) from every assignment pass; at bench
    * scale it removes the exchange + aggregate stages. The callers'
    * DuckDB oracles replay the assignment rule itself, so every converted
    * operator is hash-gated.
    */
  /** cents → the one-row broadcast frame (column `cent_tab`), sorted by
    * ascending centroid_id (the struct's leading field).
    */
  def centroidTableFrame(cents: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame =
    cents.agg(array_sort(collect_list(struct(
      col("centroid_id"), col("c_emb"), col("c_nrm")))).as("cent_tab"))

  /** The rounded cosines of (emb, nrm) against `cent_tab`'s slots — slot
    * i is round(cos(emb, slot_i), scale), exactly the join form's
    * per-pair expression, computed by the native
    * [[org.apache.spark.sql.graftbridge.CentroidCosines]] kernel: ONE
    * compact codegen node, so the copies that constraint inference
    * inlines into downstream join conditions stay cheap (the declarative
    * k-slot array spelling measured 2.4x slower on s6 for exactly that
    * reason — see the kernel's scaladoc). Width is the table's size.
    */
  def centCosines(emb: Column, nrm: Column, scale: Int): Column =
    ColumnBridge.column(
      org.apache.spark.sql.graftbridge.CentroidCosines(
        ColumnBridge.expression(emb), ColumnBridge.expression(nrm),
        ColumnBridge.expression(col("cent_tab")), scale))

  /** The winning slot's centroid_id for a `centCosines` array — FIRST
    * max in id-ascending slot order == max(struct(cos, -id)).
    */
  def argmaxCentroidId(coss: Column): Column =
    element_at(col("cent_tab"),
      array_position(coss, array_max(coss)).cast("int"))
      .getField("centroid_id")

  /** The rounded squared-L2 distances of subvector `sv` against every
    * codeword in `cws` (array<array<double>>) — slot j is exactly the
    * former unrolled `round((d1*d1 + d2*d2) + ..., scale)` left-fold, via
    * the native [[org.apache.spark.sql.graftbridge.PqL2Distances]] kernel
    * (see its scaladoc for why the declarative kCodes-slot array spelling
    * broke whole-stage codegen on the s5 encode pass).
    */
  def pqL2Distances(sv: Column, cws: Column, scale: Int): Column =
    ColumnBridge.column(
      org.apache.spark.sql.graftbridge.PqL2Distances(
        ColumnBridge.expression(sv), ColumnBridge.expression(cws), scale))
}
