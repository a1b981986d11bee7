package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.graftbridge.{ColumnBridge, CountInSet, EqualCountLong, HashEmbedding, MinHashSignature, QuantizedDotLong, ShingleHash64, SimHash64, SortedIntersectCount}

/** Column-API facade over the native sketch kernels (one codegen'd loop per
  * document instead of interpreted higher-order-function lambdas).
  */
object Sketches {

  /** k-hash MinHash signature (array<long>) of a string-array column. */
  def minHashSignature(shingles: Column, numHashes: Int): Column =
    ColumnBridge.column(
      MinHashSignature(ColumnBridge.expression(shingles), numHashes))

  /** 64-bit SimHash of a string-array column. */
  def simHash64(tokens: Column): Column =
    ColumnBridge.column(SimHash64(ColumnBridge.expression(tokens)))

  /** L2-normalized feature-hashing embedding (array<double>[dim]) of a
    * string-array column.
    */
  def hashEmbedding(tokens: Column, dim: Int): Column =
    ColumnBridge.column(HashEmbedding(ColumnBridge.expression(tokens), dim))

  /** Intersection size of two lexicographically sorted string arrays. */
  def sortedIntersectCount(a: Column, b: Column): Column =
    ColumnBridge.column(
      SortedIntersectCount(ColumnBridge.expression(a), ColumnBridge.expression(b)))

  /** Tokens of a string-array column (with multiplicity) in a fixed set. */
  def countInSet(tokens: Column, words: Seq[String]): Column =
    ColumnBridge.column(CountInSet(ColumnBridge.expression(tokens), words))

  /** XXH64 of every k-token shingle of a space-delimited string column —
    * one pass over the raw bytes, no per-shingle string materialization.
    */
  def shingleHash64(text: Column, k: Int): Column =
    ColumnBridge.column(ShingleHash64(ColumnBridge.expression(text), k))

  /** Bloom-surviving tokens (`gramLen` = 0) or char-grams (> 0) of a
    * string column — one pass, xxhash64 family, allocation only on
    * survivors (see graftbridge.BloomCandidates).
    */
  def bloomCandidates(text: Column, gramLen: Int, bits: Seq[Boolean],
                      k: Int): Column =
    ColumnBridge.column(org.apache.spark.sql.graftbridge.BloomCandidates(
      ColumnBridge.expression(text), gramLen, bits.toArray, k))

  /** Token-index start positions of the k-shingles of a space-delimited
    * string whose XXH64 is in `sortedHashes` (sorted ascending) — the
    * fused exact-membership form of posexplode(shingleHash64) + hash join.
    */
  def shingleHitStarts(text: Column, k: Int, sortedHashes: Array[Long]): Column =
    ColumnBridge.column(org.apache.spark.sql.graftbridge.ShingleHitStarts(
      ColumnBridge.expression(text), k, sortedHashes))

  /** Count of a long-array column's elements inside a constant sorted
    * long set (with multiplicity — pass an array_distinct'ed child for
    * distinct-hit counts).
    */
  def countInSortedSet(arr: Column, sortedSet: Array[Long]): Column =
    ColumnBridge.column(org.apache.spark.sql.graftbridge.CountInSortedLongSet(
      ColumnBridge.expression(arr), sortedSet))

  /** Positions where two long-array signatures agree. */
  def equalCount(a: Column, b: Column): Column =
    ColumnBridge.column(
      EqualCountLong(ColumnBridge.expression(a), ColumnBridge.expression(b)))

  /** cls1's quantized scoring dot: ⌊e[j]·10⁶+0.5⌋·w(j) summed over the
    * dims plus the bias slot, one loop per row (weights constant).
    */
  def quantizedDot(emb: Column, weights: Seq[Long]): Column =
    ColumnBridge.column(QuantizedDotLong(ColumnBridge.expression(emb), weights))
}
