package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Mergeable per-group top-k as a typed `Aggregator` — the custom-aggregate
  * extension surface (`functions.udaf`), complementing the codegen
  * `Expression` kernels. The aggregation buffer is the top-k list itself,
  * so each partition ships AT MOST k rows per group into the shuffle
  * regardless of how many rows it scanned — the map-side-combine shape that
  * makes distributed top-k cheap. (Spark's own `WindowGroupLimit` gets the
  * same effect for rank-filter windows; this is the programmable form for
  * when the ranking isn't expressible as a window — custom comparators,
  * compound payloads, k per composite condition.)
  *
  * Ordering is value DESC then id ASC, so results are deterministic under
  * ties and reproducible against a SQL row_number() oracle.
  */
object TopKAggregator {

  type Entry = (Double, Long) // (value, id) — value desc, id asc

  private def insert(buf: List[Entry], e: Entry, k: Int): List[Entry] = {
    val (before, after) = buf.span(b => b._1 > e._1 || (b._1 == e._1 && b._2 < e._2))
    val merged = before ::: (e :: after)
    if (merged.lengthCompare(k) > 0) merged.take(k) else merged
  }

  def topK(k: Int): Aggregator[Entry, List[Entry], Seq[Entry]] =
    new Aggregator[Entry, List[Entry], Seq[Entry]] {
      override def zero: List[Entry] = Nil
      override def reduce(buf: List[Entry], e: Entry): List[Entry] =
        insert(buf, e, k)
      override def merge(a: List[Entry], b: List[Entry]): List[Entry] =
        b.foldLeft(a)((acc, e) => insert(acc, e, k))
      override def finish(buf: List[Entry]): Seq[Entry] = buf
      override def bufferEncoder: Encoder[List[Entry]] =
        org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[List[Entry]]()
      override def outputEncoder: Encoder[Seq[Entry]] =
        org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Entry]]()
    }
}
