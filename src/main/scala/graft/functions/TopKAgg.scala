package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** A scored candidate for per-key top-k. */
final case class Scored(id: Long, score: Long)

/** Bounded per-key top-k as a typed `Aggregator` — the scale answer
  * for "k best per key":
  *
  * The window form (`row_number() OVER (PARTITION BY key ORDER BY
  * score DESC) <= k`) materializes and SORTS every candidate row per
  * key before discarding all but k. This aggregator keeps a bounded
  * k-element buffer instead: partial aggregation trims to k on the
  * map side, so only k rows per (partition, key) ever cross the
  * shuffle, and no per-key sort of the full candidate set happens
  * anywhere. State is O(k) per key; k is small.
  *
  * Order: score descending, id ascending on ties — identical to the
  * window formulation, so results (and the DuckDB oracle) match
  * exactly.
  */
class TopKAgg(k: Int)
    extends Aggregator[Scored, Seq[Scored], Seq[Scored]] {

  private def better(a: Scored, b: Scored): Boolean =
    a.score > b.score || (a.score == b.score && a.id < b.id)

  override def zero: Seq[Scored] = Nil

  override def reduce(buf: Seq[Scored], x: Scored): Seq[Scored] =
    ((buf :+ x).sortWith(better)).take(k)

  override def merge(a: Seq[Scored], b: Seq[Scored]): Seq[Scored] =
    (a ++ b).sortWith(better).take(k)

  override def finish(r: Seq[Scored]): Seq[Scored] = r.sortWith(better)

  override def bufferEncoder: Encoder[Seq[Scored]] =
    ExpressionEncoder[Seq[Scored]]()
  override def outputEncoder: Encoder[Seq[Scored]] =
    ExpressionEncoder[Seq[Scored]]()
}
