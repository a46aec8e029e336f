package graft.functions

import org.apache.spark.sql.{Column, Encoder}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** One ranked candidate; ordering is (score DESC, id ASC) — the same
  * total order as `row_number() OVER (ORDER BY score DESC, id)`.
  */
case class Scored(score: Double, id: Long)

/** Bounded top-k aggregate: the k largest (score, id) pairs per
  * group, as a best-first array.
  *
  * This replaces the global-window top-k idiom
  * (`row_number().over(Window.partitionBy(g).orderBy(...)) <= k`),
  * whose shuffle moves EVERY scored row into #groups partitions — at
  * a 100 TB corpus with a handful of query groups that is an
  * all-data exchange into near-zero parallelism. As a
  * TypedImperativeAggregate the buffer stays bounded at k entries
  * and partial aggregation runs map-side, so the shuffle carries at
  * most k rows per (group × input partition) and the final merge is
  * k-bounded per group — the distributed TakeOrderedAndProject shape
  * the window form only pretends to have.
  */
class TopKAgg(k: Int) extends Aggregator[Scored, Seq[Scored], Seq[Scored]] {
  require(k >= 1, s"top-k needs k >= 1, got $k")

  private def beats(a: Scored, b: Scored): Boolean =
    a.score > b.score || (a.score == b.score && a.id < b.id)

  override def zero: Seq[Scored] = Nil

  override def reduce(b: Seq[Scored], a: Scored): Seq[Scored] =
    // full buffer whose worst entry beats the row: the common case at
    // scale — no allocation, no sort.
    if (b.lengthCompare(k) >= 0 && beats(b.last, a)) b
    else ((a +: b).sortWith(beats)).take(k)

  override def merge(x: Seq[Scored], y: Seq[Scored]): Seq[Scored] =
    (x ++ y).sortWith(beats).take(k)

  override def finish(r: Seq[Scored]): Seq[Scored] = r

  override def bufferEncoder: Encoder[Seq[Scored]] = ExpressionEncoder()
  override def outputEncoder: Encoder[Seq[Scored]] = ExpressionEncoder()
}

object TopK {
  /** `topk(k)(score, id)` → `array<struct<score,id>>`, best first. */
  def topk(k: Int)(score: Column, id: Column): Column =
    udaf(new TopKAgg(k), ExpressionEncoder[Scored]()).apply(score, id)
}
