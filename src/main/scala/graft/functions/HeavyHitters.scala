package graft.functions

import org.apache.spark.sql.{Column, Encoder}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** One heavy-hitter estimate: `est` undercounts the true frequency
  * by at most n/(k+1) (the Misra-Gries guarantee). */
case class Hh(id: Long, est: Long)

/** Misra-Gries mergeable heavy-hitter summary (Misra & Gries 1982;
  * mergeability per Agarwal et al., "Mergeable Summaries", PODS'12).
  *
  * The exact top-frequency answer at 100 TB costs a full
  * groupBy(key) shuffle of every row. This summary keeps at most k
  * counters per group, partial-aggregates map-side, and merges
  * k-bounded state — the same scale shape as the HLL (q14) and GK
  * (q19) sketches, completing the mergeable-sketch family for
  * frequencies. Guarantees (for a group of n rows):
  *   - true_count - n/(k+1) <= est <= true_count for surviving keys;
  *   - every key with true_count > n/(k+1) survives.
  * Which keys BELOW that threshold survive — and their exact
  * residual counts — depends on reduce/merge order, so the summary
  * is rows-only (spec asserts the guarantees, like q14's ±ε), never
  * hash-compared.
  *
  * reduce: classic MG — increment a present key, insert if a slot is
  * free, else decrement every counter (dropping zeros). merge: add
  * counts, then subtract the (k+1)-th largest count from all and
  * drop non-positives, which restores the size bound while
  * preserving the error envelope.
  */
class MisraGriesAgg(k: Int) extends Aggregator[Long, Map[Long, Long], Seq[Hh]] {
  require(k >= 1, s"misra-gries needs k >= 1, got $k")

  override def zero: Map[Long, Long] = Map.empty

  override def reduce(m: Map[Long, Long], x: Long): Map[Long, Long] =
    m.get(x) match {
      case Some(c) => m.updated(x, c + 1L)
      case None if m.size < k => m.updated(x, 1L)
      case None => m.view.mapValues(_ - 1L).filter(_._2 > 0L).toMap
    }

  override def merge(a: Map[Long, Long], b: Map[Long, Long]): Map[Long, Long] = {
    val s = (a.keySet ++ b.keySet).iterator
      .map(id => id -> (a.getOrElse(id, 0L) + b.getOrElse(id, 0L))).toMap
    if (s.size <= k) s
    else {
      val cut = s.values.toIndexedSeq.sorted(Ordering[Long].reverse)(k)
      s.view.mapValues(_ - cut).filter(_._2 > 0L).toMap
    }
  }

  override def finish(m: Map[Long, Long]): Seq[Hh] =
    m.toSeq.sortBy { case (id, est) => (-est, id) }.map { case (id, est) => Hh(id, est) }

  override def bufferEncoder: Encoder[Map[Long, Long]] = ExpressionEncoder()
  override def outputEncoder: Encoder[Seq[Hh]] = ExpressionEncoder()
}

object HeavyHitters {
  /** `heavyHitters(k)(key)` → `array<struct<id,est>>`, largest
    * estimate first, ties to the lowest id. */
  def heavyHitters(k: Int)(key: Column): Column =
    udaf(new MisraGriesAgg(k), ExpressionEncoder[Long]()).apply(key)
}
