package graft.functions

import org.apache.spark.sql.{Column, Encoder}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** One ranked candidate; ordering is (score DESC, id ASC) — the same
  * total order as `row_number() OVER (ORDER BY score DESC, id)`.
  */
case class Scored(score: Double, id: Long)

/** Mutable bounded top-k buffer: parallel primitive arrays kept
  * best-first, capacity k, fill `n`. A case class of primitive
  * arrays so the `ExpressionEncoder` serializes it compactly at the
  * partial→final shuffle; between rows the object lives unserialized
  * in the `ObjectHashAggregate` map and is mutated in place — the
  * hot `reduce` path allocates nothing.
  */
case class TopKBuf(scores: Array[Double], ids: Array[Long], var n: Int)

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
  *
  * The buffer is a pair of primitive arrays mutated in place
  * (insertion by shift into the sorted prefix); the previous
  * `Seq[Scored]` form re-sorted and re-allocated the whole buffer on
  * every accepted row. Order of results is bit-identical: strict
  * (score DESC, id ASC) insertion produces the same sequence as
  * `sortWith(beats).take(k)` on distinct (score, id) pairs.
  */
class TopKAgg(k: Int) extends Aggregator[Scored, TopKBuf, Seq[Scored]] {
  require(k >= 1, s"top-k needs k >= 1, got $k")

  /** Strict total order on distinct non-NaN pairs: true iff (s1,i1)
    * ranks before (s2,i2). */
  private def beats(s1: Double, i1: Long, s2: Double, i2: Long): Boolean =
    s1 > s2 || (s1 == s2 && i1 < i2)

  override def zero: TopKBuf = TopKBuf(new Array[Double](k), new Array[Long](k), 0)

  override def reduce(b: TopKBuf, a: Scored): TopKBuf = {
    // NaN scores are unrankable and REJECTED at the gate: `beats` is
    // false on both sides of a NaN, so admitting one would place it
    // differently in reduce (front) than in merge (back), making the
    // output merge-tree-dependent — the determinism this class
    // promises. (The old Seq.sortWith form had the same instability.)
    if (a.score.isNaN) return b
    val n = b.n
    // full buffer whose worst entry beats the row: the common case at
    // scale — no shift, no allocation.
    if (n == k && beats(b.scores(n - 1), b.ids(n - 1), a.score, a.id)) return b
    // find insertion point: first slot whose entry does NOT beat a
    var pos = 0
    while (pos < n && beats(b.scores(pos), b.ids(pos), a.score, a.id)) pos += 1
    if (pos >= k) return b // beaten by a full buffer of ties-or-better
    val last = math.min(n, k - 1) // entries at/after pos shift right; overflow drops
    var i = last
    while (i > pos) {
      b.scores(i) = b.scores(i - 1); b.ids(i) = b.ids(i - 1); i -= 1
    }
    b.scores(pos) = a.score; b.ids(pos) = a.id
    if (n < k) b.n = n + 1
    b
  }

  override def merge(x: TopKBuf, y: TopKBuf): TopKBuf = {
    if (y.n == 0) return x
    if (x.n == 0) return y
    val ms = new Array[Double](k); val mi = new Array[Long](k)
    var xi = 0; var yi = 0; var o = 0
    while (o < k && (xi < x.n || yi < y.n)) {
      val takeX =
        if (yi >= y.n) true
        else if (xi >= x.n) false
        else beats(x.scores(xi), x.ids(xi), y.scores(yi), y.ids(yi))
      if (takeX) { ms(o) = x.scores(xi); mi(o) = x.ids(xi); xi += 1 }
      else { ms(o) = y.scores(yi); mi(o) = y.ids(yi); yi += 1 }
      o += 1
    }
    TopKBuf(ms, mi, o)
  }

  override def finish(r: TopKBuf): Seq[Scored] =
    (0 until r.n).map(i => Scored(r.scores(i), r.ids(i)))

  override def bufferEncoder: Encoder[TopKBuf] = ExpressionEncoder()
  override def outputEncoder: Encoder[Seq[Scored]] = ExpressionEncoder()
}

/** Long-keyed sibling of [[Scored]]/[[TopKAgg]] for EXACT integer
  * rank keys (micro-unit BM25 sums, packed argmax keys): casting a
  * long to double collapses distinct values above 2^53 into ties, at
  * which point the aggregate's order can diverge from an oracle's
  * exact BIGINT ORDER BY. Same ordering contract — (score DESC, id
  * ASC) — same NaN-free buffer discipline (longs have no NaN), same
  * bounded in-place buffer.
  */
case class ScoredL(score: Long, id: Long)

case class TopKLBuf(scores: Array[Long], ids: Array[Long], var n: Int)

class TopKLAgg(k: Int) extends Aggregator[ScoredL, TopKLBuf, Seq[ScoredL]] {
  require(k >= 1, s"top-k needs k >= 1, got $k")

  private def beats(s1: Long, i1: Long, s2: Long, i2: Long): Boolean =
    s1 > s2 || (s1 == s2 && i1 < i2)

  override def zero: TopKLBuf = TopKLBuf(new Array[Long](k), new Array[Long](k), 0)

  override def reduce(b: TopKLBuf, a: ScoredL): TopKLBuf = {
    val n = b.n
    if (n == k && beats(b.scores(n - 1), b.ids(n - 1), a.score, a.id)) return b
    var pos = 0
    while (pos < n && beats(b.scores(pos), b.ids(pos), a.score, a.id)) pos += 1
    if (pos >= k) return b
    val last = math.min(n, k - 1)
    var i = last
    while (i > pos) {
      b.scores(i) = b.scores(i - 1); b.ids(i) = b.ids(i - 1); i -= 1
    }
    b.scores(pos) = a.score; b.ids(pos) = a.id
    if (n < k) b.n = n + 1
    b
  }

  override def merge(x: TopKLBuf, y: TopKLBuf): TopKLBuf = {
    if (y.n == 0) return x
    if (x.n == 0) return y
    val ms = new Array[Long](k); val mi = new Array[Long](k)
    var xi = 0; var yi = 0; var o = 0
    while (o < k && (xi < x.n || yi < y.n)) {
      val takeX =
        if (yi >= y.n) true
        else if (xi >= x.n) false
        else beats(x.scores(xi), x.ids(xi), y.scores(yi), y.ids(yi))
      if (takeX) { ms(o) = x.scores(xi); mi(o) = x.ids(xi); xi += 1 }
      else { ms(o) = y.scores(yi); mi(o) = y.ids(yi); yi += 1 }
      o += 1
    }
    TopKLBuf(ms, mi, o)
  }

  override def finish(r: TopKLBuf): Seq[ScoredL] =
    (0 until r.n).map(i => ScoredL(r.scores(i), r.ids(i)))

  override def bufferEncoder: Encoder[TopKLBuf] = ExpressionEncoder()
  override def outputEncoder: Encoder[Seq[ScoredL]] = ExpressionEncoder()
}

object TopK {
  /** `topk(k)(score, id)` → `array<struct<score,id>>`, best first. */
  def topk(k: Int)(score: Column, id: Column): Column =
    udaf(new TopKAgg(k), ExpressionEncoder[Scored]()).apply(score, id)

  /** Long-keyed `topkL(k)(score, id)`: exact at any 64-bit magnitude
    * (no 2^53 tie collapse). */
  def topkL(k: Int)(score: Column, id: Column): Column =
    udaf(new TopKLAgg(k), ExpressionEncoder[ScoredL]()).apply(score, id)
}
