package graft.functions

import org.apache.spark.sql.{Column, Encoder}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** One heavy-hitter estimate: `est` undercounts the true frequency
  * by at most n/(k+1) (the Misra-Gries guarantee). */
case class Hh(id: Long, est: Long)

/** Mutable Misra-Gries buffer: at most k (id, count) counters in
  * parallel primitive arrays, fill `n`. Mutated in place between
  * serialization points (the partial→final shuffle), so the per-row
  * `reduce` — including the saturated decrement-all path — allocates
  * nothing; the previous immutable-`Map` form rebuilt the whole map
  * (`mapValues(_-1).filter.toMap`) on every non-member row once
  * saturated. */
case class MgBuf(ids: Array[Long], counts: Array[Long], var n: Int)

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
  * reduce: classic MG — increment a present key (linear scan of ≤ k
  * slots), insert if a slot is free, else decrement every counter in
  * place and compact out the zeros. merge: add counts, then subtract
  * the (k+1)-th largest count from all and drop non-positives, which
  * restores the size bound while preserving the error envelope.
  */
class MisraGriesAgg(k: Int) extends Aggregator[Long, MgBuf, Seq[Hh]] {
  require(k >= 1, s"misra-gries needs k >= 1, got $k")

  override def zero: MgBuf = MgBuf(new Array[Long](k), new Array[Long](k), 0)

  override def reduce(b: MgBuf, x: Long): MgBuf = {
    val n = b.n
    var i = 0
    while (i < n) {
      if (b.ids(i) == x) { b.counts(i) += 1L; return b }
      i += 1
    }
    if (n < k) { b.ids(n) = x; b.counts(n) = 1L; b.n = n + 1; return b }
    // saturated non-member: decrement all, compact zeros in place
    var w = 0
    i = 0
    while (i < n) {
      val c = b.counts(i) - 1L
      if (c > 0L) { b.ids(w) = b.ids(i); b.counts(w) = c; w += 1 }
      i += 1
    }
    b.n = w
    b
  }

  override def merge(x: MgBuf, y: MgBuf): MgBuf = {
    if (y.n == 0) return x
    if (x.n == 0) return y
    val ids = new Array[Long](x.n + y.n)
    val cts = new Array[Long](x.n + y.n)
    var m = x.n
    System.arraycopy(x.ids, 0, ids, 0, x.n)
    System.arraycopy(x.counts, 0, cts, 0, x.n)
    var j = 0
    while (j < y.n) {
      val id = y.ids(j)
      var f = 0
      var found = false
      while (f < x.n && !found) {
        if (ids(f) == id) { cts(f) += y.counts(j); found = true }
        f += 1
      }
      if (!found) { ids(m) = id; cts(m) = y.counts(j); m += 1 }
      j += 1
    }
    val out = zero
    if (m <= k) {
      System.arraycopy(ids, 0, out.ids, 0, m)
      System.arraycopy(cts, 0, out.counts, 0, m)
      out.n = m
    } else {
      // survivors are the counts strictly above the (k+1)-th largest —
      // at most k of them by definition of the cut
      val cut = cts.take(m).sorted(Ordering[Long].reverse)(k)
      var w = 0
      var i = 0
      while (i < m) {
        val c = cts(i) - cut
        if (c > 0L) { out.ids(w) = ids(i); out.counts(w) = c; w += 1 }
        i += 1
      }
      out.n = w
    }
    out
  }

  override def finish(b: MgBuf): Seq[Hh] =
    (0 until b.n).map(i => (b.ids(i), b.counts(i)))
      .sortBy { case (id, est) => (-est, id) }.map { case (id, est) => Hh(id, est) }

  override def bufferEncoder: Encoder[MgBuf] = ExpressionEncoder()
  override def outputEncoder: Encoder[Seq[Hh]] = ExpressionEncoder()
}

object HeavyHitters {
  /** `heavyHitters(k)(key)` → `array<struct<id,est>>`, largest
    * estimate first, ties to the lowest id. */
  def heavyHitters(k: Int)(key: Column): Column =
    udaf(new MisraGriesAgg(k), ExpressionEncoder[Long]()).apply(key)
}
