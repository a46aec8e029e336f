package graft.functions

import org.apache.spark.sql.{Column, Encoder}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Mutable k-permutation MinHash signature buffer: slot i holds the
  * minimum of permutation i over every element reduced so far
  * (Long.MaxValue when empty). Mutated in place between
  * serialization points, like MgBuf. */
case class MhBuf(mins: Array[Long])

/** Mergeable MinHash SIGNATURE aggregate (Broder 1997): the set-
  * similarity member of the sketch family (q14 HLL for cardinality,
  * q19 GK for quantiles, q76 Misra-Gries for frequencies). For a
  * group's element set S, slot i is min_{x∈S} π_i(x) where π_i is a
  * fixed multiply-add bijection of the 64-bit ring (odd multiplier →
  * invertible, so min over the permuted multiset = min over the
  * permuted SET: duplicates never skew the sketch and no distinct()
  * pre-shuffle is needed). P[slot agrees across two groups] equals
  * the Jaccard similarity of their sets, so the agreeing-slot
  * fraction estimates J with s.e. sqrt(J(1-J)/k).
  *
  * Scale shape: k longs of state per group, map-side partial
  * aggregation, element-wise-min merge — group similarity over a
  * 100 TB corpus shuffles #groups × k longs, never the elements.
  * Slot agreement depends on the fixed permutation constants, not on
  * reduce/merge order (min is commutative/associative/idempotent),
  * so the SIGNATURE is deterministic — but it is still an estimator
  * of Jaccard, hence rows-only (spec asserts the estimate against
  * exact Jaccard on known-overlap sets).
  */
class MinHashSigAgg(k: Int) extends Aggregator[Long, MhBuf, Seq[Long]] {
  require(k >= 1, s"minhash needs k >= 1 permutations, got $k")

  private val as: Array[Long] = MinHashSig.oddConstants(k, 0x9e3779b97f4a7c15L)
  private val bs: Array[Long] = MinHashSig.oddConstants(k, 0xc2b2ae3d27d4eb4fL)

  override def zero: MhBuf = MhBuf(Array.fill(k)(Long.MaxValue))

  override def reduce(b: MhBuf, x: Long): MhBuf = {
    var i = 0
    while (i < k) {
      val p = as(i) * x + bs(i)
      if (p < b.mins(i)) b.mins(i) = p
      i += 1
    }
    b
  }

  override def merge(x: MhBuf, y: MhBuf): MhBuf = {
    var i = 0
    while (i < k) {
      if (y.mins(i) < x.mins(i)) x.mins(i) = y.mins(i)
      i += 1
    }
    x
  }

  override def finish(b: MhBuf): Seq[Long] = b.mins.toSeq

  override def bufferEncoder: Encoder[MhBuf] = ExpressionEncoder()
  override def outputEncoder: Encoder[Seq[Long]] = ExpressionEncoder()
}

object MinHashSig {
  /** Deterministic odd 64-bit constants via splitmix64 steps from a
    * fixed seed — odd so each multiply-add is a bijection of Z/2^64. */
  private[functions] def oddConstants(k: Int, seed: Long): Array[Long] = {
    var s = seed
    Array.fill(k) {
      s += 0x9e3779b97f4a7c15L
      var z = s
      z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
      z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
      z = z ^ (z >>> 31)
      z | 1L
    }
  }

  /** `minhashSig(k)(elem)` → `array<bigint>` of k slot minima. */
  def minhashSig(k: Int)(elem: Column): Column =
    udaf(new MinHashSigAgg(k), ExpressionEncoder[Long]()).apply(elem)
}
