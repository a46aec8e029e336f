package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.{Gen, Prop, Test => SCTest}

import graft.functions.{Scored, TopKAgg}

/** Algebra-level parity of the mutable-array top-k buffer against the
  * reference `sortWith(beats).take(k)` semantics, over random streams
  * AND random partition/merge trees — Spark may slice and merge the
  * stream in any shape, and every shape must yield the identical
  * (score DESC, id ASC) prefix.
  */
class TopKSpec extends AnyFunSuite {

  private def beats(a: Scored, b: Scored): Boolean =
    a.score > b.score || (a.score == b.score && a.id < b.id)

  private def viaAgg(agg: TopKAgg, xs: Seq[Scored], cuts: Seq[Int]): Seq[Scored] = {
    val bounds = (0 +: cuts.sorted :+ xs.length).distinct.sorted
    val slices = bounds.zip(bounds.tail).map { case (a, b) => xs.slice(a, b) }
    agg.finish(slices.map(_.foldLeft(agg.zero)(agg.reduce)).foldLeft(agg.zero)(agg.merge))
  }

  test("top-k buffer matches full-sort reference for all merge trees") {
    val gen = for {
      k <- Gen.choose(1, 12)
      n <- Gen.choose(0, 400)
      // coarse scores force score-ties broken by id; ids collide too
      xs <- Gen.listOfN(n, for {
        s <- Gen.choose(0, 20).map(_ / 4.0)
        id <- Gen.choose(0L, 60L)
      } yield Scored(s, id))
      nCuts <- Gen.choose(0, 6)
      cuts <- Gen.listOfN(nCuts, Gen.choose(0, n))
    } yield (k, xs, cuts)
    val prop = Prop.forAll(gen) { case (k, xs, cuts) =>
      val agg = new TopKAgg(k)
      val expected = xs.sortWith(beats).take(k)
      viaAgg(agg, xs, cuts) == expected
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(300), prop)
    assert(res.passed, res.status.toString)
  }

  test("single-slice reduce equals reference on adversarial tie streams") {
    val agg = new TopKAgg(3)
    val xs = Seq(Scored(1.0, 5), Scored(1.0, 2), Scored(1.0, 9), Scored(1.0, 1),
      Scored(2.0, 7), Scored(0.5, 0), Scored(2.0, 7))
    val out = agg.finish(xs.foldLeft(agg.zero)(agg.reduce))
    assert(out == xs.sortWith(beats).take(3))
  }

  test("NaN scores are rejected at the gate, independent of merge shape") {
    // a NaN compares false on both sides of `beats`, so admitting one
    // would place it at the FRONT in reduce but sink it in merge —
    // the gate keeps the output identical for every partitioning
    val agg = new TopKAgg(2)
    val xs = Seq(Scored(1.0, 1), Scored(Double.NaN, 9), Scored(2.0, 2), Scored(0.5, 3))
    val expected = Seq(Scored(2.0, 2), Scored(1.0, 1))
    for (cuts <- Seq(Nil, Seq(1), Seq(2), Seq(1, 3)))
      assert(viaAgg(agg, xs, cuts) == expected, s"cuts=$cuts")
    // all-NaN stream yields an empty result, not a NaN ranking
    assert(viaAgg(agg, Seq(Scored(Double.NaN, 1), Scored(Double.NaN, 2)), Nil).isEmpty)
  }
}
