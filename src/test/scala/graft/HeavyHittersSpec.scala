package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.{Gen, Prop, Test => SCTest}

import graft.functions.MisraGriesAgg

/** Property-level guarantees of the Misra-Gries summary, checked
  * over random streams AND random partition/merge trees — the
  * algebra Spark exercises with arbitrary partitioning and merge
  * order must hold for every shape, not just the corpus's.
  */
class HeavyHittersSpec extends AnyFunSuite {

  private def summarize(agg: MisraGriesAgg, xs: Seq[Long], cuts: Seq[Int]): Map[Long, Long] = {
    // split the stream at the given points, reduce each slice, then
    // merge left-to-right — a random instance of Spark's partial
    // aggregation shape
    val bounds = (0 +: cuts.sorted :+ xs.length).distinct.sorted
    val slices = bounds.zip(bounds.tail).map { case (a, b) => xs.slice(a, b) }
    val buf = slices.map(_.foldLeft(agg.zero)(agg.reduce)).foldLeft(agg.zero)(agg.merge)
    agg.finish(buf).map(h => h.id -> h.est).toMap
  }

  test("Misra-Gries bounds hold for random streams and merge trees") {
    val k = 8
    val agg = new MisraGriesAgg(k)
    val gen = for {
      n <- Gen.choose(1, 1500)
      xs <- Gen.listOfN(n, Gen.frequency(
        (6, Gen.choose(0L, 40L)),   // background
        (4, Gen.oneOf(100L, 101L))  // skewed pair
      ))
      nCuts <- Gen.choose(0, 6)
      cuts <- Gen.listOfN(nCuts, Gen.choose(0, n))
    } yield (xs, cuts)
    val prop = Prop.forAll(gen) { case (xs, cuts) =>
      val m = summarize(agg, xs, cuts)
      val exact = xs.groupBy(identity).view.mapValues(_.length.toLong).toMap
      val err = xs.length.toLong / (k + 1)
      val sizeOk = m.size <= k
      val boundsOk = m.forall { case (id, est) =>
        est <= exact(id) && est >= exact(id) - err
      }
      val survivalOk = exact.forall { case (id, t) =>
        t <= err || m.contains(id)
      }
      sizeOk && boundsOk && survivalOk
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(200), prop)
    assert(res.passed, res.status.toString)
  }
}
