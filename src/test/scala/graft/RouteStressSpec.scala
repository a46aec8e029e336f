package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Near-dup correctness in the regime the q154 router actually
  * serves (r8, VERDICT task 8): q44's exact-all-pairs oracle is
  * guaranteed only ≤2^11 vectors, so past that the check is CROSS-
  * VALIDATION between the two INDEPENDENT candidate generators —
  * hyperplane-LSH banding (q44) and the IVF 2-probe cell scope
  * (q45's candidate join). Both verify candidates with the same
  * exact cosine, so at the production near-dup operating point
  * (cosine ≥ 0.8, where the adaptive geometry's recall is designed
  * ≥ 1−10⁻³ per pair) any pair one generator emits and the other
  * misses is a candidate-generation miss, not a verification bug.
  *
  * Measured at x10 (50k docs / 20k vecs): q44 ≥0.8 pairs 36,835;
  * cell-scope ≥0.8 pairs 19,828 of which 19,827 are in q44's set —
  * banding is effectively exhaustive at the operating point, while
  * the 2-probe cell scope recalls ~54% of ≥0.8 pairs on this
  * moderately-clustered family (0.8-neighbors need not share either
  * of their two nearest cells) — exactly why the router's contract
  * is per-vector KEEP VERDICTS on the cells route, and why banding
  * stays the default below the skew gate.
  */
class RouteStressSpec extends AnyFunSuite {
  import TestSpark.spark

  private val stress = Seq("/tmp/stress_x10")
    .find(d => java.nio.file.Files.exists(java.nio.file.Paths.get(d, "embeddings.parquet")))

  test("x10: banding covers the cell scope's 0.8-pairs; planted twins fully recalled") {
    assume(stress.nonEmpty, "x10 stress corpus not generated on this host")
    val dir = stress.get
    import graft.functions.VectorOps.dotp
    val OpThr = 0.8
    val p44 = operators.Dedup.q44(spark, dir).filter(col("cosine") >= OpThr)
      .select("id1", "id2").localCheckpoint(false)
    val (cells, _) = operators.Similarity.ivfCellsOf(spark, Tables(spark, dir, "embeddings"))
    val cc = cells.localCheckpoint(false)
    val a = cc.select(col("vec_id").as("id1"),
      explode(array(col("cid"), col("cid2"))).as("cell"),
      col("ed").as("ea"), col("nrm").as("na"))
    val b = cc.select(col("vec_id").as("id2"),
      explode(array(col("cid"), col("cid2"))).as("cell"),
      col("ed").as("eb"), col("nrm").as("nb"))
    val pc = a.hint("shuffle_merge").join(b, Seq("cell"))
      .filter(col("id1") < col("id2"))
      .filter(operators.ops.r4(dotp(col("ea"), col("eb")) / (col("na") * col("nb"))) >= OpThr)
      .select("id1", "id2").distinct().localCheckpoint(false)
    val nc = pc.count()
    val n44 = p44.count()
    val covered = pc.join(p44, Seq("id1", "id2"), "left_semi").count()
    assert(nc > 1000 && n44 > nc, s"unexpected volumes: q44=$n44 cells=$nc — corpus drifted?")
    // the independent generator's pairs are (within rounding-boundary
    // noise) a SUBSET of banding's: banding missed ≤0.1% of them
    assert(covered >= nc - math.max(3L, nc / 1000),
      s"banding missed ${nc - covered} of $nc cell-scope 0.8-pairs")
    // planted twins (cosine ~0.95+): full recall through banding
    val twins = Tables(spark, dir, "embeddings").select("vec_id")
      .filter(pmod(col("vec_id"), lit(143)) === 1 && col("vec_id") > 0)
      .select((col("vec_id") - 1).as("id1"), col("vec_id").as("id2"))
      .localCheckpoint(false)
    val tn = twins.count()
    val t44 = twins.join(p44, Seq("id1", "id2"), "left_semi").count()
    assert(tn > 100 && t44 == tn, s"banding recalled $t44 of $tn planted twins")
  }
}
