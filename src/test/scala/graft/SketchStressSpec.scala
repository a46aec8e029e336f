package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** The sketch families' MERGE LAWS at stress volume (r8, VERDICT
  * task 7): the sf0.001 specs pin the laws where every aggregation
  * fits one partition wave; here the same assertions run against the
  * x10 generated corpus (50k docs — partition counts actually differ
  * between the compared plans), so partitioning/merge-order
  * invariance is pinned where it could actually break. Parameterized
  * over the stress dir: GRAFT_STRESS_DIR > /tmp/stress_x10 > the
  * driver sf0.001 fallback (the suite stays green on hosts without
  * generated corpora — the law still holds, just with less force).
  */
class SketchStressSpec extends AnyFunSuite {
  import TestSpark.spark

  private val dir: String =
    (sys.env.get("GRAFT_STRESS_DIR").toSeq ++ Seq("/tmp/stress_x10", TestSpark.sf))
      .find(d => java.nio.file.Files.exists(java.nio.file.Paths.get(d, "documents.parquet")))
      .get

  private def toks(f: org.apache.spark.sql.DataFrame) =
    f.select(explode(expr(operators.Dedup.tokensExpr)).as("tok"))

  test(s"CMS sketch merge law at stress volume ($dir)") {
    val docs = Tables(spark, dir, "documents")
    val full = operators.TextOps.cmsSketch(toks(docs)).localCheckpoint(false)
    assert(full.count() <= operators.TextOps.CmsD.toLong * operators.TextOps.CmsW)
    // partitioning invariance where partition counts actually differ
    val r97 = operators.TextOps.cmsSketch(toks(docs).repartition(97))
    assert(r97.exceptAll(full).isEmpty && full.exceptAll(r97).isEmpty,
      "CMS counts depend on partitioning")
    // shard-merge equality: day-shards (doc_id mod 3) merged by cell
    // sums equal the single-pass sketch, at volume
    val shards = (0 until 3).map(k =>
      operators.TextOps.cmsSketch(toks(docs.filter(pmod(col("doc_id"), lit(3)) === k))))
    val merged = shards.reduce(_ unionByName _)
      .groupBy("d", "cell").agg(sum("n").as("n"))
    assert(merged.exceptAll(full).isEmpty && full.exceptAll(merged).isEmpty,
      "CMS shard merge diverges from the single-pass sketch")
  }

  test(s"MinHash source-similarity merge invariance at stress volume ($dir)") {
    val elems = Tables(spark, dir, "documents")
      .select(col("source"), xxhash64(col("text")).as("h"))
    val a = operators.Dedup.sourceSimCore(elems)
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getDouble(2)).toMap
    val b = operators.Dedup.sourceSimCore(elems.repartition(97))
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getDouble(2)).toMap
    assert(a.nonEmpty && a == b,
      "per-slot MIN merge produced a partitioning-dependent estimate")
  }

  test(s"HLL overlap sketch merge law at stress volume ($dir): deterministic per layout, envelope-bounded across layouts") {
    // MEASURED at x10 (r8): unlike CMS (pure counting) and MinHash
    // (per-slot min), the HLL estimate is NOT bit-identical across
    // partition layouts — per-partition partial sketches transition
    // sparse→dense at different points, and the dense union's
    // composite estimator differs by merge grouping. Two runs of the
    // SAME layout agree exactly (the merge is deterministic), and
    // layouts disagree only inside the sketch's own error envelope
    // (~1% observed, ≤3% asserted — the q113 spec's band). That IS
    // the HLL merge law; asserting bit-identity would pin an
    // implementation accident the sketch never promised.
    val rows = Tables(spark, dir, "documents").select("source", "text")
    def m(f: org.apache.spark.sql.DataFrame) =
      operators.Dedup.overlapEstCore(f).collect()
        .map(r => (r.getString(0), r.getString(1)) ->
          ((r.getAs[Long]("est_a"), r.getAs[Long]("est_b"),
            r.getAs[Long]("est_shared"), r.getAs[Long]("est_union")))).toMap
    val a = m(rows)
    val b = m(rows.repartition(97))
    val b2 = m(rows.repartition(97))
    assert(a.nonEmpty && b == b2, "same-layout merge is nondeterministic")
    a.keySet.foreach { k =>
      val (aa, ab, ash, aun) = a(k)
      val (ba, bb, bsh, _) = b(k)
      assert(math.abs(aa - ba) <= math.max(3L, (aa * 0.03).toLong) &&
        math.abs(ab - bb) <= math.max(3L, (ab * 0.03).toLong),
        s"$k cardinalities outside the 3% envelope: $aa/$ba, $ab/$bb")
      // inclusion–exclusion amplifies error: union-scaled band
      assert(math.abs(ash - bsh) <= math.max(3L, (aun * 0.05).toLong),
        s"$k shared estimate outside the amplified band: $ash vs $bsh (union $aun)")
    }
  }
}
