package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

class DedupSpec extends AnyFunSuite {
  import TestSpark.{spark, sf}

  test("q40 covers every document and canonical ids are group minima") {
    val df = operators.Dedup.q40(spark, sf)
    val docs = Tables(spark, sf, "documents").count()
    assert(df.count() == docs)
    assert(df.filter(col("canonical_id") > col("doc_id")).count() == 0)
  }

  test("q41 jaccard pairs are ordered, deduped, and above threshold") {
    val df = operators.Dedup.q41(spark, sf)
    assert(df.count() > 0, "expected near-dup pairs in synthetic docs")
    assert(df.filter(col("d1") >= col("d2")).count() == 0)
    assert(df.filter(col("jaccard") < 0.6 || col("jaccard") > 1.0).count() == 0)
  }

  test("q42 MinHash-LSH recalls the exact jaccard pairs (same threshold)") {
    val exact = operators.Dedup.q41(spark, sf).select("d1", "d2")
    val lsh = operators.Dedup.q42(spark, sf).select("d1", "d2")
    val nExact = exact.count()
    val hit = exact.join(lsh, Seq("d1", "d2"), "left_semi").count()
    // 32 bands × 4 rows ⇒ P(miss at j=0.6) = (1-.6^4)^32 ≈ 1.2% per pair
    assert(hit >= (nExact * 0.9).toLong, s"LSH recall $hit/$nExact < 0.9")
    // and LSH never invents pairs: it verifies candidates exactly
    assert(lsh.join(exact, Seq("d1", "d2"), "left_anti").count() == 0)
  }

  test("q65 clusters are closed under the pair graph and keyed by minimum") {
    val labels = operators.Dedup.q65(spark, sf)
    val pairs = operators.Dedup.q41(spark, sf).select("d1", "d2")
    // every near-dup pair must share a cluster
    val l1 = labels.withColumnRenamed("doc_id", "d1").withColumnRenamed("cluster_id", "c1")
    val l2 = labels.withColumnRenamed("doc_id", "d2").withColumnRenamed("cluster_id", "c2")
    val split = pairs.join(l1, "d1").join(l2, "d2").filter(col("c1") =!= col("c2"))
    assert(split.count() == 0, "a connected pair landed in two clusters")
    // cluster id is the minimum member id
    val badKey = labels.groupBy("cluster_id").agg(min("doc_id").as("m"))
      .filter(col("cluster_id") =!= col("m"))
    assert(badKey.count() == 0)
    assert(labels.count() == Tables(spark, sf, "documents").count())
    // no over-merging: p edges can merge away at most p clusters, so
    // clusters >= docs - pairs (catches a degenerate all-one-cluster
    // labeling that the closure assertions above cannot see)
    val nClusters = labels.select("cluster_id").distinct().count()
    val nDocs = labels.count()
    val nPairs = pairs.count()
    assert(nClusters >= nDocs - nPairs && nClusters > 1,
      s"over-merged: $nClusters clusters for $nDocs docs / $nPairs pairs")
  }

  test("q43 simhash near-dups have small hamming distance and include true dups") {
    val df = operators.Dedup.q43(spark, sf)
    assert(df.filter(col("hamming") > 8).count() == 0)
    assert(df.count() > 0, "expected simhash candidates on near-dup corpus")
  }

  test("q43 block-combination banding recalls ALL hamming<=8 pairs (exhaustive)") {
    val sims = operators.Dedup.simhashes(spark, sf)
    val a = sims.select(col("doc_id").as("d1"), col("simhash").as("h1"))
    val b = sims.select(col("doc_id").as("d2"), col("simhash").as("h2"))
    val exact = a.join(b, col("d1") < col("d2"))
      .withColumn("hamming", bit_count(col("h1").bitwiseXOR(col("h2"))))
      .filter(col("hamming") <= 8)
      .select("d1", "d2", "hamming")
    val got = operators.Dedup.q43(spark, sf).select("d1", "d2", "hamming")
    assert(exact.exceptAll(got).count() == 0,
      "banding missed a hamming<=8 pair — the >=2-clean-blocks guarantee is broken")
    assert(got.exceptAll(exact).count() == 0, "q43 emitted a pair outside hamming<=8")
  }

  test("q44 embedding near-dups are id-ordered and above threshold") {
    val df = operators.Dedup.q44(spark, sf)
    assert(df.filter(col("id1") >= col("id2")).count() == 0)
    assert(df.filter(col("cosine") < 0.45).count() == 0)
  }

  test("q44 LSH candidates recall the exact all-pairs result (exhaustive)") {
    import graft.functions.VectorOps.{dotp, l2norm}
    val e = Tables(spark, sf, "embeddings").withColumn("nrm", l2norm(col("embedding")))
    val a = e.select(col("vec_id").as("id1"), col("embedding").as("e1"), col("nrm").as("n1"))
    val b = e.select(col("vec_id").as("id2"), col("embedding").as("e2"), col("nrm").as("n2"))
    val exact = a.join(b, col("id1") < col("id2"))
      .withColumn("cos", dotp(col("e1"), col("e2")) / (col("n1") * col("n2")))
      .filter(col("cos") >= 0.45)
      .select("id1", "id2")
    val got = operators.Dedup.q44(spark, sf).select("id1", "id2")
    assert(exact.exceptAll(got).count() == 0,
      "LSH candidate generation missed a true pair at this SF — widen NdBands")
    assert(got.exceptAll(exact).count() == 0, "q44 emitted a pair below threshold")
  }
}
