package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

class MlOpsSpec extends AnyFunSuite {
  import TestSpark.{spark, sf}

  test("every ml query returns rows at sf0.001") {
    operators.MlOps.qs.foreach { q =>
      assert(q.fn(spark, sf).count() > 0, s"${q.name} returned no rows")
    }
  }

  test("q30 scores are quartiles 1..4 and every customer is segmented") {
    val df = operators.MlOps.q30(spark, sf)
    Seq("r_score", "f_score", "m_score").foreach { c =>
      assert(df.filter(col(c) < 1 || col(c) > 4).count() == 0, s"$c out of range")
    }
    val custs = Tables(spark, sf, "orders").select("o_custkey").distinct().count()
    assert(df.count() == custs)
  }

  test("q31 keeps at most 5 recs per part, scores in (0,1], no self-recs") {
    val df = operators.MlOps.q31(spark, sf)
    assert(df.groupBy("part_id").count().filter(col("count") > 5).count() == 0)
    assert(df.filter(col("similarity_score") <= 0 || col("similarity_score") > 1).count() == 0)
    assert(df.filter(col("part_id") === col("rec_id")).count() == 0)
  }

  test("q31 similarity is symmetric on the underlying pair counts") {
    // the scored relation (pre-topk) must contain (a,b) iff (b,a)
    val b = Tables(spark, sf, "lineitem").select("l_orderkey", "l_partkey").distinct()
    val pairs = b.as("a").join(b.as("bb"),
        col("a.l_orderkey") === col("bb.l_orderkey") &&
        col("a.l_partkey") < col("bb.l_partkey"))
      .select(col("a.l_partkey"), col("bb.l_partkey"))
    assert(pairs.count() > 0)
  }

  test("q32 flags only customers beyond 2 sigma") {
    assert(operators.MlOps.q32(spark, sf).filter(col("z_score") <= 2.0).count() == 0)
  }

  test("q33 clusters every customer into one of 4 non-empty clusters") {
    val df = operators.MlOps.q33(spark, sf)
    val custs = Tables(spark, sf, "orders").select("o_custkey").distinct().count()
    assert(df.count() == custs)
    assert(df.filter(col("cluster") < 0 || col("cluster") > 3).count() == 0)
    val sizes = df.groupBy("cluster").count()
    assert(sizes.count() >= 2, "KMeans collapsed to a single cluster")
  }

  test("q31 basket cap bounds pair fan-out on a synthetic mega-basket") {
    import spark.implicits._
    val cap = operators.MlOps.MaxBasket
    // one pathological 1000-line basket + a small normal one
    val mega = (1 to 1000).map(p => (1L, p.toLong)) ++ Seq((2L, 1L), (2L, 2L))
    val recs = operators.MlOps.recsFromBaskets(mega.toDF("l_orderkey", "l_partkey"))
    // parts beyond the cap (lowest part ids win) contribute nothing
    assert(recs.filter(col("part_id") > cap).count() == 0,
      "a part past the basket cap leaked into the pair join")
    // and the surviving fan-out is the capped C(cap,2), not C(1000,2):
    // every kept part has at most 5 recs by construction of the top-k
    assert(recs.select("part_id").distinct().count() <= cap)
  }

  test("q35 flags only far-from-centroid customers, consistent with q33 clusters") {
    val df = operators.MlOps.q35(spark, sf)
    assert(df.filter(col("z_score") <= 2.0).count() == 0)
    assert(df.filter(col("centroid_dist") < 0).count() == 0)
    // anomalies are a strict minority of the population
    val custs = Tables(spark, sf, "orders").select("o_custkey").distinct().count()
    val n = df.count()
    assert(n > 0 && n < custs / 10, s"$n anomalies of $custs customers")
    // each flagged customer carries the same cluster id q33 assigns
    val joined = df.join(operators.MlOps.q33(spark, sf)
      .select(col("o_custkey"), col("cluster").as("c33")), "o_custkey")
    assert(joined.filter(col("cluster") =!= col("c33")).count() == 0)
  }

  test("q105 classifier covers every doc, is internally consistent, and learns the gate on holdout") {
    val df = operators.MlOps.q105(spark, sf).cache()
    try {
      val docs = Tables(spark, sf, "documents")
      assert(df.count() == docs.count())
      // probability is a probability, and the decision IS the 0.5 cut
      assert(df.filter(col("p_keep") < 0 || col("p_keep") > 1).count() == 0)
      assert(df.filter(col("predicted_keep") =!= (col("p_keep") > 0.5)).count() == 0)
      // the label column restates q60's gate exactly
      val gate = operators.TextOps.q60(spark, sf)
        .select(col("doc_id"), (col("quality_score") >= 0.4).as("g"))
      assert(df.join(gate, "doc_id").filter(col("is_keep") =!= col("g")).count() == 0)
      // both classes actually occur (else accuracy is vacuous)
      assert(df.filter(col("is_keep")).count() > 0)
      assert(df.filter(!col("is_keep")).count() > 0)
      // holdout = the content-keyed val/test buckets, trained-on docs excluded
      val hold = df.filter(col("holdout"))
      val n = hold.count()
      assert(n > 0, "no holdout docs")
      val correct = hold.filter(col("predicted_keep") === col("is_keep")).count()
      assert(correct * 10 >= n * 9,
        s"holdout accuracy ${correct.toDouble / n} below 0.9")
    } finally df.unpersist()
  }

  test("q121 association rules equal a local brute-force recompute") {
    val got = operators.MlOps.q121(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    val baskets = Tables(spark, sf, "lineitem")
      .select("l_orderkey", "l_partkey").distinct()
      .collect().map(r => (r.getLong(0), r.getLong(1)))
      .groupBy(_._1).view.mapValues(_.map(_._2).sorted.take(operators.MlOps.MaxBasket)).toMap
    val nOrders = baskets.size.toLong
    val cnt = baskets.values.flatten.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val pairs = scala.collection.mutable.Map[(Long, Long), Long]().withDefaultValue(0L)
    baskets.values.foreach { ps =>
      for (i <- ps.indices; j <- i + 1 until ps.length)
        pairs((ps(i), ps(j))) += 1L
    }
    val rules = pairs.toSeq.filter(_._2 >= 2).flatMap { case ((a, b), c) =>
      Seq((a, b, c), (b, a, c))
    }.map { case (a, b, c) =>
      (a, b, c, c * 1000000L / cnt(a), c * nOrders * 1000000L / (cnt(a) * cnt(b)))
    }.sortBy { case (a, b, c, _, _) => (-c, a, b) }.take(100)
    assert(got.toSeq == rules, s"first diff: ${got.toSeq.zip(rules).find(p => p._1 != p._2)}")
  }

  test("q34 ALS gives each customer 5 ranked recs with descending scores") {
    val df = operators.MlOps.q34(spark, sf)
    assert(df.groupBy("o_custkey").count().filter(col("count") =!= 5).count() == 0)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("o_custkey").orderBy("rank")
    val bad = df.withColumn("prev", lag("score", 1).over(w))
      .filter(col("prev").isNotNull && col("score") > col("prev"))
    assert(bad.count() == 0, "scores must be non-increasing with rank")
  }

  test("q147 PCA spectrum: decreasing, positive, consistent cumulative, above-isotropic head") {
    val rows = operators.MlOps.q147(TestSpark.spark, TestSpark.sf).collect()
      .map(r => (r.getInt(0), r.getDouble(1), r.getDouble(2)))
    assert(rows.map(_._1).toSeq == (1 to 16))
    assert(rows.forall(_._2 > 0.0))
    // explained fractions non-increasing; cumulative strictly increasing
    assert(rows.sliding(2).forall { case Array(a, b) => a._2 >= b._2 && a._3 < b._3 })
    // cumulative is the running sum of the (unrounded) fractions:
    // rounded check within one ulp-of-rounding per step
    val cumErr = rows.scanLeft(0.0)((acc, r) => acc + r._2).drop(1)
      .zip(rows.map(_._3)).map { case (a, b) => math.abs(a - b) }.max
    assert(cumErr <= 16 * 1e-6, s"cum drift $cumErr")
    assert(rows.last._3 < 1.0)
    // the head component must beat the isotropic share (1/64): the
    // corpus carries real cluster structure
    assert(rows.head._2 > 1.2 / 64.0, s"head ${rows.head._2} not above isotropic")
  }
}
