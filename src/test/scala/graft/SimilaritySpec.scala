package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

class SimilaritySpec extends AnyFunSuite {
  import TestSpark.{spark, sf}

  test("q50 returns exactly 5 ranked neighbors per query, no self-match") {
    val df = operators.Similarity.q50(spark, sf)
    val counts = df.groupBy("query_id").count()
    assert(counts.filter(col("count") =!= 5).count() == 0)
    assert(df.filter(col("query_id") === col("neighbor_id")).count() == 0)
    assert(df.filter(col("rank") < 1 || col("rank") > 5).count() == 0)
  }

  test("q50 cosine is non-increasing with rank per query") {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("query_id").orderBy("rank")
    val bad = operators.Similarity.q50(spark, sf)
      .withColumn("prev", lag("cosine", 1).over(w))
      .filter(col("prev").isNotNull && col("cosine") > col("prev"))
    assert(bad.count() == 0)
  }

  test("q51 LSH ANN achieves measurable recall@5 against brute force") {
    val exact = operators.Similarity.q50(spark, sf).select("query_id", "neighbor_id")
    val approx = operators.Similarity.q51(spark, sf).select("query_id", "neighbor_id")
    val n = exact.count()
    val hit = exact.join(approx, Seq("query_id", "neighbor_id"), "left_semi").count()
    // 4 bands × 4 bits on weakly-clustered synthetic data: expect
    // well above random (~6% of corpus per bucket-union)
    assert(hit * 1.0 / n >= 0.3, s"recall@5 = $hit/$n too low")
    assert(approx.groupBy("query_id").count().filter(col("count") > 5).count() == 0)
  }

  test("q52 IVF ANN achieves measurable recall@5 against brute force") {
    val exact = operators.Similarity.q50(spark, sf).select("query_id", "neighbor_id")
    val approx = operators.Similarity.q52(spark, sf).select("query_id", "neighbor_id")
    val n = exact.count()
    val hit = exact.join(approx, Seq("query_id", "neighbor_id"), "left_semi").count()
    info(s"IVF recall@5 = $hit/$n")
    // nprobe=4 of k=16 cells scans ~25% of a weakly-clustered corpus
    assert(hit * 1.0 / n >= 0.3, s"recall@5 = $hit/$n too low")
    assert(approx.groupBy("query_id").count().filter(col("count") > 5).count() == 0)
    assert(approx.filter(col("query_id") === col("neighbor_id")).count() == 0)
  }
}
