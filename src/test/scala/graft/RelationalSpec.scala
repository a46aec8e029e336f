package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

class RelationalSpec extends AnyFunSuite {
  import TestSpark.{spark, sf}

  test("every relational query returns rows at sf0.001") {
    operators.Relational.qs.foreach { q =>
      assert(q.fn(spark, sf).count() > 0, s"${q.name} returned no rows")
    }
  }

  test("q01 groups are the 6 (returnflag, linestatus) combos") {
    val rows = operators.Relational.q01(spark, sf).collect()
    assert(rows.length == 6)
    assert(rows.forall(r => r.getAs[Long]("count_order") > 0))
  }

  test("q03 top-k is sorted desc by revenue with orderkey tiebreak") {
    val rev = operators.Relational.q03(spark, sf)
      .select("revenue").collect().map(_.getDouble(0))
    assert(rev.length <= 10 && (rev, rev.sorted.reverse).zipped.forall(_ == _))
  }

  test("q09 cumulative revenue is monotone per supplier") {
    val bad = operators.Relational.q09(spark, sf)
      .withColumn("prev", lag("cum_revenue", 1).over(
        org.apache.spark.sql.expressions.Window.partitionBy("l_suppkey").orderBy("day")))
      .filter(col("prev").isNotNull && col("cum_revenue") < col("prev"))
    assert(bad.count() == 0)
  }

  test("q10 keeps at most 3 parts per brand") {
    val over = operators.Relational.q10(spark, sf)
      .groupBy("p_brand").count().filter(col("count") > 3)
    assert(over.count() == 0)
  }

  test("q12 passes only positive quantities and prices") {
    val df = operators.Relational.q12(spark, sf)
    assert(df.filter(col("total_amount") <= 0).count() == 0)
  }

  test("q13 has exactly one first_purchase per customer") {
    val df = operators.Relational.q13(spark, sf)
      .filter(col("order_category") === "first_purchase")
      .groupBy("o_custkey").count().filter(col("count") =!= 1)
    assert(df.count() == 0)
  }

  test("broadcast hints survive into q02 physical plan") {
    val plan = operators.Relational.q02(spark, sf)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), "expected broadcast joins for dims")
  }

  test("q15 rollup totals are consistent across grouping levels") {
    val df = operators.Relational.q15(spark, sf)
    val grand = df.filter(col("nation") === "ALL").select("n_orders").head().getLong(0)
    val nationTotals = df.filter(col("nation") =!= "ALL" && col("o_year") === -1)
      .agg(sum("n_orders")).head().getLong(0)
    val detail = df.filter(col("o_year") =!= -1)
      .agg(sum("n_orders")).head().getLong(0)
    assert(grand == nationTotals && grand == detail)
  }

  test("q14 HLL estimate is within 5% of exact distinct counts") {
    val exact = operators.Relational.q11(spark, sf)
      .select(col("event_type"), col("n_users"))
    val approx = operators.Relational.q14(spark, sf)
      .select(col("event_type"), col("approx_users"))
    val bad = exact.join(approx, "event_type")
      .filter(abs(col("approx_users") - col("n_users")) > col("n_users") * 0.05)
    assert(bad.count() == 0, bad.collect().mkString(", "))
  }
}
