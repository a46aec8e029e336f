package graft

import graft.operators.ops
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class OpsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = TestSpark.sf

  test("saltedJoin returns exactly the rows of the plain join") {
    val li = Tables(spark, sf, "lineitem")
      .select(col("l_partkey").as("k"), col("l_orderkey"), col("l_linenumber"))
    val part = Tables(spark, sf, "part")
      .select(col("p_partkey").as("k"), col("p_name"))
    val plain = li.join(part, "k")
    val salted = ops.saltedJoin(li, part, "k", 8)
    assert(salted.count() == plain.count())
    assert(salted.exceptAll(plain).count() == 0)
    assert(plain.exceptAll(salted).count() == 0)
  }

  test("globalNtile matches the single-partition window ntile exactly") {
    val spend = Tables(spark, sf, "orders")
      .groupBy("o_custkey").agg(sum("o_totalprice").as("spend"))
    val expected = spend.withColumn("b",
      ntile(7).over(org.apache.spark.sql.expressions.Window
        .orderBy(col("spend").desc, col("o_custkey"))))
    val actual = ops.globalNtile(spend, 7, "b", col("spend").desc, col("o_custkey"))
    assert(actual.count() == expected.count())
    assert(actual.exceptAll(expected).count() == 0)
  }

  test("groupedGlobalRank matches the per-group window row_number exactly") {
    val spend = Tables(spark, sf, "orders")
      .select(col("o_orderpriority").as("g"), col("o_custkey"), col("o_totalprice"),
        col("o_orderkey"))
    val expected = spend.withColumn("r",
      row_number().over(org.apache.spark.sql.expressions.Window
        .partitionBy("g").orderBy(col("o_totalprice"), col("o_custkey"), col("o_orderkey"))))
    val actual = ops.groupedGlobalRank(spend, "g", "r",
      col("o_totalprice"), col("o_custkey"), col("o_orderkey"))
    assert(actual.count() == expected.count())
    assert(actual.exceptAll(expected.withColumn("r", col("r").cast("long"))).count() == 0)
  }
}
