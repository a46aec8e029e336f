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

  test("groupedGlobalNtile matches the per-group window ntile exactly (r14)") {
    // uneven group sizes + a k that does not divide any of them —
    // exercises the remainder arms of the shared ntile CASE
    val spend = Tables(spark, sf, "orders")
      .select(col("o_orderpriority").as("g"), col("o_custkey"),
        col("o_totalprice"), col("o_orderkey"))
    val expected = spend.withColumn("b",
      ntile(7).over(org.apache.spark.sql.expressions.Window
        .partitionBy("g")
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))))
    val actual = ops.groupedGlobalNtile(spend, "g", 7, "b",
      col("o_totalprice").desc, col("o_orderkey"))
    assert(actual.count() == expected.count())
    assert(actual.exceptAll(expected).count() == 0)
    assert(expected.exceptAll(actual).count() == 0)
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

  test("groupedGlobalCumsum matches the per-group window cumulative sum and total exactly") {
    // a grouped histogram (unique sort key per group by construction
    // — the primitive's documented contract)
    val hist = Tables(spark, sf, "orders")
      .groupBy(col("o_orderpriority").as("g"),
        ops.cents(col("o_totalprice")).as("k"))
      .agg(count(lit(1)).as("v"))
    val w = org.apache.spark.sql.expressions.Window.partitionBy("g")
    val expected = hist
      .withColumn("cum", sum("v").over(w.orderBy("k")))
      .withColumn("tot", sum("v").over(w))
    // project both sides to one column order: exceptAll compares
    // positionally and the primitive appends tot before cum
    val cols = Seq("g", "k", "v", "cum", "tot").map(col)
    val actual = ops.groupedGlobalCumsum(hist, "g", col("v"), "cum", "tot", col("k"))
      .select(cols: _*)
    val exp = expected.select(cols: _*)
    assert(actual.count() == exp.count())
    assert(actual.exceptAll(exp).count() == 0 && exp.exceptAll(actual).count() == 0)
  }
}
