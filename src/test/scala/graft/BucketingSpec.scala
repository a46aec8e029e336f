package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** SURVEY §4: bucketing both facts on the join key removes the
  * shuffle from fact-fact joins — the plan must contain no
  * hash-partitioning Exchange over the bucketed sides.
  */
class BucketingSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = TestSpark.sf

  test("bucketed kNN cell index joins probes without shuffling the index") {
    // substantiates q54's deployment claim: the IVF cell index,
    // written bucketed by cell id, joins the probe stream with no
    // exchange on the index side — only the (smaller) probe side
    // shuffles to the index's bucketing
    val e = Tables(spark, sf, "embeddings")
      .select(col("vec_id"), (pmod(col("vec_id"), lit(16))).cast("int").as("cid"),
        col("embedding"))
    spark.sql("DROP TABLE IF EXISTS cell_index")
    e.write.bucketBy(8, "cid").sortBy("cid").saveAsTable("cell_index")
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold", "10MB")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val probes = e.select(col("vec_id").as("query_id"), col("cid"))
      val j = probes.join(spark.table("cell_index"), "cid")
      val plan = j.queryExecution.executedPlan.toString
      // exactly one hash exchange (the probe side); the bucketed
      // index side must read shuffle-free
      val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).size
      assert(exchanges <= 1, s"cell-index join shuffles both sides:\n$plan")
      assert(j.count() > 0)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
      spark.sql("DROP TABLE IF EXISTS cell_index")
    }
  }

  test("bucketed lineitem-orders join plans without a shuffle") {
    val li = Tables(spark, sf, "lineitem").select("l_orderkey", "l_quantity")
    val o = Tables(spark, sf, "orders").select("o_orderkey", "o_totalprice")
    spark.sql("DROP TABLE IF EXISTS li_bucketed")
    spark.sql("DROP TABLE IF EXISTS ord_bucketed")
    li.write.bucketBy(8, "l_orderkey").sortBy("l_orderkey").saveAsTable("li_bucketed")
    o.write.bucketBy(8, "o_orderkey").sortBy("o_orderkey").saveAsTable("ord_bucketed")
    // force the shuffle-join path so the bucketing (not a broadcast)
    // is what eliminates the exchanges
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold", "10MB")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val j = spark.table("li_bucketed").join(spark.table("ord_bucketed"),
        col("l_orderkey") === col("o_orderkey"))
      val plan = j.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange hashpartitioning"),
        s"bucketed join still shuffles:\n$plan")
      val expected = li.join(o, col("l_orderkey") === col("o_orderkey")).count()
      assert(j.count() == expected)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
      spark.sql("DROP TABLE IF EXISTS li_bucketed")
      spark.sql("DROP TABLE IF EXISTS ord_bucketed")
    }
  }
}
