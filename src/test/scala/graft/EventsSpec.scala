package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

class EventsSpec extends AnyFunSuite {
  import TestSpark.{spark, sf}

  test("every event query returns rows at sf0.001") {
    operators.Events.qs.foreach { q =>
      assert(q.fn(spark, sf).count() > 0, s"${q.name} returned no rows")
    }
  }

  test("q21 risk_score is capped at 1.0 and segments cover all events") {
    val df = operators.Events.q21(spark, sf)
    assert(df.filter(col("risk_score") > 1.0 || col("risk_score") < 0.0).count() == 0)
    assert(df.filter(col("user_segment").isNull).count() == 0)
  }

  test("q22 LTV is non-decreasing per user (purchases only add)") {
    val w = Window.partitionBy("user_id").orderBy("event_id")
    val bad = operators.Events.q22(spark, sf)
      .withColumn("prev", lag("ltv", 1).over(w))
      .filter(col("prev").isNotNull && col("ltv") < col("prev"))
    assert(bad.count() == 0)
  }

  test("q23 sessions start at seq 1 and durations are non-negative") {
    val df = operators.Events.q23(spark, sf)
    assert(df.groupBy("user_id").agg(min("session_seq").as("m"))
      .filter(col("m") =!= 1).count() == 0)
    assert(df.filter(col("duration_us") < 0).count() == 0)
  }

  test("q24 funnel stages are monotonically shrinking") {
    val m = operators.Events.q24(spark, sf).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(m("1_view") >= m("2_click") && m("2_click") >= m("3_purchase"))
  }

  test("q25 cohort week 0 contains every user exactly once") {
    val ev = Tables(spark, sf, "events")
    val users = ev.select("user_id").distinct().count()
    val w0 = operators.Events.q25(spark, sf)
      .filter(col("week_offset") === 0)
      .agg(sum("n_users")).collect()(0).getLong(0)
    assert(w0 == users)
  }

  test("q26 only emits hours above the 2-sigma line") {
    assert(operators.Events.q26(spark, sf).filter(col("z_score") <= 2.0).count() == 0)
  }
}
