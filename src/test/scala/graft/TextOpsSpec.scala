package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

class TextOpsSpec extends AnyFunSuite {
  import TestSpark.{spark, sf}

  test("every text query returns rows at sf0.001") {
    operators.TextOps.qs.foreach { q =>
      assert(q.fn(spark, sf).count() > 0, s"${q.name} returned no rows")
    }
  }

  test("q60 ratios are in [0,1] and quality in [0,1]") {
    val df = operators.TextOps.q60(spark, sf)
    assert(df.filter(col("stopword_ratio") < 0 || col("stopword_ratio") > 1).count() == 0)
    assert(df.filter(col("quality_score") < 0 || col("quality_score") > 1).count() == 0)
  }

  test("q61 predicts a language for every document") {
    val df = operators.TextOps.q61(spark, sf)
    assert(df.filter(col("predicted_lang").isNull).count() == 0)
    assert(df.count() == Tables(spark, sf, "documents").count())
  }

  test("q62 aggregates tally with document count") {
    val total = operators.TextOps.q62(spark, sf)
      .agg(sum("n_docs")).collect()(0).getLong(0)
    assert(total == Tables(spark, sf, "documents").count())
  }

  test("q63 fingerprints are order-sensitive (distinct docs differ)") {
    val df = operators.TextOps.q63(spark, sf)
    val n = df.count()
    val distinct = df.select("fingerprint").distinct().count()
    assert(distinct > n / 2, "fingerprint collisions too frequent")
  }

  test("q64 scrub masks synthetic emails and phones, counts them, and leaves clean text") {
    import spark.implicits._
    val df = Seq(
      (1L, "contact alice.smith+spam@example-corp.co.uk or bob@x.io today"),
      (2L, "call +14155551234 now"),
      (3L, "mixed a@b.com and +4930123456 twice a@b.com"),
      (4L, "perfectly clean prose with no identifiers"),
      (5L, "")).toDF("doc_id", "text")
    val out = operators.TextOps.scrub(df).collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(out(1L).getInt(1) == 2 && out(1L).getInt(2) == 0)
    assert(out(1L).getString(4) == "contact <EMAIL> or <EMAIL> today")
    assert(out(2L).getInt(2) == 1 && out(2L).getString(4) == "call <PHONE> now")
    assert(out(3L).getInt(1) == 2 && out(3L).getInt(2) == 1)
    assert(out(3L).getString(4) == "mixed <EMAIL> and <PHONE> twice <EMAIL>")
    assert(out(4L).getBoolean(3) && out(4L).getString(4) == "perfectly clean prose with no identifiers")
    assert(out(5L).getBoolean(3) && out(5L).getString(4) == "")
  }
}
