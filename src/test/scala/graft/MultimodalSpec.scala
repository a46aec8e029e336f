package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

class MultimodalSpec extends AnyFunSuite {
  import TestSpark.{spark, sf}

  test("q70 decodes every payload with plausible stub features") {
    val df = operators.Multimodal.q70(spark, sf)
    assert(df.count() == Tables(spark, sf, "documents").count())
    assert(df.filter(col("n_bytes") <= 0).count() == 0)
    assert(df.filter(!col("format").isin("jpeg", "png", "wav")).count() == 0)
    assert(df.filter(col("width") < 64 || col("width") >= 576).count() == 0)
  }

  test("q70 byte_sum matches an independent expression-based computation") {
    import spark.implicits._
    val viaExpr = Tables(spark, sf, "documents")
      .select(col("doc_id"), expr(
        "aggregate(transform(sequence(1, length(text)), i -> CAST(ascii(substring(text, i, 1)) AS BIGINT)), 0L, (a,x) -> a+x)").as("byte_sum2"))
    val joined = operators.Multimodal.q70(spark, sf).join(viaExpr, "doc_id")
    assert(joined.filter(col("byte_sum") =!= col("byte_sum2")).count() == 0)
  }
}
