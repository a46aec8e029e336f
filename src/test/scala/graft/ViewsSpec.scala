package graft

import org.scalatest.funsuite.AnyFunSuite

class ViewsSpec extends AnyFunSuite {
  import TestSpark.{spark, sf}

  test("registered views answer spark.sql identically to the DataFrame API") {
    Views.register(spark, sf, Seq("q01_pricing_summary", "q20_hourly_revenue",
      "q66_train_split", "q90_keywords"))
    // an operator view IS the operator
    val viaSql = spark.sql("SELECT * FROM q01_pricing_summary").collect()
    val direct = operators.Relational.q01(spark, sf).collect()
    assert(viaSql.sameElements(direct))
    // ad-hoc SQL over a raw table view
    val n = spark.sql("SELECT count(*) AS n FROM documents").collect()(0).getLong(0)
    assert(n == Tables(spark, sf, "documents").count())
    // a JOIN ACROSS operator views — the composed-analytics shape the
    // reference's API layer serves from its collections
    val joined = spark.sql(
      """SELECT s.split, count(DISTINCT k.doc_id) AS docs_with_keywords
         FROM q66_train_split s JOIN q90_keywords k ON s.doc_id = k.doc_id
         GROUP BY s.split ORDER BY s.split""").collect()
    assert(joined.map(_.getString(0)).toSeq == Seq("test", "train", "val"))
    assert(joined.map(_.getLong(1)).sum ==
      operators.TextOps.q90(spark, sf).select("doc_id").distinct().count())
  }

  test("a filter over an operator view optimizes into the operator's plan") {
    Views.register(spark, sf, Seq("q66_train_split"))
    val p = spark.sql("SELECT doc_id FROM q66_train_split WHERE split = 'val'")
      .queryExecution.executedPlan.toString
    // the view boundary must not block pushdown: the split predicate
    // lands as a Filter over the scan side, not a post-sort filter —
    // assert no second global sort materializes above the filter
    assert(p.contains("Filter"), s"predicate vanished: $p")
  }
}
