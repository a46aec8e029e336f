package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

class TokenizerSpec extends AnyFunSuite {
  import TestSpark.{spark, sf}

  private def histogram(): Seq[(String, Long)] =
    Tables(spark, sf, "documents")
      .select(explode(expr(operators.Dedup.tokensExpr)).as("w"))
      .groupBy("w").agg(count(lit(1)).as("wc"))
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq

  test("q89 merge table equals the exact single-threaded BPE trainer") {
    val got = operators.Tokenizer.q89(spark, sf).collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getString(3), r.getLong(4)))
      .toSeq
    val want = operators.Tokenizer.localBpe(histogram(), operators.Tokenizer.BpeMerges)
    assert(got == want,
      s"distributed merges diverge from the local reference:\n got=$got\nwant=$want")
  }

  test("q89 trains the full requested merge count with sane structure") {
    val rows = operators.Tokenizer.q89(spark, sf).collect()
    assert(rows.length == operators.Tokenizer.BpeMerges,
      s"early stop at ${rows.length} merges — corpus should support all")
    // ranks are 1..M in order; merged = left+right; counts are
    // positive and the pair frequency never dips below the floor
    rows.zipWithIndex.foreach { case (r, i) =>
      assert(r.getInt(0) == i + 1)
      assert(r.getString(3) == r.getString(1) + r.getString(2))
      assert(r.getLong(4) >= operators.Tokenizer.BpeMinPair)
    }
    // later merges can reference earlier merged symbols (that is the
    // point of BPE) — assert at least one multi-char constituent
    // appears once enough rounds have run
    val multi = rows.exists(r => r.getString(1).length > 1 || r.getString(2).length > 1)
    assert(multi, "no merge built on a previous merge in 16 rounds")
  }

  test("mergePass applies left-to-right non-overlapping semantics") {
    import operators.Tokenizer.mergePass
    assert(mergePass(Seq("a", "a", "a"), "a", "a") == Seq("aa", "a"))
    assert(mergePass(Seq("a", "a", "a", "a"), "a", "a") == Seq("aa", "aa"))
    assert(mergePass(Seq("b", "a", "a"), "a", "a") == Seq("b", "aa"))
    assert(mergePass(Seq("a"), "a", "a") == Seq("a"))
    assert(mergePass(Seq(), "a", "a") == Seq())
    assert(mergePass(Seq("x", "y"), "a", "a") == Seq("x", "y"))
  }
}
