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

  test("q92 encoding stats equal an exact single-threaded recompute") {
    import org.apache.spark.sql.Row
    val merges = operators.Tokenizer.localBpe(histogram(), operators.Tokenizer.BpeMerges)
      .map(m => (m._2, m._3))
    val lw = Tables(spark, sf, "documents")
      .select(col("lang"), explode(expr(operators.Dedup.tokensExpr)).as("w"))
      .collect().map(r => (r.getString(0), r.getString(1)))
    val want = lw.groupBy(_._1).map { case (lang, ws) =>
      val occ = ws.groupBy(_._2).map { case (w, g) => w -> g.length.toLong }
      val dw = occ.size.toLong
      val tw = occ.values.sum
      val tc = occ.map { case (w, c) => c * w.length }.sum
      val tb = occ.map { case (w, c) => c * operators.Tokenizer.encodeLen(w, merges) }.sum
      def r6(x: Double) = math.floor(x * 1e6 + 0.5) / 1e6
      lang -> (dw, tw, tc, tb, r6(tc * 1.0 / tb), r6(tb * 1.0 / tw))
    }
    val got = operators.Tokenizer.q92(spark, sf).collect()
    assert(got.map(_.getString(0)).toSeq == want.keys.toSeq.sorted)
    got.foreach { case Row(lang: String, dw: Long, tw: Long, tc: Long, tb: Long,
        cpt: Double, fert: Double) =>
      assert((dw, tw, tc, tb, cpt, fert) == want(lang), s"lang $lang diverges")
    }
    // BPE must actually compress: fewer tokens than chars, more than words
    got.foreach { r =>
      assert(r.getLong(4) < r.getLong(3), "BPE tokens should undercut chars")
      assert(r.getLong(4) >= r.getLong(2), "BPE tokens can never undercut words")
    }
  }

  test("q96 LM scores equal an exact single-threaded recompute") {
    val rows = Tables(spark, sf, "documents")
      .withColumn("bucket", expr(operators.Sampling.BucketExpr))
      .withColumn("tkc", expr(operators.Dedup.tokensExpr))
      .select("doc_id", "bucket", "tkc")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getSeq[String](2)))
    val train = rows.filter(_._2 < 800).map(_._3)
    val evalD = rows.filter(_._2 >= 800).map(t => (t._1, t._3))
    val cb = collection.mutable.HashMap.empty[(String, String), Long]
    val cu = collection.mutable.HashMap.empty[String, Long]
    train.foreach { tk =>
      tk.foreach(w => cu(w) = cu.getOrElse(w, 0L) + 1)
      tk.iterator.zip(tk.iterator.drop(1)).foreach { p =>
        cb(p) = cb.getOrElse(p, 0L) + 1
      }
    }
    val v = cu.size.toLong
    def r6(x: Double) = math.floor(x * 1e6 + 0.5) / 1e6
    val want: Map[Long, (Long, Long, Double)] =
      evalD.filter(_._2.length >= 2).map { case (id, tk) =>
        val bs = tk.iterator.zip(tk.iterator.drop(1)).toSeq
        val nlls = bs.map { case (w1, w2) =>
          -math.log((cb.getOrElse((w1, w2), 0L) + 1.0) / (cu.getOrElse(w1, 0L) + v))
        }
        id -> ((bs.length.toLong, bs.count(p => cb.contains(p)).toLong,
          r6(nlls.sum / bs.length)))
      }.toMap
    val got = operators.Tokenizer.q96(spark, sf).collect()
    assert(got.length == want.size, s"${got.length} scored docs vs ${want.size}")
    got.foreach { r =>
      val (nb, ns, nll) = want(r.getLong(0))
      assert(r.getLong(1) == nb && r.getLong(2) == ns, s"doc ${r.getLong(0)} counts")
      assert(math.abs(r.getDouble(3) - nll) <= 1.01e-6,
        s"doc ${r.getLong(0)} avg_nll ${r.getDouble(3)} vs $nll")
    }
    // CCNet terciles: recompute head/middle/tail from the reference
    // scores with the identical (avg_nll, doc_id) total order and the
    // identical balanced-ntile cut (first n%3 buckets get the extra)
    val orderedIds = want.toSeq.sortBy { case (id, (_, _, nll)) => (nll, id) }.map(_._1)
    val n = orderedIds.length
    val base = n / 3; val extra = n % 3
    val wantBucket = orderedIds.zipWithIndex.map { case (id, i) =>
      val t = if (i < extra * (base + 1)) i / (base + 1)
      else extra + (i - extra * (base + 1)) / base
      id -> Seq("head", "middle", "tail")(t)
    }.toMap
    got.foreach { r =>
      assert(r.getString(4) == wantBucket(r.getLong(0)),
        s"doc ${r.getLong(0)} tercile ${r.getString(4)} vs ${wantBucket(r.getLong(0))}")
    }
    // all three buckets must be populated (the whole point of the op)
    assert(got.map(_.getString(4)).distinct.sorted.toSeq == Seq("head", "middle", "tail").sorted)
  }

  test("mergePass invariants hold over random symbol streams") {
    import org.scalacheck.{Gen, Prop, Test => SCTest}
    val sym = Gen.oneOf("a", "b", "c", "ab", "ba")
    val seqs = Gen.listOf(sym)
    val prop = Prop.forAll(seqs, sym, sym) { (xs: List[String], l: String, r: String) =>
      val out = operators.Tokenizer.mergePass(xs, l, r)
      // concatenation preserved; greedy left-to-right removal leaves
      // no (l, r) adjacency (a merged token lr can never equal l — r
      // is nonempty — nor r, so no new adjacency forms); idempotent
      out.mkString == xs.mkString &&
        !out.iterator.zip(out.iterator.drop(1))
          .exists { case (x, y) => x == l && y == r } &&
        operators.Tokenizer.mergePass(out, l, r) == out
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(300), prop)
    assert(res.passed, res.status.toString)
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
