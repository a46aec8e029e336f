package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

class TextOpsSpec extends AnyFunSuite {
  import TestSpark.{spark, sf}

  test("q99 compression ratio equals a per-doc JVM deflate recompute") {
    val texts = Tables(spark, sf, "documents").select("doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val got = operators.TextOps.q99(spark, sf).collect()
    assert(got.length == texts.size)
    got.foreach { r =>
      val raw = texts(r.getLong(0)).getBytes("UTF-8")
      val comp = operators.TextOps.deflateLen(raw)
      assert(r.getLong(1) == raw.length.toLong, s"doc ${r.getLong(0)} byte count")
      assert(r.getLong(2) == comp, s"doc ${r.getLong(0)} compressed length")
      assert(r.getDouble(3) ==
        math.floor((comp * 1.0 / raw.length) * 1e6 + 0.5) / 1e6)
    }
    // natural prose should deflate but not vanish; a constant-ratio
    // corpus would mean the signal is degenerate
    val ratios = got.map(_.getDouble(3))
    assert(ratios.forall(x => x > 0.0 && x < 1.5))
    assert(ratios.distinct.length > 10, "compression ratios are degenerate")
  }

  test("q174 quality curve equals an exact per-bucket recompute from q60 + PII flags") {
    def r4(x: Double) = math.floor(x * 10000.0 + 0.5) / 10000.0
    val q = operators.TextOps.q60(spark, sf)
      .select("doc_id", "n_tokens", "quality_score").collect()
      .map(r => (r.getLong(0), r.getInt(1).toLong, r.getDouble(2)))
    val clean = operators.TextOps.scrub(
        Tables(spark, sf, "documents").select("doc_id", "text"))
      .select("doc_id", "is_clean").collect()
      .map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    val buckets = q.groupBy(_._1 / 1000).toSeq.sortBy(_._1).map { case (b, rs) =>
      val u = rs.map(r => math.floor(r._3 * 10000.0 + 0.5).toLong).sum
      (b, rs.length.toLong, rs.map(_._2).sum, u,
        rs.count(r => !clean(r._1)).toLong)
    }
    val cums = buckets.scanLeft((0L, 0L)) { case ((cd, cu), r) => (cd + r._2, cu + r._4) }
    val expected = buckets.zip(cums.drop(1)).map { case ((b, n, nt, u, np), (cd, cu)) =>
      b -> ((n, nt, r4(u / (10000.0 * n)), np * 1000000L / n, r4(cu / (10000.0 * cd))))
    }.toMap
    val got = operators.TextOps.q174(spark, sf).collect()
    assert(got.length == expected.size)
    got.foreach { r =>
      val (n, nt, mq, ppm, cmq) = expected(r.getLong(0))
      assert(r.getLong(1) == n && r.getLong(2) == nt, s"bucket ${r.getLong(0)} volumes")
      assert(r.getDouble(3) == mq, s"bucket ${r.getLong(0)} mean quality")
      assert(r.getLong(4) == ppm, s"bucket ${r.getLong(0)} pii ppm")
      assert(r.getDouble(5) == cmq, s"bucket ${r.getLong(0)} cumulative mean")
    }
  }

  test("q99 separates repetitive text from prose") {
    import spark.implicits._
    val docs = Seq(
      (1L, "the " * 500),                                   // pure repetition
      (2L, (1 to 400).map(i => s"w${i * 7919 % 9973}").mkString(" ")) // high-entropy
    ).toDF("doc_id", "text")
    val rows = docs.select(col("doc_id"), col("text")).as[(Long, String)]
      .map { case (id, t) =>
        val raw = t.getBytes("UTF-8")
        (id, operators.TextOps.deflateLen(raw) * 1.0 / raw.length)
      }.collect().toMap
    assert(rows(1L) < 0.05, s"repetition ratio ${rows(1L)}")
    assert(rows(2L) > 4 * rows(1L), s"prose ${rows(2L)} vs repetition ${rows(1L)}")
  }

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

  test("q71 matches a brute-force repetition recomputation") {
    val docs = Tables(spark, sf, "documents").select("doc_id", "text").collect()
    def r4(x: Double) = math.floor(x * 10000.0 + 0.5) / 10000.0
    val expected = docs.map { r =>
      val tk = r.getString(1).split(" ").filter(_.nonEmpty).toSeq
      val n = tk.length
      val nd = tk.distinct.length
      val topc = tk.groupBy(identity).values.map(_.size).max
      val bg = if (n >= 2) tk.sliding(2).map(_.mkString(" ")).toSeq else Seq.empty[String]
      val topbg = if (bg.nonEmpty) bg.groupBy(identity).values.map(_.size).max else 0
      val dr = nd * 1.0 / n
      val tt = topc * 1.0 / n
      val tb = topbg * 1.0 / math.max(n - 1, 1)
      r.getLong(0) -> ((n, r4(dr), r4(tt), r4(tb),
        dr >= 0.4 && tt <= 0.2 && tb <= 0.125))
    }.toMap
    val got = operators.TextOps.q71(spark, sf).collect()
    assert(got.length == expected.size)
    // the keep flag splits the corpus — neither all-true nor all-false
    val keeps = got.count(_.getBoolean(5))
    assert(keeps > 0 && keeps < got.length, s"degenerate keep flag: $keeps/${got.length}")
    got.foreach { r =>
      val (n, dr, tt, tb, keep) = expected(r.getLong(0))
      assert(r.getInt(1) == n, s"doc ${r.getLong(0)} n_tokens")
      assert(r.getDouble(2) == dr && r.getDouble(3) == tt && r.getDouble(4) == tb,
        s"doc ${r.getLong(0)} ratios")
      assert(r.getBoolean(5) == keep, s"doc ${r.getLong(0)} keep")
    }
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

  test("q85 normalization handles control chars, whitespace runs, and case on edge inputs") {
    // the natural corpus is already clean (changed is vacuously false
    // there), so the rules are pinned on synthetic edges here
    import spark.implicits._
    val df = Seq(
      "Tab\there\nand\r\nCRLF",
      "  leading   runs\u000Band VT  ",
      "\u0000nul\u007Fdel",
      "already clean",
      "").toDF("text")
    val got = df.select(operators.TextOps.normalizeCol(col("text")).as("n"))
      .collect().map(_.getString(0))
    assert(got(0) == "tab here and crlf")
    assert(got(1) == "leading runs and vt")
    assert(got(2) == "nul del")
    assert(got(3) == "already clean")
    assert(got(4) == "")
  }

  test("q108 live table is fully clean; core flags every synthesized corruption exactly once") {
    val live = operators.TextOps.q108(spark, sf).collect()(0)
    assert(live.getAs[Long]("n_clean") == live.getAs[Long]("n_docs"))
    Seq("n_null_id", "n_dup_id", "n_null_text", "n_empty_text", "n_ws_only",
      "n_chars_mismatch", "n_ctrl_chars", "n_null_lang")
      .foreach(c => assert(live.getAs[Long](c) == 0L, s"live $c nonzero"))

    import org.apache.spark.sql.types._
    val schema = StructType(Seq(
      StructField("doc_id", LongType), StructField("text", StringType),
      StructField("lang", StringType), StructField("n_chars", LongType)))
    def r(id: java.lang.Long, t: String, l: String, n: java.lang.Long) =
      org.apache.spark.sql.Row(id, t, l, n)
    val rows = Seq(
      r(1L, "good doc", "en", 8L),             // clean
      r(2L, "also fine", "fr", 9L),            // clean
      r(null, "no id", "en", 5L),              // null id
      r(3L, "dup id a", "en", 8L),             // dup id pair...
      r(3L, "dup id b", "en", 8L),             // ...both rows clean row-locally
      r(4L, null, "en", 0L),                   // null text
      r(5L, "", "en", 0L),                     // empty text
      r(6L, "   ", "en", 3L),                  // whitespace-only
      r(7L, "short", "en", 99L),               // n_chars mismatch
      r(8L, "has\u0007bell", "en", 8L),    // control byte (8 chars incl. BEL)
      r(9L, "no lang", null, 7L))              // null lang
    val df = spark.createDataFrame(spark.sparkContext.parallelize(rows, 2), schema)
    val v = operators.TextOps.validateDocs(df).collect()(0)
    assert(v.getAs[Long]("n_docs") == 11L)
    assert(v.getAs[Long]("n_null_id") == 1L)
    assert(v.getAs[Long]("n_dup_id") == 1L)  // 10 non-null ids, 9 distinct
    assert(v.getAs[Long]("n_null_text") == 1L)
    assert(v.getAs[Long]("n_empty_text") == 1L)
    assert(v.getAs[Long]("n_ws_only") == 1L)
    assert(v.getAs[Long]("n_chars_mismatch") == 1L)
    assert(v.getAs[Long]("n_ctrl_chars") == 1L)
    assert(v.getAs[Long]("n_null_lang") == 1L)
    assert(v.getAs[Long]("n_clean") == 4L)   // ids 1, 2, and the two dup-id rows
  }

  private def allToks =
    Tables(spark, sf, "documents")
      .select(explode(expr(operators.Dedup.tokensExpr)).as("tok"))

  test("q112 CMS estimates are one-sided and inside the e/W envelope") {
    val df = operators.TextOps.q112(spark, sf).cache()
    assert(df.count() == 30)
    // CMS never undercounts
    assert(df.filter(col("est_n") < col("exact_n")).count() == 0)
    // classic CountMin envelope: overcount ≤ εN with ε = e/W (holds
    // w.p. 1-e^-D per probe; deterministic here given the fixed seed)
    val n = allToks.count()
    val bound = math.ceil(math.E * n / operators.TextOps.CmsW).toLong
    assert(df.filter(col("overcount") > bound).count() == 0,
      s"overcount exceeded εN = $bound")
    df.unpersist()
  }

  test("CMS sketch is bounded, partition-invariant, and mergeable") {
    val docs = Tables(spark, sf, "documents")
    def toks(f: org.apache.spark.sql.DataFrame) =
      f.select(explode(expr(operators.Dedup.tokensExpr)).as("tok"))
    val full = operators.TextOps.cmsSketch(toks(docs)).cache()
    assert(full.count() <= operators.TextOps.CmsD.toLong * operators.TextOps.CmsW)
    // partitioning cannot change a counting aggregate
    val repart = operators.TextOps.cmsSketch(toks(docs).repartition(13))
    assert(repart.exceptAll(full).count() == 0 && full.exceptAll(repart).count() == 0)
    // shard sketches merge by summing cells — the day-over-day
    // mergeability claim, exercised as an even/odd doc split
    val even = operators.TextOps.cmsSketch(toks(docs.filter(col("doc_id") % 2 === 0)))
    val odd = operators.TextOps.cmsSketch(toks(docs.filter(col("doc_id") % 2 === 1)))
    val merged = even.union(odd).groupBy("d", "cell").agg(sum("n").as("n"))
    assert(merged.exceptAll(full).count() == 0 && full.exceptAll(merged).count() == 0)
    full.unpersist()
  }

  test("q135 collocations equal an exact BigInt lift recompute, in rank order") {
    val got = operators.TextOps.q135(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getDouble(3))).toSeq
    val toks = Tables(spark, sf, "documents").select("text").collect()
      .map(_.getString(0).split(" ", -1).filter(_.nonEmpty).toSeq)
    val uni = toks.flatten.groupBy(identity).map { case (w, xs) => w -> BigInt(xs.size) }
    val n = BigInt(toks.map(_.size).sum)
    val m = BigInt(toks.map(t => math.max(t.size - 1, 0)).sum)
    val want = toks.flatMap(t => t.zip(t.drop(1)))
      .groupBy(identity).collect { case ((w1, w2), xs) if xs.size >= operators.TextOps.CollMin =>
        val cxy = BigInt(xs.size)
        val liftU = math.floor(
          (cxy * n * n).toDouble / (m * uni(w1) * uni(w2)).toDouble * 1e6 + 0.5).toLong
        (w1, w2, xs.size.toLong, liftU)
      }.toSeq
      // tie-break by UTF-8 byte order (Tokenizer.utf8Lt), not Java
      // UTF-16 — a lift tie on supplementary-plane tokens would fork
      // the reference otherwise (CLAUDE.md string-ordering lesson)
      .sortWith { case ((a1, a2, _, la), (b1, b2, _, lb)) =>
        if (la != lb) la > lb
        else if (a1 != b1) operators.Tokenizer.utf8Lt(a1, b1)
        else operators.Tokenizer.utf8Lt(a2, b2)
      }
      .take(20)
      .map { case (w1, w2, c, liftU) => (w1, w2, c, liftU / 1000000.0) }
    assert(got == want, s"got ${got.take(3)}... want ${want.take(3)}...")
  }

  test("q152 confusion matrix equals a recount of q61's predictions") {
    val got = operators.TextOps.q152(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1)) -> ((r.getLong(2), r.getLong(3), r.getBoolean(4))))
      .toMap
    val preds = operators.TextOps.q61(spark, sf)
      .select("actual_lang", "predicted_lang").collect()
      .map(r => (r.getString(0), r.getString(1)))
    val byActual = preds.groupBy(_._1).map { case (a, xs) => a -> xs.length.toLong }
    val want = preds.groupBy(identity).map { case ((a, pr), xs) =>
      (a, pr) -> ((xs.length.toLong, xs.length.toLong * 1000000L / byActual(a), a == pr))
    }
    assert(got == want, s"first diff: ${got.find(kv => want.get(kv._1) != Some(kv._2))}")
    // per actual language the shares account for (almost) the whole row
    got.keys.map(_._1).toSeq.distinct.foreach { a =>
      val rowShare = got.collect { case ((`a`, _), v) => v._2 }.sum
      assert(rowShare > 1000000L - 10 && rowShare <= 1000000L, s"$a shares sum $rowShare")
    }
  }

  test("q169 quality ladder equals a local re-banding of q60's scores") {
    val scored = operators.TextOps.q60(spark, sf)
      .select("n_tokens", "quality_score").collect()
      .map(r => (r.getInt(0).toLong, r.getDouble(1)))
    val byBand = scored.groupBy { case (_, q) =>
      math.min(math.floor(q * 10.0).toInt, 9)
    }.map { case (b, xs) => b -> ((xs.length.toLong, xs.map(_._1).sum)) }
    val total = scored.length.toLong
    val bandsDesc = byBand.keys.toSeq.sorted.reverse
    val want = bandsDesc.map { b =>
      val ge = bandsDesc.filter(_ >= b)
      val cd = ge.map(byBand(_)._1).sum
      val ct = ge.map(byBand(_)._2).sum
      (b, b / 10.0, byBand(b)._1, byBand(b)._2, cd, ct, cd * 1000000L / total)
    }.toSet
    val got = operators.TextOps.q169(spark, sf).collect()
      .map(r => (r.getInt(0), r.getDouble(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6))).toSet
    assert(got == want,
      s"ladder mismatch: extra=${(got -- want).take(3)} missing=${(want -- got).take(3)}")
    // the bottom band's cumulative row covers the whole corpus
    val bottom = got.minBy(_._1)
    assert(bottom._5 == total && bottom._7 == 1000000L)
    assert(got.size >= 2, "all docs in one band — gate sweep is vacuous")
  }
}
