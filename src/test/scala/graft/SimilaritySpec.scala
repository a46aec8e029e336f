package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

class SimilaritySpec extends AnyFunSuite {
  import TestSpark.{spark, sf}

  test("q50 returns exactly 5 ranked neighbors per query, no self-match") {
    val df = operators.Similarity.q50(spark, sf)
    val counts = df.groupBy("query_id").count()
    assert(counts.filter(col("count") =!= 5).count() == 0)
    assert(df.filter(col("query_id") === col("neighbor_id")).count() == 0)
    assert(df.filter(col("rank") < 1 || col("rank") > 5).count() == 0)
  }

  test("q50 cosine is non-increasing with rank per query") {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("query_id").orderBy("rank")
    val bad = operators.Similarity.q50(spark, sf)
      .withColumn("prev", lag("cosine", 1).over(w))
      .filter(col("prev").isNotNull && col("cosine") > col("prev"))
    assert(bad.count() == 0)
  }

  test("q51 binary-signature ANN: recall@5 >= 0.9, candidates << n/4") {
    val exact = operators.Similarity.q50(spark, sf).select("query_id", "neighbor_id")
    val approx = operators.Similarity.q51(spark, sf)
    val n = exact.count()
    val hit = exact.join(approx.select("query_id", "neighbor_id"),
      Seq("query_id", "neighbor_id"), "left_semi").count()
    val recall = hit * 1.0 / n
    info(s"q51 recall@5 = $hit/$n = $recall")
    // 512-bit signatures + exact rerank of the top-48 hamming
    // candidates; planes are a fixed seed, so this is deterministic.
    assert(recall >= 0.9, s"recall@5 = $hit/$n below 0.9")
    // the scale claim: candidate volume per query is CandK, a small
    // fixed fraction of the corpus (and a SHRINKING one as n grows)
    val corpus = Tables(spark, sf, "embeddings").count()
    val frac = operators.Similarity.CandK * 1.0 / corpus
    info(s"q51 candidate fraction = ${operators.Similarity.CandK}/$corpus = $frac")
    assert(frac <= 0.125, s"candidate fraction $frac not << n/4")
    assert(approx.groupBy("query_id").count().filter(col("count") =!= 5).count() == 0)
    assert(approx.filter(col("query_id") === col("neighbor_id")).count() == 0)
  }

  test("q53 PQ ANN: recall@5 vs brute force with 8-byte codes") {
    val exact = operators.Similarity.q50(spark, sf).select("query_id", "neighbor_id")
    val approx = operators.Similarity.q53(spark, sf)
    val n = exact.count()
    val hit = exact.join(approx.select("query_id", "neighbor_id"),
      Seq("query_id", "neighbor_id"), "left_semi").count()
    info(s"q53 PQ recall@5 = $hit/$n = ${hit * 1.0 / n}")
    // 16 subspaces × 16 centroids (8 B codes, 32× compression) + exact
    // rerank of the top-48 ADC candidates; codebooks from a fixed
    // deterministic sample, so this is reproducible.
    assert(hit * 1.0 / n >= 0.8, s"recall@5 = $hit/$n below 0.8")
    assert(approx.groupBy("query_id").count().filter(col("count") =!= 5).count() == 0)
    assert(approx.filter(col("query_id") === col("neighbor_id")).count() == 0)
  }

  /** Exact all-pairs top-5 graph, driver-side (test corpus only). */
  private lazy val exactGraph: (Int, Map[Long, Set[Long]]) = {
    import org.apache.spark.sql.Row
    val vecs = Tables(spark, sf, "embeddings")
      .select("vec_id", "embedding").collect()
      .map { case Row(id: Long, e: scala.collection.Seq[_]) =>
        (id, e.asInstanceOf[scala.collection.Seq[Float]].toArray)
      }.sortBy(_._1)
    def cos(a: Array[Float], b: Array[Float]): Double = {
      var dp = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.length) { dp += a(i).toDouble * b(i); na += a(i).toDouble * a(i); nb += b(i).toDouble * b(i); i += 1 }
      dp / (math.sqrt(na) * math.sqrt(nb))
    }
    (vecs.length, vecs.map { case (id, v) =>
      id -> vecs.filter(_._1 != id)
        .map { case (oid, ov) => (-cos(v, ov), oid) }.sorted.take(5).map(_._2).toSet
    }.toMap)
  }

  private def graphRecall(df: org.apache.spark.sql.DataFrame, label: String): Double = {
    val (nVecs, exact) = exactGraph
    val got = df.collect().map(r => (r.getLong(0), r.getLong(1)))
    val byQ = got.groupBy(_._1)
    assert(byQ.size == nVecs, s"$label covers ${byQ.size} of $nVecs vectors")
    assert(byQ.values.forall(_.length == 5))
    assert(got.count { case (q, n) => q == n } == 0)
    val hits = got.count { case (q, n) => exact(q).contains(n) }
    val recall = hits * 1.0 / (nVecs * 5)
    info(s"$label recall@5 = $hits/${nVecs * 5} = $recall")
    recall
  }

  /** Cached: two tests consume the default-mode recall and the q54
    * pipeline (IVF fit + probe join) is the expensive part. */
  private lazy val defaultGraphRecall: Double =
    graphRecall(operators.Similarity.q54(spark, sf), "q54 default graph")

  test("q54 kNN graph: recall vs an exact all-pairs graph, no corpus collect") {
    assert(defaultGraphRecall >= 0.75, s"graph recall $defaultGraphRecall below 0.75")
  }

  test("q54 fixed-cell-size mode matches the sqrt(n) mode's recall") {
    // k = ceil(n/B) instead of ceil(sqrt(n)): the extreme-scale knob
    // (linear total work) must not cost recall at the same nprobe.
    // B=32 lands on the k=16 floor at n=500 — a genuinely different
    // quantizer than the default's k=23.
    val fixed = graphRecall(
      operators.Similarity.knnGraphOf(spark, Tables(spark, sf, "embeddings"),
        cellSize = Some(32)), "q54 fixed-B graph")
    assert(fixed >= 0.75, s"fixed-B recall $fixed below 0.75")
    assert(fixed >= defaultGraphRecall - 0.05,
      s"fixed-B recall $fixed more than 0.05 below default-mode $defaultGraphRecall")
  }

  test("sample-capped Lloyd fit: recall parity, full coverage, deterministic re-fit") {
    import operators.Similarity.{ivfCellsOf, knnGraphOf}
    val e = Tables(spark, sf, "embeddings")
    // force the cap at sf0.001 (n=500): floor 64, 4 samples/cell →
    // mTarget = max(64, 23·4) = 92 ≪ 500 — the fit sees ~18% of the
    // corpus. At the shipped defaults (floor 2^17) nothing ≤ x30
    // samples at all, so this forced path is the only way the branch
    // executes in tests.
    val (cellsS, centsS) = ivfCellsOf(spark, e, None, fitFloor = 64L, fitPerCell = 4L)
    val n = e.count()
    // full coverage: the ASSIGNMENT pass is never sampled
    val asg = cellsS.select("vec_id", "cid").collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(asg.size == n, "sampled fit dropped vectors from the assignment")
    assert(centsS.nonEmpty && centsS.length <= 23, "sampled fit grew the centroid count")
    // determinism: the hash thin is a pure function of vec_id — an
    // independent re-fit must be bit-identical (the treeReduce merge
    // contract holds on the sample too)
    val (cells2, cents2) = ivfCellsOf(spark, e, None, fitFloor = 64L, fitPerCell = 4L)
    assert(centsS.zip(cents2).forall { case (a, b) => a.sameElements(b) },
      "sampled re-fit centroids differ")
    assert(cells2.select("vec_id", "cid").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap == asg,
      "sampled re-fit assignments differ")
    // recall parity: centroids estimated from 18% of the corpus must
    // not cost the kNN graph its recall (same envelope as fixed-B)
    val sampled = graphRecall(
      knnGraphOf(spark, e, None, fitFloor = 64L, fitPerCell = 4L),
      "q54 sample-capped fit graph")
    assert(sampled >= 0.75, s"sample-capped recall $sampled below 0.75")
    assert(sampled >= defaultGraphRecall - 0.05,
      s"sample-capped recall $sampled more than 0.05 below default-mode $defaultGraphRecall")
  }

  test("IVF default mode dispatches to fixed-B above the documented threshold") {
    import operators.Similarity.{kTargetFor, IvfFixedBThreshold, IvfDefaultCellB}
    // below the threshold: k = ceil(sqrt(n)) — the shipped corpora's
    // oracle/spec-stable operating point
    assert(kTargetFor(500L, None) == 23)
    assert(kTargetFor(IvfFixedBThreshold, None) ==
      math.ceil(math.sqrt(IvfFixedBThreshold.toDouble)).toInt)
    // above it: k = ceil(n/B) — probe volume pinned at nprobe*B
    assert(kTargetFor(IvfFixedBThreshold + 1, None) ==
      math.ceil((IvfFixedBThreshold + 1).toDouble / IvfDefaultCellB).toInt)
    assert(kTargetFor(1L << 30, None) == (1L << 30).toInt / IvfDefaultCellB)
    // explicit cellSize always wins, either side of the threshold
    assert(kTargetFor(500L, Some(32)) == 16)
    assert(kTargetFor(1L << 30, Some(1 << 20)) == 1024)
    // the driver-array clamp: k never exceeds the documented bound
    // (the centroid matrix is the one piece that must stay resident)
    import operators.Similarity.IvfMaxDriverK
    assert(kTargetFor(Long.MaxValue, None) == IvfMaxDriverK)
    assert(kTargetFor(1L << 40, Some(4)) == IvfMaxDriverK)
  }

  test("Lloyd fit tree-merges partials exactly: forced-fixed-B re-fit is bit-identical") {
    import operators.Similarity.ivfCellsOf
    // B=8 → k ≈ n/8 cells at sf0.001 — far more partial cells than
    // the default √n fit uses, the k ≫ √n regime the tree merge
    // exists for (fixed-B at 10⁹+ vectors). Two independent fits
    // must be BIT-identical: treeReduce's merge order is
    // nondeterministic, and only the exact (BigDecimal) partial
    // arithmetic keeps a centroid from moving run to run.
    val e = Tables(spark, sf, "embeddings")
    val (cells1, cents1) = ivfCellsOf(spark, e, Some(8))
    val (cells2, cents2) = ivfCellsOf(spark, e, Some(8))
    assert(cents1.length == cents2.length, "re-fit changed the cell count")
    assert(cents1.length >= 32, s"k=${cents1.length} too small to exercise the merge")
    assert(cents1.zip(cents2).forall { case (a, b) => a.sameElements(b) },
      "re-fit centroids differ: the tree merge is order-dependent")
    val a1 = cells1.select("vec_id", "cid").collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    val a2 = cells2.select("vec_id", "cid").collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(a1 == a2, "re-fit cell assignments differ")
    assert(a1.size == e.count(), "fit dropped or duplicated vectors")
  }

  test("q91 pagerank equals an exact driver-side power iteration") {
    import operators.Similarity.{PrDamp, PrIters}
    val edges = operators.Similarity.q54(spark, sf)
      .select(col("query_id").as("src"), col("neighbor_id").as("dst"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    // exact reference: same fixed-iteration scheme, no dangling
    // correction (q91 asserts the graph has none)
    val verts = (edges.map(_._1) ++ edges.map(_._2)).distinct.sorted
    val n = verts.length
    val outdeg = edges.groupBy(_._1).map { case (s0, es) => s0 -> es.length.toLong }
    val inEdges = edges.groupBy(_._2)
    var pr = verts.map(v => v -> 1.0 / n).toMap
    for (_ <- 1 to PrIters) {
      pr = verts.map { v =>
        val c = inEdges.getOrElse(v, Array.empty[(Long, Long)])
          .map { case (u, _) => pr(u) / outdeg(u) }.sum
        v -> ((1.0 - PrDamp) / n + PrDamp * c)
      }.toMap
    }
    val got = operators.Similarity.q91(spark, sf).collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getLong(2))).toSeq
    assert(got.map(_._1) == verts.toSeq, "vertex set or order differs")
    // q91 emits r6-rounded centrality; distributed double summation
    // is additionally order-dependent. Tolerance = one r6 quantum
    // (drift can flip the floor at a boundary) — far tighter than any
    // structural error.
    def r6(x: Double): Double = math.floor(x * 1e6 + 0.5) / 1e6
    got.foreach { case (v, c, ind) =>
      val want = r6(pr(v) * n)
      assert(math.abs(c - want) <= 1.01e-6,
        s"vertex $v centrality $c vs exact $want")
      assert(ind == inEdges.get(v).map(_.length.toLong).getOrElse(0L))
    }
    // the clear-margin head must agree in ORDER, not just value
    val wantHead = verts.sortBy(v => (-r6(pr(v) * n), v)).take(10).toSeq
    val gotHead = got.sortBy { case (v, c, _) => (-c, v) }.take(10).map(_._1)
    assert(gotHead == wantHead, "top-10 centrality order diverges")
  }

  test("q91 mass conserves and centrality averages to one") {
    val got = operators.Similarity.q91(spark, sf).collect()
    val n = got.length
    val total = got.map(_.getDouble(1)).sum
    // Σ pr = 1 exactly in exact arithmetic when no vertex dangles;
    // normalized centrality therefore averages to 1 (r6 rounding and
    // float drift bound the residual)
    assert(math.abs(total / n - 1.0) < 1e-4, s"mean centrality ${total / n}")
    assert(got.forall(_.getDouble(1) > 0.0), "PageRank is strictly positive")
  }

  test("q94 triplet mining equals an exact recompute from the same graph + labels") {
    val labels = Tables(spark, sf, "embeddings").select("vec_id", "label")
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    val g = operators.Similarity.q54(spark, sf)
      .select("query_id", "neighbor_id", "cosine")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    def bestOf(es: Seq[(Long, Double)]): Option[(Long, Double)] =
      es.sortBy { case (id, c) => (-c, id) }.headOption
    val want = g.groupBy(_._1).map { case (q, es) =>
      val ql = labels(q)
      val pos = bestOf(es.toSeq.collect { case (_, n, c) if labels(n) == ql => (n, c) })
      val neg = bestOf(es.toSeq.collect { case (_, n, c) if labels(n) != ql => (n, c) })
      q -> (ql, pos, neg)
    }
    val got = operators.Similarity.q94(spark, sf).collect()
    assert(got.length == want.size)
    got.foreach { r =>
      val q = r.getLong(0)
      val (ql, pos, neg) = want(q)
      assert(r.getInt(1) == ql)
      def side(idIdx: Int, cosIdx: Int, w: Option[(Long, Double)]): Unit = w match {
        case Some((id, c)) =>
          assert(!r.isNullAt(idIdx) && r.getLong(idIdx) == id && r.getDouble(cosIdx) == c,
            s"query $q side at $idIdx: got ${r.get(idIdx)}/${r.get(cosIdx)} want $id/$c")
        case None => assert(r.isNullAt(idIdx), s"query $q expected null side at $idIdx")
      }
      side(2, 3, pos)
      side(4, 5, neg)
      (pos, neg) match {
        case (Some((_, pc)), Some((_, nc))) =>
          val m = math.floor((pc - nc) * 1e6 + 0.5) / 1e6
          assert(r.getDouble(6) == m && r.getBoolean(7) == (pc < nc))
        case _ => // a missing side must leave margin/violating null
          assert(r.isNullAt(6) && r.isNullAt(7), s"query $q: margin on a one-sided triplet")
      }
    }
    // the corpus must actually yield some violating triplets and some
    // clean ones, else the operator tests nothing
    val v = got.count(r => !r.isNullAt(7) && r.getBoolean(7))
    assert(v > 0 && v < got.length, s"degenerate margin distribution: $v/${got.length}")
  }

  test("q98 diversity sample equals an exact per-cell selection from the same cells") {
    val (cells, _) = operators.Similarity.ivfCellsOf(
      spark, Tables(spark, sf, "embeddings"), None)
    val assign = cells.select("cid", "vec_id").collect()
      .map(r => (r.getInt(0), r.getLong(1)))
    def h(id: Long): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
      val hex = md.digest(id.toString.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
      java.lang.Long.parseLong(hex.take(8), 16)
    }
    val want = assign.groupBy(_._1).toSeq.flatMap { case (cid, vs) =>
      vs.map(_._2).toSeq.sortBy(v => (h(v), v)).take(operators.Similarity.DivK)
        .zipWithIndex.map { case (v, i) => (cid, i + 1, v, h(v)) }
    }.toSet
    val got = operators.Similarity.q98(spark, sf).collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getLong(2), r.getLong(3))).toSet
    assert(got == want, s"selection diverges: ${got.diff(want).take(5)} vs ${want.diff(got).take(5)}")
    // every cell is represented (the point of diversity sampling)
    assert(got.map(_._1) == assign.map(_._1).toSet)
  }

  test("q52 IVF ANN achieves high recall@5 against brute force") {
    val exact = operators.Similarity.q50(spark, sf).select("query_id", "neighbor_id")
    val approx = operators.Similarity.q52(spark, sf)
    val n = exact.count()
    val hit = exact.join(approx.select("query_id", "neighbor_id"),
      Seq("query_id", "neighbor_id"), "left_semi").count()
    info(s"IVF recall@5 = $hit/$n")
    // nprobe=4 of k=ceil(sqrt(n)) cells; deterministic init/rounding
    assert(hit * 1.0 / n >= 0.7, s"recall@5 = $hit/$n below 0.7")
    assert(approx.groupBy("query_id").count().filter(col("count") > 5).count() == 0)
    assert(approx.filter(col("query_id") === col("neighbor_id")).count() == 0)
  }

  test("q107 live table is fully valid; core flags every synthesized corruption exactly once") {
    val live = operators.Similarity.q107(spark, sf).collect()(0)
    assert(live.getAs[Long]("exp_dim") == 64L)
    assert(live.getAs[Long]("n_valid") == live.getAs[Long]("n_vecs"))
    Seq("n_null", "n_wrong_dim", "n_nan", "n_inf", "n_zero")
      .foreach(c => assert(live.getAs[Long](c) == 0L, s"live $c nonzero"))

    import org.apache.spark.sql.types._
    val schema = StructType(Seq(
      StructField("vec_id", LongType), StructField("embedding", ArrayType(FloatType))))
    val rows = Seq(
      org.apache.spark.sql.Row(1L, Seq(1.0f, 2.0f, 3.0f)),            // valid
      org.apache.spark.sql.Row(2L, Seq(0.5f, -0.5f, 0.25f)),          // valid
      org.apache.spark.sql.Row(3L, null),                              // null vector
      org.apache.spark.sql.Row(4L, Seq(1.0f, 2.0f)),                   // wrong dim
      org.apache.spark.sql.Row(5L, Seq(Float.NaN, 1.0f, 1.0f)),        // NaN
      org.apache.spark.sql.Row(6L, Seq(Float.PositiveInfinity, 0f, 0f)), // +Inf
      org.apache.spark.sql.Row(7L, Seq(Float.NegativeInfinity, 0f, 0f)), // -Inf
      org.apache.spark.sql.Row(8L, Seq(0.0f, 0.0f, 0.0f)),             // all-zero
      org.apache.spark.sql.Row(9L, Seq(0.0f, -0.0f, 0.0f)))            // all-zero w/ -0.0
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(rows.map(r =>
        org.apache.spark.sql.Row(r.get(0),
          Option(r.get(1)).map(_.asInstanceOf[Seq[Float]]).orNull)), 2), schema)
    val v = operators.Similarity.validateEmbeddings(df).collect()(0)
    assert(v.getAs[Long]("exp_dim") == 3L) // modal dim among non-null vectors
    assert(v.getAs[Long]("n_vecs") == 9L)
    assert(v.getAs[Long]("n_null") == 1L)
    assert(v.getAs[Long]("n_wrong_dim") == 1L)
    assert(v.getAs[Long]("n_nan") == 1L)
    assert(v.getAs[Long]("n_inf") == 2L)
    assert(v.getAs[Long]("n_zero") == 2L)
    assert(v.getAs[Long]("n_valid") == 2L)

    // the catastrophe case: EVERY embedding null (a failed upstream
    // write). The report must shout n_null = N, not collapse to an
    // empty-looking table because no modal dimension exists.
    val allNull = spark.createDataFrame(
      spark.sparkContext.parallelize(
        (1L to 5L).map(i => org.apache.spark.sql.Row(i, null)), 2), schema)
    val nv = operators.Similarity.validateEmbeddings(allNull).collect()(0)
    assert(nv.getAs[Long]("n_vecs") == 5L)
    assert(nv.getAs[Long]("n_null") == 5L)
    assert(nv.getAs[Long]("n_valid") == 0L)
    assert(nv.isNullAt(nv.fieldIndex("exp_dim")))
  }

  test("q114 histogram is a distribution over a linear, equi-joined pair sample") {
    val df = operators.Similarity.q114(spark, sf).cache()
    assert(df.count() > 0)
    assert(df.filter(col("bin") < -20 || col("bin") > 20).count() == 0)
    val shares = df.agg(sum("share")).head.getDouble(0)
    assert(math.abs(shares - 1.0) < 1e-3, s"shares sum to $shares")
    // fixed group SIZE ⇒ the sample is linear in n: a loose Poisson
    // envelope on n·B/2 expected pairs
    val n = Tables(spark, sf, "embeddings").count()
    val pairs = df.agg(sum("n_pairs")).head.getLong(0)
    assert(pairs > 0 && pairs <= n * operators.Similarity.CalibB,
      s"$pairs pairs from $n vectors")
    df.unpersist()
    // the self-join must stay an equi-join on the group key — the
    // only nested-loop allowed is the 1-row count-frame crossJoin
    val p = operators.Similarity.q114(spark, sf).queryExecution.executedPlan.toString
    assert(!p.contains("CartesianProduct"), "q114 plans a cartesian product")
  }

  test("q143 recall report meets the documented floors and matches an independent recount") {
    val got = operators.Similarity.q143(spark, sf).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(got.keySet == Set("ivf", "lsh", "pq"))
    assert(got.values.forall(_._2 == 100L), "truth size must be QueryMax*5")
    // the same floors the per-method recall specs pin
    assert(got("lsh")._3 >= 900000L, s"lsh recall ${got("lsh")._3} ppm")
    assert(got("ivf")._3 >= 800000L, s"ivf recall ${got("ivf")._3} ppm")
    assert(got("pq")._3 >= 800000L, s"pq recall ${got("pq")._3} ppm")
    // cross-check one method against an independent driver-side recount
    val truth = operators.Similarity.q50(spark, sf)
      .select("query_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val ivfHits = operators.Similarity.q52(spark, sf)
      .select("query_id", "neighbor_id").collect()
      .count(r => truth((r.getLong(0), r.getLong(1)))).toLong
    assert(got("ivf")._1 == ivfHits,
      s"report ${got("ivf")._1} matched vs recount $ivfHits")
  }

  test("q160 hybrid retrieval equals an exact local BM25+cosine RRF recompute") {
    // Local reference mirrors the operator's arithmetic EXACTLY:
    // per-term BM25 contributions rounded to micro-longs before the
    // (order-free) sum, integer rank keys with doc_id tie-breaks,
    // the sequential-double dot product, and the fixed-order
    // two-term rrf sum — so set equality is exact, not approximate.
    val docs = Tables(spark, sf, "documents")
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1).split(" ").filter(_.nonEmpty)).toMap
    val nDocs = docs.size.toDouble
    val sumDl = docs.values.map(_.length.toDouble).sum
    val tf: Map[(Long, String), Double] =
      docs.toSeq.flatMap { case (id, tks) =>
        tks.groupBy(identity).map { case (t, g) => (id, t) -> g.length.toDouble }
      }.toMap
    val qIds = docs.keys.filter(_ < 20).toSeq.sorted
    val dfOf: Map[String, Double] = {
      val qtoks = qIds.flatMap(q => docs(q).distinct).toSet
      qtoks.map(t => t -> docs.values.count(_.contains(t)).toDouble).toMap
    }
    // the stopword prune, mirrored with the operator's exact
    // double arithmetic; assert it bites on this corpus (the
    // non-vacuous-path rule)
    val kept = dfOf.filter { case (_, df) =>
      df * 1000000.0 <= operators.Similarity.HybDfMaxPpm.toDouble * nDocs }.keySet
    assert(kept.size < dfOf.size, "df cap never bites on this corpus — vacuous")
    assert(kept.nonEmpty, "df cap dropped every token")
    def lexTop(q: Long): Seq[(Long, Int)] = {
      val qtoks = docs(q).distinct.filter(kept)
      val scores = docs.keys.filter(_ != q).flatMap { d =>
        val dl = docs(d).length.toDouble
        val terms = qtoks.flatMap { t =>
          tf.get((d, t)).map { f =>
            val df = dfOf(t)
            val c = ((nDocs - df + 0.5) / (df + 0.5)) * (f * 2.2) /
              (f + 1.2 * (0.25 + 0.75 * (dl / (sumDl / nDocs))))
            math.floor(c * 1000000.0 + 0.5).toLong
          }
        }
        if (terms.isEmpty) None else Some(d -> terms.sum)
      }.toSeq
      scores.sortBy { case (d, u) => (-u, d) }.take(10)
        .zipWithIndex.map { case ((d, _), i) => (d, i + 1) }
    }
    val vecs = Tables(spark, sf, "embeddings").select("vec_id", "embedding").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray).toMap
    def dot(a: Array[Float], b: Array[Float]): Double = {
      var s = 0.0; var i = 0
      val m = math.min(a.length, b.length)
      while (i < m) { s += a(i).toDouble * b(i).toDouble; i += 1 }
      s
    }
    def vecTop(q: Long): Seq[(Long, Int)] = {
      val qe = vecs(q); val qn = math.sqrt(dot(qe, qe))
      vecs.toSeq.filter(_._1 != q).map { case (d, e) =>
        val cos = dot(qe, e) / (qn * math.sqrt(dot(e, e)))
        d -> math.floor(cos * 1000000.0 + 0.5).toLong
      }.sortBy { case (d, u) => (-u, d) }.take(10)
        .zipWithIndex.map { case ((d, _), i) => (d, i + 1) }
    }
    val expected = qIds.flatMap { q =>
      val lr = lexTop(q).toMap
      val vr = vecTop(q).toMap
      val fused = (lr.keySet ++ vr.keySet).toSeq.map { d =>
        val rrf = lr.get(d).map(r => 1.0 / (60 + r).toDouble).getOrElse(0.0) +
          vr.get(d).map(r => 1.0 / (60 + r).toDouble).getOrElse(0.0)
        (d, lr.getOrElse(d, 0), vr.getOrElse(d, 0), rrf)
      }
      fused.sortBy { case (d, _, _, rrf) => (-rrf, d) }.take(10)
        .zipWithIndex.map { case ((d, l, v, rrf), i) =>
          (q, d, i + 1, l, v, math.floor(rrf * 1000000.0 + 0.5) / 1000000.0)
        }
    }.toSet
    val got = operators.Similarity.q160(spark, sf).collect().map(r =>
      (r.getLong(0), r.getLong(1), r.getInt(2), r.getInt(3), r.getInt(4),
        r.getDouble(5))).toSet
    assert(got == expected,
      s"hybrid mismatch: extra=${(got -- expected).take(5)} missing=${(expected -- got).take(5)}")
  }

  test("q163 retrieval eval recounts exactly from the verified truth and rankings") {
    val rep = operators.Similarity.q163(spark, sf).collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), if (r.isNullAt(3)) -1L else r.getLong(3)))).toMap
    assert(rep.keySet == Set("fused", "lex", "vec"))
    // independent truth recount from the two verified pair operators
    val lexP = operators.Dedup.q41(spark, sf).select("d1", "d2").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val semP = operators.Dedup.q44(spark, sf).select("id1", "id2").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val truth = (lexP ++ semP).flatMap { case (a, b) => Seq((a, b), (b, a)) }
      .filter(_._1 < 20).toSet
    assert(truth.nonEmpty, "corpus has no near-dup pair under the query contract")
    assert(rep.values.forall(_._1 == truth.size),
      s"denominator ${rep.values.map(_._1)} != recounted ${truth.size}")
    // fused hits recount against the operator's own shipped ranking
    val fusedOut = operators.Similarity.q160(spark, sf).collect()
    val fusedSet = fusedOut.map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(rep("fused")._2 == truth.count(fusedSet), "fused hit recount diverges")
    // every report cell satisfies the integer ppm formula
    assert(rep.values.forall { case (nt, nh, ppm) =>
      if (nt == 0) ppm == -1L else ppm == nh * 1000000L / nt })
    // fusion only ranks branch candidates: each fused row carries at
    // least one branch rank
    assert(fusedOut.forall(r => r.getInt(3) > 0 || r.getInt(4) > 0))
  }

  test("q162 embedding drift equals an exact integer-moment local recompute") {
    val rows = Tables(spark, sf, "embeddings")
      .join(Tables(spark, sf, "documents").select(col("doc_id").as("vec_id"), col("source")), "vec_id")
      .select("source", "embedding").collect()
      .map(r => r.getString(0) -> r.getSeq[Float](1).toArray)
    val dims = rows.map(_._2.length).max
    // component sums in exact integer micro-units, then BigInt moments
    val bySrc = rows.groupBy(_._1).map { case (s0, g) =>
      val su = Array.tabulate(dims) { i =>
        g.map { case (_, e) =>
          if (i < e.length) math.floor(e(i).toDouble * 1000000.0 + 0.5).toLong else 0L
        }.sum
      }
      s0 -> (su, g.length.toLong)
    }
    def moment(a: Array[Long], b: Array[Long]): BigInt =
      a.indices.map(i => BigInt(a(i)) * BigInt(b(i))).sum
    val expected = (for {
      (sa, (va, na)) <- bySrc; (sb, (vb, nb)) <- bySrc
      // operator compares with Spark's UTF-8 byte order; sources are
      // ASCII here so String.< is equivalent
      if sa < sb
    } yield {
      val cos = moment(va, vb).toDouble /
        (math.sqrt(moment(va, va).toDouble) * math.sqrt(moment(vb, vb).toDouble))
      (sa, sb, na, nb, math.floor(cos * 1000000.0 + 0.5) / 1000000.0)
    }).toSet
    val got = operators.Similarity.q162(spark, sf).collect().map(r =>
      (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3), r.getDouble(4))).toSet
    assert(got == expected,
      s"drift mismatch: extra=${(got -- expected).take(3)} missing=${(expected -- got).take(3)}")
    val k = bySrc.size
    assert(got.size == k * (k - 1) / 2, s"expected full ${k}x$k upper triangle")
  }

  test("q166 label probe equals an exact local top-10 majority vote") {
    import org.apache.spark.sql.Row
    val vecs = Tables(spark, sf, "embeddings")
      .select("vec_id", "embedding", "label").collect()
      .map { case Row(id: Long, e: scala.collection.Seq[_], l: Int) =>
        (id, e.asInstanceOf[scala.collection.Seq[Float]].toArray, l)
      }.sortBy(_._1)
    // mirror the operator's arithmetic: float-widened sequential
    // double dot/norm, r6 = floor(x*1e6+0.5)/1e6
    def cosR6(a: Array[Float], b: Array[Float]): Double = {
      var dp = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.length) {
        dp += a(i).toDouble * b(i); na += a(i).toDouble * a(i)
        nb += b(i).toDouble * b(i); i += 1
      }
      math.floor(dp / (math.sqrt(na) * math.sqrt(nb)) * 1000000.0 + 0.5) / 1000000.0
    }
    val expected = vecs.filter(_._1 < 20).map { case (qid, qv, ql) =>
      val top10 = vecs.filter(_._1 != qid)
        .map { case (oid, ov, ol) => (-cosR6(qv, ov), oid, ol) }
        .sorted.take(10)
      val (predicted, votes) = top10.groupBy(_._3).view
        .mapValues(_.length).toSeq
        .minBy { case (l, c) => (-c, l) }
      (qid, ql, predicted, votes.toLong, ql == predicted)
    }.toSet
    val got = operators.Similarity.q166(spark, sf).collect().map(r =>
      (r.getLong(0), r.getInt(1), r.getInt(2), r.getLong(3), r.getBoolean(4))).toSet
    assert(got == expected,
      s"probe mismatch: extra=${(got -- expected).take(3)} missing=${(expected -- got).take(3)}")
    assert(got.size == vecs.count(_._1 < 20))
  }

  test("q168 semantic decon equals an exact local argmax and fires on a planted twin") {
    import org.apache.spark.sql.Row
    def cosR6(a: Array[Float], b: Array[Float]): Double = {
      var dp = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.length) {
        dp += a(i).toDouble * b(i); na += a(i).toDouble * a(i)
        nb += b(i).toDouble * b(i); i += 1
      }
      math.floor(dp / (math.sqrt(na) * math.sqrt(nb)) * 1000000.0 + 0.5) / 1000000.0
    }
    val vecs = Tables(spark, sf, "embeddings")
      .select("vec_id", "embedding").collect()
      .map { case Row(id: Long, e: scala.collection.Seq[_]) =>
        (id, e.asInstanceOf[scala.collection.Seq[Float]].toArray)
      }
    val evals = vecs.filter(_._1 < 20)
    val want = vecs.filter(_._1 >= 20).map { case (id, v) =>
      val (best, eid) = evals.map { case (e, ev) => (-cosR6(v, ev), e) }.min
      (id, eid, -best, -best >= operators.Dedup.CosThr.toDouble)
    }.toSet
    val got = operators.Similarity.q168(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getBoolean(3))).toSet
    assert(got == want,
      s"decon mismatch: extra=${(got -- want).take(3)} missing=${(want -- got).take(3)}")
    // planted twin: corpus vector 1000 = eval vector 7 scaled by 2
    // (cosine exactly 1) must be flagged with nearest_eval 7
    import spark.implicits._
    val twin = evals.find(_._1 == 7L).get._2.map(_ * 2.0f)
    val planted = (vecs.toSeq :+ (1000L, twin)).toDF("vec_id", "embedding")
    val hit = operators.Similarity.semanticDecon(planted)
      .filter($"vec_id" === 1000L).collect()
    assert(hit.length == 1 && hit(0).getLong(1) == 7L && hit(0).getBoolean(3),
      s"planted twin not flagged: ${hit.toSeq}")
  }

  test("ivf fit over an empty frame degrades to an empty assignment, not a throw") {
    // the r8 ADVICE guard: the exact tree-merge throws on a
    // zero-partition RDD (the NoveltyStream rdd.reduce class) and the
    // seed collect has nothing to seed from — an empty custom frame
    // (spec corpora, a fully-quarantined ingest) must return cleanly
    import spark.implicits._
    val empty = Seq.empty[(Long, Seq[Float])].toDF("vec_id", "embedding")
    val (cells, cents) = operators.Similarity.ivfCellsOf(spark, empty)
    assert(cells.count() == 0L && cents.isEmpty)
    assert(cells.columns.toSeq == Seq("vec_id", "cid", "cid2", "ed", "nrm"))
    // and the filtered-to-empty corpus shape (partitions > 0, rows = 0)
    val filtered = Tables(spark, sf, "embeddings").filter(lit(false))
    val (c2, k2) = operators.Similarity.ivfCellsOf(spark, filtered)
    assert(c2.count() == 0L && k2.isEmpty)
  }
}
