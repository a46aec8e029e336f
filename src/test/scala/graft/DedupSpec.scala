package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

class DedupSpec extends AnyFunSuite {
  import TestSpark.{spark, sf}

  test("q40 covers every document and canonical ids are group minima") {
    val df = operators.Dedup.q40(spark, sf)
    val docs = Tables(spark, sf, "documents").count()
    assert(df.count() == docs)
    assert(df.filter(col("canonical_id") > col("doc_id")).count() == 0)
  }

  test("q41 jaccard pairs are ordered, deduped, and above threshold") {
    val df = operators.Dedup.q41(spark, sf)
    assert(df.count() > 0, "expected near-dup pairs in synthetic docs")
    assert(df.filter(col("d1") >= col("d2")).count() == 0)
    assert(df.filter(col("jaccard") < 0.6 || col("jaccard") > 1.0).count() == 0)
  }

  test("q42 MinHash-LSH recalls the exact jaccard pairs (same threshold)") {
    val exact = operators.Dedup.q41(spark, sf).select("d1", "d2")
    val lsh = operators.Dedup.q42(spark, sf).select("d1", "d2")
    val nExact = exact.count()
    val hit = exact.join(lsh, Seq("d1", "d2"), "left_semi").count()
    // 32 bands × 4 rows ⇒ P(miss at j=0.6) = (1-.6^4)^32 ≈ 1.2% per pair
    assert(hit >= (nExact * 0.9).toLong, s"LSH recall $hit/$nExact < 0.9")
    // and LSH never invents pairs: it verifies candidates exactly
    assert(lsh.join(exact, Seq("d1", "d2"), "left_anti").count() == 0)
  }

  test("q65 clusters are closed under the pair graph and keyed by minimum") {
    val labels = operators.Dedup.q65(spark, sf)
    val pairs = operators.Dedup.q41(spark, sf).select("d1", "d2")
    // every near-dup pair must share a cluster
    val l1 = labels.withColumnRenamed("doc_id", "d1").withColumnRenamed("cluster_id", "c1")
    val l2 = labels.withColumnRenamed("doc_id", "d2").withColumnRenamed("cluster_id", "c2")
    val split = pairs.join(l1, "d1").join(l2, "d2").filter(col("c1") =!= col("c2"))
    assert(split.count() == 0, "a connected pair landed in two clusters")
    // cluster id is the minimum member id
    val badKey = labels.groupBy("cluster_id").agg(min("doc_id").as("m"))
      .filter(col("cluster_id") =!= col("m"))
    assert(badKey.count() == 0)
    assert(labels.count() == Tables(spark, sf, "documents").count())
    // no over-merging: p edges can merge away at most p clusters, so
    // clusters >= docs - pairs (catches a degenerate all-one-cluster
    // labeling that the closure assertions above cannot see)
    val nClusters = labels.select("cluster_id").distinct().count()
    val nDocs = labels.count()
    val nPairs = pairs.count()
    assert(nClusters >= nDocs - nPairs && nClusters > 1,
      s"over-merged: $nClusters clusters for $nDocs docs / $nPairs pairs")
  }

  test("q175 source matrix recomputes exactly from q41 pairs and conserves pair volume") {
    val src = Tables(spark, sf, "documents").select("doc_id", "source").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val pairs = operators.Dedup.q41(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(pairs.nonEmpty, "no near-dup pairs at this SF: vacuous")
    val cells = pairs.groupBy { case (a, b) =>
      val (s1, s2) = (src(a), src(b))
      (if (s1 <= s2) s1 else s2, if (s1 <= s2) s2 else s1)
    }.map { case (k, v) => k -> v.size.toLong }
    val tot = pairs.length.toLong
    val got = operators.Dedup.q175(spark, sf).collect()
    assert(got.length == cells.size)
    got.foreach { r =>
      val k = (r.getString(0), r.getString(1))
      assert(r.getLong(2) == cells(k), s"cell $k count")
      assert(r.getLong(3) == cells(k) * 1000000L / tot, s"cell $k share")
    }
    assert(got.map(_.getLong(2)).sum == tot, "matrix does not conserve the pair volume")
  }

  test("q176 cluster purity recomputes exactly from q65 labels and sees mixed clusters") {
    val meta = Tables(spark, sf, "documents").select("doc_id", "lang", "source").collect()
      .map(r => r.getLong(0) -> ((r.getString(1), r.getString(2)))).toMap
    val clusters = operators.Dedup.q65(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
      .groupBy(_._2).filter(_._2.length >= 2) // multi-doc components only
    assert(clusters.nonEmpty, "no multi-doc clusters at this SF: vacuous")
    val got = operators.Dedup.q176(spark, sf).collect()
    assert(got.length == clusters.size)
    got.foreach { r =>
      val members = clusters(r.getLong(0)).map(_._1)
      val langs = members.map(meta(_)._1)
      assert(r.getLong(1) == members.length.toLong, s"cluster ${r.getLong(0)} size")
      assert(r.getLong(2) == langs.distinct.length.toLong, s"cluster ${r.getLong(0)} langs")
      assert(r.getLong(3) == members.map(meta(_)._2).distinct.length.toLong,
        s"cluster ${r.getLong(0)} sources")
      val modal = langs.groupBy(identity).values.map(_.length).max.toLong
      assert(r.getLong(4) == modal * 1000000L / members.length, s"cluster ${r.getLong(0)} purity")
    }
    // the corpus's lang column is content-independent, so near-dup
    // clusters genuinely mix languages — the report is non-trivial
    assert(got.exists(_.getLong(2) > 1), "every cluster single-language: vacuous purity read")
  }

  test("q65 labels equal a driver-side union-find over the same pair list") {
    // the pointer-jump acceleration must not change the HashMin
    // result: both converge to min(component id). Union-find with
    // link-larger-root-under-smaller gives exactly that canonical
    // labeling (the component min can never become a child).
    val labels = operators.Dedup.q65(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val pairs = operators.Dedup.q41(spark, sf).select("d1", "d2").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val parent = scala.collection.mutable.Map.empty[Long, Long]
    def find(x: Long): Long = {
      val p = parent.getOrElse(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    pairs.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val expected = labels.keys.map(d => d -> find(d)).toMap
    assert(labels == expected,
      s"q65 diverged from union-find on ${labels.count(kv => expected(kv._1) != kv._2)} docs")
  }

  test("q154 router picks banding on the driver corpus and equals q44's pair set") {
    val got = operators.Dedup.q154(spark, sf).collect()
    assert(got.forall(_.getString(2) == "banding"),
      s"driver corpus skew ${got.head.getLong(3)} should route to banding")
    assert(got.head.getLong(3) < operators.Dedup.RouteSkewX1000)
    // verdicts must derive EXACTLY from q44's pair set by the shared
    // drop rule (drop the larger id of every qualifying pair)
    val droppedWant = operators.Dedup.q44(spark, sf).collect()
      .map(_.getLong(1)).toSet
    val droppedGot = got.filter(!_.getBoolean(1)).map(_.getLong(0)).toSet
    assert(droppedGot == droppedWant,
      s"extra=${droppedGot -- droppedWant} missing=${droppedWant -- droppedGot}")
    assert(got.length == Tables(spark, sf, "embeddings").count())
  }

  test("q154 boundary corpora: routes straddle the 3x skew gate and both routes agree on planted twins") {
    // GenData's clusterW knob interpolates cluster mass: at 2000
    // vectors (base fixed-seed geometry, deterministic bytes),
    // w=0.45 measures median skew ~2.61x (banding side of the gate)
    // and w=0.6 measures ~3.19x (cells side) — the router's decision
    // flips across corpora that are deliberately NEAR the boundary.
    // On such corpora the routes' full verdict sets legitimately
    // differ (different candidate structure), but the planted
    // cosine-0.95 twins are what the router promises not to lose:
    // BOTH routes must drop every twin (route-invariant recall), and
    // their twin verdicts must agree row-for-row.
    def bandingVerdict(dir: String) = {
      val dropped = operators.Dedup.q44(spark, dir)
        .select(col("id2").as("vec_id")).distinct()
        .withColumn("is_dup", lit(true))
      Tables(spark, dir, "embeddings").select(col("vec_id"))
        .join(dropped, Seq("vec_id"), "left")
        .select(col("vec_id"), col("is_dup").isNull.as("kept"))
    }
    val n = 2000
    val twins = (1 until n by 143).map(_.toLong).toSet // id % 143 == 1
    for ((w, lo, hi, wantRoute) <- Seq(
        (0.45, 2300L, 2999L, "banding"), (0.6, 3000L, 3900L, "cells"))) {
      TestSpark.withTmpDir(s"routeboundary$w") { dir =>
        GenData.generate(spark, dir, nDocs = 300, nVecs = n, clusterW = w)
        val routed = operators.Dedup.q154(spark, dir).collect()
        val med = routed.head.getLong(3)
        assert(med >= lo && med <= hi, s"w=$w med skew $med outside [$lo,$hi]")
        assert(routed.forall(_.getString(2) == wantRoute),
          s"w=$w med=$med routed to ${routed.head.getString(2)}, want $wantRoute")
        val band = bandingVerdict(dir).collect()
          .map(r => r.getLong(0) -> r.getBoolean(1)).toMap
        val cells = operators.Dedup.q45(spark, dir).select("vec_id", "kept").collect()
          .map(r => r.getLong(0) -> r.getBoolean(1)).toMap
        assert(band.size == n && cells.size == n)
        // route-invariant twin recall: every planted twin dropped by
        // BOTH routes, and the two verdicts agree on every twin row
        for (t <- twins) {
          assert(!band(t), s"w=$w banding route kept planted twin $t")
          assert(!cells(t), s"w=$w cells route kept planted twin $t")
          assert(band(t) == cells(t))
        }
        // and the router's own output equals the chosen route's verdict
        val got = routed.map(r => r.getLong(0) -> r.getBoolean(1)).toMap
        val want = if (wantRoute == "banding") band else cells
        assert(got == want, s"w=$w router verdicts diverge from the $wantRoute route")
      }
    }
  }

  test("q154 router picks cells on the clustered x30 stress corpus and stays linear-time") {
    // the corpus q44 measured 659 s on (quadratic true-pair volume);
    // generated by `runMain graft.GenData /tmp/stress_x30 150000 60000`
    assume(new java.io.File("/tmp/stress_x30/embeddings.parquet").isDirectory,
      "x30 stress corpus not present on this machine")
    val t0 = System.nanoTime()
    val got = operators.Dedup.q154(spark, "/tmp/stress_x30")
      .select("route", "med_skew_x1000").limit(1).collect()
    val secs = (System.nanoTime() - t0) / 1e9
    assert(got.head.getString(0) == "cells",
      s"skew ${got.head.getLong(1)} should exceed ${operators.Dedup.RouteSkewX1000}")
    assert(got.head.getLong(1) >= operators.Dedup.RouteSkewX1000)
    // q44 on this corpus measured 659 s — the router must stay an
    // order of magnitude under that even with host noise
    assert(secs < 120.0, f"router took $secs%.1f s on x30 (q44 baseline: 659 s)")
  }

  test("q43 simhash near-dups have small hamming distance and include true dups") {
    val df = operators.Dedup.q43(spark, sf)
    assert(df.filter(col("hamming") > 8).count() == 0)
    assert(df.count() > 0, "expected simhash candidates on near-dup corpus")
  }

  test("fused simhash64 expression is bit-identical to the explode+groupBy reference") {
    // the r13 map-only rewrite must reproduce the retired form
    // EXACTLY: same xxhash64 per token, same per-bit +1/-1 majority,
    // same zero-token-doc drop (explode emitted no row for them)
    val ref = {
      val toks = Tables(spark, sf, "documents")
        .select(col("doc_id"),
          explode(expr(s"array_distinct(${operators.Dedup.tokensExpr})")).as("tok"))
        .withColumn("h", xxhash64(col("tok")))
      val bitAggs = (0 until 64).map(b =>
        sum(when(shiftright(col("h"), b).bitwiseAND(1) === 1, 1).otherwise(-1)).as(s"b$b"))
      toks.groupBy("doc_id")
        .agg(bitAggs.head, bitAggs.tail: _*)
        .select(col("doc_id"),
          (0 until 64).map(b => when(col(s"b$b") >= 0, lit(1L << b)).otherwise(0L))
            .reduce(_ + _).as("simhash"))
    }
    val fused = operators.Dedup.simhashes(spark, sf).select("doc_id", "simhash")
    assert(fused.exceptAll(ref.select("doc_id", "simhash")).count() == 0 &&
      ref.select("doc_id", "simhash").exceptAll(fused).count() == 0,
      "fused simhash64 diverged from the explode+groupBy reference")
  }

  test("q43 block-combination banding recalls ALL hamming<=8 pairs (exhaustive)") {
    val sims = operators.Dedup.simhashes(spark, sf)
    val a = sims.select(col("doc_id").as("d1"), col("simhash").as("h1"))
    val b = sims.select(col("doc_id").as("d2"), col("simhash").as("h2"))
    val exact = a.join(b, col("d1") < col("d2"))
      .withColumn("hamming", bit_count(col("h1").bitwiseXOR(col("h2"))))
      .filter(col("hamming") <= 8)
      .select("d1", "d2", "hamming")
    val got = operators.Dedup.q43(spark, sf).select("d1", "d2", "hamming")
    assert(exact.exceptAll(got).count() == 0,
      "banding missed a hamming<=8 pair — the >=2-clean-blocks guarantee is broken")
    assert(got.exceptAll(exact).count() == 0, "q43 emitted a pair outside hamming<=8")
  }

  test("q41 size-join SMJ fallback (the >20M-doc branch) equals the broadcast path") {
    // the broadcastSizes = false branch exists ONLY for corpora past
    // SzBroadcastMaxDocs (executor-memory sizing) and is unreachable
    // at any test SF — drive the core directly through both branches
    val sh = operators.Dedup.cappedShingles(spark, sf).localCheckpoint(false)
    val parts = spark.sparkContext.defaultParallelism
    val bc = operators.Dedup.pairCountsCore(sh, parts, broadcastSizes = true)
      .select("d1", "d2", "c", "n1", "n2")
    val smj = operators.Dedup.pairCountsCore(sh, parts, broadcastSizes = false)
      .select("d1", "d2", "c", "n1", "n2")
    // the flag genuinely changes the plan: the size-join broadcast
    // hint appears only on the broadcast path (AQE may still choose a
    // runtime broadcast at this tiny SF — the logical strategy is
    // what the branch controls)
    def hinted(df: org.apache.spark.sql.DataFrame) =
      df.queryExecution.optimizedPlan.toString.contains("strategy=broadcast")
    assert(hinted(bc), "broadcast path lost its size-join hint")
    assert(!hinted(smj), "SMJ fallback still carries a broadcast hint")
    assert(bc.count() > 0, "vacuous: no shared-shingle pairs at this sf")
    assert(bc.exceptAll(smj).count() == 0 && smj.exceptAll(bc).count() == 0,
      "SMJ fallback emitted different pair rows than the broadcast path")
  }

  test("q43Scoped equals per-scope unscoped runs and excludes cross-scope pairs") {
    // the r13 dedup-domain sharding contract: with a scope column the
    // band key becomes (scope, cb, bkey) — pairs are emitted WITHIN a
    // scope only (identical to running the unscoped join per scope)
    // and pairs spanning scopes are deliberately absent
    val sims = operators.Dedup.simhashes(spark, sf).localCheckpoint(false)
    val scoped = operators.Dedup.q43Scoped(spark, sf, pmod(col("doc_id"), lit(3L)))
      .select("d1", "d2", "hamming", "scope")
    val want = (0L until 3L).map { g =>
      operators.Dedup.hamming64Pairs(
          sims.filter(pmod(col("doc_id"), lit(3L)) === g), 8)
        .withColumn("scope", lit(g))
        .select("d1", "d2", "hamming", "scope")
    }.reduce(_ unionByName _)
    assert(scoped.exceptAll(want).count() == 0 && want.exceptAll(scoped).count() == 0,
      "scoped banding differs from per-scope unscoped runs")
    val rows = scoped.collect()
    assert(rows.nonEmpty, "vacuous: no intra-scope pairs at this sf")
    assert(rows.forall(r =>
        r.getLong(0) % 3 == r.getLong(3) && r.getLong(1) % 3 == r.getLong(3)),
      "a pair left its scope or carries the wrong scope label")
    // non-vacuous contract: the corpus HAS cross-scope hamming pairs,
    // and scoping excluded exactly those
    val unscoped = operators.Dedup.q43(spark, sf).count()
    assert(unscoped > rows.length,
      "no cross-scope hamming pairs in the corpus — the exclusion went untested")
  }

  test("BandOps pack/extract round-trips and first-shared-band matches a reference scan") {
    import org.apache.spark.sql.catalyst.util.GenericArrayData
    val rnd = new scala.util.Random(42)
    for (bits <- Seq(6, 11, 17, 31, 44); bands <- Seq(3, 32, 96)) {
      val mask = (1L << bits) - 1
      val ks = Array.fill(bands)(rnd.nextLong())
      val packed = new GenericArrayData(functions.BandOps.packKeys(ks, bits))
      for (b <- 0 until bands)
        assert(functions.BandOps.bandKey(packed, bits, b) == (ks(b) & mask),
          s"pack/extract mismatch at bits=$bits bands=$bands b=$b")
      // first-shared-band == reference linear scan over masked keys
      val ks2 = ks.zipWithIndex.map { case (k, i) =>
        if (rnd.nextBoolean() && i != bands - 1) k else rnd.nextLong() }
      val packed2 = new GenericArrayData(functions.BandOps.packKeys(ks2, bits))
      val want = (0 until bands).find(b => (ks(b) & mask) == (ks2(b) & mask)).getOrElse(-1)
      assert(functions.BandOps.firstSharedBand(packed, packed2, bits, bands) == want)
    }
    // int-key variant
    val xs = Array.fill(32)(rnd.nextInt())
    val ys = xs.zipWithIndex.map { case (x, i) => if (i % 3 == 2) x else rnd.nextInt() }
    val wantI = (0 until 32).find(i => xs(i) == ys(i)).getOrElse(-1)
    import org.apache.spark.sql.catalyst.util.ArrayData
    assert(functions.BandOps.firstEqualIdx(
      ArrayData.toArrayData(xs), ArrayData.toArrayData(ys)) == wantI)
  }

  /** The r12 distinct-retirement proof: the canonical-first-shared-
    * band predicate emits EXACTLY the distinct() candidate pair set,
    * each pair exactly once — on the same keyed frame, so the only
    * difference under test is the dedup mechanism. */
  private def assertCanonicalEqualsDistinct(keyed0: org.apache.spark.sql.DataFrame,
      idCol: String, canonical: org.apache.spark.sql.Column): Unit = {
    val keyed = keyed0.localCheckpoint(false)
    val joined = keyed.as("x").join(keyed.as("y"),
      col("x.band") === col("y.band") && col("x.bkey") === col("y.bkey") &&
        col(s"x.$idCol") < col(s"y.$idCol"))
    val want = joined.select(col(s"x.$idCol").as("a"), col(s"y.$idCol").as("b")).distinct()
    val got = joined.filter(canonical)
      .select(col(s"x.$idCol").as("a"), col(s"y.$idCol").as("b"))
      .localCheckpoint(false)
    val n = got.count()
    assert(n == got.distinct().count(), "canonical predicate emitted a pair twice")
    assert(n == want.count() &&
      got.exceptAll(want).count() == 0 && want.exceptAll(got).count() == 0,
      "canonical candidate set differs from distinct()")
  }

  test("q42 canonical-band dedup equals distinct() on the banding join") {
    assertCanonicalEqualsDistinct(operators.Dedup.mhBandKeys(spark, sf), "doc_id",
      col("x.band") === functions.BandOps.firstEqualIdx(col("x.bkeys"), col("y.bkeys")))
  }

  test("q44 canonical-band dedup equals distinct() on the banding join") {
    val (keys, bits, bands) = operators.Dedup.ndKeyRows(spark, sf)
    assertCanonicalEqualsDistinct(keys, "vec_id",
      col("x.band") === functions.BandOps.firstSharedBand(
        col("x.sig"), col("y.sig"), bits, bands))
  }

  test("canonical-band dedup stress parity (q42 x10/x30, q44 x10 — x30 embeddings are q45's domain)") {
    // q44's x30 corpus is the documented quadratic-output regime the
    // router diverts to q45 (1.74M true pairs) — running its full
    // candidate join there is exactly what q154 exists to avoid, so
    // the embedding-side parity stops at x10.
    val dirs42 = Seq("/tmp/stress_x10", "/tmp/stress_x30").filter(d => new java.io.File(d).exists())
    val dirs44 = Seq("/tmp/stress_x10").filter(d => new java.io.File(d).exists())
    assume(dirs42.nonEmpty || dirs44.nonEmpty, "no stress corpora on this host")
    for (d <- dirs42)
      assertCanonicalEqualsDistinct(operators.Dedup.mhBandKeys(spark, d), "doc_id",
        col("x.band") === functions.BandOps.firstEqualIdx(col("x.bkeys"), col("y.bkeys")))
    for (d <- dirs44) {
      val (keys, bits, bands) = operators.Dedup.ndKeyRows(spark, d)
      assertCanonicalEqualsDistinct(keys, "vec_id",
        col("x.band") === functions.BandOps.firstSharedBand(
          col("x.sig"), col("y.sig"), bits, bands))
    }
  }

  test("q44 embedding near-dups are id-ordered and above threshold") {
    val df = operators.Dedup.q44(spark, sf)
    assert(df.filter(col("id1") >= col("id2")).count() == 0)
    assert(df.filter(col("cosine") < 0.45).count() == 0)
  }

  test("q44 LSH candidates recall the exact all-pairs result (exhaustive)") {
    import graft.functions.VectorOps.{dotp, l2norm}
    val e = Tables(spark, sf, "embeddings").withColumn("nrm", l2norm(col("embedding")))
    val a = e.select(col("vec_id").as("id1"), col("embedding").as("e1"), col("nrm").as("n1"))
    val b = e.select(col("vec_id").as("id2"), col("embedding").as("e2"), col("nrm").as("n2"))
    val exact = a.join(b, col("id1") < col("id2"))
      .withColumn("cos", dotp(col("e1"), col("e2")) / (col("n1") * col("n2")))
      .filter(col("cos") >= 0.45)
      .select("id1", "id2")
    val got = operators.Dedup.q44(spark, sf).select("id1", "id2")
    assert(exact.exceptAll(got).count() == 0,
      "LSH candidate generation missed a true pair at this SF — widen NdBands")
    assert(got.exceptAll(exact).count() == 0, "q44 emitted a pair below threshold")
  }

  test("q44 adaptive geometry recalls every operating-point twin on a bits>6 corpus") {
    import spark.implicits._
    // 5000 vectors forces the adaptive branch (bits=8 > base 6); the
    // geometry contract is full recall at the REAL near-dup operating
    // point (cosine >= 0.8), which the planted twins sit well above
    val (bits, bands) = operators.Dedup.ndGeometry(5000L)
    assert(bits > 6 && bands >= operators.Dedup.NdBands,
      s"5000 vectors should select an adaptive geometry, got ($bits, $bands)")
    assert(operators.Dedup.ndGeometry(2000L) == (6, operators.Dedup.NdBands),
      "driver-SF corpora must keep the base fixed-seed geometry (oracle parity)")
    TestSpark.withTmpDir("q44adapt") { dir =>
      def gauss(seed: Long) = {
        val r = new scala.util.Random(seed * 0x9e3779b97f4a7c15L + 3)
        Array.fill(64)(r.nextGaussian())
      }
      val vecs = spark.range(5000L).repartition(8).map { jid =>
        val id: Long = jid
        val base = if (id % 100 == 1 && id > 0) id - 1 else id
        val cent = gauss(1000 + base % 10) // twin shares its base's cluster
        val noise = gauss(7000 + base)
        val twin = if (id % 100 == 1 && id > 0) gauss(9000 + id).map(_ * 0.12)
                   else new Array[Double](64)
        (id, Array.tabulate(64)(i =>
          (0.3 * cent(i) + 0.25 * noise(i) + twin(i)).toFloat).toSeq)
      }.toDF("vec_id", "embedding")
      vecs.write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
      val emb = vecs.collect().map(r => r.getLong(0) -> r.getSeq[Float](1).toArray).toMap
      val planted = (1L until 5000L by 100L).map(id => (id - 1, id))
        .filter { case (a, b) => cos(emb(a), emb(b)) >= 0.8 }
      assert(planted.size >= 40, s"only ${planted.size} twins landed above 0.8: vacuous")
      val got = operators.Dedup.q44(spark, dir).select("id1", "id2").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      val missed = planted.filterNot(got)
      assert(missed.isEmpty, s"adaptive geometry missed operating-point twins: $missed")
    }
  }

  // same arithmetic as the codegen'd DotProduct: per-element float
  // widened to double, sequential double accumulation
  private def dot(x: Array[Float], y: Array[Float]): Double = {
    val m = math.min(x.length, y.length)
    var d = 0.0; var i = 0
    while (i < m) { d += x(i).toDouble * y(i).toDouble; i += 1 }
    d
  }
  private def cos(x: Array[Float], y: Array[Float]): Double =
    dot(x, y) / (math.sqrt(dot(x, x)) * math.sqrt(dot(y, y)))

  test("q45 keep flags match a brute-force shared-cell recomputation") {
    val emb = Tables(spark, sf, "embeddings").select("vec_id", "embedding").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray).toMap
    val got = operators.Dedup.q45(spark, sf).collect()
    assert(got.length == emb.size)
    val cellsOf = got.map(r => r.getLong(0) -> Set(r.getInt(1), r.getInt(2))).toMap
    val ids = emb.keys.toArray.sorted
    got.foreach { r =>
      val id = r.getLong(0)
      val expected = !ids.exists(prev => prev < id &&
        (cellsOf(prev) & cellsOf(id)).nonEmpty && cos(emb(prev), emb(id)) >= 0.45)
      assert(r.getBoolean(3) == expected, s"vec $id kept flag")
    }
    // non-vacuous: the corpus's threshold pairs produce dropped vectors
    assert(got.exists(!_.getBoolean(3)), "no vector dropped: test is vacuous")
    // corpus floor: this corpus's pairs sit at 0.45-0.48 cosine (~62
    // deg — adversarially low for cluster co-location; q44 is the
    // exact-recall tool there). Documented measured floor: 0.7.
    val exactPairs = (for {
      i <- ids.indices.iterator
      j <- (i + 1) until ids.length
      if cos(emb(ids(i)), emb(ids(j))) >= 0.45
    } yield (ids(i), ids(j))).toArray
    val coLocated = exactPairs.count { case (a, b) => (cellsOf(a) & cellsOf(b)).nonEmpty }
    assert(exactPairs.nonEmpty)
    assert(coLocated >= exactPairs.length * 0.7,
      s"SemDeDup cell recall $coLocated/${exactPairs.length} < 0.7")
  }

  test("q45 catches ALL planted near-identical dups (SemDeDup operating point)") {
    import spark.implicits._
    // 200 well-spread base vectors + 40 planted dups of them
    // (tiny deterministic perturbation, cosine >= 0.99); SemDeDup
    // must drop every planted dup and keep every base vector.
    val rnd = new scala.util.Random(42)
    val base = Array.fill(200)(Array.fill(64)(rnd.nextGaussian().toFloat))
    val dups = (0 until 40).map { i =>
      val src = base(i * 5)
      val v = src.map(x => x + (rnd.nextGaussian() * 0.01).toFloat)
      (200L + i, v.toSeq)
    }
    val rows = base.zipWithIndex.map { case (v, i) => (i.toLong, v.toSeq) } ++ dups
    val sanity = rows.toMap
    dups.foreach { case (id, v) =>
      assert(cos(sanity((id - 200) * 5).toArray, v.toArray) >= 0.95,
        s"planted dup $id drifted")
    }
    val df = rows.toSeq.toDF("vec_id", "embedding")
    val out = operators.Dedup.semanticDedup(spark, df, 0.9).collect()
    val kept = out.filter(_.getBoolean(3)).map(_.getLong(0)).toSet
    (0 until 200).foreach(i => assert(kept.contains(i.toLong), s"base $i wrongly dropped"))
    (200 until 240).foreach(i => assert(!kept.contains(i.toLong), s"planted dup $i missed"))
    // r13 sample-capped fit: centroids estimated from ~27% of the
    // corpus (floor 64, 4/cell at n=240) must not cost SemDeDup its
    // operating-point recall — a near-identical dup argmins to its
    // source's cell whatever the centroids, so the planted-dup law
    // is fit-sample-invariant even though cell MEMBERSHIP is not
    val capped = operators.Dedup.semanticDedup(spark, df, 0.9,
      fitFloor = 64L, fitPerCell = 4L).collect()
    val keptC = capped.filter(_.getBoolean(3)).map(_.getLong(0)).toSet
    (0 until 200).foreach(i => assert(keptC.contains(i.toLong),
      s"sample-capped fit wrongly dropped base $i"))
    (200 until 240).foreach(i => assert(!keptC.contains(i.toLong),
      s"sample-capped fit missed planted dup $i"))
  }

  test("q110 estimates known-overlap Jaccard within the 128-perm envelope, invariant to partitioning") {
    import spark.implicits._
    // A = 0..999, B = 500..1499 (J = 1/3), C = A exactly (J = 1);
    // duplicates injected into A must not move any estimate (set semantics)
    val a = (0L until 1000L).map(("sA", _))
    val b = (500L until 1500L).map(("sB", _))
    val c = (0L until 1000L).map(("sC", _))
    val rows = a ++ b ++ c ++ a.take(250) // repeated elements
    val est = operators.Dedup.sourceSimCore(rows.toDF("source", "h"))
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getDouble(2)).toMap
    assert(est.size == 3)
    assert(est(("sA", "sC")) == 1.0, "identical sets must agree on every slot")
    assert(math.abs(est(("sA", "sB")) - 1.0 / 3.0) <= 0.15, s"A-B ${est(("sA", "sB"))}")
    assert(math.abs(est(("sB", "sC")) - 1.0 / 3.0) <= 0.15, s"B-C ${est(("sB", "sC"))}")
    // merge-tree invariance: min is order-independent, so the estimate
    // must be bit-identical under any partitioning
    val est7 = operators.Dedup.sourceSimCore(rows.toDF("source", "h").repartition(7))
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getDouble(2)).toMap
    assert(est7 == est, "estimate depends on partitioning")
  }

  test("q110 live corpus estimates track exact per-pair Jaccard") {
    val est = operators.Dedup.q110(spark, sf)
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getDouble(2)).toMap
    val nSources = Tables(spark, sf, "documents").select("source").distinct().count().toInt
    assert(est.size == nSources * (nSources - 1) / 2)
    assert(est.values.forall(v => v >= 0.0 && v <= 1.0))
    // exact distinct-text Jaccard per source pair (the q95 ground truth)
    val sets = Tables(spark, sf, "documents").select("source", "text").collect()
      .groupBy(_.getString(0)).view.mapValues(_.map(_.getString(1)).toSet).toMap
    est.foreach { case ((sa, sb), e) =>
      val (x, y) = (sets(sa), sets(sb))
      val exact = x.intersect(y).size.toDouble / x.union(y).size
      assert(math.abs(e - exact) <= 0.15, s"$sa-$sb est $e vs exact $exact")
    }
  }

  test("q113 overlap estimates track the exact distinct-overlap matrix") {
    val est = operators.Dedup.q113(spark, sf).cache()
    val d = Tables(spark, sf, "documents").select(col("source"), col("text")).distinct()
    val exact = d.groupBy("source").agg(count(lit(1)).as("n"))
    // every source pair is present (the estimate exists even at zero overlap)
    val nSrc = exact.count()
    assert(est.count() == nSrc * (nSrc - 1) / 2)
    // per-source cardinality estimates (sparse-mode HLL at this SF is near-exact)
    val perSrc = est.select(col("source_a").as("source"), col("est_a").as("e"))
      .union(est.select(col("source_b"), col("est_b"))).distinct().join(exact, "source")
    assert(perSrc.filter(
      abs(col("e") - col("n")) > greatest(lit(2.0), col("n") * 0.03)).count() == 0)
    // pairwise shared-distinct estimates vs the exact text-equality join
    val sh = d.as("a").join(d.as("b"),
        col("a.text") === col("b.text") && col("a.source") < col("b.source"))
      .groupBy(col("a.source").as("source_a"), col("b.source").as("source_b"))
      .agg(count(lit(1)).as("shared"))
    val j = est.join(sh, Seq("source_a", "source_b"), "left").na.fill(0, Seq("shared"))
    assert(j.filter(abs(col("est_shared") - col("shared")) >
      greatest(lit(3.0), col("est_union") * 0.05)).count() == 0)
    est.unpersist()
  }

  test("overlapEstCore recovers a known overlap beyond HLL sparse mode") {
    import spark.implicits._
    // 10k + 10k distinct with 3000 shared — past the lgK=12 sparse
    // threshold, so this exercises the dense estimator and the
    // inclusion–exclusion error amplification the Scaladoc documents
    val rows = ((0 until 10000).map(i => ("A", s"doc-$i")) ++
      (7000 until 17000).map(i => ("B", s"doc-$i"))).toDF("source", "text")
    val out = operators.Dedup.overlapEstCore(rows).collect()
    assert(out.length == 1)
    val r = out.head
    assert(math.abs(r.getAs[Long]("est_a") - 10000L) <= 300)
    assert(math.abs(r.getAs[Long]("est_b") - 10000L) <= 300)
    val estShared = r.getAs[Long]("est_shared")
    assert(math.abs(estShared - 3000L) <= 1000, s"est_shared=$estShared vs 3000")
  }

  test("q132 containment equals a brute-force local shingle recompute") {
    val got = operators.Dedup.q132(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    val texts = Tables(spark, sf, "documents").select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1))
    val sets = texts.map { case (id, t) =>
      val tk = t.split(" ", -1).filter(_.nonEmpty)
      id -> tk.sliding(3).filter(_.length == 3).map(_.mkString(" ")).toSet
    }.toMap
    val df = sets.values.flatten.groupBy(identity).map { case (g, xs) => g -> xs.size }
    val capped = sets.map { case (id, ss) =>
      id -> ss.filter(df(_) <= operators.Dedup.DfCap)
    }
    val want = (for {
      (a, sa) <- capped.toSeq; (b, sb) <- capped.toSeq
      if a != b && sa.nonEmpty
      c = (sa & sb).size
      cont = c.toDouble / sa.size
      if cont >= operators.Dedup.ContThr.toDouble
    } yield (a, b) -> (math.floor(cont * 1e6 + 0.5) / 1e6)).toMap
    assert(got == want, s"sizes ${got.size} vs ${want.size}; " +
      s"first diff: ${got.find(kv => want.get(kv._1) != Some(kv._2))}")
  }

  test("q134 survivor-bias audit equals an exact recompute from q65 + q60") {
    val got = operators.Dedup.q134(spark, sf).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4))))
      .toMap
    assert(got.keySet == Set("kept", "dropped"),
      "synthetic corpus must have both populations")
    val keep = operators.Dedup.q65(spark, sf).collect()
      .map(r => r.getLong(0) -> (r.getLong(0) == r.getLong(1))).toMap
    val qual = operators.TextOps.q60(spark, sf)
      .select("doc_id", "n_tokens", "quality_score").collect()
      .map(r => (r.getLong(0), r.getInt(1).toLong,
        math.floor(r.getDouble(2) * 1e4 + 0.5).toLong))
    val want = qual.groupBy(q => if (keep(q._1)) "kept" else "dropped").map {
      case (st, rows) =>
        val n = rows.length.toLong
        val tok = rows.map(_._2).sum
        st -> ((n, tok,
          math.floor(tok.toDouble / n * 1e2 + 0.5) / 1e2,
          math.floor(rows.map(_._3).sum / (1e4 * n) * 1e4 + 0.5) / 1e4))
    }
    assert(got == want, s"first diff: ${got.find(kv => want.get(kv._1) != Some(kv._2))}")
    // total docs conserved across the two populations
    assert(got.values.map(_._1).sum == Tables(spark, sf, "documents").count())
  }

  test("q136 cluster-size histogram equals the q65 label recompute and conserves docs") {
    val got = operators.Dedup.q136(spark, sf).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    val labels = operators.Dedup.q65(spark, sf).collect().map(_.getLong(1))
    val nTotal = labels.length.toLong
    val want = labels.groupBy(identity).values.map(_.length.toLong).toSeq
      .groupBy(identity).map { case (size, cs) =>
        val (nc, nd) = (cs.length.toLong, size * cs.length)
        size -> ((nc, nd, nd * 1000000L / nTotal))
      }
    assert(got == want, s"first diff: ${got.find(kv => want.get(kv._1) != Some(kv._2))}")
    assert(got.values.map(_._2).sum == nTotal)
  }

  test("q178 duplication-quality profile equals an exact recompute from q65 + q60 + scrub") {
    val labels = operators.Dedup.q65(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val csize = labels.values.toSeq.groupBy(identity)
      .map { case (c, xs) => c -> xs.size.toLong }
    val qual = operators.TextOps.q60(spark, sf)
      .select("doc_id", "n_tokens", "quality_score").collect()
      .map(r => (r.getLong(0), r.getInt(1).toLong,
        math.floor(r.getDouble(2) * 1e4 + 0.5).toLong))
    val clean = operators.TextOps
      .scrub(Tables(spark, sf, "documents").select("doc_id", "text"))
      .select("doc_id", "is_clean").collect()
      .map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    def band(sz: Long) =
      if (sz == 1L) "x1" else if (sz <= 3L) "x2-3" else if (sz <= 7L) "x4-7" else "x8+"
    val rows = qual.map { case (id, nt, q4) =>
      val cid = labels(id)
      (band(csize(cid)), cid, nt, q4, clean(id))
    }
    val td = rows.length.toLong
    val want = rows.groupBy(_._1).map { case (b, rs) =>
      val n = rs.length.toLong
      val uq = rs.map(_._4).sum
      b -> ((n, rs.map(_._2).distinct.length.toLong, rs.map(_._3).sum,
        math.floor(uq / (1e4 * n) * 1e4 + 0.5) / 1e4,
        rs.count(!_._5).toLong * 1000000L / n,
        (BigInt(n) * 1000000 / td).toLong))
    }
    val got = operators.Dedup.q178(spark, sf).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4), r.getLong(5), r.getLong(6)))).toMap
    assert(got == want,
      s"first diff: ${got.find(kv => want.get(kv._1) != Some(kv._2))}")
    assert(got.values.map(_._1).sum == td, "bands do not conserve docs")
    assert(got.contains("x1") && got.size >= 2,
      "corpus lacks band diversity: vacuous")
  }

  test("q138 incremental verdicts derive exactly from the full q41 pair set") {
    val got = operators.Dedup.q138(spark, sf).collect()
      .map(r => r.getLong(0) -> ((r.getString(1),
        if (r.isNullAt(2)) None else Some(r.getLong(2)),
        if (r.isNullAt(3)) None else Some(r.getDouble(3))))).toMap
    def isNew(id: Long) = id % operators.Dedup.NewDen == operators.Dedup.NewMod
    val pairs = operators.Dedup.q41(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val byDoc = (pairs.map(p => (p._1, p._2, p._3)) ++ pairs.map(p => (p._2, p._1, p._3)))
      .groupBy(_._1)
    val newIds = Tables(spark, sf, "documents").select("doc_id").collect()
      .map(_.getLong(0)).filter(isNew)
    val want = newIds.map { a =>
      val ps = byDoc.getOrElse(a, Array.empty).map(p => (p._2, p._3))
      val old = ps.filter(p => !isNew(p._1)).sortBy(_._1).headOption
      val inb = ps.filter(p => isNew(p._1) && p._1 < a).sortBy(_._1).headOption
      val verdict =
        if (old.isDefined) "dup_of_corpus" else if (inb.isDefined) "dup_in_batch" else "novel"
      a -> ((verdict, old.orElse(inb).map(_._1), old.orElse(inb).map(_._2)))
    }.toMap
    assert(got == want, s"first diff: ${got.find(kv => want.get(kv._1) != Some(kv._2))}")
    assert(got.nonEmpty && got.values.exists(_._1 != "novel"),
      "synthetic corpus should produce at least one duplicate verdict")
  }

  test("q145 index health report equals a local shingle-df recompute") {
    val r = operators.Dedup.q145(spark, sf).collect()
    assert(r.length == 1)
    val texts = Tables(spark, sf, "documents").select("text").collect().map(_.getString(0))
    val dfs = texts.flatMap { t =>
      val tk = t.split(" ", -1).filter(_.nonEmpty)
      tk.sliding(3).filter(_.length == 3).map(_.mkString(" ")).toSet
    }.groupBy(identity).map(_._2.size.toLong).toSeq
    val cap = operators.Dedup.DfCap
    val n = dfs.length.toLong
    val sorted = dfs.sorted
    def disc(p: Long): Long = sorted(((n * p + 99L) / 100L).toInt - 1)
    assert(r(0).getLong(0) == n)
    assert(r(0).getLong(1) == dfs.sum)
    assert(r(0).getLong(2) == dfs.count(_ > cap).toLong)
    assert(r(0).getLong(3) == dfs.count(_ > cap).toLong * 1000000L / n)
    assert(r(0).getLong(4) == dfs.filter(_ > cap).sum)
    assert(r(0).getLong(5) == disc(50) && r(0).getLong(6) == disc(90))
    assert(r(0).getLong(7) == sorted.last)
  }

  test("q146 jaccard bands equal a brute-force local recompute and nest with q41") {
    val got = operators.Dedup.q146(spark, sf).collect()
      .map(r => r.getInt(0) -> ((r.getDouble(1), r.getLong(2), r.getLong(3)))).toMap
    val texts = Tables(spark, sf, "documents").select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1))
    val sets = texts.map { case (id, t) =>
      val tk = t.split(" ", -1).filter(_.nonEmpty)
      id -> tk.sliding(3).filter(_.length == 3).map(_.mkString(" ")).toSet
    }.toMap
    val df = sets.values.flatten.groupBy(identity).map { case (g, xs) => g -> xs.size }
    val capped = sets.map { case (id, ss) =>
      id -> ss.filter(df(_) <= operators.Dedup.DfCap)
    }
    val ids = capped.keys.toSeq.sorted
    val bands = (for {
      i <- ids.indices.iterator; j <- (i + 1) until ids.length
      sa = capped(ids(i)); sb = capped(ids(j))
      c = (sa & sb).size if c > 0
    } yield {
      val jacc = c * 1.0 / (sa.size + sb.size - c)
      math.min(math.floor(jacc * 10.0).toInt, 9)
    }).toSeq
    val want = bands.groupBy(identity).map { case (b, xs) =>
      b -> ((b / 10.0, xs.size.toLong, bands.count(_ >= b).toLong))
    }
    assert(got == want, s"first diff: ${got.find(kv => want.get(kv._1) != Some(kv._2))}")
    // the 0.6 gate reads straight off the curve: pairs in bands >= 6
    // == q41's pair count (floor(j*10) >= 6 <=> the same j >= 0.6)
    val ge6 = got.collect { case (b, (_, n, _)) if b >= 6 => n }.sum
    assert(ge6 == operators.Dedup.q41(spark, sf).count())
  }

  test("q151 LSH diagnostics equal a local bucket recompute with the shared geometry") {
    val got = operators.Dedup.q151(spark, sf).collect()
      .map(r => r.getInt(0) -> ((r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))))
      .toMap
    val vecs = Tables(spark, sf, "embeddings").select("vec_id", "embedding").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray)
    val n = vecs.length.toLong
    val (bits, bands) = operators.Dedup.ndGeometry(n)
    val planes = operators.Dedup.ndPlanesFor(bits, bands)
    val keys = vecs.flatMap { case (id, v) =>
      val ks = operators.Dedup.ndBandKeysG(planes, v, bits, bands)
      ks.zipWithIndex.map { case (k, band) => (band, k, id) }
    }
    val uniform = math.floor(n.toDouble * n.toDouble / math.pow(2.0, bits + 1)).toLong
    val want = keys.groupBy(_._1).map { case (band, rows) =>
      val sizes = rows.groupBy(_._2).map(_._2.length.toLong)
      band -> ((sizes.size.toLong, sizes.max, sizes.map(s => s * (s - 1) / 2).sum, uniform))
    }
    assert(got.size == bands)
    assert(got == want, s"first diff: ${got.find(kv => want.get(kv._1) != Some(kv._2))}")
    // every vector keys into every band: bucket sizes per band sum to n
    assert(want.values.forall(_._1 <= n))
  }

  test("q144 dedup eval: precision 1.0 by construction, counts match a recount") {
    val r = operators.Dedup.q144(spark, sf).collect()
    assert(r.length == 1 && r(0).getString(0) == "minhash_lsh")
    val (nTruth, nFound, nMatched) = (r(0).getLong(1), r(0).getLong(2), r(0).getLong(3))
    // q42 verifies exact Jaccard on candidates: everything it emits
    // is a true pair, so precision must be exactly 1.0
    assert(nMatched == nFound && r(0).getLong(5) == 1000000L)
    val truth = operators.Dedup.q41(spark, sf).select("d1", "d2").collect()
      .map(x => (x.getLong(0), x.getLong(1))).toSet
    val found = operators.Dedup.q42(spark, sf).select("d1", "d2").collect()
      .map(x => (x.getLong(0), x.getLong(1))).toSet
    assert(nTruth == truth.size && nFound == found.size)
    assert(nMatched == found.count(truth))
    assert(r(0).getLong(4) == nMatched * 1000000L / nTruth)
  }

  test("q164 soft-dedup weights equal an exact recompute and conserve cluster mass") {
    val labels = operators.Dedup.q65(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getLong(1))
    val size = labels.groupBy(_._2).view.mapValues(_.length.toLong).toMap
    val want = labels.map { case (d, c) =>
      (d, c, size(c), 1000000L / size(c))
    }.toSet
    val got = operators.Dedup.q164(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    assert(got == want, s"weight mismatch: ${(got -- want).take(3)} / ${(want -- got).take(3)}")
    // expected-mass conservation: per-cluster weights sum to 1e6 up
    // to integer truncation (< cluster_size ppm); singletons exact
    val byCluster = got.groupBy(_._2)
    assert(byCluster.forall { case (_, rows) =>
      val s = rows.toSeq.map(_._4).sum
      val n = rows.head._3
      s <= 1000000L && s > 1000000L - n
    })
    assert(got.filter(_._3 == 1L).forall(_._4 == 1000000L))
    // at least one multi-doc cluster exercises the truncation path
    assert(got.exists(_._3 > 1L), "corpus has no near-dup cluster")
  }

  test("q165 soft-dedup sample equals the integer coin test over q164's weights") {
    val weights = operators.Dedup.q164(spark, sf).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    val buckets = Tables(spark, sf, "documents")
      .select(org.apache.spark.sql.functions.col("doc_id"),
        org.apache.spark.sql.functions.expr(operators.Sampling.BucketExpr).as("b"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val want = weights.collect {
      case (d, (c, n, w)) if buckets(d) * 1000L < w => (d, c, n, w, buckets(d))
    }.toSet
    val got = operators.Dedup.q165(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toSet
    assert(got == want,
      s"sample mismatch: ${(got -- want).take(3)} / ${(want -- got).take(3)}")
    // every singleton survives (weight 1e6 beats any bucket), and at
    // least one clustered doc was dropped (the coin genuinely bites)
    val singles = weights.collect { case (d, (_, 1L, _)) => d }.toSet
    assert(singles.subsetOf(got.map(_._1)))
    assert(got.size < weights.size, "sampler kept everything — coin never bit")
  }

  test("q167 effective corpus equals an exact BigInt recompute over q164 weights") {
    import org.apache.spark.sql.functions.col
    // q164 covers only clustered (edge) docs; q167 defaults the rest
    // to singleton weight 1e6 — mirror that here.
    val w = operators.Dedup.q164(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getLong(3)).toMap
    val docs = Tables(spark, sf, "documents")
      .select(col("doc_id"), col("source"), col("text")).collect()
      .map(r => (r.getLong(0), r.getString(1),
        r.getString(2).split(' ').count(_.nonEmpty).toLong))
    val want = docs.groupBy(_._2).map { case (src, rows) =>
      val raw = rows.map(_._3).sum
      val wtok = rows.map { case (d, _, n) =>
        BigInt(n) * BigInt(w.getOrElse(d, 1000000L))
      }.sum
      (src, rows.length.toLong, raw,
        (wtok / 1000000).toLong, (wtok / raw).toLong)
    }.toSet
    val got = operators.Dedup.q167(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).toSet
    assert(got == want,
      s"effective-corpus mismatch: ${(got -- want).take(3)} / ${(want -- got).take(3)}")
    // a corpus with near-dup clusters must deflate somewhere: at
    // least one source strictly below 1e6 ppm, none above
    assert(got.forall(_._5 <= 1000000L))
    assert(got.exists(_._5 < 1000000L), "no source deflated — weights never bit")
  }
}
