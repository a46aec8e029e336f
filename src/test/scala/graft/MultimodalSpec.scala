package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

class MultimodalSpec extends AnyFunSuite {
  import TestSpark.{spark, sf}

  test("q73 features match a brute-force recomputation incl. edge payloads") {
    import spark.implicits._
    // corpus payloads + synthetic edges: empty, 1 byte, 15 bytes
    // (shorter than the thumbnail grid), all-identical bytes, and
    // a high-bit byte (signed-byte trap)
    val edges = Seq(
      900L -> Array.empty[Byte],
      901L -> Array[Byte](7),
      902L -> Array.tabulate(15)(i => (i * 17).toByte),
      903L -> Array.fill(64)(42.toByte),
      904L -> Array[Byte](0x90.toByte, 0x05, 0x90.toByte))
    val corpus = Tables(spark, sf, "documents")
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1).getBytes("UTF-8")).toSeq
    val all = corpus ++ edges
    val got = operators.Multimodal.featuresDs(all.toDS()).collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(got.size == all.size)
    all.foreach { case (id, b) =>
      val n = b.length
      val ub = b.map(_ & 0xff)
      val counts = ub.groupBy(identity).view.mapValues(_.length.toLong).toMap
      val nd = counts.size
      val (mb, mc) =
        if (n == 0) (-1, 0L)
        else counts.toSeq.map { case (v, c) => (-c, v) }.min match { case (nc, v) => (v, -nc) }
      val thumb = (0 until 16).map { j =>
        val lo = j * n / 16; val hi = (j + 1) * n / 16
        if (hi > lo) ub.slice(lo, hi).map(_.toLong).sum / (hi - lo) else 0L
      }.mkString(",")
      val samp = (0 until 8).map(j => if (n > 0) ub(j * n / 8).toLong else 0L).mkString(",")
      val r = got(id)
      assert(r.getLong(1) == n.toLong, s"$id n_bytes")
      assert(r.getInt(2) == nd, s"$id n_distinct")
      assert(r.getInt(3) == mb && r.getLong(4) == mc, s"$id mode")
      assert(r.getString(5) == thumb, s"$id thumb16")
      assert(r.getString(6) == samp, s"$id sample8")
    }
  }

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

  // --- genuine byte-level header parsing, through the same
  // mapPartitions plumbing q70 uses ---

  private def pngBytes(w: Int, h: Int): Array[Byte] = {
    val sig = Array(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte)
    val ihdr = Array[Byte](0, 0, 0, 13, 'I', 'H', 'D', 'R',
      (w >> 24).toByte, (w >> 16).toByte, (w >> 8).toByte, w.toByte,
      (h >> 24).toByte, (h >> 16).toByte, (h >> 8).toByte, h.toByte,
      8, 6, 0, 0, 0) // bit depth, color type, compression, filter, interlace
    sig ++ ihdr
  }

  private def wavBytes(sampleRate: Int, channels: Int,
      preChunks: Seq[(String, Int)] = Nil): Array[Byte] = {
    // RIFF <size> WAVE, optional leading chunks (JUNK/LIST/...), then
    // the fmt chunk: id+size, format le16, channels le16 @+2 of the
    // payload, sample rate le32 @+4
    val riff = "RIFF".getBytes ++ Array[Byte](36, 0, 0, 0) ++ "WAVE".getBytes
    val pre = preChunks.flatMap { case (id, size) =>
      id.getBytes ++ Array[Byte](size.toByte, (size >> 8).toByte,
        (size >> 16).toByte, (size >> 24).toByte) ++
        Array.fill[Byte](size + (size & 1))(0x6a) // word-aligned padding
    }
    val fmt = "fmt ".getBytes ++ Array[Byte](16, 0, 0, 0, 1, 0,
      channels.toByte, (channels >> 8).toByte,
      sampleRate.toByte, (sampleRate >> 8).toByte,
      (sampleRate >> 16).toByte, (sampleRate >> 24).toByte)
    riff ++ pre ++ fmt
  }

  private def jpegBytes(w: Int, h: Int, withApp0: Boolean): Array[Byte] = {
    val soi = Array(0xff, 0xd8).map(_.toByte)
    val app0 =
      if (withApp0)
        Array(0xff, 0xe0, 0, 16).map(_.toByte) ++
          "JFIF".getBytes ++ Array[Byte](0, 1, 1, 0, 0, 1, 0, 1, 0, 0)
      else Array.empty[Byte]
    // SOF0: marker, len=17, precision 8, height be16, width be16, 3 components
    val sof = Array(0xff, 0xc0, 0, 17, 8).map(_.toByte) ++
      Array((h >> 8).toByte, h.toByte, (w >> 8).toByte, w.toByte) ++
      Array[Byte](3, 1, 0x22, 0, 2, 0x11, 1, 3, 0x11, 1)
    soi ++ app0 ++ sof
  }

  test("q70 decode parses real PNG IHDR and JPEG SOF dimensions") {
    import spark.implicits._
    val payloads: Seq[(Long, Array[Byte])] = Seq(
      1L -> pngBytes(1920, 1080),
      2L -> jpegBytes(640, 480, withApp0 = true),
      3L -> jpegBytes(12000, 9000, withApp0 = false), // SOF directly after SOI
      4L -> pngBytes(1, 1),
      5L -> "plain ascii text".getBytes, // stub path
      6L -> pngBytes(800, 600).take(20), // truncated PNG -> stub
      7L -> jpegBytes(640, 480, withApp0 = true).take(6), // truncated JPEG -> stub
      8L -> Array.empty[Byte], // empty -> stub sentinel
      9L -> wavBytes(44100, 2),
      10L -> wavBytes(16000, 1),
      11L -> wavBytes(44100, 2).take(12), // truncated WAV -> stub
      // spec-valid WAVs whose fmt chunk is NOT at offset 12: the
      // chunk walk must skip JUNK/LIST (incl. odd-size + pad byte)
      12L -> wavBytes(48000, 6, Seq("JUNK" -> 28)),
      13L -> wavBytes(22050, 1, Seq("JUNK" -> 7, "LIST" -> 12)))
    val out = operators.Multimodal.decodeDs(payloads.toDS())
      .collect().map(m => m.getLong(0) -> m).toMap
    def check(id: Long, fmt: String, w: Long, h: Long): Unit = {
      assert(out(id).getString(3) == fmt, s"id=$id format")
      assert(out(id).getLong(4) == w, s"id=$id width")
      assert(out(id).getLong(5) == h, s"id=$id height")
    }
    check(1L, "png", 1920, 1080)
    check(2L, "jpeg", 640, 480)
    check(3L, "jpeg", 12000, 9000)
    check(4L, "png", 1, 1)
    // audio: (width, height) carry (sample_rate, n_channels)
    check(9L, "wav", 44100, 2)
    check(10L, "wav", 16000, 1)
    check(12L, "wav", 48000, 6)
    check(13L, "wav", 22050, 1)
    assert(Set("jpeg", "png", "wav").contains(out(11L).getString(3)))
    assert(out(8L).getString(3) == "empty")
    // stub fallbacks classify by first-byte arithmetic, not headers
    assert(Set("jpeg", "png", "wav").contains(out(5L).getString(3)))
    assert(Set("jpeg", "png", "wav").contains(out(6L).getString(3)))
    assert(Set("jpeg", "png", "wav").contains(out(7L).getString(3)))
    // n_bytes/byte_sum are computed from raw bytes on every path
    assert(out(1L).getLong(1) == pngBytes(1920, 1080).length.toLong)
    assert(out(8L).getLong(1) == 0L)
  }

  test("q155 planted twins under real PNG headers: exhaustive hamming recall, no non-images") {
    import spark.implicits._
    import operators.Multimodal.{phash64, PhashHam}
    // 40 synthetic "images": real PNG header + 2048 deterministic
    // pseudo-random body bytes; ids 1000+i are twins of i<20 with 3
    // byte flips (cells are 32-byte means, so a flip moves a cell by
    // <=8 gray levels — hamming stays small but NOT provably 0, so
    // the assertions below compute it rather than assume it).
    def body(seed: Long): Array[Byte] = {
      val r = new scala.util.Random(seed)
      Array.fill(2048)(r.nextInt(256).toByte)
    }
    val bases = (0L until 40L).map(i => i -> (pngBytes(640, 480) ++ body(i)))
    val twins = (0L until 20L).map { i =>
      val b = (pngBytes(640, 480) ++ body(i)).clone()
      val r = new scala.util.Random(7 * i + 3)
      (0 until 3).foreach(_ => b(33 + r.nextInt(b.length - 33)) =
        r.nextInt(256).toByte)
      (1000L + i) -> b
    }
    // and 5 WAV payloads that must never enter the image join
    val wavs = (2000L until 2005L).map(i => i -> wavBytes(44100, 2))
    val all = (bases ++ twins ++ wavs).toSeq
    val got = operators.Multimodal.q155Of(
        spark.createDataset(all).repartition(8))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // local exact reference over the image subset only
    val hashes = (bases ++ twins).map { case (id, b) => id -> phash64(b) }
    val want = (for {
      (i1, h1) <- hashes; (i2, h2) <- hashes if i1 < i2
      if java.lang.Long.bitCount(h1 ^ h2) <= PhashHam
    } yield (i1, i2)).toSet
    assert(got == want, s"extra=${got -- want} missing=${want -- got}")
    // the planted twins are actually near in phash space (the test
    // would be vacuous if the distortion blew past the cutoff)
    val twinPairs = (0L until 20L).map(i => (i, 1000L + i)).toSet
    assert(twinPairs.subsetOf(want),
      s"planted twins drifted past hamming $PhashHam: ${twinPairs -- want}")
    assert(got.forall { case (a, b) => a < 2000L && b < 2000L },
      "a non-image payload leaked into the image near-dup join")
  }

  /** Union-find over undirected pairs → node -> min-id component
    * label, the q171 exact reference. */
  private def unionFind(nodes: Seq[Long], pairs: Seq[(Long, Long)]): Map[Long, Long] = {
    val parent = scala.collection.mutable.Map(nodes.map(n => n -> n): _*)
    def find(x: Long): Long = { var r = x; while (parent(r) != r) r = parent(r); r }
    pairs.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    // path-compress to the min id (parent always points to smaller)
    nodes.map(n => n -> find(n)).toMap
  }

  test("q171 image families equal a union-find over q155's pairs") {
    val imgIds = operators.Multimodal.q70(spark, sf)
      .filter(org.apache.spark.sql.functions.col("format").isin("png", "jpeg"))
      .select("doc_id").collect().map(_.getLong(0)).toSeq
    val pairs = operators.Multimodal.q155(spark, sf)
      .select("d1", "d2").collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    val lab = unionFind(imgIds, pairs)
    val bySize = lab.values.groupBy(identity).map { case (f, xs) => f -> xs.size.toLong }
    val want = imgIds.map { id =>
      val f = lab(id)
      (id, f, bySize(f), id == f || lab.collect { case (d, `f`) => d }.min == id)
    }.toSet
    val got = operators.Multimodal.q171(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getBoolean(3))).toSet
    assert(got == want,
      s"family mismatch: extra=${(got -- want).take(3)} missing=${(want -- got).take(3)}")
    // exactly one canonical per family, and it is the min doc_id
    val canon = got.filter(_._4).map(x => x._2 -> x._1).toMap
    assert(canon.size == got.map(_._2).size)
    assert(canon.forall { case (f, d) => f == d })
  }

  test("q171 closes a planted twin CHAIN into one family under real PNG headers") {
    import spark.implicits._
    import operators.Multimodal.{phash64, PhashHam}
    def body(seed: Long): Array[Byte] = {
      val r = new scala.util.Random(seed)
      Array.fill(2048)(r.nextInt(256).toByte)
    }
    def flipped(b: Array[Byte], seed: Long): Array[Byte] = {
      val c = b.clone(); val r = new scala.util.Random(seed)
      (0 until 3).foreach(_ => c(33 + r.nextInt(c.length - 33)) = r.nextInt(256).toByte)
      c
    }
    // generation chain per base i<10: i -> 1000+i -> 2000+i (each a
    // re-flip of the PREVIOUS — the re-encode-of-a-re-encode shape
    // that only closes into one family through the component step)
    val bases = (0L until 30L).map(i => i -> (pngBytes(320, 200) ++ body(i)))
    val gen1 = (0L until 10L).map(i => (1000L + i) -> flipped(bases(i.toInt)._2, 11 * i + 1))
    val gen2 = (0L until 10L).map(i => (2000L + i) -> flipped(gen1(i.toInt)._2, 13 * i + 5))
    val all = (bases ++ gen1 ++ gen2).toSeq
    val ds = spark.createDataset(all).repartition(8)
    // exact reference: union-find over the exhaustive hamming graph
    val hashes = all.map { case (id, b) => id -> phash64(b) }
    val pairs = for {
      (i1, h1) <- hashes; (i2, h2) <- hashes
      if i1 < i2 && java.lang.Long.bitCount(h1 ^ h2) <= PhashHam
    } yield (i1, i2)
    val lab = unionFind(all.map(_._1), pairs)
    val got = operators.Multimodal.q171Of(ds).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == lab, s"first diff: ${got.find(kv => lab.get(kv._1) != Some(kv._2))}")
    // the chains actually chained: at least one family of size >= 3
    // (vacuous-test guard — the flips must not blow past the cutoff)
    val sizes = lab.values.groupBy(identity).map(_._2.size)
    assert(sizes.max >= 3, s"no chained family formed: sizes ${sizes.toSeq.sorted.reverse.take(5)}")
  }

  test("scoped q155/q171: per-scope equality and the cross-scope contract") {
    import spark.implicits._
    import operators.Multimodal.{phash64, PhashHam}
    def body(seed: Long): Array[Byte] = {
      val r = new scala.util.Random(seed)
      Array.fill(2048)(r.nextInt(256).toByte)
    }
    def flipped(b: Array[Byte], seed: Long): Array[Byte] = {
      val c = b.clone(); val r = new scala.util.Random(seed)
      (0 until 3).foreach(_ => c(33 + r.nextInt(c.length - 33)) = r.nextInt(256).toByte)
      c
    }
    // bases land in scope 0, their twins in scope 1 (doc_id div 1000)
    // — every planted twin pair is CROSS-scope, the exclusion class
    val bases = (0L until 20L).map(i => i -> (pngBytes(320, 200) ++ body(900 + i)))
    val twins = (0L until 10L).map(i => (1000L + i) -> flipped(bases(i.toInt)._2, 17 * i + 2))
    val all = (bases ++ twins).toSeq
    val ds = spark.createDataset(all).repartition(8)
    val scope = expr("doc_id div 1000")
    val got = operators.Multimodal.q155Of(ds, Some(scope))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(3))).toSet
    // exact reference: exhaustive hamming pairs WITHIN each scope
    val hashes = all.map { case (id, b) => (id, phash64(b), id / 1000L) }
    val want = (for {
      (i1, h1, s1) <- hashes; (i2, h2, s2) <- hashes
      if i1 < i2 && s1 == s2 && java.lang.Long.bitCount(h1 ^ h2) <= PhashHam
    } yield (i1, i2, s1)).toSet
    assert(got == want, s"extra=${got -- want} missing=${want -- got}")
    // the contract is non-vacuous: unscoped finds the twin pairs,
    // scoped must exclude exactly those (they span scopes)
    val twinPairs = (0L until 10L).map(i => (i, 1000L + i)).toSet
    val unscoped = operators.Multimodal.q155Of(ds)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(twinPairs.subsetOf(unscoped), "planted twins drifted past the cutoff")
    assert(got.forall { case (a, b, _) => !twinPairs.contains((a, b)) },
      "a cross-scope pair leaked through the scoped join")
    // q171 scoped: families form within scopes — a twin family keeps
    // one canonical PER SCOPE; labels equal a per-scope union-find
    val gotFam = operators.Multimodal.q171Of(ds, Some(scope)).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getBoolean(3))).toSet
    val wantFam = hashes.groupBy(_._3).toSeq.flatMap { case (_, hs) =>
      val prs = for {
        (i1, h1, _) <- hs; (i2, h2, _) <- hs
        if i1 < i2 && java.lang.Long.bitCount(h1 ^ h2) <= PhashHam
      } yield (i1, i2)
      val lab = unionFind(hs.map(_._1), prs)
      val minOf = lab.toSeq.groupBy(_._2).map { case (f, xs) => f -> xs.map(_._1).min }
      hs.map { case (id, _, _) => (id, lab(id), id == minOf(lab(id))) }
    }.toSet
    assert(gotFam == wantFam,
      s"extra=${(gotFam -- wantFam).take(3)} missing=${(wantFam -- gotFam).take(3)}")
  }

  // --- audio: real PCM synthesis for the q157 family ---

  private def le32b(v: Int) =
    Array[Byte](v.toByte, (v >> 8).toByte, (v >> 16).toByte, (v >> 24).toByte)
  private def le16b(v: Int) = Array[Byte](v.toByte, (v >> 8).toByte)

  /** A COMPLETE 16-bit mono PCM WAV: full 16-byte fmt chunk + data
    * chunk (unlike wavBytes above, which stops at the rate field). */
  private def wavPcm16(samples: Array[Short]): Array[Byte] = {
    val dataLen = samples.length * 2
    "RIFF".getBytes ++ le32b(36 + dataLen) ++ "WAVE".getBytes ++
      "fmt ".getBytes ++ le32b(16) ++ le16b(1) ++ le16b(1) ++
      le32b(8000) ++ le32b(16000) ++ le16b(2) ++ le16b(16) ++
      "data".getBytes ++ le32b(dataLen) ++
      samples.flatMap(s => le16b(s & 0xffff))
  }

  private def pcmBody(seed: Long, n: Int = 4096): Array[Short] = {
    val r = new scala.util.Random(seed)
    Array.fill(n)((r.nextInt(30001) - 15000).toShort)
  }

  test("wavSamples decodes 16-bit and 8-bit PCM to absolute amplitudes") {
    import operators.Multimodal.wavSamples
    val s16 = Array[Short](0, 1, -1, 15000, -15000, Short.MaxValue, Short.MinValue)
    assert(wavSamples(wavPcm16(s16)).get.toSeq ==
      s16.map(v => math.abs(v.toInt)).toSeq)
    // 8-bit: unsigned offset-128
    val data8 = Array[Byte](0, 127.toByte, 128.toByte, 255.toByte)
    val wav8 = "RIFF".getBytes ++ le32b(36 + 4) ++ "WAVE".getBytes ++
      "fmt ".getBytes ++ le32b(16) ++ le16b(1) ++ le16b(1) ++
      le32b(8000) ++ le32b(8000) ++ le16b(1) ++ le16b(8) ++
      "data".getBytes ++ le32b(4) ++ data8
    assert(wavSamples(wav8).get.toSeq == Seq(128, 1, 0, 127))
    // headers the metadata parser accepts but that carry no PCM
    // (no data chunk / truncated fmt) must abandon, not fabricate
    assert(wavSamples(wavBytes(44100, 2)).isEmpty)
    // a data chunk whose declared size overruns the buffer clamps
    val over = wavPcm16(s16)
    assert(wavSamples(over.dropRight(2)).get.length == s16.length - 1)
  }

  test("q157 planted twins under real WAV PCM: exhaustive hamming recall, no non-audio") {
    import spark.implicits._
    import operators.Multimodal.{ehash64, wavSamples, EhashHam}
    // 40 synthetic clips: full WAV header + 4096 deterministic
    // pseudo-random 16-bit samples; ids 1000+i are twins of i<20 with
    // 3 sample rewrites (64-sample envelope windows move by <=470 of
    // a ~7500 typical mean — hamming stays small but NOT provably 0,
    // so the assertions compute it rather than assume it).
    val bases = (0L until 40L).map(i => i -> wavPcm16(pcmBody(i)))
    val twins = (0L until 20L).map { i =>
      val s = pcmBody(i).clone()
      val r = new scala.util.Random(11 * i + 5)
      (0 until 3).foreach(_ => s(r.nextInt(s.length)) =
        (r.nextInt(30001) - 15000).toShort)
      (1000L + i) -> wavPcm16(s)
    }
    // image payloads that must never enter the audio join
    val pngs = (2000L until 2005L).map(i => i -> pngBytes(640, 480))
    val all = (bases ++ twins ++ pngs).toSeq
    val got = operators.Multimodal.q157Of(
        spark.createDataset(all).repartition(8))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // local exact reference over the audio subset, through the same
    // decode path (real PCM, not the byte-signal fallback)
    val hashes = (bases ++ twins).map { case (id, b) =>
      id -> ehash64(wavSamples(b).get)
    }
    val want = (for {
      (i1, h1) <- hashes; (i2, h2) <- hashes if i1 < i2
      if java.lang.Long.bitCount(h1 ^ h2) <= EhashHam
    } yield (i1, i2)).toSet
    assert(got == want, s"extra=${got -- want} missing=${want -- got}")
    val twinPairs = (0L until 20L).map(i => (i, 1000L + i)).toSet
    assert(twinPairs.subsetOf(want),
      s"planted twins drifted past hamming $EhashHam: ${twinPairs -- want}")
    assert(got.forall { case (a, b) => a < 2000L && b < 2000L },
      "a non-audio payload leaked into the audio near-dup join")
  }

  test("q158 modality budget: counts and ppm shares reconcile with the corpus") {
    val rows = operators.Multimodal.q158(spark, sf).collect()
    val nDocs = Tables(spark, sf, "documents").count()
    assert(rows.map(_.getLong(1)).sum == nDocs)
    val ppm = rows.map(_.getLong(5)).sum
    // floor division loses < 1 ppm per group
    assert(ppm <= 1000000L && ppm > 1000000L - rows.length,
      s"bytes_ppm sums to $ppm")
    assert(rows.forall(r => Set("jpeg", "png", "wav", "empty").contains(r.getString(0))))
  }

  test("q156 cross-modal gate: kept == caption_ok AND media_ok, with both flags discriminating") {
    val rows = operators.Multimodal.q156(spark, sf).collect()
    assert(rows.length == Tables(spark, sf, "documents").count())
    assert(rows.forall(r =>
      r.getBoolean(3) == (r.getBoolean(1) && r.getBoolean(2))))
    // non-vacuity at this SF: each flag must actually split the corpus
    assert(rows.exists(_.getBoolean(1)) && rows.exists(!_.getBoolean(1)),
      "caption gate is vacuous at this SF")
    assert(rows.exists(_.getBoolean(2)) && rows.exists(!_.getBoolean(2)),
      "media gate is vacuous at this SF")
  }

  test("GenData media corpus: q155/q157/q171 probe media.parquet end-to-end with exhaustive recall on planted families") {
    import TestSpark.withTmpDir
    import operators.Multimodal
    withTmpDir("mmgen") { root =>
      // 1200 payloads = 400 real PNGs / 400 stub blobs / 400 real WAVs
      // with GenData's planted near-twin + chain + far-variant rules
      GenData.generate(spark, root, 50, 20, None, 0.3, "salad", Some(1200))
      val payloads = spark.read.parquet(s"$root/media.parquet")
        .collect().map(r => r.getLong(0) -> r.getAs[Array[Byte]](1))
      assert(payloads.length == 1200)
      // the REAL decode paths engage: every id%3==0 parses as genuine
      // PNG (planted dims), every id%3==2 as genuine WAV with PCM
      // samples; id%3==1 falls to the stub (jpeg class by first byte)
      val metas = payloads.map { case (id, b) => (id, Multimodal.decode(id, b), b) }
      metas.foreach { case (id, m, b) =>
        if (id % 3 == 0) assert(m.format == "png" && m.width >= 256L && m.height >= 256L,
          s"media $id did not parse as a real PNG: $m")
        else if (id % 3 == 2) {
          assert(m.format == "wav" && m.width >= 8000L, s"media $id did not parse as a real WAV: $m")
          assert(Multimodal.wavSamples(b).exists(_.length >= 4096),
            s"planted WAV $id failed PCM decode")
        } else assert(m.format == "jpeg", s"stub blob $id classified $m")
      }
      // exact truth: phash over the image-classified set (real PNGs +
      // stub jpegs), ehash over decoded |PCM| for the WAVs — the same
      // private primitives the operators use
      val imgH = metas.collect { case (id, m, b)
          if m.format == "png" || m.format == "jpeg" => id -> Multimodal.phash64(b) }
      val wavH = metas.collect { case (id, m, b) if m.format == "wav" =>
        id -> Multimodal.ehash64(Multimodal.wavSamples(b).get) }
      def pairsOf(hs: Array[(Long, Long)], ham: Int) = (for {
        (i1, h1) <- hs; (i2, h2) <- hs if i1 < i2
        if java.lang.Long.bitCount(h1 ^ h2) <= ham
      } yield (i1, i2)).toSet
      val wantImg = pairsOf(imgH, Multimodal.PhashHam)
      val wantWav = pairsOf(wavH, Multimodal.EhashHam)
      // the DIR-level operators route through media.parquet (not the
      // documents table) and recover the exact pair sets
      val gotImg = Multimodal.q155(spark, root).collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      val gotWav = Multimodal.q157(spark, root).collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(gotImg == wantImg,
        s"q155 extra=${(gotImg -- wantImg).take(3)} missing=${(wantImg -- gotImg).take(3)}")
      assert(gotWav == wantWav,
        s"q157 extra=${(gotWav -- wantWav).take(3)} missing=${(wantWav -- gotWav).take(3)}")
      // cross-modal isolation: no WAV id in the image pairs, no image
      // id in the audio pairs
      val wavIds = wavH.map(_._1).toSet
      assert(gotImg.forall { case (a, b) => !wavIds(a) && !wavIds(b) })
      val imgIds = imgH.map(_._1).toSet
      assert(gotWav.forall { case (a, b) => !imgIds(a) && !imgIds(b) })
      // planted-family non-vacuity: the k=3 window re-rolls land a
      // healthy majority of planted twins inside the hamming gate on
      // BOTH modalities (boundary cells can flip a few past it — the
      // exact-truth equality above is the correctness assertion)
      def planted(c: Long) = (0L until 400L).flatMap { g =>
        if (g % 41 == 1 && g > 0) Some((3L * (g - 1) + c, 3L * g + c))
        else if (g % 41 == 2 && g > 1) Some((3L * (g - 2) + c, 3L * g + c))
        else None
      }.toSet
      val (pImg, pWav) = (planted(0L), planted(2L))
      assert(pImg.size >= 15 && pWav.size >= 15)
      assert((pImg & wantImg).size * 2 >= pImg.size,
        s"planted PNG twins mostly blew past hamming: ${(pImg & wantImg).size}/${pImg.size}")
      assert((pWav & wantWav).size * 2 >= pWav.size,
        s"planted WAV twins mostly blew past hamming: ${(pWav & wantWav).size}/${pWav.size}")
      // q171 family formation over the generated corpus == union-find
      // over the exact image pairs (chained g-2/g-1/g plants close
      // into one family through the shared base)
      val lab = unionFind(imgIds.toSeq, wantImg.toSeq)
      val bySize = lab.values.groupBy(identity).map { case (f, xs) => f -> xs.size.toLong }
      val wantFam = imgIds.map { id =>
        val f = lab(id); (id, f, bySize(f), id == f) }.toSet
      val gotFam = Multimodal.q171(spark, root).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getBoolean(3))).toSet
      assert(gotFam == wantFam,
        s"q171 extra=${(gotFam -- wantFam).take(3)} missing=${(wantFam -- gotFam).take(3)}")
      assert(wantFam.exists(_._3 >= 3), "no chained family of size >= 3 formed")
    }
  }
}
