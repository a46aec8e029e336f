package graft

import org.apache.spark.sql.functions._

import graft.sources.{AnnIndex, Maintenance}

/** ANN SERVING UNDER DRIFT (SURVEY §4.2) — the measured answer to
  * "what happens to recall when the ingested/served distribution
  * walks away from the quantizer, and does the refit gate trip
  * BEFORE recall quietly rots?" The harness:
  *
  *  1. builds the persisted IVF index from a GenData corpus's
  *     embeddings (clusterW = 0.3, the fitted geometry);
  *  2. streams a clusterW SWEEP through the gated ingest sink
  *     ([[graft.streaming.IngestStream]]) — one spooled chunk per
  *     micro-batch, each chunk's cluster mass stepping 0.30 → 0.00
  *     (GenData's vector family with offset ids, so the drift knob
  *     is the generator's own);
  *  3. after every trigger, measures recall@k of the SERVING-
  *     nprobe probe against the exact probe (nprobe = all cells —
  *     same scorer, zero approximation) for that chunk's own query
  *     vectors: queries drift WITH the corpus, the serving-under-
  *     drift story;
  *  4. after the sweep, runs [[Maintenance.maintainAnn]] — the
  *     tripped gate's parked batches are exactly the refit corpus —
  *     and re-measures the most-drifted chunk's recall on the new
  *     root.
  *
  * Prints one JSON line: per-chunk (clusterW, gate verdict, admitted
  * rows, recall), the trip point, and pre/post-refit recall for the
  * final drift step. MaintenanceSpec carries the deterministic
  * recall-recovers assertion; this is the scale datapoint.
  *
  * Usage: runMain graft.DriftBench [embDir] [chunkSize] [nprobe]
  *   embDir default /tmp/stress_x100 (200k vectors).
  */
object DriftBench {

  /** GenData's embedding formula with a caller-set cluster weight
    * and id offset — the drift chunk generator. With the default
    * `centSeed` the drifted vectors share the base corpus's cluster
    * IDENTITIES and only the mass moves (the sweep's knob);
    * MaintenanceSpec passes a different seed family for the
    * new-DOMAIN drift class (new embedding model / new corpus — the
    * quarantine-then-refit story). */
  private[graft] def driftChunk(s: org.apache.spark.sql.SparkSession,
      n: Int, idBase: Long, w: Double, centSeed: Long = 1000L,
      noise: Double = 0.25): org.apache.spark.sql.DataFrame = {
    import s.implicits._
    val dim = 64
    s.range(n.toLong).map { jid =>
      val id: Long = idBase + jid
      def gauss(seed: Long) = {
        val r = new scala.util.Random(seed * 0x9e3779b97f4a7c15L + 3)
        Array.fill(dim)(r.nextGaussian())
      }
      val label = (id % 10).toInt
      val cent = gauss(centSeed + label)
      val nz = gauss(7000 + id)
      (id, Array.tabulate(dim)(i => (w * cent(i) + noise * nz(i)).toFloat).toSeq)
    }.toDF("vec_id", "embedding")
  }

  /** recall@k of the serving probe vs the exact probe (nprobe = all
    * cells) over the same root(s) — cell-geometry recall, the number
    * the quantizer owns. */
  private[graft] def recallOf(s: org.apache.spark.sql.SparkSession, basePath: String,
      deltaPath: Option[String], cents: Array[Array[Double]],
      queries: Array[(Long, Array[Float])], nprobe: Int, k: Int): Double =
    AnnIndex.recallStats(s, basePath, deltaPath, cents, queries, nprobe, k)._3

  def main(args: Array[String]): Unit = {
    val dir = args.lift(0).getOrElse("/tmp/stress_x100")
    val chunkSize = args.lift(1).map(_.toInt).getOrElse(5000)
    // nprobe must track cells-per-cluster, not be a constant: this
    // family's exact top-10 are cluster mates spread across the
    // cluster's ~cells/10 sub-cells, so a 2-cell probe of a 448-cell
    // index reads ~4% of the right cluster and recall floors at
    // ~0.15-0.2 EVERYWHERE (measured) — no drift contrast. 16 is
    // ~1/3 of one cluster's cells at x100, the serving point q143's
    // recall gate would pick.
    val nprobe = args.lift(2).map(_.toInt).getOrElse(16)
    val k = 10
    val nQueries = 64
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors.toString).toInt
    val spark = GraftSession.local(cpus)
    val root = java.nio.file.Files.createTempDirectory("graft_drift").toString

    // 1. the fitted base
    val t0 = System.nanoTime()
    val basePath = s"$root/base"
    val cents = AnnIndex.writeFrom(spark, Tables(spark, dir, "embeddings"), basePath)
    val buildSecs = (System.nanoTime() - t0) / 1e9
    val baseN = spark.read.parquet(basePath).count()

    // 2. spool the drift sweep — one file per chunk, modtime order.
    // Chunks 0-6 are the MASS drift (cluster weight stepping toward
    // an unclustered cloud — the gate should hold until the geometry
    // is truly gone); the final chunk is the NEW-DOMAIN class (fresh
    // centroid family at full mass — new embedding model), the one
    // the quarantine-then-refit loop exists for.
    val ws = Array((0.30, 1000L), (0.25, 1000L), (0.20, 1000L), (0.15, 1000L),
      (0.10, 1000L), (0.05, 1000L), (0.0, 1000L), (0.45, 5000L))
    val spool = java.nio.file.Files.createTempDirectory("graft_drift_spool")
    val chunkQs = ws.zipWithIndex.map { case ((w, cs), i) =>
      val ch = driftChunk(spark, chunkSize, 10000000L + i.toLong * 1000000L, w, cs)
        .localCheckpoint(false)
      val tmp = spool.resolve("_tmp").toString
      ch.coalesce(1).write.mode("overwrite").parquet(tmp)
      val part = new java.io.File(tmp).listFiles()
        .filter(_.getName.endsWith(".parquet")).head
      java.nio.file.Files.move(part.toPath, spool.resolve(f"chunk$i%05d.parquet"))
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(tmp))
      val qs = ch.limit(nQueries).collect()
        .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray)
      ch.unpersist()
      qs
    }

    // 3. the gated ingest, one chunk per trigger
    val stream = spark.readStream
      .schema("vec_id BIGINT, embedding ARRAY<FLOAT>")
      .option("maxFilesPerTrigger", 1)
      .parquet(spool.toString)
    val (deltaP, quarP, logP) = (s"$root/delta", s"$root/quarantine", s"$root/log")
    val t1 = System.nanoTime()
    // recallEvery = 1: the harness measures EVERY trigger so the
    // per-chunk rows below show exactly when each gate first trips
    // (production samples sparser — the default cadence)
    val q = streaming.IngestStream.ingestSink(stream, basePath, deltaP, quarP,
      logP, cents, s"$root/ckpt", recallEvery = 1, recallNprobe = nprobe,
      recallK = k)
    q.processAllAvailable()
    val ingestSecs = (System.nanoTime() - t1) / 1e9
    q.stop()

    // per-trigger verdicts, in admission (= batch id = drift) order;
    // batch is a PARTITION column — read-side inference types it int,
    // so cast before getLong
    val log = spark.read.parquet(logP)
      .select(col("batch").cast("long"), col("n_rows"), col("refit"),
        col("recall_ppm"), col("recall_refit")).collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getBoolean(2), r.getLong(3), r.getBoolean(4)))).toMap

    // 4. per-chunk serving recall AFTER the full sweep (base + every
    // admitted batch resident — the steady state a serving tier
    // sees), next to the AT-TRIGGER gate verdicts: `gate_ppm` is the
    // recall the sampled gate measured the moment the chunk landed
    val rows = ws.indices.map { i =>
      val rec = recallOf(spark, basePath, Some(deltaP), cents, chunkQs(i), nprobe, k)
      val (nRows, refit, gatePpm, recRefit) =
        log.getOrElse(i.toLong, (0L, false, -1L, false))
      f"""{"chunk":$i,"cluster_w":${ws(i)._1}%.2f,"cent_seed":${ws(i)._2},""" +
        f""""rows":$nRows,"refit":$refit,"gate_ppm":$gatePpm,""" +
        f""""recall_refit":$recRefit,"recall":$rec%.3f}"""
    }
    def firstTrip(sel: ((Long, Boolean, Long, Boolean)) => Boolean): Long =
      ws.indices.map(_.toLong).find(i => log.get(i).exists(sel)).getOrElse(-1L)
    val mseTrip = firstTrip(_._2)
    val recTrip = firstTrip(_._4)

    // 5. the reconcile: refit-rebuild over base + delta + quarantine,
    // then the most-drifted chunk's recall on the new root
    val lastQ = chunkQs.last
    val preRefit = recallOf(spark, basePath, Some(deltaP), cents, lastQ, nprobe, k)
    val t2 = System.nanoTime()
    val (verdict, newCents) = Maintenance.maintainAnn(spark, basePath, deltaP,
      quarP, logP, s"$root/rebuilt")
    val refitSecs = (System.nanoTime() - t2) / 1e9
    val postRefit = newCents match {
      case Some(nc) => recallOf(spark, s"$root/rebuilt", None, nc, lastQ, nprobe, k)
      case None => -1.0
    }

    println(
      s"""{"pipeline":"ann_drift","base_vecs":$baseN,"cells":${cents.length},""" +
        f""""build_secs":$buildSecs%.1f,"chunk_rows":$chunkSize,"nprobe":$nprobe,"k":$k,""" +
        f""""ingest_secs":$ingestSecs%.1f,"chunks":[${rows.mkString(",")}],""" +
        s""""first_mse_trip":$mseTrip,"first_recall_trip":$recTrip,""" +
        s""""maintenance":"${verdict.action}","trips":${verdict.trips},""" +
        f""""refit_secs":$refitSecs%.1f,"drifted_recall_pre":$preRefit%.3f,""" +
        f""""drifted_recall_post":$postRefit%.3f}""")
    spark.stop()
  }
}
