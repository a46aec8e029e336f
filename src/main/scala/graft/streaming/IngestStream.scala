package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

import graft.sources.AnnIndex

/** ONLINE INDEX INGESTION — the maintenance loop's streaming face,
  * closing the circle with [[ProbeStream]] (serving) and
  * [[graft.sources.AnnIndex]] (storage): each micro-batch of new
  * vectors is gated by MEASURED geometry before it may touch the
  * index.
  *
  *  - PASS (batch mean quantization error ≤ [[AnnIndex.RefitRatio]] ×
  *    the residents' own): the batch lands in the DELTA area via
  *    [[AnnIndex.appendDelta]] — `delta/batch=<id>/cid=…` dynamic
  *    overwrite, so a replayed trigger rewrites exactly its own
  *    partition (idempotent; plain append would double-count a
  *    crashed commit). [[AnnIndex.probeWithDelta]] serves base+delta;
  *    [[AnnIndex.compactDelta]] periodically folds the delta down.
  *  - FAIL (drifted batch — new domain, new embedding model): the
  *    batch is PARKED under `quarantine/batch=<id>` (same idempotent
  *    layout) for the next full rebuild; appending it would degrade
  *    probe recall for every query until then.
  *
  * The index side of the gate moment is precomputed ONCE at sink
  * start (it is constant between compactions), so per-trigger cost
  * is one map pass over the batch — no resident rescan per trigger
  * (the one-shot [[AnnIndex.refitGate]] rescans because it has no
  * lifecycle to amortize over). Decision comparison is exact BigInt
  * cross-multiplication, mirroring the gate's DECIMAL form.
  *
  * StreamingSpec proves: same-geometry batches land in the delta
  * with frozen-quantizer placement and become immediately probeable
  * (planted twins at cosine 1.0), a shifted batch is parked, replay
  * of a dropped commit leaves both areas identical, and compaction
  * preserves probe results row-for-row.
  */
object IngestStream {

  /** Start the gated ingestion sink: `vectors` is a streaming frame
    * with (vec_id long, embedding array<float>) rows. Every non-empty
    * trigger also appends one row to the DECISION LOG at `logPath`
    * (batch, n_rows, err-moment micro-sums both sides, refit) —
    * batch-partitioned dynamic overwrite like the data sinks, so the
    * operator of the index can audit WHY a batch was parked without
    * reconstructing the gate; a replayed trigger rewrites its own
    * log row. */
  def ingestSink(vectors: DataFrame, basePath: String, deltaPath: String,
      quarantinePath: String, logPath: String, cents: Array[Array[Double]],
      checkpoint: String): StreamingQuery = {
    // resident geometry: constant between compactions, priced once
    lazy val idxStats = AnnIndex.errStatsU(vectors.sparkSession,
      vectors.sparkSession.read.parquet(basePath)
        .select(col("vec_id"), col("ed").as("embedding")), cents)
    vectors.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, id: Long) =>
        val s = batch.sparkSession
        val b = batch.select("vec_id", "embedding").localCheckpoint()
        if (b.count() > 0) {
          val (eIdx, nIdx) = idxStats
          val (eB, nB) = AnnIndex.errStatsU(s, b, cents)
          // the SAME exact rational as the one-shot gate's DECIMAL
          // form (AnnIndex.refitCmp) — RefitNum/RefitDen BigInt
          // cross-multiply, no double product to truncate; the two
          // gates the docs call mirrors cannot disagree on a
          // boundary batch
          val refit = nIdx > 0 && AnnIndex.refitExceeds(eB, nB, eIdx, nIdx)
          if (refit)
            b.withColumn("batch", lit(id))
              .write.mode("overwrite").partitionBy("batch")
              .option("partitionOverwriteMode", "dynamic")
              .parquet(quarantinePath)
          else
            AnnIndex.appendDelta(s, deltaPath, cents, b, id)
          import s.implicits._
          Seq((id, nB, eB, nIdx, eIdx, refit))
            .toDF("batch", "n_rows", "err_u_batch", "n_index", "err_u_index", "refit")
            .write.mode("overwrite").partitionBy("batch")
            .option("partitionOverwriteMode", "dynamic")
            .parquet(logPath)
        }
        ()
      }
      .start()
  }
}
