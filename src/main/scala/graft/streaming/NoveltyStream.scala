package graft.streaming

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery
import org.apache.spark.util.sketch.BloomFilter

/** Streaming novelty scoring — the online face of batch q97: each
  * arriving document is scored by the fraction of its distinct
  * 8-grams never seen before ON THE WHOLE STREAM HISTORY, using a
  * driver-held Bloom filter of seen grams as the cross-batch state.
  *
  * State is BOUNDED by construction: the filter's bit array is fixed
  * at [[NoveltyExpected]]/[[NoveltyFpp]] regardless of stream length
  * — the sketch answer to q97's exact min-doc_id table, which grows
  * with the corpus. Semantics per micro-batch:
  *
  *   1. every gram is probed against the PRE-batch filter
  *      (executor-side, broadcast);
  *   2. within the batch, first occurrence is credited EXACTLY
  *      (min doc_id per gram — q97's rule at batch scope);
  *   3. the batch's grams are then folded into the filter (one
  *      executor-built sketch, merged driver-side — mergeInPlace,
  *      never a per-gram driver loop).
  *
  * Error is ONE-SIDED, inherited from the Bloom: a false positive
  * makes a truly-novel gram read "seen", so the estimate can only
  * UNDERCOUNT novelty, by ~n_grams·fpp — never overcount. With
  * doc_id-ordered arrival the estimate equals batch q97 exactly,
  * minus those false positives; StreamingSpec asserts both the
  * one-sided bound and a total-undercount budget.
  */
object NoveltyStream {

  /** Filter sizing: ~2.3 MB of bits at these parameters — the whole
    * cross-batch state. A production stream sizes `expected` to the
    * anticipated distinct-gram volume (the fpp holds only below it;
    * beyond, novelty degrades gracefully toward undercounting). */
  private[graft] val NoveltyExpected = 1000000L
  private[graft] val NoveltyFpp = 1e-4

  /** Stateful scorer: one instance per stream; `scoreBatch` is the
    * foreachBatch body. Not thread-safe — foreachBatch invocations
    * are sequential by contract. */
  final class Scorer(spark: org.apache.spark.sql.SparkSession) {
    private var seen: BloomFilter = BloomFilter.create(NoveltyExpected, NoveltyFpp)

    /** Score one micro-batch of (doc_id, text) rows against the
      * stream history, then absorb its grams. Returns per-doc
      * (doc_id, n_grams, n_novel_est, novelty_est). */
    def scoreBatch(batch: DataFrame): Array[Row] = {
      import batch.sparkSession.implicits._
      val bc = batch.sparkSession.sparkContext.broadcast(seen)
      val dg = batch
        .withColumn("tk", expr(graft.operators.Dedup.tokensExpr))
        .select(col("doc_id"), explode(expr(graft.operators.Sampling.gramExpr)).as("g"))
        .localCheckpoint(false) // consumed 3x below: probe, first-in-batch, absorb
      val probed = dg.as[(Long, String)]
        .mapPartitions { it =>
          val f = bc.value
          it.map { case (id, g) => (id, g, !f.mightContainString(g)) }
        }.toDF("doc_id", "g", "unseen_pre")
      val firsts = dg.groupBy("g").agg(min("doc_id").as("first_doc"))
      val out = probed.join(firsts, "g")
        .groupBy("doc_id")
        .agg(count(lit(1)).as("n_grams"),
          sum(when(col("unseen_pre") && col("first_doc") === col("doc_id"), 1L)
            .otherwise(0L)).as("n_novel_est"))
        .select(col("doc_id"), col("n_grams"), col("n_novel_est"),
          graft.operators.ops.r6(col("n_novel_est") * lit(1.0) / col("n_grams"))
            .as("novelty_est"))
        .collect()
      // absorb: partition-local sketches built with the SAME
      // (expected, fpp) as the state filter (stat.bloomFilter sizes
      // its bits differently and refuses to merge), collected and
      // merged driver-side — collect (unlike RDD.reduce) is total on
      // an EMPTY batch (zero partitions), which a restart replay or
      // an idle trigger can legitimately deliver
      dg.select("g").as[String].rdd
        .mapPartitions { it =>
          if (it.isEmpty) Iterator.empty
          else {
            val f = BloomFilter.create(NoveltyExpected, NoveltyFpp)
            it.foreach(f.putString)
            Iterator.single(f)
          }
        }
        .collect()
        .foreach(seen.mergeInPlace)
      dg.unpersist()
      out
    }
  }

  /** Wire a (doc_id, text) stream through a [[Scorer]]; each batch's
    * scores go to `sink`. */
  def guard(docs: DataFrame, sink: Array[Row] => Unit): StreamingQuery = {
    val scorer = new Scorer(docs.sparkSession)
    docs.writeStream
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[Row], _: Long) =>
        sink(scorer.scoreBatch(batch.toDF()))
      }
      .outputMode("update")
      .start()
  }
}
