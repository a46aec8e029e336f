package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.util.sketch.BloomFilter

/** One guarded arrival: gram stats + the admission decision. */
case class GuardResult(doc_id: Long, n_grams: Long, n_shared_est: Long, admitted: Boolean)

/** Streaming ingest decontamination guard — the online face of batch
  * q77: documents arriving on a stream are probed against the
  * broadcast reference Bloom filter
  * ([[graft.operators.Sampling.referenceBloom]]) and rejected if they
  * share any 8-gram with the held-out reference set, BEFORE they ever
  * enter the training corpus.
  *
  * Entirely stateless map-side work (no watermark, no state store, no
  * shuffle): the filter is built ONCE from the bounded reference set
  * and broadcast; each micro-batch pays one gram pass per arrival.
  * Error is one-sided exactly as in q77 — a truly-contaminated
  * arrival is never admitted; a clean one is rejected with
  * probability ≈ n_grams·fpp. Batch/stream parity is exact and
  * spec-checked: the same filter probed over the same documents
  * yields bit-identical (n_grams, n_shared_est) to q77.
  */
object DecontaminateStream {

  /** Whitespace 8-grams, distinct — the Scala twin of Sampling's
    * `gramExpr` (SQL `array_distinct(transform(...))`); sliding
    * preserves first-occurrence order exactly like array_distinct. */
  private[graft] def grams(text: String): Array[String] = {
    val tk = text.split(" ").filter(_.nonEmpty)
    if (tk.length < graft.operators.Sampling.GramN) Array.empty
    else tk.sliding(graft.operators.Sampling.GramN).map(_.mkString(" "))
      .toArray.distinct
  }

  /** (doc_id, text) arrivals → admission decisions. Works unchanged
    * on a streaming or batch Dataset (the parity spec runs both). */
  def guard(docs: Dataset[(Long, String)], bloom: BloomFilter): Dataset[GuardResult] = {
    import docs.sparkSession.implicits._
    val bc = docs.sparkSession.sparkContext.broadcast(bloom)
    docs.mapPartitions { it =>
      val f = bc.value
      it.map { case (id, text) =>
        val gs = grams(text)
        var hits = 0L
        gs.foreach(g => if (f.mightContainString(g)) hits += 1L)
        GuardResult(id, gs.length.toLong, hits, hits == 0L)
      }
    }
  }
}
