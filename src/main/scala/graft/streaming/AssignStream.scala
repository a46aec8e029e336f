package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Streaming ingest assignment — the online face of the two stateless
  * assembly decisions, q66 (content-keyed train/val/test split) and
  * q88 (quality-weighted importance resampling): every arriving
  * document is assigned its split and its keep/drop decision AT
  * INGEST, before it lands in the corpus, from exactly the batch
  * operators' expressions.
  *
  * Both decisions are pure per-row projections keyed on the content
  * hash — no watermark, no state store, no shuffle — so the stream
  * twin IS the batch expression applied micro-batch-wise, and parity
  * is bit-exact by construction: the same document gets the same
  * split and the same keep decision whether it arrives on a stream,
  * in a backfill batch, or twice (duplicates cannot straddle splits
  * or flip decisions — the re-ingestion guarantee). StreamingSpec
  * asserts equality against q66/q88 row sets on the same documents.
  */
object AssignStream {

  /** (doc_id, text, lang) arrivals → (doc_id, lang, bucket, split,
    * kept). Works unchanged on a streaming or batch frame. */
  def assign(docs: DataFrame): DataFrame =
    graft.operators.Sampling.assignCols(docs)

  /** Convenience: texts as a typed stream. */
  def assignTyped(docs: Dataset[(Long, String, String)]): DataFrame =
    assign(docs.toDF("doc_id", "text", "lang"))
}
