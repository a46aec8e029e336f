package graft.streaming

import org.apache.spark.sql.DataFrame

/** Live intake validation — the online face of batch q108: running
  * corruption counts (null/empty/whitespace-only text, control
  * bytes, declared-length mismatch, missing ids/langs, clean count)
  * maintained as documents arrive — the ingest-health dashboard a
  * crawl watches, catching a mis-encoded upstream batch while it is
  * landing rather than at the next corpus audit.
  *
  * Parity is the SHARED EXPRESSION TREE
  * ([[graft.operators.TextOps.intakeFlags]], the CardStream /
  * AssignStream pattern): every flag is the identical Column in both
  * the stream and batch q108, and all counts are integer sums, so
  * incremental partial aggregation cannot drift the batch value.
  * State is ONE row of longs (complete-mode global aggregate).
  *
  * The one batch-only column is `n_dup_id`: exact distinct over an
  * unbounded stream is not incrementalizable state (a streaming
  * distinct would hold every id seen). The streaming dedup surface
  * (DedupStream / `dedupedSource`'s watermark-bounded
  * dropDuplicates) owns that concern online; the full-corpus number
  * stays with batch q108.
  */
object ValidateStream {

  /** (doc_id, text, lang, n_chars) frame → one-row running counts.
    * Works on a streaming (complete mode) or batch frame. */
  def validate(docs: DataFrame): DataFrame = {
    val a = graft.operators.TextOps.intakeFlags.aggs
    docs.agg(a.head, a.tail: _*)
  }
}
