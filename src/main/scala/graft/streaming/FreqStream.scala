package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Live token-frequency sketch — the online face of batch q112: a
  * CountMin sketch maintained as documents arrive, answering "how
  * often has token X been seen so far, within a one-sided εN bound"
  * without keeping the unbounded vocabulary as state. The streaming
  * analog of the Misra-Gries live heavy hitters (which keeps WHO is
  * frequent; this keeps HOW OFTEN for any probe).
  *
  * State is the sketch itself: at most D·W (d, cell, n) rows in
  * complete-mode aggregation state, regardless of corpus size or
  * vocabulary — the same boundedness argument as the batch build,
  * which is why the identical expression tree
  * ([[graft.operators.TextOps.cmsCellsExpr]]) serves both modes and
  * why stream/batch parity is structural: a counting aggregate is
  * merge-order-invariant, so incremental per-trigger partials land
  * on exactly the batch cells.
  */
object FreqStream {

  /** (text) frame → CMS cell frame. Works on a streaming (complete
    * mode) or batch frame. */
  def sketch(docs: DataFrame): DataFrame =
    graft.operators.TextOps.cmsSketch(
      docs.select(explode(expr(graft.operators.Dedup.tokensExpr)).as("tok")))

  /** Probe a materialized sketch frame for the given tokens: CMS
    * estimate = min over the D hashed cells. The sketch frame is
    * SPARSE (a zero cell has no row), so the probe LEFT-joins its
    * cells and reads an absent one as 0 — an inner join would take
    * the min over touched cells only and over-estimate any token
    * with an untouched cell. Never an undercount either way (CMS is
    * one-sided); a never-seen token estimates as its cells' noise
    * floor, 0 if any cell is untouched. Both sides are bounded
    * (probes by the caller, sketch by D·W). */
  def probe(sketch: DataFrame, tokens: DataFrame): DataFrame =
    tokens
      .select(col("tok"), explode(expr(graft.operators.TextOps.cmsCellsExpr)).as("dc"))
      .select(col("tok"), col("dc.d").as("d"), col("dc.cell").as("cell"))
      .join(broadcast(sketch), Seq("d", "cell"), "left")
      .groupBy("tok")
      .agg(min(coalesce(col("n"), lit(0L))).as("est_n"))
}
