package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Live corpus data card — the online face of batch q79: per-language
  * running corpus statistics (volume, tokens, quality) maintained as
  * documents arrive, the ingest-monitoring dashboard a corpus build
  * watches. Pure aggregation state (no per-doc state): the stream
  * side runs in complete output mode with #langs rows of state;
  * cross-engine-fragile stats (exact dup rate needs corpus-wide md5
  * groups) stay batch-only in q79.
  *
  * The SAME function body serves the stream and the batch frame —
  * parity is the shared expression tree, like AssignStream; quality
  * accumulates floor(q·10⁴+0.5) integer units (the q09/q79 cents
  * pattern) so the stream's incremental partial aggregation cannot
  * drift a float result against the batch run.
  */
object CardStream {

  private val stop = graft.operators.TextOps.stopEn.map(w => s"'$w'").mkString(", ")

  /** (doc_id, text, lang) frame → per-lang card. Works on a
    * streaming (complete mode) or batch frame. */
  def card(docs: DataFrame): DataFrame =
    docs
      .withColumn("tkc", expr(graft.operators.Dedup.tokensExpr))
      .withColumn("n", expr("CAST(size(tkc) AS BIGINT)"))
      .withColumn("ns", expr(
        s"CAST(size(filter(tkc, x -> array_contains(array($stop), x))) AS BIGINT)"))
      .withColumn("qu", expr(
        "CAST(floor(least(1.0D, n / 100.0D) * (1.0D - ns * 1.0D / n) * 10000.0D + 0.5D) AS BIGINT)"))
      .groupBy("lang")
      .agg(
        count(lit(1)).as("n_docs"),
        sum("n").as("total_tokens"),
        sum(length(col("text")).cast("long")).as("total_chars"),
        graft.operators.ops.r4(sum("qu") / (count(lit(1)) * lit(10000.0)))
          .as("mean_quality"))
}
