package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.Similarity

/** PERSISTED LEXICAL (inverted BM25) INDEX — q160's posting slice
  * written the way [[AnnIndex]] persists cells: postings live as
  * token-bucket-partitioned parquet (`path/tb=<b>/…`), so Spark's
  * partition pruning IS the index lookup — a probe lists and reads
  * only the buckets its query tokens hash into, and every other
  * posting list never leaves disk. The in-memory operator
  * ([[graft.operators.Similarity.lexRank]]) re-tokenizes the corpus
  * per session; a serving path builds the index once and probes it
  * per trigger ([[graft.streaming.RetrieveStream]]).
  *
  * What is persisted is exactly the slice q160's DF cap admits:
  * tokens with df ≤ HybDfMaxPpm·n_docs — the stopword-class postings
  * (the ones that would make a lookup read the corpus) are dropped AT
  * BUILD, so no query can ever pull them. Each posting row carries
  * its token's df denormalized (the probe is join-free: one pruned
  * scan → score → bounded TopK); corpus stats (n_docs, Σdl) are
  * driver-held metadata like AnnIndex's centroid matrix, returned by
  * [[write]] and passed to [[probe]] by the serving tier.
  *
  * Scoring is the SAME expression tree as the batch branch
  * (`Similarity.bm25CU` + `Similarity.lexRankOf` — the FreqStream
  * shared-expression discipline), so the persisted probe is
  * structurally incapable of drifting from q160's lexical ranking;
  * SourcesSpec asserts row-for-row equality and the plan's tb
  * PartitionFilters.
  */
object LexIndex {

  /** Token-hash bucket count: the pruning granularity. 64 keeps a
    * bucket ≈ 1/64 of the posting volume — at 100 TB each bucket is
    * still many files, so pruning saves listing+IO proportionally;
    * a deployment sizes this like any partition key (bounded
    * directory count, even volume via the hash). */
  val NBuckets = 64L

  /** Driver-held index metadata: integer-valued corpus stats (exact
    * longs; the scoring arithmetic consumes them as the same
    * integer-valued doubles the batch branch computes). */
  case class LexStats(nDocs: Long, sumDl: Long)

  private def bucket(tok: org.apache.spark.sql.Column) =
    pmod(xxhash64(tok), lit(NBuckets))

  /** Tokenize + df-cap + write the bucket-partitioned postings;
    * returns the stats metadata. One corpus tokenize pass feeds both
    * the posting frame and (by shared-lineage re-execution, the q31
    * rule) the df aggregate. */
  def write(s: SparkSession, dir: String, path: String): LexStats = {
    val tkE = graft.operators.Dedup.tokensExpr
    val docs = graft.Tables(s, dir, "documents")
    val st = docs.agg(count(lit(1)).as("n"),
      sum(expr(s"size($tkE)").cast("long")).as("sdl")).collect()(0)
    val stats = LexStats(st.getLong(0), st.getLong(1))
    val post = docs.select(
        col("doc_id"),
        expr(s"size($tkE)").cast("double").as("dl"),
        explode(expr(tkE)).as("tok"))
      .groupBy("doc_id", "dl", "tok").agg(count(lit(1)).cast("double").as("tf"))
    val kept = post.groupBy("tok").agg(count(lit(1)).cast("double").as("df"))
      .filter(col("df") * lit(1000000.0) <=
        lit(Similarity.HybDfMaxPpm.toDouble) * lit(stats.nDocs.toDouble))
    post.join(broadcast(kept), "tok")
      .withColumn("tb", bucket(col("tok")))
      .select("tb", "tok", "doc_id", "dl", "tf", "df")
      .write.mode(SaveMode.Overwrite).partitionBy("tb").parquet(path)
    stats
  }

  /** Probe: BM25 top-k per query over the persisted postings.
    * `qtok` = the bounded (query_id, tok) pairs of the trigger
    * (distinct per pair — the serving contract's analog of the batch
    * QueryMax rule). Only the buckets the query tokens hash into are
    * listed or read; dropped (hot) tokens have no postings by
    * construction, so they contribute nothing — exactly the batch
    * branch's kept-semi-join semantics. */
  def probe(s: SparkSession, path: String, stats: LexStats,
      qtok: DataFrame, k: Int): DataFrame = {
    val q = qtok.select(col("query_id"), col("tok"),
      bucket(col("tok")).as("tb")).localCheckpoint(false)
    // bounded by the serving contract: tokens + buckets to the driver
    val toks = q.select("tok").distinct().collect().map(_.getString(0)).toSeq
    val tbs = q.select("tb").distinct().collect().map(_.getLong(0)).toSeq
    val scored = s.read.parquet(path)
      // tb.isin is a PARTITION filter on the bucket directories; the
      // tok.isin prunes within the read buckets
      .filter(col("tb").isin(tbs: _*) && col("tok").isin(toks: _*))
      .join(broadcast(q.select("query_id", "tok")), "tok")
      .filter(col("doc_id") =!= col("query_id"))
      .withColumn("c_u", Similarity.bm25CU(
        lit(stats.nDocs.toDouble), lit(stats.sumDl.toDouble),
        col("df"), col("tf"), col("dl")))
    Similarity.lexRankOf(scored, k)
  }
}
