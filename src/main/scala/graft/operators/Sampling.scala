package graft.operators

import graft.{Q, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Training-set assembly (SURVEY §2.F2): deterministic splits and
  * stratified sampling — the last mile of an LLM data pipeline,
  * where the cleaned corpus becomes train/val/test sets with a
  * controlled language mix.
  *
  * Both operators key every decision on a CONTENT hash bucket
  * (md5 of the text), never on randomness or row order: reruns,
  * retries, and re-partitioning cannot change an assignment, and
  * byte-identical duplicates always land in the same bucket. All
  * decisions are per-row map-side filters against broadcast,
  * stratum-bounded statistics — nothing shuffles the corpus.
  */
object Sampling {

  /** Content bucket in [0, 1000): first 8 hex digits of md5(text).
    * The same expression is spelled in the oracle SQL — Spark `conv`
    * and DuckDB's hex-literal cast parse the identical substring. */
  private val BucketExpr =
    "CAST(conv(substring(md5(CAST(text AS BINARY)), 1, 8), 16, 10) AS BIGINT) % 1000"
  private val BucketSql = "('0x' || substr(md5(text), 1, 8))::BIGINT % 1000"

  /** train/val/test fractions in thousandths: 80/10/10. */
  private val TrainLt = 800
  private val ValLt = 900

  /** Deterministic content-keyed train/val/test split. Keying on the
    * text hash (not doc_id) means exact duplicates can never
    * straddle train and test — the classic eval-leakage bug — and
    * the split survives re-ingestion with renumbered ids. Pure
    * per-row projection: at 100 TB this is a map-only pass. */
  def q66(s: SparkSession, dir: String): DataFrame =
    Tables(s, dir, "documents")
      .withColumn("bucket", expr(BucketExpr))
      .withColumn("split",
        when(col("bucket") < TrainLt, "train")
          .when(col("bucket") < ValLt, "val")
          .otherwise("test"))
      .select(col("doc_id"), col("bucket"), col("split"))
      .orderBy("doc_id")

  private val q66Sql =
    s"""SELECT doc_id, $BucketSql AS bucket,
       CASE WHEN $BucketSql < $TrainLt THEN 'train'
            WHEN $BucketSql < $ValLt THEN 'val'
            ELSE 'test' END AS split
       FROM documents ORDER BY doc_id"""

  /** Stratified language rebalancing: sample each language stratum
    * at rate target/|stratum| (target = the smallest stratum), so
    * the selected corpus is approximately language-balanced. The
    * admission test is `bucket < (target*1000) div n_lang` — a
    * per-row filter against broadcast per-language counts, the
    * rate-based form real pipelines use at scale (an exact per-
    * stratum quota would need a global rank per language: a sort or
    * window per stratum for no statistical benefit). Deterministic:
    * same corpus → same sample, regardless of partitioning. */
  def q67(s: SparkSession, dir: String): DataFrame = {
    val d = Tables(s, dir, "documents")
      .select(col("doc_id"), col("lang"), expr(BucketExpr).as("bucket"))
    val counts = d.groupBy("lang").agg(count(lit(1)).as("n_lang"))
    val target = counts.agg(min("n_lang").as("target"))
    d.join(broadcast(counts), "lang")
      .crossJoin(broadcast(target))
      .filter(col("bucket") < expr("(target * 1000) div n_lang"))
      .select(col("doc_id"), col("lang"), col("bucket"))
      .orderBy("doc_id")
  }

  private val q67Sql =
    s"""WITH d AS (SELECT doc_id, lang, $BucketSql AS bucket FROM documents),
       c AS (SELECT lang, count(*) AS n_lang FROM d GROUP BY 1),
       t AS (SELECT min(n_lang) AS target FROM c)
       SELECT doc_id, d.lang, bucket
       FROM d JOIN c ON d.lang = c.lang, t
       WHERE bucket < (target * 1000) // n_lang
       ORDER BY doc_id"""

  val qs: Seq[Q] = Seq(
    Q("q66_train_split", q66, Some(q66Sql)),
    Q("q67_stratified_sample", q67, Some(q67Sql)))
}
