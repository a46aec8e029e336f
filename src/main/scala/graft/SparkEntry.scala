package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  * Registry of every implemented operator (SURVEY §2) with its
  * DuckDB oracle SQL where the semantics are SQL-expressible.
  */
object SparkEntry {

  /** All operators, module by module (SURVEY §2 A–G). */
  def all: Seq[Q] =
    operators.Relational.qs ++ operators.Events.qs ++ operators.MlOps.qs ++
      operators.Dedup.qs ++ operators.Similarity.qs ++ operators.TextOps.qs ++
      operators.Sampling.qs ++ operators.Multimodal.qs ++ operators.Tokenizer.qs

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    operators.Relational.q01(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    all.map(q => q.name -> q.fn).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    all.flatMap(q => q.oracle.map(sql => q.name -> sql)).toMap
}
