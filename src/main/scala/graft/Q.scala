package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One engine operator: a Spark implementation plus (optionally) the
  * DuckDB-equivalent oracle SQL the driver hash-compares against.
  * `oracle=None` marks non-SQL-expressible operators (hash-dependent
  * sketches, ML) that the driver checks rows-only and ScalaTest specs
  * cover more deeply.
  */
final case class Q(
    name: String,
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String])

object Tables {
  def apply(spark: SparkSession, dir: String, name: String): DataFrame = {
    val df =
      if (name == "events") events(spark, dir)
      else spark.read.parquet(s"$dir/$name.parquet")
    // The LLM-pipeline tables feed explode-heavy pipelines (shingles,
    // token hashing, LSH signatures) whose cost is 10-100x the scan:
    // a single-row-group file scans as ONE task and serializes all of
    // it. Rebalance UP-only — a real deployment's multi-file table
    // already has >= defaultParallelism splits and is left untouched,
    // so this never shrinks a big scan. Safe for parity: every
    // downstream aggregation over these tables is integer/min-based
    // (counts, xxhash mins, +/-1 sums), so partition order cannot
    // drift a float result against the oracle.
    if (name == "documents" || name == "embeddings") rebalanced(df, spark) else df
  }

  private def rebalanced(df: DataFrame, spark: SparkSession): DataFrame = {
    val target = spark.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions < target) df.repartition(target) else df
  }

  /** events.parquet carries TIMESTAMP(NANOS) which Spark's parquet
    * reader rejects; read nanos as long and rebuild a micros
    * timestamp (integer DIV — nanos exceed 2^53 so float division
    * would corrupt). Matches DuckDB's ts::TIMESTAMP truncation.
    *
    * The nanosAsLong flag is session-global, so setting it here as a
    * plan-construction side effect would surprise a caller whose
    * session already reads other parquet — GraftSession.tune owns the
    * flag; this just refuses to mis-read silently without it.
    */
  def events(spark: SparkSession, dir: String): DataFrame = {
    require(spark.conf.getOption("spark.sql.legacy.parquet.nanosAsLong").contains("true"),
      "events.parquet is TIMESTAMP(NANOS): build the session via GraftSession.tune/local " +
        "(sets spark.sql.legacy.parquet.nanosAsLong=true)")
    spark.read.parquet(s"$dir/events.parquet")
      .withColumn("ts", org.apache.spark.sql.functions.expr("timestamp_micros(ts DIV 1000)"))
  }
}
