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

  /** events.parquet has shipped in two generations: TIMESTAMP(NANOS)
    * (which Spark's reader surfaces as a raw long only under
    * spark.sql.legacy.parquet.nanosAsLong — GraftSession sets it) and
    * plain TIMESTAMP(MICROS) without timezone (read as TIMESTAMP_NTZ).
    * Branch on the observed type and normalize both to TIMESTAMP
    * (LTZ), the type every downstream consumer (unix_micros, windows,
    * watermarks) expects: a long ts is nanos and is rebuilt with
    * integer DIV (nanos exceed 2^53, float division would corrupt);
    * an NTZ ts is cast — value-preserving because GraftSession pins
    * the session timezone to UTC. Either way the result matches
    * DuckDB's ts::TIMESTAMP value.
    */
  def events(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}
    val df = spark.read.parquet(s"$dir/events.parquet")
    df.schema("ts").dataType match {
      case LongType =>
        df.withColumn("ts", org.apache.spark.sql.functions.expr("timestamp_micros(ts DIV 1000)"))
      case TimestampNTZType =>
        df.withColumn("ts", df("ts").cast(TimestampType))
      case _ => df
    }
  }
}
