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

  /** The `<dir>/<name>.parquet` layout assumption, in ONE place —
    * consumers needing the raw (un-rebalanced) file go through here
    * so a layout change cannot silently desynchronize them from the
    * reader below. */
  def rawPath(dir: String, name: String): String = s"$dir/$name.parquet"

  /** Footer-metadata-only row count of a raw table file. Deliberately
    * NOT `Tables(...).count()`: the rebalance repartition would turn
    * a metadata read into a real shuffle job — this is the sizing
    * probe exchange-scaling consumers (Dedup.pairCounts) use. */
  def rawCount(spark: SparkSession, dir: String, name: String): Long =
    spark.read.parquet(rawPath(dir, name)).count()

  def apply(spark: SparkSession, dir: String, name: String): DataFrame = {
    val df =
      if (name == "events") events(spark, dir)
      else spark.read.parquet(rawPath(dir, name))
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
  def events(spark: SparkSession, dir: String): DataFrame =
    normalizeEventsTs(spark.read.parquet(rawPath(dir, "events")))

  /** The ONE type-dispatch for the events ts column, shared by the
    * batch reader above and the streaming source
    * (EnrichStream.source) so the two paths can never drift. Fails
    * fast instead of silently mis-reading: the NTZ branch requires
    * the UTC session (a local-zone session would shift every event
    * by the host offset), and an unrecognized physical type throws
    * rather than passing through unnormalized. */
  private[graft] def normalizeEventsTs(df: DataFrame): DataFrame = {
    import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}
    df.schema("ts").dataType match {
      case LongType =>
        df.withColumn("ts", org.apache.spark.sql.functions.expr("timestamp_micros(ts DIV 1000)"))
      case TimestampNTZType =>
        require(df.sparkSession.conf.get("spark.sql.session.timeZone", "") == "UTC",
          "events ts is TIMESTAMP_NTZ: the NTZ->LTZ cast is value-preserving only under a " +
            "UTC session timezone (build the session via GraftSession.tune/local)")
        df.withColumn("ts", df("ts").cast(TimestampType))
      case TimestampType => df
      case other => throw new IllegalArgumentException(
        s"unexpected events ts physical type $other: extend Tables.normalizeEventsTs")
    }
  }
}
