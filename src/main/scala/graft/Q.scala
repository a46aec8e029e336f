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
  def apply(spark: SparkSession, dir: String, name: String): DataFrame =
    if (name == "events") events(spark, dir) else spark.read.parquet(s"$dir/$name.parquet")

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
