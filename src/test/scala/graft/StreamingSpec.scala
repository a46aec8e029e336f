package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Batch/stream parity: the streaming pipeline must produce the same
  * results as the batch operators it mirrors. */
class StreamingSpec extends AnyFunSuite {
  import TestSpark.{spark, sf}

  test("streaming enrichment matches batch q21 exactly") {
    val q = streaming.EnrichStream.enriched(spark, sf)
      .writeStream.format("memory").queryName("enrich_out")
      .outputMode("append").start()
    q.processAllAvailable(); q.stop()
    val streamed = spark.table("enrich_out")
    val batch = operators.Events.q21(spark, sf)
    assert(streamed.count() == batch.count())
    // full-row equality both directions
    assert(streamed.exceptAll(batch).count() == 0)
    assert(batch.exceptAll(streamed).count() == 0)
  }

  test("watermarked hourly metrics match the batch aggregation") {
    val q = streaming.EnrichStream.hourlyMetrics(
        streaming.EnrichStream.source(spark, sf))
      .writeStream.format("memory").queryName("hourly_out")
      .outputMode("complete").start()
    q.processAllAvailable(); q.stop()
    val streamed = spark.table("hourly_out")
      .select(col("window.start").as("hour_ts"), col("event_type"), col("n_events"))
    val batch = Tables(spark, sf, "events")
      .groupBy(date_trunc("hour", col("ts")).as("hour_ts"), col("event_type"))
      .agg(count(lit(1)).as("n_events"))
    assert(streamed.exceptAll(batch).count() == 0)
    assert(batch.exceptAll(streamed).count() == 0)
  }

  test("stateful LTV final value per user matches batch q22") {
    val q = streaming.EnrichStream.ltvStateful(
        streaming.EnrichStream.typedSource(spark, sf))
      .writeStream.format("memory").queryName("ltv_out")
      .outputMode("append").start()
    q.processAllAvailable(); q.stop()
    val streamedFinal = spark.table("ltv_out")
      .groupBy("user_id").agg(max("ltv").as("final_ltv"))
    val batchFinal = operators.Events.q22(spark, sf)
      .groupBy("user_id").agg(max("ltv").as("final_ltv"))
    assert(streamedFinal.exceptAll(batchFinal).count() == 0)
    assert(batchFinal.exceptAll(streamedFinal).count() == 0)
  }

  test("watermarked dedup collapses a duplicated replay to distinct events") {
    // simulate an at-least-once source: the events file delivered twice
    val dupDir = java.nio.file.Files.createTempDirectory("graft-dup").toString
    val ev = Tables(spark, sf, "events")
    val raw = ev.select(col("event_id"), unix_micros(col("ts")).as("ts"),
      col("user_id"), col("event_type"), col("value"), col("props"))
    raw.write.mode("overwrite").parquet(dupDir + "/replay1")
    raw.write.mode("append").parquet(dupDir + "/replay1")
    val stream = spark.readStream
      .schema(streaming.EnrichStream.rawSchema)
      .parquet(dupDir + "/replay1")
      .withColumn("ts", expr("timestamp_micros(ts)"))
    val q = streaming.EnrichStream.dedupedSource(stream)
      .writeStream.format("memory").queryName("dedup_out")
      .outputMode("append").start()
    q.processAllAvailable(); q.stop()
    assert(spark.table("dedup_out").count() == ev.count())
  }

  test("rate-limited replay paces a backlog across micro-batches and loses nothing") {
    val dir = java.nio.file.Files.createTempDirectory("graft-replay").toString
    val raw = Tables(spark, sf, "events")
      .select(col("event_id"), unix_micros(col("ts")).as("ts"),
        col("user_id"), col("event_type"), col("value"), col("props"))
    // a 4-file backlog replayed at 1 file per trigger = 4 micro-batches
    raw.repartition(4).write.mode("overwrite").parquet(dir)
    var batches = 0
    var rows = 0L
    val q = streaming.EnrichStream.replaySource(spark, dir, filesPerTrigger = 1)
      .writeStream
      .outputMode("append")
      .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
        batches += 1; rows += df.count()
      }
      .start()
    q.processAllAvailable(); q.stop()
    assert(batches >= 4, s"expected the backlog paced over >=4 micro-batches, got $batches")
    assert(rows == raw.count(), "replay dropped or duplicated events")
  }

  test("stream of synthetic returns matches batch LTV including subtractions") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-returns").toString
    Seq(
      (1L, 1000000L, 7L, "purchase", 10.0, """{}"""),
      (2L, 2000000L, 7L, "return", 4.0, """{}"""),
      (3L, 3000000L, 7L, "purchase", -3.0, """{}"""),
      (4L, 4000000L, 7L, "purchase", 2.5, """{"is_return": "true"}"""),
      (5L, 5000000L, 8L, "purchase", 1.0, """{}"""))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(dir)
    val stream = spark.readStream.schema(streaming.EnrichStream.rawSchema).parquet(dir)
      .withColumn("ts", expr("timestamp_micros(ts)"))
    val q = streaming.EnrichStream.ltvStateful(streaming.EnrichStream.typed(stream))
      .writeStream.format("memory").queryName("ltv_ret_out")
      .outputMode("append").start()
    q.processAllAvailable(); q.stop()
    val ltv = spark.table("ltv_ret_out")
      .collect().map(r => r.getLong(1) -> r.getDouble(2)).toMap
    // user 7: +10.00, -4.00, -3.00, -2.50 => 10.0, 6.0, 3.0, 0.5
    assert(ltv == Map(1L -> 10.0, 2L -> 6.0, 3L -> 3.0, 4L -> 0.5, 5L -> 1.0),
      s"unexpected streamed LTV trajectory: $ltv")
  }

  test("parquet sink with checkpoint round-trips the enriched stream") {
    val out = java.nio.file.Files.createTempDirectory("graft-sink").toString
    val ckpt = java.nio.file.Files.createTempDirectory("graft-ckpt").toString
    val q = streaming.EnrichStream.enriched(spark, sf)
      .writeStream.format("parquet")
      .option("path", out).option("checkpointLocation", ckpt)
      .outputMode("append").start()
    q.processAllAvailable(); q.stop()
    val written = spark.read.parquet(out)
    val batch = operators.Events.q21(spark, sf)
    assert(written.count() == batch.count())
    assert(written.exceptAll(batch).count() == 0)
  }
}
