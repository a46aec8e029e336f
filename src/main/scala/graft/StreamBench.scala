package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

/** Streaming scale harness (SURVEY §4.1): replays an events corpus in
  * EVENT-TIME ORDER through the stateful pipelines and prints one
  * JSON line per pipeline — rows processed, wall seconds, rows/s,
  * micro-batches, and max state rows alongside that operator's
  * documented state bound — so the "state is bounded by X, not
  * history" claims are MEASURED numbers, not prose.
  *
  * Time-ordered replay matters: the corpus generators draw event
  * times uniformly, so replaying raw files would push the watermark
  * to near-max in the first batch and drop everything later as late —
  * measuring the drop path, not the operator. The spool step
  * re-sorts the corpus into `chunks` range-partitioned files written
  * sequentially (FileStreamSource admits files in modification-time
  * order), which is what a live feed looks like.
  *
  * Usage: runMain graft.StreamBench [eventsDir] [chunks]
  *   eventsDir default /tmp/estress_x10 (1M events, ~15k users,
  *   GenData family with ~5% NULL user/value rows).
  */
object StreamBench {

  case class Res(pipeline: String, rows: Long, secs: Double,
      batches: Int, maxStateRows: Long, bound: Long, boundDesc: String) {
    def json: String =
      f"""{"pipeline":"$pipeline","rows":$rows,"secs":$secs%.1f,""" +
        f""""rows_per_sec":${rows / math.max(secs, 1e-9)}%.0f,"batches":$batches,""" +
        s""""max_state_rows":$maxStateRows,"state_bound":$bound,"bound":"$boundDesc"}"""
  }

  /** Spool the events table as `chunks` time-ordered parquet files in
    * [[graft.streaming.EnrichStream.rawSchema]]'s shape (ts as nanos
    * long), written one at a time so modification times — the file
    * source's admission order — follow event time. */
  private[graft] def spoolEvents(spark: SparkSession, evDir: String,
      chunks: Int): String = {
    val spool = java.nio.file.Files.createTempDirectory("graft_spool")
    val ev = Tables(spark, evDir, "events")
      .select(col("event_id"), (unix_micros(col("ts")) * 1000L).as("ts"),
        col("user_id"), col("event_type"), col("value"), col("props"))
    // localCheckpoint: the ranged frame is scanned once per chunk
    // below, and range-partitioner sampling is seeded per execution
    // (the q65/globalNtile lesson) — the boundaries must be fixed.
    val ranged = ev.repartitionByRange(chunks, col("ts"))
      .sortWithinPartitions("ts")
      .withColumn("pid", spark_partition_id())
      .localCheckpoint(false)
    for (i <- 0 until chunks) {
      val tmp = spool.resolve("_tmp").toString
      ranged.filter(col("pid") === i).drop("pid").coalesce(1)
        .write.mode("overwrite").parquet(tmp)
      val part = new java.io.File(tmp).listFiles()
        .filter(_.getName.endsWith(".parquet")).head
      java.nio.file.Files.move(part.toPath,
        spool.resolve(f"chunk$i%05d.parquet"))
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(tmp))
    }
    ranged.unpersist()
    spool.toString
  }

  /** Drive one pipeline over the spooled replay (1 file/trigger) and
    * measure its progress stream. */
  private[graft] def measure(name: String, q: StreamingQuery,
      bound: Long, boundDesc: String): Res = {
    val t0 = System.nanoTime()
    q.processAllAvailable()
    val secs = (System.nanoTime() - t0) / 1e9
    val progs = q.recentProgress
    val rows = progs.map(_.numInputRows).sum
    val batches = progs.count(_.numInputRows > 0)
    val maxState = progs.flatMap(_.stateOperators.map(_.numRowsTotal))
      .foldLeft(0L)(math.max)
    q.stop()
    Res(name, rows, secs, batches, maxState, bound, boundDesc)
  }

  def main(args: Array[String]): Unit = {
    import graft.streaming.EnrichStream
    val evDir = args.lift(0).getOrElse("/tmp/estress_x10")
    val chunks = args.lift(1).map(_.toInt).getOrElse(8)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors.toString).toInt
    val spark = GraftSession.local(cpus)
    val spool = spoolEvents(spark, evDir, chunks)

    // batch-side comparators for the documented bounds
    val ev = Tables(spark, evDir, "events").filter(col("user_id").isNotNull)
    val ltvUsers = EnrichStream.typed(
      Tables(spark, evDir, "events"))
      .filter(e => e.event_type.contains("purchase") ||
        e.event_type.contains("return") || e.is_return)
      .map(_.user_id)(org.apache.spark.sql.Encoders.scalaLong)
      .distinct().count()

    def replay() = EnrichStream.replaySource(spark, spool, 1)
    val results = Seq(
      measure("ltv_stateful",
        EnrichStream.ltvStateful(EnrichStream.typed(replay()))
          .writeStream.format("noop").outputMode("append").start(),
        ltvUsers, "distinct purchase/return users"),
      // session_window state holds one row per OPEN session: every
      // session has >= 1 event and only sessions inside the watermark
      // horizon stay open, so state <= events admitted in the last
      // ~2 batches (current chunk + the one the lagging watermark has
      // not yet closed) — a rate x horizon bound, independent of
      // stream length. Distinct users is NOT the bound: one replay
      // chunk spans days of event time, so each user holds several
      // not-yet-closed sessions at once (measured 119k open sessions
      // for 15k users at x10).
      measure("sessions",
        EnrichStream.sessionizedStream(replay().filter(col("user_id").isNotNull))
          .writeStream.format("noop").outputMode("append").start(),
        2L * (ev.count() / chunks + 1L),
        "open sessions <= events in ~2 replay chunks (rate x watermark horizon)"),
      measure("rolling_active",
        EnrichStream.rollingActiveStream(replay())
          .writeStream.format("noop").outputMode("update").start(),
        // 7-day windows / 1-day slide: open horizon (8) + windows
        // spanned by one chunk's event-time width + watermark lag of
        // one batch (bounded by the same chunk width)
        8L + 2L * chunkSpanDays(spark, spool, chunks),
        "open 7d-window horizon + 2x chunk span (batch-lagged watermark)"),
      // the remaining emission modes (r9, closing the §4.2 coverage
      // gap): per-closed-session APPEND with collected-struct state
      // (sessionPath — same open-session row bound as sessions; the
      // struct payload is bounded by per-session activity under the
      // 30-min gap) and COMPLETE-mode republication whose state is
      // structurally capped at ≤ #types·168 heatmap cells no matter
      // how long the stream runs (season)
      measure("session_paths",
        EnrichStream.sessionPathStream(replay().filter(col("user_id").isNotNull))
          .writeStream.format("noop").outputMode("append").start(),
        2L * (ev.count() / chunks + 1L),
        "open sessions <= events in ~2 replay chunks (rate x watermark horizon)"),
      measure("season",
        EnrichStream.seasonStream(replay())
          .writeStream.format("noop").outputMode("complete").start(),
        5L * 168L,
        "structural cap: #event_types x 168 dow-hour cells"))
    results.foreach(r => println(r.json))
    spark.stop()
  }

  /** Event-time width of one replay chunk in days (ceil), for the
    * rolling-active state bound. */
  private[graft] def chunkSpanDays(spark: SparkSession, spool: String,
      chunks: Int): Long = {
    val mm = spark.read.schema(graft.streaming.EnrichStream.rawSchema)
      .parquet(spool)
      .agg(min("ts"), max("ts")).collect()(0)
    val spanDays = (mm.getLong(1) - mm.getLong(0)) / 1e9 / 86400.0
    math.ceil(spanDays / chunks).toLong
  }
}
