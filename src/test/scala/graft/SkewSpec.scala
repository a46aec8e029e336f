package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Skew resilience: GraftSession enables AQE skew-join splitting, but
  * until this spec nothing PROVED it fires on the engine's join
  * shapes. The 100 TB argument for the candidate-generation joins
  * (q41's inverted index, q84's grid cells) is "the cap bounds
  * per-key fan-out, AQE splits what remains" — this pins the second
  * half on the engine's own session.
  *
  * Both tests plant ONE hot key at just-under-cap frequency in an
  * otherwise-uniform frame and run the engine's join shape over it
  * with the AQE size knobs scaled to test-data bytes (the same knobs
  * a production deployment tunes; defaults are sized for 100 MB-class
  * partitions, not a 40 KB spec frame). Assertion: the final adaptive
  * plan marks the join skew-split (`skew=true`) — the hot partition
  * was divided across tasks instead of serializing one reducer.
  *
  * Why the index frame is built directly rather than driven through
  * cappedShingles' checkpoint (measured while building this spec):
  *
  *  1. AQE's skew split is MAPPER-GRANULAR — a skewed reduce
  *     partition divides along map-output boundaries, so a hot key
  *     whose bytes sit in one mapper cannot split at all.
  *  2. At spec scale the ~30 KB checkpointed index materializes as
  *     ONE partition (AQE coalesces the anti-join's output), so every
  *     downstream key is single-mapper and unsplittable — a tiny-data
  *     artifact, not a plan property: at any real SF the index spans
  *     many mappers (broadcast-anti keeps the scan layout; even the
  *     SMJ-anti fallback clusters BY KEY, so a multi-key hot
  *     partition still splits per key, and a single key is bounded by
  *     DfCap² verification work).
  *
  * The spec therefore feeds the join the layout a production scan
  * delivers — the hot key interleaved across mappers — and asserts
  * the split on exactly the q41/q84 join pipelines.
  */
class SkewSpec extends AnyFunSuite {
  import TestSpark.spark

  // planted hot-key frequency: just under q41's cap — the worst key a
  // 100 TB corpus can retain in the capped inverted index
  private val HotDf = operators.Dedup.DfCap - 10

  private val aqeKeys = Seq(
    "spark.sql.autoBroadcastJoinThreshold",
    "spark.sql.adaptive.autoBroadcastJoinThreshold",
    "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
    "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
    "spark.sql.adaptive.advisoryPartitionSizeInBytes",
    "spark.sql.shuffle.partitions")

  private def withSkewConfs[A](f: => A): A = {
    val conf = spark.conf
    val saved = aqeKeys.map(k => k -> conf.getOption(k))
    try {
      conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
      conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2.0")
      conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "256")
      conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "256")
      conf.set("spark.sql.shuffle.partitions", "32")
      f
    } finally saved.foreach {
      case (k, Some(v)) => conf.set(k, v)
      case (k, None) => conf.unset(k)
    }
  }

  /** A capped inverted index as a scan delivers it: hot key rows
    * interleaved across `mappers` input partitions. */
  private def plantedIndex(mappers: Int) =
    spark.range(HotDf).select(lit("HOT KEY GRAM").as("s"), col("id").as("doc_id"))
      .union(spark.range(10000, 10300).select(
        concat(lit("t"), col("id")).as("s"), col("id").as("doc_id")))
      .repartition(mappers).localCheckpoint(false)

  test("q41's inverted-index join pipeline splits a planted hot shingle under AQE") {
    withSkewConfs {
      val sh = plantedIndex(4)
      // the exact jaccardPairs pipeline: capped-index self-join on the
      // shingle, pair counting, per-doc size joins, threshold filter
      val sz = sh.groupBy("doc_id").agg(count(lit(1)).as("n"))
      val q = sh.as("a").join(sh.as("b"),
          col("a.s") === col("b.s") && col("a.doc_id") < col("b.doc_id"))
        .groupBy(col("a.doc_id").as("d1"), col("b.doc_id").as("d2"))
        .agg(count(lit(1)).as("c"))
        .join(sz.withColumnRenamed("doc_id", "d1").withColumnRenamed("n", "n1"), "d1")
        .join(sz.withColumnRenamed("doc_id", "d2").withColumnRenamed("n", "n2"), "d2")
        .select(col("d1"), col("d2"),
          (col("c") * lit(1.0) / (col("n1") + col("n2") - col("c"))).as("jacc"))
        .filter(col("jacc") >= 0.5)
        .orderBy("d1", "d2")
      // hot docs carry only the hot key -> jaccard 1.0 pairs: non-empty
      // result, so AQE cannot EmptyRelation-collapse the join stages
      assert(q.collect().nonEmpty)
      val plan = q.queryExecution.executedPlan.toString
      assert(plan.contains("skew=true"),
        s"AQE did not skew-split the planted hot shingle; final plan:\n$plan")
    }
  }

  test("q84's hinted shuffle_merge grid join splits a planted hot cell under AQE") {
    withSkewConfs {
      // q84's candidate shape: intervals exploded onto grid cells,
      // cell equi self-join under an explicit shuffle_merge hint (the
      // match-multiplication lesson) — one planted hot cell
      val cells = spark.range(HotDf).select(lit(7L).as("cell"), col("id").as("sid"))
        .union(spark.range(10000, 10300).select(col("id").as("cell"), col("id").as("sid")))
        .repartition(4).localCheckpoint(false)
      val q = cells.as("x").hint("shuffle_merge")
        .join(cells.as("y").hint("shuffle_merge"),
          col("x.cell") === col("y.cell") && col("x.sid") < col("y.sid"))
        .groupBy(col("x.sid").as("s1")).agg(count(lit(1)).as("n_overlaps"))
      assert(q.collect().nonEmpty)
      val plan = q.queryExecution.executedPlan.toString
      assert(plan.contains("skew=true"),
        s"AQE did not skew-split the planted hot cell; final plan:\n$plan")
    }
  }
}
