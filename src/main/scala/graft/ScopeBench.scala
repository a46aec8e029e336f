package graft

import org.apache.spark.sql.functions._

/** A/B harness for the r13 dedup-domain SCOPING path (SURVEY §15):
  * times [[graft.operators.Multimodal.q155]] unscoped vs scoped into
  * `scopes` CONTIGUOUS doc_id ranges (`floor(doc_id / width)` — the
  * ingestion-window sharding shape) over a media corpus, best-of-N
  * with an untimed warmup pass, and prints ONE JSON line. The scoped
  * pair count is strictly ≤ the unscoped one (cross-scope pairs are
  * the contract's exclusion class) — both counts print so the
  * trade is explicit.
  *
  * Range windows, NOT pmod: near-dup families are temporally local
  * (a re-crawl/re-encode lands near its original — GenData twins sit
  * 3 ids apart), so contiguous windows keep them co-scoped and only
  * window-boundary pairs are excluded. Measured on mm_x300: pmod 10
  * sharding kept 13 of 75,892 pairs (every twin pair straddles
  * shards) vs range windows' ~99.9% — interleaved-id sharding is the
  * one scope shape a deployment must NOT pick.
  *
  * usage: runMain graft.ScopeBench <mediaDir> [scopes] [runs] [family]
  *   family: phash (default, q155) | wav (q157). q171 is deliberately
  *   NOT offered: its output is a corpus-row verdict frame whose
  *   count is constant by construction (one row per image, scoped or
  *   not), so the pair-count column would say nothing about the
  *   scoping trade — and its banding join IS q155's
  *   (hamming64Pairs), which the phash rows already measure.
  */
object ScopeBench {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val scopes = args.lift(1).map(_.toInt).getOrElse(4)
    val runs = args.lift(2).map(_.toInt).getOrElse(2)
    val family = args.lift(3).getOrElse("phash")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors.toString).toInt
    val spark = GraftSession.local(cpus)

    def best(mk: => org.apache.spark.sql.DataFrame): (Double, Long) = {
      var rows = mk.count() // untimed warmup (scan cache, codegen)
      var bestSecs = Double.MaxValue
      (0 until runs).foreach { _ =>
        val t0 = System.nanoTime()
        rows = mk.count()
        bestSecs = math.min(bestSecs, (System.nanoTime() - t0) / 1e9)
      }
      (bestSecs, rows)
    }

    // window width from the corpus's own id span (untimed; ids are
    // dense from 0 in the GenData family, contiguous ranges either way)
    val maxId = Tables(spark, dir, "media").agg(max("doc_id")).head.getLong(0)
    val width = math.max(1L, maxId / scopes + 1L)
    val scopeCol = floor(col("doc_id") / lit(width)).cast("long")
    val (unscoped, scoped) = family match {
      case "wav" => (operators.Multimodal.q157(spark, dir),
        operators.Multimodal.q157(spark, dir, scopeCol))
      case "phash" => (operators.Multimodal.q155(spark, dir),
        operators.Multimodal.q155(spark, dir, scopeCol))
      // a typo'd family must not silently time phash under the wrong
      // label — the JSON line is what measurement ledgers ingest
      case other => sys.error(s"unknown family '$other' (phash|wav)")
    }
    val (su, nu) = best(unscoped)
    val (ss, ns) = best(scoped)
    println(
      f"""{"bench":"scope","dir":"$dir","family":"$family","scopes":$scopes,"runs":$runs,""" +
        f""""unscoped_secs":$su%.1f,"scoped_secs":$ss%.1f,""" +
        s""""unscoped_pairs":$nu,"scoped_pairs":$ns}""")
    spark.stop()
  }
}
