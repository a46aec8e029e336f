package graft

import org.apache.spark.sql.functions._

/** A/B harness for the r13 dedup-domain SCOPING path (SURVEY §15):
  * times [[graft.operators.Multimodal.q155]] unscoped vs scoped into
  * `scopes` id-sharded domains (`pmod(doc_id, scopes)` — the
  * ingestion-window sharding shape) over a media corpus, best-of-N
  * with an untimed warmup pass, and prints ONE JSON line. The scoped
  * pair count is strictly ≤ the unscoped one (cross-scope pairs are
  * the contract's exclusion class) — both counts print so the
  * trade is explicit.
  *
  * usage: runMain graft.ScopeBench <mediaDir> [scopes] [runs]
  */
object ScopeBench {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val scopes = args.lift(1).map(_.toInt).getOrElse(4)
    val runs = args.lift(2).map(_.toInt).getOrElse(2)
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

    val (su, nu) = best(operators.Multimodal.q155(spark, dir))
    val (ss, ns) = best(operators.Multimodal.q155(spark, dir,
      pmod(col("doc_id"), lit(scopes.toLong))))
    println(
      f"""{"bench":"scope","dir":"$dir","scopes":$scopes,"runs":$runs,""" +
        f""""unscoped_secs":$su%.1f,"scoped_secs":$ss%.1f,""" +
        s""""unscoped_pairs":$nu,"scoped_pairs":$ns}""")
    spark.stop()
  }
}
