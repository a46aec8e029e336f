package graft

/** A/B harness for the r13 bounded Lloyd fit sample
  * ([[graft.operators.Similarity.FitSampleFloor]], SURVEY §15):
  * times the IVF coarse-quantizer fit (Lloyd iterations + the full
  * assignment pass, forced via `cells.count()`) at the shipped
  * sampled defaults vs `fitFloor` pushed past n — the latter is
  * bit-identical to the pre-r13 unsampled fit, so one binary
  * measures both sides. Also prints each fit's mean quantization
  * error (mean ||v − centroid(v)||² over the FULL corpus) and the
  * sampled/full ratio: the quality claim is that centroids
  * estimated from the bounded sample quantize the corpus as well as
  * centroids fit on everything (ratio ≈ 1), mirroring the
  * AnnIndex refitGate's MSE statistic.
  *
  * usage: runMain graft.FitBench <dir> [runs]
  */
object FitBench {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val runs = args.lift(1).map(_.toInt).getOrElse(1)
    require(runs >= 1, s"runs must be >= 1, got $runs")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors.toString).toInt
    val spark = GraftSession.local(cpus)
    import spark.implicits._

    val emb = Tables(spark, dir, "embeddings")
    val n = emb.count() // untimed: warms the scan + pins n for the line

    // mean ||v - cent(cid)||^2 over the full corpus — diagnostic
    // print only (double tree merge), never oracle-compared
    def mse(cells: org.apache.spark.sql.DataFrame,
        cents: Array[Array[Double]]): Double = {
      val bc = spark.sparkContext.broadcast(cents)
      val (s, c) = cells.select("cid", "ed").as[(Int, Seq[Float])]
        .rdd.mapPartitions { it =>
          val cs = bc.value
          var acc = 0.0; var cnt = 0L
          it.foreach { case (cid, v) =>
            val cv = cs(cid)
            val m = math.min(v.length, cv.length)
            var d = 0.0; var i = 0
            while (i < m) { val t = v(i) - cv(i); d += t * t; i += 1 }
            acc += d; cnt += 1L
          }
          Iterator.single((acc, cnt))
        }.reduce((a, b) => (a._1 + b._1, a._2 + b._2))
      bc.unpersist()
      s / math.max(1L, c)
    }

    def time(fitFloor: Long): (Double, Double) = {
      var bestSecs = Double.MaxValue
      var last: (org.apache.spark.sql.DataFrame, Array[Array[Double]]) = null
      (0 until runs).foreach { _ =>
        val t0 = System.nanoTime()
        val (cells, cents) = operators.Similarity.ivfCellsOf(
          spark, emb, None, fitFloor = fitFloor)
        cells.count() // the fit is eager; this forces the assignment pass
        bestSecs = math.min(bestSecs, (System.nanoTime() - t0) / 1e9)
        last = (cells, cents)
      }
      // untimed, ONCE: the fit is deterministic so every run's cells
      // are identical, and mse's traversal re-executes the lazy
      // assignment — inside the loop it doubled each run's work
      (bestSecs, mse(last._1, last._2))
    }

    val (fullS, fullE) = time(Long.MaxValue)
    val (sampS, sampE) = time(operators.Similarity.FitSampleFloor)
    println(
      f"""{"bench":"fit","dir":"$dir","n":$n,"runs":$runs,""" +
        f""""full_secs":$fullS%.1f,"sampled_secs":$sampS%.1f,""" +
        f""""full_mse":$fullE%.6f,"sampled_mse":$sampE%.6f,""" +
        f""""mse_ratio":${sampE / fullE}%.4f}""")
    spark.stop()
  }
}
