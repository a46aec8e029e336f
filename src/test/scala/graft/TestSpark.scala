package graft

import org.apache.spark.sql.SparkSession

/** One shared local session for the whole test run — built through
  * GraftSession so tests exercise the SAME config (AQE, UTC,
  * nanosAsLong, GraftExtensions) as Verify/Bench physical plans.
  */
object TestSpark {
  lazy val spark: SparkSession = GraftSession.local(4, 4)
  val sf: String = "/root/testdata/sf0.001"
}
