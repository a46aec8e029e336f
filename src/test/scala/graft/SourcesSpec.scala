package graft

import graft.sources.Sources
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** SURVEY §2.H: csv + json round-trips preserve values under an
  * explicit schema, and partitioned parquet writes produce scans
  * that partition-prune.
  */
class SourcesSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = TestSpark.sf

  private def tmp(name: String) =
    java.nio.file.Files.createTempDirectory(s"graft-$name").toString

  test("csv round-trip preserves nation rows exactly") {
    val nation = Tables(spark, sf, "nation")
    val dir = tmp("csv")
    Sources.writeCsv(nation, dir)
    val back = Sources.readCsv(spark, dir, nation.schema)
    assert(back.schema == nation.schema)
    assert(back.exceptAll(nation).isEmpty && nation.exceptAll(back).isEmpty)
  }

  test("json-lines round-trip preserves order rows exactly") {
    val orders = Tables(spark, sf, "orders").limit(500)
    val dir = tmp("json")
    Sources.writeJsonLines(orders, dir)
    val back = Sources.readJsonLines(spark, dir, orders.schema)
    assert(back.count() == 500)
    assert(back.exceptAll(orders).isEmpty)
  }

  test("orc round-trip preserves lineitem rows and pushes filters to the scan") {
    val li = Tables(spark, sf, "lineitem").limit(1000)
    val dir = tmp("orc")
    Sources.writeOrc(li, dir)
    val back = Sources.readOrc(spark, dir)
    assert(back.count() == 1000)
    assert(back.exceptAll(li).isEmpty)
    val filtered = Sources.readOrc(spark, dir).filter(col("l_quantity") > 25.0)
    val scan = filtered.queryExecution.executedPlan.collectLeaves().head.toString
    assert(scan.contains("PushedFilters") && scan.contains("l_quantity"),
      s"filter not pushed to ORC scan: $scan")
  }

  test("partitioned parquet write prunes partitions on read") {
    val ev = Tables(spark, sf, "events")
    val dir = tmp("part")
    Sources.writePartitioned(ev, dir, "event_type")
    val pruned = Sources.readParquet(spark, dir).filter(col("event_type") === "purchase")
    // the partition filter must reach the scan, not a post-scan Filter
    val scan = pruned.queryExecution.executedPlan.collectLeaves().head.toString
    assert(scan.contains("PartitionFilters") && scan.contains("event_type"))
    val expected = ev.filter(col("event_type") === "purchase").count()
    assert(pruned.count() == expected)
  }
}
