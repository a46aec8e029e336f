package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

class RelationalSpec extends AnyFunSuite {
  import TestSpark.{spark, sf}

  test("every relational query returns rows at sf0.001") {
    operators.Relational.qs.foreach { q =>
      assert(q.fn(spark, sf).count() > 0, s"${q.name} returned no rows")
    }
  }

  test("q01 groups are the 6 (returnflag, linestatus) combos") {
    val rows = operators.Relational.q01(spark, sf).collect()
    assert(rows.length == 6)
    assert(rows.forall(r => r.getAs[Long]("count_order") > 0))
  }

  test("q03 top-k is sorted desc by revenue with orderkey tiebreak") {
    val rev = operators.Relational.q03(spark, sf)
      .select("revenue").collect().map(_.getDouble(0))
    assert(rev.length <= 10 && (rev, rev.sorted.reverse).zipped.forall(_ == _))
  }

  test("q09 cumulative revenue is monotone per supplier") {
    val bad = operators.Relational.q09(spark, sf)
      .withColumn("prev", lag("cum_revenue", 1).over(
        org.apache.spark.sql.expressions.Window.partitionBy("l_suppkey").orderBy("day")))
      .filter(col("prev").isNotNull && col("cum_revenue") < col("prev"))
    assert(bad.count() == 0)
  }

  test("q10 keeps at most 3 parts per brand") {
    val over = operators.Relational.q10(spark, sf)
      .groupBy("p_brand").count().filter(col("count") > 3)
    assert(over.count() == 0)
  }

  test("q12 passes only positive quantities and prices") {
    val df = operators.Relational.q12(spark, sf)
    assert(df.filter(col("total_amount") <= 0).count() == 0)
  }

  test("q13 has exactly one first_purchase per customer") {
    val df = operators.Relational.q13(spark, sf)
      .filter(col("order_category") === "first_purchase")
      .groupBy("o_custkey").count().filter(col("count") =!= 1)
    assert(df.count() == 0)
  }

  test("broadcast hints survive into q02 physical plan") {
    val plan = operators.Relational.q02(spark, sf)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), "expected broadcast joins for dims")
  }

  test("q15 rollup totals are consistent across grouping levels") {
    val df = operators.Relational.q15(spark, sf)
    val grand = df.filter(col("nation") === "ALL").select("n_orders").head().getLong(0)
    val nationTotals = df.filter(col("nation") =!= "ALL" && col("o_year") === -1)
      .agg(sum("n_orders")).head().getLong(0)
    val detail = df.filter(col("o_year") =!= -1)
      .agg(sum("n_orders")).head().getLong(0)
    assert(grand == nationTotals && grand == detail)
  }

  test("q14 HLL estimate is within 5% of exact distinct counts") {
    val exact = operators.Relational.q11(spark, sf)
      .select(col("event_type"), col("n_users"))
    val approx = operators.Relational.q14(spark, sf)
      .select(col("event_type"), col("approx_users"))
    val bad = exact.join(approx, "event_type")
      .filter(abs(col("approx_users") - col("n_users")) > col("n_users") * 0.05)
    assert(bad.count() == 0, bad.collect().mkString(", "))
  }

  test("q19 approx quantiles stay within rank tolerance of exact percentiles") {
    val approx = operators.Relational.q19(spark, sf)
    val exact = Tables(spark, sf, "lineitem")
      .join(Tables(spark, sf, "part").select("p_partkey", "p_brand"),
        col("l_partkey") === col("p_partkey"))
      .groupBy("p_brand")
      .agg(expr("percentile(l_extendedprice, 0.5)").as("p50"),
        expr("percentile(l_extendedprice, 0.9)").as("p90"),
        expr("percentile(l_extendedprice, 0.45)").as("p45"),
        expr("percentile(l_extendedprice, 0.55)").as("p55"),
        expr("percentile(l_extendedprice, 0.85)").as("p85"),
        expr("percentile(l_extendedprice, 0.95)").as("p95"))
    // GK sketch guarantees a RANK error bound; check the value lands
    // within the surrounding exact-percentile bracket
    val bad = approx.join(exact, "p_brand")
      .filter(col("p50_approx") < col("p45") || col("p50_approx") > col("p55") ||
        col("p90_approx") < col("p85") || col("p90_approx") > col("p95"))
    assert(bad.count() == 0, bad.collect().mkString(", "))
  }

  test("q17 pivot cells sum to the flat revenue total") {
    val df = operators.Relational.q17(spark, sf)
    assert(df.columns.toSeq == "n_name" +: (1995 to 2001).map(_.toString))
    val pivotTotal = df.select(
      (1995 to 2001).map(y => coalesce(col(s"`$y`"), lit(0.0))).reduce(_ + _).as("s"))
      .agg(sum("s")).collect()(0).getDouble(0)
    val flatTotal = Tables(spark, sf, "orders")
      .groupBy(col("o_custkey"))
      .agg(operators.ops.r2(sum("o_totalprice")).as("r"))
      .agg(sum("r")).collect()(0).getDouble(0)
    // same facts, different grouping: totals agree to rounding slack
    assert(math.abs(pivotTotal - flatTotal) < 1.0,
      s"pivot total $pivotTotal vs flat $flatTotal")
  }

  test("q18 moving average equals daily revenue when windows are singleton, and smooths otherwise") {
    val df = operators.Relational.q18(spark, sf)
    // every (priority, day) appears once; the 7-day average never
    // exceeds the max daily revenue within its trailing week
    assert(df.groupBy("o_orderpriority", "day").count().filter(col("count") > 1).count() == 0)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("o_orderpriority")
      .orderBy(datediff(col("day"), lit("1990-01-01").cast("date")))
      .rangeBetween(-6, 0)
    val bad = df
      .withColumn("mx", max("revenue").over(w))
      .withColumn("mn", min("revenue").over(w))
      .filter(col("rev_7d_avg") > col("mx") + 0.01 || col("rev_7d_avg") < col("mn") - 0.01)
    assert(bad.count() == 0, "moving average escaped its window bounds")
  }

  test("q116 cdc apply: reprices win at v2, deletes vanish, untouched keys pass through") {
    val out = operators.Relational.q116(spark, sf).cache()
    val orders = Tables(spark, sf, "orders")
    val nKeys = orders.count()
    val nDel = orders.filter(col("o_orderkey") % 13 === 0).count()
    assert(out.count() == nKeys - nDel)
    assert(out.filter(col("o_orderkey") % 13 === 0).count() == 0)
    // every surviving %7 key carries the reprice (version 2, status U, price +1.0)
    val base = orders.select(col("o_orderkey"), col("o_totalprice").as("orig"))
    val rep = out.filter(col("o_orderkey") % 7 === 0).join(base, "o_orderkey")
    assert(rep.count() > 0)
    assert(rep.filter(col("version") =!= 2L || col("o_orderstatus") =!= "U"
      || col("o_totalprice") =!= col("orig") + lit(1.0)).count() == 0)
    // untouched keys pass through at version 1 with the original price
    val un = out.filter(col("o_orderkey") % 7 =!= 0).join(base, "o_orderkey")
    assert(un.filter(col("version") =!= 1L || col("o_totalprice") =!= col("orig")).count() == 0)
    out.unpersist()
  }

  test("q117 scd2 history: intervals chain, deletes close history, current rows equal q116 winners") {
    val hist = operators.Relational.q117(spark, sf).cache()
    // closed intervals are strictly forward in version space
    assert(hist.filter(col("valid_to").isNotNull &&
      col("valid_to") <= col("valid_from")).count() == 0)
    // every order key has history (tombstones close, never erase, it)
    val orders = Tables(spark, sf, "orders")
    assert(hist.select("o_orderkey").distinct().count() == orders.count())
    // at most one current row per key; none for tombstoned keys
    val cur = hist.filter(col("is_current"))
    assert(cur.groupBy("o_orderkey").count().filter(col("count") > 1).count() == 0)
    assert(cur.filter(col("o_orderkey") % 13 === 0).count() == 0)
    // the current rows ARE q116's latest-wins winners, key and version
    val w116 = operators.Relational.q116(spark, sf)
      .select(col("o_orderkey"), col("version"))
    val w117 = cur.select(col("o_orderkey"), col("valid_from").as("version"))
    assert(w116.exceptAll(w117).count() == 0 && w117.exceptAll(w116).count() == 0)
    hist.unpersist()
  }

  test("q126 fk audit is all-clean on the live tables and counts injected orphans exactly") {
    val clean = operators.Relational.q126(spark, sf).collect()
    assert(clean.map(_.getString(0)).toSeq == Seq("customer_nationkey", "lineitem_orderkey",
      "lineitem_partkey", "lineitem_suppkey", "orders_custkey"))
    assert(clean.forall(r => r.getLong(2) == 0L && r.getLong(3) == 0L),
      s"live tables reported orphans: ${clean.mkString(", ")}")
    // corrupted copy: drop every 10th order -> those lineitems orphan
    TestSpark.withTmpDir("fk") { dir =>
      Seq("lineitem", "part", "supplier", "customer", "nation").foreach { t =>
        Tables(spark, sf, t).write.mode("overwrite").parquet(s"$dir/$t.parquet")
      }
      val orders = Tables(spark, sf, "orders")
      orders.filter(col("o_orderkey") % 10 =!= 0)
        .write.mode("overwrite").parquet(s"$dir/orders.parquet")
      val li = Tables(spark, sf, "lineitem")
      val expectOrphans = li.filter(col("l_orderkey") % 10 === 0).count()
      val corrupted = operators.Relational.q126(spark, dir).collect()
        .map(r => r.getString(0) -> r.getLong(2)).toMap
      assert(corrupted("lineitem_orderkey") == expectOrphans,
        s"expected $expectOrphans orphans, got ${corrupted("lineitem_orderkey")}")
      assert(corrupted("lineitem_partkey") == 0L && corrupted("orders_custkey") == 0L)
    }
  }

  test("q123 exact percentiles equal a local sorted-selection recompute") {
    val got = operators.Relational.q123(spark, sf).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getDouble(2), r.getDouble(3)))).toMap
    val vals = Tables(spark, sf, "lineitem")
      .join(Tables(spark, sf, "part").select("p_partkey", "p_brand"),
        col("l_partkey") === col("p_partkey"))
      .select(col("p_brand"), operators.ops.cents(col("l_extendedprice")).as("cents"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
    val want = vals.groupBy(_._1).map { case (brand, rows) =>
      val sorted = rows.map(_._2).sorted
      val n = sorted.length.toLong
      def disc(p: Long): Double = sorted(((n * p + 99L) / 100L).toInt - 1) / 100.0
      brand -> ((n, disc(50), disc(90)))
    }
    assert(got == want, s"first diff: ${got.find(kv => want.get(kv._1) != Some(kv._2))}")
  }

  private def r6l(x: Double): Double = math.floor(x * 1e6 + 0.5) / 1e6

  test("q139 ship-latency percentiles equal a local sorted-selection recompute") {
    val got = operators.Relational.q139(spark, sf).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getInt(2), r.getInt(3), r.getInt(4)))).toMap
    val lags = Tables(spark, sf, "lineitem").select("l_orderkey", "l_shipdate")
      .join(Tables(spark, sf, "orders"), col("l_orderkey") === col("o_orderkey"))
      .select(col("o_orderpriority"),
        datediff(to_date(col("l_shipdate")), to_date(col("o_orderdate"))).as("lag"))
      .collect().map(r => (r.getString(0), r.getInt(1)))
    val want = lags.groupBy(_._1).map { case (prio, rows) =>
      val sorted = rows.map(_._2).sorted
      val n = sorted.length.toLong
      def disc(p: Long): Int = sorted(((n * p + 99L) / 100L).toInt - 1)
      prio -> ((n, disc(50), disc(90), sorted.last))
    }
    assert(got == want, s"first diff: ${got.find(kv => want.get(kv._1) != Some(kv._2))}")
  }

  test("q149 brand loyalty equals a local distinct-triple recompute") {
    val got = operators.Relational.q149(spark, sf).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))))
      .toMap
    val triples = Tables(spark, sf, "lineitem")
      .join(Tables(spark, sf, "part").select("p_partkey", "p_brand"),
        col("l_partkey") === col("p_partkey"))
      .join(Tables(spark, sf, "orders").select("o_orderkey", "o_custkey"),
        col("l_orderkey") === col("o_orderkey"))
      .select("p_brand", "o_custkey", "o_orderkey").distinct()
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val want = triples.groupBy(_._1).map { case (brand, ts) =>
      val perCust = ts.groupBy(_._2).map(_._2.length.toLong)
      val (n, rep) = (perCust.size.toLong, perCust.count(_ >= 2).toLong)
      brand -> ((n, rep, rep * 1000000L / n, perCust.sum))
    }
    assert(got == want, s"first diff: ${got.find(kv => want.get(kv._1) != Some(kv._2))}")
  }

  test("q150 discount ladder partitions lineitem with exact integer averages") {
    val rows = operators.Relational.q150(spark, sf).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4))))
      .toMap
    val li = Tables(spark, sf, "lineitem")
      .select("l_discount", "l_quantity", "l_extendedprice").collect()
      .map(r => (math.floor(r.getDouble(0) * 100.0 + 0.5).toLong, r.getDouble(1),
        r.getDouble(2), r.getDouble(0)))
    assert(rows.values.map(_._1).sum == li.length)
    def cents(d: Double) = math.floor(d * 100.0 + 0.5).toLong
    def r4(x: Double) = math.floor(x * 1e4 + 0.5) / 1e4
    val want = li.groupBy(_._1).map { case (band, xs) =>
      val n = xs.length.toLong
      band -> ((n,
        r4(xs.map(x => cents(x._2)).sum / (100.0 * n)),
        r4(xs.map(x => cents(x._3)).sum / (100.0 * n)),
        xs.map(x => cents(x._3 * (1.0 - x._4))).sum / 100.0))
    }
    assert(rows == want, s"first diff: ${rows.find(kv => want.get(kv._1) != Some(kv._2))}")
  }

  test("q142 wallet deciles partition customers with monotone shares") {
    val rows = operators.Relational.q142(spark, sf).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(3), r.getLong(4)))
    assert(rows.map(_._1).toSeq == (1 to 10))
    val nCust = Tables(spark, sf, "orders").select("o_custkey").distinct().count()
    assert(rows.map(_._2).sum == nCust)
    // SQL-standard ntile sizes; revenue-desc ranking makes shares non-increasing
    val sizes = rows.map(_._2)
    assert(sizes.max - sizes.min <= 1 && sizes.sorted.reverse.sameElements(sizes))
    assert(rows.sliding(2).forall { case Array(a, b) => a._3 >= b._3 })
    // cumulative share closes at exactly one million ppm
    assert(rows.last._4 == 1000000L)
    assert(rows.sliding(2).forall { case Array(a, b) => a._4 <= b._4 })
  }

  test("q128 abc classes equal a local pareto recompute") {
    val got = operators.Relational.q128(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getDouble(3), r.getDouble(4)))).toMap
    val partRev = Tables(spark, sf, "lineitem")
      .join(Tables(spark, sf, "part").select("p_partkey", "p_brand"),
        col("l_partkey") === col("p_partkey"))
      .groupBy("p_brand", "p_partkey")
      .agg(sum(operators.ops.cents(
        col("l_extendedprice") * (lit(1.0) - col("l_discount")))).as("cents"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val want = partRev.groupBy(_._1).flatMap { case (brand, rows) =>
      val sorted = rows.map(t => (t._3, t._2)).sortBy(t => (-t._1, t._2))
      val tot = sorted.map(_._1).sum
      var cum = 0L
      val classed = sorted.map { case (c, _) =>
        cum += c
        val cls = if (cum * 100 <= tot * 80) "A" else if (cum * 100 <= tot * 95) "B" else "C"
        (cls, c)
      }
      classed.groupBy(_._1).map { case (cls, cs) =>
        (brand, cls) -> ((cs.length.toLong, cs.map(_._2).sum / 100.0,
          r6l(cs.map(_._2).sum.toDouble / tot.toDouble)))
      }
    }
    assert(got == want, s"first diff: ${got.find(kv => want.get(kv._1) != Some(kv._2))}")
  }

  test("q129 slope equals an exact BigInt regression per brand") {
    val got = operators.Relational.q129(spark, sf).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getDouble(2),
        if (r.isNullAt(3)) None else Some(r.getDouble(3))))).toMap
    val rows = Tables(spark, sf, "lineitem")
      .groupBy("l_partkey").agg(sum(operators.ops.cents(col("l_quantity"))).as("qc"))
      .join(Tables(spark, sf, "part").select(col("p_partkey"), col("p_brand"),
        operators.ops.cents(col("p_retailprice")).as("pc")),
        col("l_partkey") === col("p_partkey"))
      .select("p_brand", "pc", "qc")
      .collect().map(r => (r.getString(0), BigInt(r.getLong(1)), BigInt(r.getLong(2))))
    val want = rows.groupBy(_._1).map { case (brand, ps) =>
      val n = BigInt(ps.length)
      val sx = ps.map(_._2).sum; val sy = ps.map(_._3).sum
      val sxy = ps.map(p => p._2 * p._3).sum; val sxx = ps.map(p => p._2 * p._2).sum
      val (num, den) = (n * sxy - sx * sy, n * sxx - sx * sx)
      val avg = math.floor(sy.toDouble / (100.0 * n.toDouble) * 1e4 + 0.5) / 1e4
      brand -> ((ps.length.toLong, avg,
        if (den == 0) None else Some(r6l(num.toDouble / den.toDouble))))
    }
    assert(got == want, s"first diff: ${got.find(kv => want.get(kv._1) != Some(kv._2))}")
  }

  test("q130 gini equals an exact local rank recompute and sits in [0,1)") {
    val got = operators.Relational.q130(spark, sf).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getDouble(2), r.getDouble(3)))).toMap
    assert(got.values.forall(v => v._3 >= 0.0 && v._3 < 1.0))
    val per = Tables(spark, sf, "orders")
      .join(Tables(spark, sf, "customer").select("c_custkey", "c_mktsegment"),
        col("o_custkey") === col("c_custkey"))
      .groupBy("c_mktsegment", "o_custkey")
      .agg(sum(operators.ops.cents(col("o_totalprice"))).as("cents"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val want = per.groupBy(_._1).map { case (seg, cs) =>
      val sorted = cs.map(t => (t._3, t._2)).sortBy(identity)
      val n = sorted.length.toLong
      val t = sorted.map(c => BigInt(c._1)).sum
      val sr = sorted.zipWithIndex.map { case ((c, _), i) => BigInt(i + 1) * c }.sum
      val g = 2.0 * sr.toDouble / (n.toDouble * t.toDouble) - (n.toDouble + 1.0) / n.toDouble
      seg -> ((n, t.toDouble / 100.0, r6l(g)))
    }
    assert(got == want, s"first diff: ${got.find(kv => want.get(kv._1) != Some(kv._2))}")
  }
}
