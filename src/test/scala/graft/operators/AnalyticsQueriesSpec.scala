package graft.operators

import graft.SparkTestBase

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/**
 * Round-8 widening: KS test, Spearman rankCorr, Theil's U,
 * minMap/maxMap, the arrayCumSum/Difference/Compact trio, LIMIT WITH
 * TIES. Correctness is oracle-gated per key; these tests pin the
 * scale-relevant plan shapes plus driver-side recomputations of the
 * statistics from first principles (an independent algorithmic path —
 * sort-based ranks vs the relational distinct-value spelling).
 */
class AnalyticsQueriesSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  private val dir = SparkTestBase.sfDir

  private def run(key: String) = QueryRegistry.queries(key)(spark, dir)

  private def clicksAndPurchases(): (Array[Long], Array[Long]) = {
    val rows = Q.events(spark, dir)
      .filter(col("event_type").isin("click", "purchase"))
      .select(col("event_type"), floor(col("value") * 100).cast("long").as("c"))
      .collect()
    (rows.filter(_.getString(0) == "click").map(_.getLong(1)),
      rows.filter(_.getString(0) == "purchase").map(_.getLong(1)))
  }

  test("q_agg_kstest matches a sort-based driver recomputation exactly") {
    val r = run("q_agg_kstest").collect()(0)
    val (na, nb, dNum, ksD) =
      (r.getAs[Long]("na"), r.getAs[Long]("nb"),
        r.getAs[Long]("d_num"), r.getAs[Double]("ks_d"))
    val (a, b) = clicksAndPurchases()
    assert(na === a.length && nb === b.length)
    // independent path: walk the merged sorted values, track the two
    // empirical CDFs directly
    val xs = (a ++ b).distinct.sorted
    val expected = xs.map { x =>
      math.abs(a.count(_ <= x).toLong * nb - b.count(_ <= x).toLong * na)
    }.max
    assert(dNum === expected)
    assert(ksD >= 0.0 && ksD <= 1.0)
    assert(math.abs(ksD - dNum.toDouble / (na * nb)) < 1e-6)
  }

  test("q_agg_rank_corr matches a sort-based Spearman recomputation") {
    val r = run("q_agg_rank_corr").collect()(0)
    val rc = r.getAs[Double]("rank_corr")
    assert(rc >= -1.0 && rc <= 1.0)
    val rows = spark.read.parquet(s"$dir/lineitem.parquet")
      .select(floor(col("l_quantity") * 100).cast("long"),
        floor(col("l_extendedprice") * 100).cast("long"))
      .collect().map(x => (x.getLong(0), x.getLong(1)))
    // tie-averaged ranks by sorting (the textbook O(n log n) path)
    def ranks(v: Array[Long]): Array[Double] = {
      val grouped = v.zipWithIndex.sortBy(_._1)
      val out = new Array[Double](v.length)
      var i = 0
      while (i < grouped.length) {
        var j = i
        while (j < grouped.length && grouped(j)._1 == grouped(i)._1) j += 1
        val avg = (i + 1 + j) / 2.0 // mean of ranks i+1..j
        (i until j).foreach(k => out(grouped(k)._2) = avg)
        i = j
      }
      out
    }
    val rx = ranks(rows.map(_._1))
    val ry = ranks(rows.map(_._2))
    val n = rows.length.toDouble
    val (mx, my) = (rx.sum / n, ry.sum / n)
    val cov = rx.zip(ry).map { case (x, y) => (x - mx) * (y - my) }.sum
    val sx = math.sqrt(rx.map(x => (x - mx) * (x - mx)).sum)
    val sy = math.sqrt(ry.map(y => (y - my) * (y - my)).sum)
    assert(math.abs(rc - cov / (sx * sy)) < 1e-3, s"got $rc vs ${cov / (sx * sy)}")
  }

  test("q_agg_theils_u is asymmetric-association in [0,1] and matches recompute") {
    val u = run("q_agg_theils_u").collect()(0).getAs[Double]("theils_u")
    assert(u >= 0.0 && u <= 1.0, s"theils_u=$u")
    val cells = Q.events(spark, dir)
      .select(col("event_type"),
        floor(floor(col("value") * 100) / 10000.0).cast("long").as("bucket"))
      .groupBy("event_type", "bucket").count().collect()
      .map(r => ((r.getString(0), r.getLong(1)), r.getLong(2))).toMap
    val n = cells.values.sum.toDouble
    val nx = cells.groupBy(_._1._1).map { case (k, v) => k -> v.values.sum }
    val ny = cells.groupBy(_._1._2).map { case (k, v) => k -> v.values.sum }
    val hx = -nx.values.map(c => c / n * math.log(c / n)).sum
    val hxy = -cells.map { case ((_, y), o) =>
      o / n * math.log(o.toDouble / ny(y))
    }.sum
    assert(math.abs(u - (hx - hxy) / hx) < 1e-3, s"got $u vs ${(hx - hxy) / hx}")
  }

  test("q_agg_minmap: keys sorted, mins <= maxs elementwise, sumMap-consistent layout") {
    run("q_agg_minmap").collect().foreach { r =>
      val keys = r.getSeq[String](1)
      val mins = r.getSeq[Long](2)
      val maxs = r.getSeq[Long](3)
      assert(keys === keys.sorted)
      assert(keys.length === mins.length && keys.length === maxs.length)
      mins.zip(maxs).foreach { case (mn, mx) => assert(mn <= mx) }
    }
  }

  test("q_fn_array_transform: HOF semantics match scala reimplementation per row") {
    run("q_fn_array_transform").limit(500).collect().foreach { r =>
      val arr = r.getSeq[Long](1)
      val cum = r.getSeq[Long](2)
      val diff = r.getSeq[Long](3)
      val compacted = r.getSeq[Long](4)
      assert(cum === arr.scanLeft(0L)(_ + _).tail, s"cumsum of $arr")
      assert(diff === (0L +: arr.sliding(2).map(p => p(1) - p(0)).toSeq),
        s"difference of $arr")
      val exp = arr.foldLeft(Vector.empty[Long]) {
        case (acc, x) if acc.nonEmpty && acc.last == x => acc
        case (acc, x) => acc :+ x
      }
      assert(compacted === exp, s"compact of $arr")
    }
  }

  test("q_fn_array_transform stays whole-stage-codegen (no shuffle, no UDF)") {
    val phys = run("q_fn_array_transform").queryExecution.executedPlan.toString
    assert(!phys.contains("Exchange"), phys.take(2000))
    assert(!phys.contains("BatchEvalPython") && !phys.contains("ScalaUDF"),
      phys.take(2000))
  }

  test("q_limit_ties: no global sort of the fact side; WITH TIES contract holds") {
    val df = run("q_limit_ties")
    val phys = df.queryExecution.executedPlan.toString
    // the only ordered operator is the 1-row cutoff TakeOrdered; the
    // fact side must not be range-partition sorted
    assert(phys.contains("TakeOrderedAndProject"), phys.take(2000))
    assert(!phys.contains("rangepartitioning"), phys.take(2000))
    val rows = df.collect().map(_.getLong(1))
    assert(rows.length >= 100)
    val all = spark.read.parquet(s"$dir/orders.parquet")
      .select(floor(col("o_totalprice") * 100).cast("long")).collect()
      .map(_.getLong(0)).sorted(Ordering[Long].reverse)
    val cutoff = all(99)
    // every returned row ties-or-beats the 100th price; every
    // qualifying row is returned (the WITH TIES closure)
    assert(rows.forall(_ >= cutoff))
    assert(rows.length === all.count(_ >= cutoff))
  }
}
