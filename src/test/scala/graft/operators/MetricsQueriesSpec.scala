package graft.operators

import graft.SparkTestBase

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/**
 * Round-10 metrics pack. Oracles are hash-gated by the driver; these
 * tests pin the SEMANTICS against independent driver-side
 * recomputations (AUC via the O(n log n) sort method, asof-nearest
 * via per-user linear scan) and the rendering invariants.
 */
class MetricsQueriesSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  private val dir = SparkTestBase.sfDir

  private def run(key: String) = QueryRegistry.queries(key)(spark, dir)

  test("q_agg_auc matches the sort-based AUC recomputation") {
    val row = run("q_agg_auc").head()
    val got = row.getAs[Double]("auc")
    // independent recompute: sort by score, tie-averaged ranks, rank-sum
    val ev = Q.events(spark, dir)
      .select((col("event_type") === "purchase").cast("int").as("y"),
        floor(col("value") * 100).cast("long").as("sc"))
      .collect().map(r => (r.getLong(1), r.getInt(0)))
    val n = ev.length
    val byScore = ev.sortBy(_._1)
    // tie-averaged ranks via group walks
    var i = 0
    var rankSumPos = 0.0
    var npos = 0L
    while (i < n) {
      var j = i
      while (j < n && byScore(j)._1 == byScore(i)._1) j += 1
      val avgRank = (i + 1 + j) / 2.0 // mean of ranks i+1..j
      var k = i
      while (k < j) {
        if (byScore(k)._2 == 1) { rankSumPos += avgRank; npos += 1 }
        k += 1
      }
      i = j
    }
    val nneg = n - npos
    val want = (rankSumPos - npos * (npos + 1) / 2.0) / (npos.toDouble * nneg)
    assert(math.abs(got - want) < 5e-7, s"got $got want $want")
    assert(row.getAs[Long]("npos") === npos)
    assert(row.getAs[Long]("nneg") === nneg)
  }

  test("q_agg_sparkbar bars are 24 glyphs with the max hour at full block") {
    val rows = run("q_agg_sparkbar").collect()
    assert(rows.nonEmpty)
    val counts = Q.events(spark, dir)
      .groupBy(col("event_type"), hour(col("ts")).as("h")).count()
      .collect().map(r => (r.getString(0), r.getInt(1)) -> r.getLong(2)).toMap
    rows.foreach { r =>
      val (et, mx, bar) = (r.getString(0), r.getLong(1), r.getString(2))
      assert(bar.codePointCount(0, bar.length) === 24, s"$et bar=$bar")
      // the argmax hour renders the full block █ (level 8)
      val byH = (0 until 24).map(h => counts.getOrElse((et, h), 0L))
      assert(byH.max === mx)
      val argmax = byH.indexOf(mx)
      assert(bar.charAt(argmax) === '█', s"$et hour=$argmax bar=$bar")
      // empty buckets are spaces, non-empty are ramp glyphs
      (0 until 24).foreach { h =>
        val c = bar.charAt(h)
        if (byH(h) == 0) assert(c === ' ')
        else {
          assert(c >= '▁' && c <= '█')
          val lvl = (byH(h) * 8 + mx - 1) / mx
          assert(c === ('▁' + (lvl - 1)).toChar, s"$et h=$h cnt=${byH(h)} mx=$mx")
        }
      }
    }
  }

  test("q_fn_format_readable renders known boundary values exactly") {
    import spark.implicits._
    // drive the same rendering expressions through a controlled input
    // by reusing the key over a fixture is awkward; instead pin the
    // arithmetic contract on the real output: parse back and check
    val rows = run("q_fn_format_readable").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val v = r.getAs[Long]("v")
      val size = r.getAs[String]("size_str")
      val qty = r.getAs[String]("qty_str")
      val (unit, div) =
        if (v < 1024L) (" B", 1L)
        else if (v < 1024L * 1024) (" KiB", 1024L)
        else if (v < 1024L * 1024 * 1024) (" MiB", 1024L * 1024)
        else (" GiB", 1024L * 1024 * 1024)
      assert(size.endsWith(unit), s"v=$v size=$size")
      val scaled = v * 100 / div
      assert(size === s"${scaled / 100}.${"%02d".format(scaled % 100)}$unit",
        s"v=$v")
      if (v >= 1000L && v < 1000000L) assert(qty.endsWith(" thousand"))
      if (v >= 1000000L && v < 1000000000L) assert(qty.endsWith(" million"))
    }
  }

  test("q_join_asof_nearest matches per-user linear-scan recompute") {
    val got = run("q_join_asof_nearest").collect()
      .map(r => r.getLong(0) -> Option(r.get(1)).map(_.toString)).toMap
    val ev = Q.events(spark, dir)
      .filter(col("event_type").isin("purchase", "signup"))
      .select(col("event_id"), col("user_id"), col("event_type"),
        unix_micros(col("ts").cast("timestamp")).as("tus"), col("ts"))
      .collect()
    val byUser = ev.groupBy(_.getLong(1))
    var checked = 0
    byUser.values.foreach { rows =>
      val signups = rows.filter(_.getString(2) == "signup")
        .map(r => (r.getLong(3), r.get(4)))
      rows.filter(_.getString(2) == "purchase").foreach { p =>
        val pid = p.getLong(0)
        val pt = p.getLong(3)
        val want =
          if (signups.isEmpty) None
          else Some(signups.minBy { case (st, _) =>
            (math.abs(pt - st) * 2 + (if (st > pt) 1 else 0), st)
          }._2.toString)
        assert(got(pid) === want, s"purchase $pid")
        checked += 1
      }
    }
    assert(checked > 0 && checked === got.size)
  }

  test("new metric keys stay codegen-clean: no UDF in any plan") {
    Seq("q_agg_auc", "q_agg_sparkbar", "q_fn_format_readable",
      "q_agg_contingency", "q_agg_categorical_iv", "q_fn_array_enumerate",
      "q_join_asof_nearest").foreach { k =>
      val plan = run(k).queryExecution.executedPlan.toString
      assert(!plan.contains("BatchEvalPython") && !plan.contains("ScalaUDF"),
        s"$k plan contains a UDF")
    }
  }
}
