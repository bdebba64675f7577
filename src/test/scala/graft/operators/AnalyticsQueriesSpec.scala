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

  test("rank_corr rank table: range-partitioned prefix sum == single window") {
    // Tie-heavy, negative-value, skewed fixture: repeated blocks (one
    // hot value with 500 duplicates), a dense unique run, and sparse
    // high values with varying tie counts — every case the doubled
    // tie-averaged rank formula must agree on between the two shapes.
    import spark.implicits._
    val vs: Seq[Long] = Seq.fill(500)(7L) ++ (100L to 499L) ++
      Seq.fill(300)(-3L) ++
      (1000L to 1200L).flatMap(v => Seq.fill((v % 5).toInt + 1)(v))
    val bv = vs.toDF("v").groupBy(col("v")).agg(count(lit(1)).as("cnt"))
    def rowsOf(df: org.apache.spark.sql.DataFrame): Seq[(Long, Long)] =
      df.collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1).toSeq
    val windowed = AnalyticsQueries.rankTableWindowed(bv, "x", "r")
    val partitioned = AnalyticsQueries.rankTablePartitioned(bv, "x", "r")
    assert(rowsOf(partitioned) === rowsOf(windowed))
    // The at-scale shape's only unpartitioned window runs over the
    // per-partition totals table (bounded by shuffle partitions);
    // the data-sized cumulative window is partition-local.
    val plan = partitioned.queryExecution.executedPlan.toString
    assert(plan.contains("ExistingRDD"),
      "partitioned rank table should materialize its range partitioning once (localCheckpoint)")
  }

  test("q_agg_rank_corr size switch: forced-partitioned result identical") {
    val default = run("q_agg_rank_corr").collect()(0).getAs[Double]("rank_corr")
    spark.conf.set("spark.graft.rankcorr.partition.minBytes", "0")
    try {
      val forced = run("q_agg_rank_corr")
      val plan = forced.queryExecution.executedPlan.toString
      assert(plan.contains("ExistingRDD"),
        "minBytes=0 must flip the rank tables to the partitioned shape")
      assert(forced.collect()(0).getAs[Double]("rank_corr") === default)
    } finally spark.conf.unset("spark.graft.rankcorr.partition.minBytes")
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
    // registry output is Q.strArr-serialized ('|'-joined) — parse back
    run("q_agg_minmap").collect().foreach { r =>
      val keys = r.getString(1).split('|').toSeq
      val mins = r.getString(2).split('|').toSeq.map(_.toLong)
      val maxs = r.getString(3).split('|').toSeq.map(_.toLong)
      assert(keys === keys.sorted)
      assert(keys.length === mins.length && keys.length === maxs.length)
      mins.zip(maxs).foreach { case (mn, mx) => assert(mn <= mx) }
    }
  }

  test("q_fn_array_transform: HOF semantics match scala reimplementation per row") {
    // registry output is Q.strArr-serialized ('|'-joined) — parse back
    def longs(r: org.apache.spark.sql.Row, i: Int): Seq[Long] = {
      val s = r.getString(i)
      if (s.isEmpty) Seq.empty else s.split('|').toSeq.map(_.toLong)
    }
    run("q_fn_array_transform").limit(500).collect().foreach { r =>
      val arr = longs(r, 1)
      val cum = longs(r, 2)
      val diff = longs(r, 3)
      val compacted = longs(r, 4)
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

  test("q_agg_time_decay: window decomposition matches brute-force recompute; no collect in plan") {
    val df = run("q_agg_time_decay")
    val phys = df.queryExecution.executedPlan.toString
    // decomposed into plain window sums — no collect_list state per row
    assert(!phys.contains("collect_list"), phys.take(2000))
    val rows = Q.events(spark, dir)
      .select(col("user_id"), col("event_id"),
        unix_timestamp(col("ts").cast("timestamp")).as("t"),
        floor(col("value") * 100).cast("long").as("c"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val byUser = rows.groupBy(_._1)
    val expect = rows.map { case (u, eid, t, _) =>
      val units = byUser(u).collect {
        case (_, _, tj, cj) if tj >= t - 3600 && tj <= t =>
          cj * (3600 + tj - t)
      }.sum
      (u, eid) -> units
    }.toMap
    df.collect().foreach { r =>
      val k = (r.getAs[Long]("user_id"), r.getAs[Long]("event_id"))
      assert(r.getAs[Long]("units") === expect(k), s"row $k")
    }
  }

  test("exponential decay variant over the same range frame tracks driver exp recompute") {
    // the float-exp spelling CH's exponentialTimeDecayedSum uses —
    // same user-partitioned range frame, per-frame-relative exponent
    // (no absolute-exp overflow); exp ulps differ per engine so this
    // stays spec-gated rather than oracle-hashed
    val e = Q.events(spark, dir)
      .select(col("user_id"), col("event_id"),
        unix_timestamp(col("ts").cast("timestamp")).as("t"),
        col("value").as("x"))
    val frame = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id").orderBy("t").rangeBetween(-3600, 0)
    val out = e
      .withColumn("fr", collect_list(struct(col("t"), col("x"))).over(frame))
      .withColumn("decayed", expr(
        "aggregate(fr, 0D, (acc, p) -> acc + p.x * exp((p.t - t) / 3600D))"))
      .select(col("user_id"), col("event_id"), col("decayed"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    val rows = e.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    val byUser = rows.groupBy(_._1)
    rows.foreach { case (u, eid, t, _) =>
      val expect = byUser(u).collect {
        case (_, _, tj, xj) if tj >= t - 3600 && tj <= t =>
          xj * math.exp((tj - t) / 3600.0)
      }.sum
      assert(math.abs(out((u, eid)) - expect) < 1e-6, s"row ($u,$eid)")
    }
  }

  test("q_agg_bounding_ratio: slope between arg-extrema matches recompute") {
    val got = run("q_agg_bounding_ratio").collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    val li = spark.read.parquet(s"$dir/lineitem.parquet")
      .select(col("l_returnflag"),
        (col("l_orderkey") * 10 + col("l_linenumber")).as("x"),
        floor(col("l_extendedprice") * 100).cast("long").as("y"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    li.groupBy(_._1).foreach { case (flag, rows) =>
      // same tie-collapse as the operator: one y per x (max)
      val dedup = rows.groupBy(_._2).map { case (x, rs) =>
        (x, rs.map(_._3).max)
      }.toSeq
      val lo = dedup.minBy(_._1)
      val hi = dedup.maxBy(_._1)
      val expect = (hi._2 - lo._2).toDouble / (hi._1 - lo._1)
      assert(math.abs(got(flag) - expect) < 1e-4, s"$flag")
    }
  }

  test("q_agg_foreach: elementwise folds match a driver recompute; no raw arrays shuffle") {
    val df = run("q_agg_foreach")
    // explode happens BELOW the first aggregate: the exchange carries
    // (grp, pos) cells, not whole arrays
    val phys = df.queryExecution.executedPlan.toString
    assert(phys.indexOf("Generate") > phys.indexOf("Exchange"),
      s"posexplode must sit under the shuffle:\n${phys.take(2000)}")
    val src = spark.read.parquet(s"$dir/orders.parquet")
      .select((col("o_custkey") % 10).as("grp"),
        (col("o_orderkey") % 7).as("v0"), (col("o_orderkey") % 5).as("v1"),
        floor(col("o_totalprice")).cast("long").as("v2"))
      .collect().map(r => (r.getLong(0), Seq(r.getLong(1), r.getLong(2), r.getLong(3))))
    val expect = src.groupBy(_._1).map { case (g, rows) =>
      val arrs = rows.map(_._2)
      g -> ((0 until 3).map(i => arrs.map(_(i)).sum),
        (0 until 3).map(i => arrs.map(_(i)).max))
    }
    df.collect().foreach { r =>
      val (sums, maxs) = expect(r.getLong(0))
      // registry output is Q.strArr-serialized ('|'-joined)
      assert(r.getString(1).split('|').toSeq.map(_.toLong) === sums)
      assert(r.getString(2).split('|').toSeq.map(_.toLong) === maxs)
    }
  }

  test("q_fn_string_distance: levenshtein properties (identity, symmetry vs manual DP)") {
    def lev(a: String, b: String): Int = {
      val d = Array.tabulate(a.length + 1, b.length + 1)((i, j) =>
        if (i == 0) j else if (j == 0) i else 0)
      for (i <- 1 to a.length; j <- 1 to b.length)
        d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
          d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
      d(a.length)(b.length)
    }
    val rows = run("q_fn_string_distance").limit(200).collect()
    val prio = spark.read.parquet(s"$dir/orders.parquet")
      .select("o_orderkey", "o_orderpriority", "o_orderstatus").collect()
      .map(r => r.getLong(0) -> (r.getString(1), r.getString(2))).toMap
    rows.foreach { r =>
      val (p, st) = prio(r.getLong(0))
      assert(r.getLong(1) === lev(p, "3-MEDIUM").toLong)
      assert(r.getLong(2) === lev(p, st).toLong)
    }
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

  test("q_seq_next_node matches a driver-side sequential scan") {
    val got = run("q_seq_next_node").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    // first consecutive view→click per user in (ts, event_id) order;
    // the element after it, '(end)' when the chain closes the stream
    val events = Q.events(spark, dir)
      .select("user_id", "ts", "event_id", "event_type").collect()
      .map { r =>
        val ldt = r.getAs[java.time.LocalDateTime](1)
        val us = ldt.toEpochSecond(java.time.ZoneOffset.UTC) * 1000000L + ldt.getNano / 1000
        (r.getLong(0), us, r.getLong(2), r.getString(3))
      }
    val want = events.groupBy(_._1).flatMap { case (u, es) =>
      val seq = es.sortBy(e => (e._2, e._3)).map(_._4)
      seq.sliding(2).zipWithIndex
        .collectFirst { case (win, i) if win.sameElements(Array("view", "click")) =>
          u -> (if (i + 2 < seq.length) seq(i + 2) else "(end)")
        }
    }.toMap
    assert(got === want)
  }

  test("q_agg_moving_avg agrees with q_agg_moving_sum element-wise") {
    // registry outputs are serialized: sums '|'-joined longs (Q.strArr),
    // avgs '|'-joined "%.4f" renderings (Q.strArr4dp) — compare the
    // derived quotients through the same fixed formatting
    val sums = run("q_agg_moving_sum").collect()
      .map(r => r.getLong(0) -> r.getString(1).split('|').toSeq.map(_.toLong)).toMap
    val avgs = run("q_agg_moving_avg").collect()
      .map(r => r.getLong(0) -> r.getString(1).split('|').toSeq).toMap
    assert(sums.keySet === avgs.keySet)
    // frame counts are min(i+1, 3) in element order; ma_i = ms_i / cnt_i.
    // Both arrays are collected sorted by (ord, value) so positions align
    // except where equal ords reorder — compare as multisets of quotients
    sums.keys.foreach { g =>
      val ms = sums(g); val ma = avgs(g)
      assert(ms.length === ma.length, s"group $g")
      val wantCounts = ms.indices.map(i => math.min(i + 1, 3))
      val derived = ms.indices.map(i => String.format(java.util.Locale.ROOT,
        "%.4f", Double.box(ms(i).toDouble / wantCounts(i))))
      assert(ma.sorted === derived.sorted, s"group $g")
    }
  }

  test("q_agg_linreg_multi matches a driver-side normal-equation solve") {
    val r = run("q_agg_linreg_multi").collect()(0)
    val rows = spark.read.parquet(s"$dir/lineitem.parquet")
      .select(col("l_quantity").cast("long"),
        (col("l_discount") * 100).cast("long"),
        floor(col("l_extendedprice") * 100).cast("long"))
      .collect().map(x => (x.getLong(0), x.getLong(1), x.getLong(2)))
    val n = rows.length.toDouble
    val s1 = rows.map(_._1).sum.toDouble; val s2 = rows.map(_._2).sum.toDouble
    val s11 = rows.map(t => t._1 * t._1).sum.toDouble
    val s12 = rows.map(t => t._1 * t._2).sum.toDouble
    val s22 = rows.map(t => t._2 * t._2).sum.toDouble
    val sy = rows.map(_._3).sum.toDouble
    val s1y = rows.map(t => t._1 * t._3).sum.toDouble
    val s2y = rows.map(t => t._2 * t._3).sum.toDouble
    val det = n * (s11 * s22 - s12 * s12) - s1 * (s1 * s22 - s12 * s2) +
      s2 * (s1 * s12 - s11 * s2)
    val b0 = (sy * (s11 * s22 - s12 * s12) - s1 * (s1y * s22 - s12 * s2y) +
      s2 * (s1y * s12 - s11 * s2y)) / det
    val b1 = (n * (s1y * s22 - s12 * s2y) - sy * (s1 * s22 - s12 * s2) +
      s2 * (s1 * s2y - s1y * s2)) / det
    val b2 = (n * (s11 * s2y - s1y * s12) - s1 * (s1 * s2y - s1y * s2) +
      sy * (s1 * s12 - s11 * s2)) / det
    assert(math.abs(r.getAs[Double]("beta0_cents") - b0) < 1e-4)
    assert(math.abs(r.getAs[Double]("beta1_cents") - b1) < 1e-4)
    assert(math.abs(r.getAs[Double]("beta2_cents") - b2) < 1e-4)
    assert(det != 0.0)
  }

  test("q_fn_point_in_polygon matches an independent +y-direction ray caster") {
    val poly = Seq((0L, 0L), (120L, 20L), (180L, 160L), (90L, 100L), (20L, 170L))
    // independent path: cast the ray UPWARD (+y) instead of +x — crosses
    // different edges, same parity for any point not on the boundary
    def onEdge(px: Long, py: Long): Boolean = poly.indices.exists { i =>
      val (x1, y1) = poly(i); val (x2, y2) = poly((i + 1) % poly.size)
      val cross = (x2 - x1) * (py - y1) - (px - x1) * (y2 - y1)
      cross == 0 &&
        px >= math.min(x1, x2) && px <= math.max(x1, x2) &&
        py >= math.min(y1, y2) && py <= math.max(y1, y2)
    }
    def insideUp(px: Long, py: Long): Boolean = {
      var c = 0
      poly.indices.foreach { i =>
        val (x1, y1) = poly(i); val (x2, y2) = poly((i + 1) % poly.size)
        if ((x1 > px) != (x2 > px)) {
          val sgn = if (x2 > x1) 1L else -1L
          if (((y2 - y1) * (px - x1) - (py - y1) * (x2 - x1)) * sgn > 0) c += 1
        }
      }
      c % 2 == 1
    }
    val rows = run("q_fn_point_in_polygon").collect()
    assert(rows.nonEmpty)
    var compared = 0
    rows.foreach { r =>
      val (px, py, in) = (r.getLong(1), r.getLong(2), r.getBoolean(3))
      if (!onEdge(px, py)) { assert(in === insideUp(px, py), s"($px,$py)"); compared += 1 }
    }
    assert(compared > rows.length / 2, "too many boundary points to be a meaningful test")
    // and the key stays pure codegen'd comparisons — no UDF, no shuffle
    val plan = run("q_fn_point_in_polygon").queryExecution.executedPlan.toString
    assert(!plan.contains("BatchEvalPython") && !plan.contains("ScalaUDF"))
    assert(!plan.contains("Exchange"))
  }

  test("q_agg_mean_ztest matches a driver recompute") {
    val r = run("q_agg_mean_ztest").collect()(0)
    val (a, b) = clicksAndPurchases()
    def stats(v: Array[Long]) = {
      val n = v.length.toDouble
      val m = v.sum.toDouble / n
      val va = (v.map(x => x.toDouble * x).sum - v.sum.toDouble * v.sum / n) / (n - 1)
      (n, m, va)
    }
    val (na, ma, va) = stats(a); val (nb, mb, vb) = stats(b)
    val z = (ma - mb) / math.sqrt(va / na + vb / nb)
    assert(r.getAs[Long]("na") === a.length && r.getAs[Long]("nb") === b.length)
    assert(math.abs(r.getAs[Double]("z") - z) < 1e-5)
  }
}
