package graft.operators

import graft.SparkTestBase

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class RelationalOpsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  private val dir = SparkTestBase.sfDir

  test("approx_count_distinct within 5% of exact (HLL accuracy bound)") {
    // raw-estimate property (the registry key exposes only exact +
    // within-bound boolean to the oracle; this pins the estimate itself)
    val li = spark.read.parquet(s"$dir/lineitem.parquet")
    val exact = li.groupBy("l_returnflag")
      .agg(countDistinct(col("l_partkey")).as("d"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val approx = li.groupBy("l_returnflag")
      .agg(approx_count_distinct(col("l_partkey")).as("a"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(approx.keySet === exact.keySet)
    approx.foreach { case (k, a) =>
      val e = exact(k)
      assert(math.abs(a - e).toDouble / e < 0.05, s"$k: approx=$a exact=$e")
    }
    // and the registry key's oracle-visible bound column holds
    val gated = QueryRegistry.queries("q_agg_approx_distinct")(spark, dir).collect()
    assert(gated.nonEmpty)
    gated.foreach { r =>
      assert(r.getBoolean(2), s"${r.getString(0)}: hll_within_5pct is false")
      assert(r.getLong(1) === exact(r.getString(0)))
    }
  }

  test("approx quantile within 2% of exact (sketch accuracy bound)") {
    // the registry key runs the sketch in its exact regime (accuracy
    // 2^30, oracle-gated); this pins the genuinely-approximate
    // small-accuracy regime the key documents for 100-TB use
    val li = spark.read.parquet(s"$dir/lineitem.parquet")
    val exact = li.groupBy("l_returnflag")
      .agg(expr("percentile(l_extendedprice, 0.5)").as("p50"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    val approx = li.groupBy("l_returnflag")
      .agg(percentile_approx(col("l_extendedprice"), lit(0.5), lit(1000)).as("p50"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(approx.keySet === exact.keySet)
    approx.foreach { case (k, a) =>
      val e = exact(k)
      assert(math.abs(a - e) / e < 0.02, s"$k: approx=$a exact=$e")
    }
  }

  test("every declared oracle key produces a non-empty, re-runnable result") {
    // cheap structural guard at sf0.001: all keys run and yield rows
    QueryRegistry.all.foreach { case (name, q) =>
      val n = q.fn(spark, dir).count()
      assert(n > 0, s"$name returned 0 rows at sf0.001")
    }
  }

  test("stratified sample hits the requested per-stratum fractions (hash + seeded)") {
    val orders = spark.read.parquet(s"$dir/orders.parquet")
    val totals = orders.groupBy("o_orderpriority").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val want = Map("1-URGENT" -> 0.5, "2-HIGH" -> 0.25, "3-MEDIUM" -> 0.1,
      "4-NOT SPECIFIED" -> 0.1, "5-LOW" -> 0.1)

    // registry form: deterministic multiplicative-hash membership
    val hashed = QueryRegistry.queries("q_sample_stratified")(spark, dir)
      .groupBy("o_orderpriority").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // hash buckets are equidistributed but not iid — allow the wider of
    // 4-sigma and 15% relative
    want.foreach { case (k, f) =>
      val n = totals(k)
      val got = hashed.getOrElse(k, 0L).toDouble / n
      val tol = math.max(4 * math.sqrt(f * (1 - f) / n), 0.15 * f)
      assert(math.abs(got - f) <= tol, s"hash $k: got $got want $f ± $tol (n=$n)")
    }
    // determinism: membership is a pure function of the key, so two
    // runs agree row-for-row (the property seeded RNG sampling cannot
    // give across engines — why the oracle-gated form is hash-based)
    val again = QueryRegistry.queries("q_sample_stratified")(spark, dir)
      .groupBy("o_orderpriority").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(again === hashed)

    // seeded-Bernoulli formulation (DataFrameStatFunctions.sampleBy)
    val bern = orders.stat.sampleBy("o_orderpriority", want, seed = 42L)
      .groupBy("o_orderpriority").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    want.foreach { case (k, f) =>
      val n = totals(k)
      val got = bern.getOrElse(k, 0L).toDouble / n
      val tol = 4 * math.sqrt(f * (1 - f) / n)
      assert(math.abs(got - f) <= tol, s"bernoulli $k: got $got want $f ± $tol (n=$n)")
    }
  }

  test("bucketed tables co-locate: equi-join plans without a shuffle") {
    val wh = java.nio.file.Files.createTempDirectory("graft-warehouse").toString
    // bucketing requires the table catalog; explicit path options keep
    // all data under the temp dir (the in-memory catalog holds metadata)
    val s = spark.newSession()
    s.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force the issue
    s.read.parquet(s"$dir/customer.parquet")
      .write.bucketBy(4, "c_custkey").sortBy("c_custkey")
      .option("path", s"$wh/cust_b").mode("overwrite").saveAsTable("cust_b")
    s.read.parquet(s"$dir/orders.parquet")
      .write.bucketBy(4, "o_custkey").sortBy("o_custkey")
      .option("path", s"$wh/ord_b").mode("overwrite").saveAsTable("ord_b")
    val joined = s.table("cust_b").join(s.table("ord_b"),
      org.apache.spark.sql.functions.col("c_custkey") === org.apache.spark.sql.functions.col("o_custkey"))
    val plan = joined.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan.take(2000)) // co-located: zero shuffles
    assert(joined.count() ===
      spark.read.parquet(s"$dir/customer.parquet").join(
        spark.read.parquet(s"$dir/orders.parquet"),
        org.apache.spark.sql.functions.col("c_custkey") === org.apache.spark.sql.functions.col("o_custkey")).count())
    s.sql("DROP TABLE IF EXISTS cust_b"); s.sql("DROP TABLE IF EXISTS ord_b")
  }

  test("broadcast hint survives into the physical plan") {
    val plan = QueryRegistry.queries("q_join_broadcast")(spark, dir)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan.take(1500))
  }

  test("topk compiles to TakeOrderedAndProject (no global sort)") {
    val plan = QueryRegistry.queries("q_topk")(spark, dir)
      .queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), plan.take(1500))
  }

  test("bloom semi join == plain semi join; bloom predicate sits at the fact side") {
    val li = spark.read.parquet(s"$dir/lineitem.parquet")
    val dim = spark.read.parquet(s"$dir/part.parquet").filter(col("p_size") === 1)
    val bloomed = BloomJoin.bloomSemiJoin(li, dim, "l_partkey", "p_partkey",
      expectedItems = 10000L, numBits = 131072L)
    val plain = li.join(dim.select("p_partkey").distinct(),
      col("l_partkey") === col("p_partkey"), "left_semi")
    assert(bloomed.count() === plain.count())
    assert(bloomed.select("l_orderkey", "l_linenumber").collect().toSet ===
      plain.select("l_orderkey", "l_linenumber").collect().toSet)
    // the probe is a plain Filter (pre-join, codegen'd predicate) in the plan
    val phys = bloomed.queryExecution.executedPlan.toString
    assert(phys.contains("might_contain"), phys.take(2000))
    // empty dim side → empty result, no null-literal probe
    val none = BloomJoin.bloomSemiJoin(li, dim.filter(lit(false)),
      "l_partkey", "p_partkey")
    assert(none.count() === 0L)
  }

  test("weighted sample: matches driver-side A-ES recompute, favors heavy rows") {
    val orders = spark.read.parquet(s"$dir/orders.parquet")
    val got = TextPipeline.weightedSample(orders, "o_orderkey", "o_totalprice", k = 200)
      .collect().map(r => (r.getLong(0), r.getDouble(2)))
    assert(got.length === 200)
    // driver-side recompute of the exact same deterministic keys
    // (Mitchell piecewise-linear log2 — the engine's exact regime)
    val all = orders.select("o_orderkey", "o_totalprice").collect().map { r =>
      val id = r.getLong(0); val w = r.getDouble(1)
      val bucket = java.lang.Math.floorMod((id % 1000003L) * 2654435761L, 4294967296L)
      val m = 2L * bucket + 1L
      val bl = 64 - java.lang.Long.numberOfLeadingZeros(m)
      val qlog2 = bl - 35.0 + m.toDouble / (1L << (bl - 1)).toDouble
      (id, qlog2 / w)
    }.filter { case (_, _) => true }
    val expect = all.sortBy { case (id, k) => (-k, id) }.take(200).map(_._1).toSet
    assert(got.map(_._1).toSet === expect)
    // inclusion tracks weight: sampled orders skew to higher o_totalprice
    val sampledMean = orders.filter(col("o_orderkey")
        .isin(got.map(_._1).toSeq: _*))
      .agg(avg("o_totalprice")).head().getDouble(0)
    val corpusMean = orders.agg(avg("o_totalprice")).head().getDouble(0)
    assert(sampledMean > corpusMean,
      s"weighted sample mean $sampledMean should exceed corpus mean $corpusMean")
    // scale guard: top-k compiles to TakeOrderedAndProject, not a global sort
    val plan = TextPipeline.weightedSample(orders, "o_orderkey", "o_totalprice", 100)
      .queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), plan.take(1500))
  }

  test("q_agg_collect array form: per-region sorted name lists (CH groupArray)") {
    // The registry key serializes to a '|'-joined string for the driver's
    // comparator; this pins the underlying array semantics.
    val nation = spark.read.parquet(s"$dir/nation.parquet")
    val arrays = nation.groupBy("n_regionkey")
      .agg(sort_array(collect_list(col("n_name"))).as("names"))
      .collect().map(r => r.get(0).toString -> r.getSeq[String](1)).toMap
    val joined = QueryRegistry.queries("q_agg_collect")(spark, dir)
      .collect().map(r => r.get(0).toString -> r.getString(1)).toMap
    assert(arrays.keySet === joined.keySet)
    arrays.foreach { case (k, names) =>
      assert(names === names.sorted, s"region $k list not sorted")
      assert(joined(k) === names.mkString("|"), s"region $k join mismatch")
    }
  }

  test("q_agg_quantiles array form: multi-level exact percentiles in one pass") {
    val li = spark.read.parquet(s"$dir/lineitem.parquet")
    val multi = li.groupBy("l_returnflag")
      .agg(expr("percentile(l_quantity, array(0.25D, 0.5D, 0.75D))").as("qs"))
      .collect().map(r => r.getString(0) -> r.getSeq[Double](1)).toMap
    // each level agrees with the single-level exact percentile
    Seq(0.25 -> 0, 0.5 -> 1, 0.75 -> 2).foreach { case (lvl, i) =>
      val single = li.groupBy("l_returnflag")
        .agg(expr(s"percentile(l_quantity, ${lvl}D)").as("p"))
        .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
      single.foreach { case (k, v) =>
        assert(math.abs(multi(k)(i) - v) < 1e-9, s"$k level $lvl")
      }
    }
    // and the registry key is the cents-serialized form of the same arrays
    val joined = QueryRegistry.queries("q_agg_quantiles")(spark, dir)
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    multi.foreach { case (k, qs) =>
      assert(joined(k) === qs.map(x => math.round(x * 100)).mkString("|"), k)
    }
  }

  test("parquet scans prune columns and push filters") {
    val df = spark.read.parquet(s"$dir/lineitem.parquet")
      .filter(col("l_quantity") > 49.0).select("l_orderkey")
    val scan = df.queryExecution.executedPlan.toString
    assert(scan.contains("PushedFilters: [IsNotNull(l_quantity), GreaterThan(l_quantity,49.0)]"),
      scan.take(2000))
    assert(scan.contains("ReadSchema: struct<l_orderkey:bigint,l_quantity:double>"),
      scan.take(2000))
  }
}
