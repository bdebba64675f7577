package graft.functions

import graft.SparkTestBase

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/**
 * Misra–Gries heavy hitters (`topk_agg`): exactness below capacity,
 * the frequency guarantee above it, and merge (partial/final across
 * partitions) soundness.
 */
class TopKAggSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  import spark.implicits._

  test("exact when distinct values fit in capacity") {
    // 5 distinct values, capacity = 8*k = 24 → no decrements ever, so
    // counts are exact and the order is the true frequency order
    val df = (1 to 5).flatMap(i => Seq.fill(i * 10)(s"v$i")).toDF("v")
    val rows = df.agg(call_function("topk_agg", col("v"), lit(3)).as("top"))
      .selectExpr("inline(top)")
      .collect()
    assert(rows.map(r => (r.getString(0), r.getLong(1))).toSeq ===
      Seq(("v5", 50L), ("v4", 40L), ("v3", 30L)))
  }

  test("frequency guarantee: every true heavy hitter survives, estimates within N/capacity") {
    // 30 heavy values (1600..4500 occurrences) in a sea of 20k singletons;
    // k=30 → capacity 240, N ≈ 111.5k → error bound ≈ 465 < 1600
    val heavy = (1 to 30).flatMap(i => Seq.fill(1500 + 100 * i)(i.toLong))
    val noise = (1000000L until 1020000L)
    val df = (heavy ++ noise).toDF("v").repartition(7) // force partial+final merge
    val n = heavy.size + noise.size
    val bound = n / 240 + 1
    val rows = df.agg(call_function("topk_agg", col("v"), lit(30)).as("top"))
      .selectExpr("inline(top)")
      .collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    (1 to 30).foreach { i =>
      val trueCount = 1500L + 100L * i
      assert(rows.contains(i.toLong), s"heavy value $i missing from sketch")
      val est = rows(i.toLong)
      assert(est <= trueCount && est >= trueCount - bound,
        s"estimate $est for value $i outside [${trueCount - bound}, $trueCount]")
    }
  }

  test("grouped heavy hitters: per-group sketches stay independent") {
    val df = Seq.tabulate(3000) { i =>
      (if (i % 2 == 0) "even" else "odd", (i % (if (i % 2 == 0) 3 else 7)).toString)
    }.toDF("g", "v")
    val out = df.groupBy("g")
      .agg(call_function("topk_agg", col("v"), lit(2)).as("top"))
      .selectExpr("g", "top[0].value AS first", "top[0].count_est AS cnt")
      .collect()
      .map(r => r.getString(0) -> (r.getString(1), r.getLong(2))).toMap
    assert(out("even")._1 === "0") // 1500 evens over 3 residues → residue 0 has 500
    assert(out("even")._2 === 500L)
    assert(out("odd")._2 >= 214L) // 1500 odds over 7 residues
  }

  test("weighted: topk_weighted_agg(v, w, k) equals topk_agg over w-times repeated rows") {
    // small distinct count → both exact, so results must match exactly
    val weighted = Seq(("a", 5L), ("b", 3L), ("a", 2L), ("c", 9L)).toDF("v", "w")
    val expanded = Seq.fill(7)("a") ++ Seq.fill(3)("b") ++ Seq.fill(9)("c")
    val got = weighted
      .agg(call_function("topk_weighted_agg", col("v"), col("w"), lit(3)).as("top"))
      .selectExpr("inline(top)").collect()
      .map(r => (r.getString(0), r.getLong(1))).toSeq
    val want = expanded.toDF("v")
      .agg(call_function("topk_agg", col("v"), lit(3)).as("top"))
      .selectExpr("inline(top)").collect()
      .map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(got === want)
    assert(got === Seq(("c", 9L), ("a", 7L), ("b", 3L)))
  }

  test("weighted: heavy hitters by weight survive a sea of light entries") {
    // 3 ids with total weight 50k each, 5000 ids with weight 1-10;
    // k=3 → capacity 24 — the heavies must surface with sane estimates
    val rnd = new scala.util.Random(5)
    val heavy = (1 to 100).flatMap(_ => Seq(("H1", 500L), ("H2", 500L), ("H3", 500L)))
    val light = (1 to 5000).map(i => (s"l$i", 1L + rnd.nextInt(10).toLong))
    val df = rnd.shuffle(heavy ++ light).toDF("v", "w").repartition(7)
    val got = df
      .agg(call_function("topk_weighted_agg", col("v"), col("w"), lit(3)).as("top"))
      .selectExpr("inline(top)").collect()
      .map(r => (r.getString(0), r.getLong(1)))
    assert(got.map(_._1).toSet === Set("H1", "H2", "H3"))
    // estimate bound: totalWeight/capacity undercount at most
    val totalW = heavy.map(_._2).sum + light.map(_._2).sum
    got.foreach { case (_, est) =>
      assert(est <= 50000L && est >= 50000L - totalW / 24, s"estimate $est")
    }
  }

  test("plan uses ObjectHashAggregate (raw buffer, not row-encoded)") {
    val df = (1 to 100).map(_.toString).toDF("v")
      .agg(call_function("topk_agg", col("v"), lit(5)))
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("ObjectHashAggregate"), s"expected ObjectHashAggregate in:\n$plan")
  }
}
