package graft.functions

import graft.SparkTestBase

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/**
 * windowFunnel semantics (`funnel_agg`): hand-built chains with known
 * answers, a driver-side reference implementation over the harness
 * events table, and partitioning invariance (the order-sensitive pass
 * must happen once at eval, not during merge).
 */
class FunnelAggSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  import spark.implicits._

  /** Reference implementation: CH AggregateFunctionWindowFunnel base mode. */
  private def reference(events: Seq[(Long, Int)], window: Long, steps: Int): Int = {
    val chain = Array.fill(steps)(Long.MinValue)
    var best = 0
    events.sorted.foreach { case (t, lv) =>
      if (lv == 0) { chain(0) = t; best = math.max(best, 1) }
      else if (lv < steps && chain(lv - 1) != Long.MinValue && t <= chain(lv - 1) + window) {
        chain(lv) = chain(lv - 1)
        best = math.max(best, lv + 1)
      }
    }
    best
  }

  private def run(events: Seq[(Long, Long, Int)], window: Long, steps: Int,
      partitions: Int = 1): Map[Long, Int] =
    events.toDF("uid", "t", "lvl").repartition(partitions)
      .groupBy("uid")
      .agg(call_function("funnel_agg", col("t"), col("lvl"), lit(window), lit(steps)).as("s"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap

  test("hand-built chains: depth, window cutoff, chain restart") {
    val events = Seq(
      // user 1: full chain inside the window → 3
      (1L, 100L, 0), (1L, 150L, 1), (1L, 190L, 2),
      // user 2: step 2 lands outside window of the chain start → 2
      (2L, 100L, 0), (2L, 150L, 1), (2L, 300L, 2),
      // user 3: a LATER step-0 restarts the clock, making the chain fit → 3
      (3L, 100L, 0), (3L, 400L, 0), (3L, 450L, 1), (3L, 480L, 2),
      // user 4: steps out of order (click before view) → only the view counts
      (4L, 100L, 1), (4L, 150L, 0),
      // user 5: step 1 without any step 0 → 0
      (5L, 100L, 1), (5L, 120L, 2))
    val got = run(events, window = 100L, steps = 3)
    assert(got === Map(1L -> 3, 2L -> 2, 3L -> 3, 4L -> 1, 5L -> 0))
  }

  test("matches the reference implementation on the harness events table") {
    val lvl = when(col("event_type") === "view", 0)
      .when(col("event_type") === "click", 1)
      .when(col("event_type") === "purchase", 2).otherwise(-1)
    val rows = graft.operators.Q.events(spark, SparkTestBase.sfDir)
      .select(col("user_id"),
        unix_micros(col("ts").cast("timestamp")).as("t"), lvl.as("lvl"))
      .where(col("lvl") >= 0)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    val window = 3600L * 1000000L
    val expected = rows.groupBy(_._1).map { case (u, es) =>
      u -> reference(es.map(e => (e._2, e._3)).toSeq, window, 3)
    }
    val got = run(rows.toSeq, window, 3, partitions = 8)
    assert(got === expected)
    assert(got.values.exists(_ > 0), "fixture should convert at least one user")
  }

  test("result is invariant to partitioning (merge order)") {
    val rnd = new scala.util.Random(11)
    val events = (0 until 2000).map { _ =>
      (rnd.nextInt(20).toLong, rnd.nextInt(1000).toLong, rnd.nextInt(4) - 1)
    }.filter(_._3 >= 0)
    val a = run(events, 200L, 3, partitions = 1)
    val b = run(events, 200L, 3, partitions = 13)
    assert(a === b)
  }
}
