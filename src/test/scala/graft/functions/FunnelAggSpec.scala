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

  private def runStrict(events: Seq[(Long, Long, Int)], window: Long, steps: Int,
      partitions: Int = 1): Map[Long, Int] =
    events.toDF("uid", "t", "lvl").repartition(partitions)
      .groupBy("uid")
      .agg(call_function("funnel_agg", col("t"), col("lvl"), lit(window),
        lit(steps), lit("strict_increase")).as("s"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap

  /** Declarative strict_increase reference: deepest L with an
    * explicit strictly-increasing chain, by exhaustive search. */
  private def strictReference(events: Seq[(Long, Int)], window: Long, steps: Int): Int = {
    val byLevel = Array.tabulate(steps)(l => events.filter(_._2 == l).map(_._1).sorted)
    def reach(l: Int, prevT: Long, start: Long): Boolean =
      l == steps || byLevel(l).exists(t =>
        t > prevT && t <= start + window && reach(l + 1, t, start))
    var best = 0
    var l = steps
    while (l > 0 && best == 0) {
      val found = byLevel(0).exists { t0 =>
        // try every step-0 start; chain depth l means levels 0..l-1
        def go(lv: Int, prevT: Long): Boolean =
          lv == l || byLevel(lv).exists(t =>
            t > prevT && t <= t0 + window && go(lv + 1, t))
        go(1, t0)
      }
      if (found) best = l else l -= 1
    }
    best
  }

  test("strict_increase: equal-timestamp chains break; earlier chains still qualify") {
    val events = Seq(
      // user 1: click at the SAME time as its view → strict depth 1
      (1L, 100L, 0), (1L, 100L, 1),
      // user 2: strictly increasing chain → 3
      (2L, 100L, 0), (2L, 150L, 1), (2L, 190L, 2),
      // user 3: the LATEST view ties the click's timestamp (greedy
      // latest-start would fail strictness) but an EARLIER view at 80
      // still forms a strict chain within the window → 2
      (3L, 80L, 0), (3L, 150L, 0), (3L, 150L, 1),
      // user 4: the strict chain must start at the EARLIER view (the
      // later one ties the click), and that start's window excludes
      // the purchase → strict 2; base restarts the clock at view@150
      // and reaches 3
      (4L, 80L, 0), (4L, 150L, 0), (4L, 150L, 1), (4L, 250L, 2))
    val got = runStrict(events, window = 100L, steps = 3)
    assert(got === Map(1L -> 1, 2L -> 3, 3L -> 2, 4L -> 2))
    // base mode disagrees where ties matter — the mode is real
    val base = run(events, window = 100L, steps = 3)
    assert(base(1L) === 2 && base(3L) === 2 && base(4L) === 3)
  }

  test("strict_increase matches the exhaustive reference on random collision-heavy data") {
    val rnd = new scala.util.Random(23)
    // coarse timestamps (mod 40) force heavy collisions
    val events = (0 until 1500).map { _ =>
      (rnd.nextInt(25).toLong, rnd.nextInt(40).toLong * 10, rnd.nextInt(4) - 1)
    }.filter(_._3 >= 0)
    val window = 120L
    val got = runStrict(events, window, 3, partitions = 7)
    val want = events.groupBy(_._1).map { case (u, es) =>
      u -> strictReference(es.map(e => (e._2, e._3)).toSeq, window, 3)
    }
    assert(got === want)
  }

  test("strict_increase on the events fixture: never deeper than base, differs under collisions") {
    val lvl = when(col("event_type") === "view", 0)
      .when(col("event_type") === "click", 1)
      .when(col("event_type") === "purchase", 2).otherwise(-1)
    // hour truncation forces same-timestamp collisions at every SF
    val rows = graft.operators.Q.events(spark, SparkTestBase.sfDir)
      .select(col("user_id"),
        unix_micros(date_trunc("hour", col("ts").cast("timestamp"))).as("t"),
        lvl.as("lvl"))
      .where(col("lvl") >= 0)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    val window = 24L * 3600L * 1000000L
    val strict = runStrict(rows.toSeq, window, 3, partitions = 8)
    val base = run(rows.toSeq, window, 3, partitions = 8)
    // strict can only LOWER the depth
    strict.foreach { case (u, s) => assert(s <= base(u), s"user $u") }
    assert(strict.exists { case (u, s) => base(u) != s },
      "hour truncation should produce at least one user where strictness matters")
  }
}
