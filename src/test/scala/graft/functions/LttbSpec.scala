package graft.functions

import graft.SparkTestBase

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import scala.util.Random

/**
 * LTTB downsampling aggregate. The oracle key (`q_agg_lttb`) is
 * hash-gated against a DuckDB recursive-CTE reimplementation; these
 * tests add a from-scratch Scala reference on random series,
 * the structural LTTB contract (endpoints kept, exact output size,
 * pass-through below n), and partition invariance (merge is
 * concatenation; selection happens once after the final sort).
 */
class LttbSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark

  /** Independent reference: direct transcription of the published
    * algorithm over (x, y) pairs, integer areas, first-max ties. */
  private def refLttb(pts0: Seq[(Long, Long)], n: Int): Seq[(Long, Long)] = {
    val pts = pts0.sorted
    val cnt = pts.length
    if (cnt <= n) return pts
    val nb = n - 2
    def bucket(i: Int): Int =
      if (i == 0) 0 else if (i == cnt - 1) nb + 1
      else 1 + (((i - 1).toLong * nb) / (cnt - 2)).toInt
    val byB = pts.zipWithIndex.groupBy { case (_, i) => bucket(i) }
    val out = scala.collection.mutable.ArrayBuffer(pts.head)
    var prev = pts.head
    for (b <- 1 to nb) {
      val nxt = byB(b + 1)
      val m = nxt.size.toLong
      val sx = nxt.map(_._1._1).sum; val sy = nxt.map(_._1._2).sum
      val best = byB(b).minBy { case ((x, y), i) =>
        val area = math.abs((prev._1 * m - sx) * (y - prev._2) -
          (prev._1 - x) * (sy - prev._2 * m))
        (-area, i)
      }._1
      out += best
      prev = best
    }
    out += pts.last
    out.toSeq
  }

  private def runAgg(pts: Seq[(Long, Long, Long)], n: Int, parts: Int = 4) = {
    import spark.implicits._
    val r = pts.toDF("x", "y", "tb").repartition(parts)
      .agg(expr(s"lttb_agg(x, y, tb, $n)").as("d"))
      .select(col("d.xs"), col("d.ys")).collect()(0)
    r.getSeq[Long](0).zip(r.getSeq[Long](1))
  }

  test("matches a from-scratch reference on random series") {
    val rnd = new Random(11)
    for (trial <- 1 to 8) {
      val cnt = 50 + rnd.nextInt(500)
      val pts = (0 until cnt).map(i =>
        (i.toLong * (1 + rnd.nextInt(3)), rnd.nextInt(100000).toLong - 50000, i.toLong))
      val n = 5 + rnd.nextInt(20)
      val want = refLttb(pts.map(p => (p._1, p._2)), n)
      assert(runAgg(pts, n) === want, s"trial $trial cnt=$cnt n=$n")
    }
  }

  test("keeps endpoints and returns exactly n points") {
    val pts = (0 until 300).map(i => (i.toLong, (i * 997 % 3001).toLong, i.toLong))
    val got = runAgg(pts, 15)
    assert(got.length === 15)
    assert(got.head === (0L, 0L))
    assert(got.last === (299L, 299L * 997 % 3001))
    // selected xs strictly increase (one point per index bucket)
    assert(got.map(_._1) === got.map(_._1).sorted)
  }

  test("passes the series through untouched when shorter than n") {
    val pts = (0 until 7).map(i => (i.toLong, i.toLong * 2, i.toLong))
    assert(runAgg(pts, 20) === pts.map(p => (p._1, p._2)))
  }

  test("result is invariant to input partitioning") {
    val rnd = new Random(5)
    val pts = (0 until 400).map(i => (i.toLong, rnd.nextInt(1000).toLong, i.toLong))
    val a = runAgg(pts, 12, parts = 1)
    val b = runAgg(pts, 12, parts = 17)
    assert(a === b)
  }
}
