package graft.operators

import graft.SparkTestBase

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/**
 * Spatial keys. The oracles are hash-gated; these tests anchor the
 * geohash bit layout to the PUBLISHED algorithm (classic bisection
 * reference, itself pinned by a public test vector) and prove the
 * grid join's completeness against brute force.
 */
class SpatialQueriesSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  private val dir = SparkTestBase.sfDir

  private def run(key: String, d: String = dir) = QueryRegistry.queries(key)(spark, d)

  /** Classic geohash: 25-round interval bisection, lon first. */
  private def refGeohash5(lat: Double, lon: Double): String = {
    val alphabet = "0123456789bcdefghjkmnpqrstuvwxyz"
    var (latLo, latHi) = (-90.0, 90.0)
    var (lonLo, lonHi) = (-180.0, 180.0)
    var bits = 0L
    for (i <- 0 until 25) {
      bits <<= 1
      if (i % 2 == 0) { // even position from MSB: longitude
        val mid = (lonLo + lonHi) / 2
        if (lon >= mid) { bits |= 1; lonLo = mid } else lonHi = mid
      } else {
        val mid = (latLo + latHi) / 2
        if (lat >= mid) { bits |= 1; latLo = mid } else latHi = mid
      }
    }
    (4 to 0 by -1).map(g => alphabet(((bits >> (g * 5)) & 31).toInt)).mkString
  }

  test("reference geohash reproduces the published test vector") {
    // geohash.org's canonical example: (57.64911, 10.40744) -> u4pruydqqvj
    assert(refGeohash5(57.64911, 10.40744) === "u4pru")
    assert(refGeohash5(42.605, -5.603) === "ezs42")
  }

  test("q_fn_geohash matches the bisection reference on every row") {
    val rows = run("q_fn_geohash").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (latc, lonc, gh) = (r.getLong(1), r.getLong(2), r.getString(3))
      assert(gh === refGeohash5(latc / 100.0, lonc / 100.0), s"latc=$latc lonc=$lonc")
    }
  }

  test("q_join_spatial_grid is complete and exact vs brute force (sf0.01)") {
    val d01 = "/root/testdata/sf0.01"
    val got = run("q_join_spatial_grid", d01).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val pts = spark.read.parquet(s"$d01/customer.parquet")
      .select(col("c_custkey")).collect().map(_.getLong(0))
      .filter(_ <= 1500)
      .map(k => (k, k * 9973 % 2000, k * 6151 % 2000))
    val want = (for {
      (ai, ax, ay) <- pts; (bi, bx, by) <- pts
      if ai < bi
      d2 = (ax - bx) * (ax - bx) + (ay - by) * (ay - by)
      if d2 <= 22500
    } yield (ai, bi, d2)).toSet
    assert(want.nonEmpty, "test data produced no qualifying pairs")
    assert(got === want)
  }

  test("spatial grid join plans an equi-join on cells, not a cartesian") {
    val plan = run("q_join_spatial_grid").queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), plan.take(2000))
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan.take(2000))
  }
}
