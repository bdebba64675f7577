package graft.operators

import graft.SparkTestBase

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class RangeJoinSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark

  test("binned range join == naive crossJoin+filter, each match exactly once") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val pts = (1 to 500).map(i => (i.toLong, rnd.nextInt(1000).toLong))
      .toDF("p_id", "p")
    val ivs = (1 to 60).map { i =>
      val s = rnd.nextInt(1000).toLong
      (i.toLong, s, s + rnd.nextInt(80).toLong)
    }.toDF("iv_id", "s", "e")
    for (bw <- Seq(1L, 7L, 31L, 200L)) {
      val got = RangeJoin.pointInInterval(pts, "p", ivs, "s", "e", bw)
        .select("p_id", "iv_id").as[(Long, Long)].collect().sorted.toSeq
      val want = pts.crossJoin(ivs)
        .filter(col("p") >= col("s") && col("p") <= col("e"))
        .select("p_id", "iv_id").as[(Long, Long)].collect().sorted.toSeq
      assert(got === want, s"bucketWidth=$bw")
      assert(got.distinct.size === got.size, s"duplicate pairs at bucketWidth=$bw")
    }
  }

  test("degenerate and null intervals match nothing instead of throwing") {
    import spark.implicits._
    val pts = Seq((1L, 10L)).toDF("p_id", "p")
    val ivs = Seq((1L, Some(20L), Some(5L)), // end < start
      (2L, None, Some(30L)), (3L, Some(0L), None), // null endpoints
      (4L, Some(5L), Some(15L))).toDF("iv_id", "s", "e")
    val out = RangeJoin.pointInInterval(pts, "p", ivs, "s", "e", 10L)
      .select("iv_id").as[Long].collect().toSeq
    assert(out === Seq(4L))
  }

  test("interval overlap join == naive crossJoin+filter, each pair exactly once") {
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    def ivs(n: Int, pfx: String) = (1 to n).map { i =>
      val s = rnd.nextInt(500).toLong
      (i.toLong, s, s + rnd.nextInt(60).toLong)
    }.toDF(s"${pfx}_id", s"${pfx}_s", s"${pfx}_e")
    val a = ivs(80, "a")
    val b = ivs(70, "b")
    for (bw <- Seq(1L, 13L, 31L, 400L)) {
      val got = RangeJoin.intervalOverlap(a, "a_s", "a_e", b, "b_s", "b_e", bw)
        .select("a_id", "b_id").as[(Long, Long)].collect().sorted.toSeq
      val want = a.crossJoin(b)
        .filter(col("a_s") <= col("b_e") && col("b_s") <= col("a_e"))
        .select("a_id", "b_id").as[(Long, Long)].collect().sorted.toSeq
      assert(got === want, s"bucketWidth=$bw")
      assert(got.distinct.size === got.size, s"duplicate pairs at bucketWidth=$bw")
    }
  }

  test("plan is a bucket equi-join: no nested loop, no cartesian (scale guard)") {
    import spark.implicits._
    val pts = (1 to 100).map(i => (i.toLong, i.toLong * 3)).toDF("p_id", "p")
    val ivs = (1 to 50).map(i => (i.toLong, i.toLong * 5, i.toLong * 5 + 40))
      .toDF("iv_id", "s", "e")
    val plan = RangeJoin.pointInInterval(pts, "p", ivs, "s", "e", 31L)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
    assert(!plan.contains("CartesianProduct"), plan)
  }
}
