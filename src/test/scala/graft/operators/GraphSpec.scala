package graft.operators

import scala.util.Random

import graft.SparkTestBase

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class GraphSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark

  test("fixed-point pagerank: exact reference values on a known graph") {
    import spark.implicits._
    // star: 1,2,3 -> 0; 0 -> 1. Node 0 receives three full shares,
    // node 1 receives 0's whole rank, 2 and 3 are dangling receivers.
    val edges = Seq((1L, 0L), (2L, 0L), (3L, 0L), (0L, 1L)).toDF("src", "dst")
    val r1 = Graph.pageRankFixedPoint(edges, "src", "dst", 1)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val S = Graph.Scale
    // after one round from uniform S: inbound(0) = 3S, inbound(1) = S
    assert(r1(0L) === 15L * S / 100 + 85L * (3 * S) / 100)
    assert(r1(1L) === 15L * S / 100 + 85L * S / 100)
    assert(r1(2L) === 15L * S / 100)
    assert(r1(3L) === 15L * S / 100)
  }

  test("pagerank is partitioning-invariant (integer arithmetic, no float drift)") {
    import spark.implicits._
    val rnd = new scala.util.Random(3)
    val edges = (1 to 300).map(_ => (rnd.nextInt(40).toLong, rnd.nextInt(40).toLong))
      .filter(p => p._1 != p._2).toDF("src", "dst")
    def run(parts: Int) = Graph.pageRankFixedPoint(
      edges.repartition(parts), "src", "dst", 4)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(run(1) === run(13))
  }

  test("triangle count matches brute force on seeded random graphs") {
    import spark.implicits._
    val rnd = new Random(42)
    for (trial <- 0 until 3) {
      val n = 30
      val raw = (0 until 200).map(_ => (rnd.nextInt(n).toLong, rnd.nextInt(n).toLong))
      // brute force over the canonical simple graph
      val simple = raw.filter { case (a, b) => a != b }
        .map { case (a, b) => (math.min(a, b), math.max(a, b)) }.toSet
      val verts = simple.flatMap(e => Seq(e._1, e._2))
      val expect = verts.toSeq.sorted.combinations(3).count { case Seq(x, y, z) =>
        simple((x, y)) && simple((y, z)) && simple((x, z))
      }
      val got = Graph.triangleCount(raw.toDF("a", "b"), "a", "b").head()
      assert(got.getAs[Long]("n_vertices") === verts.size.toLong, s"trial $trial")
      assert(got.getAs[Long]("n_edges") === simple.size.toLong, s"trial $trial")
      assert(got.getAs[Long]("n_triangles") === expect.toLong, s"trial $trial")
    }
    // known shapes: a 4-clique has 4 triangles, a 4-cycle none
    val k4 = Seq((0L,1L),(0L,2L),(0L,3L),(1L,2L),(1L,3L),(2L,3L)).toDF("a","b")
    assert(Graph.triangleCount(k4, "a", "b").head().getAs[Long]("n_triangles") === 4L)
    val c4 = Seq((0L,1L),(1L,2L),(2L,3L),(3L,0L)).toDF("a","b")
    assert(Graph.triangleCount(c4, "a", "b").head().getAs[Long]("n_triangles") === 0L)
  }

  test("higher in-degree hubs outrank leaves after convergence rounds") {
    import spark.implicits._
    // every node points at the hub 0
    val edges = (1L to 10L).map(i => (i, 0L)).toDF("src", "dst")
    val ranks = Graph.pageRankFixedPoint(edges, "src", "dst", 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(ranks(0L) > ranks(1L))
    assert((1L to 10L).map(ranks).distinct.size === 1)
  }
}
