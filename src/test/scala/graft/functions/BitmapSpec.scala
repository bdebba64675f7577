package graft.functions

import graft.SparkTestBase

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import scala.util.Random

/**
 * [[BitmapLite]] property tests against plain Set semantics: random
 * ids (including negatives and container-boundary values), the
 * array→bitset container flip at 4096, serialization roundtrip,
 * merge associativity, and the distributed contract — the aggregate
 * runs partial+final (ObjectHashAggregate) and its result is
 * invariant to input partitioning.
 */
class BitmapSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark

  private def buildFrom(vs: Seq[Long]): Array[Byte] = {
    val b = new BitmapLite.Builder
    vs.foreach(b.add)
    b.serialize()
  }

  test("cardinality matches Set semantics on adversarial ids") {
    val rnd = new Random(42)
    // mixes: random longs, negatives, a dense run crossing container
    // boundaries, exact boundary values
    val cases = Seq(
      Seq.fill(1000)(rnd.nextLong()),
      Seq.fill(500)(-math.abs(rnd.nextLong())),
      (65530L to 65542L) ++ (131068L to 131076L),
      Seq(0L, 65535L, 65536L, -1L, Long.MaxValue, Long.MinValue),
      Seq.fill(3000)(rnd.nextInt(100000).toLong))
    cases.foreach { vs =>
      assert(BitmapLite.cardinality(buildFrom(vs)) === vs.toSet.size)
    }
  }

  test("array container flips to bitset above 4096 and stays exact") {
    // 5000 distinct low-16 values in one container forces the flip
    val vs = (0 until 5000).map(i => (7L << 16) | (i * 13 % 65536).toLong).distinct
    val ser = buildFrom(vs ++ vs) // duplicates must not double-count
    assert(BitmapLite.cardinality(ser) === vs.toSet.size)
    // and the flipped container still intersects correctly with a sparse one
    val sparse = buildFrom(vs.take(100))
    assert(BitmapLite.andCardinality(ser, sparse) === 100)
  }

  test("and/or/andnot cardinalities match Set algebra") {
    val rnd = new Random(7)
    for (_ <- 1 to 20) {
      val a = Seq.fill(rnd.nextInt(2000) + 1)(rnd.nextInt(5000).toLong - 2500)
      val b = Seq.fill(rnd.nextInt(2000) + 1)(rnd.nextInt(5000).toLong - 2500)
      val (sa, sb) = (a.toSet, b.toSet)
      val (ba, bb) = (buildFrom(a), buildFrom(b))
      assert(BitmapLite.andCardinality(ba, bb) === (sa & sb).size, "and")
      assert(BitmapLite.orCardinality(ba, bb) === (sa | sb).size, "or")
      assert(BitmapLite.andNotCardinality(ba, bb) === (sa -- sb).size, "andnot")
    }
  }

  test("serialize/deserialize roundtrip preserves the bitmap") {
    val rnd = new Random(99)
    val vs = Seq.fill(6000)(rnd.nextLong() % 200000)
    val ser = buildFrom(vs)
    val re = BitmapLite.deserialize(ser).serialize()
    assert(ser.toSeq === re.toSeq)
  }

  test("merge order does not change the result (associative/commutative)") {
    val rnd = new Random(3)
    val parts = Seq.fill(5)(Seq.fill(500)(rnd.nextInt(10000).toLong))
    def mergeAll(order: Seq[Seq[Long]]): Long = {
      val acc = new BitmapLite.Builder
      order.foreach { p =>
        val other = BitmapLite.deserialize(buildFrom(p))
        acc.mergeFrom(other)
      }
      acc.cardinality
    }
    val expect = parts.flatten.toSet.size
    assert(mergeAll(parts) === expect)
    assert(mergeAll(parts.reverse) === expect)
    assert(mergeAll(Random.shuffle(parts)) === expect)
  }

  test("bitmap_agg distributes: ObjectHashAggregate partial+final, partition-invariant") {
    import spark.implicits._
    val df = (1 to 10000).map(i => (i % 7, (i % 950).toLong)).toDF("g", "id")
    val q = df.groupBy("g").agg(expr("bitmap_cardinality(bitmap_agg(id))").as("c"))
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("ObjectHashAggregate"), s"expected object hash agg:\n$plan")
    val base = q.collect().map(r => (r.getInt(0), r.getLong(1))).sortBy(_._1)
    val re = df.repartition(13).groupBy("g")
      .agg(expr("bitmap_cardinality(bitmap_agg(id))").as("c"))
      .collect().map(r => (r.getInt(0), r.getLong(1))).sortBy(_._1)
    assert(base === re)
    // ground truth
    val want = (1 to 10000).groupBy(_ % 7)
      .map { case (g, is) => (g, is.map(_ % 950).toSet.size.toLong) }
      .toSeq.sortBy(_._1)
    assert(base.toSeq === want)
  }

  test("state/merge split is sharding-invariant (groupBitmapState ≡ groupBitmapMerge)") {
    import spark.implicits._
    val df = (1 to 8000).map(i => ((i % 5), (i % 733).toLong)).toDF("g", "id")
    val direct = df.groupBy("g")
      .agg(expr("bitmap_cardinality(bitmap_agg(id))").as("c"))
      .collect().map(r => (r.getInt(0), r.getLong(1))).sortBy(_._1).toSeq
    Seq(1, 3, 8).foreach { shards =>
      val merged = df.groupBy(col("g"), pmod(col("id"), lit(shards)).as("shard"))
        .agg(expr("bitmap_agg(id)").as("state"))
        .groupBy("g")
        .agg(expr("bitmap_cardinality(bitmap_union_agg(state))").as("c"))
        .collect().map(r => (r.getInt(0), r.getLong(1))).sortBy(_._1).toSeq
      assert(merged === direct, s"$shards-way sharding")
    }
  }

  test("states survive a base64 round-trip (the native-rollup storage form)") {
    import spark.implicits._
    val df = (1 to 3000).map(i => (i % 3, (i % 451).toLong)).toDF("g", "id")
    val viaB64 = df.groupBy(col("g"), pmod(col("id"), lit(4)).as("shard"))
      .agg(expr("base64(bitmap_agg(id))").as("s64"))
      .groupBy("g")
      .agg(expr("bitmap_cardinality(bitmap_union_agg(unbase64(s64)))").as("c"))
      .collect().map(r => (r.getInt(0), r.getLong(1))).sortBy(_._1).toSeq
    val want = (1 to 3000).groupBy(_ % 3)
      .map { case (g, is) => (g, is.map(_ % 451).toSet.size.toLong) }.toSeq.sortBy(_._1)
    assert(viaB64 === want)
  }
}
