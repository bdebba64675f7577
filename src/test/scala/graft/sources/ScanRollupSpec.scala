package graft.sources

import graft.SparkTestBase
import graft.operators.QueryRegistry

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/**
 * `scan_matview_rollup` — the -State/-Merge materialized-rollup
 * pattern. The oracle gate proves the merged result equals direct
 * aggregation over the facts; these tests pin the two properties the
 * oracle can't see:
 *  - the merge algebra is SHARDING-INVARIANT (states cut 8 ways, 3
 *    ways, or 1 way merge to identical finals — the property that
 *    makes incremental per-batch maintenance sound), and
 *  - the SERVING plan reads only the native rollup, never the fact
 *    parquet (the O(rollup) read-cost claim).
 */
class ScanRollupSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark

  private def rollupServe(shards: Int) = {
    val li = spark.read.parquet(s"${SparkTestBase.sfDir}/lineitem.parquet")
    val fx = java.nio.file.Files.createTempDirectory("rollup-inv").toString
    li.groupBy(col("l_returnflag"), col("l_linestatus"),
        (col("l_orderkey") % shards).as("shard"))
      .agg(sum(floor(col("l_quantity") * 100)).as("qty_cents_state"),
        sum(floor(col("l_extendedprice") * 100)).as("price_cents_state"),
        count(lit(1)).as("cnt_state"),
        max(col("l_shipdate")).as("max_ship_state"))
      .write.format("clickhouse_native").mode("overwrite").save(fx)
    spark.read.format("clickhouse_native").load(fx)
      .groupBy("l_returnflag", "l_linestatus")
      .agg(sum("qty_cents_state").as("sum_qty_cents"),
        sum("price_cents_state").as("sum_price_cents"),
        sum("cnt_state").as("cnt"),
        max("max_ship_state").as("max_ship"))
  }

  test("state merge is sharding-invariant (incremental maintenance soundness)") {
    def rows(shards: Int) = rollupServe(shards).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.get(5).toString)).toSet
    val eightWay = rows(8)
    assert(eightWay === rows(3))
    assert(eightWay === rows(1))
    assert(eightWay.nonEmpty)
  }

  test("serving plan reads only the rollup, never the fact table") {
    val served = QueryRegistry.queries("scan_matview_rollup")(spark, SparkTestBase.sfDir)
    val plan = served.queryExecution.executedPlan.toString
    assert(plan.contains("clickhouse"), "serving side should scan the native rollup")
    assert(!plan.contains("lineitem.parquet"),
      "serving side must not rescan the fact table")
  }
}
