package graft.sources

import graft.SparkTestBase
import graft.operators.ScanQueries.NativeFixtures

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/**
 * The reference's exact SQL call surface: `clickhouse_native(path)` and
 * `clickhouse_scan(query[, url])` as TABLE functions (reference
 * src/lib.rs:368-373 / src/clickhouse_scan.rs), registered by
 * GraftExtensions.injectTableFunction.
 */
class TvfSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark

  private def writeNationNative(): String = {
    val fx = s"${sys.props("java.io.tmpdir")}/graft_tvf/nation_native"
    spark.read.parquet(s"${SparkTestBase.sfDir}/nation.parquet")
      .write.format("clickhouse_native").mode("overwrite").save(fx)
    fx
  }

  test("SELECT ... FROM clickhouse_native(path) runs verbatim") {
    val fx = writeNationNative()
    val n = spark.sql(s"SELECT count(*) AS c FROM clickhouse_native('$fx')")
      .head().getLong(0)
    assert(n === 25L)
    val row = spark.sql(
      s"""SELECT n_name FROM clickhouse_native('$fx')
          WHERE n_nationkey = 7""").collect()
    assert(row.map(_.getString(0)).toSeq === Seq(
      spark.read.parquet(s"${SparkTestBase.sfDir}/nation.parquet")
        .filter(col("n_nationkey") === 7).head().getAs[String]("n_name")))
  }

  test("the TVF plants the same DSv2 scan: pushdown still reaches the source") {
    val fx = writeNationNative()
    val plan = spark.sql(
      s"SELECT n_name FROM clickhouse_native('$fx') WHERE n_nationkey = 3")
      .queryExecution.executedPlan.toString
    // the native scan advertises itself + pruned columns in the plan
    assert(plan.contains("clickhouse_native") || plan.contains("NativeScan")
      || plan.contains("BatchScan"), plan)
  }

  test("numbers() TVF: limit and (offset, limit) forms on a Range plan") {
    val r = spark.sql(
      "SELECT count(*) AS n, min(number) AS mn, max(number) AS mx FROM numbers(1000)")
      .head()
    assert((r.getLong(0), r.getLong(1), r.getLong(2)) === ((1000L, 0L, 999L)))
    val off = spark.sql(
      "SELECT count(*) AS n, min(number) AS mn, max(number) AS mx FROM numbers(10, 5)")
      .head()
    assert((off.getLong(0), off.getLong(1), off.getLong(2)) === ((5L, 10L, 14L)))
    // generator, not data: the plan is Spark's Range node
    val plan = spark.sql("SELECT number FROM numbers(100)")
      .queryExecution.executedPlan.toString
    assert(plan.contains("Range"), plan.take(500))
  }

  test("clickhouse_scan(query, file://...) reads a recorded server response") {
    val fx = s"${sys.props("java.io.tmpdir")}/graft_tvf/remote_response"
    spark.read.parquet(s"${SparkTestBase.sfDir}/region.parquet").coalesce(1)
      .write.format("clickhouse_native").mode("overwrite").save(fx)
    val part = NativeFixtures.singlePart(fx)
    val out = spark.sql(
      s"SELECT r_name FROM clickhouse_scan('SELECT * FROM region', 'file://$part')")
      .collect().map(_.getString(0)).toSet
    assert(out === spark.read.parquet(s"${SparkTestBase.sfDir}/region.parquet")
      .collect().map(_.getAs[String]("r_name")).toSet)
  }

  test("non-literal or missing arguments fail with a clear message") {
    val fx = writeNationNative()
    val e = intercept[Exception] {
      spark.sql(s"SELECT * FROM clickhouse_native(1 + 2)").collect()
    }
    assert(e.getMessage.contains("string literal") ||
      e.getMessage.toLowerCase.contains("cannot resolve"), e.getMessage)
  }
}
