package graft

import graft.operators.QueryRegistry

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {

  /**
   * Flagship query (SURVEY §7): the reference README.md:63 demo —
   * `SELECT count(*), max(...)` over a ClickHouse-Native scan — with
   * the fixture produced by our own writer from the harness parquet.
   */
  def entry(spark: SparkSession): DataFrame = {
    val dir = "/root/testdata/sf0.001"
    val fx = s"${sys.props("java.io.tmpdir")}/graft_fixtures/entry_lineitem_native"
    spark.read.parquet(s"$dir/lineitem.parquet")
      .write.format("clickhouse_native").mode("overwrite").save(fx)
    spark.read.format("clickhouse_native").load(fx)
      .agg(count(lit(1)).as("cnt"), max(col("l_quantity")).as("max_qty"))
  }

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = QueryRegistry.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] = QueryRegistry.oracleSql
}
