package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}

/**
 * One declared capability: the Spark implementation and (when the
 * semantics are ANSI-SQL-expressible) the DuckDB oracle that must
 * produce the identical result over the same parquet tables.
 *
 * Keeping both halves in one value is what prevents the classic
 * failure mode of this harness: a Spark result whose column names or
 * types drift from the oracle's (the driver hash-compares values
 * sorted by column name — FIXTURES.md §3).
 */
final case class Q(
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String])

object Q {
  /** Load one harness table (TESTDATA.md) from the given sf directory. */
  def t(s: SparkSession, dir: String, name: String): DataFrame =
    s.read.parquet(s"$dir/$name.parquet")

  /**
   * `events` needs special handling: some sf dirs store `ts` as parquet
   * INT64 TIMESTAMP(NANOS), which Spark 4 refuses outright
   * (PARQUET_TYPE_ILLEGAL). Read nanos as long and truncate to micros —
   * the same ns→us truncation DuckDB's CAST(ts AS TIMESTAMP) performs,
   * so oracles stay value-identical.
   */
  def events(s: SparkSession, dir: String): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.types._
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = t(s, dir, "events")
    raw.schema("ts").dataType match {
      case LongType =>
        // integral division (`div`): ns epoch values exceed 2^53, so
        // double math (plain `/`) silently loses the low microseconds
        raw.withColumn("ts",
          timestamp_micros(expr("ts div 1000")).cast(TimestampNTZType))
      case TimestampType => raw.withColumn("ts", col("ts").cast(TimestampNTZType))
      case _ => raw
    }
  }

  /** Oracle-side mirror of [[events]]: ns→us cast in DuckDB. */
  val eventsOracle: String =
    "(SELECT event_id, CAST(ts AS TIMESTAMP) AS ts, user_id, event_type, value, props FROM events)"
}

/** Every declared query key, in SURVEY §2 order. */
object QueryRegistry {
  val all: Seq[(String, Q)] =
    ScanQueries.all ++ RelationalQueries.all ++ ComplexQueries.all ++ LlmQueries.all

  def queries: Map[String, (SparkSession, String) => DataFrame] =
    all.map { case (k, q) => k -> q.fn }.toMap

  def oracleSql: Map[String, String] =
    all.collect { case (k, Q(_, Some(sql))) => k -> sql }.toMap
}
