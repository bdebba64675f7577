package graft.operators

import graft.operators.Q.t

import org.apache.spark.sql.functions._

/**
 * §2.1 scan/source/sink keys. The native-format keys generate their
 * fixture from the harness parquet with OUR writer inside the query
 * closure, so the DuckDB oracle can verify against the parquet
 * original (FIXTURES.md §3) — no ClickHouse binary needed anywhere
 * (the reference needed `clickhouse-local` to make files,
 * README.md:43-47).
 */
object ScanQueries {

  /** Deterministic per-sfDir fixture location on the local tmp fs. */
  private def fixtureDir(dir: String, name: String): String =
    s"${sys.props("java.io.tmpdir")}/graft_fixtures/${dir.replaceAll("[^A-Za-z0-9.]", "_")}/$name"

  val all: Seq[(String, Q)] = Seq(

    "scan_parquet" -> Q(
      (s, dir) => t(s, dir, "region"),
      Some("SELECT * FROM region")),

    "scan_native_file" -> Q(
      // parquet → our Native writer → our Native reader (DSv2): the
      // reference's `clickhouse_native(path)` table function
      // (src/lib.rs:240-366) as a Spark scan.
      (s, dir) => {
        val fx = fixtureDir(dir, "nation_native")
        t(s, dir, "nation").write.format("clickhouse_native").mode("overwrite").save(fx)
        s.read.format("clickhouse_native").load(fx)
      },
      Some("SELECT n_nationkey, n_name, n_regionkey FROM nation")),

    "scan_native_roundtrip" -> Q(
      // Write + read back a wider table: NTZ timestamps, doubles,
      // strings (the round-1 corruption class).
      (s, dir) => {
        val fx = fixtureDir(dir, "orders_native")
        t(s, dir, "orders").write.format("clickhouse_native").mode("overwrite").save(fx)
        s.read.format("clickhouse_native").load(fx)
      },
      Some("SELECT * FROM orders"))
  )
}
