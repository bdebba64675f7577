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
  private[operators] def fixtureDir(dir: String, name: String): String =
    s"${sys.props("java.io.tmpdir")}/graft_fixtures/${dir.replaceAll("[^A-Za-z0-9.]", "_")}/$name"

  object NativeFixtures {
    /** The single .clickhouse part file inside a writer output dir. */
    def singlePart(dir: String): String = {
      val fs = new java.io.File(dir)
      fs.listFiles().filter(_.getName.endsWith(".clickhouse")).map(_.getPath).sorted.head
    }
  }

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

    "scan_native_tvf" -> Q(
      // The reference's EXACT SQL syntax — `SELECT … FROM
      // clickhouse_native('/path')` (src/lib.rs:368-373) — through the
      // injected table function (GraftExtensions.injectTableFunction),
      // hash-gated end-to-end like every other key.
      (s, dir) => {
        val fx = fixtureDir(dir, "nation_native_tvf")
        t(s, dir, "nation").write.format("clickhouse_native").mode("overwrite").save(fx)
        s.sql(s"""SELECT n_nationkey, n_name, n_regionkey
                  FROM clickhouse_native('$fx') WHERE n_regionkey <> 2""")
      },
      Some("""SELECT n_nationkey, n_name, n_regionkey FROM nation
              WHERE n_regionkey <> 2""")),

    "scan_numbers_tvf" -> Q(
      // ClickHouse's numbers() generator TVF over Spark's Range node
      // (GraftExtensions) — exercised with the reference README's own
      // smoke-query shape (README.md:63: count(*)+max over a numbers
      // table; the reference's only fixture IS a numbers table).
      (s, _) => s.sql(
        """SELECT count(*) AS n, min(number) AS mn, max(number) AS mx,
                  sum(number) AS total
           FROM numbers(1000000)"""),
      Some("""SELECT count(*) AS n, min(number) AS mn, max(number) AS mx,
                     CAST(sum(number) AS BIGINT) AS total
              FROM range(1000000) t(number)""")),

    "scan_matview_rollup" -> Q(
      // ClickHouse's materialized-view / AggregatingMergeTree pattern
      // (the -State / -Merge combinator pair) re-expressed Spark-first:
      // a maintenance pass writes PARTIAL aggregate states into a
      // small native rollup table keyed by (group, shard) — the
      // -State half — and the serving query reads ONLY the rollup,
      // merging states with sum-of-sums / sum-of-counts / max-of-maxes
      // — the -Merge half. Money flows through floor-cents fixed point
      // so the merge algebra is associative and the gate stays
      // arithmetic-exact under ANY sharding. At 100 TB the rollup is
      // maintained incrementally per ingest batch and is orders of
      // magnitude smaller than the fact table; serving cost is
      // O(rollup), the fact table is never rescanned.
      (s, dir) => {
        val fx = fixtureDir(dir, "rollup_lineitem")
        t(s, dir, "lineitem")
          .groupBy(col("l_returnflag"), col("l_linestatus"),
            (col("l_orderkey") % 8).as("shard"))
          .agg(
            sum(floor(col("l_quantity") * 100)).as("qty_cents_state"),
            sum(floor(col("l_extendedprice") * 100)).as("price_cents_state"),
            count(lit(1)).as("cnt_state"),
            max(col("l_shipdate")).as("max_ship_state"))
          .write.format("clickhouse_native").mode("overwrite").save(fx)
        s.read.format("clickhouse_native").load(fx)
          .groupBy("l_returnflag", "l_linestatus")
          .agg(sum("qty_cents_state").as("sum_qty_cents"),
            sum("price_cents_state").as("sum_price_cents"),
            sum("cnt_state").as("cnt"),
            max("max_ship_state").as("max_ship"))
      },
      Some("""SELECT l_returnflag, l_linestatus,
                CAST(sum(CAST(floor(l_quantity * 100) AS BIGINT)) AS BIGINT)
                  AS sum_qty_cents,
                CAST(sum(CAST(floor(l_extendedprice * 100) AS BIGINT)) AS BIGINT)
                  AS sum_price_cents,
                count(*) AS cnt, max(l_shipdate) AS max_ship
              FROM lineitem GROUP BY l_returnflag, l_linestatus""")),

    "scan_rollup_bitmap" -> Q(
      // AggregatingMergeTree with groupBitmapState — the EXACT-distinct
      // sibling of scan_matview_rollup: maintenance writes per-(group,
      // shard) serialized bitmap states (base64 in a native String
      // column) plus event counts into a small native rollup; serving
      // reads ONLY the rollup and merges states with bitmap_union_agg
      // (the groupBitmapMerge half). Bitmap union is associative and
      // commutative, so the served distinct count is EXACT under any
      // sharding — unlike HLL rollups, which this engine offers as the
      // approximate tier. At 100 TB the rollup is O(groups × shards ×
      // distinct/8) bytes and the fact table is never rescanned.
      (s, dir) => {
        val fx = fixtureDir(dir, "rollup_bitmap_events")
        Q.events(s, dir)
          .groupBy(col("event_type"), (col("user_id") % 8).as("shard"))
          .agg(expr("base64(bitmap_agg(user_id))").as("users_state"),
            count(lit(1)).as("cnt_state"))
          .write.format("clickhouse_native").mode("overwrite").save(fx)
        s.read.format("clickhouse_native").load(fx)
          .groupBy("event_type")
          .agg(
            expr("bitmap_cardinality(bitmap_union_agg(unbase64(users_state)))")
              .as("uniq_users"),
            sum("cnt_state").as("n_events"))
      },
      Some(s"""SELECT event_type, count(DISTINCT user_id) AS uniq_users,
                     count(*) AS n_events
              FROM ${Q.eventsOracle} GROUP BY event_type""")),

    "scan_remote_tvf" -> Q(
      // `clickhouse_scan('SELECT …', url)` as a table function, the
      // file:// scheme routing to the recorded-response transport —
      // the same server double scan_remote_query exercises through
      // the reader API.
      (s, dir) => {
        val fx = fixtureDir(dir, "remote_response_tvf")
        t(s, dir, "region").coalesce(1)
          .write.format("clickhouse_native").mode("overwrite").save(fx)
        val part = NativeFixtures.singlePart(fx)
        s.sql(s"""SELECT r_regionkey, r_name
                  FROM clickhouse_scan('SELECT * FROM region', 'file://$part')""")
      },
      Some("SELECT r_regionkey, r_name FROM region")),

    "scan_remote_query" -> Q(
      // the reference's clickhouse_scan() as a Spark source; the
      // "server response" is a recorded Native byte stream produced by
      // our writer (transport seam documented in docs/REMOTE_SCAN.md)
      (s, dir) => {
        val fx = fixtureDir(dir, "remote_response")
        t(s, dir, "supplier").coalesce(1)
          .write.format("clickhouse_native").mode("overwrite").save(fx)
        val part = NativeFixtures.singlePart(fx)
        s.read.format("clickhouse_remote")
          .option("query", "SELECT * FROM supplier")
          .option("transport", "file")
          .option("responsePath", part)
          .load()
      },
      Some("SELECT * FROM supplier")),

    "scan_native_roundtrip" -> Q(
      // Write + read back a wider table: NTZ timestamps, doubles,
      // strings (the round-1 corruption class).
      (s, dir) => {
        val fx = fixtureDir(dir, "orders_native")
        t(s, dir, "orders").write.format("clickhouse_native").mode("overwrite").save(fx)
        s.read.format("clickhouse_native").load(fx)
      },
      Some("SELECT * FROM orders")),

    "scan_native_compressed" -> Q(
      // The compressed-frame path end-to-end: LZ4 ClickHouse frames on
      // disk (CityHash128-checksummed, sniffed on read), same rows out.
      // The reference reads raw Native only ("Compression support" is
      // its unchecked box, README.md:133).
      (s, dir) => {
        val fx = fixtureDir(dir, "orders_native_lz4")
        t(s, dir, "orders").write.format("clickhouse_native")
          .option("compression", "lz4").mode("overwrite").save(fx)
        s.read.format("clickhouse_native").load(fx)
      },
      Some("SELECT * FROM orders")),

    "scan_native_map_tuple" -> Q(
      // Map(String, String) + named Tuple through the native
      // write → read path — the two nested types the reference
      // degrades to the `<unsupported:T>` sentinel (src/lib.rs:137);
      // here they serialize as the real CH wire layouts (Map =
      // Array(Tuple(K,V)) offsets+flats, Tuple = element-by-element
      // columns — NativeBlock) and decode to Spark MapType/StructType.
      // The read-back extracts scalars so the DuckDB oracle can state
      // the result over the parquet original.
      (s, dir) => {
        val fx = fixtureDir(dir, "customer_map_tuple_native")
        t(s, dir, "customer")
          .select(col("c_custkey"),
            map(lit("name"), col("c_name"),
              lit("segment"), col("c_mktsegment")).as("m"),
            struct(col("c_nationkey").as("nk"), col("c_acctbal").as("bal")).as("tp"))
          .write.format("clickhouse_native").mode("overwrite").save(fx)
        // tuple fields extract through the CH spelling (tupleElement by
        // name — ChDialect, round 11), so the dialect function rides
        // the same oracle gate as the wire layout it addresses
        s.read.format("clickhouse_native").load(fx)
          .selectExpr("c_custkey",
            "element_at(m, 'name') AS m_name",
            "element_at(m, 'segment') AS m_segment",
            "tupleElement(tp, 'nk') AS tp_nk",
            "tupleElement(tp, 'bal') AS tp_bal")
      },
      Some("""SELECT c_custkey, c_name AS m_name, c_mktsegment AS m_segment,
              c_nationkey AS tp_nk, c_acctbal AS tp_bal FROM customer""")),

    "scan_native_uuid_ip" -> Q(
      // UUID / IPv4 / IPv6 as REAL native binary columns (16/4/16
      // bytes on the wire — NetworkTypesSpec pins the public layouts
      // against hand-built bytes) via the columnTypes write option,
      // decoded back to the canonical strings. The reference degrades
      // all three to `<unsupported:T>` (lib.rs:137). Values derive
      // from c_custkey with engine-exact integer/hex formatting, so
      // the DuckDB oracle states the whole roundtrip from parquet.
      (s, dir) => {
        val fx = fixtureDir(dir, "customer_uuid_ip_native")
        t(s, dir, "customer")
          .select(col("c_custkey"),
            format_string("00000000-0000-4000-8000-%012x", col("c_custkey")).as("u"),
            expr("concat(10, '.', 0, '.', (c_custkey div 256) % 256, '.', c_custkey % 256)").as("ip4"),
            format_string("2001:db8:0:0:0:0:0:%x", col("c_custkey")).as("ip6"))
          .write.format("clickhouse_native")
          .option("columnTypes", "u:UUID,ip4:IPv4,ip6:IPv6")
          .mode("overwrite").save(fx)
        s.read.format("clickhouse_native").load(fx)
      },
      Some("""SELECT c_custkey,
                     printf('00000000-0000-4000-8000-%012x', c_custkey) AS u,
                     concat(10, '.', 0, '.', (c_custkey // 256) % 256, '.', c_custkey % 256) AS ip4,
                     printf('2001:db8:0:0:0:0:0:%x', c_custkey) AS ip6
              FROM customer"""))
      ,

    "scan_native_decimal_enum" -> Q(
      // Decimal128-tier Decimal(38, 4) + Enum16 through the native
      // write → read path. The decimal's unscaled values are ~29
      // digits (c_custkey · 10²⁰, alternating sign) so the 16-byte
      // two's-complement wire tier is genuinely exercised — the
      // reference degrades every decimal and enum to
      // `<unsupported:T>` (lib.rs:137). The enum declares codes
      // outside Int8 (300, 1000) to pin the 2-byte width; labels are
      // the live c_mktsegment values so decode must invert encode on
      // real data. Both sides serialize the decimal AS ITS CANONICAL
      // STRING (fixed scale 4) — engine-exact because the value is
      // constructed FROM that string.
      (s, dir) => {
        val fx = fixtureDir(dir, "customer_decimal_enum_native")
        t(s, dir, "customer")
          .select(col("c_custkey"),
            expr("""cast(concat(case when c_custkey % 2 = 0 then '-' else '' end,
                                cast(c_custkey as string), '00000000000000000000.',
                                lpad(cast(c_nationkey as string), 4, '0'))
                         as decimal(38, 4))""").as("d"),
            col("c_mktsegment").as("seg"),
            // same values through FixedString(12): segments are 8-10
            // chars, so every row exercises real NUL padding on the
            // wire and the strip on decode
            col("c_mktsegment").as("segf"))
          .write.format("clickhouse_native")
          .option("columnTypes", "seg:Enum16('AUTOMOBILE' = 300, 'BUILDING' = -2, " +
            "'FURNITURE' = 7, 'HOUSEHOLD' = 1000, 'MACHINERY' = 0)," +
            "segf:FixedString(12)")
          .mode("overwrite").save(fx)
        s.read.format("clickhouse_native").load(fx)
          .select(col("c_custkey"), col("d").cast("string").as("dec_s"),
            col("seg"), col("segf"))
      },
      // the outer DECIMAL(38,4) cast canonicalizes the rendering (a
      // c_custkey of 0 would otherwise keep its leading zeros / sign)
      Some("""SELECT c_custkey,
                     CAST(CAST(concat(CASE WHEN c_custkey % 2 = 0 THEN '-' ELSE '' END,
                            CAST(c_custkey AS VARCHAR), '00000000000000000000.',
                            lpad(CAST(c_nationkey AS VARCHAR), 4, '0'))
                          AS DECIMAL(38, 4)) AS VARCHAR) AS dec_s,
                     c_mktsegment AS seg,
                     c_mktsegment AS segf
              FROM customer"""))
  )
}
