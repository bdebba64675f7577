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
   * INT64 TIMESTAMP(NANOS), which Spark 4's schema INFERENCE refuses
   * outright (PARQUET_TYPE_ILLEGAL). The vectorized reader, however,
   * happily decodes the raw INT64 into an explicitly-declared LongType
   * field — so the nanos path reads with an explicit schema (the
   * harness events contract, same columns [[eventsOracle]] names) and
   * truncates ns→us, the same truncation DuckDB's CAST(ts AS
   * TIMESTAMP) performs, keeping oracles value-identical. No session
   * conf is touched (the earlier nanosAsLong global leaked read
   * behavior into every other query on the session); schema-on-read is
   * also the pattern that skips the footer-inference pass at scale.
   */
  /** The harness events contract as an explicit read schema (ts held as
    * raw INT64 nanos — see [[events]]). */
  val eventsNanosSchema: org.apache.spark.sql.types.StructType = {
    import org.apache.spark.sql.types._
    StructType(Seq(
      StructField("event_id", LongType), StructField("ts", LongType),
      StructField("user_id", LongType), StructField("event_type", StringType),
      StructField("value", DoubleType), StructField("props", StringType)))
  }

  // dir → ts-is-NANOS, probed once per directory: letting Spark's
  // inference discover it the hard way launches a DISTRIBUTED
  // footer-merge job that fails (PARQUET_TYPE_ILLEGAL) before the
  // fallback kicks in — a guaranteed-doomed job charged to every
  // events query's build. One driver-side footer read answers the
  // same question in milliseconds with no job at all.
  private val tsNanosCache =
    new java.util.concurrent.ConcurrentHashMap[String, java.lang.Boolean]()

  private def tsIsNanos(s: SparkSession, dir: String): Boolean =
    tsNanosCache.computeIfAbsent(dir, { _ =>
      // best-effort: ANY probe failure (odd part-file names, transient
      // IO, exotic layouts) means "answer unknown" → false, which
      // routes events() through the original inference + typed-catch
      // fallback instead of crashing a path that used to work
      try {
        import org.apache.parquet.hadoop.util.HadoopInputFile
        import org.apache.parquet.schema.LogicalTypeAnnotation
        val conf = s.sessionState.newHadoopConf()
        val root = new org.apache.hadoop.fs.Path(s"$dir/events.parquet")
        val fs = root.getFileSystem(conf)
        val file =
          if (fs.getFileStatus(root).isDirectory)
            fs.listStatus(root).map(_.getPath)
              .filter(_.getName.endsWith(".parquet")).headOption.getOrElse(root)
          else root
        val reader = org.apache.parquet.hadoop.ParquetFileReader
          .open(HadoopInputFile.fromPath(file, conf))
        try {
          val schema = reader.getFooter.getFileMetaData.getSchema
          schema.containsField("ts") && (schema.getType(Seq("ts"): _*) match {
            case p: org.apache.parquet.schema.PrimitiveType =>
              p.getLogicalTypeAnnotation match {
                case ts: LogicalTypeAnnotation.TimestampLogicalTypeAnnotation =>
                  ts.getUnit == LogicalTypeAnnotation.TimeUnit.NANOS
                case _ => false
              }
            case _ => false
          })
        } finally reader.close()
      } catch { case scala.util.control.NonFatal(_) => java.lang.Boolean.FALSE }
    })

  def events(s: SparkSession, dir: String): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.types._
    // integral division (`div`) for ns→us: ns epoch values exceed 2^53,
    // so double math (plain `/`) silently loses the low microseconds
    def nsToTs(df: org.apache.spark.sql.DataFrame) = df.withColumn("ts",
      timestamp_micros(expr("ts div 1000")).cast(TimestampNTZType))
    if (tsIsNanos(s, dir))
      // explicit schema: the vectorized reader decodes raw INT64 nanos
      // into a declared LongType field (inference would refuse), and
      // schema-on-read skips the footer-inference pass entirely
      nsToTs(s.read.schema(eventsNanosSchema).parquet(s"$dir/events.parquet"))
    else try {
      val raw = t(s, dir, "events")
      raw.schema("ts").dataType match {
        case TimestampType => raw.withColumn("ts", col("ts").cast(TimestampNTZType))
        // a session with the legacy nanosAsLong conf already set infers
        // LongType instead of throwing — same ns→us conversion applies
        case LongType => nsToTs(raw)
        case _ => raw
      }
    } catch {
      // belt-and-suspenders: nanos layouts the probe cannot see (e.g.
      // an exotic first file) still land on the explicit-schema path
      case e: org.apache.spark.sql.AnalysisException
          if e.getCondition == "PARQUET_TYPE_ILLEGAL" =>
        nsToTs(s.read.schema(eventsNanosSchema).parquet(s"$dir/events.parquet"))
    }
  }

  /** Oracle-side mirror of [[events]]: ns→us cast in DuckDB. */
  val eventsOracle: String =
    "(SELECT event_id, CAST(ts AS TIMESTAMP) AS ts, user_id, event_type, value, props FROM events)"

  /**
   * Serialize an array-typed FINAL projection to a '|'-joined string.
   * The driver's pandas gate sorts result cells before hashing and
   * cannot hash array-typed values (numpy.ndarray is unhashable), so
   * every registered query's final schema must be scalar-only — the
   * same discipline q_agg_collect established. The array form of each
   * operator stays covered by its ScalaTest spec; the registry applies
   * this serialization on BOTH engines (oracle mirror [[strArrSql]]).
   * Accepts string/integer element types only: Spark's element cast to
   * string renders integers identically to DuckDB's VARCHAR cast. For
   * double elements use [[strArr4dp]]; scale float elements to exact
   * integers first.
   */
  def strArr(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    import org.apache.spark.sql.functions.{array, array_join, coalesce, element_at, lit, transform, when}
    // A NULL ARRAY (outer-join miss) serializes as the sentinel '\N',
    // distinct from an EMPTY array's '' — so a genuine engine
    // divergence (one side NULL, the other []) shows up in the oracle
    // diff instead of both collapsing to ''. The sentinel test runs on
    // the raw column; the inner coalesce only covers DuckDB's
    // array_to_string returning NULL for an empty (non-NULL) list,
    // mirrored in [[strArrSql]].
    // The argument is evaluated ONCE, by binding it as the element of a
    // 1-element array and serializing inside the lambda (r14): the
    // previous when(c.isNull, …).otherwise(f(c)) spelling expanded the
    // argument expression twice per row, and strArr callers pass
    // expensive derived arrays (aggregate()/transform() higher-order
    // functions run in non-codegen projections — q_fn_array_transform
    // paid its cumulative-sum aggregate twice per row).
    element_at(transform(array(c), a =>
      when(a.isNull, lit("\\N"))
        .otherwise(coalesce(array_join(a.cast("array<string>"), "|"), lit("")))), 1)
  }

  /** Oracle mirror of [[strArr]]: NULL array → '\N' sentinel; the
    * coalesce matters for the non-NULL empty list, where DuckDB's
    * array_to_string returns NULL but Spark's array_join returns ''. */
  def strArrSql(inner: String): String =
    s"CASE WHEN ($inner) IS NULL THEN '\\N' " +
      s"ELSE coalesce(array_to_string($inner, '|'), '') END"

  /**
   * [[strArr]] for double elements: fixed "%.4f" rendering on both
   * engines. printf of the SAME double is engine-identical PROVIDED the
   * doubles are engine-identical (each caller's exact-regime
   * arithmetic), non-negative (Java renders -0.0 as "-0.0000", DuckDB
   * as "0.0000"), and can never be an odd multiple of 2⁻⁵. That last
   * precondition is what rules out a 4th-decimal tie: a tie value
   * (2k+1)/(2·10⁴) IS exactly representable whenever 5⁴ divides 2k+1
   * (e.g. 0.03125 = 1/32), and on such values Java's %.4f (HALF_UP)
   * and DuckDB's printf (half-even) disagree. Callers whose values are
   * integer-valued or coarser dyadic rationals (integer sums, counts)
   * satisfy it; anything that could hit 2⁻⁵ granularity must serialize
   * as scaled integers instead (the q_fn_array_sort approach).
   */
  def strArr4dp(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    import org.apache.spark.sql.functions.{array, array_join, coalesce, element_at, format_string, lit, transform, when}
    // same NULL-array sentinel discipline as [[strArr]] (previously the
    // Spark side passed NULL through while the oracle coalesced to '' —
    // a latent mismatch no 4dp query happened to trigger); same
    // evaluate-once binding as [[strArr]] (r14)
    element_at(transform(array(c), a =>
      when(a.isNull, lit("\\N"))
        .otherwise(coalesce(
          array_join(transform(a, x => format_string("%.4f", x)), "|"), lit("")))), 1)
  }

  /** Oracle mirror of [[strArr4dp]]. */
  def strArr4dpSql(inner: String): String =
    s"CASE WHEN ($inner) IS NULL THEN '\\N' ELSE coalesce(" +
      s"array_to_string(list_transform($inner, x -> printf('%.4f', x)), '|'), '') END"
}

/** Every declared query key, in SURVEY §2 order. */
object QueryRegistry {
  val all: Seq[(String, Q)] =
    ScanQueries.all ++ RelationalQueries.all ++ ComplexQueries.all ++
      LlmQueries.all ++ EngineQueries.all ++ AnalyticsQueries.all ++
      CurationQueries.all ++ BitmapQueries.all ++ SpatialQueries.all ++
      MetricsQueries.all ++ StreamingQueries.all

  def queries: Map[String, (SparkSession, String) => DataFrame] =
    all.map { case (k, q) => k -> q.fn }.toMap

  def oracleSql: Map[String, String] =
    all.collect { case (k, Q(_, Some(sql))) => k -> sql }.toMap
}
