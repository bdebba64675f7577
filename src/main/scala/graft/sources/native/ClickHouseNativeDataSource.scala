package graft.sources.native

import java.util
import java.util.OptionalLong

import scala.jdk.CollectionConverters._

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.sql.connector.catalog.{SupportsRead, SupportsWrite, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.{aggregate, Transform}
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.connector.write._
import org.apache.spark.sql.sources.{DataSourceRegister, Filter}
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/**
 * `clickhouse_native` DataSource V2 — the Spark-native re-expression of
 * the reference's `clickhouse_native(filepath)` DuckDB table function
 * (reference src/lib.rs:240-366).
 *
 *   spark.read.format("clickhouse_native").load(path)    // path|glob|dir
 *   df.write.format("clickhouse_native").mode("append"|"overwrite").save(path)
 *
 * Differences from the reference, by design (SURVEY §3.1/§4.2):
 *  - schema inference reads only the first block's headers, not the
 *    whole file twice (ref binds AND inits with full parses,
 *    src/lib.rs:251, :271-274);
 *  - data streams block-by-block in executors — nothing is ever
 *    materialized on the driver;
 *  - a directory/glob of native files scans in parallel across
 *    executors; files carrying a [[NativeIndex]] sidecar (everything
 *    our writer produces) additionally split INTRA-file into
 *    maxPartitionBytes block ranges — foreign files without one fall
 *    back to a single partition (the raw format has no discoverable
 *    split points — "full-scans at this time", README.md:51);
 *  - column pruning is pushed into the block decoder
 *    (SupportsPushDownRequiredColumns → skip-decode), limit pushdown
 *    stops block iteration early (SupportsPushDownLimit);
 *  - a writer exists (the reference only reads; files had to come from
 *    `clickhouse-local ... FORMAT Native`, README.md:43-47).
 */
class ClickHouseNativeDataSource extends TableProvider with DataSourceRegister {
  override def shortName(): String = "clickhouse_native"

  override def supportsExternalMetadata(): Boolean = true

  override def inferSchema(options: CaseInsensitiveStringMap): StructType = {
    val conf = NativeIO.sessionHadoopConf()
    val paths = NativeIO.paths(options)
    val files = NativeIO.resolveFiles(paths, conf)
    if (files.isEmpty)
      // A typo'd path must fail loudly, not scan as 0 rows.
      throw new IllegalArgumentException(
        s"clickhouse_native: no files found for path(s): ${paths.mkString(", ")}")
    // The sidecar's writer-declared compression rides into the probe —
    // same authority as the partition readers use — so files this
    // writer produced are never sniffed at schema time either (and
    // checksum=skip, which forbids sniffing, still works here).
    def headerOf(p: Path): Seq[(String, ChType)] = {
      val fs = p.getFileSystem(conf)
      val declared =
        try NativeIndex.readWithMeta(fs, p, fs.getFileStatus(p).getLen)
          .flatMap(_._2.get("compression"))
        catch { case _: java.io.IOException => None }
      val s = NativeCompression.maybeWrapRead(fs.open(p), conf, declared)
      try NativeBlockReader.readHeader(s) finally s.close()
    }
    if (options.getBoolean("mergeSchema", false)) {
      // Schema evolution: the UNION of every readable file header, in
      // first-seen column order — the layout a long-lived table has
      // after `ALTER TABLE ADD COLUMN` (old parts simply lack the new
      // column; both partition readers already null-fill absent
      // columns per block, and zone-map pruning keeps blocks whose
      // stats lack the column, so the merged schema is sufficient).
      // A column missing from ANY readable file must be nullable —
      // its rows from old parts ARE null. Same-name type conflicts
      // fail loudly: silent coercion would decode garbage.
      // Cost: one driver-side header read per file (the first block
      // header only, not data) — O(files) at bind time, the same
      // contract parquet's mergeSchema accepts.
      val headers = files.map(p => p -> headerOf(p)).filter(_._2.nonEmpty)
      if (headers.isEmpty)
        throw new IllegalArgumentException(
          s"clickhouse_native: ${files.length} file(s) matched but none has a " +
            s"readable block header (all empty/truncated?): ${paths.mkString(", ")}")
      // Recursive merge that widens NULLABILITY at every nesting level
      // (containsNull / valueContainsNull / struct-field nullability —
      // e.g. a literal-built array<bigint> part vs a collect_list
      // array<nullable bigint> part is a legitimate union, the same
      // widening parquet's mergeSchema performs) but refuses any BASE
      // type difference — silent coercion would decode garbage.
      def mergeTypes(a: DataType, b: DataType, name: String, p: Path): DataType =
        (a, b) match {
          case (x, y) if x == y => x
          case (ArrayType(ea, na), ArrayType(eb, nb)) =>
            ArrayType(mergeTypes(ea, eb, name, p), na || nb)
          case (MapType(ka, va, na), MapType(kb, vb, nb)) =>
            MapType(mergeTypes(ka, kb, name, p), mergeTypes(va, vb, name, p), na || nb)
          case (StructType(fa), StructType(fb))
              if fa.map(_.name).sameElements(fb.map(_.name)) =>
            StructType(fa.zip(fb).map { case (x, y) =>
              StructField(x.name, mergeTypes(x.dataType, y.dataType, name, p),
                x.nullable || y.nullable)
            })
          case _ =>
            throw new IllegalArgumentException(
              s"clickhouse_native: mergeSchema type conflict on column '$name': " +
                s"${a.simpleString} vs ${b.simpleString} (in $p)")
        }
      val order = scala.collection.mutable.LinkedHashMap[String, StructField]()
      // exact-name keyed, but same-name-MODULO-CASE across parts is a
      // loud conflict too: 'id' in one part and 'ID' in another would
      // merge into two distinct columns that Spark's default
      // case-insensitive resolution then can't disambiguate — the same
      // garbage-read class as a type conflict, so the same failure
      // policy (the catalog's equalsIgnoreCase guard only protects
      // catalog-managed tables, not path reads).
      val byLower = scala.collection.mutable.HashMap[String, String]()
      headers.foreach { case (p, header) =>
        header.foreach { case (name, t) =>
          byLower.get(name.toLowerCase(java.util.Locale.ROOT)) match {
            case Some(prior) if prior != name =>
              throw new IllegalArgumentException(
                s"clickhouse_native: mergeSchema case-collision: column '$name' " +
                  s"(in $p) differs only by case from '$prior' in another part — " +
                  "ambiguous under Spark's case-insensitive resolution")
            case _ => byLower(name.toLowerCase(java.util.Locale.ROOT)) = name
          }
          val f = StructField(name, t.sparkType, nullable = ChType.isNullable(t))
          order.get(name) match {
            case None => order(name) = f
            case Some(prev) => order(name) = StructField(prev.name,
              mergeTypes(prev.dataType, f.dataType, name, p),
              prev.nullable || f.nullable)
          }
        }
      }
      val merged = order.values.toSeq
      val universal = headers.map(_._2.map(_._1).toSet).reduce(_ intersect _)
      StructType(merged.map(f =>
        if (universal(f.name)) f else f.copy(nullable = true)))
    } else {
      // First file with a readable header wins (tolerates empty files
      // from other writers; our own writer no longer produces them).
      val header = files.iterator.map(headerOf)
        .find(_.nonEmpty).getOrElse(
          // all files headerless → fail loudly, same policy as no-files
          throw new IllegalArgumentException(
            s"clickhouse_native: ${files.length} file(s) matched but none has a " +
              s"readable block header (all empty/truncated?): ${paths.mkString(", ")}"))
      StructType(header.map { case (name, t) =>
        StructField(name, t.sparkType, nullable = ChType.isNullable(t))
      })
    }
  }

  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new NativeTable(schema, NativeIO.paths(new CaseInsensitiveStringMap(properties)))
}

private[sources] object NativeIO {
  /**
   * Session Hadoop configuration (S3/GCS credentials, fs.* settings) —
   * driver-side capture; ship to executors via [[SerializableHadoopConf]].
   * Bare `new Configuration()` would silently drop all of it.
   */
  def sessionHadoopConf(): Configuration =
    SparkSession.getActiveSession.map(_.sessionState.newHadoopConf())
      .getOrElse(new Configuration())

  /** Extract load paths from options ("path" or JSON-array "paths"). */
  def paths(options: CaseInsensitiveStringMap): Seq[String] = {
    val multi = Option(options.get("paths")).map { json =>
      // minimal JSON string-array parse: ["a","b"]
      json.trim.stripPrefix("[").stripSuffix("]").split(",")
        .map(_.trim.stripPrefix("\"").stripSuffix("\"")).filter(_.nonEmpty).toSeq
    }.getOrElse(Seq.empty)
    val single = Option(options.get("path")).toSeq
    (multi ++ single).distinct
  }

  /** Expand dirs and globs into concrete .clickhouse/.native data files. */
  def resolveFiles(paths: Seq[String], conf: Configuration): Seq[Path] =
    resolveFileStatuses(paths, conf).map(_.getPath)

  /** Same, keeping the FileStatus (length) from the single listing RPC. */
  def resolveFileStatuses(paths: Seq[String], conf: Configuration): Seq[org.apache.hadoop.fs.FileStatus] = {
    paths.flatMap { p =>
      val path = new Path(p)
      val fs = path.getFileSystem(conf)
      val matches = Option(fs.globStatus(path)).map(_.toSeq).getOrElse(Seq.empty)
      matches.flatMap { st =>
        if (st.isDirectory)
          fs.listStatus(st.getPath).toSeq
            .filter(f => f.isFile && !f.getPath.getName.startsWith("_") && !f.getPath.getName.startsWith("."))
        else Seq(st)
      }
    }.sortBy(_.getPath.toString)
  }
}

private[native] class NativeTable(tableSchema: StructType, paths: Seq[String],
    bucket: Option[(String, Int)] = None, tableProps: Map[String, String] = Map.empty,
    displayName: Option[String] = None)
    extends Table with SupportsRead with SupportsWrite {
  override def name(): String =
    displayName.getOrElse(s"clickhouse_native(${paths.mkString(",")})")
  override def schema(): StructType = tableSchema

  /** Catalog tables may be hash-bucketed: layout metadata for Catalyst. */
  override def partitioning(): Array[Transform] =
    bucket.map { case (col, n) =>
      org.apache.spark.sql.connector.expressions.Expressions.bucket(n, col)
    }.toArray
  // NOT ACCEPT_ANY_SCHEMA: with it, Spark skips resolving an INSERT's
  // input columns against the table schema, so `INSERT INTO t VALUES`
  // wrote files whose columns were named col1/col2/... — which the
  // by-name reader then resolved to all-null. Without it, Spark
  // reorders/renames/casts the input to this schema before the writer
  // ever sees a row.
  override def capabilities(): util.Set[TableCapability] =
    Set(TableCapability.BATCH_READ, TableCapability.BATCH_WRITE,
      TableCapability.MICRO_BATCH_READ, TableCapability.STREAMING_WRITE,
      TableCapability.TRUNCATE).asJava

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new NativeScanBuilder(tableSchema, paths, bucket)

  /** Write option with table-property fallback (catalog tables persist defaults). */
  private def opt(info: LogicalWriteInfo, key: String): Option[String] =
    Option(info.options.get(key)).orElse(tableProps.get(key))

  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder = {
    // Validate at write-build time: 0/negative would rotate on every
    // row (one part file per input row at scale), and a non-numeric
    // value should name the option, not surface a bare
    // NumberFormatException from inside a task.
    val maxRows = opt(info, "maxRowsPerFile").map { v =>
      val n = v.toIntOption.getOrElse(throw new IllegalArgumentException(
        s"clickhouse_native write option maxRowsPerFile must be a positive integer, got '$v'"))
      if (n <= 0) throw new IllegalArgumentException(
        s"clickhouse_native write option maxRowsPerFile must be > 0, got $n")
      n
    }.getOrElse(8 * 1024 * 1024)
    val dictEncode = opt(info, "dictionaryEncode").getOrElse("auto") match {
      case "auto" => true
      case "off" => false
      case other => throw new IllegalArgumentException(
        s"clickhouse_native write option dictionaryEncode must be 'auto' or 'off', got '$other'")
    }
    val compression = opt(info, "compression").getOrElse("none")
    NativeCompression.methodFor(compression) // validate at plan time
    // sortBy (option or table property): comma-separated columns the
    // incoming rows are sorted by per write task BEFORE the writer
    // runs — block zone maps over a sorted layout prune range/point
    // queries to O(matching blocks) instead of "all blocks overlap".
    val sortBy = opt(info, "sortBy").map(_.split(",").map(_.trim).filter(_.nonEmpty).toSeq)
      .getOrElse(Seq.empty)
    val insertDedup = opt(info, "insertDedup").getOrElse("false") match {
      case "true" => true
      case "false" => false
      case other => throw new IllegalArgumentException(
        s"clickhouse_native write option insertDedup must be 'true' or 'false', got '$other'")
    }
    // dedup-identity scope (CH's insert_deduplication_token): when set,
    // a new part only dedups against pre-existing parts carrying the
    // SAME token — so two epochs/jobs with legitimately identical
    // content both land, while a RETRY of one job (same token) stays a
    // no-op. Empty (default) = pure content identity, as before.
    val insertDedupToken = opt(info, "insertDedupToken").getOrElse("")
    // columnTypes: declare columns as CH types the writer cannot infer
    // from Spark's type system — the CAST-at-insert ETL idiom. Uses:
    // STRING columns as UUID / IPv4 / IPv6 (16/4/16-byte binary on the
    // wire instead of var-length text), Enum8/Enum16 (1/2-byte codes),
    // or FixedString(n) (NUL-padded fixed slots; too-long values fail
    // the write like a CH INSERT); decode returns the same strings.
    // Entries split at
    // TOP-LEVEL commas only — an Enum declaration's own commas stay
    // inside it. Validated here so a typo is one clean plan-time error.
    val typeOverrides: Map[String, String] =
      opt(info, "columnTypes").map(ChType.splitTopLevel(_).map(_.trim).filter(_.nonEmpty)
        .map { e =>
          val i = e.indexOf(':')
          if (i <= 0 || i == e.length - 1) throw new IllegalArgumentException(
            s"clickhouse_native write option columnTypes: expected 'col:Type', got '$e'")
          val (c, tn) = (e.substring(0, i).trim, e.substring(i + 1).trim)
          val f = info.schema().fields.find(_.name == c).getOrElse(
            throw new IllegalArgumentException(
              s"clickhouse_native columnTypes: column '$c' not in write schema"))
          val parsed = ChType.parse(tn)
          // read-only types: wide ints / wide decimals decode to exact
          // strings but have no encoder (no Spark source type for them)
          if (parsed.isInstanceOf[ChType.ChUnsupported] ||
              parsed.isInstanceOf[ChType.ChBigInt] ||
              parsed.isInstanceOf[ChType.ChWideDecimal])
            throw new IllegalArgumentException(
              s"clickhouse_native columnTypes: type '$tn' is not writable")
          if (parsed.sparkType != f.dataType) throw new IllegalArgumentException(
            s"clickhouse_native columnTypes: column '$c' is ${f.dataType}, " +
              s"but CH type '$tn' decodes as ${parsed.sparkType}")
          c -> parsed.name
        }.toMap).getOrElse(Map.empty)
    new NativeWriteBuilder(info.schema(), paths.headOption.getOrElse(
        throw new IllegalArgumentException("clickhouse_native write requires a path")),
      maxRows, dictEncode, compression, bucket, sortBy, insertDedup, insertDedupToken,
      typeOverrides)
  }
}

private[native] class NativeScanBuilder(fullSchema: StructType, paths: Seq[String],
    bucket: Option[(String, Int)] = None)
    extends ScanBuilder with SupportsPushDownRequiredColumns with SupportsPushDownLimit
    with SupportsPushDownAggregates with SupportsPushDownFilters {
  private var required: StructType = fullSchema
  private var limit: Int = -1
  private var countStar = false
  private var prunableFilters: Array[Filter] = Array.empty

  override def pruneColumns(requiredSchema: StructType): Unit = {
    // Catalyst hands us exactly the referenced columns; decode only those.
    required = requiredSchema
  }

  override def pushLimit(l: Int): Boolean = { limit = l; false /* keep host-side limit too */ }

  /**
   * Filters are used for ZONE-MAP pruning only (skip blocks/files whose
   * sidecar min/max can't satisfy them) — every filter is returned as
   * residual, so Spark still evaluates them row-by-row and semantics
   * never depend on sidecar correctness. `pushedFilters` reports just
   * the ones pruning can actually use, which is what EXPLAIN shows.
   */
  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    prunableFilters = filters.filter(NativeIndex.prunable)
    filters
  }
  override def pushedFilters(): Array[Filter] = prunableFilters

  /**
   * `count(*)` pushdown: the row count is in every block header, so a
   * count scan never decodes a single value — each partition skips
   * through its file summing header counts and returns ONE row. Spark
   * sums the per-partition partials (supportCompletePushDown stays
   * false, so multi-file scans work unchanged). At 100 TB this turns
   * the reference's flagship query (README.md:63) from a full
   * row-emission pass into pure block-header walking.
   */
  override def pushAggregation(agg: aggregate.Aggregation): Boolean = {
    val ok = limit < 0 && agg.groupByExpressions.isEmpty &&
      agg.aggregateExpressions.length == 1 &&
      agg.aggregateExpressions()(0).isInstanceOf[aggregate.CountStar]
    if (ok) countStar = true
    ok
  }

  override def build(): Scan = {
    val conf = new SerializableHadoopConf(NativeIO.sessionHadoopConf())
    if (countStar) new NativeCountScan(paths, conf)
    else new NativeScan(fullSchema, required, paths, limit, conf, prunableFilters, bucket)
  }
}

/**
 * Micro-batch streaming over a directory of Native part files — the
 * FileStreamSource pattern for our own format: each trigger picks up
 * part files that appeared since the last committed offset (files are
 * immutable once visible, the contract our rotating writer satisfies).
 *
 * The offset is an index into a DISCOVERY-ORDER file log persisted
 * under the checkpoint location. Slicing a name-sorted listing by
 * count would be wrong: a later batch's files can sort BEFORE earlier
 * ones (task ids interleave across partitions), which would re-read
 * old files and skip new ones. The log pins each file to a stable
 * index at discovery time and survives checkpoint restart.
 *
 * The log is APPEND-ONLY: a directory of immutable segment files, one
 * per discovery batch, each named by the index of its first file
 * (HDFSMetadataLog-style). Nothing existing is ever rewritten or
 * deleted, so a driver crash at any point leaves every previously
 * committed index mapping intact — the exactly-once guarantee rests on
 * that. If the checkpoint says files were discovered but the log can't
 * produce them, planning FAILS instead of silently re-listing (a fresh
 * listing can order files differently and misalign every offset).
 */
private[native] case class NativeFilesOffset(fileCount: Long)
    extends org.apache.spark.sql.connector.read.streaming.Offset {
  override def json(): String = fileCount.toString
}

private[native] class NativeMicroBatchStream(required: StructType, paths: Seq[String],
    conf: SerializableHadoopConf, checkpointLocation: String)
    extends org.apache.spark.sql.connector.read.streaming.MicroBatchStream {
  import org.apache.spark.sql.connector.read.streaming.Offset

  private val logDir = new Path(checkpointLocation, "graft-file-log")
  // discovery-order log: index -> file; loaded once, appended as files appear
  private val discovered = scala.collection.mutable.ArrayBuffer.empty[String]
  private val known = scala.collection.mutable.HashSet.empty[String]
  loadLog()

  /** Load every committed segment, in start-index order. */
  private def loadLog(): Unit = {
    val fs = logDir.getFileSystem(conf.value)
    if (fs.exists(logDir)) {
      val segments = fs.listStatus(logDir).toSeq
        .filter(st => st.isFile && st.getPath.getName.forall(_.isDigit))
        .sortBy(_.getPath.getName.toLong)
      segments.foreach { st =>
        val start = st.getPath.getName.toLong
        if (start != discovered.length)
          throw new IllegalStateException(
            s"clickhouse_native streaming: discovery log corrupt at $logDir — " +
              s"segment ${st.getPath.getName} should start at index ${discovered.length}. " +
              "Offsets cannot be trusted; restore the checkpoint or start a new one.")
        val in = new java.io.BufferedReader(new java.io.InputStreamReader(
          fs.open(st.getPath), java.nio.charset.StandardCharsets.UTF_8))
        try {
          var line = in.readLine()
          while (line != null) {
            if (line.nonEmpty) { known += line; discovered += line }
            line = in.readLine()
          }
        } finally in.close()
      }
    }
  }

  private def refresh(): Unit = {
    val listed = NativeIO.resolveFiles(paths, conf.value).map(_.toString)
    val fresh = listed.filterNot(known.contains)
    if (fresh.nonEmpty) {
      // one new immutable segment per discovery batch, named by the
      // index of its first file; write to a dotted temp (invisible to
      // loadLog) and rename into place, CHECKING the result — a failed
      // rename must fail the batch, not silently drop the mapping
      val fs = logDir.getFileSystem(conf.value)
      fs.mkdirs(logDir)
      val seg = new Path(logDir, discovered.length.toString)
      if (fs.exists(seg))
        throw new IllegalStateException(
          s"clickhouse_native streaming: segment $seg already exists — " +
            "two drivers appear to share this checkpoint")
      val tmp = new Path(logDir, s".${discovered.length}.tmp")
      val out = fs.create(tmp, true)
      try out.write((fresh.mkString("\n") + "\n")
        .getBytes(java.nio.charset.StandardCharsets.UTF_8))
      finally out.close()
      if (!fs.rename(tmp, seg))
        throw new java.io.IOException(
          s"clickhouse_native streaming: failed to commit discovery segment $seg")
      fresh.foreach { f => known += f; discovered += f }
    }
  }

  override def initialOffset(): Offset = NativeFilesOffset(0L)
  override def latestOffset(): Offset = { refresh(); NativeFilesOffset(discovered.length.toLong) }
  override def deserializeOffset(json: String): Offset = NativeFilesOffset(json.trim.toLong)

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val s = start.asInstanceOf[NativeFilesOffset].fileCount.toInt
    val e = end.asInstanceOf[NativeFilesOffset].fileCount.toInt
    if (e > discovered.length)
      // the checkpoint advanced past what the log can reproduce → the
      // log was lost; re-listing could assign different indices, which
      // silently skips or re-reads files. Refuse.
      throw new IllegalStateException(
        s"clickhouse_native streaming: offset $e exceeds the ${discovered.length} " +
          s"file(s) in the discovery log at $logDir — log lost or truncated; " +
          "cannot replay without risking duplicate or skipped files")
    discovered.slice(s, e).map(f => NativeInputPartition(f): InputPartition).toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new NativeReaderFactory(required, -1, conf)

  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()
}

/** Scan produced when count(*) was pushed: one partial count per file. */
private[native] class NativeCountScan(paths: Seq[String], conf: SerializableHadoopConf)
    extends Scan with Batch {
  override def readSchema(): StructType =
    StructType(Seq(StructField("count", LongType, nullable = false)))
  override def toBatch: Batch = this
  override def description(): String = s"clickhouse_native count(*) ${paths.mkString(",")}"

  override def planInputPartitions(): Array[InputPartition] =
    NativeIO.resolveFiles(paths, conf.value).map(p => NativeInputPartition(p.toString): InputPartition).toArray

  override def createReaderFactory(): PartitionReaderFactory =
    new NativeCountReaderFactory(conf)
}

private[native] class NativeCountReaderFactory(conf: SerializableHadoopConf)
    extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] =
    new PartitionReader[InternalRow] {
      private val file = partition.asInstanceOf[NativeInputPartition].file
      private var emitted = false
      private var count = 0L
      override def next(): Boolean = {
        if (emitted) return false
        val path = new Path(file)
        val fs = path.getFileSystem(conf.value)
        // Indexed file: the row count is in the sidecar — a count(*)
        // over an indexed directory never opens a data file at all.
        NativeIndex.read(fs, path, fs.getFileStatus(path).getLen) match {
          case Some(entries) => count = entries.map(_.rows).sum
          case None =>
            val blocks = new NativeBlockReader(
              NativeCompression.maybeWrapRead(fs.open(path), conf.value), Some(Set.empty))
            try while (blocks.hasNext) count += blocks.next().numRows
            finally blocks.close()
        }
        emitted = true
        true
      }
      override def get(): InternalRow = new GenericInternalRow(Array[Any](count))
      override def close(): Unit = ()
    }
}

private[native] class NativeScan(fullSchema: StructType, required: StructType,
    paths: Seq[String], limit: Int, conf: SerializableHadoopConf,
    zoneFilters: Array[Filter] = Array.empty,
    bucket: Option[(String, Int)] = None)
    extends Scan with Batch with SupportsReportStatistics with SupportsRuntimeFiltering
    with SupportsReportPartitioning {
  override def readSchema(): StructType = required
  override def toBatch: Batch = this

  /**
   * Bucketed catalog tables report KeyGroupedPartitioning over
   * `bucket(n, col)` — the hook storage-partitioned joins hang off:
   * two native tables bucketed the same way on their join key plan
   * with ZERO Exchange (enable spark.sql.sources.v2.bucketing.enabled).
   * Guarded on every data file carrying a writer bucket tag, so a
   * table polluted with foreign files degrades to unknown layout, not
   * wrong co-location. At 100 TB this is THE fact-fact join strategy:
   * the shuffle happens once at ingest, never again per query.
   */
  private lazy val bucketLayout: Option[(String, Int, Map[String, Int])] =
    bucket.flatMap { case (col, n) =>
      val sts = try NativeIO.resolveFileStatuses(paths, conf.value)
        catch { case _: Exception => Seq.empty }
      val tags = sts.map(st =>
        st.getPath.toString -> NativeBucket.bucketOfFile(st.getPath.getName))
      // a tag >= n means the files were written under a DIFFERENT bucket
      // count (table recreated?) — claiming key-grouped layout then
      // would co-locate rows that do not share a key: degrade instead.
      // An EMPTY listing (no files yet, or a listing failure swallowed
      // above) must also degrade: `forall` over nothing is vacuously
      // true, and claiming layout off a failed listing would key-group
      // a join against partitions that later plan with unknown buckets.
      if (tags.nonEmpty && tags.forall(t => t._2.isDefined && t._2.get < n))
        Some((col, n, tags.map { case (p, t) => p -> t.get }.toMap))
      else None
    }

  override def outputPartitioning(): org.apache.spark.sql.connector.read.partitioning.Partitioning =
    bucketLayout match {
      case Some((col, n, fileBuckets)) if required.fieldNames.contains(col) =>
        new org.apache.spark.sql.connector.read.partitioning.KeyGroupedPartitioning(
          Array(org.apache.spark.sql.connector.expressions.Expressions.bucket(n, col)),
          fileBuckets.values.toSet.size)
      case _ =>
        new org.apache.spark.sql.connector.read.partitioning.UnknownPartitioning(0)
    }

  /**
   * Runtime (dynamic-partition-pruning-style) filtering: after the
   * broadcast side of a join materializes, Spark hands this scan the
   * join-key values as an `In` filter and re-plans input partitions.
   * The values feed the SAME zone-map machinery as static pushdown, so
   * a fact-table scan joined to a filtered dimension reads only the
   * blocks whose sidecar [min,max] can hold a surviving key — on data
   * laid out by the join key, O(matching blocks) instead of a full
   * scan. Purely advisory: the join re-verifies every row, so a stale
   * sidecar can cost time, never correctness.
   */
  @volatile private var runtimeFilters: Array[Filter] = Array.empty

  // Only columns present in the PRUNED output: Spark resolves these
  // against the scan's readSchema, so a full-schema column that column
  // pruning removed would fail analysis ("Unable to resolve ...").
  override def filterAttributes(): Array[org.apache.spark.sql.connector.expressions.NamedReference] =
    required.fields.collect {
      case f if f.dataType.isInstanceOf[NumericType] || f.dataType == StringType ||
        f.dataType == DateType || f.dataType == TimestampType ||
        f.dataType == TimestampNTZType || f.dataType == BooleanType =>
        org.apache.spark.sql.connector.expressions.Expressions.column(f.name)
    }

  override def filter(filters: Array[Filter]): Unit = {
    runtimeFilters = filters.filter(NativeIndex.prunable)
  }

  private def effectiveFilters: Array[Filter] = zoneFilters ++ runtimeFilters

  /**
   * Size statistics from file lengths (cheap driver-side metadata
   * call) so Catalyst's JoinSelection can broadcast a small native
   * table instead of shuffling both sides — without this every native
   * scan defaults to "unknown size" and joins pessimistically.
   */
  override def estimateStatistics(): Statistics = new Statistics {
    private lazy val resolved =
      try NativeIO.resolveFileStatuses(paths, conf.value)
      catch { case _: Exception => Seq.empty }
    private lazy val totalBytes: OptionalLong =
      if (resolved.isEmpty) OptionalLong.empty()
      else OptionalLong.of(resolved.map(_.getLen).sum)
    // Exact row count from the index sidecars — but only when EVERY
    // file has one (a partial sum would mislead the CBO low).
    private lazy val totalRows: OptionalLong =
      try {
        val counts = resolved.map { st =>
          NativeIndex.read(st.getPath.getFileSystem(conf.value), st.getPath, st.getLen)
            .map(_.map(_.rows).sum)
        }
        if (counts.nonEmpty && counts.forall(_.isDefined))
          OptionalLong.of(counts.flatten.sum)
        else OptionalLong.empty()
      } catch { case _: Exception => OptionalLong.empty() }
    override def sizeInBytes(): OptionalLong = totalBytes
    override def numRows(): OptionalLong = totalRows
  }
  override def description(): String =
    s"clickhouse_native ${paths.mkString(",")} cols=[${required.fieldNames.mkString(",")}]" +
      (if (limit >= 0) s" limit=$limit" else "") +
      (if (zoneFilters.nonEmpty) s" zonemap=[${zoneFilters.mkString(", ")}]" else "")

  /**
   * One partition per file — EXCEPT files our writer indexed
   * ([[NativeIndex]] sidecar), which split into
   * `spark.sql.files.maxPartitionBytes`-sized block ranges, the same
   * way Spark's parquet scan splits on row groups. A 100 GB native
   * file with a sidecar fans out across the cluster instead of
   * serializing on one core; foreign files degrade to whole-file
   * partitions as before.
   *
   * When filters were pushed, each block's sidecar zone maps are
   * tested first and blocks (or entire files) that cannot match plan
   * NO work — on data sorted by the filter column a point/range query
   * reads O(matching blocks). Pruning is advisory: every filter is
   * also a residual Spark re-evaluates per row.
   */
  override def planInputPartitions(): Array[InputPartition] = {
    val target = SparkSession.getActiveSession
      .map(_.sessionState.conf.filesMaxPartitionBytes)
      .getOrElse(128L * 1024 * 1024)
    val pruning = effectiveFilters
    val layoutClaimed = bucketLayout.isDefined
    // When key-grouped layout was claimed, outputPartitioning() already
    // reported numPartitions off the snapshot's bucket-id set — a file
    // whose bucket id is NOT in that set (concurrent ingest under a
    // different layout) would mis-group, so it must fail like an
    // untagged file does, not silently join a phantom group.
    val snapshotBuckets = bucketLayout.map(_._3.values.toSet)
    NativeIO.resolveFileStatuses(paths, conf.value).flatMap { st =>
      val p = st.getPath
      // bucket id parses from THIS listing's file names, not the layout
      // snapshot — a file that appeared between the two listings still
      // gets its true bucket. If layout was claimed but an untagged
      // file materialized since, silence would mis-co-locate: fail.
      val bucketId = NativeBucket.bucketOfFile(p.getName) match {
        case Some(b) if layoutClaimed && !snapshotBuckets.get.contains(b) =>
          throw new IllegalStateException(
            s"clickhouse_native: data file ${p.getName} carries bucket id $b, " +
              "absent from the layout snapshot this plan's partitioning was " +
              "reported from (concurrent ingest?) — cannot key-group safely; " +
              "retry the query")
        case Some(b) => b
        case None if layoutClaimed => throw new IllegalStateException(
          s"clickhouse_native: untagged data file ${p.getName} appeared in a " +
            "bucketed table between layout planning and partition planning — " +
            "cannot key-group safely; retry the query")
        case None => -1
      }
      // small files skip the sidecar RPC unless filters could prune them
      // — EXCEPT under checksum=skip with no explicit compression conf:
      // skip forbids sniffing, so the reader needs the sidecar's
      // writer-declared method (one extra RPC the user opted into)
      val needsDeclaration =
        "skip".equalsIgnoreCase(conf.value.get(NativeCompression.ChecksumConfKey, "verify")) &&
          "auto".equalsIgnoreCase(conf.value.get(NativeCompression.ReadConfKey, "auto"))
      if (st.getLen <= target && pruning.isEmpty && !needsDeclaration)
        Seq(NativeInputPartition(p.toString, bucketId = bucketId))
      else NativeIndex.readWithMeta(p.getFileSystem(conf.value), p, st.getLen) match {
        case Some((entries, meta)) =>
          // writer-declared compression rides the partition so executor
          // readers never sniff files this writer produced
          val declared = meta.get("compression")
          NativeIndex.splitRangesKeeping(entries, st.getLen, target,
            i => NativeIndex.blockMayMatch(entries(i).stats, pruning.toSeq)).map {
            case (offset, nBlocks, _) =>
              NativeInputPartition(p.toString, offset, nBlocks, bucketId, declared)
          }
        case None => Seq(NativeInputPartition(p.toString, bucketId = bucketId))
      }
    }.map(x => x: InputPartition).toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new NativeReaderFactory(required, limit, conf)

  override def toMicroBatchStream(checkpointLocation: String)
      : org.apache.spark.sql.connector.read.streaming.MicroBatchStream =
    new NativeMicroBatchStream(required, paths, conf, checkpointLocation)
}

/**
 * One unit of scan work: a whole file (blockCount = -1), or — when the
 * file has a valid [[NativeIndex]] sidecar — a contiguous block range
 * starting at byte `start`, `blockCount` blocks long. `bucketId` >= 0
 * tags partitions of a bucketed table ([[HasPartitionKey]]) so Spark
 * can key-group them for storage-partitioned joins; -1 = unbucketed
 * (the key is only consulted when the scan reports key-grouped layout).
 */
private[native] case class NativeInputPartition(file: String, start: Long = 0L,
    blockCount: Int = -1, bucketId: Int = -1, compression: Option[String] = None)
    extends InputPartition with HasPartitionKey {
  override def partitionKey(): InternalRow =
    new GenericInternalRow(Array[Any](bucketId))
}

private[native] class NativeReaderFactory(required: StructType, limit: Int,
    conf: SerializableHadoopConf) extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] =
    new NativePartitionReader(partition.asInstanceOf[NativeInputPartition], required, limit, conf.value)

  /**
   * Columnar emit for flat schemas: the wire format is already
   * column-major per block, so handing Spark a ColumnarBatch avoids
   * the per-row boxed GenericInternalRow path and lets whole-stage
   * codegen read vectors directly. Nested arrays and limit pushdown
   * stay on the row path (arrays need child-vector assembly; limits
   * are small by definition).
   */
  override def supportColumnarReads(partition: InputPartition): Boolean =
    limit < 0 && required.nonEmpty && required.fields.forall(f => f.dataType match {
      case _: ArrayType | _: MapType | _: StructType | _: DecimalType => false
      case _ => true
    })

  override def createColumnarReader(partition: InputPartition): PartitionReader[org.apache.spark.sql.vectorized.ColumnarBatch] =
    new NativeColumnarPartitionReader(
      partition.asInstanceOf[NativeInputPartition], required, conf.value)
}

/** Executor-side columnar reader: one Native block → one ColumnarBatch. */
private[native] class NativeColumnarPartitionReader(part: NativeInputPartition,
    required: StructType, conf: Configuration)
    extends PartitionReader[org.apache.spark.sql.vectorized.ColumnarBatch] {

  import org.apache.spark.sql.execution.vectorized.OnHeapColumnVector
  import org.apache.spark.sql.vectorized.ColumnarBatch

  private val path = new Path(part.file)
  private val stream = path.getFileSystem(conf).open(path)
  if (part.start > 0) stream.seek(part.start) // sidecar offsets are frame boundaries
  private val blocks = new NativeBlockReader(
    NativeCompression.maybeWrapRead(stream, conf, part.compression), Some(required.fieldNames.toSet),
    part.blockCount)
  private var batch: ColumnarBatch = _

  override def next(): Boolean = {
    if (batch != null) { batch.close(); batch = null }
    if (!blocks.hasNext) return false
    val block = blocks.next()
    val n = block.numRows
    val byName = block.columns.map(c => c.name -> c).toMap
    val vectors = required.fields.map { f =>
      val v = new OnHeapColumnVector(n, f.dataType)
      byName.get(f.name) match {
        case None => v.putNulls(0, n)
        case Some(col) if col.dict != null && f.dataType == StringType =>
          fillDictionary(v, col, n)
        case Some(col) => fill(v, f.dataType, col.values, n)
      }
      v: org.apache.spark.sql.vectorized.ColumnVector
    }
    batch = new ColumnarBatch(vectors, n)
    true
  }

  /**
   * LowCardinality string column → dictionary-backed vector: one
   * byte-array per DISTINCT value plus a bulk int-id write, instead of
   * copying every row's bytes (the same layout the vectorized parquet
   * reader uses for dictionary-encoded pages). Nulls (id 0 of a
   * Nullable inner) are marked in the null mask; their id still points
   * at the dictionary's default slot, which is never read.
   */
  private def fillDictionary(v: OnHeapColumnVector, col: NativeColumn, n: Int): Unit = {
    val dictBytes = col.dict.map {
      case u: UTF8String => u.getBytes
      case other => String.valueOf(other).getBytes(java.nio.charset.StandardCharsets.UTF_8)
    }
    v.setDictionary(new org.apache.spark.sql.execution.vectorized.Dictionary {
      override def decodeToBinary(id: Int): Array[Byte] = dictBytes(id)
      override def decodeToInt(id: Int): Int = throw new UnsupportedOperationException
      override def decodeToLong(id: Int): Long = throw new UnsupportedOperationException
      override def decodeToFloat(id: Int): Float = throw new UnsupportedOperationException
      override def decodeToDouble(id: Int): Double = throw new UnsupportedOperationException
    })
    val ids = v.reserveDictionaryIds(n)
    ids.putInts(0, n, col.dictIds, 0)
    var i = 0
    while (i < n) {
      if (col.values(i) == null) v.putNull(i)
      i += 1
    }
  }

  private def fill(v: OnHeapColumnVector, dt: DataType, values: Array[Any], n: Int): Unit = {
    var i = 0
    dt match {
      case IntegerType | DateType =>
        while (i < n) {
          val x = values(i)
          if (x == null) v.putNull(i) else v.putInt(i, x.asInstanceOf[java.lang.Integer].intValue())
          i += 1
        }
      case LongType | TimestampType | TimestampNTZType =>
        while (i < n) {
          val x = values(i)
          if (x == null) v.putNull(i) else v.putLong(i, x.asInstanceOf[java.lang.Long].longValue())
          i += 1
        }
      case DoubleType =>
        while (i < n) {
          val x = values(i)
          if (x == null) v.putNull(i) else v.putDouble(i, x.asInstanceOf[java.lang.Double].doubleValue())
          i += 1
        }
      case FloatType =>
        while (i < n) {
          val x = values(i)
          if (x == null) v.putNull(i) else v.putFloat(i, x.asInstanceOf[java.lang.Float].floatValue())
          i += 1
        }
      case BooleanType =>
        while (i < n) {
          val x = values(i)
          if (x == null) v.putNull(i) else v.putBoolean(i, x.asInstanceOf[java.lang.Boolean].booleanValue())
          i += 1
        }
      case StringType =>
        while (i < n) {
          val x = values(i)
          if (x == null) v.putNull(i)
          else {
            val b = x.asInstanceOf[UTF8String].getBytes
            v.putByteArray(i, b, 0, b.length)
          }
          i += 1
        }
      case other =>
        throw new IllegalStateException(s"columnar fill: unexpected type $other")
    }
  }

  override def get(): ColumnarBatch = batch
  override def close(): Unit = {
    if (batch != null) batch.close()
    blocks.close()
  }
}

/**
 * Executor-side streaming reader: one Native file → InternalRows,
 * block at a time (never the whole file — contrast reference
 * src/lib.rs:271-279 which materializes everything, twice).
 */
private[native] class NativePartitionReader(part: NativeInputPartition, required: StructType,
    limit: Int, conf: Configuration) extends PartitionReader[InternalRow] {

  private val path = new Path(part.file)
  private val stream = path.getFileSystem(conf).open(path)
  if (part.start > 0) stream.seek(part.start) // sidecar offsets are frame boundaries
  private val blocks = new NativeBlockReader(
    NativeCompression.maybeWrapRead(stream, conf, part.compression), Some(required.fieldNames.toSet),
    part.blockCount)

  private var colValues: Array[Array[Any]] = _ // per required-field value arrays
  private var rowsInBlock = 0
  private var rowIdx = 0
  private var emitted = 0L
  private val row = new GenericInternalRow(required.length)

  override def next(): Boolean = {
    if (limit >= 0 && emitted >= limit) return false
    while (rowIdx >= rowsInBlock) {
      if (!hasNextBlock) return false
      val block = blocks.next()
      val byName = block.columns.map(c => c.name -> c).toMap
      colValues = required.fields.map { f =>
        byName.get(f.name).map(_.values).orNull // missing column → null fill
      }
      rowsInBlock = block.numRows
      rowIdx = 0
    }
    var i = 0
    while (i < required.length) {
      val col = colValues(i)
      row.update(i, if (col == null) null else col(rowIdx))
      i += 1
    }
    rowIdx += 1
    emitted += 1
    true
  }

  /** Wrap mid-file decode failures with the file path — a truncated or
    * corrupt part should name itself, not surface as a bare EOF. */
  private def hasNextBlock: Boolean =
    try blocks.hasNext
    catch {
      case e: java.io.IOException =>
        throw new java.io.IOException(s"clickhouse_native: corrupt or truncated file ${part.file}: ${e.getMessage}", e)
    }

  override def get(): InternalRow = row
  override def close(): Unit = blocks.close()
}

// ---------------------------------------------------------------------------
// Write path
// ---------------------------------------------------------------------------

private[native] class NativeWriteBuilder(schema: StructType, path: String, maxRowsPerFile: Int,
    dictEncode: Boolean, compression: String = "none",
    bucket: Option[(String, Int)] = None, sortBy: Seq[String] = Seq.empty,
    insertDedup: Boolean = false, dedupToken: String = "",
    typeOverrides: Map[String, String] = Map.empty)
    extends WriteBuilder with SupportsTruncate with SupportsOverwrite {
  private var truncateFirst = false
  override def truncate(): WriteBuilder = { truncateFirst = true; this }
  // Only a FULL overwrite is expressible in this format (no row-level
  // deletes): accept AlwaysTrue / empty, and fail loudly for any real
  // condition — silently truncating rows NOT matching the condition
  // (df.writeTo("graft.db.t").overwrite(cond)) would be data loss.
  override def overwrite(filters: Array[Filter]): WriteBuilder =
    if (filters.forall(_.isInstanceOf[org.apache.spark.sql.sources.AlwaysTrue])) truncate()
    else throw new UnsupportedOperationException(
      "clickhouse_native supports only unconditional overwrite (truncate); " +
        s"conditional overwrite on [${filters.mkString(", ")}] would have to delete " +
        "matching rows in place, which the Native format cannot do. " +
        "Use overwritePartitions/truncate, or rewrite the full table.")

  override def build(): Write = {
    // Validate the schema driver-side at planning, so an unsupported
    // type is one clean error, not a stage failure inside a task.
    schema.fields.foreach(f => ChType.forSpark(f.dataType, f.nullable))
    bucket.foreach { case (col, _) =>
      val f = schema.fields.find(_.name == col).getOrElse(
        throw new IllegalArgumentException(
          s"clickhouse_native bucketed write: bucket column '$col' not in input schema"))
      if (!NativeBucket.supported(f.dataType))
        throw new IllegalArgumentException(
          s"clickhouse_native bucketed write: bucket column type ${f.dataType} unsupported")
    }
    sortBy.foreach { col =>
      if (!schema.fieldNames.contains(col))
        throw new IllegalArgumentException(
          s"clickhouse_native write: sortBy column '$col' not in input schema")
    }
    if (bucket.isEmpty && sortBy.isEmpty)
      new Write {
        override def toBatch: BatchWrite =
          new NativeBatchWrite(schema, path, truncateFirst, maxRowsPerFile, dictEncode,
            compression, bucket, insertDedup, dedupToken, typeOverrides)
        override def toStreaming: org.apache.spark.sql.connector.write.streaming.StreamingWrite = {
          // validated but not implemented for streaming epochs — fail
          // loudly rather than silently appending duplicate batches
          // the user asked to have deduplicated
          if (insertDedup) throw new UnsupportedOperationException(
            "clickhouse_native: insertDedup is not supported for streaming writes " +
              "(exactly-once replay protection comes from the epoch-scoped sink itself)")
          new NativeStreamingWrite(schema, path, maxRowsPerFile, dictEncode, compression, bucket, typeOverrides)
        }
      }
    else
      // Cluster the incoming rows by bucket id BEFORE the writers run:
      // each bucket then lands in exactly ONE write task, so an insert
      // produces N part files total instead of up to tasks × N (at
      // 100 TB ingest, the difference between N and hundreds of
      // thousands of small files). sortBy columns additionally sort
      // rows WITHIN each task, so every block's zone maps cover a
      // disjoint range and range scans prune to O(matching blocks).
      // Advisory, not strict — if the bucket function can't be
      // resolved Spark writes unclustered and the per-row routing
      // still produces correct (more numerous) single-bucket files.
      new Write with RequiresDistributionAndOrdering {
        import org.apache.spark.sql.connector.expressions.{Expressions, SortDirection}
        override def requiredDistribution(): org.apache.spark.sql.connector.distributions.Distribution =
          bucket match {
            case Some((col, n)) =>
              org.apache.spark.sql.connector.distributions.Distributions.clustered(
                Array(Expressions.bucket(n, col)))
            case None =>
              org.apache.spark.sql.connector.distributions.Distributions.unspecified()
          }
        override def distributionStrictlyRequired(): Boolean = false
        override def requiredOrdering(): Array[org.apache.spark.sql.connector.expressions.SortOrder] =
          sortBy.map(c =>
            Expressions.sort(Expressions.column(c), SortDirection.ASCENDING)).toArray
        override def toBatch: BatchWrite =
          new NativeBatchWrite(schema, path, truncateFirst, maxRowsPerFile, dictEncode,
            compression, bucket, insertDedup, dedupToken, typeOverrides)
        override def toStreaming: org.apache.spark.sql.connector.write.streaming.StreamingWrite = {
          // validated but not implemented for streaming epochs — fail
          // loudly rather than silently appending duplicate batches
          // the user asked to have deduplicated
          if (insertDedup) throw new UnsupportedOperationException(
            "clickhouse_native: insertDedup is not supported for streaming writes " +
              "(exactly-once replay protection comes from the epoch-scoped sink itself)")
          new NativeStreamingWrite(schema, path, maxRowsPerFile, dictEncode, compression, bucket, typeOverrides)
        }
      }
  }
}

/**
 * Streaming sink: `df.writeStream.format("clickhouse_native")`. Every
 * micro-batch appends immutable part files named by (epoch, partition,
 * task attempt) — the same at-most-one-committed-attempt contract as
 * the batch writer (commit coordinator + abort cleanup), so a retried
 * epoch/task can't leave duplicate or truncated parts. Readers (and
 * our own micro-batch source) see only whole files, which is what the
 * streaming read's exactly-once file log relies on.
 */
private[native] class NativeStreamingWrite(schema: StructType, path: String,
    maxRowsPerFile: Int, dictEncode: Boolean, compression: String = "none",
    bucket: Option[(String, Int)] = None,
    typeOverrides: Map[String, String] = Map.empty)
    extends org.apache.spark.sql.connector.write.streaming.StreamingWrite {
  import org.apache.spark.sql.connector.write.streaming.StreamingDataWriterFactory

  private val conf = new SerializableHadoopConf(NativeIO.sessionHadoopConf())

  override def createStreamingWriterFactory(info: PhysicalWriteInfo): StreamingDataWriterFactory = {
    val dir = new Path(path)
    val fs = dir.getFileSystem(conf.value)
    fs.mkdirs(dir)
    NativeStreamingWriterFactory(schema, path, maxRowsPerFile, dictEncode, conf, compression,
      bucket, java.util.UUID.randomUUID().toString.substring(0, 8), typeOverrides)
  }

  // Epoch commit is recorded by the streaming engine's own offset/commit
  // log; file visibility is atomic per part (create+close). What CAN
  // linger is an earlier ATTEMPT of this same epoch: a driver that died
  // after task commits but before the engine logged the epoch replays it
  // with a fresh write token, so the first attempt's parts would
  // double-count. Reconcile here — the committing attempt keeps exactly
  // the files its tasks reported and removes any other file carrying
  // this epoch's prefix (plus its sidecar).
  override def commit(epochId: Long, messages: Array[WriterCommitMessage]): Unit = {
    val kept = messages.flatMap {
      case NativeCommitMessage(files) => files.map(f => new Path(f).getName)
      case _ => Seq.empty
    }.toSet
    val epochPrefix = f"epoch-$epochId%08d-"
    val dir = new Path(path)
    val fs = dir.getFileSystem(conf.value)
    if (fs.exists(dir)) {
      fs.listStatus(dir).foreach { st =>
        val n = st.getPath.getName
        val dataName = if (n.startsWith(".") && n.endsWith(".chidx"))
          n.stripPrefix(".").stripSuffix(".chidx") else n
        if (dataName.startsWith(epochPrefix) && !kept.contains(dataName))
          fs.delete(st.getPath, true)
      }
    }
  }
  override def abort(epochId: Long, messages: Array[WriterCommitMessage]): Unit = ()
}

/** Ships to executors — a named case class so only serializable fields travel. */
private[native] case class NativeStreamingWriterFactory(schema: StructType, path: String,
    maxRowsPerFile: Int, dictEncode: Boolean, conf: SerializableHadoopConf,
    compression: String = "none", bucket: Option[(String, Int)] = None,
    writeToken: String = "w0", typeOverrides: Map[String, String] = Map.empty)
    extends org.apache.spark.sql.connector.write.streaming.StreamingDataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long, epochId: Long): DataWriter[InternalRow] = {
    val prefix = f"epoch-$epochId%08d-"
    bucket match {
      case Some((col, n)) =>
        new BucketedNativeDataWriter(schema, path, partitionId, taskId, maxRowsPerFile,
          conf.value, col, n, prefix, dictEncode, compression, writeToken,
          typeOverrides = typeOverrides)
      case None =>
        new NativeDataWriter(schema, path, partitionId, taskId, maxRowsPerFile, conf.value,
          filePrefix = prefix, dictEncode = dictEncode, compression = compression,
          writeToken = writeToken, typeOverrides = typeOverrides)
    }
  }
}

private[native] class NativeBatchWrite(schema: StructType, path: String, truncateFirst: Boolean,
    maxRowsPerFile: Int, dictEncode: Boolean, compression: String = "none",
    bucket: Option[(String, Int)] = None, insertDedup: Boolean = false,
    dedupToken: String = "",
    typeOverrides: Map[String, String] = Map.empty) extends BatchWrite {
  // Unique token embedded in every part name this write produces. Two
  // jobs must never collide on names: partitionId AND taskId both
  // restart from 0 in a fresh session, so the deterministic
  // part-<pid>-<tid>-<seq> scheme could silently CLOBBER an existing
  // part on append (fs.create(overwrite=true)). The token also lets an
  // overwrite distinguish its own output from pre-existing data.
  private val writeToken = java.util.UUID.randomUUID().toString.substring(0, 8)
  private val conf = new SerializableHadoopConf(NativeIO.sessionHadoopConf())

  // Parts visible BEFORE this job's tasks run — the only parts
  // insert-dedup may compare against. Without the snapshot, two
  // concurrent identical inserts could each classify the OTHER's
  // task-committed parts as pre-existing and both delete their own
  // copy (net zero rows); with it, neither job sees the other's parts
  // (both started before either committed) and the duplicates survive
  // — the safe failure direction. Residual exposure: a writer that
  // task-committed parts before this job started and aborts after
  // this job's commit; like ClickHouse's own non-replicated dedup,
  // the feature assumes writes to one table are not racing.
  @volatile private var preexistingSnapshot: Set[String] = Set.empty

  override def createBatchWriterFactory(info: PhysicalWriteInfo): DataWriterFactory = {
    val dir = new Path(path)
    val fs = dir.getFileSystem(conf.value)
    fs.mkdirs(dir)
    if (insertDedup && !truncateFirst)
      preexistingSnapshot = fs.listStatus(dir).iterator.map(_.getPath.getName)
        .filter(n => !n.startsWith("_") && !n.startsWith(".")).toSet
    // NOTE: an overwrite does NOT clear the target here. Deleting
    // before the tasks run destroys the old data while a self-read
    // (INSERT OVERWRITE t SELECT ... FROM t — the natural compaction
    // command) is still scanning it: the job fails AND the table is
    // gone. The old files are removed at commit() instead, so readers
    // of this very write's input stay consistent and an aborted
    // overwrite leaves the previous data fully intact.
    new NativeWriterFactory(schema, path, maxRowsPerFile, dictEncode, conf, compression,
      bucket, writeToken, dedupToken, typeOverrides)
  }

  // Spark's default useCommitCoordinator() (true) guarantees at most one
  // committed attempt per partition; aborted attempts delete their file
  // (NativeDataWriter.abort), so speculative/retried tasks leave no
  // duplicate or truncated parts behind.
  override def commit(messages: Array[WriterCommitMessage]): Unit = {
    if (truncateFirst) {
      // overwrite, second half: every data entry NOT carrying this
      // write's token is pre-existing data — remove it AND its hidden
      // ".<part>.chidx" sidecar (which also lacks the token in its
      // derived name). "_" control files and unrelated dot-files
      // survive, as before.
      val dir = new Path(path)
      val fs = dir.getFileSystem(conf.value)
      if (fs.exists(dir)) {
        val tokenTag = s"-$writeToken-"
        fs.listStatus(dir).foreach { st =>
          val n = st.getPath.getName
          val isStaleData = !n.startsWith("_") && !n.startsWith(".") && !n.contains(tokenTag)
          val isStaleSidecar = n.startsWith(".") && n.endsWith(".chidx") && !n.contains(tokenTag)
          if (isStaleData || isStaleSidecar) fs.delete(st.getPath, true)
        }
      }
    }
    // insert_deduplicate (the ClickHouse replicated-MergeTree INSERT
    // contract, at PART granularity): a committed part whose content
    // equals a PRE-EXISTING part's is a re-inserted block — drop it,
    // the insert is a no-op for that part. Candidate matching comes
    // from the sidecars (every part this writer produces records the
    // FNV-1a-64 of its file bytes), so the pass is driver-side
    // metadata work; but FNV-1a-64 is a 64-bit non-crypto hash, so a
    // hash match alone must NOT delete (a collision between genuinely
    // new data and an old part would silently drop the new data —
    // ClickHouse itself uses 128-bit block IDs here). Equality is
    // therefore hash AND file length AND a byte-compare of the two
    // files — the byte pass runs only on (hash, len) matches, i.e.
    // almost exclusively on true re-inserts, where it is one
    // sequential read of a part it is about to delete anyway.
    // CONTRACT for duplicates WITHIN one write: any part of this
    // write whose content matches a pre-existing part is dropped —
    // including surplus intra-batch copies of that content (the
    // CH-like verdict: the content is already in the table). When NO
    // pre-existing part matches, identical-content parts within the
    // write all survive as data — this pass never compares this
    // write's parts against each other. Never under overwrite: the
    // stale parts above are already gone or doomed, and deduping a
    // new part against a part this commit deletes would lose data.
    if (insertDedup && !truncateFirst) {
      val dir = new Path(path)
      val fs = dir.getFileSystem(conf.value)
      if (fs.exists(dir)) {
        val tokenTag = s"-$writeToken-"
        // header-bounded 3-line sidecar read — the pass stays
        // O(parts) driver work, never O(total blocks). Identity =
        // (contentHash, dedupToken): parts written under different
        // tokens NEVER dedup against each other (distinct epochs/jobs
        // with legitimately identical content both land); absent
        // token = "" preserves the pure-content identity.
        def identityOf(p: Path): Option[(String, String)] = {
          val m = NativeIndex.readMeta(fs, p)
          m.get("contentHash").map(h => (h, m.getOrElse("dedupToken", "")))
        }
        def sameBytes(a: Path, b: Path): Boolean = {
          val ia = new java.io.BufferedInputStream(fs.open(a), 1 << 16)
          try {
            val ib = new java.io.BufferedInputStream(fs.open(b), 1 << 16)
            try {
              var x = 0; var y = 0
              do { x = ia.read(); y = ib.read() } while (x == y && x != -1)
              x == y
            } finally ib.close()
          } finally ia.close()
        }
        val dataParts = fs.listStatus(dir).filter { st =>
          val n = st.getPath.getName
          !n.startsWith("_") && !n.startsWith(".")
        }
        val mine = dataParts.filter(_.getPath.getName.contains(tokenTag))
        // ONLY parts from the start-of-job snapshot count as
        // pre-existing (see preexistingSnapshot); a part without a
        // hash (foreign writer / old sidecar) simply can't match —
        // dedup degrades to append. One representative per hash: if
        // two OLD parts ever collided on a hash, a new part is only
        // compared against one of them — a miss degrades to append,
        // never to data loss.
        val existing = dataParts.iterator
          .filter(st => preexistingSnapshot.contains(st.getPath.getName))
          .flatMap(st => identityOf(st.getPath).map(_ -> st)).toMap
        if (existing.nonEmpty) mine.foreach { st =>
          val prior = identityOf(st.getPath).flatMap(existing.get)
          val isDup = prior.exists(p => p.getLen == st.getLen &&
            sameBytes(st.getPath, p.getPath))
          if (isDup) {
            fs.delete(st.getPath, false)
            val idx = NativeIndex.sidecarPath(st.getPath)
            if (fs.exists(idx)) fs.delete(idx, false)
          }
        }
      }
    }
  }

  // JOB abort: tasks that already committed are not rolled back by the
  // task-level abort path, so their token-tagged parts would linger —
  // as partial data after a failed append, or as DUPLICATES after a
  // failed overwrite (the old files were deliberately kept). Remove
  // everything carrying this write's token; old data is untouched.
  override def abort(messages: Array[WriterCommitMessage]): Unit = {
    val dir = new Path(path)
    val fs = dir.getFileSystem(conf.value)
    if (fs.exists(dir)) {
      val tokenTag = s"-$writeToken-"
      fs.listStatus(dir).foreach { st =>
        if (st.getPath.getName.contains(tokenTag)) fs.delete(st.getPath, true)
      }
    }
  }
}

private[native] class NativeWriterFactory(schema: StructType, path: String,
    maxRowsPerFile: Int, dictEncode: Boolean, conf: SerializableHadoopConf,
    compression: String = "none", bucket: Option[(String, Int)] = None,
    writeToken: String = "w0", dedupToken: String = "",
    typeOverrides: Map[String, String] = Map.empty)
    extends DataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long): DataWriter[InternalRow] =
    bucket match {
      case Some((col, n)) =>
        new BucketedNativeDataWriter(schema, path, partitionId, taskId, maxRowsPerFile,
          conf.value, col, n, "", dictEncode, compression, writeToken, dedupToken,
          typeOverrides)
      case None =>
        new NativeDataWriter(schema, path, partitionId, taskId, maxRowsPerFile, conf.value,
          dictEncode = dictEncode, compression = compression, writeToken = writeToken,
          dedupToken = dedupToken, typeOverrides = typeOverrides)
    }
}

/**
 * Bucketed task writer: routes every row to a per-bucket [[NativeDataWriter]]
 * by the shared [[NativeBucket]] hash, so each part file holds exactly one
 * bucket (the name carries the id — `b00003-part-...`). Input rows may
 * arrive in any distribution; a task simply keeps one open writer per
 * bucket it actually sees. Commit/abort fan out to every child so the
 * at-most-one-committed-attempt contract is unchanged.
 */
private[native] class BucketedNativeDataWriter(schema: StructType, dir: String,
    partitionId: Int, taskId: Long, rowsPerFile: Int, conf: Configuration,
    bucketCol: String, numBuckets: Int, filePrefix: String,
    dictEncode: Boolean, compression: String, writeToken: String = "w0",
    dedupToken: String = "", typeOverrides: Map[String, String] = Map.empty)
    extends DataWriter[InternalRow] {
  private val keyIdx = schema.fieldIndex(bucketCol)
  private val keyType = schema.fields(keyIdx).dataType
  private val writers = new Array[NativeDataWriter](numBuckets)

  private def writerFor(b: Int): NativeDataWriter = {
    var w = writers(b)
    if (w == null) {
      w = new NativeDataWriter(schema, dir, partitionId, taskId, rowsPerFile, conf,
        filePrefix + NativeBucket.filePrefix(b), dictEncode, compression, writeToken,
        dedupToken, typeOverrides)
      writers(b) = w
    }
    w
  }

  override def write(record: InternalRow): Unit =
    writerFor(NativeBucket.of(record, keyIdx, keyType, numBuckets)).write(record)

  override def commit(): WriterCommitMessage = {
    val files = writers.iterator.filter(_ != null).flatMap { w =>
      w.commit().asInstanceOf[NativeCommitMessage].files
    }.toSeq
    NativeCommitMessage(files)
  }

  override def abort(): Unit = writers.iterator.filter(_ != null).foreach(_.abort())
  override def close(): Unit = writers.iterator.filter(_ != null).foreach(_.close())
}

/**
 * Task-side writer: buffers rows and emits 64k-row Native blocks.
 * (The reference has no write path at all; fixtures required a real
 * ClickHouse — README.md:43-47.)
 */
private[native] class NativeDataWriter(schema: StructType, dir: String,
    partitionId: Int, taskId: Long, rowsPerFile: Int, conf: Configuration,
    filePrefix: String = "", dictEncode: Boolean = true, compression: String = "none",
    writeToken: String = "w0", dedupToken: String = "",
    typeOverrides: Map[String, String] = Map.empty)
    extends DataWriter[InternalRow] {

  private val rowsPerBlock = 65536
  // The format has no intra-file split points, so one giant part file
  // would serialize any later scan. Rotating parts (rowsPerFile =
  // write option maxRowsPerFile) keeps the writer's own output
  // parallelizable (scan side = one partition per file).
  private val chTypes: Array[ChType] =
    schema.fields.map { f =>
      typeOverrides.get(f.name) match {
        case Some(tn) =>
          // validated at plan time (newWriteBuilder): parseable,
          // writable, sparkType matches the column
          val base = ChType.parse(tn)
          if (f.nullable) ChType.ChNullable(base) else base
        case None => ChType.forSpark(f.dataType, f.nullable)
      }
    }
  // Adaptive dictionary encoding: decided ONCE per writer from the
  // first buffered block, so every block this task writes declares the
  // same column types (a reader infers schema from one header). A
  // string column whose first 64+ rows repeat values at >= 2x becomes
  // LowCardinality(T) — dictionary + narrow indices on the wire, which
  // is both smaller and lets the scan reuse one UTF8String per
  // distinct value (the parquet-dictionary advantage BENCH_NOTES
  // measured this format lacking).
  private var effectiveTypes: Array[ChType] = chTypes
  private var typesDecided = !dictEncode

  private def decideDictTypes(): Unit = {
    effectiveTypes = chTypes.zipWithIndex.map { case (t, i) =>
      val lcEligible = t match {
        case ChType.ChString | ChType.ChNullable(ChType.ChString) => true
        case _ => false
      }
      if (!lcEligible || buffered < 64) t
      else {
        val limit = math.min(65536, buffered / 2)
        val seen = new java.util.HashSet[Any]()
        var j = 0
        var distinct = 0
        while (j < buffered && distinct <= limit) {
          val v = buffer(i)(j)
          if (v != null && seen.add(v)) distinct += 1
          j += 1
        }
        if (distinct <= limit) ChType.ChLowCardinality(t) else t
      }
    }
    typesDecided = true
  }
  private val written = scala.collection.mutable.ArrayBuffer.empty[Path]
  private var fileSeq = -1
  private var rowsInFile = 0
  // Lazily opened on the first flush: an empty input partition must
  // commit NO file (a zero-byte part would poison schema inference for
  // the whole directory).
  private var writer: NativeBlockWriter = _
  private var currentFile: Path = _
  // block offsets of the current file, for the NativeIndex sidecar
  // that makes our own output intra-file splittable on read
  private val blockIndex = scala.collection.mutable.ArrayBuffer.empty[NativeIndex.BlockEntry]
  private val buffer = Array.fill(schema.length)(new scala.collection.mutable.ArrayBuffer[Any](rowsPerBlock))
  private var buffered = 0

  /**
   * Zone maps for the block about to flush: min/max per numeric/date/
   * timestamp column (nulls ignored; a NaN or infinite double voids
   * that column's stat — BigDecimal pruning can't represent them).
   * One compare per value, noise next to varint encoding.
   */
  private def blockStats(): Map[String, NativeIndex.ColStat] = {
    val out = Map.newBuilder[String, NativeIndex.ColStat]
    var i = 0
    while (i < schema.length) {
      val vals = buffer(i)
      def longStats(get: Any => Long): Unit = {
        var mn = Long.MaxValue; var mx = Long.MinValue; var seen = false
        var j = 0
        while (j < vals.length) {
          val v = vals(j)
          if (v != null) {
            val x = get(v)
            if (x < mn) mn = x
            if (x > mx) mx = x
            seen = true
          }
          j += 1
        }
        if (seen) out += schema.fields(i).name -> NativeIndex.ColStat('l', mn.toString, mx.toString)
      }
      schema.fields(i).dataType match {
        case IntegerType | DateType => longStats(_.asInstanceOf[Int].toLong)
        case LongType | TimestampType | TimestampNTZType => longStats(_.asInstanceOf[Long])
        case DoubleType | FloatType =>
          var mn = Double.PositiveInfinity; var mx = Double.NegativeInfinity
          var seen = false; var clean = true
          var j = 0
          while (clean && j < vals.length) {
            val v = vals(j)
            if (v != null) {
              val x = v match {
                case d: java.lang.Double => d.doubleValue()
                case f: java.lang.Float => f.doubleValue()
              }
              if (java.lang.Double.isNaN(x) || java.lang.Double.isInfinite(x)) clean = false
              else {
                if (x < mn) mn = x
                if (x > mx) mx = x
                seen = true
              }
            }
            j += 1
          }
          if (seen && clean)
            out += schema.fields(i).name -> NativeIndex.ColStat('d', mn.toString, mx.toString)
        case StringType =>
          // byte-wise UTF-8 min/max (UTF8String.compareTo — the order
          // Spark compares strings in). A value containing NUL or
          // U+FFFD is sanitize-stripped at decode time, which can
          // reorder it → that block gets no string stat. min stores a
          // <=48-byte prefix (a prefix is a valid lower bound in
          // byte-lex order); an over-long max becomes the Open
          // sentinel (prefixes are NOT valid upper bounds).
          var mn: UTF8String = null
          var mx: UTF8String = null
          var clean = true
          var j = 0
          while (clean && j < vals.length) {
            val v = vals(j)
            if (v != null) {
              val u = v.asInstanceOf[UTF8String]
              val s = u.toString
              if (s.indexOf('\u0000') >= 0 || s.indexOf('\uFFFD') >= 0) clean = false
              else {
                if (mn == null || u.compareTo(mn) < 0) mn = u
                if (mx == null || u.compareTo(mx) > 0) mx = u
              }
            }
            j += 1
          }
          if (clean && mn != null) {
            val minEnc = NativeIndex.enc(NativeIndex.utf8Prefix(mn.toString, 48))
            val maxEnc =
              if (mx.numBytes <= 48) NativeIndex.enc(mx.toString) else NativeIndex.Open
            out += schema.fields(i).name -> NativeIndex.ColStat('s', minEnc, maxEnc)
          }
        case _ => ()
      }
      i += 1
    }
    out.result()
  }

  /** Close the open part and commit its sidecar (offsets + final length). */
  private def closeCurrentFile(): Unit = {
    if (writer != null) {
      val len = writer.position // flushes; equals final file length
      writer.close()
      writer = null
      NativeIndex.write(currentFile.getFileSystem(conf), currentFile, blockIndex.toSeq, len,
        // authoritative compression declaration: readers of files this
        // writer produced never have to sniff frame headers; the
        // content hash (+ optional dedup-scope token) is the part's
        // identity for insert-dedup
        meta = Map("compression" -> compression, "contentHash" -> hasher.hashHex) ++
          (if (dedupToken.nonEmpty) Map("dedupToken" -> dedupToken) else Map.empty))
      hasher = null
    }
    blockIndex.clear()
  }

  private var hasher: HashingOutputStream = _

  private def rotate(): Unit = {
    closeCurrentFile()
    fileSeq += 1
    rowsInFile = 0
    val p = new Path(
      f"$dir/${filePrefix}part-$partitionId%05d-$taskId-$writeToken-$fileSeq%03d.clickhouse")
    written += p
    currentFile = p
    hasher = new HashingOutputStream(p.getFileSystem(conf).create(p, true))
    writer = new NativeBlockWriter(hasher, compression)
  }

  override def write(record: InternalRow): Unit = {
    var i = 0
    while (i < schema.length) {
      // Spark reuses the InternalRow (and the UTF8String/ArrayData/
      // MapData backing buffers) across rows — buffering a reference
      // without copying aliases later rows' bytes and corrupts the file.
      val v =
        if (record.isNullAt(i)) null
        else record.get(i, schema.fields(i).dataType) match {
          case s: UTF8String => s.clone()
          case a: ArrayData  => a.copy()
          case m: org.apache.spark.sql.catalyst.util.MapData => m.copy()
          case r: InternalRow => r.copy()
          case other         => other
        }
      buffer(i) += v
      i += 1
    }
    buffered += 1
    // blocks never straddle the file cap: flush at least every
    // min(block, file) rows so rotation boundaries stay exact
    if (buffered >= math.min(rowsPerBlock, rowsPerFile)) flush()
  }

  private def flush(): Unit = {
    if (buffered > 0) {
      if (!typesDecided) decideDictTypes()
      // lazy open + lazy rotation (before the next block, not after
      // the last one): no empty part on commit, ever. Rotate when this
      // block would push the file PAST the cap — checking only
      // rowsInFile >= cap lets files overshoot by up to a block when
      // the cap isn't a multiple of the block size.
      if (writer == null || (rowsInFile > 0 && rowsInFile + buffered > rowsPerFile)) rotate()
      val cols = schema.fields.indices.map { i =>
        NativeColumn(schema.fields(i).name, effectiveTypes(i), buffer(i).toArray)
      }.toArray
      blockIndex += NativeIndex.BlockEntry(writer.position, buffered.toLong, blockStats())
      writer.writeBlock(NativeBlock(cols, buffered))
      rowsInFile += buffered
      buffer.foreach(_.clear())
      buffered = 0
    }
  }

  override def commit(): WriterCommitMessage = {
    flush()
    closeCurrentFile()
    NativeCommitMessage(written.map(_.toString).toSeq)
  }

  override def abort(): Unit = {
    // Failed/speculative attempt: remove ALL part files this attempt
    // produced (and their index sidecars) so a retry (different taskId
    // → different names) can't leave truncated or duplicate data behind.
    if (writer != null) writer.close()
    written.foreach { p =>
      val fs = p.getFileSystem(conf)
      if (fs.exists(p)) fs.delete(p, false)
      val idx = NativeIndex.sidecarPath(p)
      if (fs.exists(idx)) fs.delete(idx, false)
    }
  }
  override def close(): Unit = ()
}

private[native] case class NativeCommitMessage(files: Seq[String]) extends WriterCommitMessage

/** FNV-1a-64 over every byte written — the part content hash the
  * sidecar records for insert-dedup (and any external integrity use).
  * One multiply-xor per byte, noise next to varint encoding; the
  * seed/fold are [[graft.functions.TextHash]]'s single definition. */
private[native] final class HashingOutputStream(out: java.io.OutputStream)
    extends java.io.OutputStream {
  import graft.functions.TextHash
  private var h = TextHash.Fnv1a64Seed
  override def write(b: Int): Unit = {
    h = TextHash.fnv1a64Fold(h, b.toByte)
    out.write(b)
  }
  override def write(b: Array[Byte], off: Int, len: Int): Unit = {
    var i = off
    val end = off + len
    while (i < end) { h = TextHash.fnv1a64Fold(h, b(i)); i += 1 }
    out.write(b, off, len)
  }
  override def flush(): Unit = out.flush()
  override def close(): Unit = out.close()
  def hashHex: String = java.lang.Long.toHexString(h)
}
