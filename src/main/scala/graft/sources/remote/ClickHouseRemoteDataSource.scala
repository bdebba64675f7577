package graft.sources.remote

import java.io.InputStream
import java.util

import scala.jdk.CollectionConverters._

import graft.sources.native.{ChType, NativeBlockReader, NativeIO, SerializableHadoopConf}

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/**
 * `clickhouse_remote` — the Spark re-expression of the reference's
 * `clickhouse_scan(query [, url, user, password])` table function
 * (reference src/clickhouse_scan.rs:47-260): ship a SQL string to a
 * ClickHouse server, stream the Native-block result back as a table.
 *
 *   spark.read.format("clickhouse_remote")
 *     .option("query", "SELECT ...")
 *     .option("url", "tcp://host:9000")       // or CLICKHOUSE_URL env
 *     .load()
 *
 * Pushdown is total by construction, exactly like the reference: the
 * query string executes verbatim on the server
 * (src/clickhouse_scan.rs:78,131); Spark-side operators apply on top.
 *
 * Transport is pluggable ([[NativeQueryTransport]]):
 *  - `transport=file` — a recorded-response double: reads the Native
 *    byte stream a server would have sent from `responsePath`. This is
 *    what the offline harness exercises (there is no server in CI —
 *    the reference's own remote test is commented out for the same
 *    reason, test/sql/chsql_native.test:22-27).
 *  - `transport=tcp` — DESCOPED: documented in docs/REMOTE_SCAN.md.
 *    The ClickHouse native TCP protocol (hello handshake, protocol
 *    revision negotiation, compressed frames) needs a live server to
 *    validate against, and this environment has zero egress. The seam
 *    is this one trait; the scan/schema/streaming machinery on top is
 *    the same code the file transport runs end-to-end.
 *
 * Unlike the reference — which runs the remote query TWICE (bind and
 * init, src/clickhouse_scan.rs:78,126-131) and stringifies every cell
 * into Vec<Vec<String>> then re-parses ints with a silent `0` fallback
 * (:218-227) — schema inference here reads only the first block
 * header, and values decode binary → Catalyst exactly once.
 */
class ClickHouseRemoteDataSource extends TableProvider with DataSourceRegister {
  override def shortName(): String = "clickhouse_remote"
  override def supportsExternalMetadata(): Boolean = true

  override def inferSchema(options: CaseInsensitiveStringMap): StructType = {
    val spec = TransportSpec.fromOptions(options)
    // recorded server responses may be compressed-frame wrapped (the
    // live protocol compresses by default) — sniff and decompress
    val stream = graft.sources.native.NativeCompression.maybeWrapRead(spec.open(), null)
    try {
      StructType(NativeBlockReader.readHeader(stream).map { case (name, t) =>
        StructField(name, t.sparkType, nullable = ChType.isNullable(t))
      })
    } finally stream.close()
  }

  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new RemoteTable(schema, TransportSpec.fromOptions(new CaseInsensitiveStringMap(properties)))
}

/**
 * Serializable description of how to reach the "server" — shipped to
 * executors, which open their own stream (the analogue of the
 * reference's executor-side second fetch, made streaming).
 */
final case class TransportSpec(
    transport: String,
    query: String,
    url: String,
    responsePath: String,
    conf: SerializableHadoopConf,
    timeoutMs: Int = 30000) extends Serializable {

  def open(): InputStream = transport match {
    case "file" =>
      require(responsePath.nonEmpty,
        "clickhouse_remote with transport=file requires option responsePath")
      val p = new Path(responsePath)
      p.getFileSystem(conf.value).open(p)
    case "socket" =>
      // Handshake-less streaming over a real TCP connection: send the
      // query (UTF-8, LEB128 length prefix — the Native string wire
      // encoding), stream the server's Native-block response until it
      // closes. Every opener (driver schema probe, each executor
      // partition) dials its own connection — the connection-per-
      // partition shape a full client needs, minus the protocol
      // negotiation the `tcp` case documents as descoped.
      val hp = url.stripPrefix("tcp://").stripPrefix("socket://")
      val (host, port) = hp.lastIndexOf(':') match {
        case -1 => throw new IllegalArgumentException(
          s"clickhouse_remote transport=socket: url must be host:port, got '$url'")
        case i => (hp.substring(0, i), hp.substring(i + 1).toInt)
      }
      // bounded connect/read waits: a black-holed connection must fail
      // the task, not hang it forever; close the socket on ANY failure
      // before the wrapping stream takes ownership
      val sock = new java.net.Socket()
      try {
        sock.setTcpNoDelay(true)
        sock.setSoTimeout(timeoutMs)
        sock.connect(new java.net.InetSocketAddress(host, port), timeoutMs)
        val out = sock.getOutputStream
        new graft.sources.native.NativeCodec.Output(out).writeString(query)
        out.flush()
        sock.shutdownOutput() // half-close: response streams until server EOF
        new java.io.FilterInputStream(
            new java.io.BufferedInputStream(sock.getInputStream, 1 << 16)) {
          override def close(): Unit = { super.close(); sock.close() }
        }
      } catch { case e: Throwable => sock.close(); throw e }
    case "tcp" =>
      throw new UnsupportedOperationException(
        "clickhouse_remote: the full native TCP protocol (hello/revision " +
          "handshake, server progress packets) is descoped in this offline " +
          "build (no server reachable) — see docs/REMOTE_SCAN.md. Use " +
          "transport=socket (handshake-less byte streaming to host:port) " +
          "or transport=file with a recorded Native response.")
    case other =>
      throw new IllegalArgumentException(s"clickhouse_remote: unknown transport '$other'")
  }
}

object TransportSpec {
  def fromOptions(options: CaseInsensitiveStringMap): TransportSpec = TransportSpec(
    transport = Option(options.get("transport")).getOrElse("tcp"),
    query = Option(options.get("query")).getOrElse(
      throw new IllegalArgumentException("clickhouse_remote requires option 'query'")),
    // env fallbacks mirror the reference (src/clickhouse_scan.rs:59-71)
    url = Option(options.get("url"))
      .orElse(sys.env.get("CLICKHOUSE_URL")).getOrElse("tcp://localhost:9000"),
    responsePath = Option(options.get("responsePath")).getOrElse(""),
    conf = new SerializableHadoopConf(NativeIO.sessionHadoopConf()),
    timeoutMs = Option(options.get("timeoutMs")).map(_.toInt).getOrElse(30000))
}

private[remote] class RemoteTable(tableSchema: StructType, spec: TransportSpec)
    extends Table with SupportsRead {
  override def name(): String = s"clickhouse_remote(${spec.query.take(80)})"
  override def schema(): StructType = tableSchema
  override def capabilities(): util.Set[TableCapability] =
    Set(TableCapability.BATCH_READ).asJava

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new ScanBuilder with SupportsPushDownRequiredColumns {
      private var required: StructType = tableSchema
      override def pruneColumns(requiredSchema: StructType): Unit = required = requiredSchema
      override def build(): Scan = new RemoteScan(required, spec)
    }
}

private[remote] class RemoteScan(required: StructType, spec: TransportSpec)
    extends Scan with Batch {
  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def description(): String = s"clickhouse_remote query=[${spec.query.take(80)}]"

  // One remote result = one stream = one partition (same shape as the
  // reference's single init-state scan, src/clickhouse_scan.rs:122-188).
  override def planInputPartitions(): Array[InputPartition] =
    Array(RemotePartition(spec))

  override def createReaderFactory(): PartitionReaderFactory =
    new RemoteReaderFactory(required)
}

private[remote] class RemoteReaderFactory(required: StructType)
    extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] =
    new RemotePartitionReader(partition.asInstanceOf[RemotePartition].spec, required)
}

private[remote] case class RemotePartition(spec: TransportSpec) extends InputPartition

/** Executor-side: open the transport, stream blocks → InternalRows. */
private[remote] class RemotePartitionReader(spec: TransportSpec, required: StructType)
    extends PartitionReader[InternalRow] {

  private val blocks = new NativeBlockReader(
    graft.sources.native.NativeCompression.maybeWrapRead(spec.open(), null),
    Some(required.fieldNames.toSet))
  private var colValues: Array[Array[Any]] = _
  private var rowsInBlock = 0
  private var rowIdx = 0
  private val row = new GenericInternalRow(required.length)

  override def next(): Boolean = {
    while (rowIdx >= rowsInBlock) {
      if (!blocks.hasNext) return false
      val block = blocks.next()
      val byName = block.columns.map(c => c.name -> c).toMap
      colValues = required.fields.map(f => byName.get(f.name).map(_.values).orNull)
      rowsInBlock = block.numRows
      rowIdx = 0
    }
    var i = 0
    while (i < required.length) {
      val c = colValues(i)
      row.update(i, if (c == null) null else c(rowIdx))
      i += 1
    }
    rowIdx += 1
    true
  }

  override def get(): InternalRow = row
  override def close(): Unit = blocks.close()
}
