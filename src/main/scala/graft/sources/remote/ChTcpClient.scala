package graft.sources.remote

import java.io.{BufferedInputStream, BufferedOutputStream, IOException}
import java.net.{InetSocketAddress, Socket}

import graft.sources.native.NativeBlock
import graft.sources.native.NativeCodec.{Input, Output}

import ChTcpProtocol._

/**
 * One native-TCP connection to a ClickHouse server: dials, performs
 * the hello/revision handshake eagerly (so a bad address or refused
 * credential fails at connect, not at first read), then runs one
 * query as a [[RemoteBlockSource]].
 *
 * Connection-per-caller, exactly like the transport seam's other
 * implementations: the driver schema probe and every executor
 * partition dial their own socket — the shape a distributed scan
 * needs (there is no shared driver-side connection an executor could
 * reach). Reads and connects are timeout-bounded: a black-holed
 * server fails the task instead of hanging it.
 */
final class ChTcpClient private (sock: Socket, in: Input, out: Output,
    val hello: ServerHello) extends AutoCloseable {

  /**
   * Send one query; the returned source streams the server's Data
   * blocks (including the rowless schema header block), consuming
   * Progress / ProfileInfo / Log / Totals / Extremes packets in
   * passing, until EndOfStream. Exception packets raise with the
   * server's code and message. Owns the connection: closing the
   * source closes the socket (the protocol has no reset-for-reuse
   * short of Cancel + drain, and a scan partition is one query).
   */
  def execute(query: String, projection: Option[Set[String]]): RemoteBlockSource = {
    val negotiated = hello.negotiated
    writeQuery(out, query, negotiated)
    out.flush()
    new RemoteBlockSource {
      private var done = false
      override def nextBlock(): Option[NativeBlock] = {
        if (done) return None
        while (true) {
          in.readVarUInt() match {
            case ServerPacket.Data =>
              return Some(readBlock(in, negotiated, projection))
            case ServerPacket.Progress => readProgress(in, negotiated)
            case ServerPacket.ProfileInfo => readProfileInfo(in)
            case ServerPacket.Totals | ServerPacket.Extremes | ServerPacket.Log =>
              readBlock(in, negotiated, Some(Set.empty)) // consume, skip-decode
            case ServerPacket.Exception => throw readException(in)
            case ServerPacket.EndOfStream =>
              done = true
              return None
            case other => throw new IOException(
              s"clickhouse tcp: unexpected server packet $other mid-query")
          }
        }
        None // unreachable
      }
      override def close(): Unit = ChTcpClient.this.close()
    }
  }

  override def close(): Unit = sock.close()
}

object ChTcpClient {
  def connect(host: String, port: Int, user: String, password: String,
      database: String, timeoutMs: Int): ChTcpClient = {
    val sock = new Socket()
    try {
      sock.setTcpNoDelay(true)
      sock.setSoTimeout(timeoutMs)
      sock.connect(new InetSocketAddress(host, port), timeoutMs)
      val out = new Output(new BufferedOutputStream(sock.getOutputStream, 1 << 14))
      val in = new Input(new BufferedInputStream(sock.getInputStream, 1 << 16))
      writeClientHello(out, database, user, password)
      out.flush()
      val hello = readServerHello(in)
      new ChTcpClient(sock, in, out, hello)
    } catch { case e: Throwable => sock.close(); throw e }
  }
}
