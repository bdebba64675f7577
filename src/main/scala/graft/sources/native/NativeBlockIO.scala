package graft.sources.native

import java.io.{BufferedInputStream, BufferedOutputStream, InputStream, OutputStream}

import graft.sources.native.NativeCodec.{Input, Output}

/**
 * Streaming block reader for the ClickHouse Native file format
 * (SURVEY §1.1):
 *
 * block := n_columns:VarUInt, n_rows:VarUInt,
 *          per column: name:String, type:String, values[n_rows]
 *
 * A file is a sequence of blocks; a zero-row block or clean EOF
 * terminates (reference src/lib.rs:213-235, terminator at :222).
 *
 * Unlike the reference — which parses the FIRST block with correct
 * per-column (name,type,data) interleaving (src/lib.rs:201-211) but
 * subsequent blocks with all headers first then all data
 * (src/lib.rs:226-234), misparsing any multi-column multi-block file —
 * every block here uses the correct interleaving. And unlike the
 * reference's eager whole-file materialization at both bind AND init
 * (src/lib.rs:251, :271-274), this is a pull-based iterator: one block
 * in memory at a time, which is what lets a 100 TB scan stream.
 *
 * @param projection column names to materialize (None = all). Pruned
 *                   columns are skip-decoded (ColumnCodec.skip) — the
 *                   format is column-contiguous within a block, so
 *                   fixed-width columns cost a single seek.
 * @param blockLimit stop after this many blocks (-1 = until EOF) —
 *                   how an intra-file split partition ([[NativeIndex]])
 *                   reads exactly its block range after seeking.
 */
final class NativeBlockReader(stream: InputStream, projection: Option[Set[String]] = None,
    blockLimit: Int = -1)
    extends Iterator[NativeBlock] with AutoCloseable {

  private val in = new Input(if (stream.isInstanceOf[BufferedInputStream]) stream
    else new BufferedInputStream(stream, 64 * 1024))
  private var nextBlock: NativeBlock = _
  private var blocksRead = 0
  private var finished = false

  override def hasNext: Boolean = {
    if (finished) return false
    if (nextBlock != null) return true
    if (blockLimit >= 0 && blocksRead >= blockLimit) { finished = true; close(); return false }
    readBlock() match {
      case Some(b) => nextBlock = b; true
      case None => finished = true; close(); false
    }
  }

  override def next(): NativeBlock = {
    if (!hasNext) throw new NoSuchElementException
    val b = nextBlock
    nextBlock = null
    b
  }

  private def readBlock(): Option[NativeBlock] = {
    val nCols = in.tryReadVarUInt() match {
      case None => return None // clean EOF between blocks
      case Some(n) => n.toInt
    }
    val nRows = in.readVarUInt().toInt
    if (nCols == 0 || nRows == 0) return None // zero-row terminator (src/lib.rs:222)
    val cols = Array.newBuilder[NativeColumn]
    var c = 0
    while (c < nCols) {
      val name = in.readString()
      val chType = ChType.parse(in.readString())
      if (projection.forall(_.contains(name))) {
        cols += ColumnCodec.decodeColumn(in, name, chType, nRows)
      } else {
        ColumnCodec.skip(in, chType, nRows)
      }
      c += 1
    }
    blocksRead += 1
    Some(NativeBlock(cols.result(), nRows))
  }

  override def close(): Unit = stream.close()
}

object NativeBlockReader {
  /**
   * Read just the first block's per-column (name, type) headers —
   * bind-time schema inference without materializing data
   * (vs the reference's full-file parse at bind, src/lib.rs:246-266).
   */
  def readHeader(stream: InputStream): Seq[(String, ChType)] = {
    val in = new Input(new BufferedInputStream(stream, 8 * 1024))
    in.tryReadVarUInt() match {
      case None => Seq.empty
      case Some(nColsL) =>
        val nCols = nColsL.toInt
        val nRows = in.readVarUInt().toInt
        val out = Seq.newBuilder[(String, ChType)]
        var c = 0
        while (c < nCols) {
          val name = in.readString()
          val t = ChType.parse(in.readString())
          out += (name -> t)
          if (c < nCols - 1) {
            try ColumnCodec.skip(in, t, nRows)
            catch {
              case e: UnsupportedColumnException =>
                // A non-final column of unknowable byte width makes the
                // remaining headers unreachable — fail with the column
                // named instead of a bare type error (the reference
                // instead silently misparses, src/lib.rs:168-170).
                throw new java.io.IOException(
                  s"schema inference: cannot skip column '$name' of " +
                    s"unsupported type ${e.typeName}; remaining columns unreadable", e)
            }
          }
          c += 1
        }
        out.result()
    }
  }
}

/**
 * Streaming block writer — the inverse, for fixtures and the sink path.
 *
 * With `compression` = lz4|zstd the native byte stream is wrapped in
 * ClickHouse compressed frames ([[NativeCompression]]); [[position]]
 * additionally ends the current frame, so every offset handed to the
 * [[NativeIndex]] sidecar is a frame boundary — a valid seek target on
 * the compressed file.
 */
final class NativeBlockWriter(stream: OutputStream, compression: String = "none")
    extends AutoCloseable {
  private val counting = new CountingOutputStream(stream)
  private val frames: FrameOutputStream = compression.toLowerCase match {
    case "none" | "" => null
    case c => new FrameOutputStream(counting, NativeCompression.methodFor(c))
  }
  private val out = new Output(new BufferedOutputStream(
    if (frames == null) counting else frames, 64 * 1024))

  /**
   * Byte offset the NEXT write lands at (flushes the buffer — call
   * once per block, not per value). Lets the data writer record block
   * offsets for the [[NativeIndex]] sidecar.
   */
  def position: Long = {
    out.flush()
    if (frames != null) frames.endFrame()
    counting.count
  }

  def writeBlock(block: NativeBlock): Unit = {
    out.writeVarUInt(block.columns.length.toLong)
    out.writeVarUInt(block.numRows.toLong)
    block.columns.foreach { col =>
      out.writeString(col.name)
      out.writeString(col.chType.name)
      ColumnCodec.encode(out, col.chType, col.values)
    }
  }

  override def close(): Unit = {
    out.flush()
    if (frames != null) frames.endFrame()
    stream.close()
  }
}
