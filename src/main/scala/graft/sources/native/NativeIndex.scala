package graft.sources.native

import java.io.{FileNotFoundException, OutputStream}
import java.nio.charset.StandardCharsets

import org.apache.hadoop.fs.{FileSystem, Path}

/**
 * Optional block-offset sidecar for Native data files, enabling
 * INTRA-FILE parallel scans.
 *
 * The wire format itself has no split points — every block is
 * self-describing (per-block column headers, NativeBlockIO), but block
 * boundaries are not discoverable without sequentially decoding the
 * whole file, so a foreign reader must scan one file on one core
 * ("full-scans at this time", reference README.md:51). That makes a
 * single huge file the scan-parallelism bottleneck at 100 TB.
 *
 * Our writer already rotates part files (maxRowsPerFile) to bound the
 * damage; this sidecar removes the bottleneck entirely for files WE
 * wrote: alongside `part.clickhouse` it records every block's byte
 * offset and row count in a hidden `.part.clickhouse.chidx` text file,
 * and the scan planner packs contiguous block ranges into
 * `spark.sql.files.maxPartitionBytes`-sized input partitions — the
 * same planning parquet gets from its row-group metadata. Readers seek
 * straight to their first block. Foreign files (clickhouse-local
 * output) have no sidecar and fall back to one partition per file,
 * unchanged.
 *
 * The sidecar is advisory and fail-safe: it names the data file's
 * exact byte length and block count, and a reader that finds ANY
 * mismatch (truncated sidecar, regenerated data file, non-monotonic
 * offsets) ignores it and scans the whole file sequentially. Count
 * pushdown and size statistics also read it: a `count(*)` over an
 * indexed directory touches only the tiny sidecars, never the data.
 *
 * Format (line-oriented, UTF-8):
 *   CHIDX1 <dataFileByteLength> <blockCount>
 *   <blockByteOffset> <blockRowCount>       // one line per block
 */
private[native] object NativeIndex {

  final case class BlockEntry(offset: Long, rows: Long)

  def sidecarPath(dataFile: Path): Path =
    new Path(dataFile.getParent, s".${dataFile.getName}.chidx")

  /** Write the sidecar for a just-closed data file of `dataLen` bytes. */
  def write(fs: FileSystem, dataFile: Path, entries: Seq[BlockEntry], dataLen: Long): Unit = {
    val sb = new StringBuilder(s"CHIDX1 $dataLen ${entries.length}\n")
    entries.foreach(e => sb.append(e.offset).append(' ').append(e.rows).append('\n'))
    val out: OutputStream = fs.create(sidecarPath(dataFile), true)
    try out.write(sb.toString.getBytes(StandardCharsets.UTF_8)) finally out.close()
  }

  /**
   * Read and validate the sidecar for `dataFile` whose CURRENT length
   * is `dataLen`. None on any doubt — absence, stale length, truncated
   * entry list, or offsets that aren't strictly increasing from 0 —
   * because a wrong index silently drops or duplicates rows, while no
   * index merely costs parallelism.
   */
  def read(fs: FileSystem, dataFile: Path, dataLen: Long): Option[Array[BlockEntry]] = {
    val p = sidecarPath(dataFile)
    val text =
      try {
        val in = fs.open(p)
        try {
          val bytes = new java.io.ByteArrayOutputStream()
          val buf = new Array[Byte](8192)
          var n = in.read(buf)
          while (n >= 0) { bytes.write(buf, 0, n); n = in.read(buf) }
          bytes.toString("UTF-8")
        } finally in.close()
      } catch { case _: FileNotFoundException => return None }
    val lines = text.split('\n').filter(_.nonEmpty)
    if (lines.isEmpty) return None
    val header = lines(0).split(' ')
    if (header.length != 3 || header(0) != "CHIDX1") return None
    val (len, count) =
      try (header(1).toLong, header(2).toInt)
      catch { case _: NumberFormatException => return None }
    if (len != dataLen || count != lines.length - 1 || count == 0) return None
    val entries = new Array[BlockEntry](count)
    var i = 0
    var prev = -1L
    while (i < count) {
      val parts = lines(i + 1).split(' ')
      if (parts.length != 2) return None
      val e =
        try BlockEntry(parts(0).toLong, parts(1).toLong)
        catch { case _: NumberFormatException => return None }
      if (e.offset <= prev || e.offset >= len || (i == 0 && e.offset != 0L)) return None
      prev = e.offset
      entries(i) = e
      i += 1
    }
    Some(entries)
  }

  /**
   * Pack an indexed file's blocks into contiguous ranges of ~
   * `targetBytes` each (always >= 1 block per range) — returns
   * (startOffset, blockCount, rowCount) triples in file order.
   */
  def splitRanges(entries: Array[BlockEntry], dataLen: Long, targetBytes: Long)
      : Seq[(Long, Int, Long)] = {
    val out = Seq.newBuilder[(Long, Int, Long)]
    var startIdx = 0
    var bytes = 0L
    var rows = 0L
    var i = 0
    while (i < entries.length) {
      val end = if (i + 1 < entries.length) entries(i + 1).offset else dataLen
      val blockBytes = end - entries(i).offset
      if (bytes > 0 && bytes + blockBytes > targetBytes) {
        out += ((entries(startIdx).offset, i - startIdx, rows))
        startIdx = i
        bytes = 0L
        rows = 0L
      }
      bytes += blockBytes
      rows += entries(i).rows
      i += 1
    }
    out += ((entries(startIdx).offset, entries.length - startIdx, rows))
    out.result()
  }
}

/** Byte-counting pass-through, so the block writer knows each block's offset. */
private[native] final class CountingOutputStream(underlying: OutputStream)
    extends OutputStream {
  private var counted = 0L
  def count: Long = counted
  override def write(b: Int): Unit = { underlying.write(b); counted += 1 }
  override def write(b: Array[Byte], off: Int, len: Int): Unit = {
    underlying.write(b, off, len); counted += len
  }
  override def flush(): Unit = underlying.flush()
  override def close(): Unit = underlying.close()
}
