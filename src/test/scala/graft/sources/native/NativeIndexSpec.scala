package graft.sources.native

import java.nio.file.Files

import graft.SparkTestBase

import org.apache.hadoop.fs.Path
import org.scalatest.funsuite.AnyFunSuite

/**
 * Intra-file parallelism via the NativeIndex sidecar: the writer
 * records every block's (offset, rows); the scan planner splits
 * indexed files into maxPartitionBytes block ranges; readers seek.
 * Foreign files (no sidecar) and corrupt sidecars fall back to one
 * partition per file — never wrong results.
 */
class NativeIndexSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  private def tmpDir(tag: String): String =
    Files.createTempDirectory(s"graft-chidx-$tag").toString + "/out"

  private def hadoopConf = spark.sessionState.newHadoopConf()

  /** One indexed multi-block part file + its sidecar. */
  private def writeMultiBlock(tag: String, rows: Int): (String, Path) = {
    import spark.implicits._
    val dir = tmpDir(tag)
    // single output partition → single part file; several 65536-row blocks
    (1 to rows).map(i => (i.toLong, s"name_$i", i * 0.5)).toDF("id", "name", "v")
      .coalesce(1)
      .write.format("clickhouse_native").mode("overwrite").save(dir)
    val fs = new Path(dir).getFileSystem(hadoopConf)
    val parts = fs.listStatus(new Path(dir)).filter(_.getPath.getName.endsWith(".clickhouse"))
    assert(parts.length === 1)
    (dir, parts(0).getPath)
  }

  test("writer emits a valid sidecar whose offsets and row counts cover the file") {
    val (_, part) = writeMultiBlock("valid", 200000)
    val fs = part.getFileSystem(hadoopConf)
    val len = fs.getFileStatus(part).getLen
    val idx = NativeIndex.read(fs, part, len)
    assert(idx.isDefined, "sidecar missing or invalid")
    val entries = idx.get
    assert(entries.length === 4) // ceil(200000 / 65536) blocks
    assert(entries.head.offset === 0L)
    assert(entries.map(_.rows).sum === 200000L)
    assert(entries.map(_.offset).toSeq === entries.map(_.offset).toSeq.sorted)
    // seeking to a mid-file offset must land on a decodable block
    val in = fs.open(part)
    in.seek(entries(2).offset)
    val r = new NativeBlockReader(in, None, blockLimit = 1)
    val block = r.next()
    assert(block.numRows === entries(2).rows)
    r.close()
  }

  test("indexed file splits into multiple partitions and content matches exactly") {
    val (dir, part) = writeMultiBlock("split", 200000)
    val fs = part.getFileSystem(hadoopConf)
    val len = fs.getFileStatus(part).getLen
    // force splitting: target well below the file size
    spark.conf.set("spark.sql.files.maxPartitionBytes", (len / 3).toString)
    try {
      val df = spark.read.format("clickhouse_native").load(dir)
      assert(df.rdd.getNumPartitions > 1, "indexed large file should split")
      assert(df.count() === 200000L)
      val sums = df.selectExpr("sum(id)", "count(distinct name)", "sum(v)").collect()(0)
      assert(sums.getLong(0) === 200000L * 200001L / 2)
      assert(sums.getLong(1) === 200000L)
      assert(math.abs(sums.getDouble(2) - 0.5 * (200000.0 * 200001.0 / 2)) < 1e-6)
    } finally spark.conf.unset("spark.sql.files.maxPartitionBytes")
  }

  test("corrupt or stale sidecar falls back to whole-file scan with correct results") {
    val (dir, part) = writeMultiBlock("corrupt", 150000)
    val fs = part.getFileSystem(hadoopConf)
    val sidecar = NativeIndex.sidecarPath(part)
    // truncate the sidecar: header promises more blocks than listed
    val out = fs.create(sidecar, true)
    out.write("CHIDX1 999999 7\n0 100\n".getBytes("UTF-8"))
    out.close()
    spark.conf.set("spark.sql.files.maxPartitionBytes", "65536")
    try {
      val df = spark.read.format("clickhouse_native").load(dir)
      assert(df.rdd.getNumPartitions === 1, "invalid sidecar must not split")
      assert(df.count() === 150000L)
    } finally spark.conf.unset("spark.sql.files.maxPartitionBytes")
  }

  test("count(*) and statistics come from the sidecar for indexed files") {
    val (dir, part) = writeMultiBlock("count", 100000)
    val fs = part.getFileSystem(hadoopConf)
    val df = spark.read.format("clickhouse_native").load(dir)
    assert(df.count() === 100000L)
    // estimateStatistics: exact row count via sidecars
    val scan = new NativeScan(df.schema, df.schema, Seq(dir), -1,
      new SerializableHadoopConf(hadoopConf))
    val stats = scan.estimateStatistics()
    assert(stats.numRows().isPresent && stats.numRows().getAsLong === 100000L)
    // delete the sidecar → numRows unknown, count still correct (header walk)
    fs.delete(NativeIndex.sidecarPath(part), false)
    val stats2 = scan.estimateStatistics()
    assert(!stats2.numRows().isPresent)
    assert(spark.read.format("clickhouse_native").load(dir).count() === 100000L)
  }

  test("splitRanges packs contiguous blocks to the byte target") {
    val entries = Array(
      NativeIndex.BlockEntry(0, 10), NativeIndex.BlockEntry(100, 10),
      NativeIndex.BlockEntry(200, 10), NativeIndex.BlockEntry(300, 10))
    val ranges = NativeIndex.splitRanges(entries, dataLen = 400, targetBytes = 200)
    assert(ranges === Seq((0L, 2, 20L), (200L, 2, 20L)))
    // target smaller than a block: one block per range, never zero
    val tiny = NativeIndex.splitRanges(entries, 400, 10)
    assert(tiny === Seq((0L, 1, 10L), (100L, 1, 10L), (200L, 1, 10L), (300L, 1, 10L)))
    // huge target: single range
    assert(NativeIndex.splitRanges(entries, 400, 1 << 20) === Seq((0L, 4, 40L)))
  }
}
