package graft.sources.native

import graft.SparkTestBase
import graft.functions.ZOrder

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._
import org.apache.spark.sql.sources.{Filter, GreaterThanOrEqual, LessThanOrEqual}
import org.scalatest.funsuite.AnyFunSuite

/**
 * Z-order clustering: the Column interleave matches the reference
 * bit-twiddle, and — the 100-TB contract — a z-ordered native layout
 * gives zone-map pruning power on BOTH interleaved dimensions, where
 * a one-column sort prunes only its own column.
 */
class ZOrderSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark

  test("Column interleave16 == reference implementation") {
    import spark.implicits._
    val rows = (0 until 2000).map(i => ((i * 2654435761L) % 65536, (i * 40503L) % 65536))
    val got = rows.toDF("x", "y")
      .select(col("x"), col("y"), ZOrder.interleave16(col("x"), col("y")).as("z"))
      .collect()
    got.foreach { r =>
      assert(r.getLong(2) === ZOrder.interleave16Ref(r.getLong(0), r.getLong(1)),
        s"x=${r.getLong(0)} y=${r.getLong(1)}")
    }
    // spot-check the published Morton pattern: (x=0b11, y=0b01) -> 0b0111
    assert(ZOrder.interleave16Ref(3, 1) === 7)
    assert(ZOrder.interleave16Ref(0xFFFF, 0) === 0x55555555L)
    assert(ZOrder.interleave16Ref(0, 0xFFFF) === 0xAAAAAAAAL)

    // decode inverts encode (CH mortonDecode)
    val (dx, dy) = ZOrder.deinterleave16(col("z"))
    rows.toDF("x", "y")
      .select(col("x"), col("y"), ZOrder.interleave16(col("x"), col("y")).as("z"))
      .select(col("x"), col("y"), dx.as("rx"), dy.as("ry"))
      .collect().foreach { r =>
        assert(r.getLong(2) === r.getLong(0) && r.getLong(3) === r.getLong(1),
          s"decode mismatch at x=${r.getLong(0)} y=${r.getLong(1)}")
      }
  }

  /** Blocks whose sidecar zone maps admit the given filters. */
  private def admittedBlocks(dir: String, filters: Seq[Filter]): (Int, Int) = {
    val conf = spark.sessionState.newHadoopConf()
    val d = new Path(dir)
    val fs = d.getFileSystem(conf)
    val parts = fs.listStatus(d).filter(_.getPath.getName.endsWith(".clickhouse"))
    var admitted = 0
    var total = 0
    parts.foreach { st =>
      val entries = NativeIndex.read(fs, st.getPath, st.getLen)
        .getOrElse(fail(s"no sidecar for ${st.getPath.getName}"))
      total += entries.length
      admitted += entries.count(e => NativeIndex.blockMayMatch(e.stats, filters))
    }
    (admitted, total)
  }

  test("z-ordered layout prunes on BOTH dimensions; linear sort on one") {
    import spark.implicits._
    // independent dimensions (a multiplicative scramble of i makes y a
    // FUNCTION of x — both live on the i-mod-256 cycle — which would
    // fake pruning power the layout doesn't have)
    val rnd = new scala.util.Random(42)
    val rows = (0 until 8192).map(i =>
      (i.toLong, rnd.nextInt(256).toLong, rnd.nextInt(256).toLong))
    val df = rows.toDF("id", "x", "y")

    val zdir = java.nio.file.Files.createTempDirectory("zorder").toString
    val zkey = ZOrder.interleave16(col("x"), col("y"))
    df.repartitionByRange(16, zkey).sortWithinPartitions(zkey)
      .write.format("clickhouse_native").mode("overwrite").save(zdir)

    val ldir = java.nio.file.Files.createTempDirectory("linear").toString
    df.repartitionByRange(16, col("x")).sortWithinPartitions("x")
      .write.format("clickhouse_native").mode("overwrite").save(ldir)

    def box(c: String) =
      Seq(GreaterThanOrEqual(c, 10L), LessThanOrEqual(c, 20L))

    val (zx, ztot) = admittedBlocks(zdir, box("x"))
    val (zy, _)    = admittedBlocks(zdir, box("y"))
    val (lx, ltot) = admittedBlocks(ldir, box("x"))
    val (ly, _)    = admittedBlocks(ldir, box("y"))

    // both dimensions prune under z-order: an ~4% box in either
    // dimension must exclude at least half the blocks
    assert(zx <= ztot / 2, s"z-layout x-filter admitted $zx of $ztot")
    assert(zy <= ztot / 2, s"z-layout y-filter admitted $zy of $ztot")
    // the linear layout prunes x hard but CANNOT prune y at all
    assert(lx <= ltot / 4, s"linear x-filter admitted $lx of $ltot")
    assert(ly === ltot, s"linear y-filter should admit every block, got $ly of $ltot")

    // and pruning is SOUND: the z-ordered scan returns exactly the
    // brute-force box result
    val got = spark.read.format("clickhouse_native").load(zdir)
      .filter(col("x").between(10, 20) && col("y").between(10, 20))
      .select("id").collect().map(_.getLong(0)).sorted
    val want = rows.filter(r => r._2 >= 10 && r._2 <= 20 && r._3 >= 10 && r._3 <= 20)
      .map(_._1).sorted
    assert(got.toSeq === want)
  }
}
