package graft.operators

import java.nio.file.Files

import graft.SparkTestBase

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class MergeTreeSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  import spark.implicits._

  test("optimizeReplacing: parts compact, fold matches replacingFinal, rows survive") {
    val base = Files.createTempDirectory("graft-optimize").toString
    val src = s"$base/src"; val dst = s"$base/dst"
    // 3 versions per key across 200 keys, landed as 8 accumulate-only parts
    val log = (0 until 600).map(i => (i % 200L, i / 200L, s"v${i / 200}"))
      .toDF("k", "ver", "payload")
    log.repartition(8).write.format("clickhouse_native").mode("overwrite").save(src)
    val srcParts = new java.io.File(src).listFiles()
      .count(_.getName.endsWith(".clickhouse"))
    assert(srcParts === 8)

    val compacted = MergeTree.optimizeReplacing(spark, src, dst,
      Seq("k"), "ver", parts = 2)
    val dstParts = new java.io.File(dst).listFiles()
      .count(_.getName.endsWith(".clickhouse"))
    assert(dstParts === 2, "compaction must rewrite to the requested part count")

    // content = the replacing fold of the raw log, nothing lost or duplicated
    val expect = MergeTree.replacingFinal(log, Seq("k"), "ver")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSet
    val got = compacted.collect()
      .map(r => (r.getAs[Long]("k"), r.getAs[Long]("ver"), r.getAs[String]("payload"))).toSet
    assert(got === expect)
    assert(got.size === 200 && got.forall(_._2 === 2L), "latest version per key survives")
  }

  test("replacingFinalDeleted: a key whose latest version is a tombstone vanishes") {
    import spark.implicits._
    val df = Seq(
      (1L, 1L, 0, "a"), (1L, 2L, 1, "a2"), // latest is delete → gone
      (2L, 1L, 1, "b"), (2L, 2L, 0, "b2"), // deleted then re-inserted → back
      (3L, 1L, 0, "c") // never deleted
    ).toDF("k", "ver", "is_deleted", "p")
    val got = MergeTree.replacingFinalDeleted(df, Seq("k"), "ver", "is_deleted")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(3))).toSet
    assert(got === Set((2L, 2L, "b2"), (3L, 1L, "c")))
    // a NULL is_deleted (rows predating a metadata-only ADD COLUMN of
    // the flag) is NOT a tombstone — the key must survive
    val withNull = Seq(
      (1L, 1L, Some(0), "a"), (1L, 2L, None, "a2"), // latest flag NULL → keep
      (2L, 1L, Some(1), "b") // explicit tombstone → gone
    ).toDF("k", "ver", "is_deleted", "p")
    val gotNull = MergeTree.replacingFinalDeleted(withNull, Seq("k"), "ver", "is_deleted")
      .collect().map(r => (r.getLong(0), r.getString(3))).toSet
    assert(gotNull === Set((1L, "a2")))
    // a MALFORMED flag (e.g. 2 from a corrupt export) is not a valid
    // tombstone — the key must stay visible, not silently vanish
    // (ClickHouse rejects is_deleted outside {0,1}; we keep the row)
    val malformed = Seq(
      (1L, 1L, 0, "a"), (1L, 2L, 2, "a2"), // latest flag 2 → keep
      (2L, 1L, 1, "b") // explicit tombstone → gone
    ).toDF("k", "ver", "is_deleted", "p")
    val gotMal = MergeTree.replacingFinalDeleted(malformed, Seq("k"), "ver", "is_deleted")
      .collect().map(r => (r.getLong(0), r.getString(3))).toSet
    assert(gotMal === Set((1L, "a2")))
  }

  test("optimizeDeduplicate: whole-row and BY forms, deterministic survivor") {
    import spark.implicits._
    val src = java.nio.file.Files.createTempDirectory("mt-dedup").toString + "/src"
    val dst1 = java.nio.file.Files.createTempDirectory("mt-dedup").toString + "/d1"
    val dst2 = java.nio.file.Files.createTempDirectory("mt-dedup").toString + "/d2"
    val rows = Seq((1L, "x", 10L), (1L, "x", 10L), (1L, "y", 5L), (2L, "z", 7L))
    rows.toDF("k", "s", "n").write.format("clickhouse_native")
      .mode("overwrite").save(src)
    // whole-row: exact duplicates collapse, distinct rows survive
    val whole = MergeTree.optimizeDeduplicate(spark, src, dst1)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    assert(whole === Set((1L, "x", 10L), (1L, "y", 5L), (2L, "z", 7L)))
    // BY k: one row per key, the MINIMUM payload survives (total order
    // — CH leaves the survivor unspecified, we pin the deterministic one)
    val byDf = MergeTree.optimizeDeduplicate(spark, src, dst2, byCols = Seq("s"))
    // the maintenance contract is "the same table, compacted": source
    // column order survives even though the BY column is not first
    assert(byDf.columns.toSeq === Seq("k", "s", "n"))
    val byK = MergeTree.optimizeDeduplicate(spark, src, dst2 + "b", byCols = Seq("k"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    assert(byK === Set((1L, "x", 10L), (2L, "z", 7L)))
  }
}
