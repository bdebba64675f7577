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
}
