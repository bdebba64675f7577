package graft.sources.native

import graft.SparkTestBase

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/**
 * Mutations (ALTER TABLE DELETE/UPDATE) + system.parts introspection.
 * Correctness of the end-to-end mutation result is oracle-gated
 * (q_engine_mutate); these tests pin the EXECUTION model — the part
 * of the contract a 100-TB run depends on: parts the predicate
 * provably cannot touch are never rewritten (byte-identical
 * copy-through via zone maps), and UPDATE reads the pre-mutation row.
 */
class NativeTableOpsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark

  private def tmp(name: String): String = {
    val d = java.nio.file.Files.createTempDirectory(name).toFile
    d.delete()
    d.getPath
  }

  /** A 4-part table with disjoint id ranges per part (range-clustered
    * via repartitionByRange so zone maps separate the parts). */
  private def makeTable(dir: String): Unit = {
    import spark.implicits._
    (0 until 1000).map(i => (i.toLong, s"name_$i", i % 7))
      .toDF("id", "name", "grp")
      .repartitionByRange(4, col("id"))
      .write.format("clickhouse_native").mode("overwrite").save(dir)
  }

  private def partFiles(dir: String) =
    new java.io.File(dir).listFiles().filter(_.getName.endsWith(".clickhouse"))
      .sortBy(_.getName)

  test("delete mutation rewrites only the parts the zone maps cannot clear") {
    val src = tmp("mut-src")
    val dst = tmp("mut-dst")
    makeTable(src)
    assert(partFiles(src).length === 4)

    // ids 0..199 live in the first range-part only
    val out = NativeTableOps.mutateDelete(spark, src, dst, col("id") < 200)
    assert(out.count() === 800)
    assert(out.filter(col("id") < 200).count() === 0)

    // untouched parts must be BYTE-IDENTICAL source files (copied, not
    // re-encoded): match by (name, length, content hash)
    val srcByName = partFiles(src).map(f => f.getName ->
      java.util.Arrays.hashCode(java.nio.file.Files.readAllBytes(f.toPath))).toMap
    val copied = partFiles(dst).filter(f => srcByName.get(f.getName)
      .contains(java.util.Arrays.hashCode(java.nio.file.Files.readAllBytes(f.toPath))))
    assert(copied.length === 3,
      s"expected 3 copied-through parts, got ${copied.length} of ${partFiles(dst).length}")
    // and each copied part kept its (dot-prefixed) sidecar
    copied.foreach { f =>
      val sidecar = NativeIndex.sidecarPath(
        new org.apache.hadoop.fs.Path(f.getPath)).getName
      assert(new java.io.File(dst, sidecar).exists(),
        s"sidecar $sidecar missing for copied part ${f.getName}")
    }
  }

  test("update mutation: assignments and predicate see the ORIGINAL row") {
    val src = tmp("mut-upd-src")
    val dst = tmp("mut-upd-dst")
    makeTable(src)
    // swap-shaped update: name takes a value derived from grp, grp from id;
    // a sequential column-fold would corrupt the second assignment
    val out = NativeTableOps.mutateUpdate(spark, src, dst,
      col("grp") === 3,
      Map("name" -> concat(lit("g"), col("grp")), "grp" -> (col("id") % 2).cast("int")))
    val hit = out.filter(col("name") === "g3")
    assert(hit.count() === out.filter((col("id") % 7) === 3).count())
    // grp was reassigned from id AFTER name read the old grp
    hit.collect().foreach { r =>
      val id = r.getLong(0)
      assert(r.getInt(2) === (id % 2).toInt)
      assert(id % 7 === 3)
    }
    // non-matching rows fully unchanged
    val miss = out.filter((col("id") % 7) =!= 3)
    assert(miss.filter(col("name").startsWith("g")).count() === 0)
  }

  test("delete keeps rows where the predicate is NULL (SQL WHERE contract)") {
    import spark.implicits._
    val src = tmp("mut-null-src")
    val dst = tmp("mut-null-dst")
    Seq((1L, Some(5L)), (2L, None), (3L, Some(50L)))
      .toDF("id", "v")
      .write.format("clickhouse_native").mode("overwrite").save(src)
    val out = NativeTableOps.mutateDelete(spark, src, dst, col("v") > 10)
    // row 3 deleted; row 2 (NULL predicate) SURVIVES
    assert(out.select("id").collect().map(_.getLong(0)).sorted.toSeq === Seq(1L, 2L))
  }

  test("mutation refuses a non-empty target directory") {
    val src = tmp("mut-ref-src")
    val dst = tmp("mut-ref-dst")
    makeTable(src)
    makeTable(dst)
    val e = intercept[IllegalArgumentException] {
      NativeTableOps.mutateDelete(spark, src, dst, col("id") < 10)
    }
    assert(e.getMessage.contains("must be empty"))
  }

  test("partsMeta reports sidecar-derived rows/blocks without opening data files") {
    val src = tmp("parts-meta")
    makeTable(src)
    val meta = NativeTableOps.partsMeta(spark, src).collect()
    assert(meta.length === 4)
    assert(meta.map(_.getAs[Long]("rows")).sum === 1000L)
    assert(meta.forall(_.getAs[Boolean]("indexed")))
    assert(meta.forall(_.getAs[Int]("blocks") >= 1))
    assert(meta.forall(_.getAs[Long]("bytes") > 0))
  }
}
