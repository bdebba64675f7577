package graft.sources.remote

import graft.SparkTestBase

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class RemoteSourceSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark

  private def recordedResponse(): String = {
    val dir = java.nio.file.Files.createTempDirectory("graft-remote").toString + "/resp"
    spark.read.parquet(s"${SparkTestBase.sfDir}/nation.parquet")
      .coalesce(1).write.format("clickhouse_native").mode("overwrite").save(dir)
    new java.io.File(dir).listFiles()
      .filter(_.getName.endsWith(".clickhouse")).map(_.getPath).sorted.head
  }

  test("file transport streams a recorded Native response as a table") {
    val resp = recordedResponse()
    val df = spark.read.format("clickhouse_remote")
      .option("query", "SELECT * FROM nation")
      .option("transport", "file")
      .option("responsePath", resp)
      .load()
    val src = spark.read.parquet(s"${SparkTestBase.sfDir}/nation.parquet")
    assert(df.collect().toSet === src.collect().toSet)
    assert(df.count() === 25)
  }

  test("column pruning reaches the remote decode path") {
    val resp = recordedResponse()
    val df = spark.read.format("clickhouse_remote")
      .option("query", "SELECT * FROM nation")
      .option("transport", "file")
      .option("responsePath", resp)
      .load()
      .select("n_name")
    assert(df.collect().map(_.getString(0)).toSet ===
      spark.read.parquet(s"${SparkTestBase.sfDir}/nation.parquet")
        .select("n_name").collect().map(_.getString(0)).toSet)
  }

  test("missing query option fails clearly") {
    val e = intercept[Exception] {
      spark.read.format("clickhouse_remote")
        .option("transport", "file").option("responsePath", "/tmp/x").load()
    }
    assert(e.getMessage.contains("query"))
  }

  test("tcp transport reports the documented descope") {
    val e = intercept[Exception] {
      spark.read.format("clickhouse_remote")
        .option("query", "SELECT 1").load().collect()
    }
    def causes(t: Throwable): Seq[Throwable] =
      if (t == null) Seq.empty else t +: causes(t.getCause)
    assert(causes(e).exists(c =>
      String.valueOf(c.getMessage).contains("REMOTE_SCAN.md")))
  }
}
