package graft.sources.native

import java.nio.file.Files

import graft.SparkTestBase

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Micro-batch streaming over arriving .clickhouse part files. */
class NativeStreamingSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark

  test("readStream picks up part files as they arrive, exactly once") {
    val dir = Files.createTempDirectory("graft-native-stream").toString + "/in"
    val nation = spark.read.parquet(s"${SparkTestBase.sfDir}/nation.parquet")

    // seed: first batch of files
    nation.filter(col("n_regionkey") < 2).coalesce(1)
      .write.format("clickhouse_native").mode("append").save(dir)

    val stream = spark.readStream
      .format("clickhouse_native")
      .load(dir)
      .groupBy("n_regionkey").agg(count(lit(1)).as("cnt"))

    val q = stream.writeStream.format("memory").queryName("native_stream")
      .outputMode("complete").start()
    try {
      q.processAllAvailable()
      val afterFirst = spark.table("native_stream").collect()
        .map(r => r.getInt(0) -> r.getLong(1)).toMap
      assert(afterFirst.keySet === Set(0, 1))

      // new part files arrive mid-stream
      nation.filter(col("n_regionkey") >= 2).coalesce(1)
        .write.format("clickhouse_native").mode("append").save(dir)
      q.processAllAvailable()
      val afterSecond = spark.table("native_stream").collect()
        .map(r => r.getInt(0) -> r.getLong(1)).toMap
      assert(afterSecond.keySet === Set(0, 1, 2, 3, 4))
      // complete-mode counts equal the batch answer: nothing dropped or doubled
      val batch = nation.groupBy("n_regionkey").agg(count(lit(1)).as("cnt"))
        .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
      assert(afterSecond === batch)
    } finally q.stop()
  }

  test("offset serialization round-trips (checkpoint restart contract)") {
    val s = new NativeMicroBatchStream(
      org.apache.spark.sql.types.StructType(Seq.empty), Seq("/tmp/none"),
      new SerializableHadoopConf(new org.apache.hadoop.conf.Configuration()))
    val off = NativeFilesOffset(42L)
    assert(s.deserializeOffset(off.json()) === off)
  }
}
