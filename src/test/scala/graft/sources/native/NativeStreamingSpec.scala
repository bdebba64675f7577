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
    val ckpt = Files.createTempDirectory("graft-ckpt").toString
    val s = new NativeMicroBatchStream(
      org.apache.spark.sql.types.StructType(Seq.empty), Seq("/tmp/none"),
      new SerializableHadoopConf(new org.apache.hadoop.conf.Configuration()), ckpt)
    val off = NativeFilesOffset(42L)
    assert(s.deserializeOffset(off.json()) === off)
  }

  test("discovery log keeps indices stable when later files sort earlier") {
    // simulate the interleaving-listing bug: file named to sort FIRST
    // arrives SECOND; slicing a sorted listing would re-read/skip
    val dir = Files.createTempDirectory("graft-order").toString
    val ckpt = Files.createTempDirectory("graft-order-ckpt").toString
    def writeOne(name: String): Unit = {
      val bos = new java.io.ByteArrayOutputStream()
      val out = new NativeCodec.Output(bos)
      out.writeVarUInt(1); out.writeVarUInt(1)
      out.writeString("id"); out.writeString("Int64"); out.writeLongLE(1L)
      out.flush()
      Files.write(java.nio.file.Paths.get(dir, name), bos.toByteArray)
    }
    val conf = new SerializableHadoopConf(new org.apache.hadoop.conf.Configuration())
    val s = new NativeMicroBatchStream(
      org.apache.spark.sql.types.StructType(Seq.empty), Seq(dir), conf, ckpt)
    writeOne("zz-late-name.clickhouse") // sorts LAST but arrives FIRST
    val o1 = s.latestOffset()
    val batch1 = s.planInputPartitions(s.initialOffset(), o1)
      .map(_.asInstanceOf[NativeInputPartition].file)
    writeOne("aa-early-name.clickhouse") // sorts FIRST but arrives SECOND
    val o2 = s.latestOffset()
    val batch2 = s.planInputPartitions(o1, o2)
      .map(_.asInstanceOf[NativeInputPartition].file)
    assert(batch1.map(f => f.substring(f.lastIndexOf('/') + 1)).toSeq ===
      Seq("zz-late-name.clickhouse"))
    assert(batch2.map(f => f.substring(f.lastIndexOf('/') + 1)).toSeq ===
      Seq("aa-early-name.clickhouse"))
    // restart: a fresh stream over the same checkpoint reloads the log order
    val s2 = new NativeMicroBatchStream(
      org.apache.spark.sql.types.StructType(Seq.empty), Seq(dir), conf, ckpt)
    val replay = s2.planInputPartitions(s2.initialOffset(), s2.latestOffset())
      .map(p => p.asInstanceOf[NativeInputPartition].file.split('/').last).toSeq
    assert(replay === Seq("zz-late-name.clickhouse", "aa-early-name.clickhouse"))

    // the log is append-only: two discovery batches → two immutable
    // segments (0 and 1), nothing rewritten
    val segs = new java.io.File(ckpt, "graft-file-log").listFiles()
      .filter(_.getName.forall(_.isDigit)).map(_.getName).sorted.toSeq
    assert(segs === Seq("0", "1"))
  }

  test("lost discovery log with a positive start offset fails loudly, never re-lists") {
    val dir = Files.createTempDirectory("graft-lost").toString
    val ckpt = Files.createTempDirectory("graft-lost-ckpt").toString
    val conf = new SerializableHadoopConf(new org.apache.hadoop.conf.Configuration())
    spark.read.parquet(s"${SparkTestBase.sfDir}/nation.parquet").coalesce(1)
      .write.format("clickhouse_native").mode("append").save(dir)
    val s = new NativeMicroBatchStream(
      org.apache.spark.sql.types.StructType(Seq.empty), Seq(dir), conf, ckpt)
    val o1 = s.latestOffset()
    assert(o1.asInstanceOf[NativeFilesOffset].fileCount > 0)
    // simulate checkpoint-without-log (the crash the old rewrite+rename
    // log could produce): wipe the log, restart, replay the old offset
    def rmrf(f: java.io.File): Unit = {
      Option(f.listFiles()).foreach(_.foreach(rmrf)); f.delete()
    }
    rmrf(new java.io.File(ckpt, "graft-file-log"))
    val s2 = new NativeMicroBatchStream(
      org.apache.spark.sql.types.StructType(Seq.empty), Seq(dir), conf, ckpt)
    val e = intercept[IllegalStateException] {
      s2.planInputPartitions(s2.initialOffset(), o1)
    }
    assert(e.getMessage.contains("discovery log"))
  }

  test("writeStream sink: native-in → native-out, counts survive the round trip") {
    val in = Files.createTempDirectory("graft-swrite-in").toString + "/in"
    val out = Files.createTempDirectory("graft-swrite-out").toString + "/out"
    val ckpt = Files.createTempDirectory("graft-swrite-ckpt").toString
    val nation = spark.read.parquet(s"${SparkTestBase.sfDir}/nation.parquet")
    nation.filter(col("n_regionkey") < 2).coalesce(1)
      .write.format("clickhouse_native").mode("append").save(in)

    val q = spark.readStream.format("clickhouse_native").load(in)
      .writeStream.format("clickhouse_native")
      .option("path", out).option("checkpointLocation", ckpt)
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      // second wave of input part files → second epoch of output parts
      nation.filter(col("n_regionkey") >= 2).coalesce(1)
        .write.format("clickhouse_native").mode("append").save(in)
      q.processAllAvailable()
    } finally q.stop()

    val got = spark.read.format("clickhouse_native").load(out)
      .groupBy("n_regionkey").agg(count(lit(1)).as("cnt"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    val want = nation.groupBy("n_regionkey").agg(count(lit(1)).as("cnt"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(got === want) // nothing dropped or doubled across epochs
    // parts are epoch-scoped and immutable
    val parts = new java.io.File(out).listFiles().map(_.getName).filter(_.endsWith(".clickhouse"))
    assert(parts.nonEmpty && parts.forall(_.startsWith("epoch-")), parts.mkString(","))
  }

  test("writeStream into a bucketed catalog table: epoch and bucket tags compose") {
    val ckpt = Files.createTempDirectory("graft-sbucket-ckpt").toString
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.stream")
    spark.sql("DROP TABLE IF EXISTS graft.stream.ev")
    spark.sql("""CREATE TABLE graft.stream.ev (k BIGINT, v STRING)
                 USING clickhouse_native PARTITIONED BY (bucket(4, k))""")
    implicit val ctx = spark.sqlContext
    import spark.implicits._
    val input = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, String)]
    val q = input.toDF().toDF("k", "v")
      .writeStream.option("checkpointLocation", ckpt)
      .outputMode("append").toTable("graft.stream.ev")
    try {
      input.addData((0L until 100L).map(i => (i, s"v$i")): _*)
      q.processAllAvailable()
      input.addData((100L until 200L).map(i => (i, s"v$i")): _*)
      q.processAllAvailable()
    } finally q.stop()

    // complete across epochs
    val back = spark.table("graft.stream.ev")
    assert(back.count() === 200)
    assert(back.agg(sum("k")).head.getLong(0) === (0L until 200L).sum)

    // every data file carries BOTH the epoch prefix and a valid bucket
    // tag, and holds only rows of its bucket
    val wh = spark.conf.get("spark.sql.catalog.graft.warehouse")
    val dir = new org.apache.hadoop.fs.Path(wh, "stream/ev")
    val fs = dir.getFileSystem(spark.sessionState.newHadoopConf())
    val parts = fs.listStatus(dir).map(_.getPath)
      .filter(_.getName.endsWith(".clickhouse"))
    assert(parts.nonEmpty)
    parts.foreach { p =>
      assert(p.getName.startsWith("epoch-"), p.getName)
      val tag = NativeBucket.bucketOfFile(p.getName)
      assert(tag.isDefined && tag.get < 4, p.getName)
      val ks = spark.read.format("clickhouse_native").load(p.toString)
        .select("k").as[Long].collect()
      assert(ks.forall(k => NativeBucket.ofLong(k, 4) === tag.get), p.getName)
    }
  }

  test("write option maxRowsPerFile is validated at build time") {
    val nation = spark.read.parquet(s"${SparkTestBase.sfDir}/nation.parquet")
    val dir = Files.createTempDirectory("graft-opt").toString + "/out"
    Seq("0", "-5", "abc").foreach { bad =>
      val e = intercept[Exception] {
        nation.write.format("clickhouse_native")
          .option("maxRowsPerFile", bad).mode("overwrite").save(dir)
      }
      // Spark may wrap the planning error; the root message must name the option
      def msgs(t: Throwable): Seq[String] =
        if (t == null) Seq.empty else Option(t.getMessage).toSeq ++ msgs(t.getCause)
      assert(msgs(e).exists(_.contains("maxRowsPerFile")), s"for value '$bad': $e")
    }
  }
}
