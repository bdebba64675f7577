// Round-13 A/B (verdict item 2): containment verify payload.
// Compares the round-12 arrays-verify (per-pair array_intersect, the
// container's full shingle array re-evaluated per candidate) against
// the round-13 key-join verify (overlap counted via a thin
// (id_b, g) equi-join -- container shingles cross the wire once).
// Measures wall (min-of-3, JIT-warm), TOTAL shuffle bytes written
// (from the stage listener -- the bytes-over-wire number the verdict
// asked for), and asserts the two pair sets are IDENTICAL.
// Usage:
//   /opt/spark/bin/spark-shell --master 'local[32]' \
//     --conf spark.sql.shuffle.partitions=32 \
//     --conf spark.sql.extensions=graft.GraftExtensions \
//     --driver-memory 32g \
//     --jars target/scala-2.13/duckdbextensionclickhousenativespark_2.13-0.1.0.jar \
//     -i tools/containment_verify_ab.scala
import org.apache.spark.sql.functions._
import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import java.util.concurrent.atomic.AtomicLong

val sf = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
val keyShift = 100000000L
def docsAt(copies: Int) = {
  val d = spark.read.parquet(s"$sf/documents.parquet")
  val alpha = "abcdefghij"
  (0 until copies).map { i =>
    val mapped = if (i == 0) col("text")
      else translate(col("text"), alpha, alpha.drop(i) + alpha.take(i))
    d.select((col("doc_id") + lit(i * keyShift)).as("doc_id"), mapped.as("text"))
  }.reduce(_ unionByName _)
}
def time(f: => Unit): Double = { val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9 }
def force(df: org.apache.spark.sql.DataFrame): Unit =
  df.queryExecution.toRdd.foreachPartition(it => while (it.hasNext) it.next())
def minOf(n: Int)(f: => Unit): Double = (1 to n).map(_ => time(f)).min

// wire meter: shuffle write bytes + records summed over stages
val wireBytes = new AtomicLong(0L)
val wireRecs = new AtomicLong(0L)
spark.sparkContext.addSparkListener(new SparkListener {
  override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
    val m = sc.stageInfo.taskMetrics
    if (m != null) {
      wireBytes.addAndGet(m.shuffleWriteMetrics.bytesWritten)
      wireRecs.addAndGet(m.shuffleWriteMetrics.recordsWritten)
    }
  }
})
def wired(f: => Unit): (Double, Long, Long) = {
  wireBytes.set(0L); wireRecs.set(0L)
  val w = time(f)
  // listener events are async; give the bus a moment to drain
  Thread.sleep(1000)
  (w, wireBytes.get, wireRecs.get)
}

// arrays-verify IS the production shape after this A/B settled it
// (it won); the key-join alternative stayed in the jar as
// Dedup.containmentPairsExactKeyVerify (output identity pinned by
// LlmOpsSpec). Result recorded in BENCH_NOTES round 13:
//   1x  arrays wall=1.52 shufMB=4.4    keyjoin wall=2.08  shufMB=8.5
//   10x arrays wall=9.53 shufMB=542.1  keyjoin wall=18.17 shufMB=1158.4
//   (records 6.4M vs 59.7M at 10x; pair sets identical at both scales)
def oldV(c: Int) = graft.operators.Dedup
  .containmentPairsExact(docsAt(c), "doc_id", "text", theta = 0.9)
def newV(c: Int) = graft.operators.Dedup
  .containmentPairsExactKeyVerify(docsAt(c), "doc_id", "text", theta = 0.9)

// identical-output gate first (cheap at 1x): symmetric difference must be 0
val dOld = oldV(1).withColumnRenamed("containment", "c")
val dNew = newV(1).withColumnRenamed("containment", "c")
val onlyOld = dOld.exceptAll(dNew).count()
val onlyNew = dNew.exceptAll(dOld).count()
println(s"PAIRSET 1x onlyOld=$onlyOld onlyNew=$onlyNew (both must be 0)")
val d10Old = oldV(10).withColumnRenamed("containment", "c")
val d10New = newV(10).withColumnRenamed("containment", "c")
println(s"PAIRSET 10x onlyOld=${d10Old.exceptAll(d10New).count()} onlyNew=${d10New.exceptAll(d10Old).count()} n=${d10New.count()}")

// warm both shapes (JIT + janino) before timing
(1 to 2).foreach { _ => force(oldV(10)); force(newV(10)) }

for (c <- Seq(1, 10)) {
  val (wo, bo, ro) = { var best = (1e9, 0L, 0L); (1 to 3).foreach { _ =>
    val r = wired(force(oldV(c))); if (r._1 < best._1) best = r }; best }
  val (wn, bn, rn) = { var best = (1e9, 0L, 0L); (1 to 3).foreach { _ =>
    val r = wired(force(newV(c))); if (r._1 < best._1) best = r }; best }
  println(f"AB ${c}x arrays-verify wall=$wo%.2f shufMB=${bo / 1e6}%.1f recs=$ro")
  println(f"AB ${c}x keyjoin-verify wall=$wn%.2f shufMB=${bn / 1e6}%.1f recs=$rn")
}
System.exit(0)
