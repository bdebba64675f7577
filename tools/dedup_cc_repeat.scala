// Round-11 (verdict items 1-2): isolated rep studies for the two
// round-10 weak marks -- scale_dedup_10x (driver 14.05 s vs r9 2.67,
// three consistent slow reps, clean sentinels) and scale_cc_1x
// (driver 11.44 s, 1x reading 2.7x SLOWER than its own 10x point).
// Same discipline that closed containment in r10: N fresh reps with
// per-rep wall/gc plus a stall heartbeat, then a System.gc + heal
// pass, then N more -- a storm shows a fast floor; a plan/heap
// problem repeats.
import org.apache.spark.sql.functions._
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
val gcBeans = java.lang.management.ManagementFactory.getGarbageCollectorMXBeans
def gcMillis(): Long = { var s = 0L; gcBeans.forEach(b => s += math.max(0L, b.getCollectionTime)) ; s }
// stall heartbeat (same idea as Bench): a daemon ticking every 50 ms;
// gaps > 250 ms are whole-VM stalls the JVM can't otherwise see
@volatile var stallNs = 0L
val hb = new Thread(() => {
  var last = System.nanoTime()
  while (true) {
    Thread.sleep(50)
    val now = System.nanoTime()
    val gap = now - last
    if (gap > 250L * 1000000L) stallNs += gap
    last = now
  }
})
hb.setDaemon(true); hb.start()

def dedup10() = graft.operators.Dedup.minhashPairs(docsAt(10), "doc_id", "text", threshold = 0.5)
def cc1() = graft.operators.DedupClusters.assign(
  graft.operators.Dedup.minhashPairs(docsAt(1), "doc_id", "text",
    threshold = 0.5).select(col("id_a"), col("id_b")))

def study(tag: String, mk: () => org.apache.spark.sql.DataFrame, reps: Int): Unit = {
  (1 to reps).foreach { i =>
    val g0 = gcMillis(); val s0 = stallNs
    val w = time(force(mk()))
    println(f"STUDY $tag rep$i wall=$w%.2f gc=${(gcMillis() - g0) / 1e3}%.2f stall=${(stallNs - s0) / 1e9}%.2f")
  }
}
// warm (shared codegen/shuffle plumbing)
force(graft.operators.Dedup.minhashPairs(docsAt(1), "doc_id", "text", threshold = 0.5))

println("== scale_dedup_10x isolated ==")
study("dedup10x", () => dedup10(), 6)
println("-- System.gc + heal --")
System.gc()
(1 to 2).foreach { _ =>
  spark.read.parquet(s"$sf/lineitem.parquet")
    .groupBy("l_returnflag").agg(sum("l_quantity"), count(lit(1))).collect()
}
study("dedup10x_postgc", () => dedup10(), 3)

println("== scale_cc_1x isolated ==")
study("cc1x", () => cc1(), 6)
println("-- System.gc + heal --")
System.gc()
study("cc1x_postgc", () => cc1(), 3)

// positional probe: cc_1x immediately AFTER a heavy dedup 10x pass,
// mimicking its sweep neighborhood (the r10 hypothesis is the
// first-key-after-heavy-neighbor position effect seen on minhash)
println("== cc1x after dedup10x (positional probe) ==")
(1 to 3).foreach { i =>
  force(dedup10())
  val g0 = gcMillis(); val s0 = stallNs
  val w = time(force(cc1()))
  println(f"STUDY cc1x_after_heavy rep$i wall=$w%.2f gc=${(gcMillis() - g0) / 1e3}%.2f stall=${(stallNs - s0) / 1e9}%.2f")
}
println(f"STUDY stall_total=${stallNs / 1e9}%.2f")
System.exit(0)
