// Round-15 (VERDICT item 9): capture the MICRO-BATCH plans of every
// q_stream_* key, to prove no per-micro-batch recomputation of a
// static side - the one shape the sweep wall cannot distinguish.
// A QueryExecutionListener sees every execution, including each
// IncrementalExecution of the streaming choreography; we keep the
// stateful micro-batch plans per key and write the LAST one (plus a
// summary of how many scans each micro-batch plan contains).
import java.nio.file.{Files, Paths}
import scala.collection.mutable.ArrayBuffer
import org.apache.spark.sql.execution.QueryExecution
import org.apache.spark.sql.util.QueryExecutionListener

val sf = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
val captured = ArrayBuffer[(String, String)]() // (funcName, plan)
val listener = new QueryExecutionListener {
  override def onSuccess(funcName: String, qe: QueryExecution, durationNs: Long): Unit =
    captured.synchronized {
      captured += ((funcName, qe.executedPlan.toString))
    }
  override def onFailure(funcName: String, qe: QueryExecution, exception: Exception): Unit = ()
}
spark.listenerManager.register(listener)
Files.createDirectories(Paths.get("plans/r15"))

for (k <- sys.env.getOrElse("SPARK_GRAFT_STREAM_KEYS", "q_stream_funnel,q_stream_sequence_match,q_stream_asof,q_stream_dedup").split(",").toSeq) {
  captured.synchronized { captured.clear() }
  val df = graft.SparkEntry.queries(k)(spark, sf)
  df.collect() // run the full choreography + the post-stream batch part
  Thread.sleep(1000)
  val snap = captured.synchronized { captured.toList }
  // micro-batch plans: stateful operators or streaming sinks
  val stateful = snap.filter { case (_, p) =>
    p.contains("StateStore") || p.contains("FlatMapGroupsWithState") ||
      p.contains("WriteToMicroBatchDataSource") || p.contains("foreachBatch")
  }
  // q_stream_dedup's micro-batch work happens inside foreachBatch
  // bodies, which surface as ordinary executions - keep everything
  // when no stateful plan matched, so the per-epoch plans are on
  // record (labeled by function name).
  val micro = if (stateful.nonEmpty) stateful else snap
  val summary = micro.zipWithIndex.map { case ((fn, p), i) =>
    val scanLines = p.split("\n").filter(s =>
      s.contains("FileScan") || s.contains("Scan parquet") || s.contains("BatchScan"))
    val srcs = scanLines.map { s =>
      if (s.contains("parquet")) {
        val m = "([a-z_0-9]+)\\.parquet".r.findFirstMatchIn(s)
        "parquet:" + m.map(_.group(1)).getOrElse("?")
      } else if (s.contains("clickhouse_native")) {
        val m = "clickhouse_native\\(([^)]*)\\)".r.findFirstMatchIn(s)
        "native:" + m.map(_.group(1).split("/").last).getOrElse("?")
      } else "other"
    }
    s"microbatch $i fn=$fn planLines=${p.split("\n").length} fileScans=${scanLines.length} [${srcs.mkString(", ")}]"
  }
  val body = new StringBuilder
  body ++= s"== $k: ${snap.length} executions captured, ${micro.length} micro-batch plans ==\n"
  summary.foreach(s => body ++= (s + "\n"))
  body ++= "\n== LAST micro-batch executed plan ==\n"
  body ++= micro.lastOption.map(_._2).getOrElse("(none captured)")
  Files.write(Paths.get(s"plans/r15/${k}_microbatch.txt"),
    body.toString.getBytes("UTF-8"))
  println(s"WROTE plans/r15/${k}_microbatch.txt micro=${micro.length} total=${snap.length}")
}
System.exit(0)
