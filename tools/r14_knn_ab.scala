// Round-14 A/B: the corpus-vs-corpus kNN scoring join at sf0.1 gets
// auto-BROADCAST by Catalyst (both sides are corpus-derived but tiny at
// this SF), which (a) diverges from the documented at-scale shape
// ("probes equi-join the cell assignments co-partitioned, nothing
// corpus-sized broadcasts") and (b) collapses the 4M-pair scoring +
// sort onto the ONE partition of the streamed parquet scan. Variants
// pin the join to shuffle (hash/merge) like Dedup.corpusSide does.
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
val sf = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
def time(f: => Unit): Double = { val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9 }
def force(df: org.apache.spark.sql.DataFrame): Unit =
  df.queryExecution.toRdd.foreachPartition(it => while (it.hasNext) it.next())
def minOf(n: Int)(f: => Unit): Double = (1 to n).map(_ => time(f)).min

val emb = spark.read.parquet(s"$sf/embeddings.parquet")
import graft.operators.Similarity
import graft.functions.{IvfProbe, IvfRoute}
import org.apache.spark.sql.graft.Bridge

def topk(scored: org.apache.spark.sql.DataFrame, k: Int) = {
  val w = Window.partitionBy("q_id").orderBy(col("sim").desc, col("vec_id"))
  scored.select(col("q_id"), col("vec_id"), col("sim"), row_number().over(w).as("rn"))
    .filter(col("rn") <= k)
}
def dot(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
  call_function("vec_dot", a, b)

// ---- FLAT exact gate --------------------------------------------------
def flatVariant(shortcut: Boolean, pin: String): org.apache.spark.sql.DataFrame = {
  val (cand, centroidDf) = Similarity.buildIvfIndex(emb, 16, 0.5)
  val q = emb.select(col("vec_id").as("q_id"), col("embedding").as("q_emb"))
    .withColumn("q_norm", sqrt(dot(col("q_emb"), col("q_emb"))))
  val probes =
    if (shortcut) q.crossJoin(broadcast(centroidDf.select(col("cell"))))
      .select("q_id", "q_emb", "q_norm", "cell")
    else q.crossJoin(broadcast(centroidDf))
      .withColumn("dist", -(dot(col("q_emb"), col("centroid")) /
        (sqrt(dot(col("q_emb"), col("q_emb"))) * sqrt(dot(col("centroid"), col("centroid"))))))
      .withColumn("cell_rank", row_number().over(
        Window.partitionBy("q_id").orderBy(col("dist"), col("cell"))))
      .filter(col("cell_rank") <= 16)
      .select("q_id", "q_emb", "q_norm", "cell")
  val candN = cand.withColumn("e_norm", sqrt(dot(col("embedding"), col("embedding"))))
  val candP = if (pin == "") candN else candN.hint(pin)
  val probeP = if (pin == "") probes else probes.hint(pin)
  val scored = candP.join(probeP, "cell")
    .filter(col("vec_id") =!= col("q_id"))
    .select(col("q_id"), col("vec_id"),
      round(dot(col("embedding"), col("q_emb")) / (col("e_norm") * col("q_norm")), 4).as("sim"))
  topk(scored, 3)
}

// ---- HIER exact gate --------------------------------------------------
def hierVariant(pin: String): org.apache.spark.sql.DataFrame = {
  val (cells, _, model) = Similarity.buildIvfIndexHier(emb, 16)
  val probes = emb.select(col("vec_id").as("q_id"), col("embedding").as("q_emb"))
    .withColumn("q_norm", sqrt(dot(col("q_emb"), col("q_emb"))))
    .withColumn("cell", explode(Bridge.column(IvfProbe(
      Bridge.expression(col("q_emb")), model, model.supers.length, 16))))
    .select("q_id", "q_emb", "q_norm", "cell")
  val candN = cells.withColumn("e_norm", sqrt(dot(col("embedding"), col("embedding"))))
  val candP = if (pin == "") candN else candN.hint(pin)
  val probeP = if (pin == "") probes else probes.hint(pin)
  val scored = candP.join(probeP, "cell")
    .filter(col("vec_id") =!= col("q_id"))
    .select(col("q_id"), col("vec_id"),
      round(dot(col("embedding"), col("q_emb")) / (col("e_norm") * col("q_norm")), 4).as("sim"))
  topk(scored, 3)
}

// warm everything once
force(flatVariant(false, "")); force(flatVariant(true, "shuffle_hash"))
force(hierVariant("")); force(hierVariant("shuffle_hash"))

val f0 = minOf(3)(force(flatVariant(false, "")))
val f1 = minOf(3)(force(flatVariant(true, "")))
val f2 = minOf(3)(force(flatVariant(true, "shuffle_hash")))
val f3 = minOf(3)(force(flatVariant(true, "shuffle_merge")))
val f4 = minOf(3)(force(flatVariant(false, "shuffle_hash")))
println(f"FLAT prod=$f0%.2f shortcut=$f1%.2f shortcut+hash=$f2%.2f shortcut+merge=$f3%.2f prod+hash=$f4%.2f")
val h0 = minOf(3)(force(hierVariant("")))
val h1 = minOf(3)(force(hierVariant("shuffle_hash")))
val h2 = minOf(3)(force(hierVariant("shuffle_merge")))
println(f"HIER prod=$h0%.2f hash=$h1%.2f merge=$h2%.2f")

// production APIs for reference in the same session
val p0 = minOf(3)(force(Similarity.knnGraph(emb, k = 3, nlist = 16, nprobe = 16, trainFraction = 0.5)))
val p1 = minOf(3)(force(Similarity.knnGraphHier(emb, k = 3, nlist = 16, nprobe = 16, superProbe = 4)))
println(f"PROD flat=$p0%.2f hier=$p1%.2f")

// result identity check (flat variants vs production)
val a = Similarity.knnGraph(emb, k = 3, nlist = 16, nprobe = 16, trainFraction = 0.5)
  .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3))).toSet
val b = flatVariant(true, "shuffle_hash")
  .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3))).toSet
println(s"FLAT identity: ${a == b} (${a.size} rows)")
val c = Similarity.knnGraphHier(emb, k = 3, nlist = 16, nprobe = 16, superProbe = 4)
  .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3))).toSet
val d = hierVariant("shuffle_hash")
  .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3))).toSet
println(s"HIER identity: ${c == d} (${c.size} rows)")
System.exit(0)
