// 100x scale certification (spark-shell -i script; see BENCH_NOTES).
// Builds a 100x corpus whose per-copy word-suffix transform is a word
// BIJECTION: within-copy shingle structure (hence every pair's Jaccard)
// is preserved exactly, and cross-copy word sets are disjoint, so the
// expected verified-pair count at C copies is EXACTLY C x pairs(1x) --
// any super-linearity in pairs or wall time is the PLAN's, not the
// data's. Usage:
//   /opt/spark/bin/spark-shell --master 'local[32]' \
//     --conf spark.sql.shuffle.partitions=32 \
//     --conf spark.sql.extensions=graft.GraftExtensions \
//     --jars target/scala-2.13/duckdbextensionclickhousenativespark_2.13-0.1.0.jar \
//     -i tools/scale100.scala
// Family selection for local iteration (the full run takes ~10min):
//   SPARK_GRAFT_CERT_FAMILIES=semdedup,cc,pq  runs only those rows.
// Families: agg join dedup containment bm25 knn  (round 8)
//           semdedup cc pq spans bpe             (round 9 additions)
// Round 10: streaming state boundedness and storage-maintenance parts
// scaling are certified by spec gates instead of rows here -- see
// StreamingScaleSpec and NativeMaintenanceScaleSpec.
import org.apache.spark.sql.functions._
val sf = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
val famSel = sys.env.get("SPARK_GRAFT_CERT_FAMILIES")
  .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
def fam(name: String): Boolean = famSel.forall(_.contains(name))
val keyShift = 100000000L
def docsAt(copies: Int) = {
  val d = spark.read.parquet(s"$sf/documents.parquet")
  (0 until copies).map { i =>
    val t = if (i == 0) col("text")
      else regexp_replace(col("text"), "(?i)([a-z0-9]+)", "$1q" + i + "z")
    d.select((col("doc_id") + lit(i * keyShift)).as("doc_id"), t.as("text"))
  }.reduce(_ unionByName _)
}
def lineitemAt(copies: Int) = {
  val l = spark.read.parquet(s"$sf/lineitem.parquet")
  (0 until copies).map(i =>
    l.withColumn("l_orderkey", col("l_orderkey") + lit(i * keyShift)))
    .reduce(_ unionByName _)
}
def ordersAt(copies: Int) = {
  val o = spark.read.parquet(s"$sf/orders.parquet")
  (0 until copies).map(i =>
    o.withColumn("o_orderkey", col("o_orderkey") + lit(i * keyShift)))
    .reduce(_ unionByName _)
}
def time(f: => Unit): Double = { val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9 }
def force(df: org.apache.spark.sql.DataFrame): Unit =
  df.queryExecution.toRdd.foreachPartition(it => while (it.hasNext) it.next())
// hypervisor-steal marks (round 12): each family row is followed by a
// HOST line carrying the steal CPU-seconds that elapsed during it, so
// every cert number carries its own quiet-window evidence
def stealSecs(): Double = try {
  val src = scala.io.Source.fromFile("/proc/stat")
  try {
    val f = src.getLines().next().trim.split("\\s+")
    if (f.length > 8) f(8).toLong / 100.0 else 0.0
  } finally src.close()
} catch { case _: Throwable => 0.0 }
var lastSteal = stealSecs()
// Fixed single-thread CPU spin (round 13): one ivfpq cert attempt
// read 550.7 s with only 69.9 CPU-s steal -- a contention mode the
// steal counter under-reads (host memory bandwidth / frequency).
// A deterministic 20M-iteration FNV spin measures EFFECTIVE per-core
// speed directly: quiet-host baseline ~0.02-0.04 s; a slow family row
// with normal spin + low steal is a plan question, slow spin is host
// whatever the steal column says. (Guest PSI cannot see this mode
// either -- bandwidth-starved tasks stay runnable, just slow.)
def spinProbe(): Double = {
  val t0 = System.nanoTime
  var h = 1469598103934665603L
  var i = 0
  while (i < 20000000) { h ^= i; h *= 1099511628211L; i += 1 }
  if (h == 42L) print("")  // defeat dead-code elimination
  (System.nanoTime - t0) / 1e9
}
def hostMark(tag: String): Unit = {
  val s = stealSecs()
  println(f"SCALE100HOST $tag stealDelta=${s - lastSteal}%.1f spin=${spinProbe()}%.3f")
  lastSteal = s
}
println(f"SCALE100HOST baseline spin=${spinProbe()}%.3f")

// warm
force(docsAt(1).select(call_function("fnv1a64", col("text"))))

def agg(c: Int) = lineitemAt(c).groupBy("l_returnflag", "l_linestatus")
  .agg(round(sum(col("l_quantity")), 2).as("sq"), count(lit(1)).as("n"))
def join(c: Int) = lineitemAt(c)
  .join(ordersAt(c), col("l_orderkey") === col("o_orderkey"))
  .groupBy("o_orderpriority")
  .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("rev"))
def dedup(c: Int) = graft.operators.Dedup.minhashPairs(docsAt(c), "doc_id", "text", threshold = 0.5)

// the two heaviest LLM shapes beyond MinHash -- same dissimilar-copy
// discipline (the word bijection preserves intra-copy containment
// structure verbatim; cross-copy word sets are disjoint), so expected
// containment pairs at 100x = exactly 100 x pairs(1x)
def containment(c: Int) = graft.operators.Dedup
  .containmentPairsExact(docsAt(c), "doc_id", "text", theta = 0.9)
// fixed query-term set while the corpus grows (how retrieval scales):
// the measured cost is the pre-shuffle corpus tokenize+filter pass
def bm25(c: Int) = graft.operators.TextPipeline.bm25TopK(
  docsAt(c), "doc_id", "text", Seq("dup", "merge", "window"), k = 10)

// ANN at 100x: the corpus-vs-corpus kNN graph in the APPROXIMATE
// production regime (sampled 5-iteration quantizer, nlist prop. to N keeps
// per-cell size constant, fixed nprobe) -- candidate pairs grow
// linearly by construction; the measured wall is the encode argmin +
// the per-cell pair scoring. Copies rotate the vector by i dims
// (intra-copy structure preserved, copies mutually background-similar).
def embAt(c: Int) = {
  val e = spark.read.parquet(s"$sf/embeddings.parquet")
  (0 until c).map { i =>
    val emb = if (i == 0) col("embedding")
      else concat(slice(col("embedding"), i % 64 + 1, 64 - i % 64),
        slice(col("embedding"), 1, i % 64))
    e.select((col("vec_id") + lit(i * keyShift)).as("vec_id"), emb.as("embedding"))
  }.reduce(_ unionByName _)
}
// FLAT form kept for the record: measured ratio 152 at 100x (the
// O(N x nlist) encode argmin + probe-ranking window with nlist prop.
// to N -- the quadratic the cert caught; BENCH_NOTES). The TWO-LEVEL
// router (knnGraphHier) is the fix this cert now watches.
def knnFlat(c: Int) = graft.operators.Similarity.knnGraph(
  embAt(c), k = 3, nlist = 16 * c, nprobe = 4, trainFraction = 0.5)
def knn(c: Int) = graft.operators.Similarity.knnGraphHier(
  embAt(c), k = 3, nlist = 16 * c, nprobe = 4, superProbe = 2,
  trainCap = math.max(100000, 16 * c))

// ROUND-9 ADDITIONS (verdict item 2): the three uncertified heavy
// families -- SemDeDup, connected-components clustering, and the
// IVF-PQ training/encode path.

// SemDeDup at 100x: cluster = (label, copy) -- cluster COUNT scales
// with the data (the paper's own knob: per-cluster size, hence the
// by-design within-cluster pair cost, stays constant). Copies rotate
// the vector by i%64 dims; rotation is a uniform permutation of both
// sides of every within-copy pair, so dot products are preserved up
// to IEEE summation order and the 4dp rounding regime makes every
// within-copy verdict identical across copies. The natural corpus has
// ZERO >=eps pairs (probed at eps 0.85-0.95), so each copy also gets
// 50 EXACT duplicates of its first 50 vectors (same cluster, higher
// id): cosine 1 kills exactly the duplicate via the equal-cent_sim
// id tiebreak => expected dropped rows at C copies = EXACTLY 50*C --
// a nonzero, exactly-linear verdict instrument.
def embClustered(c: Int) = {
  val e = spark.read.parquet(s"$sf/embeddings.parquet")
  (0 until c).map { i =>
    val emb = if (i == 0) col("embedding")
      else concat(slice(col("embedding"), i % 64 + 1, 64 - i % 64),
        slice(col("embedding"), 1, i % 64))
    val copy = e.select((col("vec_id") + lit(i * keyShift)).as("vec_id"),
      concat_ws("_", col("label").cast("string"), lit(i)).as("cluster"),
      emb.as("embedding"))
    val dups = e.filter(col("vec_id") < 50)
      .select((col("vec_id") + lit(i * keyShift) + lit(50000000L)).as("vec_id"),
        concat_ws("_", col("label").cast("string"), lit(i)).as("cluster"),
        emb.as("embedding"))
    copy.unionByName(dups)
  }.reduce(_ unionByName _)
}
def semdedup(c: Int) = graft.operators.Dedup.semDeDup(
  embClustered(c), "vec_id", "embedding", "cluster", eps = 0.95)

// Connected components at 100x: edges = the MinHash candidate pairs
// of the Cx corpus, MATERIALIZED OUTSIDE the timed window
// (localCheckpoint + count) so the cert isolates the clustering cost
// from pair generation (certified separately above). Copies are
// disjoint components with the 1x diameters, so the round count must
// be EQUAL at 1x and 100x -- per-round cost is two shuffle joins over
// the edge set, making total wall  prop. to  edges x rounds.
def ccPairs(c: Int) = graft.operators.Dedup
  .minhashPairs(docsAt(c), "doc_id", "text", threshold = 0.5)
  .select("id_a", "id_b").localCheckpoint()

// IVF-PQ train+encode+serve at 100x, production regime: sampled
// codebook (ksub fixed => encode argmin O(N*ksub) = linear; the
// codebook train pass is the two-stage bounded window over distinct
// subvectors, linear), hierRouting (the O(sqrt nlist)/row router -- the
// flat argmin is quadratic under nlist  prop. to  N, the round-8 catch),
// FIXED query set while the corpus grows (how serving scales).
def ivfpq(c: Int) = graft.operators.Similarity.ivfPqTopK(
  embAt(c).select(col("vec_id"), col("embedding")),
  embAt(1).select(col("vec_id"), col("embedding")).filter(col("vec_id") < 20),
  k = 10, nlist = 16 * c, nprobe = 4, m = 4,
  codebook = null, lossless = false, trainFraction = 0.5,
  hierRouting = true)
// The isolated codebook train pass (the corpus-proportional half of
// the PQ pipeline), certified on its own so an encode/probe fix can
// never mask a train-pass blowup.
def pqTrain(c: Int) = graft.operators.Similarity.pqCodebookSampled(
  embAt(c).select(col("vec_id"), col("embedding")), m = 4, dim = 64)

if (fam("agg") || fam("join")) {
  spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // pin one strategy across both points
  if (fam("agg")) {
    val tAgg1 = (1 to 2).map(_ => time(force(agg(1)))).min
    val tAgg100 = (1 to 2).map(_ => time(force(agg(100)))).min
    println(f"SCALE100 agg: 1x=$tAgg1%.2f 100x=$tAgg100%.2f ratio=${tAgg100 / tAgg1}%.1f")
  hostMark("agg")
  }
  if (fam("join")) {
    val tJoin1 = (1 to 2).map(_ => time(force(join(1)))).min
    val tJoin100 = (1 to 2).map(_ => time(force(join(100)))).min
    println(f"SCALE100 join: 1x=$tJoin1%.2f 100x=$tJoin100%.2f ratio=${tJoin100 / tJoin1}%.1f")
  hostMark("join")
  }
  spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
}
if (fam("dedup")) {
  val p1 = dedup(1).count()
  val tDedup1 = (1 to 2).map(_ => time(force(dedup(1)))).min
  System.gc()
  val t0 = System.nanoTime()
  val p100 = dedup(100).count()
  val tDedup100 = (System.nanoTime() - t0) / 1e9
  // CANDIDATE pairs (pre-verification, round 11): the LSH banding
  // join's output -- the quantity that actually explodes if banding
  // degenerates; verified pairs alone can stay linear while the
  // candidate set goes quadratic upstream of the verify filter
  val c1 = graft.operators.Dedup.minhashCandidates(docsAt(1), "doc_id", "text").count()
  val c100 = graft.operators.Dedup.minhashCandidates(docsAt(100), "doc_id", "text").count()
  println(f"SCALE100 dedup: 1x=$tDedup1%.2f 100x=$tDedup100%.2f ratio=${tDedup100 / tDedup1}%.1f pairs1=$p1 pairs100=$p100 pairRatio=${p100.toDouble / p1}%.1f cand1=$c1 cand100=$c100 candRatio=${c100.toDouble / c1}%.1f")
  hostMark("dedup")
}
if (fam("containment")) {
  val pc1 = containment(1).count()
  val tCont1 = (1 to 2).map(_ => time(force(containment(1)))).min
  System.gc()
  val tc0 = System.nanoTime()
  val pc100 = containment(100).count()
  val tCont100 = (System.nanoTime() - tc0) / 1e9
  println(f"SCALE100 containment: 1x=$tCont1%.2f 100x=$tCont100%.2f ratio=${tCont100 / tCont1}%.1f pairs1=$pc1 pairs100=$pc100 pairRatio=${pc100.toDouble / pc1}%.1f")
  hostMark("containment")
}
if (fam("bm25")) {
  val tBm1 = (1 to 2).map(_ => time(force(bm25(1)))).min
  System.gc()
  val tBm100 = time(force(bm25(100)))
  // candidate postings after the term filter (round 12): the word
  // bijection renames every copy's words, so the FIXED query terms
  // match only copy 0 -- expected candRatio = 1.0 (per-query serving
  // cost stays corpus-independent); a growing count means the term
  // filter stopped running before the shuffle
  val cb1 = graft.operators.TextPipeline.bm25Candidates(
    docsAt(1), "doc_id", "text", Seq("dup", "merge", "window")).count()
  val cb100 = graft.operators.TextPipeline.bm25Candidates(
    docsAt(100), "doc_id", "text", Seq("dup", "merge", "window")).count()
  println(f"SCALE100 bm25: 1x=$tBm1%.2f 100x=$tBm100%.2f ratio=${tBm100 / tBm1}%.1f cand1=$cb1 cand100=$cb100 candRatio=${cb100.toDouble / cb1}%.2f")
  hostMark("bm25")
}
if (fam("knn")) {
  val tKnn1 = (1 to 2).map(_ => time(force(knn(1)))).min
  System.gc()
  val tKnn100 = time(force(knn(100)))
  // probed-cell candidate pairs (round 12): nlist prop. to N with
  // fixed nprobe keeps per-cell size ~constant => expected ~100x;
  // deterministic (hash-ranked train sample + seeded Lloyd), so this
  // certifies linearity even when the wall number is storm-inflated
  val ck1 = graft.operators.Similarity.knnGraphHierCandidates(
    embAt(1), nlist = 16, nprobe = 4, superProbe = 2, trainCap = 100000).count()
  val ck100 = graft.operators.Similarity.knnGraphHierCandidates(
    embAt(100), nlist = 1600, nprobe = 4, superProbe = 2, trainCap = 100000).count()
  println(f"SCALE100 knn_hier: 1x=$tKnn1%.2f 100x=$tKnn100%.2f ratio=${tKnn100 / tKnn1}%.1f cand1=$ck1 cand100=$ck100 candRatio=${ck100.toDouble / ck1}%.1f")
  hostMark("knn_hier")
}
if (fam("semdedup")) {
  val d1 = semdedup(1).filter(!col("kept")).count()
  val tSd1 = (1 to 2).map(_ => time(force(semdedup(1)))).min
  System.gc()
  val ts0 = System.nanoTime()
  val d100 = semdedup(100).filter(!col("kept")).count()
  val tSd100 = (System.nanoTime() - ts0) / 1e9
  // rank-join candidate pairs (round 12): the by-design within-cluster
  // work, exactly sum c*(c-1)/2 -- per-copy cluster structure is
  // preserved verbatim => expected candRatio exactly 100.0
  val cs1 = graft.operators.Dedup.semDeDupCandidates(
    embClustered(1), "vec_id", "embedding", "cluster").count()
  val cs100 = graft.operators.Dedup.semDeDupCandidates(
    embClustered(100), "vec_id", "embedding", "cluster").count()
  println(f"SCALE100 semdedup: 1x=$tSd1%.2f 100x=$tSd100%.2f ratio=${tSd100 / tSd1}%.1f dropped1=$d1 dropped100=$d100 dropRatio=${d100.toDouble / d1}%.1f cand1=$cs1 cand100=$cs100 candRatio=${cs100.toDouble / cs1}%.1f")
  hostMark("semdedup")
}
if (fam("cc")) {
  val e1 = ccPairs(1); val n1 = e1.count()   // materialize outside the window
  val (l1, r1) = graft.operators.DedupClusters.assignWithRounds(e1)
  val tCc1 = (1 to 2).map(_ => time(force(
    graft.operators.DedupClusters.assign(e1)))).min
  val e100 = ccPairs(100); val n100 = e100.count()
  System.gc()
  val tcc0 = System.nanoTime()
  val (l100, r100) = graft.operators.DedupClusters.assignWithRounds(e100)
  val c100 = l100.count()
  val tCc100 = (System.nanoTime() - tcc0) / 1e9
  println(f"SCALE100 cc: 1x=$tCc1%.2f 100x=$tCc100%.2f ratio=${tCc100 / tCc1}%.1f edges1=$n1 edges100=$n100 rounds1=$r1 rounds100=$r100 nodes100=$c100")
  hostMark("cc")
}
// Span dedup (ExactSubstr) at 100x: the word bijection keeps each
// copy's w-token segment TEXTS disjoint from every other copy's, so
// per-copy first-occurrence structure is preserved verbatim =>
// sum(n_seg) and sum(n_kept) at C copies = EXACTLY C x the 1x sums.
// Plan is two thin shuffles (segment min-occurrence agg + doc
// reassembly agg) -- the wall ratio watches those staying linear.
def spans(c: Int) = graft.operators.Dedup.spanDedup(docsAt(c), "doc_id", "text", w = 8)
if (fam("spans")) {
  val s1 = spans(1).agg(sum("n_seg"), sum("n_kept")).head()
  val tSp1 = (1 to 2).map(_ => time(force(spans(1)))).min
  System.gc()
  val tsp0 = System.nanoTime()
  val s100 = spans(100).agg(sum("n_seg"), sum("n_kept")).head()
  val tSp100 = (System.nanoTime() - tsp0) / 1e9
  println(f"SCALE100 spans: 1x=$tSp1%.2f 100x=$tSp100%.2f ratio=${tSp100 / tSp1}%.1f seg1=${s1.getLong(0)} seg100=${s100.getLong(0)} kept1=${s1.getLong(1)} kept100=${s100.getLong(1)} segRatio=${s100.getLong(0).toDouble / s1.getLong(0)}%.1f keptRatio=${s100.getLong(1).toDouble / s1.getLong(1)}%.1f")
  hostMark("spans")
}
// BPE trainer at 100x: numMerges FIXED while the corpus grows -- the
// batched top-M counting keeps the distributed pass count a function
// of merges (not corpus), so wall must scale with the corpus
// word-count pass alone. (The per-copy word suffixes change which
// pairs win, but not the pass structure or per-pass cost shape.)
def bpe(c: Int) = graft.operators.TextPipeline.bpeMerges(docsAt(c), "doc_id", "text", numMerges = 12)
if (fam("bpe")) {
  val tBp1 = (1 to 2).map(_ => time(force(bpe(1)))).min
  System.gc()
  val tBp100 = time(force(bpe(100)))
  println(f"SCALE100 bpe: 1x=$tBp1%.2f 100x=$tBp100%.2f ratio=${tBp100 / tBp1}%.1f")
  hostMark("bpe")
}
if (fam("pq")) {
  val tPt1 = (1 to 2).map(_ => time(force(pqTrain(1)))).min
  System.gc()
  val tPt100 = time(force(pqTrain(100)))
  println(f"SCALE100 pq_train: 1x=$tPt1%.2f 100x=$tPt100%.2f ratio=${tPt100 / tPt1}%.1f")
  hostMark("pq_train")
  val tPq1 = (1 to 2).map(_ => time(force(ivfpq(1)))).min
  System.gc()
  val tPq100 = time(force(ivfpq(100)))
  // probe-x-cell candidate rows over the FIXED 20-query set (round
  // 12, the verdict's "ivfpq cert rests on wall alone" fix): nlist
  // prop. to N keeps per-cell size ~constant => expected candRatio
  // ~1.0; deterministic, so the serving-cost certification survives
  // any host weather the wall row absorbs
  val cq1 = graft.operators.Similarity.ivfPqCandidates(
    embAt(1).select(col("vec_id"), col("embedding")),
    embAt(1).select(col("vec_id"), col("embedding")).filter(col("vec_id") < 20),
    nlist = 16, nprobe = 4, trainFraction = 0.5, hierRouting = true).count()
  val cq100 = graft.operators.Similarity.ivfPqCandidates(
    embAt(100).select(col("vec_id"), col("embedding")),
    embAt(1).select(col("vec_id"), col("embedding")).filter(col("vec_id") < 20),
    nlist = 1600, nprobe = 4, trainFraction = 0.5, hierRouting = true).count()
  println(f"SCALE100 ivfpq: 1x=$tPq1%.2f 100x=$tPq100%.2f ratio=${tPq100 / tPq1}%.1f cand1=$cq1 cand100=$cq100 candRatio=${cq100.toDouble / cq1}%.2f")
  hostMark("ivfpq")
}
System.exit(0)
