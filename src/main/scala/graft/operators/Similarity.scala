package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Approximate-nearest-neighbour / similarity search over an embedding
 * column (SURVEY §2.12).
 *
 * Two tiers, per the brief:
 *  - [[bruteForceTopK]] — exact baseline: broadcast the (small) query
 *    set against every vector, codegen'd higher-order-function dot
 *    products, per-query top-k via ranking window. Oracle-checkable.
 *  - [[lshTopK]] — the 100-TB path: sign-random-projection buckets;
 *    candidates shuffle once on bucket id and only bucket-local pairs
 *    are scored. Multi-probe (hamming<=r neighbouring buckets) trades
 *    compute for recall; recall is property-tested against brute force.
 */
object Similarity {

  /**
   * Elementwise dot product of two numeric-array columns, in double:
   * the codegen'd [[graft.functions.VecDot]] expression (registered as
   * `vec_dot` by [[graft.GraftExtensions]] — sessions must enable it
   * via spark.sql.extensions). Bit-identical to the higher-order
   * `aggregate(zip_with(...))` form it replaces (same element order,
   * same double arithmetic) but with no per-row intermediate array;
   * mismatched lengths throw instead of null-padding.
   */
  def dotD(a: Column, b: Column): Column = call_function("vec_dot", a, b)

  /** Cosine similarity dot/(|a|*|b|) — same formula the oracle uses. */
  def cosine(a: Column, b: Column): Column =
    dotD(a, b) / (sqrt(dotD(a, a)) * sqrt(dotD(b, b)))

  /**
   * Exact top-k neighbours for each query vector.
   * The query side MUST be small (it is broadcast to every executor);
   * the candidate side streams — no shuffle of the big table at all,
   * the ranking window shuffles only (q_id, candidate, sim) tuples.
   */
  def bruteForceTopK(candidates: DataFrame, queries: DataFrame, k: Int): DataFrame = {
    val joined = candidates.select(col("vec_id"), col("embedding"))
      .crossJoin(broadcast(queries.select(
        col("vec_id").as("q_id"), col("embedding").as("q_emb"))))
      .filter(col("vec_id") =!= col("q_id"))
      .select(col("q_id"), col("vec_id"),
        round(cosine(col("embedding"), col("q_emb")), 4).as("sim"))
    val w = Window.partitionBy("q_id").orderBy(col("sim").desc, col("vec_id"))
    joined.select(col("q_id"), col("vec_id"), col("sim"), row_number().over(w).as("rn"))
      .filter(col("rn") <= k)
  }

  /** Deterministic pseudo-random hyperplane component (unit-free sign test). */
  private def planeComponent(plane: Int, dim: Int): Double = {
    val h = graft.functions.TextHash.splitmix64(plane.toLong * 131071L + dim)
    // map to (-1, 1) uniformly
    (h >>> 11).toDouble / (1L << 53).toDouble * 2.0 - 1.0
  }

  /**
   * Sign-random-projection bucket id (`planes`-bit code) for an
   * embedding column. `table` selects an independent plane family
   * (multi-table LSH); rows whose embedding length differs from `dim`
   * raise instead of silently hashing to a junk bucket (zip_with would
   * null-pad and every plane test would go null).
   */
  def srpBucket(emb: Column, planes: Int, dim: Int, table: Int = 0): Column = {
    val bits = (0 until planes).map { p =>
      val planeArr = array((0 until dim).map(d => lit(planeComponent(table * planes + p, d))): _*)
      when(dotD(emb, planeArr) >= 0.0, lit(1L << p)).otherwise(lit(0L))
    }
    when(size(emb) === dim, bits.reduce(_ + _))
      .otherwise(raise_error(concat(
        lit(s"srpBucket: embedding dimension != $dim for this LSH family: found "),
        size(emb).cast("string"))).cast("long"))
  }

  /** Embedding width taken from the data (first row) when the caller doesn't pass one. */
  private[operators] def deriveDim(df: DataFrame, embCol: String): Int =
    df.select(size(col(embCol))).head().getInt(0)

  /**
   * IVF (inverted-file) approximate top-k: a KMeans coarse quantizer
   * (trained once, deterministic seed) assigns every candidate to its
   * nearest centroid; a query scores only the candidates in its
   * `nprobe` closest cells. The big table shuffles once on the cell
   * id; the centroid table (nlist rows) broadcasts. This is the
   * classic IVF-Flat layout — at 100 TB the cells become partition
   * keys and each query touches nprobe/nlist of the data.
   */
  def ivfTopK(candidates: DataFrame, queries: DataFrame, k: Int,
      nlist: Int = 16, nprobe: Int = 4, trainFraction: Double = 1.0): DataFrame = {
    import org.apache.spark.ml.clustering.KMeans
    import org.apache.spark.ml.functions.array_to_vector
    import org.apache.spark.ml.linalg.Vector

    require(trainFraction > 0.0 && trainFraction <= 1.0,
      s"ivfTopK trainFraction=$trainFraction outside (0, 1]")
    val withVec = candidates.select(col("vec_id"), col("embedding"))
      .withColumn("features", array_to_vector(col("embedding")))
    // Random init, few iterations: the coarse quantizer only partitions
    // space into nlist cells — k-means|| init costs ~5 extra full passes
    // and buys nothing measurable for ANN recall at this granularity.
    // trainFraction < 1 fits the quantizer on a seeded sample — at
    // 100 TB the train pass must be bounded (a cell layout learned from
    // a few hundred vectors per cell is as good for ANN routing as one
    // learned from the full corpus); assignment still covers every row.
    val trainRows =
      if (trainFraction >= 1.0) withVec
      else withVec.sample(withReplacement = false, trainFraction, seed = 42L)
    val model = new KMeans().setK(nlist).setSeed(42L).setMaxIter(5)
      .setInitMode("random")
      .fit(trainRows.select("features"))
    val cand = model.transform(withVec)
      .select(col("vec_id"), col("embedding"), col("prediction").as("cell"))

    // nprobe nearest cells per query, via the broadcast centroid table
    val centroids = model.clusterCenters.zipWithIndex.map { case (c, i) =>
      (i, c.toArray.map(_.toFloat))
    }
    val centroidDf = queries.sparkSession.createDataFrame(centroids.toSeq)
      .toDF("cell", "centroid")
    val q = queries.select(col("vec_id").as("q_id"), col("embedding").as("q_emb"))
    val probes = q.crossJoin(broadcast(centroidDf))
      .withColumn("dist", -cosine(col("q_emb"), col("centroid")))
      .withColumn("cell_rank", row_number().over(
        Window.partitionBy("q_id").orderBy(col("dist"), col("cell"))))
      .filter(col("cell_rank") <= nprobe)
      .select("q_id", "q_emb", "cell")

    val scored = cand.join(broadcast(probes), "cell")
      .filter(col("vec_id") =!= col("q_id"))
      .select(col("q_id"), col("vec_id"),
        round(cosine(col("embedding"), col("q_emb")), 4).as("sim"))
    val w = Window.partitionBy("q_id").orderBy(col("sim").desc, col("vec_id"))
    scored.select(col("q_id"), col("vec_id"), col("sim"), row_number().over(w).as("rn"))
      .filter(col("rn") <= k)
  }

  /**
   * LSH-bucketed approximate top-k: candidates hash to one bucket;
   * each query probes every bucket within hamming distance
   * `probeRadius` of its own code. The (query × bucket-code) expansion
   * is tiny (2^planes codes max) — the big table shuffles once.
   */
  def lshTopK(candidates: DataFrame, queries: DataFrame, k: Int,
      planes: Int = 8, probeRadius: Int = 3, dim: Int = -1): DataFrame = {
    // dim <= 0 → read the width off the data (one-row driver probe);
    // a mismatched row then fails fast inside srpBucket
    val d = if (dim > 0) dim else deriveDim(candidates, "embedding")
    val cand = candidates.select(col("vec_id"), col("embedding"))
      .withColumn("bucket", srpBucket(col("embedding"), planes, d))
    val q = queries.select(col("vec_id").as("q_id"), col("embedding").as("q_emb"))
      .withColumn("q_bucket", srpBucket(col("q_emb"), planes, d))
    // distinct occupied buckets = at most 2^planes rows of metadata
    val buckets = cand.select(col("bucket")).distinct()
    val probes = q.crossJoin(broadcast(buckets))
      .filter(Dedup.hammingCol(col("q_bucket"), col("bucket")) <= probeRadius)
    val scored = cand.join(broadcast(probes), "bucket")
      .filter(col("vec_id") =!= col("q_id"))
      .select(col("q_id"), col("vec_id"),
        round(cosine(col("embedding"), col("q_emb")), 4).as("sim"))
    val w = Window.partitionBy("q_id").orderBy(col("sim").desc, col("vec_id"))
    scored.select(col("q_id"), col("vec_id"), col("sim"), row_number().over(w).as("rn"))
      .filter(col("rn") <= k)
  }
}
