package graft.operators

import graft.operators.Q.t

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Round-9 training-data-curation widening. The flagship here is DSIR
 * (Data Selection via Importance Resampling, Xie et al. 2023,
 * arXiv:2302.03169): score every raw document by how target-like its
 * hashed-n-gram distribution is, so a 100-TB crawl can be resampled
 * toward a high-quality target domain with two cheap aggregate passes
 * — the published, production-standard alternative to training a
 * quality classifier.
 *
 * Exact-oracle regime: importance weights are sums of per-bucket
 * log-likelihood ratios. A naive double sum is
 * accumulation-order-dependent (Spark and DuckDB would disagree in the
 * last ulp), so each bucket's log ratio is quantized ONCE to integer
 * micro-units (round(x*1e6) as BIGINT — both engines derive it from
 * identical integer counts) and the per-document reduction is an
 * integer sum, which is order-independent. The same cents/micros
 * discipline every other statistics gate in this repo uses.
 *
 * Scale shape: documents explode to thin (doc_id, bucket) rows; two
 * hash aggregates build the raw/target bucket histograms (B=1024 rows
 * each — broadcastable at any corpus size); the per-document score is
 * one more hash aggregate over the thin rows after a broadcast join.
 * No shuffle carries document text; the only wide rows are the inputs.
 */
object CurationQueries {

  /** Hashed-n-gram feature buckets (unigram + bigram over the same
    * `[^a-z0-9]+` word split the fingerprint/simhash keys use). */
  private val DsirBuckets = 1024

  /** Thin (doc_id, lang, bucket) rows: one per unigram+bigram occurrence. */
  private def dsirGrams(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents").select(col("doc_id"), col("lang"),
      filter(split(lower(col("text")), "[^a-z0-9]+"), w => w =!= "").as("ws"))
    // bigrams = zip(ws[0..n-2], ws[1..n-1]); slice handles n<2 via greatest(...,0)
    docs.select(col("doc_id"), col("lang"),
      explode(concat(
        col("ws"),
        zip_with(
          expr("slice(ws, 1, greatest(size(ws) - 1, 0))"),
          expr("slice(ws, 2, greatest(size(ws) - 1, 0))"),
          (a, b) => concat(a, lit(" "), b)))).as("g"))
      .select(col("doc_id"), col("lang"),
        pmod(expr("fnv1a64(g)"), lit(DsirBuckets)).as("b"))
  }

  /** DuckDB mirror of [[dsirGrams]] (FNV-1a 64 re-derived in HUGEINT
    * SQL — the same independent arithmetic path `q_fn_hash_expr`
    * differentially tests). */
  private val dsirGramsSql: String = {
    val fnv =
      "list_reduce(list_prepend(CAST(14695981039346656037 AS HUGEINT), " +
        "list_transform(range(1, length(g) + 1), fnv_i -> " +
        "CAST(ascii(substr(g, CAST(fnv_i AS INT), 1)) AS HUGEINT))), " +
        "(fnv_h, fnv_b) -> ((fnv_h - (fnv_h % 256) + " +
        "CAST(xor(CAST(fnv_h % 256 AS BIGINT), CAST(fnv_b AS BIGINT)) AS HUGEINT)) " +
        "* 1099511628211) % 18446744073709551616)"
    s"""toks AS (SELECT doc_id, lang,
             list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
                         w -> w <> '') AS ws
           FROM documents),
        grams AS (SELECT doc_id, lang, g
           FROM toks, UNNEST(list_concat(ws,
             list_transform(range(1, len(ws)),
                            bg_i -> ws[bg_i] || ' ' || ws[bg_i + 1]))) AS ug(g)),
        hashed AS (SELECT doc_id, lang,
             CAST($fnv % $DsirBuckets AS BIGINT) AS b
           FROM grams)"""
  }

  val all: Seq[(String, Q)] = Seq(

    "q_dsir_weights" -> Q(
      // DSIR importance weights: target = lang='en' documents, raw =
      // the whole corpus. Laplace-smoothed hashed-n-gram multinomials;
      // per-bucket log ratio log p_t[b] − log p_r[b] quantized to
      // integer micro-units, per-document weight = integer sum over
      // its n-gram occurrences. High weight ⇒ target-like.
      (s, dir) => {
        val grams = dsirGrams(s, dir)
        val raw = grams.groupBy("b").agg(count(lit(1)).as("rc"))
        val tgt = grams.filter(col("lang") === "en")
          .groupBy("b").agg(count(lit(1)).as("tc"))
        // bucket histogram ≤ 1024 rows regardless of corpus size
        val tot = grams.agg(
          count(lit(1)).as("rt"),
          count(when(col("lang") === "en", 1)).as("tt"))
        val lr = raw.join(tgt, Seq("b"), "left")
          .crossJoin(broadcast(tot))
          .select(col("b"),
            round((log(coalesce(col("tc"), lit(0L)) + lit(1.0))
              - log(col("tt") + lit(DsirBuckets.toDouble))
              - log(col("rc") + lit(1.0))
              + log(col("rt") + lit(DsirBuckets.toDouble))) * lit(1e6))
              .cast("long").as("lrm"))
        grams.join(broadcast(lr), Seq("b"))
          .groupBy("doc_id")
          .agg(count(lit(1)).as("n_grams"), sum("lrm").as("dsir_w_micro"))
          .select("doc_id", "n_grams", "dsir_w_micro")
      },
      Some(s"""WITH $dsirGramsSql,
              raw AS (SELECT b, count(*) AS rc FROM hashed GROUP BY b),
              tgt AS (SELECT b, count(*) AS tc FROM hashed
                      WHERE lang = 'en' GROUP BY b),
              tot AS (SELECT count(*) AS rt,
                             count(*) FILTER (WHERE lang = 'en') AS tt
                      FROM hashed),
              lr AS (SELECT raw.b,
                       CAST(round((ln(coalesce(tc, 0) + 1.0)
                                   - ln(tt + $DsirBuckets.0)
                                   - ln(rc + 1.0)
                                   + ln(rt + $DsirBuckets.0)) * 1000000) AS BIGINT) AS lrm
                     FROM raw LEFT JOIN tgt ON raw.b = tgt.b, tot)
              SELECT doc_id, count(*) AS n_grams,
                     CAST(sum(lrm) AS BIGINT) AS dsir_w_micro
              FROM hashed JOIN lr ON hashed.b = lr.b
              GROUP BY doc_id""")),

    "q_dsir_resample" -> Q(
      // The resampling half of DSIR: keep the top-K documents by
      // importance weight (the deterministic analogue of Gumbel-top-k
      // — the stochastic variant is q_sample_weighted's machinery).
      // Rank = (weight desc, doc_id) so the cut is total-ordered and
      // both engines pick identical survivors.
      (s, dir) => {
        val w = all.collectFirst { case ("q_dsir_weights", q) => q }.get
          .fn(s, dir)
        // distributed top-K (TakeOrderedAndProject) first; the rank
        // window then runs over the bounded 100-row survivor set, never
        // a single-partition pass over the corpus
        val top = w.orderBy(col("dsir_w_micro").desc, col("doc_id")).limit(100)
        top.withColumn("rnk", row_number().over(
            Window.orderBy(col("dsir_w_micro").desc, col("doc_id"))).cast("int"))
          .select("doc_id", "dsir_w_micro", "rnk")
      },
      Some(s"""WITH $dsirGramsSql,
              raw AS (SELECT b, count(*) AS rc FROM hashed GROUP BY b),
              tgt AS (SELECT b, count(*) AS tc FROM hashed
                      WHERE lang = 'en' GROUP BY b),
              tot AS (SELECT count(*) AS rt,
                             count(*) FILTER (WHERE lang = 'en') AS tt
                      FROM hashed),
              lr AS (SELECT raw.b,
                       CAST(round((ln(coalesce(tc, 0) + 1.0)
                                   - ln(tt + $DsirBuckets.0)
                                   - ln(rc + 1.0)
                                   + ln(rt + $DsirBuckets.0)) * 1000000) AS BIGINT) AS lrm
                     FROM raw LEFT JOIN tgt ON raw.b = tgt.b, tot),
              w AS (SELECT doc_id, CAST(sum(lrm) AS BIGINT) AS dsir_w_micro
                    FROM hashed JOIN lr ON hashed.b = lr.b GROUP BY doc_id)
              SELECT doc_id, dsir_w_micro,
                     CAST(row_number() OVER (ORDER BY dsir_w_micro DESC, doc_id)
                          AS INTEGER) AS rnk
              FROM w QUALIFY rnk <= 100"""))
  )
}
