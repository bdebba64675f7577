package graft.operators

import graft.operators.Q.t

import org.apache.spark.sql.functions._

/**
 * §2.12 north-star LLM-data-pipeline operators over the `documents`
 * and `embeddings` tables. Oracle-backed where the semantics are
 * ANSI-SQL-expressible; the sketch-based ops (minhash/simhash/LSH) are
 * declared without oracle (driver records a rows-only check) and are
 * property-tested against brute force in LlmOpsSpec.
 *
 * Regex note: patterns are restricted to syntax with identical
 * semantics in Java regex (Spark) and RE2 (DuckDB): explicit classes,
 * alternation, \b, \s.
 */
object LlmQueries {

  private val punctRe = "[.,;:!?]"
  private val tokenRe = "[A-Za-z0-9]+|[^A-Za-z0-9\\s]"
  private val enRe = "\\b(the|and|of|to|a)\\b"
  private val deRe = "\\b(der|und|die|das|ist)\\b"
  private val esRe = "\\b(el|la|de|que|y)\\b"

  /**
   * Known-duplicate corpus for the oracle-gated dedup keys: the
   * documents table plus an id-shifted verbatim copy of every 10th
   * document (the same construction q_dedup_embedding uses). Identical
   * texts hash to identical MinHash/SimHash signatures, so they collide
   * in EVERY band/slice — recall for exact duplicates is 1.0 by
   * construction and the sketch pipeline's output on this corpus is
   * deterministic and SQL-expressible. The general near-duplicate
   * regime (thresholds < 1, where recall is probabilistic) stays
   * property-tested in LlmOpsSpec.
   */
  private[operators] def dupCorpus(s: org.apache.spark.sql.SparkSession, dir: String) = {
    val docs = t(s, dir, "documents").select(col("doc_id"), col("text"))
    docs.unionByName(docs.filter(col("doc_id") % 10 === 0)
      .select((col("doc_id") + 1000000).as("doc_id"), col("text")))
  }

  private[operators] val dupCorpusSql =
    """(SELECT doc_id, text FROM documents
        UNION ALL
        SELECT doc_id + 1000000 AS doc_id, text FROM documents
        WHERE doc_id % 10 = 0)"""

  /**
   * The shared CTE prefix of the BPE oracles, generated per step
   * count: chained CTEs, one block per merge round, each recomputing
   * pair counts over the token rows, picking the (cnt desc, lhs, rhs)
   * argmax, and applying the merge with the run/rank selection
   * equivalent to the greedy left-to-right fold (see
   * TextPipeline.bpeMerges). Ends after t{numMerges+1}, the final
   * segmentation — the merges and encode oracles add their own final
   * SELECT.
   */
  private def bpeOracleSql(numMerges: Int): String = {
    val steps = (1 to numMerges).map { k =>
      s"""pairs$k AS (SELECT lhs, rhs, CAST(sum(freq) AS BIGINT) AS cnt FROM (
              SELECT word, freq, tok AS lhs,
                     lead(tok) OVER (PARTITION BY word ORDER BY pos) AS rhs
              FROM t$k) WHERE rhs IS NOT NULL GROUP BY lhs, rhs),
          best$k AS (SELECT $k AS step, lhs, rhs, cnt FROM pairs$k
                     ORDER BY cnt DESC, lhs, rhs LIMIT 1),
          cr$k AS (SELECT word, pos FROM (
              SELECT word, pos, tok = (SELECT lhs FROM best$k) AND
                     lead(tok) OVER (PARTITION BY word ORDER BY pos)
                       = (SELECT rhs FROM best$k) AS c
              FROM t$k) WHERE c),
          runs$k AS (SELECT word, pos,
                     pos - row_number() OVER (PARTITION BY word ORDER BY pos) AS run
                     FROM cr$k),
          sel$k AS (SELECT word, pos FROM (
              SELECT word, pos,
                     row_number() OVER (PARTITION BY word, run ORDER BY pos) AS rk
              FROM runs$k) WHERE rk % 2 = 1),
          t${k + 1} AS (SELECT word, freq,
                     row_number() OVER (PARTITION BY word ORDER BY pos) AS pos, tok
              FROM (
                SELECT t.word, t.freq, t.pos,
                       CASE WHEN s.pos IS NOT NULL
                            THEN t.tok || (SELECT rhs FROM best$k)
                            ELSE t.tok END AS tok,
                       CASE WHEN p.pos IS NOT NULL THEN 1 ELSE 0 END AS dropped
                FROM t$k t
                LEFT JOIN sel$k s ON t.word = s.word AND t.pos = s.pos
                LEFT JOIN sel$k p ON t.word = p.word AND t.pos = p.pos + 1)
              WHERE dropped = 0)"""
    }.mkString(",\n")
    s"""WITH wf AS (SELECT word, count(*) AS freq FROM (
            SELECT unnest(list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
                          w -> w <> '')) AS word FROM documents) GROUP BY word),
        t1 AS (SELECT word, freq, i AS pos,
                      substring(word, CAST(i AS INTEGER), 1) AS tok
               FROM wf, unnest(range(1, length(word) + 1)) AS u(i)),
        $steps"""
  }

  /** q_bpe_merges: the learned rules themselves. */
  private def bpeMergesOracleSql(numMerges: Int): String =
    s"""${bpeOracleSql(numMerges)}
        SELECT step, lhs, rhs, cnt FROM (
          ${(1 to numMerges).map(k => s"SELECT * FROM best$k").mkString(" UNION ALL ")})"""

  /** q_bpe_encode: per-document word and BPE-token counts using the
    * final segmentation table t{numMerges+1}. */
  private def bpeEncodeOracleSql(numMerges: Int): String =
    s"""${bpeOracleSql(numMerges)},
        wc AS (SELECT word, count(*) AS n_tok
               FROM t${numMerges + 1} GROUP BY word),
        dw AS (SELECT doc_id, unnest(list_filter(
                 string_split_regex(lower(text), '[^a-z0-9]+'),
                 w -> w <> '')) AS word FROM documents)
        SELECT doc_id, count(*) AS n_words,
               CAST(sum(n_tok) AS BIGINT) AS n_bpe_tokens
        FROM dw JOIN wc USING (word) GROUP BY doc_id"""

  /**
   * The q_embed_classify oracle, generated per embedding width: the
   * centroid CTE (same fixed-point arithmetic as q_embed_centroids),
   * centroid components collected in dimension order, and the
   * distance written as an EXPLICIT left-associated term sum so its
   * floating-point association matches the Spark side's ordered fold
   * exactly (Spark's leading 0D + t1 equals t1 under IEEE — both
   * operands non-negative).
   */
  private def classifyOracleSql(dim: Int): String = {
    val terms = (1 to dim).map(d =>
      s"(CAST(embedding[$d] AS DOUBLE) - c[$d]) * (CAST(embedding[$d] AS DOUBLE) - c[$d])")
      .mkString("\n                   + ")
    s"""WITH c0 AS (SELECT label, CAST(i - 1 AS INTEGER) AS dim,
                count(*) AS n_vecs,
                CAST(sum(CAST(floor(CAST(embedding[CAST(i AS INTEGER)] AS DOUBLE)
                                    * 1048576) AS BIGINT)) AS BIGINT) AS sum_fp
              FROM embeddings, unnest(range(1, len(embedding) + 1)) AS u(i)
              GROUP BY label, dim),
         cent AS (SELECT label AS c_label,
                list(CAST(sum_fp AS DOUBLE) / (1048576.0 * n_vecs) ORDER BY dim) AS c
              FROM c0 GROUP BY label),
         scored AS (SELECT e.vec_id, e.label, cent.c_label,
                $terms AS dist
              FROM embeddings e CROSS JOIN cent)
         SELECT vec_id, label, c_label AS pred_label FROM scored
         QUALIFY row_number() OVER (PARTITION BY vec_id ORDER BY dist, c_label) = 1"""
  }

  /**
   * Confirm candidate pairs as EXACT duplicates by content-hash
   * equality — a fixed-width compare instead of shipping full text
   * through the verify join (the md5 collision risk is ~2^-64 at any
   * realistic corpus size, the same trust q_dedup_exact places in a
   * text groupBy key).
   */
  private def confirmExact(corpus: org.apache.spark.sql.DataFrame,
      cands: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    val fp = corpus.select(col("doc_id"), md5(col("text").cast("binary")).as("h"))
    cands
      .join(fp.select(col("doc_id").as("id_a"), col("h").as("h_a")), "id_a")
      .join(fp.select(col("doc_id").as("id_b"), col("h").as("h_b")), "id_b")
      .filter(col("h_a") === col("h_b"))
      .drop("h_a", "h_b")
  }

  /**
   * Exact per-query cosine top-10 in SQL — the oracle for
   * q_sim_cosine_topk and for the exhaustive-probe configurations of
   * the IVF and LSH keys (which are provably result-identical to brute
   * force — see the key comments).
   */
  /** The integer-regime BM25 CTE stack over `documents` for query
    * {dup, merge, window}, up to the per-(doc, term) score `sc` — ONE
    * definition shared by every BM25-family oracle (q_bm25_topk,
    * q_bm25_index_persist, q_rank_fusion's lexical list) so the
    * floor-division arithmetic can never silently diverge between
    * them. All arithmetic is BIGINT floor division (DuckDB `//` ≡
    * Spark `div` on the all-positive operands). */
  private val bm25Ctes =
    """toks AS (SELECT doc_id, list_filter(
              string_split_regex(lower(text), '[^a-z0-9]+'),
              w -> w <> '') AS ws FROM documents),
       nz AS (SELECT doc_id, ws, CAST(len(ws) AS BIGINT) AS dl
            FROM toks WHERE len(ws) > 0),
       stats AS (SELECT count(*) AS n_docs,
                (sum(dl) * 1000) // count(*) AS avgdl_milli FROM nz),
       tf AS (SELECT doc_id, dl, term, count(*) AS tf
            FROM (SELECT doc_id, dl, unnest(ws) AS term FROM nz)
            WHERE term IN ('dup', 'merge', 'window')
            GROUP BY doc_id, dl, term),
       dfreq AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
       sc AS (SELECT tf.doc_id,
                ((n_docs * 1000) // df) *
                  ((tf.tf * 2200 * 1000) //
                   (tf.tf * 1000 +
                    (1200 * (250 + (750 * dl * 1000) // avgdl_milli)) // 1000))
                  AS part_micro
              FROM tf JOIN dfreq USING (term) CROSS JOIN stats)"""

  /** Full BM25 top-10 — q_bm25_topk (direct) and q_bm25_index_persist
    * (served from the persisted inverted index), provably
    * result-identical. */
  private val bm25Sql =
    s"""WITH $bm25Ctes,
       agg AS (SELECT doc_id, count(*) AS n_terms_hit,
                CAST(sum(part_micro) AS BIGINT) AS bm25_micro
              FROM sc GROUP BY doc_id)
       SELECT doc_id, n_terms_hit, bm25_micro,
              CAST(row_number() OVER (ORDER BY bm25_micro DESC, doc_id)
                AS INTEGER) AS rank
       FROM agg QUALIFY rank <= 10"""

  private val bruteForceTopKSql =
    """WITH q AS (SELECT vec_id AS q_id,
              list_transform(embedding, x -> CAST(x AS DOUBLE)) AS qd
              FROM embeddings WHERE vec_id < 5),
            c AS (SELECT vec_id,
              list_transform(embedding, x -> CAST(x AS DOUBLE)) AS ed
              FROM embeddings),
            s AS (SELECT q_id, vec_id,
              round(list_dot_product(ed, qd) /
                (sqrt(list_dot_product(ed, ed)) * sqrt(list_dot_product(qd, qd))), 4) AS sim
              FROM c, q WHERE c.vec_id != q.q_id)
       SELECT q_id, vec_id, sim,
              CAST(row_number() OVER (PARTITION BY q_id ORDER BY sim DESC, vec_id) AS INTEGER) AS rn
       FROM s QUALIFY rn <= 10"""

  /** Subspace-decomposed double dot product in DuckDB SQL: the sum of
    * m=4 per-slice list_dot_products, left-associated — the exact
    * association order Similarity.pqTopK's sorted-struct fold uses, so
    * the lossless-PQ key's doubles are bit-identical to the oracle's. */
  private def pqDotSql(a: String, b: String): String =
    (0 until 4).map { s =>
      val lo = s * 16 + 1; val hi = (s + 1) * 16
      s"list_dot_product($a[$lo:$hi], $b[$lo:$hi])"
    }.mkString(" + ")

  private val pqTopKSql = {
    val dot = pqDotSql("ed", "qd")
    val v2 = pqDotSql("ed", "ed")
    val q2 = pqDotSql("qd", "qd")
    s"""WITH q AS (SELECT vec_id AS q_id,
              list_transform(embedding, x -> CAST(x AS DOUBLE)) AS qd
              FROM embeddings WHERE vec_id < 5),
            c AS (SELECT vec_id,
              list_transform(embedding, x -> CAST(x AS DOUBLE)) AS ed
              FROM embeddings),
            s AS (SELECT q_id, vec_id,
              round(($dot) / (sqrt($v2) * sqrt($q2)), 4) AS sim
              FROM c, q WHERE c.vec_id != q.q_id)
       SELECT q_id, vec_id, sim,
              CAST(row_number() OVER (PARTITION BY q_id ORDER BY sim DESC, vec_id) AS INTEGER) AS rn
       FROM s QUALIFY rn <= 10"""
  }

  /**
   * FNV-1a 64 re-implemented in pure DuckDB SQL (HUGEINT arithmetic
   * mod 2^64; per-byte xor folded through the low byte since the data
   * byte is < 256) — an INDEPENDENT arithmetic path that differentially
   * tests the codegen'd expressions, not a port of them. Relies on the
   * corpus being ASCII (ascii(char) == the UTF-8 byte), which holds for
   * the synthetic documents table.
   */
  private def fnvSql(e: String): String =
    "list_reduce(list_prepend(CAST(14695981039346656037 AS HUGEINT), " +
      s"list_transform(range(1, length($e) + 1), fnv_i -> " +
      s"CAST(ascii(substr($e, CAST(fnv_i AS INT), 1)) AS HUGEINT))), " +
      "(fnv_h, fnv_b) -> ((fnv_h - (fnv_h % 256) + " +
      "CAST(xor(CAST(fnv_h % 256 AS BIGINT), CAST(fnv_b AS BIGINT)) AS HUGEINT)) " +
      "* 1099511628211) % 18446744073709551616)"

  /** SimHash bit votes: bit b set iff words with bit b outnumber those without. */
  private val simhashBitsSql: String = (0 until 64).map { b =>
    val p = BigInt(1) << b
    s"(CASE WHEN 2 * len(list_filter(wh, sh_h -> (sh_h // CAST('$p' AS HUGEINT)) % 2 = 1)) " +
      s"> len(wh) THEN CAST('$p' AS HUGEINT) ELSE CAST(0 AS HUGEINT) END)"
  }.mkString(" + ")

  /** Map an unsigned-64 HUGEINT onto the signed BIGINT Spark emits. */
  private def toSignedSql(e: String): String =
    s"CASE WHEN ($e) >= CAST('9223372036854775808' AS HUGEINT) " +
      s"THEN CAST(($e) - CAST('18446744073709551616' AS HUGEINT) AS BIGINT) " +
      s"ELSE CAST(($e) AS BIGINT) END"

  val all: Seq[(String, Q)] = Seq(

    // ----- deduplication --------------------------------------------------

    "q_dedup_exact" -> Q(
      // exact dedup = hash-aggregate on the content key; min(doc_id) is
      // the deterministic representative (dropDuplicates picks an
      // arbitrary row — useless under a hash-comparing oracle)
      (s, dir) => t(s, dir, "documents")
        .groupBy("text")
        .agg(min(col("doc_id")).as("doc_id"), count(lit(1)).as("dup_cnt"))
        .select("doc_id", "dup_cnt"),
      Some("""SELECT min(doc_id) AS doc_id, count(*) AS dup_cnt
              FROM documents GROUP BY text""")),

    "q_dedup_url" -> Q(
      // URL-canonicalization dedup — the crawl-pipeline stage that runs
      // BEFORE any content dedup: normalize each document's URL
      // (lowercase, strip scheme + www, drop query/fragment, trim
      // trailing slashes) and keep the lowest doc_id per canonical URL.
      // The URL is derived deterministically from harness columns
      // (source + doc_id bucket + lang), giving real collision groups;
      // canonicalization is three codegen'd regexp_replace passes and
      // the dedup is one hash aggregate on the canonical key — the same
      // single-shuffle shape as q_dedup_exact, so it holds at crawl
      // scale (the canonical key is short, unlike document text).
      (s, dir) => {
        val withUrl = t(s, dir, "documents").withColumn("url",
          concat(lit("HTTPS://WWW."), col("source"), lit(".Example.COM/docs/"),
            (col("doc_id") % 40).cast("string"),
            lit("/?utm_source=feed&ref="), col("lang")))
        withUrl
          .withColumn("canonical",
            regexp_replace(
              regexp_replace(
                regexp_replace(lower(col("url")), "^https?://(www\\.)?", ""),
                "[?#].*$", ""),
              "/+$", ""))
          .groupBy("canonical")
          .agg(min(col("doc_id")).as("keeper_id"), count(lit(1)).as("n_dups"))
      },
      Some("""WITH u AS (
                SELECT doc_id,
                       'HTTPS://WWW.' || source || '.Example.COM/docs/' ||
                       CAST(doc_id % 40 AS VARCHAR) ||
                       '/?utm_source=feed&ref=' || lang AS url
                FROM documents),
              c AS (
                SELECT doc_id,
                       regexp_replace(
                         regexp_replace(
                           regexp_replace(lower(url), '^https?://(www\.)?', ''),
                           '[?#].*$', ''),
                         '/+$', '') AS canonical
                FROM u)
              SELECT canonical, min(doc_id) AS keeper_id, count(*) AS n_dups
              FROM c GROUP BY canonical""")),

    "q_dedup_minhash" -> Q(
      // per-row MinHash signatures (pure map, NO shuffle) + LSH band
      // equi-join — never an all-pairs crossJoin. Oracle-gate form:
      // over the known-duplicate corpus at threshold 1.0 with an
      // exact-duplicate confirm step, the pipeline's output is exactly
      // the text-equal pair set (recall 1.0 by construction — see
      // dupCorpus) and a string-equality self-join is the oracle. The
      // probabilistic near-dup regime (threshold 0.3 over the natural
      // corpus) is property-tested in LlmOpsSpec against brute-force
      // Jaccard.
      (s, dir) => {
        val corpus = dupCorpus(s, dir)
        confirmExact(corpus, Dedup.minhashPairs(corpus, "doc_id", "text",
          k = 128, bands = 32, shingleN = 3, threshold = 1.0))
          .select(col("id_a"), col("id_b"), col("est_sim"))
      },
      Some(s"""SELECT a.doc_id AS id_a, b.doc_id AS id_b,
                      CAST(1.0 AS DOUBLE) AS est_sim
               FROM $dupCorpusSql a JOIN $dupCorpusSql b
                 ON a.doc_id < b.doc_id AND a.text = b.text""")),

    "q_dedup_minhash_grouped" -> Q(
      // same pipeline through the mergeable MinHashAggregator
      // (partial+final sketch merge) — the formulation for inputs
      // where a document arrives as many rows or as a stream; also
      // proven pair-identical to the per-row form in LlmOpsSpec
      (s, dir) => {
        val corpus = dupCorpus(s, dir)
        confirmExact(corpus, Dedup.minhashPairs(corpus, "doc_id", "text",
          k = 128, bands = 32, shingleN = 3, threshold = 1.0, useAggregator = true))
          .select(col("id_a"), col("id_b"), col("est_sim"))
      },
      Some(s"""SELECT a.doc_id AS id_a, b.doc_id AS id_b,
                      CAST(1.0 AS DOUBLE) AS est_sim
               FROM $dupCorpusSql a JOIN $dupCorpusSql b
                 ON a.doc_id < b.doc_id AND a.text = b.text""")),

    "q_dedup_clusters" -> Q(
      // pairs → connected components → keep/drop list (min-id
      // survives); the actionable end of the dedup pipeline. Over the
      // exact-duplicate pair set, components are precisely the
      // equal-text groups (equality is transitive), so min-over-text
      // is the oracle; general near-dup graphs are verified against a
      // driver-side union-find in LlmOpsSpec.
      (s, dir) => {
        val corpus = dupCorpus(s, dir)
        val pairs = confirmExact(corpus, Dedup.minhashPairs(corpus, "doc_id", "text",
          threshold = 1.0)).select("id_a", "id_b")
        DedupClusters.keepList(corpus, "doc_id", pairs)
      },
      Some(s"""SELECT doc_id AS id,
                      min(doc_id) OVER (PARTITION BY text) AS cluster,
                      doc_id = min(doc_id) OVER (PARTITION BY text) AS keep
               FROM $dupCorpusSql""")),

    "q_dedup_apply" -> Q(
      // the dedup pipeline's terminal operator
      // (DedupClusters.applyKeepList): the CLEANED CORPUS — candidate
      // pairs → connected components → min-id survivor semi-join, one
      // declarative plan; over the exact-duplicate gate the survivors
      // are exactly one doc per distinct text (the min id), which the
      // oracle states directly with a window QUALIFY.
      (s, dir) => {
        val corpus = dupCorpus(s, dir)
        val pairs = confirmExact(corpus, Dedup.minhashPairs(corpus, "doc_id", "text",
          threshold = 1.0)).select("id_a", "id_b")
        DedupClusters.applyKeepList(corpus, "doc_id", pairs)
      },
      Some(s"""SELECT doc_id, text FROM $dupCorpusSql
               QUALIFY doc_id = min(doc_id) OVER (PARTITION BY text)""")),

    "q_dedup_incremental" -> Q(
      // incremental (cross-snapshot) dedup — Dedup.incrementalSurvivors:
      // a NEW batch dedups against the accumulated corpus using ONLY
      // the corpus's persisted (id, fp, sig) dedup index; corpus text
      // is never re-read. The batch is constructed with three known
      // classes: verbatim re-crawls (killed by the fp stage), one
      // appended token pair (near-dups — killed by the LSH stage:
      // J ≈ (w-2)/(w+2) >> 0.5 for every document length here), and
      // letter-rotated rewrites (shared shingles ~0 — survive). The
      // oracle states the survivors by construction class; the gate
      // thus verifies BOTH kill stages and the survivor path
      // end-to-end. All decisions are deterministic (seedless codegen
      // hashes), certified at all three SFs.
      (s, dir) => {
        import org.apache.spark.sql.functions.translate
        val docs = t(s, dir, "documents")
        val index = Dedup.dedupIndex(docs, "doc_id", "text")
        val batch =
          docs.filter(col("doc_id") % 3 === 0)
            .select((col("doc_id") + 10000000L).as("doc_id"), col("text"))
          .unionByName(docs.filter(col("doc_id") % 7 === 2)
            .select((col("doc_id") + 20000000L).as("doc_id"),
              concat(col("text"), lit(" graft extra tail")).as("text")))
          .unionByName(docs.filter(col("doc_id") % 11 === 5)
            .select((col("doc_id") + 30000000L).as("doc_id"),
              translate(col("text"), "abcdefghij", "fghijabcde").as("text")))
        Dedup.incrementalSurvivors(batch, index, "doc_id", "text")
          .select(col("doc_id"), length(col("text")).as("n_chars"))
      },
      Some("""WITH batch AS (
                SELECT doc_id + 30000000 AS doc_id,
                       translate(text, 'abcdefghij', 'fghijabcde') AS text
                FROM documents WHERE doc_id % 11 = 5)
              SELECT doc_id, length(text) AS n_chars FROM batch""")),

    "q_dedup_spans" -> Q(
      // sub-document (span-level) dedup — Dedup.spanDedup: 5-token
      // segments, corpus-wide first occurrence survives, documents
      // reassembled from surviving spans. Exact by construction
      // (tokenize / chunk / min-struct / reassemble are all integer
      // and string ops), so the oracle restates the same semantics
      // with window functions — occ = 1 under (doc_id, seg_idx) order
      // IS the min-struct first-occurrence rule.
      (s, dir) => Dedup.spanDedup(t(s, dir, "documents"), "doc_id", "text", w = 5),
      Some("""WITH toks AS (SELECT doc_id,
                     list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
                                 t -> t <> '') AS ws
                   FROM documents),
              nz AS (SELECT * FROM toks WHERE len(ws) > 0),
              segs AS (SELECT doc_id, CAST(i AS INTEGER) AS seg_idx,
                     array_to_string(ws[(i*5+1):(i*5+5)], ' ') AS seg
                   FROM nz, unnest(range(0, (len(ws) + 4) // 5)) AS u(i)),
              marked AS (SELECT doc_id, seg_idx, seg,
                     row_number() OVER (PARTITION BY seg
                                        ORDER BY doc_id, seg_idx) AS occ
                   FROM segs),
              base AS (SELECT doc_id, count(*) AS n_seg FROM segs GROUP BY doc_id),
              ka AS (SELECT doc_id, count(*) AS n_kept,
                     string_agg(seg, ' ' ORDER BY seg_idx) AS cleaned_text
                   FROM marked WHERE occ = 1 GROUP BY doc_id)
              SELECT b.doc_id, b.n_seg,
                     CAST(COALESCE(ka.n_kept, 0) AS BIGINT) AS n_kept,
                     COALESCE(ka.cleaned_text, '') AS cleaned_text
              FROM base b LEFT JOIN ka ON b.doc_id = ka.doc_id""")),

    "q_dedup_simhash" -> Q(
      // SimHash bucketing in its exact-duplicate gate: maxHamming = 0
      // means ONE slice = the whole 64-bit fingerprint, i.e. an
      // equi-join on the fingerprint itself, then the exact-dup
      // confirm (near-dup texts can share a fingerprint — correlated,
      // not random — so the confirm step is load-bearing). The
      // hamming <= 3 near-dup band over the natural corpus, where the
      // pigeonhole slice guarantee does real work, is spec-tested.
      (s, dir) => {
        val corpus = dupCorpus(s, dir)
        confirmExact(corpus, Dedup.simhashPairs(corpus, "doc_id", "text",
          maxHamming = 0))
          .select(col("id_a"), col("id_b"), col("hamming"))
      },
      Some(s"""SELECT a.doc_id AS id_a, b.doc_id AS id_b,
                      CAST(0 AS INTEGER) AS hamming
               FROM $dupCorpusSql a JOIN $dupCorpusSql b
                 ON a.doc_id < b.doc_id AND a.text = b.text""")),

    "q_dedup_ngram" -> Q(
      // EXACT word-3-gram Jaccard pairs via prefix filtering
      // (Dedup.ngramPairsExact): candidate recall for jaccard >= θ is
      // provably 1.0 (SSJoin/PPJoin prefix principle), and the verify
      // computes the exact Jaccard — so the whole operator is exact and
      // a DuckDB oracle that recomputes shingle-set Jaccard over all
      // pairs must agree. (The LSH-candidates + exact-verify
      // composition — probabilistic recall, for corpora where prefix
      // buckets blow up — stays spec-tested via
      // Dedup.minhashPairs + Dedup.verifiedPairs in LlmOpsSpec.)
      (s, dir) => Dedup.ngramPairsExact(t(s, dir, "documents"), "doc_id", "text",
        theta = 0.2, shingleN = 3),
      Some("""WITH toks AS (SELECT doc_id,
                     list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
                                 w -> w <> '') AS ws
                   FROM documents),
              sh AS (SELECT doc_id,
                     CASE WHEN len(ws) = 0 THEN []
                          WHEN len(ws) < 3 THEN [array_to_string(ws, ' ')]
                          ELSE list_distinct(list_transform(range(1, len(ws) - 1),
                                 i -> array_to_string(ws[i:i+2], ' ')))
                     END AS s
                   FROM toks),
              ne AS (SELECT doc_id, s FROM sh WHERE len(s) > 0)
              SELECT a.doc_id AS id_a, b.doc_id AS id_b,
                     round(CAST(len(list_intersect(a.s, b.s)) AS DOUBLE) /
                           (len(a.s) + len(b.s) - len(list_intersect(a.s, b.s))), 4)
                       AS jaccard
              FROM ne a JOIN ne b ON a.doc_id < b.doc_id
              WHERE CAST(len(list_intersect(a.s, b.s)) AS DOUBLE) /
                    (len(a.s) + len(b.s) - len(list_intersect(a.s, b.s))) >= 0.2""")),

    "q_dedup_containment" -> Q(
      // EXACT shingle-CONTAINMENT pairs (Dedup.containmentPairsExact):
      // the asymmetric dedup screen — |A∩B|/|A| >= 0.9 flags snippets,
      // quotes and boilerplate fragments whose Jaccard against a much
      // longer container stays low. One-sided prefix filtering keeps
      // recall provably 1.0 (containee prefix × container full set),
      // so exact verify ⇒ exact operator ⇒ SQL-oracle-able. The corpus
      // has no natural containments, so the gate derives them: every
      // 10th document contributes a prefix snippet (first ⌈0.6·n⌉
      // tokens, id-shifted) whose shingle set is a strict subset of
      // its source's — the pairs the operator must find, plus any
      // incidental ones both engines compute identically.
      (s, dir) => {
        val docs = t(s, dir, "documents").select(col("doc_id"), col("text"))
        val ws = filter(split(lower(col("text")), "[^a-z0-9]+"), w => w =!= "")
        val snips = docs.filter(col("doc_id") % 10 === 0)
          .select((col("doc_id") + 1000000).as("doc_id"), ws.as("ws"))
          .filter(size(col("ws")) > 0)
          .select(col("doc_id"),
            array_join(slice(col("ws"), lit(1),
              ceil(size(col("ws")) * lit(0.6)).cast("int")), " ").as("text"))
        Dedup.containmentPairsExact(docs.unionByName(snips),
          "doc_id", "text", theta = 0.9, shingleN = 3)
      },
      Some("""WITH base AS (SELECT doc_id, text FROM documents),
              bt AS (SELECT doc_id, list_filter(
                       string_split_regex(lower(text), '[^a-z0-9]+'),
                       w -> w <> '') AS ws FROM base),
              snip AS (SELECT doc_id + 1000000 AS doc_id,
                       array_to_string(ws[1:CAST(ceil(0.6 * len(ws)) AS INT)], ' ') AS text
                     FROM bt WHERE doc_id % 10 = 0 AND len(ws) > 0),
              corpus AS (SELECT doc_id, text FROM base
                         UNION ALL SELECT doc_id, text FROM snip),
              toks AS (SELECT doc_id, list_filter(
                       string_split_regex(lower(text), '[^a-z0-9]+'),
                       w -> w <> '') AS ws FROM corpus),
              sh AS (SELECT doc_id,
                     CASE WHEN len(ws) = 0 THEN []
                          WHEN len(ws) < 3 THEN [array_to_string(ws, ' ')]
                          ELSE list_distinct(list_transform(range(1, len(ws) - 1),
                                 i -> array_to_string(ws[i:i+2], ' ')))
                     END AS s
                   FROM toks),
              ne AS (SELECT doc_id, s FROM sh WHERE len(s) > 0)
              SELECT a.doc_id AS id_a, b.doc_id AS id_b,
                     round(CAST(len(list_intersect(a.s, b.s)) AS DOUBLE) / len(a.s), 4)
                       AS containment
              FROM ne a JOIN ne b ON a.doc_id != b.doc_id
              WHERE CAST(len(list_intersect(a.s, b.s)) AS DOUBLE) / len(a.s) >= 0.9""")),

    "q_dedup_embedding" -> Q(
      // embedding-cosine near-dup via multi-table SRP-LSH + exact cosine
      // verify (Dedup.embeddingPairs — the scale path, no all-pairs
      // join). The harness embeddings have no natural near-dups (max
      // background cosine ≈ 0.51), so the corpus is the table plus an
      // id-shifted copy of every 10th vector: the known duplicates the
      // operator must find. Identical vectors collide in every LSH
      // table, so recall at this threshold is 1.0 by construction and
      // the exact-SQL oracle is valid for the LSH plan.
      (s, dir) => {
        val emb = t(s, dir, "embeddings")
        val corpus = emb.select(col("vec_id"), col("embedding"))
          .unionByName(emb.filter(col("vec_id") % 10 === 0)
            .select((col("vec_id") + 1000000).as("vec_id"), col("embedding")))
        Dedup.embeddingPairs(corpus, "vec_id", "embedding", minCosine = 0.95)
      },
      Some("""WITH corpus AS (
                SELECT vec_id, embedding FROM embeddings
                UNION ALL
                SELECT vec_id + 1000000 AS vec_id, embedding FROM embeddings
                WHERE vec_id % 10 = 0),
              d AS (SELECT vec_id,
                      list_transform(embedding, x -> CAST(x AS DOUBLE)) AS ed
                    FROM corpus)
              SELECT a.vec_id AS id_a, b.vec_id AS id_b,
                     round(list_dot_product(a.ed, b.ed) /
                       (sqrt(list_dot_product(a.ed, a.ed)) * sqrt(list_dot_product(b.ed, b.ed))), 4) AS cos
              FROM d a JOIN d b ON a.vec_id < b.vec_id
              WHERE round(list_dot_product(a.ed, b.ed) /
                      (sqrt(list_dot_product(a.ed, a.ed)) * sqrt(list_dot_product(b.ed, b.ed))), 4) >= 0.95""")),

    "q_dedup_embedding_exact" -> Q(
      // all-pairs exact baseline for the key above — quadratic, so the
      // corpus is bounded in-query (vec_id < 1000 covers the whole
      // table at the correctness sf); at scale use q_dedup_embedding
      (s, dir) => {
        val emb = t(s, dir, "embeddings").filter(col("vec_id") < 1000)
        val corpus = emb.select(col("vec_id"), col("embedding"))
          .unionByName(emb.filter(col("vec_id") % 10 === 0)
            .select((col("vec_id") + 1000000).as("vec_id"), col("embedding")))
        Dedup.embeddingPairsExact(corpus, "vec_id", "embedding", minCosine = 0.95)
      },
      Some("""WITH corpus AS (
                SELECT vec_id, embedding FROM embeddings WHERE vec_id < 1000
                UNION ALL
                SELECT vec_id + 1000000 AS vec_id, embedding FROM embeddings
                WHERE vec_id % 10 = 0 AND vec_id < 1000),
              d AS (SELECT vec_id,
                      list_transform(embedding, x -> CAST(x AS DOUBLE)) AS ed
                    FROM corpus)
              SELECT a.vec_id AS id_a, b.vec_id AS id_b,
                     round(list_dot_product(a.ed, b.ed) /
                       (sqrt(list_dot_product(a.ed, a.ed)) * sqrt(list_dot_product(b.ed, b.ed))), 4) AS cos
              FROM d a JOIN d b ON a.vec_id < b.vec_id
              WHERE round(list_dot_product(a.ed, b.ed) /
                      (sqrt(list_dot_product(a.ed, a.ed)) * sqrt(list_dot_product(b.ed, b.ed))), 4) >= 0.95""")),

    "q_dedup_semdedup" -> Q(
      // SemDeDup (Dedup.semDeDup): cluster-then-prune semantic dedup.
      // Oracle gate: the harness `label` is the quantizer output (the
      // paper's pre-assigned-clusters ablation — deterministic, unlike
      // a cross-engine KMeans fit, which is the spec-tested
      // semDeDupKMeans path), over the planted-duplicate corpus.
      // Identical vectors share a cluster and tie on cent_sim, so the
      // id tie-break keeps the original and drops the copy; background
      // pairs (max cosine ≈ 0.51) never reach eps=0.95.
      (s, dir) => {
        val emb = t(s, dir, "embeddings")
        val corpus = emb.select(col("vec_id"), col("label"), col("embedding"))
          .unionByName(emb.filter(col("vec_id") % 10 === 0)
            .select((col("vec_id") + 1000000).as("vec_id"), col("label"),
              col("embedding")))
        Dedup.semDeDup(corpus, "vec_id", "embedding", "label", eps = 0.95)
          .withColumnRenamed("id", "vec_id")
      },
      Some("""WITH corpus AS (
                SELECT vec_id, label, embedding FROM embeddings
                UNION ALL
                SELECT vec_id + 1000000 AS vec_id, label, embedding
                FROM embeddings WHERE vec_id % 10 = 0),
              centd AS (SELECT label, CAST(i - 1 AS INTEGER) AS dim,
                     CAST(sum(CAST(floor(CAST(embedding[CAST(i AS INTEGER)] AS DOUBLE)
                                         * 1048576) AS BIGINT)) AS BIGINT)
                       / (1048576.0 * count(*)) AS mean
                   FROM corpus, unnest(range(1, len(embedding) + 1)) AS u(i)
                   GROUP BY label, dim),
              cl AS (SELECT label, list(mean ORDER BY dim) AS cent
                     FROM centd GROUP BY label),
              d AS (SELECT vec_id, c.label,
                      list_transform(embedding, x -> CAST(x AS DOUBLE)) AS ed
                    FROM corpus c),
              w AS (SELECT d.vec_id, d.label, d.ed,
                      round(list_dot_product(d.ed, cent) /
                        (sqrt(list_dot_product(d.ed, d.ed)) *
                         sqrt(list_dot_product(cent, cent))), 4) AS cent_sim
                    FROM d JOIN cl ON d.label = cl.label),
              drp AS (SELECT DISTINCT a.vec_id
                      FROM w a JOIN w b ON a.label = b.label
                        AND (b.cent_sim < a.cent_sim OR
                             (b.cent_sim = a.cent_sim AND b.vec_id < a.vec_id))
                      WHERE round(list_dot_product(a.ed, b.ed) /
                              (sqrt(list_dot_product(a.ed, a.ed)) *
                               sqrt(list_dot_product(b.ed, b.ed))), 4) >= 0.95)
              SELECT w.vec_id, w.label AS cluster, w.cent_sim,
                     w.vec_id NOT IN (SELECT vec_id FROM drp) AS kept
              FROM w""")),

    "q_dedup_semdedup_incremental" -> Q(
      // incremental SemDeDup (Dedup.semDeDupIndex + semDeDupSurvivors):
      // a new batch dedups against the corpus via its persisted
      // representative index alone — centroids NOT refit, corpus never
      // re-read. Batch construction: exact re-crawls of every 10th
      // vector (killed by a kept representative at cos 1) and negated
      // copies (novel by construction: cosine vs every corpus/batch
      // vector is the negation of a background similarity — survive).
      // The oracle spells the FULL rule (index build + rep kill +
      // within-batch rank kill), not the construction classes.
      (s, dir) => {
        val emb = t(s, dir, "embeddings")
        val (reps, cents) =
          Dedup.semDeDupIndex(emb, "vec_id", "embedding", "label", eps = 0.95)
        val tenth = emb.filter(col("vec_id") % 10 === 0)
        val batch = tenth.select((col("vec_id") + 1000000).as("vec_id"),
            col("label"), col("embedding"))
          .unionByName(tenth.select((col("vec_id") + 2000000).as("vec_id"),
            col("label"),
            transform(col("embedding"), x => -x).as("embedding")))
        Dedup.semDeDupSurvivors(reps, cents, batch,
            "vec_id", "embedding", "label", eps = 0.95)
          .withColumnRenamed("id", "vec_id")
      },
      Some("""WITH centd AS (SELECT label, CAST(i - 1 AS INTEGER) AS dim,
                     CAST(sum(CAST(floor(CAST(embedding[CAST(i AS INTEGER)] AS DOUBLE)
                                         * 1048576) AS BIGINT)) AS BIGINT)
                       / (1048576.0 * count(*)) AS mean
                   FROM embeddings, unnest(range(1, len(embedding) + 1)) AS u(i)
                   GROUP BY label, dim),
              cl AS (SELECT label, list(mean ORDER BY dim) AS cent
                     FROM centd GROUP BY label),
              w AS (SELECT e.vec_id, e.label,
                      list_transform(embedding, x -> CAST(x AS DOUBLE)) AS ed,
                      round(list_dot_product(list_transform(embedding, x -> CAST(x AS DOUBLE)), cent) /
                        (sqrt(list_dot_product(list_transform(embedding, x -> CAST(x AS DOUBLE)),
                                               list_transform(embedding, x -> CAST(x AS DOUBLE)))) *
                         sqrt(list_dot_product(cent, cent))), 4) AS cent_sim
                    FROM embeddings e JOIN cl ON e.label = cl.label),
              cdrp AS (SELECT DISTINCT a.vec_id
                       FROM w a JOIN w b ON a.label = b.label
                         AND (b.cent_sim < a.cent_sim OR
                              (b.cent_sim = a.cent_sim AND b.vec_id < a.vec_id))
                       WHERE round(list_dot_product(a.ed, b.ed) /
                               (sqrt(list_dot_product(a.ed, a.ed)) *
                                sqrt(list_dot_product(b.ed, b.ed))), 4) >= 0.95),
              reps AS (SELECT * FROM w
                       WHERE vec_id NOT IN (SELECT vec_id FROM cdrp)),
              batch AS (
                SELECT vec_id + 1000000 AS vec_id, label,
                       list_transform(embedding, x -> CAST(x AS DOUBLE)) AS ed
                FROM embeddings WHERE vec_id % 10 = 0
                UNION ALL
                SELECT vec_id + 2000000 AS vec_id, label,
                       list_transform(embedding, x -> -CAST(x AS DOUBLE)) AS ed
                FROM embeddings WHERE vec_id % 10 = 0),
              bw AS (SELECT b.vec_id, b.label, b.ed,
                       round(list_dot_product(b.ed, cent) /
                         (sqrt(list_dot_product(b.ed, b.ed)) *
                          sqrt(list_dot_product(cent, cent))), 4) AS cent_sim
                     FROM batch b JOIN cl ON b.label = cl.label),
              rhit AS (SELECT DISTINCT bw.vec_id
                       FROM bw JOIN reps r ON bw.label = r.label
                       WHERE round(list_dot_product(bw.ed, r.ed) /
                               (sqrt(list_dot_product(bw.ed, bw.ed)) *
                                sqrt(list_dot_product(r.ed, r.ed))), 4) >= 0.95),
              bhit AS (SELECT DISTINCT a.vec_id
                       FROM bw a JOIN bw b ON a.label = b.label
                         AND (b.cent_sim < a.cent_sim OR
                              (b.cent_sim = a.cent_sim AND b.vec_id < a.vec_id))
                       WHERE round(list_dot_product(a.ed, b.ed) /
                               (sqrt(list_dot_product(a.ed, a.ed)) *
                                sqrt(list_dot_product(b.ed, b.ed))), 4) >= 0.95)
              SELECT bw.vec_id, bw.label AS cluster, bw.cent_sim,
                     bw.vec_id NOT IN (SELECT vec_id FROM rhit
                                       UNION SELECT vec_id FROM bhit) AS kept
              FROM bw""")),

    // ----- similarity search ---------------------------------------------

    "q_embed_centroids" -> Q(
      // per-label class prototypes (Similarity.labelCentroids):
      // fixed-point accumulation makes the float sums exact integer
      // arithmetic — row-order-, partitioning-, and engine-independent
      // — with one IEEE-exact division for the mean. floor() is
      // explicit on both sides (DuckDB CAST(double AS BIGINT) rounds
      // where Spark's cast truncates).
      (s, dir) => Similarity.labelCentroids(
        t(s, dir, "embeddings"), "embedding", "label"),
      Some("""SELECT label, CAST(i - 1 AS INTEGER) AS dim,
                     count(*) AS n_vecs,
                     CAST(sum(CAST(floor(CAST(embedding[CAST(i AS INTEGER)] AS DOUBLE)
                                         * 1048576) AS BIGINT)) AS BIGINT) AS sum_fp,
                     CAST(sum(CAST(floor(CAST(embedding[CAST(i AS INTEGER)] AS DOUBLE)
                                         * 1048576) AS BIGINT)) AS BIGINT)
                       / (1048576.0 * count(*)) AS mean
              FROM embeddings, unnest(range(1, len(embedding) + 1)) AS u(i)
              GROUP BY label, dim""")),

    "q_embed_classify" -> Q(
      // nearest-centroid classification
      // (Similarity.centroidClassify): distances fold the squared
      // differences in dimension order, so every partial sum is the
      // same IEEE double on both engines — no rounding anywhere; the
      // oracle spells the identical left-associated 64-term sum.
      (s, dir) => Similarity.centroidClassify(
        t(s, dir, "embeddings"), "vec_id", "embedding", "label"),
      Some(classifyOracleSql(64))),

    "q_sim_cosine_topk" -> Q(
      // exact baseline: 5 broadcast query vectors × all embeddings,
      // double-precision cosine, per-query top-10
      (s, dir) => {
        val emb = t(s, dir, "embeddings")
        Similarity.bruteForceTopK(emb, emb.filter(col("vec_id") < 5), k = 10)
      },
      Some(bruteForceTopKSql)),

    "q_sim_hard_negatives" -> Q(
      // hard-negative mining (Similarity.hardNegatives): per query,
      // the 10 most-similar DIFFERENT-label vectors — the contrastive
      // -training sampler. Same brute-force gate and 4dp rounding as
      // q_sim_cosine_topk, plus the label predicate.
      (s, dir) => {
        val emb = t(s, dir, "embeddings")
        Similarity.hardNegatives(emb, emb.filter(col("vec_id") < 5), k = 10)
      },
      Some("""WITH q AS (SELECT vec_id AS q_id, label AS q_label,
                list_transform(embedding, x -> CAST(x AS DOUBLE)) AS qd
                FROM embeddings WHERE vec_id < 5),
              c AS (SELECT vec_id, label,
                list_transform(embedding, x -> CAST(x AS DOUBLE)) AS ed
                FROM embeddings),
              s AS (SELECT q_id, vec_id,
                round(list_dot_product(ed, qd) /
                  (sqrt(list_dot_product(ed, ed)) * sqrt(list_dot_product(qd, qd))), 4) AS sim
                FROM c, q WHERE c.vec_id != q.q_id AND c.label != q.q_label)
         SELECT q_id, vec_id, sim,
                CAST(row_number() OVER (PARTITION BY q_id ORDER BY sim DESC, vec_id) AS INTEGER) AS rn
         FROM s QUALIFY rn <= 10""")),

    "q_quant_int8" -> Q(
      // int8 scalar quantization (Similarity.scalarQuantize): data-
      // derived per-dimension min/max, 255-bucket floor assignment —
      // core IEEE ops only, so the integer codes are engine-exact with
      // no rounding regime needed.
      // registry projection serializes the code array (Q.strArr,
      // driver-gate rule); the library function keeps the array form
      (s, dir) => Similarity.scalarQuantize(
          t(s, dir, "embeddings"), "vec_id", "embedding", levels = 256)
        .select(col("vec_id"), Q.strArr(col("codes")).as("codes")),
      Some(s"""WITH d AS (SELECT vec_id, CAST(i AS INTEGER) AS pos,
                     embedding[CAST(i AS INTEGER)] AS x
                   FROM embeddings, unnest(range(1, len(embedding) + 1)) AS u(i)),
              st AS (SELECT pos, min(x) AS mn, max(x) AS mx FROM d GROUP BY pos),
              codes AS (SELECT vec_id, pos,
                     CASE WHEN mx = mn THEN 0
                          ELSE least(255, CAST(floor(
                            (CAST(x AS DOUBLE) - CAST(mn AS DOUBLE)) * 255.0
                            / (CAST(mx AS DOUBLE) - CAST(mn AS DOUBLE))) AS INTEGER)) END AS code
                   FROM d JOIN st USING (pos))
              SELECT vec_id,
                     ${Q.strArrSql("list(CAST(code AS INTEGER) ORDER BY pos)")} AS codes
              FROM codes GROUP BY vec_id""")),

    "q_sim_cosine_pq" -> Q(
      // product quantization (the IVF-PQ memory half) in its LOSSLESS
      // gate: one centroid per distinct subvector ⇒ quantization error
      // exactly 0 ⇒ the full encode → ADC-table → (s,code)-join →
      // subspace-ordered fold pipeline returns the EXACT decomposed
      // cosine, which the oracle reproduces with the same 4-slice
      // left-associated arithmetic. The compressing regime (sampled
      // ksub-centroid codebook, real quantization error) is
      // recall-tested in LlmOpsSpec.
      (s, dir) => {
        val emb = t(s, dir, "embeddings")
        Similarity.pqTopK(emb, emb.filter(col("vec_id") < 5), k = 10, m = 4)
      },
      Some(pqTopKSql)),

    "q_sim_cosine_ivfpq" -> Q(
      // the COMPOSED 100-TB ANN layout: IVF cells route (only probed
      // cells are scored), PQ codes score (ADC table lookups, never
      // raw vectors). Exact gate: nprobe = nlist probes every cell and
      // the lossless codebook has zero error ⇒ result ≡ brute force ≡
      // the same decomposed-cosine oracle as q_sim_cosine_pq,
      // regardless of what the trained cell layout did. Real configs
      // (nprobe < nlist, sampled codebook) are recall-tested in
      // LlmOpsSpec.
      (s, dir) => {
        val emb = t(s, dir, "embeddings")
        Similarity.ivfPqTopK(emb, emb.filter(col("vec_id") < 5), k = 10,
          nlist = 16, nprobe = 16, m = 4)
      },
      Some(pqTopKSql)),

    "q_sim_cosine_ivf" -> Q(
      // IVF-Flat: KMeans coarse quantizer (sample-trained — the
      // bounded train pass at scale), nprobe-cell probing. Oracle-gate
      // configuration nprobe = nlist: every query probes every cell,
      // each candidate is scored exactly once, so the result is
      // IDENTICAL to brute force regardless of what the quantizer
      // learned — the brute-force SQL is a valid oracle for the full
      // IVF machinery (cell assignment, probe ranking, scoring). The
      // approximate nprobe < nlist regime is recall-tested in
      // LlmOpsSpec.
      (s, dir) => {
        val emb = t(s, dir, "embeddings")
        Similarity.ivfTopK(emb, emb.filter(col("vec_id") < 5), k = 10,
          nlist = 16, nprobe = 16, trainFraction = 0.5)
      },
      Some(bruteForceTopKSql)),

    "q_sim_cosine_ivf_hier" -> Q(
      // IVF-Flat with the TWO-LEVEL router on the encode side
      // (Similarity.ivfTopK(hierRouting=true)): the corpus routes in
      // O(√nlist) per row via the codegen'd IvfRoute expression — the
      // flat encode argmin is the corpus-side quadratic under
      // nlist ∝ N (BENCH_NOTES round-8 cert). Same exact gate as
      // q_sim_cosine_ivf: nprobe = nlist probes every cell and each
      // candidate scores exactly once ⇒ ≡ brute force regardless of
      // the learned tree.
      (s, dir) => {
        val emb = t(s, dir, "embeddings")
        Similarity.ivfTopK(emb, emb.filter(col("vec_id") < 5), k = 10,
          nlist = 16, nprobe = 16, hierRouting = true)
      },
      Some(bruteForceTopKSql)),

    "q_knn_graph" -> Q(
      // kNN graph over the corpus (Similarity.knnGraph): every vector's
      // top-3 neighbours via the IVF cell layout — probes equi-join the
      // cell assignments (co-partitioned, nothing corpus-sized
      // broadcasts — the difference from the query-set keys). Oracle
      // gate nprobe = nlist ⇒ graph ≡ brute force; partial-probe
      // recall in LlmOpsSpec.
      (s, dir) => {
        val emb = t(s, dir, "embeddings")
        Similarity.knnGraph(emb, k = 3, nlist = 16, nprobe = 16,
          trainFraction = 0.5)
      },
      Some("""WITH c AS (SELECT vec_id,
                list_transform(embedding, x -> CAST(x AS DOUBLE)) AS ed
                FROM embeddings),
              s AS (SELECT q.vec_id AS q_id, c.vec_id,
                round(list_dot_product(c.ed, q.ed) /
                  (sqrt(list_dot_product(c.ed, c.ed)) * sqrt(list_dot_product(q.ed, q.ed))), 4) AS sim
                FROM c, c q WHERE c.vec_id != q.vec_id)
         SELECT q_id, vec_id, sim,
                CAST(row_number() OVER (PARTITION BY q_id ORDER BY sim DESC, vec_id) AS INTEGER) AS rn
         FROM s QUALIFY rn <= 3""")),

    "q_knn_graph_hier" -> Q(
      // kNN graph via the TWO-LEVEL router (Similarity.knnGraphHier) —
      // the quadratic-free form: encode and probe are per-row
      // codegen'd expressions over a driver-trained hierarchical
      // quantizer, O(√nlist) per row, so the corpus × nlist probe
      // ranking the flat form pays never exists. Oracle gate
      // superProbe = k1 (= ⌈√nlist⌉ = 4) and nprobe = nlist probes
      // every cell; each vector lives in exactly one cell, so every
      // pair is scored exactly once ⇒ graph ≡ brute force regardless
      // of the learned tree. Approximate-regime recall + the
      // plan-shape claim (no probe window) are pinned in LlmOpsSpec.
      (s, dir) => {
        val emb = t(s, dir, "embeddings")
        Similarity.knnGraphHier(emb, k = 3, nlist = 16, nprobe = 16,
          superProbe = 4)
      },
      Some("""WITH c AS (SELECT vec_id,
                list_transform(embedding, x -> CAST(x AS DOUBLE)) AS ed
                FROM embeddings),
              s AS (SELECT q.vec_id AS q_id, c.vec_id,
                round(list_dot_product(c.ed, q.ed) /
                  (sqrt(list_dot_product(c.ed, c.ed)) * sqrt(list_dot_product(q.ed, q.ed))), 4) AS sim
                FROM c, c q WHERE c.vec_id != q.vec_id)
         SELECT q_id, vec_id, sim,
                CAST(row_number() OVER (PARTITION BY q_id ORDER BY sim DESC, vec_id) AS INTEGER) AS rn
         FROM s QUALIFY rn <= 3""")),

    "q_sim_index_persist" -> Q(
      // build-once-serve-many ANN: Similarity.buildIvfIndex writes the
      // IVF artifact — (vec_id, embedding, cell) assignments plus the
      // (cell, centroid) routing table — to NATIVE tables, and
      // Similarity.serveIvfTopK answers queries from the persisted
      // tables alone: no KMeans, no corpus pass, at serve time. The
      // 100 TB ANN operating model (index maintenance and query
      // serving are separate jobs), tied to this library's own
      // storage format. Oracle-gate regime nprobe = nlist, where IVF
      // is provably identical to brute force (same argument as
      // q_sim_cosine_ivf) — which also proves the embeddings survived
      // the native write→read roundtrip bit-for-bit.
      (s, dir) => {
        val fxCells = ScanQueries.fixtureDir(dir, "ivf_cells")
        val fxCent = ScanQueries.fixtureDir(dir, "ivf_centroids")
        val emb = t(s, dir, "embeddings")
        val (cells, centroids) = Similarity.buildIvfIndex(emb, nlist = 16,
          trainFraction = 0.5)
        cells.write.format("clickhouse_native").mode("overwrite").save(fxCells)
        centroids.write.format("clickhouse_native").mode("overwrite").save(fxCent)
        Similarity.serveIvfTopK(
          s.read.format("clickhouse_native").load(fxCells),
          s.read.format("clickhouse_native").load(fxCent),
          emb.filter(col("vec_id") < 5), k = 10, nprobe = 16)
      },
      Some(bruteForceTopKSql)),

    "q_sim_cosine_lsh" -> Q(
      // the 100-TB path: sign-random-projection buckets + multi-probe.
      // Oracle-gate configuration probeRadius = planes: every occupied
      // bucket is probed, each candidate scored exactly once → result
      // identical to brute force through the full bucket/probe/score
      // machinery; partial-radius recall is property-tested in
      // LlmOpsSpec.
      (s, dir) => {
        val emb = t(s, dir, "embeddings")
        Similarity.lshTopK(emb, emb.filter(col("vec_id") < 5), k = 10,
          planes = 8, probeRadius = 8)
      },
      Some(bruteForceTopKSql)),

    // ----- text analysis --------------------------------------------------

    "q_text_stats" -> Q(
      (s, dir) => t(s, dir, "documents").select(
        col("doc_id"),
        length(col("text")).as("n_chars_c"),
        size(split(trim(col("text")), "\\s+")).as("n_words"),
        (length(col("text")).cast("double") /
          size(split(trim(col("text")), "\\s+"))).as("chars_per_word"),
        regexp_count(col("text"), lit(punctRe)).as("n_punct"),
        (regexp_count(col("text"), lit(punctRe)).cast("double") /
          length(col("text"))).as("punct_ratio")),
      Some(s"""SELECT doc_id,
                     CAST(length(text) AS INTEGER) AS n_chars_c,
                     CAST(len(string_split_regex(trim(text), '\\s+')) AS INTEGER) AS n_words,
                     CAST(length(text) AS DOUBLE) / len(string_split_regex(trim(text), '\\s+')) AS chars_per_word,
                     CAST(len(regexp_extract_all(text, '$punctRe')) AS INTEGER) AS n_punct,
                     CAST(len(regexp_extract_all(text, '$punctRe')) AS DOUBLE) / length(text) AS punct_ratio
              FROM documents""")),

    "q_token_count" -> Q(
      // whitespace tokens + a BPE-ish regex tokenizer (words or single
      // non-space punctuation), both as codegen'd regexp_count
      (s, dir) => t(s, dir, "documents").select(
        col("doc_id"),
        size(split(trim(col("text")), "\\s+")).as("ws_tokens"),
        regexp_count(col("text"), lit(tokenRe)).as("bpe_ish_tokens")),
      Some(s"""SELECT doc_id,
                     CAST(len(string_split_regex(trim(text), '\\s+')) AS INTEGER) AS ws_tokens,
                     CAST(len(regexp_extract_all(text, '$tokenRe')) AS INTEGER) AS bpe_ish_tokens
              FROM documents""")),

    "q_lang_id" -> Q(
      // n-gram/stopword-count heuristic, arg-max over language scores —
      // deliberately simple enough to express identically in the oracle
      (s, dir) => t(s, dir, "documents")
        .select(
          col("doc_id"),
          regexp_count(lower(col("text")), lit(enRe)).as("en_score"),
          regexp_count(lower(col("text")), lit(deRe)).as("de_score"),
          regexp_count(lower(col("text")), lit(esRe)).as("es_score"))
        .withColumn("lang_pred",
          when(col("en_score") >= col("de_score") && col("en_score") >= col("es_score"), "en")
            .when(col("de_score") >= col("es_score"), "de")
            .otherwise("es")),
      Some(s"""SELECT doc_id,
                     CAST(len(regexp_extract_all(lower(text), '$enRe')) AS INTEGER) AS en_score,
                     CAST(len(regexp_extract_all(lower(text), '$deRe')) AS INTEGER) AS de_score,
                     CAST(len(regexp_extract_all(lower(text), '$esRe')) AS INTEGER) AS es_score,
                     CASE WHEN len(regexp_extract_all(lower(text), '$enRe')) >= len(regexp_extract_all(lower(text), '$deRe'))
                           AND len(regexp_extract_all(lower(text), '$enRe')) >= len(regexp_extract_all(lower(text), '$esRe')) THEN 'en'
                          WHEN len(regexp_extract_all(lower(text), '$deRe')) >= len(regexp_extract_all(lower(text), '$esRe')) THEN 'de'
                          ELSE 'es' END AS lang_pred
              FROM documents""")),

    "q_quality_score" -> Q(
      // length / punctuation / stopword-ratio quality signals; raw
      // double arithmetic (bit-identical across engines, no rounding)
      (s, dir) => {
        val words = size(split(trim(col("text")), "\\s+"))
        val stops = regexp_count(lower(col("text")), lit(enRe))
        val punct = regexp_count(col("text"), lit(punctRe))
        t(s, dir, "documents").select(
          col("doc_id"),
          words.as("n_words"),
          (stops.cast("double") / words).as("stop_ratio"),
          (punct.cast("double") / length(col("text"))).as("punct_ratio"),
          (stops.cast("double") / words * 2.0 +
            when(words >= 5 && words <= 10000, 1.0).otherwise(0.0) -
            punct.cast("double") / length(col("text"))).as("quality"))
      },
      Some(s"""SELECT doc_id,
                     CAST(len(string_split_regex(trim(text), '\\s+')) AS INTEGER) AS n_words,
                     CAST(len(regexp_extract_all(lower(text), '$enRe')) AS DOUBLE)
                       / len(string_split_regex(trim(text), '\\s+')) AS stop_ratio,
                     CAST(len(regexp_extract_all(text, '$punctRe')) AS DOUBLE) / length(text) AS punct_ratio,
                     CAST(len(regexp_extract_all(lower(text), '$enRe')) AS DOUBLE)
                       / len(string_split_regex(trim(text), '\\s+')) * 2.0
                       + (CASE WHEN len(string_split_regex(trim(text), '\\s+')) BETWEEN 5 AND 10000
                           THEN 1.0 ELSE 0.0 END)
                       - CAST(len(regexp_extract_all(text, '$punctRe')) AS DOUBLE) / length(text) AS quality
              FROM documents""")),

    "q_fn_hash_expr" -> Q(
      // the codegen'd native Expressions registered via GraftExtensions
      // (Verify/Bench sessions set spark.sql.extensions). The oracle
      // re-implements FNV-1a 64 and SimHash from scratch in DuckDB SQL
      // (HUGEINT mod-2^64 arithmetic, per-bit majority votes) — a
      // differential test through an independent arithmetic path, on
      // top of HashExpressionSpec's Scala-reference equivalence.
      (s, dir) => t(s, dir, "documents")
        .selectExpr("doc_id", "fnv1a64(text) AS content_hash", "simhash64(text) AS sim_fp"),
      Some(s"""WITH toks AS (SELECT doc_id, text,
                      list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
                                  w -> w <> '') AS ws
                    FROM documents),
               whashed AS (SELECT doc_id, text,
                      list_transform(ws, sw -> ${fnvSql("sw")}) AS wh
                    FROM toks),
               u AS (SELECT doc_id,
                      ${fnvSql("text")} AS content_u,
                      ($simhashBitsSql) AS sim_u
                    FROM whashed)
               SELECT doc_id,
                      ${toSignedSql("content_u")} AS content_hash,
                      ${toSignedSql("sim_u")} AS sim_fp
               FROM u""")),

    "q_pii_redact" -> Q(
      // PII scrubbing: email/phone redaction plus a per-document count —
      // a standard pre-training cleanup pass. Patterns restricted to
      // Java-regex/RE2-identical syntax (classes, bounded quantifiers,
      // \b, \d); Spark regexp_replace is global by default, DuckDB
      // needs the 'g' flag.
      (s, dir) => {
        val emailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
        val phoneRe = "\\b[0-9]{3}[-.][0-9]{3}[-.][0-9]{4}\\b"
        t(s, dir, "documents").select(
          col("doc_id"),
          regexp_replace(regexp_replace(col("text"), emailRe, "<EMAIL>"),
            phoneRe, "<PHONE>").as("clean_text"),
          (regexp_count(col("text"), lit(emailRe)) +
            regexp_count(col("text"), lit(phoneRe))).as("n_pii"))
      },
      Some("""SELECT doc_id,
                     regexp_replace(regexp_replace(text,
                       '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
                       '\b[0-9]{3}[-.][0-9]{3}[-.][0-9]{4}\b', '<PHONE>', 'g') AS clean_text,
                     CAST(len(regexp_extract_all(text, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}'))
                        + len(regexp_extract_all(text, '\b[0-9]{3}[-.][0-9]{3}[-.][0-9]{4}\b')) AS INTEGER) AS n_pii
              FROM documents""")),

    "q_pii_classes" -> Q(
      // structured PII classification beyond redaction: per-document
      // IPv4 and payment-card detection with a LUHN checksum verify —
      // the step that separates real card numbers from random 16-digit
      // runs (the false-positive control every production PII pass
      // needs). The Luhn sum is pure integer arithmetic over the digit
      // array (double-every-second-from-the-right, fold, mod 10), so
      // valid/invalid is engine-exact. The synthetic corpus carries no
      // PII, so the gate plants it deterministically (q_text_normalize
      // discipline): every 4th document gains one IP, one Luhn-VALID
      // card (the classic 4111111111111111 test number) and one
      // off-by-one INVALID card — the classifier must count 2
      // candidates but only 1 valid.
      (s, dir) => {
        val ipRe = "\\\\b[0-9]{1,3}\\\\.[0-9]{1,3}\\\\.[0-9]{1,3}\\\\.[0-9]{1,3}\\\\b"
        val cardRe = "\\\\b[0-9]{16}\\\\b"
        // Luhn digit term at 0-based index i of card string c
        val digit = "(ascii(substring(c, i + 1, 1)) - 48)"
        val injected = t(s, dir, "documents").select(col("doc_id"),
          when(col("doc_id") % 4 === 0,
            concat(col("text"), lit(" from 10.0.0."),
              (col("doc_id") % 256).cast("string"),
              lit(" card 4111111111111111 ref 4111111111111112")))
            .otherwise(col("text")).as("text"))
        injected.select(col("doc_id"),
          size(expr(s"regexp_extract_all(text, '$cardRe', 0)")).as("n_card_cand"),
          expr(s"""size(filter(regexp_extract_all(text, '$cardRe', 0), c ->
              aggregate(sequence(0, 15), 0, (acc, i) ->
                acc + CASE WHEN i % 2 = 0
                  THEN IF(2 * $digit > 9, 2 * $digit - 9, 2 * $digit)
                  ELSE $digit END) % 10 = 0))""").as("n_card_valid"),
          size(expr(s"regexp_extract_all(text, '$ipRe', 0)")).as("n_ipv4"))
      },
      Some("""WITH inj AS (SELECT doc_id,
                       CASE WHEN doc_id % 4 = 0
                            THEN text || ' from 10.0.0.' || (doc_id % 256)
                                 || ' card 4111111111111111 ref 4111111111111112'
                            ELSE text END AS text
                   FROM documents),
              cand AS (SELECT doc_id, text,
                       regexp_extract_all(text, '\b[0-9]{16}\b') AS cards
                   FROM inj)
              SELECT doc_id,
                     CAST(len(cards) AS INTEGER) AS n_card_cand,
                     CAST(len(list_filter(cards, c ->
                       list_sum(list_transform(range(0, 16), i ->
                         CASE WHEN i % 2 = 0
                              THEN CASE WHEN 2 * (ascii(substring(c, i + 1, 1)) - 48) > 9
                                        THEN 2 * (ascii(substring(c, i + 1, 1)) - 48) - 9
                                        ELSE 2 * (ascii(substring(c, i + 1, 1)) - 48) END
                              ELSE ascii(substring(c, i + 1, 1)) - 48 END)) % 10 = 0))
                       AS INTEGER) AS n_card_valid,
                     CAST(len(regexp_extract_all(text,
                       '\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b'))
                       AS INTEGER) AS n_ipv4
              FROM cand""")),

    "q_fingerprint" -> Q(
      // content-hash fingerprint (oracle-checkable via md5); the
      // edit-tolerant winnowing fingerprint rides along rows-only in
      // q_dedup_simhash / TextHash.rollingFingerprint
      (s, dir) => t(s, dir, "documents").select(
        col("doc_id"),
        md5(col("text").cast("binary")).as("content_md5"),
        substring(md5(col("text").cast("binary")), 1, 8).as("shard_key")),
      Some("""SELECT doc_id, md5(text) AS content_md5,
                     substring(md5(text), 1, 8) AS shard_key
              FROM documents""")),

    "q_chunk_tokens" -> Q(
      // pre-tokenizer packing: 64-token windows, 16-token overlap
      // (stride 48), final partial window included — the shard-writing
      // step of a training pipeline (TextPipeline.tokenChunks). Pure
      // per-row column math, so the DuckDB oracle rebuilds the same
      // windows with range()/list slicing and the hash gate pins every
      // chunk string byte-for-byte.
      (s, dir) => TextPipeline.tokenChunks(
        t(s, dir, "documents"), "doc_id", "text", chunkSize = 64, overlap = 16),
      Some("""WITH toks AS (SELECT doc_id,
                     list_filter(string_split_regex(text, '\s+'), w -> w <> '') AS ws
                   FROM documents),
              nz AS (SELECT doc_id, ws, len(ws) AS n FROM toks WHERE len(ws) > 0),
              st AS (SELECT doc_id, ws, n, unnest(range(0, n, 48)) AS s FROM nz)
              SELECT doc_id, CAST(s // 48 AS INTEGER) AS chunk_idx,
                     CAST(least(64, n - s) AS INTEGER) AS n_tok,
                     array_to_string(ws[s+1 : s+64], ' ') AS chunk_text
              FROM st""")),

    "q_text_normalize" -> Q(
      // C4-style cleaning (TextPipeline.normalizeText): strip control
      // chars, collapse whitespace, trim. The synthetic corpus is
      // already clean, so the gate DIRTIES it first with deterministic
      // injected tabs/double-spaces (same replace arithmetic both
      // sides) — the normalizer must provably undo real dirt, not
      // no-op over clean text.
      (s, dir) => TextPipeline.normalizeText(
        t(s, dir, "documents")
          .select(col("doc_id"), regexp_replace(col("text"), "a", "\ta  ").as("text")),
        "doc_id", "text"),
      Some("""WITH dirty AS (SELECT doc_id,
                     regexp_replace(text, 'a', chr(9) || 'a' || '  ', 'g') AS text
                   FROM documents)
              SELECT doc_id,
                     trim(regexp_replace(
                       regexp_replace(text, '[\x00-\x1f\x7f]', ' ', 'g'),
                       ' {2,}', ' ', 'g')) AS clean_text,
                     CAST(length(text) - length(trim(regexp_replace(
                       regexp_replace(text, '[\x00-\x1f\x7f]', ' ', 'g'),
                       ' {2,}', ' ', 'g'))) AS INTEGER) AS n_chars_removed
              FROM dirty""")),

    "q_mix_epochs" -> Q(
      // epoch-weighted source mixing (the Llama-recipe counterpart of
      // temperature sampling: UP-sample scarce sources by integral
      // epoch replication instead of down-sampling rich ones). The
      // per-source factor ceil(n_max / n_source), capped at 4, derives
      // from the data in integer arithmetic; each document expands to
      // `factor` epoch-tagged rows via an explode — a narrow
      // transformation, no shuffle beyond the tiny source-count
      // aggregate that broadcasts back.
      (s, dir) => {
        val docs = t(s, dir, "documents")
        val counts = docs.groupBy("source").agg(count(lit(1)).as("n"))
        val factors = counts.crossJoin(broadcast(counts.agg(max(col("n")).as("n_max"))))
          .select(col("source"),
            least(lit(4L), floor((col("n_max") + col("n") - 1) / col("n")).cast("long"))
              .as("factor"))
        docs.join(broadcast(factors), "source")
          .select(col("doc_id"), col("source"),
            explode(sequence(lit(1L), col("factor"))).as("epoch"))
      },
      Some("""WITH c AS (SELECT source, count(*) AS n FROM documents GROUP BY source),
              f AS (SELECT source,
                     least(4, CAST(floor(CAST((SELECT max(n) FROM c) + n - 1 AS DOUBLE) / n) AS BIGINT)) AS factor
                   FROM c)
              SELECT d.doc_id, d.source, CAST(u.e AS BIGINT) AS epoch
              FROM documents d JOIN f USING (source),
                   unnest(range(1, f.factor + 1)) AS u(e)""")),

    "q_lang_mix" -> Q(
      // temperature-rebalanced language mixing (τ=0.5 — the XLM-R
      // recipe): over-represented languages are hash-downsampled at
      // rate sqrt(n_min/n_lang), flattening the en-heavy corpus toward
      // balance (TextPipeline.temperatureSample). The rate is DERIVED
      // from the data but still deterministic (IEEE sqrt + floor +
      // multiplicative-hash membership are engine-identical), so the
      // oracle recomputes both the thresholds and the membership.
      (s, dir) => TextPipeline.temperatureSample(
        t(s, dir, "documents"), "doc_id", "lang"),
      Some("""WITH c AS (SELECT lang, count(*) AS n FROM documents GROUP BY lang),
              r AS (SELECT lang,
                     CAST(floor(1000 * sqrt(CAST((SELECT min(n) FROM c) AS DOUBLE) / n)) AS BIGINT) AS thr
                   FROM c)
              SELECT d.doc_id, d.lang
              FROM documents d JOIN r USING (lang)
              WHERE (((d.doc_id % 1000003) * 2654435761) % 4294967296) % 1000 < r.thr""")),

    "q_repetition_stats" -> Q(
      // Gopher/MassiveText repetition quality signals
      // (TextPipeline.repetitionStats): distinct-unigram ratio,
      // top-token mass fraction, duplicate-trigram fraction — the
      // screens for loops, dominated-token boilerplate and copied
      // spans. Per-row array arithmetic, zero shuffles; the oracle
      // recomputes each signal with DuckDB list functions.
      (s, dir) => TextPipeline.repetitionStats(t(s, dir, "documents"), "doc_id", "text"),
      Some("""WITH toks AS (SELECT doc_id,
                     list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
                                 w -> w <> '') AS ws
                   FROM documents),
              nz AS (SELECT doc_id, ws, len(ws) AS n FROM toks WHERE len(ws) > 0),
              tri AS (SELECT doc_id, ws, n,
                     CASE WHEN n >= 3 THEN list_transform(range(1, n - 1),
                            i -> array_to_string(ws[i:i+2], ' '))
                          ELSE [] END AS tris
                   FROM nz)
              SELECT doc_id,
                     CAST(n AS INTEGER) AS n_tok,
                     round(CAST(len(list_distinct(ws)) AS DOUBLE) / n, 4) AS distinct_ratio,
                     round(CAST(list_max(list_transform(list_distinct(ws),
                             w -> len(list_filter(ws, x -> x = w)))) AS DOUBLE) / n, 4)
                       AS top_token_frac,
                     round(CASE WHEN len(tris) = 0 THEN 0.0
                           ELSE CAST(len(tris) - len(list_distinct(tris)) AS DOUBLE)
                                / len(tris) END, 4) AS dup_trigram_frac
              FROM tri""")),

    "q_quality_filter" -> Q(
      // the Gopher-rule DECISION (TextPipeline.qualityFilter): each
      // doc's accept/reject plus the failed-rule list in fixed rule
      // order — the curation verdict a pipeline writes next to the
      // data. The oracle rebuilds the signals and the same rule list.
      // registry projection serializes the reason list (Q.strArr,
      // driver-gate rule); the library function keeps the array form
      (s, dir) => TextPipeline.qualityFilter(t(s, dir, "documents"), "doc_id", "text")
        .select(col("doc_id"), col("accepted"), Q.strArr(col("reasons")).as("reasons")),
      Some(s"""WITH toks AS (SELECT doc_id,
                     list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
                                 w -> w <> '') AS ws
                   FROM documents),
              nz AS (SELECT doc_id, ws, len(ws) AS n FROM toks WHERE len(ws) > 0),
              sig AS (SELECT doc_id,
                     CAST(n AS INTEGER) AS n_tok,
                     round(CAST(len(list_distinct(ws)) AS DOUBLE) / n, 4) AS dr,
                     round(CAST(list_max(list_transform(list_distinct(ws),
                             w -> len(list_filter(ws, x -> x = w)))) AS DOUBLE) / n, 4) AS ttf,
                     round(CASE WHEN n < 3 THEN 0.0
                           ELSE CAST((n - 2) - len(list_distinct(list_transform(range(1, n - 1),
                                  i -> array_to_string(ws[i:i+2], ' ')))) AS DOUBLE)
                                / (n - 2) END, 4) AS dtf
                   FROM nz),
              dec AS (SELECT doc_id,
                     list_filter([CASE WHEN n_tok < 15 THEN 'too_short' END,
                                  CASE WHEN dr < 0.3 THEN 'low_diversity' END,
                                  CASE WHEN ttf > 0.2 THEN 'token_dominance' END,
                                  CASE WHEN dtf > 0.5 THEN 'repeated_spans' END],
                                 x -> x IS NOT NULL) AS reasons
                   FROM sig)
              SELECT doc_id, len(reasons) = 0 AS accepted,
                     ${Q.strArrSql("reasons")} AS reasons FROM dec""")),

    "q_outlier_zscore" -> Q(
      // per-group z-score outlier flagging — the numeric-column cousin
      // of the quality filter (drop events whose value is >2σ from its
      // event_type's mean). Exact-regime spelling: values quantize to
      // integer cents, the group statistics are exact integer sums
      // (n, Σc, Σc²), and both engines then evaluate the IDENTICAL
      // closed-form double expression from those integers — so the
      // 4-dp gate compares deterministic arithmetic, not accumulation
      // order. Plan: one tiny hash aggregate (5 event types) broadcast
      // back onto the stream — the fact side never shuffles, which is
      // the only layout that survives a 100-TB event log.
      (s, dir) => {
        val cents = Q.events(s, dir)
          .select(col("event_id"), col("event_type"),
            floor(col("value") * 100).cast("long").as("c"))
        val stats = cents.groupBy("event_type")
          .agg(count(lit(1)).as("n"), sum(col("c")).as("s"),
            sum(col("c") * col("c")).as("sq"))
        val mu = col("s").cast("double") / col("n")
        val sd = sqrt(col("sq").cast("double") / col("n") - mu * mu)
        cents.join(broadcast(stats), Seq("event_type"))
          .select(col("event_id"), col("event_type"),
            round((col("c") - mu) / sd, 4).as("z"),
            (abs(col("c") - mu) > sd * 2.0).as("is_outlier"))
      },
      Some(s"""WITH cents AS (
                 SELECT event_id, event_type,
                        CAST(floor(value * 100) AS BIGINT) AS c
                 FROM ${Q.eventsOracle}),
               st AS (
                 SELECT event_type, count(*) AS n, sum(c) AS s,
                        sum(c * c) AS sq
                 FROM cents GROUP BY event_type)
               SELECT event_id, cents.event_type,
                      round((c - CAST(s AS DOUBLE) / n) /
                            sqrt(CAST(sq AS DOUBLE) / n -
                                 (CAST(s AS DOUBLE) / n) * (CAST(s AS DOUBLE) / n)),
                            4) AS z,
                      abs(c - CAST(s AS DOUBLE) / n) >
                        sqrt(CAST(sq AS DOUBLE) / n -
                             (CAST(s AS DOUBLE) / n) * (CAST(s AS DOUBLE) / n)) * 2.0
                        AS is_outlier
               FROM cents JOIN st ON cents.event_type = st.event_type""")),

    "q_agg_array_sum" -> Q(
      // CH sumArray/-Array combinator: aggregate over every ELEMENT of
      // an array column per group (here: per-label mass of the
      // embedding vectors). The per-row reduce is a codegen'd
      // higher-order aggregate (no explode — the rows never widen), the
      // group fold is a plain sum. Exact-regime: elements quantize to
      // integer milli-units first, so the nested sums are integer math
      // on both engines.
      (s, dir) => t(s, dir, "embeddings")
        .select(col("label"),
          aggregate(
            transform(col("embedding"),
              x => floor(x.cast("double") * 1000).cast("long")),
            lit(0L), (acc, x) => acc + x).as("row_milli"))
        .groupBy("label")
        .agg(sum(col("row_milli")).as("sum_milli"), count(lit(1)).as("n_vecs")),
      Some("""SELECT label,
                     CAST(sum(list_sum(list_transform(embedding,
                           x -> CAST(floor(CAST(x AS DOUBLE) * 1000) AS BIGINT))))
                       AS BIGINT) AS sum_milli,
                     count(*) AS n_vecs
              FROM embeddings GROUP BY label""")),

    "q_bpe_merges" -> Q(
      // BPE tokenizer training, first 3 merge rules
      // (TextPipeline.bpeMerges). The oracle replays the identical
      // algorithm in SQL: per round, frequency-weighted pair counts →
      // deterministic argmax → greedy non-overlapping merge, spelled
      // as the run/rank window selection that provably equals the
      // Spark side's left-to-right fold (odd ranks within each run of
      // consecutive match positions).
      (s, dir) => TextPipeline.bpeMerges(t(s, dir, "documents"), "doc_id", "text", 3),
      Some(bpeMergesOracleSql(3))),

    "q_bpe_encode" -> Q(
      // BPE applied: per-document sequence-length accounting under the
      // 3-rule tokenizer just trained (TextPipeline.bpeEncode) — the
      // encode is a vocabulary-sized join, never a per-document
      // re-segmentation; the oracle extends the training CTEs with the
      // same per-word count join.
      (s, dir) => TextPipeline.bpeEncode(t(s, dir, "documents"), "doc_id", "text", 3),
      Some(bpeEncodeOracleSql(3))),

    "q_vocab_build" -> Q(
      // corpus vocabulary (TextPipeline.buildVocab): top-1000 word
      // tokens with dense ids — the tokenizer-training precursor. The
      // oracle rebuilds the same (count desc, word asc) total order.
      (s, dir) => TextPipeline.buildVocab(t(s, dir, "documents"), "text", 1000),
      Some("""WITH w AS (SELECT unnest(list_filter(
                       string_split_regex(lower(text), '[^a-z0-9]+'),
                       x -> x <> '')) AS word
                   FROM documents),
              c AS (SELECT word, count(*) AS cnt FROM w GROUP BY word)
              SELECT CAST(row_number() OVER (ORDER BY cnt DESC, word) - 1 AS INTEGER)
                       AS token_id, word, cnt
              FROM c ORDER BY cnt DESC, word LIMIT 1000""")),

    "q_split_assign" -> Q(
      // deterministic train/val/test assignment
      // (TextPipeline.assignSplits): hash-bucketed 98/1/1 so documents
      // never migrate between splits across reruns or appends; the
      // oracle recomputes the multiplicative-hash arithmetic.
      (s, dir) => TextPipeline.assignSplits(t(s, dir, "documents"), "doc_id"),
      Some("""SELECT doc_id,
                     CAST((((doc_id % 1000003) * 2654435761) % 4294967296) % 100
                       AS INTEGER) AS bucket,
                     CASE WHEN (((doc_id % 1000003) * 2654435761) % 4294967296) % 100 < 98
                            THEN 'train'
                          WHEN (((doc_id % 1000003) * 2654435761) % 4294967296) % 100 < 99
                            THEN 'val'
                          ELSE 'test' END AS split
              FROM documents""")),

    "q_df_stats" -> Q(
      // corpus document-frequency profile (TextPipeline.dfStats):
      // top-200 words by df with an integer-exact majority stopword
      // flag — the df table behind the dedup family's prefix filters.
      (s, dir) => TextPipeline.dfStats(t(s, dir, "documents"), "doc_id", "text", 200),
      Some("""WITH w AS (SELECT doc_id, unnest(list_distinct(list_filter(
                       string_split_regex(lower(text), '[^a-z0-9]+'),
                       x -> x <> ''))) AS word
                   FROM documents),
              d AS (SELECT word, count(*) AS df FROM w GROUP BY word)
              SELECT word, df, df * 2 > (SELECT count(*) FROM documents) AS is_stopword
              FROM d ORDER BY df DESC, word LIMIT 200""")),

    "q_ngram_lm" -> Q(
      // bigram language-model counts (the KenLM-style counting stage,
      // and the statistic behind n-gram contamination overlap):
      // adjacent-token pairs exploded to thin rows, hash-aggregated
      // to (w1, w2, cnt) with the bigram-start marginal (w1_cnt)
      // joined back — cnt/w1_cnt IS the MLE conditional, kept as the
      // integer pair so the gate stays arithmetic-exact. Min-count 5
      // mirrors the pruning every n-gram LM applies.
      (s, dir) => {
        val toks = t(s, dir, "documents").select(
          filter(split(lower(col("text")), "[^a-z0-9]+"), w => w =!= "").as("ws"))
          .filter(size(col("ws")) > 1)
        val pairs = toks.select(explode(expr(
          "transform(sequence(1, size(ws) - 1), i -> struct(ws[i-1] AS w1, ws[i] AS w2))"))
          .as("p")).select(col("p.w1"), col("p.w2"))
        val uni = pairs.groupBy("w1").agg(count(lit(1)).as("w1_cnt"))
        pairs.groupBy("w1", "w2").agg(count(lit(1)).as("cnt"))
          .join(uni, "w1").filter(col("cnt") >= 5)
          .select("w1", "w2", "cnt", "w1_cnt")
      },
      Some("""WITH toks AS (SELECT list_filter(
                       string_split_regex(lower(text), '[^a-z0-9]+'),
                       w -> w <> '') AS ws
                   FROM documents),
              nz AS (SELECT ws FROM toks WHERE len(ws) > 1),
              p AS (SELECT ws[i] AS w1, ws[i + 1] AS w2
                   FROM nz, unnest(range(1, len(ws))) AS u(i)),
              uni AS (SELECT w1, count(*) AS w1_cnt FROM p GROUP BY w1),
              big AS (SELECT w1, w2, count(*) AS cnt FROM p GROUP BY w1, w2)
              SELECT b.w1, b.w2, b.cnt, u.w1_cnt
              FROM big b JOIN uni u USING (w1) WHERE b.cnt >= 5""")),

    "q_lm_perplexity" -> Q(
      // CCNet-style LM quality filtering (Wenzek et al., "CCNet", 2019):
      // score every document by how well a corpus-level bigram LM
      // predicts it and flag the low-perplexity head — the classic
      // perplexity gate LLM corpora apply after dedup. The gate stays
      // arithmetic-exact by quantizing -log2 p(w2|w1) to INTEGER bits
      // via bit length: bits = len(bin(w1_cnt)) - len(bin(cnt)) is a
      // floor-log2 of the MLE odds computed identically by Spark and
      // DuckDB (no libm log anywhere near the hash gate); bigrams the
      // pruned LM dropped charge a flat 20-bit OOV penalty, the shape a
      // KenLM backoff penalty takes. At 100 TB the min-count-pruned LM
      // is a small table broadcast to every executor — exactly how
      // CCNet ships its KenLM to workers — while the document-bigram
      // side streams with no shuffle besides the final per-doc agg.
      (s, dir) => {
        val toks = t(s, dir, "documents").select(col("doc_id"),
          filter(split(lower(col("text")), "[^a-z0-9]+"), w => w =!= "").as("ws"))
          .filter(size(col("ws")) > 1)
        val pairs = toks.select(col("doc_id"), explode(expr(
          "transform(sequence(1, size(ws) - 1), i -> struct(ws[i-1] AS w1, ws[i] AS w2))"))
          .as("p")).select(col("doc_id"), col("p.w1"), col("p.w2"))
        val uni = pairs.groupBy("w1").agg(count(lit(1)).as("w1_cnt"))
        val lm = pairs.groupBy("w1", "w2").agg(count(lit(1)).as("cnt"))
          .join(uni, "w1").filter(col("cnt") >= 5)
        val scored = pairs.join(broadcast(lm), Seq("w1", "w2"), "left")
          .select(col("doc_id"), coalesce(
            length(bin(col("w1_cnt"))) - length(bin(col("cnt"))), lit(20)).as("bits"))
        scored.groupBy("doc_id").agg(
          count(lit(1)).as("n_bigrams"), sum("bits").as("sum_bits"))
          // keep = mean bits/bigram <= 4.6 — splits this corpus near its
          // median so both decision classes are exercised by the gate
          .withColumn("keep", col("sum_bits") * 10 <= col("n_bigrams") * 46)
      },
      Some("""WITH toks AS (SELECT doc_id, list_filter(
                       string_split_regex(lower(text), '[^a-z0-9]+'),
                       w -> w <> '') AS ws FROM documents),
              nz AS (SELECT doc_id, ws FROM toks WHERE len(ws) > 1),
              p AS (SELECT doc_id, ws[i] AS w1, ws[i + 1] AS w2
                   FROM nz, unnest(range(1, len(ws))) AS u(i)),
              uni AS (SELECT w1, count(*) AS w1_cnt FROM p GROUP BY w1),
              big AS (SELECT w1, w2, count(*) AS cnt FROM p GROUP BY w1, w2),
              lm AS (SELECT b.w1, b.w2, b.cnt, u.w1_cnt
                     FROM big b JOIN uni u USING (w1) WHERE b.cnt >= 5),
              sc AS (SELECT p.doc_id, coalesce(
                       length(bin(l.w1_cnt)) - length(bin(l.cnt)), 20) AS bits
                     FROM p LEFT JOIN lm l ON p.w1 = l.w1 AND p.w2 = l.w2)
              SELECT doc_id, count(*) AS n_bigrams,
                     CAST(sum(bits) AS BIGINT) AS sum_bits,
                     sum(bits) * 10 <= count(*) * 46 AS keep
              FROM sc GROUP BY doc_id""")),

    "q_tfidf_terms" -> Q(
      // per-document distinctive terms (TextPipeline.tfidfTerms):
      // top-3 by tf/df — linear-idf tf·idf, kept as an IEEE integer
      // division so the ranking is engine-exact (log-idf would hang
      // the hash gate on libm ulps); output columns are all integer.
      (s, dir) => TextPipeline.tfidfTerms(t(s, dir, "documents"), "doc_id", "text", 3),
      Some("""WITH toks AS (SELECT doc_id, unnest(list_filter(
                       string_split_regex(lower(text), '[^a-z0-9]+'),
                       x -> x <> '')) AS term
                   FROM documents),
              tf AS (SELECT doc_id, term, count(*) AS tf
                   FROM toks GROUP BY doc_id, term),
              dfreq AS (SELECT term, count(DISTINCT doc_id) AS df FROM toks GROUP BY term),
              ranked AS (SELECT tf.doc_id, tf.term, tf.tf, dfreq.df,
                     CAST(row_number() OVER (PARTITION BY tf.doc_id
                       ORDER BY CAST(tf.tf AS DOUBLE) / dfreq.df DESC, tf.term)
                       AS INTEGER) AS rank
                   FROM tf JOIN dfreq USING (term))
              SELECT doc_id, term, tf, df, rank FROM ranked WHERE rank <= 3""")),

    "q_bm25_topk" -> Q(
      // BM25 retrieval (TextPipeline.bm25TopK) — the lexical ranking
      // behind corpus search / RAG: query {dup, merge, window} (one
      // rare term, two common — both idf regimes exercised), k1=1.2,
      // b=0.75, ALL-INTEGER scoring (linear idf ×1000, milli-scaled
      // length norm, floor division throughout) so the scores and the
      // ranking are engine-exact — the same no-libm discipline as
      // q_lm_perplexity. The oracle replays the identical integer
      // arithmetic with DuckDB's // floor division (all operands
      // positive, so Spark's truncating div agrees).
      (s, dir) => TextPipeline.bm25TopK(t(s, dir, "documents"),
        "doc_id", "text", Seq("dup", "merge", "window"), k = 10),
      Some(bm25Sql)),

    "q_bm25_index_persist" -> Q(
      // build-once-serve-many lexical retrieval — the IVF-persist
      // pattern's text twin: TextPipeline.buildTextIndex writes the
      // inverted-index artifact (term-SORTED postings, dict, corpus
      // stats) to NATIVE tables; TextPipeline.serveBm25 answers the
      // query from the persisted tables alone — no tokenization, no
      // corpus pass, at serve time, with the query-term filter pushed
      // to the postings scan where the term-clustered layout's zone
      // maps skip non-matching blocks (a search engine's posting-list
      // seek as filter pushdown). Scoring is the same integer regime,
      // so the oracle is q_bm25_topk's — which also pins the
      // string+long posting columns through the native write→read
      // roundtrip.
      (s, dir) => {
        val fxPost = ScanQueries.fixtureDir(dir, "bm25_postings")
        val fxDict = ScanQueries.fixtureDir(dir, "bm25_dict")
        val fxStats = ScanQueries.fixtureDir(dir, "bm25_stats")
        val (postings, _, _) = TextPipeline.buildTextIndex(
          t(s, dir, "documents"), "doc_id", "text")
        postings.write.format("clickhouse_native").mode("overwrite").save(fxPost)
        // dict and stats derive from the JUST-WRITTEN postings artifact
        // (r15, guide §1.2 "don't compute what you throw away" applied
        // to recomputation: the three writes each re-ran the corpus
        // tokenize+explode lineage — postings' own, dict's, and stats'
        // — when the second and third are exact functions of the first;
        // see TextPipeline.dictFromPostings/statsFromPostings for the
        // equivalence argument). The corpus is now tokenized ONCE per
        // build instead of three times; artifact contents are
        // unchanged, as is every serve-path read.
        val posted = s.read.format("clickhouse_native").load(fxPost)
        TextPipeline.dictFromPostings(posted)
          .write.format("clickhouse_native").mode("overwrite").save(fxDict)
        TextPipeline.statsFromPostings(posted)
          .write.format("clickhouse_native").mode("overwrite").save(fxStats)
        TextPipeline.serveBm25(
          s.read.format("clickhouse_native").load(fxPost),
          s.read.format("clickhouse_native").load(fxDict),
          s.read.format("clickhouse_native").load(fxStats),
          Seq("dup", "merge", "window"), k = 10)
      },
      Some(bm25Sql)),

    "q_rank_fusion" -> Q(
      // hybrid retrieval via reciprocal-rank fusion
      // (TextPipeline.rrfFuse): the lexical BM25 top-50 (same integer
      // regime as q_bm25_topk) fused with the semantic cosine top-50
      // against query vector 0 (same 4dp-rounded ranking the
      // oracle-green q_sim_cosine_topk pins) — documents and
      // embeddings share ids in the harness data, the RAG-stack
      // shape. RRF contribution is 1000000 div (60 + rank), floor
      // division, so the fused score is a long both engines compute
      // identically; items absent from a list contribute 0.
      (s, dir) => {
        val lex = TextPipeline.bm25TopK(t(s, dir, "documents"),
          "doc_id", "text", Seq("dup", "merge", "window"), k = 50)
          .select(col("doc_id"), col("rank"))
        val emb = t(s, dir, "embeddings")
        val sem = Similarity.bruteForceTopK(emb, emb.filter(col("vec_id") === 0), k = 50)
          .select(col("vec_id"), col("rn"))
        TextPipeline.rrfFuse(lex, sem, k = 10)
      },
      Some(s"""WITH $bm25Ctes,
              lex AS (SELECT doc_id AS id,
                       CAST(row_number() OVER (
                         ORDER BY sum(part_micro) DESC, doc_id) AS BIGINT) AS rank_a
                     FROM sc GROUP BY doc_id QUALIFY rank_a <= 50),
              q AS (SELECT list_transform(embedding, x -> CAST(x AS DOUBLE)) AS qd
                   FROM embeddings WHERE vec_id = 0),
              sims AS (SELECT vec_id, round(
                         list_dot_product(ed, qd) /
                         (sqrt(list_dot_product(ed, ed)) * sqrt(list_dot_product(qd, qd))),
                         4) AS sim
                     FROM (SELECT vec_id,
                             list_transform(embedding, x -> CAST(x AS DOUBLE)) AS ed
                           FROM embeddings WHERE vec_id != 0) CROSS JOIN q),
              sem AS (SELECT vec_id AS id,
                       CAST(row_number() OVER (ORDER BY sim DESC, vec_id) AS BIGINT)
                         AS rank_b
                     FROM sims QUALIFY rank_b <= 50),
              fused AS (SELECT coalesce(lex.id, sem.id) AS id, rank_a, rank_b,
                       coalesce(1000000 // (60 + rank_a), 0) +
                         coalesce(1000000 // (60 + rank_b), 0) AS rrf_micro
                     FROM lex FULL OUTER JOIN sem ON lex.id = sem.id)
              SELECT id, rank_a, rank_b, rrf_micro,
                     CAST(row_number() OVER (ORDER BY rrf_micro DESC, id)
                       AS INTEGER) AS rank
              FROM fused QUALIFY rank <= 10""")),

    "q_boilerplate_strip" -> Q(
      // per-source boilerplate segment removal
      // (TextPipeline.stripBoilerplate) — the CCNet/C4 crawl-cleaning
      // stage that strips repeated site chrome. The synthetic corpus
      // has no boilerplate, so the gate plants it deterministically
      // first (the q_text_normalize discipline): every even-id
      // document gets a 5-token per-source header prepended; a correct
      // strip removes exactly that segment (its per-source df ≈ half
      // the source's documents, well past the df·4 ≥ n_src bar) and
      // reassembles the original token stream — integer/string-exact
      // end to end.
      (s, dir) => {
        val injected = t(s, dir, "documents").select(
          col("doc_id"), col("source"),
          when(col("doc_id") % 2 === 0,
            concat(lit("follow us at "), col("source"), lit(" news "), col("text")))
            .otherwise(col("text")).as("text"))
        TextPipeline.stripBoilerplate(injected, "doc_id", "text", "source", segTokens = 5)
      },
      Some("""WITH inj AS (SELECT doc_id, source,
                       CASE WHEN doc_id % 2 = 0
                            THEN 'follow us at ' || source || ' news ' || text
                            ELSE text END AS text
                   FROM documents),
              toks AS (SELECT doc_id, source, list_filter(
                       string_split_regex(lower(text), '[^a-z0-9]+'),
                       w -> w <> '') AS ws FROM inj),
              segs AS (SELECT doc_id, source, i AS seg_idx,
                       array_to_string(ws[i*5+1:i*5+5], ' ') AS seg
                     FROM toks, unnest(range(0, (len(ws) - 1) // 5 + 1)) AS u(i)
                     WHERE len(ws) > 0),
              nsrc AS (SELECT source, count(*) AS n_src FROM toks GROUP BY source),
              hot AS (SELECT source, seg FROM
                       (SELECT source, seg, count(DISTINCT doc_id) AS seg_df
                        FROM segs GROUP BY source, seg) h
                     JOIN nsrc USING (source) WHERE seg_df * 4 >= n_src),
              flag AS (SELECT s.doc_id, s.seg_idx, s.seg,
                       h.seg IS NOT NULL AS bp
                     FROM segs s LEFT JOIN hot h
                       ON s.source = h.source AND s.seg = h.seg),
              reb AS (SELECT doc_id,
                       coalesce(string_agg(CASE WHEN NOT bp THEN seg END,
                         ' ' ORDER BY seg_idx), '') AS clean_text,
                       count(*) AS n_seg,
                       CAST(sum(CASE WHEN bp THEN 1 ELSE 0 END) AS BIGINT) AS n_dropped
                     FROM flag GROUP BY doc_id)
              SELECT t.doc_id, coalesce(r.clean_text, '') AS clean_text,
                     coalesce(r.n_seg, 0) AS n_seg,
                     coalesce(r.n_dropped, 0) AS n_dropped
              FROM toks t LEFT JOIN reb r USING (doc_id)""")),

    "q_curation_report" -> Q(
      // per-source curation dashboard (TextPipeline.curationReport):
      // accept/reject tallies per Gopher rule + token mass, one row
      // per feed — every column an integer count so the gate is
      // arithmetic-exact; the oracle rebuilds the same signals and
      // tallies.
      (s, dir) => TextPipeline.curationReport(
        t(s, dir, "documents"), "doc_id", "text", "source"),
      Some("""WITH toks AS (SELECT doc_id,
                     list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
                                 w -> w <> '') AS ws
                   FROM documents),
              nz AS (SELECT doc_id, ws, len(ws) AS n FROM toks WHERE len(ws) > 0),
              sig AS (SELECT doc_id,
                     CAST(n AS INTEGER) AS n_tok,
                     round(CAST(len(list_distinct(ws)) AS DOUBLE) / n, 4) AS dr,
                     round(CAST(list_max(list_transform(list_distinct(ws),
                             w -> len(list_filter(ws, x -> x = w)))) AS DOUBLE) / n, 4) AS ttf,
                     round(CASE WHEN n < 3 THEN 0.0
                           ELSE CAST((n - 2) - len(list_distinct(list_transform(range(1, n - 1),
                                  i -> array_to_string(ws[i:i+2], ' ')))) AS DOUBLE)
                                / (n - 2) END, 4) AS dtf
                   FROM nz),
              dec AS (SELECT doc_id,
                     list_filter([CASE WHEN n_tok < 15 THEN 'too_short' END,
                                  CASE WHEN dr < 0.3 THEN 'low_diversity' END,
                                  CASE WHEN ttf > 0.2 THEN 'token_dominance' END,
                                  CASE WHEN dtf > 0.5 THEN 'repeated_spans' END],
                                 x -> x IS NOT NULL) AS reasons
                   FROM sig)
              SELECT d.source, count(*) AS n_docs,
                     CAST(sum(CASE WHEN len(reasons) = 0 THEN 1 ELSE 0 END) AS BIGINT)
                       AS n_accepted,
                     CAST(sum(CASE WHEN list_contains(reasons, 'too_short')
                              THEN 1 ELSE 0 END) AS BIGINT) AS n_too_short,
                     CAST(sum(CASE WHEN list_contains(reasons, 'low_diversity')
                              THEN 1 ELSE 0 END) AS BIGINT) AS n_low_diversity,
                     CAST(sum(CASE WHEN list_contains(reasons, 'token_dominance')
                              THEN 1 ELSE 0 END) AS BIGINT) AS n_token_dominance,
                     CAST(sum(CASE WHEN list_contains(reasons, 'repeated_spans')
                              THEN 1 ELSE 0 END) AS BIGINT) AS n_repeated_spans,
                     CAST(sum(n_tok) AS BIGINT) AS sum_tokens
              FROM documents d JOIN sig USING (doc_id) JOIN dec USING (doc_id)
              GROUP BY d.source""")),

    "q_decontaminate" -> Q(
      // eval-set decontamination: flag corpus documents sharing any
      // word-8-gram with a benchmark set (the C4/GPT-3-style n-gram
      // collision screen). The benchmark is PLANTED from the corpus
      // itself — every 10th document's tokens 11..40 as a 30-token
      // benchmark passage — so leakage exists by construction and the
      // flagged set + hit counts are deterministic
      // (TextPipeline.contaminatedDocs / plantedBenchmark).
      (s, dir) => {
        val docs = t(s, dir, "documents")
        TextPipeline.contaminatedDocs(docs, "doc_id", "text",
          TextPipeline.plantedBenchmark(docs, "doc_id", "text"), "bench_text")
      },
      Some("""WITH toks AS (SELECT doc_id,
                     list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
                                 w -> w <> '') AS ws
                   FROM documents),
              corpusg AS (SELECT doc_id, unnest(list_distinct(
                       list_transform(range(1, len(ws) - 6),
                         i -> array_to_string(ws[i:i+7], ' ')))) AS g
                   FROM toks WHERE len(ws) >= 8),
              evalg AS (SELECT DISTINCT unnest(list_transform(range(1, 24),
                       i -> array_to_string(ws[10+i : 17+i], ' '))) AS g
                   FROM toks WHERE doc_id % 10 = 0 AND len(ws) >= 40)
              SELECT c.doc_id, count(*) AS hits
              FROM corpusg c JOIN evalg e USING (g)
              GROUP BY c.doc_id""")),

    "q_pack_sequences" -> Q(
      // sequence packing (TextPipeline.packSequences): docs hashed
      // into 8 independent pack-groups, packed within each group by
      // integer prefix-sum div capacity — shard-local packing with no
      // global scan, the way production packers shard. All-integer
      // arithmetic ⇒ the oracle reproduces bins exactly with a window
      // cumsum.
      (s, dir) => TextPipeline.packSequences(
        t(s, dir, "documents"), "doc_id", "text", capacity = 256, groups = 8),
      Some("""WITH toks AS (SELECT doc_id,
                     CAST(len(list_filter(string_split_regex(text, '\s+'),
                                          w -> w <> '')) AS BIGINT) AS n_tok
                   FROM documents),
              nz AS (SELECT doc_id, n_tok,
                     (((doc_id % 1000003) * 2654435761) % 4294967296) % 8 AS grp
                   FROM toks WHERE n_tok > 0),
              cs AS (SELECT doc_id, n_tok, grp,
                     CAST(COALESCE(sum(n_tok) OVER (PARTITION BY grp ORDER BY doc_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS c
                   FROM nz)
              SELECT doc_id, n_tok, grp, c // 256 AS bin FROM cs""")),

    "q_pack_shards" -> Q(
      // shard materialization (TextPipeline.packShards): each packed
      // (group, bin)'s documents concatenated in doc_id order with an
      // end-of-document separator — the text a tokenizer turns into
      // one training sequence. DuckDB mirrors the deterministic
      // ordering with string_agg(... ORDER BY doc_id).
      (s, dir) => TextPipeline.packShards(
        t(s, dir, "documents"), "doc_id", "text", capacity = 256, groups = 8),
      Some("""WITH toks AS (SELECT doc_id, text,
                     CAST(len(list_filter(string_split_regex(text, '\s+'),
                                          w -> w <> '')) AS BIGINT) AS n_tok
                   FROM documents),
              nz AS (SELECT doc_id, text, n_tok,
                     (((doc_id % 1000003) * 2654435761) % 4294967296) % 8 AS grp
                   FROM toks WHERE n_tok > 0),
              cs AS (SELECT doc_id, text, n_tok, grp,
                     CAST(COALESCE(sum(n_tok) OVER (PARTITION BY grp ORDER BY doc_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS c
                   FROM nz)
              SELECT grp, c // 256 AS bin, count(*) AS n_docs,
                     string_agg(text, '<|eod|>' ORDER BY doc_id) AS shard_text
              FROM cs GROUP BY grp, c // 256""")),

    "q_pipeline_e2e" -> Q(
      // the training-data pipeline COMPOSED, one declarative plan:
      // quality screen (repetition signals) → exact dedup (min-id
      // keeper) → token chunking, over the known-duplicate corpus.
      // Each stage is individually oracle-gated elsewhere; this key
      // pins their composition — Catalyst fuses the whole thing into
      // one job (screen is per-row, dedup is one hash-agg shuffle,
      // chunking is per-row again), which is the point of declaring
      // pipelines instead of materializing between stages.
      (s, dir) => {
        val corpus = dupCorpus(s, dir)
        val stats = TextPipeline.repetitionStats(corpus, "doc_id", "text")
        val quality = corpus.join(
          stats.filter(col("n_tok") >= 12 && col("distinct_ratio") >= 0.3)
            .select("doc_id"), "doc_id")
        val kept = quality.groupBy("text").agg(min(col("doc_id")).as("doc_id"))
        TextPipeline.tokenChunks(kept, "doc_id", "text", chunkSize = 64, overlap = 16)
      },
      Some(s"""WITH corpus AS (SELECT * FROM $dupCorpusSql c),
               toks AS (SELECT doc_id, text,
                      list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
                                  w -> w <> '') AS ws
                    FROM corpus),
               qual AS (SELECT doc_id, text FROM toks
                    WHERE len(ws) >= 12
                      AND round(CAST(len(list_distinct(ws)) AS DOUBLE) / len(ws), 4) >= 0.3),
               kept AS (SELECT min(doc_id) AS doc_id, text FROM qual GROUP BY text),
               wtoks AS (SELECT doc_id,
                      list_filter(string_split_regex(text, '\\s+'), w -> w <> '') AS ws
                    FROM kept),
               nz AS (SELECT doc_id, ws, len(ws) AS n FROM wtoks WHERE len(ws) > 0),
               st AS (SELECT doc_id, ws, n, unnest(range(0, n, 48)) AS s FROM nz)
               SELECT doc_id, CAST(s // 48 AS INTEGER) AS chunk_idx,
                      CAST(least(64, n - s) AS INTEGER) AS n_tok,
                      array_to_string(ws[s+1 : s+64], ' ') AS chunk_text
               FROM st""")),

    // ----- multimodal -----------------------------------------------------

    "q_multimodal_frames" -> Q(
      // frame-sampling stage: every 5th 100-byte frame of the payload;
      // the oracle regenerates the same index arithmetic with range()
      (s, dir) => Multimodal.frameSample(t(s, dir, "documents"), frameBytes = 100, step = 5),
      Some("""SELECT doc_id, CAST(f.frame_idx AS INTEGER) AS frame_idx,
                     CAST(f.frame_idx * 100 AS INTEGER) AS frame_offset,
                     CAST(least(100, octet_length(encode(text)) - f.frame_idx * 100) AS INTEGER) AS frame_len
              FROM documents,
                   LATERAL (SELECT unnest(range(0, CAST(ceil(octet_length(encode(text)) / 100.0) AS BIGINT), 5)) AS frame_idx) f
              WHERE octet_length(encode(text)) > 0""")),

    "q_multimodal_dims" -> Q(
      // REAL container-format metadata decode: each doc gets a valid
      // PNG header sized from its metadata; Multimodal.imageDims
      // recovers (width, height) from the BYTES (8-byte signature +
      // IHDR walk). The oracle recomputes the dims arithmetically, so
      // a parser offset slip fails the hash — this is the decode step
      // that actually runs at scan time at 100 TB (resolution routing/
      // filtering), with pixel decode behind the documented stub seam.
      (s, dir) => Multimodal.dimsPipeline(s, t(s, dir, "documents")),
      Some("""SELECT doc_id, n_chars % 640 + 1 AS width, n_chars % 480 + 1 AS height
              FROM documents""")),

    "q_multimodal_audio" -> Q(
      // REAL audio-container metadata decode: each doc gets a valid
      // RIFF/WAVE PCM header parameterized from its metadata;
      // Multimodal.wavInfo recovers (rate, channels, samples) by
      // walking the chunk list. Duration in exact integer ms. The
      // oracle recomputes every field arithmetically — same
      // synth-then-parse contract as q_multimodal_dims.
      (s, dir) => Multimodal.audioPipeline(s, t(s, dir, "documents")),
      Some("""SELECT doc_id,
                     8000 + (n_chars % 3) * 4000 AS sample_rate,
                     1 + (n_chars % 2) AS channels,
                     n_chars % 100000 + 1 AS n_samples,
                     (n_chars % 100000 + 1) * 1000
                       // (8000 + (n_chars % 3) * 4000) AS duration_ms
              FROM documents""")),

    "q_multimodal_video" -> Q(
      // REAL video-container metadata decode: valid ISO BMFF
      // ftyp+moov/mvhd per doc; Multimodal.mp4Info recovers
      // (timescale, duration) by the box walk. Completes the
      // image/audio/video synth-then-parse triad; same arithmetic
      // oracle contract.
      (s, dir) => Multimodal.videoPipeline(s, t(s, dir, "documents")),
      Some("""SELECT doc_id,
                     CAST(CASE WHEN n_chars % 2 = 0 THEN 90000 ELSE 1000 END AS BIGINT) AS timescale,
                     n_chars * 37 + 1 AS duration_ticks,
                     (n_chars * 37 + 1) * 1000
                       // (CASE WHEN n_chars % 2 = 0 THEN 90000 ELSE 1000 END) AS duration_ms
              FROM documents""")),

    "q_multimodal_schema" -> Q(
      // binary payload + typed metadata struct → typed mapPartitions
      // feature extraction (decode stubbed — see Multimodal scaladoc)
      (s, dir) => Multimodal.pipeline(s, t(s, dir, "documents")),
      Some("""SELECT doc_id,
                     CAST(octet_length(encode(text)) AS INTEGER) AS n_bytes,
                     CAST(octet_length(encode(text)) % 640 AS INTEGER) AS width,
                     CAST((octet_length(encode(text)) * 7) % 480 AS INTEGER) AS height,
                     octet_length(encode(text)) / 100.0 AS feat
              FROM documents"""))
  )
}
