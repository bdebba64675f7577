package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Training-data text-pipeline operators beyond the dedup/similarity
 * families: fixed-size token chunking (the pre-tokenizer packing step
 * every LLM training pipeline runs before writing training shards)
 * and eval-set decontamination (flagging training documents that
 * contain benchmark passages — n-gram overlap screening, the standard
 * C4/GPT-3-style 8-gram collision check).
 *
 * Scale design: both operators are pure column pipelines plus one
 * thin equi-join — no UDFs, no driver-side state, no cartesian
 * anywhere. Chunking is a per-row map (split → sequence → posexplode)
 * that parallelizes embarrassingly. Decontamination joins the corpus'
 * exploded (doc_id, gram) rows — fixed-width after hashing, string
 * rows in the oracle-gated spelling — against the DISTINCT benchmark
 * gram set, which is tiny relative to the corpus (benchmarks are
 * thousands of documents, corpora are billions) and broadcasts; the
 * corpus side never shuffles at all in that regime.
 */
object TextPipeline {

  /** Lower-cased alphanumeric word tokens (the ngram-family contract:
    * lower, split on non-alphanumeric runs, drop empties). */
  private def wordTokens(text: Column): Column =
    filter(split(lower(text), "[^a-z0-9]+"), w => w =!= lit(""))

  /** Deterministic multiplicative-hash bucket of a non-negative id
    * (Knuth 2654435761 mod 2^32). The id is reduced mod a prime FIRST
    * so the multiply stays within Long for ANY id — without it,
    * ids ≥ ~3.5e9 overflow 2^63 (an ArithmeticException under ANSI
    * mode, a silent wrap otherwise, and a divergence from the oracle's
    * HUGEINT arithmetic either way), which matters precisely at the
    * corpus sizes where deterministic sampling matters. */
  private def hashBucket(id: Column, buckets: Int): Column =
    pmod((id % lit(1000003L)) * lit(2654435761L), lit(4294967296L)) % buckets

  /** Whitespace tokens with original case (the chunking contract —
    * chunk text must reassemble the original wording, so tokens keep
    * their case and punctuation). */
  private def wsTokens(text: Column): Column =
    filter(split(text, "\\s+"), w => w =!= lit(""))

  /** Distinct space-joined word n-grams of an ordered token array;
    * empty when the array holds fewer than n tokens (a document
    * shorter than the window cannot contain any length-n passage). */
  private def wordGrams(ws: Column, n: Int): Column =
    when(size(ws) >= n,
      array_distinct(transform(sequence(lit(1), size(ws) - (n - 1)),
        i => concat_ws(" ", slice(ws, i, lit(n))))))
      .otherwise(array().cast("array<string>"))

  /**
   * Split documents into fixed-size token windows with overlap:
   * windows of `chunkSize` whitespace tokens starting at every
   * multiple of `stride = chunkSize - overlap` below the token count —
   * always ⌈n/stride⌉ windows, so every token position `t` is a "new"
   * token of window ⌊t/stride⌋ (an exact-fit document gets a tail
   * window of pure overlap, the price of the uniform rule).
   * Deterministic and reassemblable: concatenating each chunk's first
   * `stride` tokens reconstructs the document exactly.
   *
   * @return (doc_id, chunk_idx, n_tok, chunk_text) — one row per
   *         chunk, chunk_idx counting from 0 per document
   */
  def tokenChunks(df: DataFrame, idCol: String, textCol: String,
      chunkSize: Int = 64, overlap: Int = 16): DataFrame = {
    require(chunkSize > 0 && overlap >= 0 && overlap < chunkSize,
      s"need 0 <= overlap=$overlap < chunkSize=$chunkSize")
    val stride = chunkSize - overlap
    df.select(col(idCol).as("doc_id"), wsTokens(col(textCol)).as("ws"))
      .filter(size(col("ws")) > 0)
      .select(col("doc_id"), col("ws"), size(col("ws")).as("n"))
      // starts at 0, stride, 2·stride, … while start < n (sequence's
      // inclusive stop n-1 ≡ range-exclusive n for positive strides)
      .select(col("doc_id"), col("ws"), col("n"),
        posexplode(sequence(lit(0), col("n") - 1, lit(stride)))
          .as(Seq("chunk_idx", "s")))
      .select(col("doc_id"), col("chunk_idx"),
        least(lit(chunkSize), col("n") - col("s")).cast("int").as("n_tok"),
        concat_ws(" ", slice(col("ws"), col("s") + 1, lit(chunkSize)))
          .as("chunk_text"))
  }

  /**
   * Flag corpus documents sharing at least one word-`gramN`-gram with
   * a benchmark set — the eval-decontamination screen. The benchmark
   * side arrives as (any id, text) rows; its distinct gram set is the
   * join build side. Exact string grams here (oracle-able); at corpus
   * scale swap [[Dedup.shinglesCol]] hashed grams in for fixed-width
   * join keys — same shape, 8 bytes per key.
   *
   * @return (doc_id, hits): corpus documents with >= 1 shared gram,
   *         hits = number of DISTINCT shared grams
   */
  def contaminatedDocs(corpus: DataFrame, idCol: String, textCol: String,
      benchmark: DataFrame, benchTextCol: String, gramN: Int = 8): DataFrame = {
    val corpusGrams = corpus
      .select(col(idCol).as("doc_id"), wordTokens(col(textCol)).as("ws"))
      .select(col("doc_id"), explode(wordGrams(col("ws"), gramN)).as("g"))
    val benchGrams = benchmark
      .select(explode(wordGrams(wordTokens(col(benchTextCol)), gramN)).as("g"))
      .distinct()
    // per-doc grams are array_distinct'd, so count(*) == distinct hits
    corpusGrams.join(benchGrams, "g")
      .groupBy("doc_id").agg(count(lit(1)).as("hits"))
  }

  /**
   * Gopher/MassiveText-style repetition signals, the quality-filter
   * stage that screens boilerplate and degenerate generations before
   * training: per document, the distinct-unigram ratio (low ⇒ loops),
   * the most-frequent-token mass fraction (high ⇒ one token dominates)
   * and the duplicate-trigram fraction (high ⇒ copied spans). All
   * per-ROW array arithmetic — no shuffle of any kind, embarrassingly
   * parallel, column expressions end to end. The top-token count is a
   * longest-run fold over the SORTED token array — O(n log n) per row,
   * safe for arbitrarily long documents (a naive per-distinct-token
   * frequency scan would be O(distinct·n), quadratic on a
   * pathological loop document — exactly the input this screen
   * exists to catch).
   *
   * @return (doc_id, n_tok, distinct_ratio, top_token_frac,
   *         dup_trigram_frac), ratios rounded to 4 decimals
   */
  def repetitionStats(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val ws = col("ws")
    val n = size(ws).cast("double")
    // non-distinct trigram list — multiplicity matters here, unlike the
    // dedup shingle sets
    val tris = when(size(ws) >= 3,
      transform(sequence(lit(1), size(ws) - 2), i => concat_ws(" ", slice(ws, i, lit(3)))))
      .otherwise(array().cast("array<string>"))
    // longest run in the sorted tokens == max frequency of any token
    val topCount = aggregate(
      sort_array(ws),
      struct(lit("").as("prev"), lit(0).as("run"), lit(0).as("best")),
      (acc, x) => {
        val run = when(x === acc.getField("prev"),
          acc.getField("run") + 1).otherwise(lit(1))
        struct(x.as("prev"), run.as("run"),
          greatest(acc.getField("best"), run).as("best"))
      },
      acc => acc.getField("best"))
    df.select(col(idCol).as("doc_id"), wordTokens(col(textCol)).as("ws"))
      .filter(size(ws) > 0)
      .select(col("doc_id"), ws, tris.as("tris"))
      .select(
        col("doc_id"),
        size(ws).as("n_tok"),
        round(size(array_distinct(ws)) / n, 4).as("distinct_ratio"),
        round(topCount / n, 4).as("top_token_frac"),
        round(when(size(col("tris")) === 0, 0.0)
          .otherwise((size(col("tris")) - size(array_distinct(col("tris"))))
            / size(col("tris")).cast("double")), 4).as("dup_trigram_frac"))
  }

  /**
   * Temperature-rebalanced corpus sampling (the XLM-R-style mixing
   * stage): downsample over-represented strata toward the τ=0.5
   * distribution by keeping each stratum at rate sqrt(n_min/n_s) — the
   * smallest stratum keeps everything, a stratum k× larger keeps
   * 1/sqrt(k), flattening counts to sqrt(n_min·n_s). Membership is the
   * repo's standard DETERMINISTIC multiplicative-hash sampler (Knuth
   * 2654435761 mod 2^32, per-mille buckets): reproducible across
   * reruns, engines and partitionings — which is what makes a
   * data-DERIVED sampling rate still hash-gateable, and at 100 TB
   * means re-running the pipeline selects the same documents.
   *
   * Plan shape: one tiny per-stratum count aggregate (rows = distinct
   * strata) broadcast back onto the corpus; the corpus itself never
   * shuffles — filter + project only.
   */
  def temperatureSample(df: DataFrame, idCol: String, stratumCol: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window.partitionBy(lit(0))
    val thresholds = df.groupBy(col(stratumCol)).agg(count(lit(1)).as("n"))
      .withColumn("thr",
        floor(lit(1000) * sqrt(min(col("n")).over(w).cast("double") / col("n"))))
      .select(col(stratumCol), col("thr"))
    val bucket = hashBucket(col(idCol), 1000)
    df.join(broadcast(thresholds), stratumCol)
      .filter(bucket < col("thr"))
      .select(col(idCol), col(stratumCol))
  }

  /**
   * Efraimidis–Spirakis weighted sampling without replacement (A-ES,
   * Inf. Process. Lett. 97(5) 2006): each row draws key = u^(1/w) for
   * uniform u, and the k LARGEST keys are the sample — inclusion
   * probability ∝ weight, exactly, without replacement. The training-
   * data use: "sample k documents ∝ quality/source weight" with a
   * result that is REPRODUCIBLE, because u is the repo's standard
   * deterministic multiplicative-hash uniform, not a seeded RNG — at
   * 100 TB the same pipeline rerun must select the same rows on any
   * engine and any partitioning.
   *
   * Ranking uses a log transform of u^(1/w) (same order, no pow) in an
   * EXACT ARITHMETIC REGIME — no libm: with the hash bucket h ∈
   * [0, 2³²) and m = 2h+1 (so u = m/2³³), the key is
   *
   *   qlog2(u)/w,   qlog2(u) = bitlen(m) − 35 + m / 2^(bitlen(m)−1)
   *
   * — Mitchell's piecewise-linear log2 (IRE Trans. EC-11, 1962):
   * strictly increasing in u, exact at every power of two, linear
   * between. Every step is EXACT in IEEE doubles (m < 2³³ and its
   * power-of-two divisor are exactly representable; the quotient has
   * ≤33 significant bits; the integer offset adds ≤6 more), and the
   * single final division by w is one correctly-rounded op on
   * engine-identical operands — so skey is BIT-IDENTICAL on any
   * engine, with no rounding step at all. (The earlier ln(u)-based
   * spelling rounded to 6dp, but libm ln can straddle a half-boundary
   * of that grid across engines — the float-libm regime the house
   * discipline bans.) A monotone approximation of ln keeps the A-ES
   * weighting property: heavier w still compresses the key toward 0
   * identically for every row.
   *
   * Plan shape: map-side key computation + `orderBy(...).limit(k)` =
   * TakeOrderedAndProject — per-partition top-k, only k rows per
   * partition travel; the corpus itself never shuffles.
   *
   * @return (id, w, skey) — the k sampled rows, largest keys first by
   *         construction of the limit; rows with w <= 0 are never
   *         sampled (zero weight = zero inclusion probability)
   */
  def weightedSample(df: DataFrame, idCol: String, weightCol: String,
      k: Int): DataFrame = {
    require(k > 0, s"sample size k=$k must be > 0")
    val h = pmod((col(idCol) % lit(1000003L)) * lit(2654435761L),
      lit(4294967296L))
    df.filter(col(weightCol) > 0)
      .select(col(idCol).as("id"), col(weightCol).cast("double").as("w"),
        (h * 2 + 1).as("m"))
      .withColumn("bl", length(bin(col("m"))))
      .withColumn("skey",
        (col("bl").cast("double") - lit(35.0) +
          col("m").cast("double") /
            expr("cast(shiftleft(cast(1 as bigint), bl - 1) as double)"))
          / col("w"))
      .select("id", "w", "skey")
      .orderBy(col("skey").desc, col("id"))
      .limit(k)
  }

  /**
   * Sequence packing: assign documents to fixed-capacity token bins —
   * the packing step that turns variable-length documents into dense
   * fixed-length training sequences. Documents are hashed into
   * `groups` independent pack-groups and packed WITHIN each group by
   * cumulative token count (bin = exclusive-prefix-sum div capacity,
   * all integer arithmetic): shard-local packing, embarrassingly
   * parallel — each group's running sum is its own window partition,
   * so no global single-partition scan exists at any scale; more
   * groups = more parallelism and marginally more boundary waste,
   * which is how production packers shard too. Deterministic: group
   * and order are functions of the id.
   *
   * @return (doc_id, n_tok, grp, bin) — bin numbering local to grp
   */
  def packSequences(df: DataFrame, idCol: String, textCol: String,
      capacity: Int = 256, groups: Int = 8): DataFrame = {
    require(capacity > 0 && groups > 0, s"need capacity=$capacity > 0, groups=$groups > 0")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("grp").orderBy("doc_id")
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    df.select(col(idCol).as("doc_id"),
        size(wsTokens(col(textCol))).cast("long").as("n_tok"))
      .filter(col("n_tok") > 0)
      .withColumn("grp", hashBucket(col("doc_id"), groups).cast("long"))
      .withColumn("cs", coalesce(sum(col("n_tok")).over(w), lit(0L)))
      // `div`: integer division — exact at any cumulative-sum magnitude
      // (a double `/` would lose low bits past 2^53)
      .withColumn("bin", expr(s"cs div ${capacity}L"))
      .select("doc_id", "n_tok", "grp", "bin")
  }

  /**
   * Materialize packed bins as shard rows: the documents of each
   * (group, bin) concatenated in doc_id order with an end-of-document
   * separator — the text that actually gets tokenized into one
   * training sequence. Deterministic (sorted-struct fold, not
   * collect order); one shuffle on the (grp, bin) key, whose
   * cardinality is corpus_tokens / capacity.
   *
   * @return (grp, bin, n_docs, shard_text)
   */
  def packShards(df: DataFrame, idCol: String, textCol: String,
      capacity: Int = 256, groups: Int = 8, sep: String = "<|eod|>"): DataFrame = {
    val assigned = packSequences(df, idCol, textCol, capacity, groups)
      .join(df.select(col(idCol).as("doc_id"), col(textCol).as("text")), "doc_id")
    assigned.groupBy("grp", "bin")
      .agg(count(lit(1)).as("n_docs"),
        sort_array(collect_list(struct(col("doc_id"), col("text")))).as("dts"))
      .select(col("grp"), col("bin"), col("n_docs"),
        array_join(transform(col("dts"), x => x.getField("text")), sep)
          .as("shard_text"))
  }

  /**
   * Crawl-style URL canonicalization, the key function under
   * canonical-URL dedup (the cheapest dedup pass a web corpus runs,
   * before any content hashing): strip scheme and fragment, lowercase
   * the host and drop default ports, strip trailing path slashes,
   * drop `utm_*` tracking parameters and sort the survivors so
   * parameter order cannot split a group. Pure per-row regex/array
   * arithmetic — codegen-friendly, no UDF, no shuffle — so at 100 TB
   * this runs entirely map-side ahead of the one dedup shuffle on the
   * canonical key.
   */
  def canonicalizeUrl(u: Column): Column = {
    val noScheme = regexp_replace(u, "^[a-zA-Z][a-zA-Z0-9+.-]*://", "")
    val noFrag = regexp_replace(noScheme, "#.*$", "")
    val host = lower(regexp_replace(
      regexp_extract(noFrag, "^([^/?]+)", 1), ":(80|443)$", ""))
    val path = regexp_replace(
      regexp_extract(noFrag, "^[^/?]+([^?]*)", 1), "/+$", "")
    val query = regexp_extract(noFrag, "\\?(.*)$", 1)
    val params = filter(split(query, "&"),
      p => !p.startsWith("utm_") && p =!= "")
    val sortedQ = array_join(sort_array(params), "&")
    concat(host, path,
      when(sortedQ === "", lit("")).otherwise(concat(lit("?"), sortedQ)))
  }

  /**
   * C4-style text normalization, the cleaning stage ahead of dedup
   * and filtering: strip control characters, collapse whitespace runs
   * to single spaces, trim. Pure per-row regex arithmetic (Java and
   * RE2 agree on these classes, so the stage is oracle-able);
   * normalizing BEFORE hashing/shingling is what makes exact dedup
   * see through formatting-only differences.
   *
   * @return (doc_id, clean_text, n_chars_removed)
   */
  def normalizeText(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val stripped = regexp_replace(col(textCol), "[\\x00-\\x1F\\x7F]", " ")
    val collapsed = trim(regexp_replace(stripped, " {2,}", " "))
    df.select(col(idCol).as("doc_id"), collapsed.as("clean_text"),
      (length(col(textCol)) - length(collapsed)).as("n_chars_removed"))
  }

  /**
   * The Gopher-rule filtering DECISION over [[repetitionStats]]:
   * per document, accept/reject plus the list of failed rules (in
   * fixed rule order — the actionable output a curation pipeline
   * writes next to each document). Thresholds are the classic
   * MassiveText-style screens; compare on the rounded signals so the
   * decision is engine-reproducible.
   *
   * @return (doc_id, accepted, reasons)
   */
  def qualityFilter(df: DataFrame, idCol: String, textCol: String,
      minTokens: Int = 15, minDistinctRatio: Double = 0.3,
      maxTopTokenFrac: Double = 0.2, maxDupTrigramFrac: Double = 0.5): DataFrame = {
    val stats = repetitionStats(df, idCol, textCol)
    val rules = array(
      when(col("n_tok") < minTokens, lit("too_short")),
      when(col("distinct_ratio") < minDistinctRatio, lit("low_diversity")),
      when(col("top_token_frac") > maxTopTokenFrac, lit("token_dominance")),
      when(col("dup_trigram_frac") > maxDupTrigramFrac, lit("repeated_spans")))
    stats.select(col("doc_id"),
        filter(rules, x => x.isNotNull).as("reasons"))
      .select(col("doc_id"), (size(col("reasons")) === 0).as("accepted"),
        col("reasons"))
  }

  /**
   * The curation dashboard: per corpus source, document counts,
   * accept/reject tallies per Gopher rule, and the total token mass —
   * the report a pipeline owner reads to see WHICH feed is producing
   * rejects before re-crawling it. Composes [[repetitionStats]] +
   * [[qualityFilter]] and reduces to one row per source; every output
   * is an integer count (rates are left to the reader — integer
   * tallies hash-gate exactly, engine-divided rates invite float
   * drift for no information gain). One corpus pass, one
   * source-keyed map-side-combined aggregate; documents with no word
   * tokens are outside the screen's domain and are not counted.
   *
   * @return (source, n_docs, n_accepted, n_too_short,
   *         n_low_diversity, n_token_dominance, n_repeated_spans,
   *         sum_tokens) — reject tallies overlap when a document
   *         fails several rules
   */
  def curationReport(df: DataFrame, idCol: String, textCol: String,
      sourceCol: String): DataFrame = {
    val stats = repetitionStats(df, idCol, textCol).select(col("doc_id"), col("n_tok"))
    val decisions = qualityFilter(df, idCol, textCol)
    val reason = (r: String) =>
      sum(when(array_contains(col("reasons"), r), 1L).otherwise(0L))
    df.select(col(idCol).as("doc_id"), col(sourceCol).as("source"))
      .join(stats, "doc_id").join(decisions, "doc_id")
      .groupBy("source")
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("accepted"), 1L).otherwise(0L)).as("n_accepted"),
        reason("too_short").as("n_too_short"),
        reason("low_diversity").as("n_low_diversity"),
        reason("token_dominance").as("n_token_dominance"),
        reason("repeated_spans").as("n_repeated_spans"),
        sum(col("n_tok")).cast("long").as("sum_tokens"))
  }

  /** A benchmark set derived from the corpus itself for the
    * oracle-gated key: every 10th document's tokens 11..40 as a
    * 30-token "benchmark passage" — planted leakage whose source
    * documents must be flagged (and, at 8-gram granularity over this
    * synthetic vocabulary, essentially only they will be). */
  def plantedBenchmark(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.select(col(idCol).as("bench_id"), wordTokens(col(textCol)).as("ws"))
      .filter(col("bench_id") % 10 === 0 && size(col("ws")) >= 40)
      .select(col("bench_id"), concat_ws(" ", slice(col("ws"), 11, 30)).as("bench_text"))

  /**
   * The first `numMerges` BPE (byte-pair-encoding) merge rules learned
   * from the corpus — the core loop of tokenizer training. Classic
   * algorithm: words become character sequences; each round counts
   * adjacent token pairs weighted by word frequency, picks the most
   * frequent (ties broken (count desc, lhs asc, rhs asc) — a total
   * order, so the learned rules are deterministic), and merges its
   * non-overlapping occurrences left-to-right.
   *
   * Scale design: the corpus is read ONCE (a map-side-combined word
   * count); every counting pass then iterates over the DISTINCT-WORD
   * table, which is vocabulary-sized, not corpus-sized — the reason
   * BPE training is tractable at all. Counting passes are BATCHED:
   * one distributed pair-count collects the top-M stale counts, and
   * the driver then accepts as many merge steps from that one list as
   * remain PROVABLY identical to step-by-step recounting (see
   * [[bpeTrain]]'s safe-prefix argument), so the job count is
   * O(merges / batch), not O(merges). The merge APPLY is a per-row
   * array fold, fully distributed. At 100 TB one would additionally
   * cap or sample the word table (standard practice); the loop itself
   * is unchanged.
   *
   * The left-to-right fold (merge into `acc` when `last(acc) = lhs ∧
   * x = rhs`) implements exactly the "greedy non-overlapping"
   * semantics: within any run of consecutive match positions it
   * merges the 1st, 3rd, 5th… — the invariant the oracle reproduces
   * with a run/rank window selection.
   *
   * @return (step, lhs, rhs, cnt) — one row per learned merge rule,
   *         step counting from 1; fewer rows if the corpus runs out
   *         of repeated pairs first
   */
  def bpeMerges(df: DataFrame, idCol: String, textCol: String,
      numMerges: Int = 3): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    bpeTrain(df, textCol, numMerges)._1.toDF("step", "lhs", "rhs", "cnt")
  }

  /** The BPE training loop shared by [[bpeMerges]] (which returns the
    * learned rules) and [[bpeEncode]] (which also needs the final
    * per-word segmentation): the merge table plus the word table with
    * its `toks` column after all merges applied.
    *
    * BATCHED counting with a sequential-equivalence proof. One
    * distributed pass collects the top-M stale pair counts; the driver
    * then accepts a PREFIX of that list as merge steps, stopping the
    * moment the next step's argmax can no longer be decided from stale
    * counts. Applying merge (l, r) can change the count of a pair
    * (x, y) only when:
    *  - x or y is l, r, or the concatenated token l+r (occurrences
    *    consumed, or — when l+r collides with a pre-existing token
    *    string — created): a candidate whose tokens touch any accepted
    *    merge's {l, r, l+r} set is unsafe and ENDS the batch (it sits
    *    in stale order ahead of everything later, so skipping instead
    *    of stopping could mask the true argmax);
    *  - (x, y) is newly created, of the form (x, l+r) or (l+r, y):
    *    each created instance comes from a stale adjacency (x, l) or
    *    (r, y), so its count is bounded by the largest STALE count
    *    among pairs with rhs = l or lhs = r (pairs beyond the
    *    collected M bounded by the M-th count). A candidate is
    *    accepted only while its stale count is STRICTLY above every
    *    such creation bound, so no created pair can outrank or tie it
    *    (a tie would need the (cnt, lhs, rhs) order, which an upper
    *    bound cannot resolve).
    * One could worry the two cases COMBINE — a created (x, l+r) whose
    * string key equals a surviving STALE pair's key would carry
    * stale + created occurrences, exceeding the per-case bound. The
    * unique-tiling lemma rules that out: within a word, a merge can
    * only alter the tokens of a char span by consuming a token at its
    * boundary (the greedy fold's state entering a span is just
    * last(acc), i.e. the span's left neighbor), so every char span
    * that is cleanly tiled by whole tokens is tokenized as a pure
    * function of (its characters, the merge sequence) — identically in
    * every context. A stale pair (x, s) needs spans tiling s as the
    * single token s while a created one needs spans tiling the same
    * string s as [l, r] under the same merge prefix — contradiction,
    * so at any time at most one decomposition of any string carries a
    * nonzero count and the case bounds never need to be summed
    * (cross-checked by a 200k-corpus driver-side search for a
    * divergence, none found).
    * All other counts are invariant, and candidates are scanned in the
    * exact (cnt desc, lhs asc, rhs asc) tie-break order, so the
    * accepted prefix reproduces step-by-step recounting verbatim — the
    * property the DuckDB oracle (which replays the sequential
    * algorithm) checks end-to-end, and BpeBatchEquivalence fuzzes
    * against a driver-side sequential reference. The first candidate
    * of every batch is always safe, so each pass advances ≥ 1 step:
    * the distributed job count is O(merges / batch), worst case
    * numMerges, typically far fewer. */
  /** The word-frequency table with per-word character token arrays —
    * the BPE train loop's initial state. */
  private def bpeWordTable(df: DataFrame, textCol: String): DataFrame =
    df.select(explode(wordTokens(col(textCol))).as("word"))
      .groupBy("word").agg(count(lit(1)).as("freq"))
      .withColumn("toks",
        expr("transform(sequence(1, length(word)), i -> substring(word, i, 1))"))

  /** One BPE pass's adjacent-pair aggregate over the current word
    * table: (lhs, rhs, cnt) with cnt = frequency-weighted occurrence
    * count. Shared verbatim between [[bpeTrain]]'s per-pass top-M
    * collect and [[bpePairCount]] (the workload-count instrument), so
    * the instrument measures exactly the cardinality the train loop
    * aggregates over and cannot drift from it. */
  private def bpePairAgg(words: DataFrame): DataFrame = words
    .filter(size(col("toks")) >= 2)
    .select(col("freq"), explode(expr(
      "transform(sequence(1, size(toks) - 1)," +
        " i -> struct(element_at(toks, i) AS lhs, element_at(toks, i + 1) AS rhs))")).as("p"))
    .groupBy(col("p.lhs").as("lhs"), col("p.rhs").as("rhs"))
    .agg(sum(col("freq")).as("cnt"))

  /** Pass-1 DISTINCT adjacent-pair cardinality over the corpus — the
    * group count of [[bpePairAgg]] on the initial character-token
    * word table. This is the quantity a degenerate tokenizer explodes
    * (the per-pass aggregate's state size and the top-M collect's
    * input); it is VOCABULARY-bounded (≤ distinct-symbol², not corpus-
    * sized), so on a growing corpus with a stable character set it
    * should stay ~flat — Bench's `wl` gate pins that expectation. */
  def bpePairCount(df: DataFrame, textCol: String): Long =
    bpePairAgg(bpeWordTable(df, textCol)).count()

  private[operators] def bpeTrain(df: DataFrame, textCol: String, numMerges: Int)
      : (Seq[(Int, String, String, Long)], DataFrame, Int) = {
    def lit1(s: String) = "'" + s.replace("\\", "\\\\").replace("'", "\\'") + "'"
    var words = bpeWordTable(df, textCol)
    val merges = Seq.newBuilder[(Int, String, String, Long)]
    var step = 1
    var passes = 0 // distributed pair-count passes — the batching's whole point
    var exhausted = false
    val m = math.max(64, 8 * numMerges) // top-M stale window per pass
    while (step <= numMerges && !exhausted) {
      passes += 1
      val top = bpePairAgg(words)
        .orderBy(col("cnt").desc, col("lhs").asc, col("rhs").asc)
        .limit(m).collect()
        .map(r => (r.getString(0), r.getString(1), r.getLong(2)))
      if (top.isEmpty) exhausted = true
      else {
        // pairs past the collected window are bounded by the M-th count
        val unseenBound = if (top.length == m) top.last._3 else 0L
        var touched = Set.empty[String] // {l, r, l+r} of accepted merges
        var creationBound = -1L         // max possible created-pair count
        var stop = false
        val it = top.iterator
        while (!stop && step <= numMerges && it.hasNext) {
          val (l, r, cnt) = it.next()
          if (touched(l) || touched(r)) stop = true
          else if (creationBound >= 0 && cnt <= creationBound) stop = true
          else {
            merges += ((step, l, r, cnt))
            step += 1
            touched ++= Set(l, r, l + r)
            creationBound = math.max(creationBound,
              top.iterator.filter(p => p._2 == l || p._1 == r)
                .map(_._3).foldLeft(unseenBound)(math.max))
            // greedy left-to-right merge of (l, r): the AND
            // short-circuits, so element_at(acc, -1) never sees an
            // empty acc under ANSI
            words = words.withColumn("toks", expr(
              s"""aggregate(toks, cast(array() as array<string>),
                  (acc, x) -> if(size(acc) > 0 AND element_at(acc, -1) = ${lit1(l)}
                                  AND x = ${lit1(r)},
                                concat(slice(acc, 1, size(acc) - 1), array(${lit1(l + r)})),
                                concat(acc, array(x))))"""))
          }
        }
        // one materialization per BATCH (not per merge): the next pass
        // counts over the folded result instead of re-deriving the
        // whole in-batch merge chain per row
        words = words.localCheckpoint()
      }
    }
    (merges.result(), words, passes)
  }

  /**
   * Encode the corpus with a freshly-trained BPE segmentation: per
   * document, the word count and the total BPE token count after
   * `numMerges` learned merges — the sequence-length accounting a
   * training pipeline runs to budget context windows after switching
   * tokenizers. The encode itself is a join of the corpus' exploded
   * words against the trained word table's per-word token counts
   * (vocabulary-sized build side — broadcastable at any corpus scale)
   * plus one doc-keyed sum; no text re-segmentation happens per
   * document row.
   *
   * @return (doc_id, n_words, n_bpe_tokens) for documents with at
   *         least one word token
   */
  def bpeEncode(df: DataFrame, idCol: String, textCol: String,
      numMerges: Int = 3): DataFrame = {
    val (_, words, _) = bpeTrain(df, textCol, numMerges)
    val wc = words.select(col("word"), size(col("toks")).as("n_tok"))
    df.select(col(idCol).as("doc_id"), explode(wordTokens(col(textCol))).as("word"))
      .join(wc, "word")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_words"),
        sum(col("n_tok")).cast("long").as("n_bpe_tokens"))
  }

  /**
   * Corpus vocabulary: the `maxVocab` most frequent word tokens with
   * dense token ids — the word-level precursor every tokenizer
   * training run starts from. The count is the canonical map-side-
   * combined aggregate (one thin (word, count) shuffle regardless of
   * corpus size); the top-N is TakeOrdered (per-partition heaps, no
   * global sort materialization); only the ≤`maxVocab`-row survivor
   * set — vocabulary-sized, not corpus-sized, by definition — passes
   * through the single-partition id-assignment window. Ties at the
   * boundary are broken (count desc, word asc), a total order, so the
   * vocabulary is deterministic at any scale.
   *
   * @return (token_id, word, cnt) — token_id dense from 0
   */
  def buildVocab(df: DataFrame, textCol: String, maxVocab: Int = 1000): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("cnt").desc, col("word").asc)
    df.select(explode(wordTokens(col(textCol))).as("word"))
      .groupBy("word").agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("word").asc).limit(maxVocab)
      .select((row_number().over(w) - 1).as("token_id"), col("word"), col("cnt"))
  }

  /**
   * Deterministic train/val/test split assignment by document id:
   * the same Knuth multiplicative-hash bucket the sampling operators
   * use ([[hashBucket]]), mod 100, cut at `trainPct` and
   * `trainPct + valPct`. Hash-based (not random) so the split is
   * stable under reruns, re-partitioning, and corpus appends — the
   * property a training pipeline needs so a document never migrates
   * between train and eval. Pure per-row arithmetic; zero shuffles.
   *
   * @return (doc_id, bucket, split)
   */
  def assignSplits(df: DataFrame, idCol: String,
      trainPct: Int = 98, valPct: Int = 1): DataFrame = {
    val bucket = hashBucket(col(idCol), 100)
    df.select(col(idCol).as("doc_id"), bucket.cast("int").as("bucket"),
      when(bucket < trainPct, lit("train"))
        .when(bucket < trainPct + valPct, lit("val"))
        .otherwise(lit("test")).as("split"))
  }

  /**
   * Corpus document-frequency statistics: for the `topN` highest-df
   * word tokens, the document count containing them and a stopword
   * flag (`df·2 > n_docs` — present in a majority of documents; the
   * comparison is integer so the flag is engine-exact). This is the
   * df side of every prefix/blacklist filter the dedup family uses,
   * surfaced as its own corpus profile. One thin (word, df) shuffle
   * (distinct word per doc first, a per-row array op); the corpus
   * count broadcasts as a 1-row join.
   *
   * @return (word, df, is_stopword), top `topN` by (df desc, word asc)
   */
  def dfStats(df: DataFrame, idCol: String, textCol: String,
      topN: Int = 200): DataFrame = {
    val nDocs = df.select(count(lit(1)).as("n_docs"))
    df.select(explode(array_distinct(wordTokens(col(textCol)))).as("word"))
      .groupBy("word").agg(count(lit(1)).as("df"))
      .crossJoin(broadcast(nDocs))
      .select(col("word"), col("df"), (col("df") * 2 > col("n_docs")).as("is_stopword"))
      .orderBy(col("df").desc, col("word").asc).limit(topN)
  }

  /**
   * Per-document distinctive terms: the `k` terms with the highest
   * tf/df ratio (term frequency in the document over corpus document
   * frequency — tf·idf with the idf linear instead of logarithmic,
   * which keeps the score an IEEE division of two integers, bit-equal
   * on any engine, where log(N/df) invites libm divergence). Ranking
   * ties break (score desc, term asc) — total order, deterministic.
   * Two thin shuffles (term-level tf and df aggregates meet on the
   * term key) plus the per-document ranking window; the score itself
   * stays internal — the output is all integers and strings.
   *
   * @return (doc_id, term, tf, df, rank) — rank 1..k per document
   */
  def tfidfTerms(df: DataFrame, idCol: String, textCol: String,
      k: Int = 3): DataFrame = {
    val toks = df.select(col(idCol).as("doc_id"),
      explode(wordTokens(col(textCol))).as("term"))
    val tf = toks.groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
    val dfreq = toks.select("doc_id", "term").distinct()
      .groupBy("term").agg(count(lit(1)).as("df"))
    val w = org.apache.spark.sql.expressions.Window.partitionBy("doc_id")
      .orderBy((col("tf").cast("double") / col("df")).desc, col("term").asc)
    tf.join(dfreq, "term")
      .select(col("doc_id"), col("term"), col("tf"), col("df"),
        row_number().over(w).as("rank"))
      .filter(col("rank") <= k)
  }

  /**
   * BM25 document retrieval for a fixed term query — the lexical half
   * of every retrieval/RAG stack, and the ranking function behind
   * corpus search tooling. Okapi BM25 with k1=1.2, b=0.75, computed in
   * an ALL-INTEGER regime so the scores (and therefore the ranking)
   * are bit-identical on any engine:
   *
   *  - idf is the linear `N/df` (scaled ×1000, integer division) —
   *    the same linear-idf compromise [[tfidfTerms]] documents, since
   *    log-idf would hang a hash gate on libm ulps;
   *  - the length normalisation `1−b+b·dl/avgdl` is `norm_milli =
   *    250 + (750·dl·1000) div avgdl_milli` with `avgdl_milli =
   *    (Σdl·1000) div N` — integer division throughout, so the
   *    (small, deterministic) quantisation error is identical on
   *    both engines;
   *  - the tf saturation `tf·(k1+1)/(tf+k1·norm)` becomes
   *    `(tf·2200·1000) div (tf·1000 + (1200·norm_milli) div 1000)`.
   *
   * Score = Σ_terms idf_milli · saturation_milli, a long. Overflow
   * headroom: tf·2200·1000 stays under 2^63 for documents up to ~4e12
   * tokens; idf_milli·sat ≤ (1000·N)·2200·1000 needs N ≤ ~4e12 docs.
   *
   * Scale shape: the per-(doc, term) tf aggregate touches only rows
   * whose token IS a query term (the filter runs before the shuffle,
   * so the corpus explode never shuffles in full); df and the corpus
   * length stats are tiny aggregates that broadcast back; the final
   * ranking window moves one thin row per scoring document.
   *
   * @return (doc_id, n_terms_hit, bm25_micro, rank) — top `k` by
   *         (score desc, doc_id asc)
   */
  def bm25TopK(df: DataFrame, idCol: String, textCol: String,
      queryTerms: Seq[String], k: Int = 10): DataFrame = {
    require(queryTerms.nonEmpty, "bm25TopK needs at least one query term")
    val toks = bm25Toks(df, idCol, textCol)
    val tf = bm25CandidatesFromToks(toks, queryTerms)
    // per-term df is identical whether counted before or after the
    // query filter (df is a property of the term), so the direct path
    // counts it on the already-filtered rows
    val dfreq = tf.groupBy("term").agg(count(lit(1)).as("df"))
    bm25Score(tf, dfreq, bm25Stats(toks), k)
  }

  /**
   * The post-term-filter posting rows [[bm25TopK]] scores — the BM25
   * workload-count instrument (Bench's `wl` gate): this cardinality is
   * what a broken pre-shuffle term filter or a tokenizer regression
   * inflates, it is deterministic run to run, and with a FIXED query
   * set it stays ~constant as the corpus grows (the per-query serving
   * cost a 100 TB deployment actually watches). Shares
   * [[bm25CandidatesFromToks]] with the measured pipeline so the
   * instrument cannot drift from the plan (the
   * [[graft.operators.Dedup.minhashCandidates]] discipline).
   */
  def bm25Candidates(df: DataFrame, idCol: String, textCol: String,
      queryTerms: Seq[String]): DataFrame = {
    require(queryTerms.nonEmpty, "bm25Candidates needs at least one query term")
    bm25CandidatesFromToks(bm25Toks(df, idCol, textCol), queryTerms)
  }

  /** The shared candidate stage: posting rows restricted to the query
    * terms — the filter runs BEFORE any shuffle of the exploded corpus. */
  private def bm25CandidatesFromToks(toks: DataFrame,
      queryTerms: Seq[String]): DataFrame =
    bm25Postings(toks).filter(col("term").isin(queryTerms: _*))

  /** (doc_id, ws) non-empty token arrays — the shared BM25 tokenization. */
  private def bm25Toks(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(col(idCol).as("doc_id"), wordTokens(col(textCol)).as("ws"))
      .filter(size(col("ws")) > 0)

  /** (doc_id, dl, term, tf) posting rows. */
  private def bm25Postings(toks: DataFrame): DataFrame =
    toks.select(col("doc_id"), size(col("ws")).cast("long").as("dl"),
        explode(col("ws")).as("term"))
      .groupBy("doc_id", "dl", "term").agg(count(lit(1)).as("tf"))

  /** 1-row (n_docs, avgdl_milli) corpus statistics. */
  private def bm25Stats(toks: DataFrame): DataFrame =
    toks.agg(count(lit(1)).as("n_docs"),
        sum(size(col("ws")).cast("long")).as("sum_dl"))
      .select(col("n_docs"), expr("sum_dl * 1000 div n_docs").as("avgdl_milli"))

  /** The integer BM25 scoring stage shared by the direct and the
    * serve-from-index paths (see [[bm25TopK]] for the regime). */
  private def bm25Score(tf: DataFrame, dfreq: DataFrame,
      stats: DataFrame, k: Int): DataFrame =
    tf.join(broadcast(dfreq), "term")
      .crossJoin(broadcast(stats))
      .withColumn("idf_milli", expr("n_docs * 1000 div df"))
      .withColumn("norm_milli", expr("250 + 750 * dl * 1000 div avgdl_milli"))
      .withColumn("part_micro", col("idf_milli") *
        expr("tf * 2200 * 1000 div (tf * 1000 + 1200 * norm_milli div 1000)"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_terms_hit"), sum("part_micro").as("bm25_micro"))
      // TakeOrdered first (per-partition top-k, no global sort), THEN the
      // rank window over only the k survivors — an unpartitioned window
      // over the full scoring set would drag every scoring document to
      // one partition
      .orderBy(col("bm25_micro").desc, col("doc_id").asc).limit(k)
      .withColumn("rank", row_number().over(
        org.apache.spark.sql.expressions.Window
          .orderBy(col("bm25_micro").desc, col("doc_id").asc)))

  /**
   * Inverted-index build for [[serveBm25]] — the build-once-serve-many
   * retrieval operating model ([[graft.operators.Similarity.buildIvfIndex]]'s
   * lexical twin): one corpus pass produces three plain DataFrames a
   * caller persists once (typically to native tables, term-sorted so
   * the sidecar zone maps give the serve path block pruning on the
   * term column) and serves forever — no tokenization, no corpus
   * pass, at query time.
   *
   * @return (postings (term, doc_id, dl, tf) — sorted by term so a
   *         term-clustered layout prunes; dict (term, df); stats
   *         1-row (n_docs, avgdl_milli))
   */
  def buildTextIndex(df: DataFrame, idCol: String, textCol: String)
      : (DataFrame, DataFrame, DataFrame) = {
    val toks = bm25Toks(df, idCol, textCol)
    val postings = bm25Postings(toks)
    val dict = postings.groupBy("term").agg(count(lit(1)).as("df"))
    (postings.select("term", "doc_id", "dl", "tf").orderBy("term", "doc_id"),
      dict, bm25Stats(toks))
  }

  /** Dict (term, df) derived from an already-persisted postings
    * artifact: df = posting rows per term, exactly how
    * [[buildTextIndex]] counts it — but over the written table instead
    * of re-running the corpus tokenize+explode lineage. */
  def dictFromPostings(postings: DataFrame): DataFrame =
    postings.groupBy("term").agg(count(lit(1)).as("df"))

  /** Corpus stats (n_docs, avgdl_milli) derived from an
    * already-persisted postings artifact. Equivalent to
    * [[buildTextIndex]]'s direct stats pass because every non-empty
    * document emits at least one posting row (any token is a term) and
    * `dl` is constant across a document's postings — so distinct
    * (doc_id → dl) recovers exactly the per-document lengths the
    * tokenize pass saw, without re-reading the corpus. */
  def statsFromPostings(postings: DataFrame): DataFrame =
    postings.groupBy("doc_id").agg(max(col("dl")).as("dl"))
      .agg(count(lit(1)).as("n_docs"), sum(col("dl")).as("sum_dl"))
      .select(col("n_docs"), expr("sum_dl * 1000 div n_docs").as("avgdl_milli"))

  /**
   * BM25 top-k answered from a persisted [[buildTextIndex]] artifact
   * alone: the query-term filter reaches the postings SCAN (with a
   * term-clustered native layout the zone maps skip every non-matching
   * block — the posting-list seek of a search engine, expressed as
   * filter pushdown), the dict probe is a broadcast, and the scoring
   * is byte-identical to [[bm25TopK]]'s integer regime — serve ≡
   * direct is pinned in LlmOpsSpec and by the q_bm25_index_persist
   * oracle gate.
   */
  def serveBm25(postings: DataFrame, dict: DataFrame, stats: DataFrame,
      queryTerms: Seq[String], k: Int = 10): DataFrame = {
    require(queryTerms.nonEmpty, "serveBm25 needs at least one query term")
    bm25Score(
      postings.filter(col("term").isin(queryTerms: _*))
        .select(col("doc_id"), col("dl"), col("term"), col("tf")),
      dict.filter(col("term").isin(queryTerms: _*)), stats, k)
  }

  /**
   * Reciprocal-rank fusion (Cormack et al., SIGIR 2009) of two ranked
   * lists — the standard hybrid-retrieval combiner (lexical BM25 ⊕
   * semantic ANN) every RAG stack runs, kept integer-exact: each
   * list contributes `1000000 div (60 + rank)` (the canonical RRF
   * constant 60, floor division instead of a double reciprocal) and
   * items missing from a list contribute 0 — so the fused score is a
   * long both engines compute identically. Both input lists are
   * top-N slices, i.e. tiny relative to the corpus; the fusion is a
   * full outer join on the item id over thin (id, rank) rows.
   *
   * @param a,b (id, rank) DataFrames — `rank` 1-based, ids unique per list
   * @return (id, rank_a, rank_b, rrf_micro, rank) — top `k` by
   *         (rrf desc, id asc); absent ranks are null
   */
  def rrfFuse(a: DataFrame, b: DataFrame, k: Int = 10): DataFrame = {
    val la = a.select(col(a.columns(0)).as("id"), col(a.columns(1)).cast("long").as("rank_a"))
    val lb = b.select(col(b.columns(0)).as("id"), col(b.columns(1)).cast("long").as("rank_b"))
    la.join(lb, Seq("id"), "full_outer")
      .withColumn("rrf_micro",
        coalesce(expr("1000000 div (60 + rank_a)"), lit(0L)) +
          coalesce(expr("1000000 div (60 + rank_b)"), lit(0L)))
      .withColumn("rank", row_number().over(
        org.apache.spark.sql.expressions.Window
          .orderBy(col("rrf_micro").desc, col("id").asc)))
      .filter(col("rank") <= k)
  }

  /**
   * Line/segment-level boilerplate removal (the CCNet/C4 crawl-cleaning
   * stage that strips repeated headers, footers and navigation chrome):
   * documents split into non-overlapping `segTokens`-token segments
   * (the final partial segment included — same windowing contract as
   * [[tokenChunks]]), a segment is boilerplate when it occurs in at
   * least ¼ of its SOURCE's documents (`df·4 ≥ n_src`, integer-exact),
   * and documents are reassembled from the surviving segments in
   * order. Per-source, not corpus-global, because chrome is a property
   * of the site template — the grouping every production boilerplate
   * filter uses.
   *
   * Scale shape: segments are thin (source, segment-text, doc) rows;
   * the df aggregate map-side combines; the boilerplate set is tiny
   * (high-df segments only) and broadcasts back as a left anti probe;
   * reassembly is one per-document aggregate. Documents whose every
   * segment was boilerplate survive with an empty clean text (the
   * left join back to the full id list), so the operator never drops
   * rows — downstream quality filters decide.
   *
   * @return (doc_id, clean_text, n_seg, n_dropped)
   */
  def stripBoilerplate(df: DataFrame, idCol: String, textCol: String,
      sourceCol: String, segTokens: Int = 5): DataFrame = {
    require(segTokens > 0, s"segTokens=$segTokens must be positive")
    val toks = df.select(col(idCol).as("doc_id"), col(sourceCol).as("source"),
      wordTokens(col(textCol)).as("ws"))
    val segs = toks.filter(size(col("ws")) > 0)
      .select(col("doc_id"), col("source"),
        posexplode(transform(
          sequence(lit(0), expr(s"(size(ws) - 1) div $segTokens")),
          i => concat_ws(" ", slice(col("ws"), i * segTokens + lit(1), lit(segTokens)))))
          .as(Seq("seg_idx", "seg")))
    val nSrc = toks.groupBy("source").agg(count(lit(1)).as("n_src"))
    val hot = segs.select("source", "seg", "doc_id").distinct()
      .groupBy("source", "seg").agg(count(lit(1)).as("seg_df"))
      .join(nSrc, "source")
      .filter(col("seg_df") * 4 >= col("n_src"))
      .select(col("source"), col("seg"), lit(true).as("bp"))
    val flagged = segs.join(hot, Seq("source", "seg"), "left")
    val rebuilt = flagged.groupBy("doc_id").agg(
      array_join(transform(
        array_sort(collect_list(when(col("bp").isNull,
          struct(col("seg_idx"), col("seg"))))),
        x => x("seg")), " ").as("clean_text"),
      count(lit(1)).as("n_seg"),
      sum(when(col("bp").isNotNull, 1L).otherwise(0L)).as("n_dropped"))
    // shuffle_merge: `rebuilt` reassembles documents inside an
    // aggregate, whose output-size estimate uses the STRING type's
    // constant defaultSize — Catalyst would underestimate this
    // corpus-scale table and broadcast it (see Dedup.corpusSide)
    toks.select("doc_id").join(rebuilt.hint("shuffle_merge"), Seq("doc_id"), "left")
      .select(col("doc_id"), coalesce(col("clean_text"), lit("")).as("clean_text"),
        coalesce(col("n_seg"), lit(0L)).as("n_seg"),
        coalesce(col("n_dropped"), lit(0L)).as("n_dropped"))
  }
}
