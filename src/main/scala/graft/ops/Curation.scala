package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus-curation operators for a web-scale training-data pipeline —
  * the cross-document complement of [[TextAnalysis]]'s per-document
  * signals. Three public-literature filters, each re-expressed as
  * shuffle-minimal Spark dataflow with an exact DuckDB oracle:
  *
  *  - [[sharedGramStats]]: per-doc fraction of word n-grams that occur
  *    in at least one OTHER document (the signal behind exact-substring
  *    training-data dedup, Lee et al. 2022 — approximated at n-gram
  *    granularity so it stays a bounded aggregation instead of a suffix
  *    array).
  *  - [[capPerSource]]: deterministic per-source document caps
  *    (RefinedWeb-style domain balancing), with a provably-exact
  *    hash-prefix pre-filter so no task ever sorts a whole mega-domain.
  *  - [[unigramRarity]]: corpus-trained unigram frequency statistics per
  *    doc (the CCNet idea — an LM-free perplexity proxy). Integer
  *    counts + single divisions only, so Spark partial aggregation and
  *    a sequential SQL oracle agree bit-exactly (no float log sums).
  *
  * Tokenization matches [[TextAnalysis.tokenCount]] (trimmed, split on
  * `\s+`) so the q12/q54/q55/q57 oracles share one word definition.
  */
object Curation {

  /** Trimmed whitespace word split; empty/blank text → empty array. */
  private[ops] def wordsCol(text: Column): Column =
    when(length(trim(text)) === 0, array().cast("array<string>"))
      .otherwise(split(trim(text), "\\s+"))

  /** Word n-grams as a pure Catalyst expression (transform + concat_ws —
    * no UDF, stays in whole-stage codegen). Docs shorter than n words →
    * empty array. Callers should materialize the words array in a prior
    * projection so common-subexpression elimination applies.
    */
  private[ops] def gramsCol(ws: Column, n: Int): Column =
    when(size(ws) < n, array().cast("array<string>"))
      .otherwise(transform(sequence(lit(0), size(ws) - n), i =>
        concat_ws(" ", (0 until n).map(j => element_at(ws, i + j + 1)): _*)))

  /** Per-document cross-corpus n-gram sharing: how many of this doc's
    * DISTINCT word n-grams appear in ≥ 2 documents corpus-wide. High
    * shared fraction ⇒ boilerplate / template / near-duplicate content
    * that survives doc-level dedup (Lee et al. 2022 found ~1 % of tokens
    * in C4 sit inside 60-token exact duplicates; the n-gram doc-frequency
    * is the bounded-memory version of that signal).
    *
    * Scale shape (all shuffles on hashed keys):
    *  1. distinct (doc, xxhash64(gram)) — dedups within-doc repeats so a
    *     pathological looping doc cannot inflate any gram's frequency;
    *  2. gram doc-frequency via `groupBy(gh).count()` — PARTIAL
    *     aggregation collapses even the hottest boilerplate gram
    *     map-side, so no task ever holds a Zipf-head posting list (a
    *     window over `gh` would put the hottest gram's ~corpus-size rows
    *     in ONE task — the round-4 scale-killer this replaced);
    *  3. join the counts back on gh — hot-key residual volume is the
    *     already-collapsed count table (one row per gram), and AQE
    *     skew-join splits the posting-list side of the head;
    *  4. groupBy doc — partial+final aggregation.
    * Gram keys are 64-bit xxhash64 (codegen'd) so the shuffle carries
    * 8-byte keys, not 3-word strings; at ~4×10⁹ distinct grams the
    * birthday collision odds (~0.4) begin to overcount `n_shared` by
    * ones — acceptable for a curation SIGNAL (the q55 oracle groups the
    * gram strings themselves and matches exactly at test scale).
    */
  def sharedGramStats(docs: DataFrame, n: Int = 3,
      idCol: String = "doc_id"): DataFrame = {
    val docGram = docs
      .select(col(idCol).as("doc_id"), wordsCol(col("text")).as("__ws"))
      .select(col("doc_id"), explode(gramsCol(col("__ws"), n)).as("gram"))
      .select(col("doc_id"), xxhash64(col("gram")).as("gh"))
      .distinct()
    // two consumers (the df aggregate and the join-back) share the SAME
    // distinct subtree — Spark's ReuseExchange computes the explode +
    // distinct shuffle once and feeds both branches from it, so no
    // checkpoint (and no second pass over the text) is needed
    val gramDf = docGram.groupBy("gh").agg(count(lit(1)).as("df"))
    val withDf = docGram.join(gramDf, Seq("gh"))
    val perDoc = withDf.groupBy("doc_id").agg(
      count(lit(1)).cast("int").as("n_distinct_grams"),
      sum(when(col("df") >= 2, 1L).otherwise(0L)).cast("int").as("n_shared_grams"))
    docs.select(col(idCol).as("doc_id")).join(perDoc, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_distinct_grams"), lit(0)).as("n_distinct_grams"),
        coalesce(col("n_shared_grams"), lit(0)).as("n_shared_grams"),
        when(coalesce(col("n_distinct_grams"), lit(0)) === 0, 0.0)
          .otherwise(col("n_shared_grams").cast("double") /
            col("n_distinct_grams").cast("double"))
          .as("shared_fraction"))
  }

  /** Positional exact-substring duplication (Lee et al. 2021,
    * "Deduplicating Training Data Makes Language Models Better": remove
    * exact ≥50-token substrings occurring twice, found with a single-node
    * suffix array). The Spark re-expression keeps the signal distributed
    * and POSITIONAL: for each doc, how many token positions sit inside
    * some length-`w` window whose exact token sequence appears in ≥ 2
    * distinct documents. Unlike [[sharedGramStats]] (distinct-gram
    * counting), this measures how much of the doc's actual text lies in
    * cross-doc duplicated spans — the quantity Lee et al. cut — so a doc
    * with one 500-token boilerplate block and a doc with 500 scattered
    * shared trigrams score very differently.
    *
    * Scale shape (same scale-safe discipline as [[sharedGramStats]]):
    *  1. one row per window START `(doc, pos, xxhash64(window))` — linear
    *     in corpus tokens; windows shuffle as 8-byte hashes;
    *  2. duplicated-window set via distinct (doc, wh) →
    *     `groupBy(wh).count()` — partial aggregation collapses Zipf-hot
    *     boilerplate windows map-side (never a window over the hash);
    *  3. join starts against the dup-hash set (AQE skew-split);
    *  4. per-doc interval-union length over the SORTED dup starts with
    *     array higher-order functions — the collected array is bounded by
    *     the doc's own token count, the same per-doc memory bound as
    *     holding its text.
    * Output: `(doc_id, n_tokens, n_dup_tokens, dup_fraction)`.
    */
  def substringDupStats(docs: DataFrame, w: Int = 10,
      idCol: String = "doc_id"): DataFrame = {
    require(w >= 2, s"window must be >= 2 tokens, got $w")
    val toks = docs
      .select(col(idCol).as("doc_id"), wordsCol(col("text")).as("__ws"))
      .select(col("doc_id"), size(col("__ws")).as("n_tokens"),
        gramsCol(col("__ws"), w).as("__grams"))
    val starts = toks
      .select(col("doc_id"), posexplode(col("__grams")).as(Seq("pos", "gram")))
      .select(col("doc_id"), col("pos"), xxhash64(col("gram")).as("wh"))
    val dupWh = starts.select("doc_id", "wh").distinct()
      .groupBy("wh").agg(count(lit(1)).as("df"))
      .filter(col("df") >= 2).select("wh")
    val dupStarts = starts.join(dupWh, Seq("wh")).select("doc_id", "pos")
    // interval union of [pos, pos+w) over sorted starts: each start
    // contributes min(w, nextStart - pos); the last contributes w (grams
    // are full windows, so pos + w <= n_tokens always — no clipping).
    // zip_with pads the shifted array with null and Spark's least() skips
    // nulls, so the last element falls out as w without a special case.
    val perDoc = dupStarts.groupBy("doc_id")
      .agg(sort_array(collect_set(col("pos"))).as("ps"))
      .select(col("doc_id"),
        aggregate(
          zip_with(col("ps"),
            slice(col("ps"), lit(2), greatest(size(col("ps")) - 1, lit(0))),
            (a, b) => least(lit(w), b - a)),
          lit(0L), (acc, x) => acc + x.cast("long"))
          .cast("int").as("n_dup_tokens"))
    toks.select("doc_id", "n_tokens").join(perDoc, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_tokens"),
        coalesce(col("n_dup_tokens"), lit(0)).as("n_dup_tokens"),
        when(col("n_tokens") === 0, 0.0)
          .otherwise(coalesce(col("n_dup_tokens"), lit(0)).cast("double") /
            col("n_tokens").cast("double"))
          .as("dup_fraction"))
  }

  /** Exact-substring DEDUP — the transform behind [[substringDupStats]]'s
    * signal: rewrite each document with its cross-doc duplicated spans
    * REMOVED, keeping one occurrence corpus-wide (Lee et al. 2021 cut all
    * but one copy of each ≥50-token duplicate substring; their suffix
    * array is single-node, this is the distributed re-expression).
    *
    * Keep-one policy: for each duplicated window the KEEPER is the doc
    * with the smallest id (any orderable id type); the keeper retains the
    * span (including its own internal repeats), every other doc drops the
    * covered token positions. Removal is positional — overlapping
    * duplicated windows union into one cut, and surviving tokens rejoin
    * with single spaces (whitespace normalizes, as any token-level
    * rewrite must).
    *
    * Scale shape: identical to [[substringDupStats]] up to the dup-start
    * set (hashed windows, partial-agg keeper/df per window hash, AQE
    * skew-join back), then ONE per-doc rewrite pass with array
    * higher-order functions: kept indices are the GAP SEQUENCES between
    * the sorted removable starts — O(n_tokens) per doc — and the
    * collected start array is bounded by the doc's own token count.
    * Output: `(doc_id, n_tokens, n_removed, clean_text)`.
    */
  def substringDedup(docs: DataFrame, w: Int = 10,
      idCol: String = "doc_id"): DataFrame = {
    require(w >= 2, s"window must be >= 2 tokens, got $w")
    val toks = docs
      .select(col(idCol).as("doc_id"), wordsCol(col("text")).as("__ws"))
      .select(col("doc_id"), col("__ws"), size(col("__ws")).as("n_tokens"),
        gramsCol(col("__ws"), w).as("__grams"))
    val starts = toks
      .select(col("doc_id"), posexplode(col("__grams")).as(Seq("pos", "gram")))
      .select(col("doc_id"), col("pos"), xxhash64(col("gram")).as("wh"))
    // per duplicated window: distinct-doc count + smallest holder id —
    // one partial-aggregating groupBy over 8-byte keys
    val keepers = starts.select("doc_id", "wh").distinct()
      .groupBy("wh").agg(min("doc_id").as("__keeper"), count(lit(1)).as("df"))
      .filter(col("df") >= 2)
      .select("wh", "__keeper")
    val removable = starts.join(keepers, Seq("wh"))
      .filter(col("doc_id") =!= col("__keeper"))
      .select("doc_id", "pos")
    val perDoc = removable.groupBy("doc_id")
      .agg(sort_array(collect_set(col("pos"))).as("ps"))
    // positional rewrite: kept = indices outside every [q, q+w) interval.
    // ps is SORTED, so the complement is exactly the gaps — before the
    // first start, between consecutive starts (empty when they overlap),
    // and after the last — O(n_tokens) per doc. The naive form (filter
    // every index with exists(ps, ...)) is O(n_tokens × |ps|): quadratic
    // for a long fully-duplicated doc, a per-task straggler at scale.
    // sequence(lo, hi) DESCENDS when hi < lo, so every gap is guarded.
    def gapSeq(lo: Column, hi: Column): Column =
      when(hi >= lo, sequence(lo, hi)).otherwise(array().cast("array<int>"))
    val ps = coalesce(col("ps"), array().cast("array<int>"))
    val lastIdx = size(col("__ws")) - 1
    // zip_with pads the shifted array with null; gapSeq(a+w, null-1) is
    // null-condition → empty, so the final element contributes nothing
    // here and the trailing gap is added explicitly
    val betweenGaps = flatten(zip_with(ps,
      slice(ps, lit(2), greatest(size(ps) - 1, lit(0))),
      (a, b) => gapSeq(a + lit(w), b - 1)))
    val kept = when(size(ps) === 0, gapSeq(lit(0), lastIdx))
      .otherwise(concat(
        gapSeq(lit(0), element_at(ps, 1) - 1),
        betweenGaps,
        gapSeq(element_at(ps, -1) + lit(w), lastIdx)))
    toks.join(perDoc, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_tokens"),
        (col("n_tokens") - size(kept)).as("n_removed"),
        array_join(transform(kept, i => element_at(col("__ws"), i + 1)), " ")
          .as("clean_text"))
  }

  /** N-gram-level benchmark decontamination — the exact-overlap method of
    * GPT-3's appendix (Brown et al. 2020 flag training docs sharing any
    * 13-gram with an eval example; later work uses 8–13). Complements the
    * minhash DOC-level decontamination ([[Dedup.crossContamination]],
    * q52): minhash catches near-duplicate documents, this catches a
    * benchmark QUESTION quoted inside an otherwise-novel page, which
    * doc-level similarity misses entirely.
    *
    * For each corpus doc: how many token positions sit inside a length-w
    * window that appears verbatim in the benchmark. The benchmark side
    * reduces to DISTINCT window hashes (tiny — eval sets are thousands of
    * docs), so the join is benchmark-hash-sized and AQE broadcasts it;
    * the corpus is never shuffled. Same positional interval-union as
    * [[substringDupStats]]. Output: `(doc_id, n_tokens, n_contam_tokens,
    * contam_fraction)` — callers drop docs over a threshold (GPT-3
    * dropped on ANY hit, i.e. fraction > 0).
    */
  def ngramDecontaminate(docs: DataFrame, benchmark: DataFrame, w: Int = 10,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    require(w >= 2, s"window must be >= 2 tokens, got $w")
    def starts(df: DataFrame, id: Column): DataFrame = df
      .select(id.as("doc_id"), wordsCol(col(textCol)).as("__ws"))
      .select(col("doc_id"), posexplode(gramsCol(col("__ws"), w)).as(Seq("pos", "gram")))
      .select(col("doc_id"), col("pos"), xxhash64(col("gram")).as("wh"))
    val benchWh = starts(benchmark, col(idCol)).select("wh").distinct()
    val hits = starts(docs, col(idCol)).join(benchWh, Seq("wh"))
      .select("doc_id", "pos")
    val perDoc = hits.groupBy("doc_id")
      .agg(sort_array(collect_set(col("pos"))).as("ps"))
      .select(col("doc_id"),
        aggregate(
          zip_with(col("ps"),
            slice(col("ps"), lit(2), greatest(size(col("ps")) - 1, lit(0))),
            (a, b) => least(lit(w), b - a)),
          lit(0L), (acc, x) => acc + x.cast("long"))
          .cast("int").as("n_contam_tokens"))
    docs.select(col(idCol).as("doc_id"),
        size(wordsCol(col(textCol))).as("n_tokens"))
      .join(perDoc, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_tokens"),
        coalesce(col("n_contam_tokens"), lit(0)).as("n_contam_tokens"),
        when(col("n_tokens") === 0, 0.0)
          .otherwise(coalesce(col("n_contam_tokens"), lit(0)).cast("double") /
            col("n_tokens").cast("double"))
          .as("contam_fraction"))
  }

  /** Numeric order key in [0, 2³²): the first 8 hex digits of
    * `md5(id ":" salt)`. Lexicographic order of the full 32-hex string
    * equals numeric order of this prefix ties-then-remainder, which is
    * what makes the pre-filter in [[capPerSource]] a provable prefix of
    * the sort order. Same construction as [[Sampling.hashBucket]].
    */
  private def orderKey(id: Column, salt: String): Column =
    conv(substring(md5(concat(id.cast("string"), lit(":" + salt))), 1, 8), 16, 10)
      .cast("long")

  /** Deterministic per-source cap (RefinedWeb-style domain balancing):
    * keep at most `maxPerSource` documents per source, selected by a
    * salted-hash order so the kept set is stable under reruns,
    * reshuffles, and incremental re-ingestion. Returns ONLY the kept
    * rows (`doc_id`, `source`, `src_rank` ∈ [1, cap]) — the cap IS the
    * curation output.
    *
    * Scale: a naive `row_number` over (source) sorts every mega-domain
    * in one task (a 10⁸-doc domain is a single 10⁸-row sort). Instead,
    * sources above `prefilterAbove` are first cut to the hash-prefix
    * `cutoff ≈ (cap + 8√cap + 64) / src_n` of their rows — a PREFIX of
    * the (hash, id) sort order, so ranks among survivors equal global
    * ranks — and only survivors are sorted. Expected survivors per
    * source ≈ cap + 8√cap + 64; the chance of a source surviving with
    * fewer than `cap` rows is Chernoff-negligible (< e⁻³⁰ even at
    * cap = 1), and [[capPerSourceVerified]] makes the guard explicit.
    */
  def capPerSource(docs: DataFrame, maxPerSource: Int = 100,
      salt: String = "graft", idCol: String = "doc_id",
      srcCol: String = "source", prefilterAbove: Long = 1000000L): DataFrame = {
    require(maxPerSource > 0, "maxPerSource must be positive")
    val keyed = docs.select(col(idCol).as("doc_id"), col(srcCol).as("source"))
      .withColumn("__h", orderKey(col("doc_id"), salt))
      .withColumn("__hex", md5(concat(col("doc_id").cast("string"), lit(":" + salt))))
    // one row per source. An explicit broadcast hint OVERRIDES the auto
    // threshold, so it must be gated: a huge source universe would be
    // collected to the driver. The gate is one cheap count over the
    // already-aggregated frame (checkpointed so the join reuses it);
    // over the gate, the plain join's source-key skew (a mega-domain's
    // rows all hash to one reducer) is AQE-skew-split.
    val counts = keyed.groupBy("source").agg(count(lit(1)).as("__src_n"))
      .localCheckpoint()
    val countsSide =
      if (counts.count() <= 1000000L) broadcast(counts) else counts
    val slack = maxPerSource + 8 * math.sqrt(maxPerSource.toDouble) + 64
    val survivors = keyed.join(countsSide, Seq("source"))
      .filter(col("__src_n") <= lit(prefilterAbove) ||
        col("__h") < (lit(slack) * lit(4294967296.0) / col("__src_n")).cast("long"))
    survivors
      .withColumn("src_rank", row_number().over(
        Window.partitionBy("source").orderBy(col("__hex"), col("doc_id"))))
      .filter(col("src_rank") <= maxPerSource)
      .select("doc_id", "source", "src_rank")
  }

  /** [[capPerSource]] plus the explicit correctness guard: asserts every
    * source kept `min(cap, src_n)` rows — the condition under which the
    * hash-prefix pre-filter is provably exact. One extra small aggregate
    * (rows = #sources); throws loudly rather than silently under-capping.
    */
  def capPerSourceVerified(docs: DataFrame, maxPerSource: Int = 100,
      salt: String = "graft", idCol: String = "doc_id",
      srcCol: String = "source", prefilterAbove: Long = 1000000L): DataFrame = {
    val kept = capPerSource(docs, maxPerSource, salt, idCol, srcCol, prefilterAbove)
      .localCheckpoint()
    val expected = docs.groupBy(col(srcCol).as("source"))
      .agg(least(count(lit(1)), lit(maxPerSource.toLong)).as("want"))
    val got = kept.groupBy("source").agg(count(lit(1)).as("got"))
    val bad = expected.join(got, Seq("source"), "left")
      .filter(coalesce(col("got"), lit(0L)) < col("want")).count()
    require(bad == 0,
      s"capPerSource pre-filter under-selected $bad source(s) — raise slack " +
        "or prefilterAbove (astronomically unlikely; indicates a hash-order bug)")
    kept
  }

  /** Per-document pattern signals (emails / URLs / digit density) — the
    * C4/RefinedWeb-style structural noise counters. Pure codegen'd
    * regexp expressions; the patterns avoid constructs where Java regex
    * and RE2 diverge (`\S` vs whitespace classes, Unicode digit classes)
    * so the q58 DuckDB oracle matches count-for-count.
    */
  def patternSignals(docs: DataFrame): DataFrame = {
    val nDigits = length(col("text")) -
      length(regexp_replace(col("text"), "[0-9]", ""))
    docs.select(col("doc_id"),
      regexp_count(col("text"), lit(EmailPattern)).as("n_emails"),
      regexp_count(col("text"), lit(UrlPattern)).as("n_urls"),
      nDigits.as("n_digits"),
      when(length(col("text")) === 0, 0.0)
        .otherwise(nDigits.cast("double") / length(col("text")).cast("double"))
        .as("digit_fraction"))
  }

  /** Shared Java-regex-∩-RE2-safe patterns (see [[patternSignals]] note). */
  val EmailPattern = "[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\\.[a-zA-Z]{2,}"
  val UrlPattern = "https?://[^ ]+"
  val Ipv4Pattern = "\\b[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\b"

  /** PII redaction — the C4/CCNet-style scrub pass a training corpus gets
    * before packing: emails → `<EMAIL>`, then URLs → `<URL>`, then bare
    * IPv4 literals → `<IP>`, applied in that FIXED order (each stage
    * counts and rewrites the previous stage's output, so an email inside
    * a URL redacts as one deterministic composition on both engines).
    * Pure codegen'd regexp expressions — no UDF, no shuffle; the q61
    * DuckDB oracle replays the same three rewrites with RE2.
    */
  def redactPii(docs: DataFrame): DataFrame = {
    val afterEmail = regexp_replace(col("text"), EmailPattern, "<EMAIL>")
    val afterUrl = regexp_replace(afterEmail, UrlPattern, "<URL>")
    docs.select(col("doc_id"),
      regexp_count(col("text"), lit(EmailPattern)).as("n_emails"),
      regexp_count(afterEmail, lit(UrlPattern)).as("n_urls"),
      regexp_count(afterUrl, lit(Ipv4Pattern)).as("n_ips"),
      regexp_replace(afterUrl, Ipv4Pattern, "<IP>").as("text_redacted"))
  }

  /** C4-style line-level cleaning (Raffel et al. 2020 §2.2 — the rules
    * that built the C4 corpus). A LINE survives iff it ends in a terminal
    * punctuation mark (`. ! ? "`), has at least `minLineWords` words, and
    * does not mention javascript; a PAGE survives iff its text contains
    * no `{`, no "lorem ipsum" (case-insensitive), and at least
    * `minKeptLines` lines survived. Blank lines are ignored entirely —
    * neither counted nor kept — so both engines agree regardless of how
    * the line source pads. CRLF is normalized to `\n` up front (crawled
    * HTML is very often CRLF; a literal-`\n` split would leave every
    * line ending in `\r`, fail the terminal-punctuation anchor, and
    * reject the whole corpus — and normalizing, rather than splitting on
    * `\r?\n`, also makes mixed-ending duplicate content compare equal in
    * the sibling repetition/dedup ops).
    *
    * Pure per-document array/regexp expressions: no UDF, no shuffle —
    * the whole gate scan-pipelines under whole-stage codegen and column
    * pruning reaches the parquet scan (the 100-TB shape: this runs AT the
    * read, not as a stage). Output: `(doc_id, n_lines, n_kept_lines,
    * keep_page, clean_text)`; clean_text rejoins kept lines with `\n`.
    */
  /** CRLF → LF, applied before any line/paragraph split in this package
    * so line structure AND content equality are ending-insensitive.
    */
  private def normEol(text: Column): Column =
    replace(text, lit("\r\n"), lit("\n"))

  def c4LineClean(docs: DataFrame, minLineWords: Int = 5,
      minKeptLines: Int = 3, idCol: String = "doc_id"): DataFrame = {
    val lines = filter(split(normEol(col("text")), "\n"),
      l => length(trim(l)) > 0)
    val kept = filter(lines, l =>
      trim(l).rlike("[.!?\"]$") &&
        size(split(trim(l), "\\s+")) >= minLineWords &&
        !lower(l).contains("javascript"))
    docs.select(col(idCol).as("doc_id"),
        lines.as("__lines"), kept.as("__kept"), col("text"))
      .select(col("doc_id"),
        size(col("__lines")).as("n_lines"),
        size(col("__kept")).as("n_kept_lines"),
        (!lower(col("text")).contains("lorem ipsum") &&
          !col("text").contains("{") &&
          size(col("__kept")) >= minKeptLines).as("keep_page"),
        array_join(col("__kept"), "\n").as("clean_text"))
  }

  /** Gopher/MassiveText document-quality rules (Rae et al. 2021,
    * table A1) — the heuristic gate most open web corpora since have
    * reused: word-count bounds, mean-word-length bounds, symbol-to-word
    * ratio (`#` and ellipsis), bullet-line and ellipsis-line fractions,
    * fraction of words containing a letter, and a minimum count of
    * DISTINCT high-frequency English stopwords present. Emits every
    * signal (so rejection reasons stay queryable) plus the conjunction
    * as `gopher_pass`.
    *
    * Every ratio is one division of exact integer counts, so Spark and a
    * sequential SQL oracle agree bit-exactly (same discipline as
    * [[unigramRarity]]); everything is a pure column expression — no
    * UDF, no shuffle, scan-pipelined. Tokenization matches
    * [[TextAnalysis.tokenCount]] (trim, split `\s+`).
    */
  def gopherQuality(docs: DataFrame,
      minWords: Int = 50, maxWords: Int = 100000,
      minMeanWordLen: Double = 3.0, maxMeanWordLen: Double = 10.0,
      maxSymbolRatio: Double = 0.1, maxBulletFrac: Double = 0.9,
      maxEllipsisFrac: Double = 0.3, minAlphaFrac: Double = 0.8,
      minStopwords: Int = 2, idCol: String = "doc_id"): DataFrame = {
    val ws = wordsCol(col("text"))
    val nWords = size(ws)
    val sumLen = aggregate(ws, lit(0L), (acc, x) => acc + length(x))
    // '…' is one CHARACTER in both engines' length(); '...' counts as
    // length delta / 3 — both are plain replace, no regex needed
    val nHash = length(col("text")) -
      length(replace(col("text"), lit("#"), lit("")))
    val nDots = (length(col("text")) -
      length(replace(col("text"), lit("..."), lit("")))) / 3 +
      (length(col("text")) - length(replace(col("text"), lit("…"), lit(""))))
    val lines = filter(split(normEol(col("text")), "\n"),
      l => length(trim(l)) > 0)
    val nLines = size(lines)
    val nBullet = size(filter(lines, l =>
      trim(l).startsWith("- ") || trim(l).startsWith("• ") ||
        trim(l).startsWith("* ")))
    val nEllLine = size(filter(lines, l =>
      trim(l).endsWith("...") || trim(l).endsWith("…")))
    val nAlpha = size(filter(ws, w => w.rlike("[A-Za-z]")))
    val stops = array(GopherStopwords.map(lit): _*)
    val nStop = size(array_intersect(transform(ws, w => lower(w)), stops))
    def ratio(num: Column, den: Column): Column =
      when(den === 0, 0.0).otherwise(num.cast("double") / den.cast("double"))
    val base = docs.select(col(idCol).as("doc_id"),
      nWords.as("n_words"),
      ratio(sumLen, nWords).as("mean_word_len"),
      ratio(nHash + nDots, nWords).as("symbol_ratio"),
      ratio(nBullet, nLines).as("bullet_frac"),
      ratio(nEllLine, nLines).as("ellipsis_frac"),
      ratio(nAlpha, nWords).as("alpha_frac"),
      nStop.as("n_stopwords"))
    base.withColumn("gopher_pass",
      col("n_words") >= minWords && col("n_words") <= maxWords &&
        col("mean_word_len") >= minMeanWordLen &&
        col("mean_word_len") <= maxMeanWordLen &&
        col("symbol_ratio") <= maxSymbolRatio &&
        col("bullet_frac") <= maxBulletFrac &&
        col("ellipsis_frac") <= maxEllipsisFrac &&
        col("alpha_frac") >= minAlphaFrac &&
        col("n_stopwords") >= minStopwords)
  }

  /** Gopher's "stop word" presence list (Rae et al. 2021 table A1: a doc
    * must contain ≥2 of these to pass).
    */
  val GopherStopwords: Seq[String] =
    Seq("the", "be", "to", "of", "and", "that", "have", "with")

  /** Gopher/MassiveText REPETITION rules (Rae et al. 2021, table A1
    * second block) — the structural-duplication signals that
    * [[TextAnalysis.repetition]]'s n-gram pass does not cover: the
    * fraction of duplicate LINES and duplicate PARAGRAPHS, each measured
    * two ways — by occurrence count and by character mass (a page whose
    * one duplicated line is 90 % of its bytes is worse than one that
    * repeats a 3-char bullet). CRLF normalizes to LF first, then lines
    * split on `\n`, paragraphs on `\n\n`; both trimmed, blanks dropped,
    * compared exactly — so a paragraph duplicated once with CRLF and
    * once with LF still counts as a duplicate.
    *
    * The duplicate character mass needs no per-key counting: each copy
    * beyond the first contributes its own length, so
    * `dup_mass = total_mass − mass(array_distinct(items))` — pure
    * per-row array expressions, no explode, no shuffle, scan-pipelined
    * under whole-stage codegen (the 100-TB shape: a second pass over the
    * corpus costs one scan). Ratios are single divisions of exact
    * integer counts, so a sequential SQL oracle agrees bit-exactly.
    * Output: `(doc_id, n_lines, n_distinct_lines, dup_line_frac,
    * dup_line_char_frac, n_paras, n_distinct_paras, dup_para_frac,
    * dup_para_char_frac, repetition_pass)`.
    */
  def gopherRepetition(docs: DataFrame,
      maxDupLineFrac: Double = 0.3, maxDupLineCharFrac: Double = 0.2,
      maxDupParaFrac: Double = 0.3, maxDupParaCharFrac: Double = 0.2,
      idCol: String = "doc_id"): DataFrame = {
    def items(sep: String): Column =
      filter(transform(split(normEol(col("text")), sep), x => trim(x)),
        x => length(x) > 0)
    def frac(num: Column, den: Column): Column =
      when(den === 0, 0.0).otherwise(num.cast("double") / den.cast("double"))
    def mass(arr: Column): Column =
      aggregate(arr, lit(0L), (acc, x) => acc + length(x))
    def stats(arr: Column, pfx: String): Seq[Column] = {
      val n = size(arr); val nd = size(array_distinct(arr))
      val m = mass(arr); val dm = mass(array_distinct(arr))
      Seq(n.as(s"n_$pfx"), nd.as(s"n_distinct_$pfx"),
        frac(n - nd, n).as(s"dup_${pfx.dropRight(1)}_frac"),
        frac(m - dm, m).as(s"dup_${pfx.dropRight(1)}_char_frac"))
    }
    docs.select(col(idCol).as("doc_id") +:
        (stats(items("\n"), "lines") ++ stats(items("\n\n"), "paras")): _*)
      .withColumn("repetition_pass",
        col("dup_line_frac") <= maxDupLineFrac &&
          col("dup_line_char_frac") <= maxDupLineCharFrac &&
          col("dup_para_frac") <= maxDupParaFrac &&
          col("dup_para_char_frac") <= maxDupParaCharFrac)
  }

  /** Within-document structural dedup — the REMOVAL companion to
    * [[gopherRepetition]]'s filters: rewrite each document keeping only
    * the FIRST occurrence of every repeated paragraph (boilerplate
    * banners, repeated footers, generation loops), preserving original
    * order. CRLF normalizes to LF first (so a paragraph duplicated with
    * mixed line endings still matches its twin), then paragraphs split
    * on `\n\n`, trimmed, blanks dropped; kept paragraphs rejoin with
    * `\n\n` — the rewrite normalizes line endings and paragraph breaks
    * by design, which is why there is no separator parameter (a
    * caller-supplied regex-split/literal-join pair would be a trap).
    *
    * First-occurrence selection is a pure array expression —
    * `array_position(parts, x) == i+1` inside a higher-order filter —
    * O(p²) in the doc's own paragraph count (bounded per row, no state),
    * so the transform stays a zero-shuffle scan pipeline under
    * whole-stage codegen like the other gates. Output:
    * `(doc_id, n_parts, n_kept, clean_text)`.
    */
  def dedupParagraphs(docs: DataFrame,
      idCol: String = "doc_id"): DataFrame = {
    val parts = filter(
      transform(split(normEol(col("text")), "\n\n"), x => trim(x)),
      x => length(x) > 0)
    docs.select(col(idCol).as("doc_id"), parts.as("__parts"))
      .select(col("doc_id"),
        filter(col("__parts"),
          (x, i) => array_position(col("__parts"), x) === i + 1)
          .as("__kept"), col("__parts"))
      .select(col("doc_id"),
        size(col("__parts")).as("n_parts"),
        size(col("__kept")).as("n_kept"),
        array_join(col("__kept"), "\n\n").as("clean_text"))
  }

  /** The composed curation verdict — every per-doc signal this package
    * and [[TextAnalysis]] produce, conjoined into one `kept` flag the
    * way a production training-data pipeline would gate documents:
    * exact-dup keeper ∧ target language ∧ low within-doc repetition ∧
    * low corpus-rarity ∧ low cross-doc boilerplate ∧ within the
    * per-source cap. Emits all six flags (so rejection reasons are
    * queryable) plus the conjunction. Each input signal is independently
    * oracled (q13/q22/q54/q55/q56/q57); q59 oracles the composition
    * itself in one fixture-free SQL statement.
    *
    * Scale: six doc_id-keyed frames joined on doc_id — each right side
    * shuffles once on the join key and the sort-merge chain accumulates
    * without re-shuffling the left side; the signal computations keep
    * their own documented shapes.
    */
  def curate(docs: DataFrame,
      maxDupFraction: Double = 0.05,
      maxRareFraction: Double = 0.25,
      maxSharedFraction: Double = 0.8,
      maxPerSource: Int = 10,
      keepLang: String = "en"): DataFrame = {
    // exact-dup keeper via Dedup.exact's groupBy(hash).min shape — a
    // window over md5(text) would put a 10⁶-copy boilerplate family in one
    // task; the groupBy collapses it map-side (round-4 fix)
    val keepExact = docs.select(col("doc_id")).join(
      Dedup.exact(docs).select(col("keep_id").as("doc_id"),
        lit(true).as("keep_exact")),
      Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("keep_exact"), lit(false)).as("keep_exact"))
    val langOk = docs.select(col("doc_id"),
      (TextAnalysis.langIdUdf(col("text")) === keepLang).as("lang_ok"))
    val rep = TextAnalysis.repetition(docs).select(col("doc_id"),
      (col("dup_fraction") <= maxDupFraction).as("low_repetition"))
    val rar = unigramRarity(docs).select(col("doc_id"),
      (col("rare_fraction") <= maxRareFraction).as("low_rarity"))
    val sh = sharedGramStats(docs).select(col("doc_id"),
      (col("shared_fraction") <= maxSharedFraction).as("low_shared"))
    val cap = capPerSource(docs, maxPerSource)
      .select(col("doc_id"), lit(true).as("within_cap"))
    docs.select(col("doc_id"))
      .join(keepExact, Seq("doc_id"))
      .join(langOk, Seq("doc_id"))
      .join(rep, Seq("doc_id"))
      .join(rar, Seq("doc_id"))
      .join(sh, Seq("doc_id"))
      .join(cap, Seq("doc_id"), "left")
      .select(col("doc_id"), col("keep_exact"), col("lang_ok"),
        col("low_repetition"), col("low_rarity"), col("low_shared"),
        coalesce(col("within_cap"), lit(false)).as("within_cap"),
        (col("keep_exact") && col("lang_ok") && col("low_repetition") &&
          col("low_rarity") && col("low_shared") &&
          coalesce(col("within_cap"), lit(false))).as("kept"))
  }

  /** Corpus-trained unigram rarity statistics per document — the LM-free
    * analog of CCNet's perplexity filter. Documents whose tokens are
    * mostly corpus-rare are gibberish/OCR noise; documents whose tokens
    * are overwhelmingly corpus-common are boilerplate. Emits per doc:
    * `n_tokens`, `n_rare` (tokens with corpus frequency ≤ rareThreshold),
    * `rare_fraction`, and `avg_token_freq` (mean corpus frequency of the
    * doc's tokens). All integer sums + one final division each, so the
    * result is bit-exact vs a sequential SQL oracle — deliberately NOT a
    * float log-prob sum, whose libm/accumulation-order differences would
    * break cross-engine hash equality.
    *
    * Scale shape: term frequencies first (`groupBy(doc, word)` — the
    * shuffle key includes doc_id, so Zipf-head words like "the" do NOT
    * skew it), then one join tf × vocab counts on word (hot-key volume
    * already collapsed by the tf step, factor ≈ avg term frequency; AQE
    * skew-join splits the residual head), then a per-doc aggregate.
    */
  def unigramRarity(docs: DataFrame, rareThreshold: Long = 2L,
      idCol: String = "doc_id"): DataFrame = {
    val words = docs
      .select(col(idCol).as("doc_id"), explode(wordsCol(col("text"))).as("w"))
    val tf = words.groupBy("doc_id", "w").agg(count(lit(1)).as("tf"))
      .localCheckpoint() // two consumers: vocab counts + the per-doc join
    val vocab = tf.groupBy("w").agg(sum("tf").as("wc"))
    val perDoc = tf.join(vocab, Seq("w"))
      .groupBy("doc_id").agg(
        sum("tf").cast("int").as("n_tokens"),
        sum(when(col("wc") <= rareThreshold, col("tf")).otherwise(0L))
          .cast("int").as("n_rare"),
        sum(col("tf") * col("wc")).as("freq_mass"))
    docs.select(col(idCol).as("doc_id")).join(perDoc, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_tokens"), lit(0)).as("n_tokens"),
        coalesce(col("n_rare"), lit(0)).as("n_rare"),
        when(coalesce(col("n_tokens"), lit(0)) === 0, 0.0)
          .otherwise(col("n_rare").cast("double") / col("n_tokens").cast("double"))
          .as("rare_fraction"),
        when(coalesce(col("n_tokens"), lit(0)) === 0, 0.0)
          .otherwise(col("freq_mass").cast("double") / col("n_tokens").cast("double"))
          .as("avg_token_freq"))
  }
}
