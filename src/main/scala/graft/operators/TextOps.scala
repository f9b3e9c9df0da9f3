package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Text-analysis operators for large-scale training-data pipelines:
  * tokenization stats, quality scoring, n-gram language ID, and document
  * fingerprinting. All pure column expressions (whole-stage codegen, no
  * UDFs), so they scan-prune and pushdown like any built-in.
  */
object TextOps {

  /** Whitespace tokens of a trimmed, lowercased document. */
  def tokens(text: Column): Column =
    split(trim(lower(text)), "\\s+")

  /** Order-invariant 6-dp mean of an irrational-double term: each term
    * rounds to PICO-units (exact BIGINT) before the fold, so partial-agg
    * order can't perturb the result on either engine — the exact-replay
    * recipe the oracle gate requires (unrounded double sums flaked the
    * r9 gate on q_volatility). 1e-12 granularity is 5e5× finer than the
    * 6-dp output round. */
  private def picoMean6(c: Column): Column =
    // + 0.0 normalizes IEEE −0.0: a logprob mean can approach 0 from below
    // (all-deterministic n-grams), and DuckDB's round preserves the sign
    // bit while Spark's cannot — each caller's oracle carries the matching
    // `+ 0.0` (the r10 q_volatility recipe)
    round(sum(round(c * lit(1000000000000.0)).cast("long"))
      / lit(1000000000000.0) / count(lit(1)), 6) + lit(0.0)

  /** Pico-unit (1e-12) integer quantization of a per-TYPE score — hoisting
    * the BigDecimal `round` out of the corpus-row fold into the vocab-
    * shaped model (r10 bench: the per-occurrence round doubled
    * q_bigram_logprob). Values are identical to rounding per occurrence:
    * the score is a pure function of the type row. */
  private def picoUnits(c: Column): Column =
    round(c * lit(1000000000000.0)).cast("long")

  /** Mean over PRE-quantized pico-unit scores — the aggregation half of
    * [[picoMean6]] (same exact-integer fold, same signed-zero guard). */
  private def picoMean6Pre(units: Column): Column =
    round(sum(units) / lit(1000000000000.0) / count(lit(1)), 6) + lit(0.0)

  /** Token count (whitespace tokenization; empty text → 0). Rides the
    * single-pass [[graft.expr.TextExpressions.textStats]] kernel — value
    * identical to `size(split(trim(lower(text)), "\\s+"))` with the
    * empty-text guard (parity-spec'd in TextKernelsSpec), without the
    * per-row regex split. */
  def tokenCount(text: Column): Column =
    graft.expr.TextExpressions.textStats(text).getField("n_tokens")

  /** BPE-ish subword count estimate: words + extra tokens for long words
    * (a word of length L costs ceil(L/4) subwords, a common BPE heuristic).
    * For counting under an ACTUAL vocab use [[bpeTokenCount]]. */
  def subwordCountEstimate(text: Column): Column =
    aggregate(tokens(text), lit(0L),
      (acc, t) => acc + ceil(length(t) / lit(4.0)).cast("long"))

  /** Real subword token count under a merge vocab: greedy longest-match
    * (WordPiece-style) per whitespace word, one codegen pass per row; the
    * vocab table rides the task-binary broadcast (one copy per executor).
    * See [[graft.expr.BpeTable]] for the match semantics. */
  def bpeTokenCount(text: Column, vocab: Seq[String]): Column =
    graft.expr.TextExpressions.bpeCount(text, vocab)

  /** Character-class ratios (computed over the raw text, 6dp). */
  def charRatio(text: Column, charClass: String): Column =
    when(length(text) === 0, lit(0.0))
      .otherwise(round(length(regexp_replace(text, charClass, "")).cast("double")
        / length(text), 6))

  def alphaRatio(text: Column): Column = charRatio(text, "[^A-Za-z]")
  def digitRatio(text: Column): Column = charRatio(text, "[^0-9]")
  def spaceRatio(text: Column): Column = charRatio(text, "[^ ]")

  /** Mean token length. */
  def meanTokenLength(text: Column): Column = {
    val t = tokens(text)
    when(size(t) === 0, lit(0.0))
      .otherwise(round(aggregate(t, lit(0L), (a, x) => a + length(x)).cast("double") / size(t), 6))
  }

  private[graft] val englishStopwords = Seq(
    "the", "a", "an", "and", "or", "of", "to", "in", "is", "are", "was",
    "for", "on", "with", "as", "by", "at", "it", "this", "that")

  /** Fraction of tokens that are (English) stopwords — a classic quality
    * signal: natural prose has a stable stopword rate, boilerplate doesn't. */
  def stopwordRatio(text: Column, stopwords: Seq[String] = englishStopwords): Column = {
    val t = tokens(text)
    val sw = array(stopwords.map(lit): _*)
    when(size(t) === 0, lit(0.0))
      .otherwise(round(size(filter(t, x => array_contains(sw, x))).cast("double") / size(t), 6))
  }

  /** Composite quality score in [0,1]: blend of length band, alpha ratio and
    * stopword presence. Deterministic, monotone in each signal. */
  def qualityScore(text: Column): Column = {
    val lenScore = least(length(text).cast("double") / 500.0, lit(1.0))
    val alpha = length(regexp_replace(text, "[^A-Za-z]", "")).cast("double") /
      greatest(length(text).cast("double"), lit(1.0))
    val t = tokens(text)
    val sw = array(englishStopwords.map(lit): _*)
    val stop = when(size(t) === 0, lit(0.0))
      .otherwise(size(filter(t, x => array_contains(sw, x))).cast("double") / size(t))
    round(lit(0.4) * lenScore + lit(0.4) * alpha + lit(0.2) * least(stop * 5.0, lit(1.0)), 6)
  }

  /** Language-marker token sets for the five testdata languages. The driver
    * documents carry a `lang` column; this operator re-derives it from text
    * content by marker-token voting (n-gram-heuristic language ID). */
  val langMarkers: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "and", "of", "to", "a", "is", "in", "that", "with", "for"),
    "de" -> Seq("der", "die", "das", "und", "ist", "nicht", "mit", "ein", "zu", "von"),
    "es" -> Seq("el", "la", "de", "que", "y", "en", "un", "por", "con", "para"),
    "fr" -> Seq("le", "la", "les", "et", "est", "un", "une", "dans", "pour", "que"),
    "zh" -> Seq("的", "是", "在", "了", "和", "有", "我", "不", "这", "上"))

  /** Argmax-vote language ID over marker tokens; "und" (undetermined) when no
    * marker hits. Backed by the single-pass codegen kernel
    * [[graft.expr.TextKernels.langId]] — the HOF form below re-tokenized the
    * document once per language (VERDICT r1). */
  def langId(text: Column): Column = graft.expr.TextExpressions.langId(text)

  /** Interpreted-HOF reference form of [[langId]] (parity-tested; do not use
    * in hot paths — evaluates `tokens(text)` once per language). */
  def langIdHof(text: Column): Column = {
    val t = tokens(text)
    val scores = langMarkers.toSeq.sortBy(_._1).map { case (lang, markers) =>
      val m = array(markers.map(lit): _*)
      struct(size(filter(t, x => array_contains(m, x))).as("hits"), lit(lang).as("lang"))
    }
    // array_max over (hits, lang) structs: lexicographic → max hits, then max
    // lang name; deterministic tie-break
    val best = array_max(array(scores: _*))
    when(best.getField("hits") === 0, lit("und")).otherwise(best.getField("lang"))
  }

  /** Word n-gram shingles (default 3) as strings; docs shorter than n get a
    * single whole-document shingle. */
  def wordShingles(text: Column, n: Int = 3): Column = {
    val t = tokens(text)
    when(size(t) < n, array(concat_ws(" ", t)))
      .otherwise(transform(sequence(lit(1), size(t) - (n - 1)),
        i => concat_ws(" ", slice(t, i, lit(n)))))
  }

  /** Character n-gram shingles (default 3) of the normalized text. */
  def charShingles(text: Column, n: Int = 3): Column = {
    val norm = regexp_replace(trim(lower(text)), "\\s+", " ")
    when(length(norm) < n, array(norm))
      .otherwise(transform(sequence(lit(1), length(norm) - (n - 1)),
        i => substring(norm, i, lit(n))))
  }

  /** Rolling-hash document fingerprint components: xxhash64 of the
    * normalized text, and a winnowing-style min-hash over word-shingle
    * hashes — equal fingerprints ⇒ near-identical content. Kept as two
    * scalar functions (not one struct) so each is evaluated exactly once
    * per selected column. */
  def fullHash(text: Column): Column =
    xxhash64(regexp_replace(trim(lower(text)), "\\s+", " "))

  def minShingleHash(text: Column): Column =
    graft.expr.TextExpressions.minShingleHash(text, 5)

  /** Interpreted-HOF reference form of [[minShingleHash]] (parity-tested; do
    * not use in hot paths — the lambda re-evaluates `tokens(text)` PER
    * SHINGLE, i.e. O(L²) per document; VERDICT r1 measured 139 s for 5,000
    * sf0.1 docs). */
  def minShingleHashHof(text: Column): Column =
    array_min(transform(wordShingles(text, 5), s => xxhash64(s)))

  /** md5 variants of the fingerprint pair — same structure, but the hash
    * function exists identically in DuckDB, so the VALUES are
    * oracle-reproducible (xxhash64's argmin is not). */
  def fullMd5(text: Column): Column =
    md5(regexp_replace(trim(lower(text)), "\\s+", " "))

  def minShingleMd5(text: Column): Column =
    graft.expr.TextExpressions.minShingleMd5(text, 5)

  def fingerprint(text: Column): Column =
    struct(fullHash(text).as("full_hash"), minShingleHash(text).as("min_shingle_hash"))

  /** Benchmark decontamination: per corpus document, how many of its word
    * n-gram occurrences also appear in an evaluation set — the standard
    * pre-training hygiene pass (an eval item leaking into training data
    * invalidates the benchmark; n-gram collision is the accepted detector).
    *
    * Scale shape: the eval side is tiny next to the corpus, so its distinct
    * shingle set broadcasts; the corpus explodes its shingles once, a
    * left-semi join keeps only colliding occurrences, and the per-doc count
    * aggregates with map-side combine. Clean documents are restored by one
    * broadcast-able left join against the corpus id column — the corpus text
    * is scanned exactly once.
    *
    * @return (doc_id, n_contaminated_ngrams, is_clean) — one row per corpus doc
    */
  def decontaminate(corpus: DataFrame, evalDocs: DataFrame, n: Int = 5,
      textCol: String = "text", idCol: String = "doc_id"): DataFrame = {
    // single-tokenize codegen shingles — the HOF wordShingles re-splits the
    // text per element (O(L²) interpreted; same trap as minShingleHashHof)
    val shingles = graft.expr.TextExpressions.wordShingleStrings(col(textCol), n)
    val evalShingles = evalDocs
      .select(explode(shingles).as("shingle")).distinct()
    val hits = corpus
      .select(col(idCol), explode(shingles).as("shingle"))
      .join(broadcast(evalShingles), Seq("shingle"), "left_semi")
      .groupBy(col(idCol)).agg(count(lit(1)).as("n_contaminated_ngrams"))
    corpus.select(col(idCol))
      .join(hits, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("n_contaminated_ngrams"), lit(0L)).as("n_contaminated_ngrams"),
        (coalesce(col("n_contaminated_ngrams"), lit(0L)) === 0L).as("is_clean"))
  }

  /** Span-level benchmark decontamination (VERDICT r9 #5): WHERE each
    * corpus document collides with the eval set, not just whether. Every
    * corpus n-gram position whose shingle appears in the eval set is a
    * hit; hits merge into maximal token SPANS (runs with gaps ≤ n — a
    * quoted benchmark item shows up as one contiguous span, not n
    * overlapping hits), and the per-doc row carries hit/span counts plus
    * the covered-token fraction — what a curation run needs to CUT the
    * contaminated span instead of dropping the whole document.
    *
    * Scale shape: the eval-shingle probe is a plain semi-join with NO
    * broadcast hint — a benchmark battery can outgrow the broadcast limit
    * at 100 TB, so AQE picks broadcast only when the measured build side
    * is small; the span merge is one per-doc window over hit positions
    * (hits-shaped, far smaller than the corpus). Output: (doc_id, n_hits,
    * n_spans, covered_tokens, covered_frac, contaminated). */
  def decontaminateSpans(corpus: DataFrame, evalDocs: DataFrame, n: Int = 5,
      textCol: String = "text", idCol: String = "doc_id"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val shingles = graft.expr.TextExpressions.wordShingleStrings(col(textCol), n)
    val evalShingles = evalDocs.select(explode(shingles).as("shingle")).distinct()
    val hits = corpus
      .select(col(idCol), posexplode(shingles).as(Seq("p", "shingle")))
      .join(evalShingles, Seq("shingle"), "left_semi")
    val w = Window.partitionBy(col(idCol)).orderBy(col("p"))
    val spans = hits
      .withColumn("newSpan",
        when(lag(col("p"), 1).over(w).isNull, 1)
          .when(col("p") > lag(col("p"), 1).over(w) + n, 1).otherwise(0))
      .withColumn("spanId", sum(col("newSpan")).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col(idCol), col("spanId"))
      .agg(min(col("p")).as("s"), (max(col("p")) + n).as("e"),
        count(lit(1)).as("nh"))
    val perDoc = spans.groupBy(col(idCol))
      .agg(sum(col("nh")).as("n_hits"), count(lit(1)).as("n_spans"),
        sum(col("e") - col("s")).as("covered_tokens"))
    corpus.select(col(idCol), tokenCount(col(textCol)).as("n_tokens"))
      .join(perDoc, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("n_hits"), lit(0L)).as("n_hits"),
        coalesce(col("n_spans"), lit(0L)).as("n_spans"),
        coalesce(col("covered_tokens"), lit(0L)).as("covered_tokens"),
        round(coalesce(col("covered_tokens"), lit(0L)) /
          greatest(col("n_tokens"), lit(1L)).cast("double"), 6).as("covered_frac"),
        (coalesce(col("n_hits"), lit(0L)) > 0).as("contaminated"))
  }

  /** Crawl-text normalization — the step every web corpus runs before any
    * hashing or dedup (OSCAR/CCNet convention): Unicode NFC canonical
    * composition (so "e"+combining-acute and precomposed "é" hash alike),
    * control characters stripped to spaces, whitespace collapsed, ends
    * trimmed. NFC is a custom codegen expression
    * ([[graft.expr.TextExpressions.nfcNormalize]] — same UAX #15
    * algorithm as DuckDB's nfc_normalize, which is what the oracle
    * replays); the rest is built-in regexp_replace, so the whole chain
    * stays inside whole-stage codegen. Pure map, no shuffle. */
  def normalizeText(text: Column): Column =
    trim(regexp_replace(regexp_replace(
      graft.expr.TextExpressions.nfcNormalize(text),
      "[\\x00-\\x1F\\x7F]", " "), "\\s+", " "))

  /** N-gram OVERLAP-FRACTION contamination scoring — the graded companion
    * to [[decontaminate]]'s binary clean/dirty: the fraction of a doc's
    * DISTINCT n-token shingles that appear anywhere in the eval set (the
    * GPT-3 appendix-C / PaLM convention, which flags on a percentage
    * rather than any single hit, so a stray quoted sentence doesn't nuke
    * an otherwise-clean document).
    *
    * Oracle safety: the fraction is a ratio of two exact integer counts
    * and the threshold compare uses the unrounded ratio — IEEE division
    * of small ints is engine-identical, so `contaminated` is
    * deterministic cross-engine.
    *
    * Scale shape: one shingle explode per side, distinct, one join keyed
    * on the shingle (AQE decides the strategy — eval sets are usually
    * broadcastable but nothing here requires it), one map-side-combinable
    * count. Every doc yields ≥ 1 shingle (short docs collapse to one
    * whole-doc shingle), so no re-join against the corpus is needed. */
  def contaminationScore(corpus: DataFrame, evalDocs: DataFrame, n: Int = 8,
      threshold: Double = 0.5, textCol: String = "text",
      idCol: String = "doc_id"): DataFrame = {
    val shingles = graft.expr.TextExpressions.wordShingleStrings(col(textCol), n)
    val evalSet = evalDocs.select(explode(shingles).as("shingle")).distinct()
    val perDoc = corpus.select(col(idCol), explode(shingles).as("shingle")).distinct()
    val scored = perDoc
      .join(evalSet.withColumn("hit", lit(1)), Seq("shingle"), "left")
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_shingles"),
        sum(coalesce(col("hit"), lit(0))).cast("long").as("n_overlap"))
    val frac = col("n_overlap").cast("double") / col("n_shingles")
    scored.select(col(idCol), col("n_shingles"), col("n_overlap"),
      round(frac, 6).as("overlap_frac"), (frac > threshold).as("contaminated"))
  }

  /** Gopher-style repetition signals: duplicate-token fraction, top-token
    * dominance, and duplicate word-trigram fraction — boilerplate, spam and
    * degenerate generations score high on all three while natural prose
    * stays low. One single-pass codegen kernel per document
    * ([[graft.expr.TextKernels.repetitionSignals]]): no shuffle at all, so
    * the operator is a pure map over the corpus scan.
    *
    * @return (doc_id, n_tokens, dup_token_ratio, top_token_ratio,
    *         dup_trigram_ratio)
    */
  def repetitionStats(docs: DataFrame,
      textCol: String = "text", idCol: String = "doc_id"): DataFrame = {
    val sig = graft.expr.TextExpressions.repetitionSignals(col(textCol), 3)
    docs.select(col(idCol), sig.as("sig"))
      .select(col(idCol),
        element_at(col("sig"), 1).cast("long").as("n_tokens"),
        round(element_at(col("sig"), 2), 6).as("dup_token_ratio"),
        round(element_at(col("sig"), 3), 6).as("top_token_ratio"),
        round(element_at(col("sig"), 4), 6).as("dup_trigram_ratio"))
  }

  /** Quality-filter funnel: assign every document to the FIRST pipeline
    * stage that rejects it — too_short → low_alpha → repetitive → kept —
    * and report per-stage doc/token totals. This is the report a pipeline
    * owner reads before committing a filtering config (how much data does
    * each rule cost?). One scan, one bounded groupBy; the token/alpha
    * signals ride the one-pass `TextStatsExpr` kernel (identical values to
    * the `tokenCount`/`alphaRatio` HOF forms — parity-spec'd — without
    * the regex split + regexp_replace passes over every document) and the
    * repetition signal rides the one-pass repetition kernel. */
  def filterFunnel(docs: DataFrame, minTokens: Int = 20, minAlpha: Double = 0.6,
      maxDupTrigram: Double = 0.3, textCol: String = "text"): DataFrame = {
    val sig = graft.expr.TextExpressions.repetitionSignals(col(textCol), 3)
    val stats = graft.expr.TextExpressions.textStats(col(textCol))
    val staged = docs.select(
      stats.getField("n_tokens").cast("long").as("n_tokens"),
      round(stats.getField("alpha_ratio"), 6).as("alpha"),
      element_at(sig, 4).as("duptri"))
    staged.select(
        when(col("n_tokens") < minTokens, "1_too_short")
          .when(col("alpha") < minAlpha, "2_low_alpha")
          .when(col("duptri") > maxDupTrigram, "3_repetitive")
          .otherwise("4_kept").as("stage"),
        col("n_tokens"))
      .groupBy(col("stage"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_tokens")).as("n_tokens"))
  }

  /** CCNet/RefinedWeb-style boilerplate line removal: a line whose trimmed
    * form appears in >= minDf distinct documents is boilerplate (nav menus,
    * cookie banners, copyright footers) and is dropped from every document
    * it appears in. Returns per-doc kept/dropped line counts plus an md5 of
    * the cleaned text (lines rejoined in original order).
    *
    * Scale shape: the frequent-line table is bounded by corpus_lines/minDf
    * — small relative to the corpus, but it GROWS with the corpus, so it
    * gets no broadcast hint: AQE picks a broadcast lookup while the
    * measured size fits and falls back to a shuffle join past the
    * threshold (a forced broadcast here is a driver/executor OOM at the
    * 100 TB target). The df computation is two map-side-combinable
    * aggregations; whitespace-only lines are excluded from the frequent
    * set (they'd always qualify). */
  def boilerplateRemove(docs: DataFrame, minDf: Int = 5, textCol: String = "text",
      idCol: String = "doc_id"): DataFrame = {
    val lines = docs.select(col(idCol),
      posexplode(split(col(textCol), "\n")).as(Seq("pos", "line")))
    val freq = lines.select(trim(col("line")).as("nline"), col(idCol))
      .where(length(col("nline")) > 0)
      .distinct() // (line, doc) pairs; partial agg absorbs hot lines
      .groupBy(col("nline")).agg(count(lit(1)).as("df"))
      .where(col("df") >= minDf)
      .select("nline")
    val tagged = lines.join(freq, trim(col("line")) === col("nline"), "left")
    // kept lines, original order: collect_list drops the nulls the `when`
    // produces for boilerplate rows; array_sort orders by pos (unique/doc)
    val kept = array_sort(collect_list(
      when(col("nline").isNull, struct(col("pos"), col("line")))))
    tagged.groupBy(col(idCol))
      .agg(
        sum(when(col("nline").isNull, 1L).otherwise(0L)).as("kept_lines"),
        sum(when(col("nline").isNotNull, 1L).otherwise(0L)).as("dropped_lines"),
        md5(concat_ws("\n", transform(kept, s => s.getField("line")))).as("clean_md5"))
  }

  /** Unigram log-probability score — the perplexity-proxy quality filter
    * (CCNet-style): per-doc mean ln(count(token)/total) under a unigram
    * model trained on the corpus itself. Natural prose lands in a stable
    * band; gibberish and rare-token soup score low, degenerate repetition
    * of common tokens scores suspiciously high — both tails get reviewed.
    *
    * Scale shape: one explode + token-count aggregation (map-side
    * combine), then a tokens→counts join and a per-doc average. On raw
    * web-scale text the vocabulary is CORPUS-shaped (URLs, numbers,
    * typos, code), not language-bounded, so the count table gets no
    * broadcast hint — AQE broadcasts while it measures small and shuffle-
    * joins past the threshold. `minCount` prunes the model's long tail:
    * tokens below it are scored with the floor probability
    * ln(minCount/total) instead of joining, which keeps the count table
    * ~stopword-sized at web scale (the CCNet trick) without changing the
    * default minCount=1 semantics. Docs with no tokens are omitted (they
    * have no model probability). */
  def unigramLogProb(docs: DataFrame, textCol: String = "text",
      idCol: String = "doc_id", minCount: Long = 1L): DataFrame = {
    val toks = docs.select(col(idCol), explode(tokens(col(textCol))).as("tok"))
      .where(length(col("tok")) > 0)
    val allCounts = toks.groupBy(col("tok")).agg(count(lit(1)).as("cnt"))
    val total = allCounts.agg(sum(col("cnt")).as("total"))
    val counts = if (minCount <= 1L) allCounts else allCounts.where(col("cnt") >= minCount)
    // scores quantize to pico-units in the VOCAB-shaped model; the corpus
    // fold sums plain longs (misses fall back to the floor score, rounded
    // lazily — never taken at minCount = 1)
    val scored = counts.crossJoin(broadcast(total))
      .select(col("tok"),
        picoUnits(log(col("cnt").cast("double") / col("total"))).as("lpp"))
    toks.join(scored, Seq("tok"), "left")
      .crossJoin(broadcast(total)) // single row: genuinely bounded
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_tokens"),
        picoMean6Pre(coalesce(col("lpp"),
            picoUnits(log(lit(minCount).cast("double") / col("total")))))
          .as("logprob"))
  }

  /** Bigram conditional log-probability — the step up from
    * [[unigramLogProb]] as a fluency proxy: per-doc mean
    * ln(c(w1,w2)/c(w1)) under bigram counts trained on the corpus itself,
    * with c(w1) counted as bigram LEFT context so the conditionals
    * normalize. Scrambled text scores far lower than prose even when its
    * unigram mix is identical — the signal the unigram model cannot see.
    *
    * Scale shape: bigram formation is a PURE MAP — zip the token array
    * with its own tail (`arrays_zip(slice, slice)`) and explode; no
    * per-doc window, no shuffle until the map-side-combinable count
    * aggregation. The joins carry NO broadcast hints — bigram/unigram
    * context tables are corpus-shaped, AQE decides (the
    * [[unigramLogProb]] lesson). Docs with < 2 non-empty tokens are
    * omitted (no bigram probability exists).
    *
    * Skew: the context join keys on `w1` alone, and natural language makes
    * `w1 = "the"` a mega-key. AQE's skew-split can NEVER rescue this join:
    * both inputs are final aggregates, so the `HashAggregate` sits between
    * the shuffle stage and the join and `OptimizeSkewedJoin`'s
    * sort-over-shuffle-stage pattern does not match (pinned in
    * PlanRegressionSpec). So the operator salts it explicitly: `cnt2` rows
    * take `salt = hash(w2) mod S`, the one-row-per-w1 `cnt1` side
    * replicates S ways, and the hot key spreads over S partitions. S
    * bounds the replication at S×vocab rows — trivial next to the
    * corpus-shaped frames. `cnt1` itself derives from the vocab-shaped
    * `cnt2` (c(w1) = Σ_w2 c(w1,w2)), not from a second corpus-scale
    * shuffle; aggregation skew is absorbed by map-side partial sums. The
    * remaining corpus-row join keys on (w1, w2), whose hottest key is
    * orders of magnitude cooler than bare `w1`. */
  def bigramLogProb(docs: DataFrame, textCol: String = "text",
      idCol: String = "doc_id"): DataFrame = {
    val t = tokens(col(textCol))
    val saltS = 16
    // empty tokens only occur at the split edges; dropping pairs touching
    // them leaves interior adjacency intact
    val bg = docs
      .select(col(idCol),
        explode(arrays_zip(slice(t, lit(1), size(t) - 1), slice(t, lit(2), size(t) - 1))).as("p"))
      .select(col(idCol), col("p.0").as("w1"), col("p.1").as("w2"))
      .where(length(col("w1")) > 0 && length(col("w2")) > 0)
    val cnt2 = bg.groupBy(col("w1"), col("w2")).agg(count(lit(1)).as("c2"))
    val cnt1 = cnt2.groupBy(col("w1")).agg(sum(col("c2")).as("c1"))
    // pre-join the two VOCAB-shaped count tables into a (w1,w2)→logprob
    // model, so the corpus-row frame joins once, not twice; salted per the
    // scaladoc so the w1="the" mega-key spreads over saltS partitions
    val model = cnt2
      .withColumn("salt", pmod(xxhash64(col("w2")), lit(saltS)).cast("int"))
      .join(cnt1.withColumn("salt", explode(lit((0 until saltS).toArray))), Seq("w1", "salt"))
      .select(col("w1"), col("w2"),
        // pico-quantized in the vocab-shaped model, not per occurrence
        picoUnits(log(col("c2").cast("double") / col("c1"))).as("lpp"))
    bg.join(model, Seq("w1", "w2"))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_bigrams"), picoMean6Pre(col("lpp")).as("logprob"))
  }

  /** Interpolated Kneser-Ney bigram scoring (Kneser & Ney 1995; Chen &
    * Goodman 1999) — the smoothing the MLE conditional in
    * [[bigramLogProb]] lacks: absolute discount D on the bigram count,
    * with the discounted mass backed off to the CONTINUATION probability
    * (how many distinct left contexts a word follows, not how often it
    * occurs — the "san francisco" correction: "francisco" is frequent but
    * follows only "san", so its continuation mass is tiny).
    *
    *   P(w2|w1) = max(c(w1,w2)−D, 0)/c(w1) + D·T(w1)/c(w1) · Pc(w2)
    *   Pc(w2)   = |{w1 : c(w1,w2)>0}| / |{(w1,w2) : c>0}|
    *
    * Scale shape: identical to [[bigramLogProb]] — zip-with-tail bigram
    * map, then everything vocab-shaped; the three model tables (bigram
    * counts, left-context totals + distinct-continuation counts, right
    * continuation counts) pre-join into one (w1,w2)→lp model so the
    * corpus-row frame joins once. Every term is a ratio of exact integer
    * counts, so the oracle replays it to the same 6 dp. */
  def kneserNeyLogProb(docs: DataFrame, textCol: String = "text",
      idCol: String = "doc_id", discount: Double = 0.75): DataFrame = {
    val t = tokens(col(textCol))
    val bg = docs
      .select(col(idCol),
        explode(arrays_zip(slice(t, lit(1), size(t) - 1), slice(t, lit(2), size(t) - 1))).as("p"))
      .select(col(idCol), col("p.0").as("w1"), col("p.1").as("w2"))
      .where(length(col("w1")) > 0 && length(col("w2")) > 0)
    val cnt2 = bg.groupBy(col("w1"), col("w2")).agg(count(lit(1)).as("c2"))
    // one pass over the bigram-type table yields both c(w1) and T(w1)
    val left = cnt2.groupBy(col("w1"))
      .agg(sum(col("c2")).as("c1"), count(lit(1)).as("types1"))
    val cont = cnt2.groupBy(col("w2")).agg(count(lit(1)).as("contw2"))
    val nTypes = cnt2.agg(count(lit(1)).as("ntypes"))
    val model = cnt2.join(left, Seq("w1")).join(cont, Seq("w2"))
      .crossJoin(broadcast(nTypes)) // single row
      .select(col("w1"), col("w2"),
        // pico-quantized in the vocab-shaped model, not per occurrence
        picoUnits(log(
          greatest(col("c2") - lit(discount), lit(0.0)) / col("c1")
            + lit(discount) * col("types1") / col("c1")
              * (col("contw2").cast("double") / col("ntypes")))).as("lpp"))
    bg.join(model, Seq("w1", "w2"))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_bigrams"), picoMean6Pre(col("lpp")).as("kn_logprob"))
  }

  /** PMI collocation extraction — the corpus-statistics operator behind
    * phrase mining and tokenizer-vocabulary seeding: adjacent token pairs
    * scored by pointwise mutual information,
    * ln(p(w1,w2) / (p(w1)·p(w2))) with pair probability over the bigram
    * total and word probabilities over the unigram total. High-PMI pairs
    * ("new york") co-occur far above chance; frequent-but-independent
    * pairs ("of the") score near zero.
    *
    * Oracle safety: output MEMBERSHIP is decided only by the integer
    * `minCount` filter — never by a float threshold or top-k over PMI —
    * so the row set is engine-exact; the PMI value itself rounds to 6 dp
    * (the ln() convention every logprob oracle here already survives).
    *
    * Scale shape: bigram formation is the same pure zip-with-tail map as
    * [[bigramLogProb]]; everything after the two map-side-combinable
    * counts is vocab-shaped, never corpus-shaped. The unigram join
    * carries no broadcast hint — vocabulary tables at web scale are
    * shuffle-join material and AQE decides. */
  def collocations(docs: DataFrame, textCol: String = "text",
      minCount: Long = 5L): DataFrame = {
    val t = tokens(col(textCol))
    val bg = docs
      .select(explode(arrays_zip(slice(t, lit(1), size(t) - 1), slice(t, lit(2), size(t) - 1))).as("p"))
      .select(col("p.0").as("w1"), col("p.1").as("w2"))
      .where(length(col("w1")) > 0 && length(col("w2")) > 0)
    val toks = docs.select(explode(t).as("tok")).where(length(col("tok")) > 0)
    val uni = toks.groupBy(col("tok")).agg(count(lit(1)).as("cu"))
    val uniTotal = uni.agg(sum(col("cu")).as("nu"))
    val pair = bg.groupBy(col("w1"), col("w2")).agg(count(lit(1)).as("c2"))
      .where(col("c2") >= minCount)
    val pairTotal = bg.agg(count(lit(1)).as("nb"))
    pair
      .join(uni.select(col("tok").as("w1"), col("cu").as("cu1")), Seq("w1"))
      .join(uni.select(col("tok").as("w2"), col("cu").as("cu2")), Seq("w2"))
      .crossJoin(broadcast(pairTotal)) // single row
      .crossJoin(broadcast(uniTotal))  // single row
      .select(col("w1"), col("w2"), col("c2"),
        // + 0.0: PMI can approach 0 from below; DuckDB's round keeps −0.0,
        // Spark's can't (the oracle carries the matching + 0.0)
        (round(log(col("c2").cast("double") * col("nu") * col("nu") /
          (col("nb") * col("cu1") * col("cu2"))), 6) + lit(0.0)).as("pmi"))
  }

  /** Temperature-scaled corpus-mix weights — the multilingual-LM sampling
    * rule (p_s ∝ n_s^tau; tau < 1 flattens the mix toward uniform,
    * upweighting low-resource sources). Emits per-source token counts, the
    * temperature-scaled target share, and the without-replacement keep
    * rate that hits `budgetTokens` (capped at 1 — a source can't supply
    * more than it has). Feed the rates to [[resampleByRate]] to act on it.
    *
    * Scale shape: one scan + one map-side-combinable groupBy (sources are
    * tiny-cardinality); the normalizer joins back as a single-row
    * broadcast. tau = 0.5 evaluates via sqrt, which IEEE 754 rounds
    * exactly in every engine — the oracle-stable choice; other taus go
    * through pow. */
  def mixTemperature(docs: DataFrame, tau: Double = 0.5, budgetTokens: Long = 1000000L,
      textCol: String = "text", srcCol: String = "source"): DataFrame = {
    def w(c: Column): Column =
      if (tau == 0.5) sqrt(c) else pow(c, lit(tau))
    val counts = docs.groupBy(col(srcCol))
      .agg(count(lit(1)).as("n_docs"),
        sum(tokenCount(col(textCol)).cast("long")).as("n_tokens"))
    val z = counts.agg(sum(w(col("n_tokens").cast("double"))).as("z"))
    counts.crossJoin(broadcast(z)) // single row: genuinely bounded
      .select(col(srcCol), col("n_docs"), col("n_tokens"),
        round(w(col("n_tokens").cast("double")) / col("z"), 6).as("target_share"),
        round(least(lit(1.0),
          lit(budgetTokens.toDouble) * w(col("n_tokens").cast("double")) / col("z")
            / col("n_tokens").cast("double")), 6).as("keep_rate"))
      .orderBy(col(srcCol))
  }

  /** Deterministic train/val/test assignment: the split is a pure function
    * of (seed, doc id) — stable across runs, machines and engines (md5 hex
    * is engine-portable, unlike seeded RNG sampling), so a re-run never
    * leaks val/test docs into train. First hex nibble of
    * `md5(seed || ':' || id)`: '0' → test, '1' → val, else train
    * (6.25% / 6.25% / 87.5%). */
  def splitAssign(id: Column, seed: String = "split42"): Column = {
    val nibble = substring(md5(concat(lit(seed), lit(":"), id.cast("string"))), 1, 1)
    when(nibble === "0", "test").when(nibble === "1", "val").otherwise("train")
  }

  /** Per-split doc/token totals for a corpus under [[splitAssign]]. */
  def trainSplitReport(docs: DataFrame,
      textCol: String = "text", idCol: String = "doc_id"): DataFrame =
    docs.select(splitAssign(col(idCol)).as("split"),
        tokenCount(col(textCol)).cast("long").as("n_tokens"))
      .groupBy(col("split"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_tokens")).as("n_tokens"))

  /** Deterministic mix resampling: keep each doc with per-source probability
    * `rates(source)` (sources not listed keep everything). The decision is
    * an engine-portable uniform — the first 8 md5 hex nibbles of (seed, id)
    * over 16^8 — so it is a pure function of (seed, id): re-runs and other
    * engines keep EXACTLY the same rows (no seeded-RNG drift), and it
    * composes with [[splitAssign]] without correlation (different seed).
    * One scan, zero shuffle; at 100 TB this is a pushdown-friendly filter. */
  def resampleByRate(docs: DataFrame, rates: Map[String, Double],
      seed: String = "mix42", sourceCol: String = "source",
      idCol: String = "doc_id"): DataFrame = {
    val u = conv(substring(md5(concat(lit(seed), lit(":"), col(idCol).cast("string"))), 1, 8),
      16, 10).cast("long").cast("double") / math.pow(16, 8)
    val rate = rates.foldLeft(lit(1.0)) { case (acc, (s, r)) =>
      when(col(sourceCol) === s, lit(r)).otherwise(acc)
    }
    docs.where(u < rate)
  }

  /** Corpus-mix report: per (source, lang) document and token totals plus
    * each cell's share of global tokens — what a data-mixture/curriculum
    * designer reads. The global total joins back as a broadcast single row
    * (no unpartitioned window over the corpus). */
  def corpusMix(docs: DataFrame, textCol: String = "text"): DataFrame = {
    val cells = docs
      .select(col("source"), col("lang"), tokenCount(col(textCol)).cast("long").as("t"))
      .groupBy(col("source"), col("lang"))
      .agg(count(lit(1)).as("n_docs"), sum(col("t")).as("n_tokens"))
    val total = cells.agg(sum(col("n_tokens")).as("total_tokens"))
    cells.crossJoin(broadcast(total))
      .select(col("source"), col("lang"), col("n_docs"), col("n_tokens"),
        round(col("n_tokens").cast("double") / col("total_tokens"), 6).as("token_share"))
  }

  /** TF-IDF top-k terms per document.
    *
    * Shapes for scale: one explode of the token stream, one (doc, term)
    * groupBy for TF (map-side combine applies), one vocabulary-sized
    * groupBy for DF, a TF⋈DF equi-join on term (vocabulary is tiny next to
    * the corpus — AQE broadcasts it when it fits), and a per-document
    * window for the top-k (partition key = doc_id: millions of small
    * partitions, never one big one). The corpus size joins in as a
    * broadcast single-row frame — no driver-side count threaded through
    * the plan.
    *
    * idf = ln((N+1)/(df+1)) + 1 (smoothed, always positive); score is
    * rounded to 6dp BEFORE ranking so the (score desc, term asc) order is
    * reproducible in any engine.
    */
  def tfidfTopTerms(docs: DataFrame, k: Int = 3,
      textCol: String = "text", idCol: String = "doc_id"): DataFrame = {
    val nonEmpty = docs.filter(length(trim(col(textCol))) > 0)
    val toks = nonEmpty.select(col(idCol).as("doc_id"),
      explode(tokens(col(textCol))).as("term"))
    val tf = toks.groupBy(col("doc_id"), col("term")).agg(count(lit(1)).as("tf"))
    val dfreq = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
    val nDocs = nonEmpty.agg(count(lit(1)).as("n_docs"))
    val scored = tf.join(dfreq, "term")
      .crossJoin(broadcast(nDocs))
      .withColumn("tfidf", round(col("tf") *
        (log((col("n_docs") + 1).cast("double") / (col("df") + 1)) + 1), 6))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("doc_id")).orderBy(col("tfidf").desc, col("term"))
    scored.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
      .select(col("doc_id"), col("rank"), col("term"), col("tfidf"))
  }

  /** Email / phone regexes chosen to mean the same thing in Java regex
    * (Spark codegen) and RE2 (DuckDB/ripgrep): no lookarounds, no
    * backreferences. */
  val emailRegex = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val phoneRegex = "\\d{3}-\\d{3}-\\d{4}"

  /** PII redaction: per-document email/phone match counts plus the md5 of
    * the redacted text (emails → `<EMAIL>`, phones → `<PHONE>`). Pure
    * codegen column expressions — the scan stays pruned to (id, text) and
    * the whole operator is one map stage, no shuffle at any scale. */
  def redactPii(docs: DataFrame, textCol: String = "text",
      idCol: String = "doc_id"): DataFrame = {
    val t = col(textCol)
    docs.select(col(idCol).as("doc_id"),
      regexp_count(t, lit(emailRegex)).cast("long").as("n_emails"),
      regexp_count(t, lit(phoneRegex)).cast("long").as("n_phones"),
      md5(regexp_replace(regexp_replace(t, emailRegex, "<EMAIL>"),
        phoneRegex, "<PHONE>")).as("redacted_md5"))
  }

  /** Span-level exact duplicate detection (the substring-dedup family of
    * Lee et al., "Deduplicating Training Data Makes Language Models Better",
    * ACL'22): every `n`-token window that occurs in MORE THAN ONE document,
    * with its document count, total occurrence count, and first carrier.
    * Unlike the document-level near-dup ops ([[Dedup.minhashNearDup]] etc.)
    * this finds boilerplate SPANS — license headers, navigation chrome,
    * quoted passages — shared between otherwise-distinct documents.
    *
    * Shape: one codegen shingle pass over the corpus scan (the same
    * [[graft.expr.TextExpressions.wordShingleStrings]] kernel as
    * decontamination — docs shorter than `n` tokens contribute their whole
    * text as a single span), then an explicit TWO-LEVEL aggregation:
    * (span, doc) partial counts first, span totals second. Both levels
    * hash-aggregate with map-side combine — deliberately NOT
    * `countDistinct`, which Catalyst plans as an Expand + a second full
    * shuffle of raw occurrence rows. No joins, no all-pairs: a span
    * repeated 10⁹ times in one document partial-aggregates to one row per
    * map task before the first shuffle, so the plan survives boilerplate
    * skew at 100 TB.
    *
    * @return (span, n_docs, n_occurrences, first_doc) for spans with
    *         n_docs > 1.
    */
  def duplicateSpans(docs: DataFrame, n: Int = 8,
      textCol: String = "text", idCol: String = "doc_id"): DataFrame =
    duplicateSpansBy(docs, n, textCol, idCol, identity)

  /** Production flavor of [[duplicateSpans]] for the 100 TB shuffle: the
    * aggregation keys on `xxhash64(span)` (8 bytes) instead of the span
    * text (~n×word bytes), cutting first-shuffle volume ~6×; the span
    * text itself never leaves the map side. Collision risk is the
    * standard 64-bit birthday bound (~d²/2⁶⁵ for d distinct spans —
    * ~3e-7 at a billion spans); SpanDedupSpec proves hash- and
    * string-keyed variants agree on the gate corpus.
    *
    * @return (span_hash, n_docs, n_occurrences, first_doc), n_docs > 1. */
  def duplicateSpanHashes(docs: DataFrame, n: Int = 8,
      textCol: String = "text", idCol: String = "doc_id"): DataFrame =
    duplicateSpansBy(docs, n, textCol, idCol, xxhash64(_))
      .withColumnRenamed("span", "span_hash")

  private def duplicateSpansBy(docs: DataFrame, n: Int, textCol: String,
      idCol: String, key: Column => Column): DataFrame = {
    val perDoc = docs.select(col(idCol).as("doc_id"),
        explode(graft.expr.TextExpressions.wordShingleStrings(col(textCol), n))
          .as("span_raw"))
      .select(col("doc_id"), key(col("span_raw")).as("span"))
      .groupBy(col("span"), col("doc_id"))
      .agg(count(lit(1)).as("n_in_doc"))
    perDoc.groupBy(col("span"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_in_doc")).as("n_occurrences"),
        min(col("doc_id")).as("first_doc"))
      .filter(col("n_docs") > 1)
  }

  /** HTML → text extraction — the first stage of a web-corpus pipeline
    * (raw crawl HTML must become text before any quality/dedup stage sees
    * it). Regex-level: drop script/style blocks and comments, strip tags,
    * decode the five predefined entities, collapse whitespace. This is the
    * tag-stripping extractor (CCNet-class), NOT a DOM parser — pathological
    * markup (unclosed script tags, CDATA, conditional comments) degrades to
    * over- or under-stripping rather than erroring; a boilerplate pass
    * ([[boilerplateRemove]]) downstream is the recommended companion.
    * Pure codegen `regexp_replace` chain, zero shuffle; the patterns avoid
    * backreferences so RE2-based oracles replay them byte-for-byte. */
  def extractHtml(html: Column): Column = {
    val noScript = regexp_replace(html, "(?is)<script[^>]*>.*?</script>", " ")
    val noStyle = regexp_replace(noScript, "(?is)<style[^>]*>.*?</style>", " ")
    val noComment = regexp_replace(noStyle, "(?s)<!--.*?-->", " ")
    val noTags = regexp_replace(noComment, "(?s)<[^>]+>", " ")
    val decoded = Seq("&lt;" -> "<", "&gt;" -> ">", "&quot;" -> "\"",
        "&#39;" -> "'", "&amp;" -> "&") // &amp; LAST: "&amp;lt;" means "&lt;" literally
      .foldLeft(noTags) { case (c, (ent, ch)) => replace(c, lit(ent), lit(ch)) }
    trim(regexp_replace(decoded, "\\s+", " "))
  }

  /** Fixed-size token chunking with overlap — the context-window prep
    * stage (RAG indexing, long-doc training samples): chunk c covers
    * tokens [c·(size−overlap), c·(size−overlap)+size). Pure map — one
    * `sequence`+`transform` expression per row, explode, no shuffle at
    * all; chunk counts are ⌈(n−overlap)/(size−overlap)⌉ per doc, so
    * output volume is input volume × (1 + overlap fraction). Empty-token
    * filtering matches [[tokenCount]]'s convention (docs with no tokens
    * yield no chunks).
    *
    * @return (doc_id, chunk_id, n_chunk_tokens, chunk_text) — the last
    *         chunk may be short; a chunk never starts past the last token.
    */
  def chunkTokens(docs: DataFrame, chunkSize: Int = 64, overlap: Int = 16,
      textCol: String = "text", idCol: String = "doc_id"): DataFrame = {
    require(overlap >= 0 && overlap < chunkSize, s"need 0 <= overlap < chunkSize")
    val step = chunkSize - overlap
    val toks = filter(tokens(col(textCol)), t => t =!= "")
    docs.select(col(idCol).as("doc_id"), toks.as("toks"))
      .select(col("doc_id"), col("toks"),
        explode(when(size(col("toks")) > 0,
            sequence(lit(0), size(col("toks")) - 1, lit(step)))
          .otherwise(array())).as("start"))
      .filter(col("start") === 0 || col("start") + overlap < size(col("toks")))
      .select(col("doc_id"), (col("start") / step).cast("long").as("chunk_id"),
        slice(col("toks"), col("start") + 1, lit(chunkSize)).as("chunk"))
      .select(col("doc_id"), col("chunk_id"),
        size(col("chunk")).cast("long").as("n_chunk_tokens"),
        array_join(col("chunk"), " ").as("chunk_text"))
  }

  /** Rule-based sentence segmentation: maximal runs of non-terminator
    * characters plus their trailing `[.!?]+` punctuation, trimmed, empties
    * dropped. The pattern is RE2-safe (no lookbehind), so the exact rule
    * replays in any regex engine — the documented trade: abbreviation
    * periods ("e.g.") split, which a lookbehind rule could not promise
    * portably. Pure codegen expression (regexp_extract_all + array HOFs),
    * zero shuffle. */
  def sentences(text: Column): Column =
    filter(transform(regexp_extract_all(text, lit("[^.!?]+[.!?]*"), lit(0)),
      x => trim(x)), x => x =!= "")

  /** Content-defined chunking (Rabin-style rolling window, the LBFS/rsync
    * boundary scheme): a chunk boundary falls AFTER code point i whenever
    * the polynomial hash of the trailing `window` code points is ≡ 0 mod
    * `divisor` — so boundaries are anchored to CONTENT, and inserting or
    * deleting a prefix shifts every boundary with the text instead of
    * re-cutting the whole document the way fixed-size [[chunkTokens]]
    * does. That shift-resistance is what makes chunk-level dedup robust
    * on crawl corpora where the same passage appears at different
    * offsets.
    *
    * No minimum-chunk constraint, deliberately: boundaries depend only on
    * local content, never on the previous cut, which keeps the scheme a
    * pure per-position predicate — embarrassingly parallel per doc AND
    * replayable as plain SQL (the stateful min/max-size variant is
    * sequential and would close the oracle door). Expected chunk length
    * is `divisor` code points.
    *
    * Hash: H(i) = Σ_{j<window} cp(i−j)·p^j mod M (p=31, M=1e9+7), exact
    * integer arithmetic both engines can reproduce. Code-point correct
    * off the BMP (positions count code points, slicing respects
    * surrogate pairs). Zero shuffle: one flatMap per doc partition.
    *
    * @return (doc_id, chunk_idx, chunk_start, chunk_len, chunk_text); chunk_start is
    *         the 0-based code-point offset; a doc with no boundary yields
    *         one whole-doc chunk; empty docs yield none.
    */
  def cdcChunks(docs: DataFrame, window: Int = 16, divisor: Long = 64L,
      textCol: String = "text", idCol: String = "doc_id"): DataFrame = {
    require(window >= 2 && divisor >= 2, "need window >= 2 and divisor >= 2")
    val spark = docs.sparkSession
    import spark.implicits._
    val M = CdcMod
    val pw = cdcPowers(window)
    docs.select(col(idCol).cast("long").as("doc_id"), col(textCol).as("text"))
      .as[(Long, String)]
      .flatMap { case (id, textOrNull) =>
        val t = if (textOrNull == null) "" else textOrNull
        val cps = new scala.collection.mutable.ArrayBuffer[Int](t.length)
        val offs = new scala.collection.mutable.ArrayBuffer[Int](t.length + 1)
        var ci = 0
        while (ci < t.length) {
          val cp = t.codePointAt(ci)
          cps += cp; offs += ci; ci += Character.charCount(cp)
        }
        offs += t.length
        val n = cps.length
        val bounds = scala.collection.mutable.ArrayBuffer.empty[Int]
        var ii = window // 1-based index of the window's last code point
        while (ii <= n) {
          var h = 0L
          var j = 0
          while (j < window) { h += cps(ii - 1 - j).toLong * pw(j) % M; j += 1 }
          if (h % M % divisor == 0L) bounds += ii
          ii += 1
        }
        val starts = 0 +: bounds
        val ends = bounds :+ n
        starts.indices.iterator
          .filter(k => ends(k) > starts(k)) // text ending AT a boundary has no trailing chunk
          .map(k => (id, k, starts(k), ends(k) - starts(k),
            t.substring(offs(starts(k)), offs(ends(k)))))
      }
      .toDF("doc_id", "chunk_idx", "chunk_start", "chunk_len", "chunk_text")
  }

  /** CDC hash modulus — shared with the SQL replay. */
  val CdcMod = 1000000007L

  /** p^j mod M for the CDC window, j = 0 (newest code point) … w−1. */
  def cdcPowers(window: Int): Array[Long] =
    Array.iterate(1L, window)(x => x * 31L % CdcMod)

  /** URL canonicalization — the web-corpus dedup key (crawls see the same
    * page under case-shuffled hosts, default ports, tracking params and
    * fragments). Pure builtin-function expression tree (regexp extract/
    * replace + array HOFs, whole-stage codegen, no UDF), replayable
    * verbatim in DuckDB:
    *
    *   1. drop the #fragment;
    *   2. lowercase scheme and host; strip a leading `www.`; strip the
    *      scheme's default port (:443 https / :80 http);
    *   3. empty path → "/" (path case is preserved — path semantics are
    *      server-defined);
    *   4. drop `utm_*` / `fbclid` tracking params, SORT the survivors
    *      (param order is transport noise), re-join.
    */
  def canonicalizeUrl(u: Column): Column = {
    val noFrag = regexp_replace(u, "#.*$", "")
    val base = get(split(noFrag, "\\?"), lit(0))
    val query = get(split(noFrag, "\\?"), lit(1))
    val scheme = lower(regexp_extract(base, "^([A-Za-z][A-Za-z0-9+.-]*)://", 1))
    val rest = regexp_replace(base, "^[A-Za-z][A-Za-z0-9+.-]*://", "")
    val hostPort = lower(regexp_extract(rest, "^([^/]*)", 1))
    val host0 = regexp_replace(hostPort, "^www\\.", "")
    val host = when(scheme === "https", regexp_replace(host0, ":443$", ""))
      .when(scheme === "http", regexp_replace(host0, ":80$", ""))
      .otherwise(host0)
    val path0 = regexp_replace(rest, "^[^/]*", "")
    val path = when(path0 === "", lit("/")).otherwise(path0)
    val kept = array_join(
      array_sort(filter(split(coalesce(query, lit("")), "&"),
        p => !(p.startsWith("utm_") || p.startsWith("fbclid=") || p === ""))), "&")
    concat(scheme, lit("://"), host, path,
      when(kept === "", lit("")).otherwise(concat(lit("?"), kept)))
  }

  /** Full per-document text-stats frame over a `documents`-shaped table. */
  def analyze(df: DataFrame, textCol: String = "text"): DataFrame = {
    val t = col(textCol)
    // single-pass codegen kernel (one tokenize for all numeric columns;
    // whole-stage CSE evaluates the struct once); values identical to the
    // per-column HOF forms above — rounding stays out here so semantics
    // are bit-equal to the old plan (and the DuckDB oracle)
    val st = graft.expr.TextExpressions.textStats(t)
    df.select(col("doc_id"),
      st.getField("n_tokens").as("n_tokens"),
      st.getField("n_subwords").as("n_subwords"),
      round(st.getField("alpha_ratio"), 6).as("alpha_ratio"),
      round(st.getField("digit_ratio"), 6).as("digit_ratio"),
      round(st.getField("mean_tok_len"), 6).as("mean_tok_len"),
      round(st.getField("stopword_ratio"), 6).as("stopword_ratio"),
      round(st.getField("quality"), 6).as("quality"),
      langId(t).as("lang_pred"))
  }
}
