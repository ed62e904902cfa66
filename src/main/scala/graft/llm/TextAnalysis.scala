package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis operators for LLM training-data pipelines (builder
  * brief north-star; SURVEY §7 `graft.llm`).
  *
  * Everything is built from codegen'd Catalyst expressions (regexp_*,
  * split, higher-order array functions) — no UDFs — so these run inside
  * whole-stage codegen over 100 TB of documents.
  */
object TextAnalysis {

  /** Canonical text normalization: lowercase + whitespace collapse. */
  def normalizeText(c: Column): Column =
    trim(regexp_replace(lower(c), "\\s+", " "))

  /** Whitespace token count. */
  def tokenCountWs(c: Column): Column =
    when(length(trim(c)) === 0, lit(0))
      .otherwise(size(split(trim(c), "\\s+")))

  /** BPE-ish token count: letter/digit runs + individual punctuation
    * marks — a cheap deterministic proxy for subword token counts.
    * Unicode-aware (\p{L}\p{N}, identical classes in Java regex and
    * RE2): accented words and CJK count as text — the ASCII-only class
    * scored every umlaut and hanzi as punctuation, wrecking
    * quality/punct ratios for the non-English corpora this module's
    * own langId supports. */
  def tokenCountBpe(c: Column): Column =
    regexp_count(c, lit("[\\p{L}\\p{N}]+|[^\\p{L}\\p{N}\\s]"))

  /** Punctuation/symbol character count and ratio (Unicode-aware — see
    * [[tokenCountBpe]]). */
  def punctCount(c: Column): Column =
    regexp_count(c, lit("[^\\p{L}\\p{N}\\s]"))
  def punctRatio(c: Column): Column =
    when(length(c) === 0, lit(0.0))
      .otherwise(punctCount(c).cast("double") / length(c))

  /** Count of tokens from `words` (exact match on whitespace tokens).
    * Native per-token loop (TextKernels.scala) over the codegen'd
    * split — the filter-lambda form is retained as the Hof parity
    * baseline. */
  def stopwordCount(c: Column, words: Seq[String]): Column =
    stopwordCountStaged(split(normalizeText(c), " "), words)

  /** [[stopwordCount]] over a PRE-SPLIT token array. */
  def stopwordCountStaged(toks: Column, words: Seq[String]): Column =
    org.apache.spark.sql.GraftBridge.column(graft.functions.TokenStopHits(
      org.apache.spark.sql.GraftBridge.expression(toks), words))

  private[graft] def stopwordCountHof(c: Column,
      words: Seq[String]): Column =
    size(filter(split(normalizeText(c), " "), t => t.isInCollection(words)))

  def stopwordRatio(c: Column, words: Seq[String]): Column =
    when(tokenCountWs(c) === 0, lit(0.0))
      .otherwise(stopwordCount(c, words).cast("double") / tokenCountWs(c))

  /** Per-language stopword lists for the n-gram/stopword language-ID
    * heuristic. Deliberately small + ASCII so the same lists are
    * replayable in any SQL engine. */
  val langStopwords: Seq[(String, Seq[String])] = Seq(
    "de" -> Seq("der", "die", "das", "und", "ist", "nicht", "ein", "mit"),
    "en" -> Seq("the", "a", "of", "and", "to", "in", "is", "that"),
    "es" -> Seq("el", "la", "de", "que", "y", "en", "un", "por"),
    "fr" -> Seq("le", "la", "les", "et", "un", "une", "que", "pour"),
    "zh" -> Seq("的", "是", "了", "在", "我", "有", "他", "不"))

  /** Language ID over a STAGED token-array attribute (argmax of
    * stopword hits; CJK presence in `raw` short-circuits to `zh`; no
    * hits → "und"; ties break by language-code order). Stage the tokens
    * in a prior projection — lambda bodies are not subexpression-
    * eliminated, so an inline split would re-evaluate the normalize +
    * split regex once per language (measured 2.2× slower). */
  def langIdStaged(toks: Column, raw: Column): Column = {
    // ONE native pass computing all per-language counts + the argmax
    // (TextKernels.LangPickTokens; ties to the earliest language, no
    // hits → "und") — the HOF form below ran an interpreted
    // isInCollection lambda per token PER LANGUAGE. The CJK
    // short-circuit stays a codegen'd regexp.
    // coalesce: a NULL token array must still yield "und" — the HOF
    // form's null score fails its `> 0` check and falls through to
    // the otherwise branch (pinned by the doc-17 parity row)
    val pick = coalesce(org.apache.spark.sql.GraftBridge.column(
      graft.functions.LangPickTokens(
        org.apache.spark.sql.GraftBridge.expression(toks),
        langStopwords)), lit("und"))
    when(regexp_count(raw, lit("[\\x{4e00}-\\x{9fff}]")) > 0, lit("zh"))
      .otherwise(pick)
  }

  /** HOF parity baseline for [[langIdStaged]] (TextKernelsSpec). */
  private[graft] def langIdStagedHof(toks: Column, raw: Column): Column = {
    // argmax via array_max over (score, -index, lang) structs — see
    // the git history for the lambda-evaluation-count notes
    val entries = langStopwords.zipWithIndex.map { case ((lang, ws), i) =>
      struct(
        size(filter(toks, t => t.isInCollection(ws))).as("s"),
        lit(-i).as("ni"), lit(lang).as("lang"))
    }
    val best = array_max(array(entries: _*))
    val pick = when(best.getField("s") > 0, best.getField("lang"))
      .otherwise(lit("und"))
    when(regexp_count(raw, lit("[\\x{4e00}-\\x{9fff}]")) > 0, lit("zh"))
      .otherwise(pick)
  }

  /** One-shot language ID (convenience form; for wide scans prefer
    * staging `split(normalizeText(c), " ")` + langIdStaged). */
  def langId(c: Column): Column =
    langIdStaged(split(normalizeText(c), " "), c)

  /** Quality score from STAGED components (see qualityScore for the
    * formula; stage n_chars/punct_cnt/tok_ws/sw_cnt once and reuse them
    * across output columns instead of re-running the regexes). */
  def qualityScoreStaged(nChars: Column, punctCnt: Column,
                         tokWs: Column, swCnt: Column): Column = {
    val lenScore = least(nChars.cast("double") / 500.0, lit(1.0))
    val punctRatioS = when(nChars === 0, lit(0.0))
      .otherwise(punctCnt.cast("double") / nChars)
    val punctScore = greatest(lit(0.0), lit(1.0) - punctRatioS * 5.0)
    val swRatioS = when(tokWs === 0, lit(0.0))
      .otherwise(swCnt.cast("double") / tokWs)
    val swScore = least(swRatioS * 4.0, lit(1.0))
    // null text → null score, NOT 0.666: least/greatest absorb nulls
    // (least(null, 1.0) = 1.0), so without the guard a null document
    // outranks genuinely low-quality text in every quality filter
    when(nChars.isNull, lit(null).cast("double"))
      .otherwise(round((lenScore + punctScore + swScore) / 3.0, 6))
  }

  /** Quality score in [0, 1]: length sweet-spot + low punctuation +
    * healthy stopword density. Deterministic arithmetic only. */
  def qualityScore(c: Column, stopwords: Seq[String] =
      langStopwords.toMap.apply("en")): Column =
    qualityScoreStaged(length(c), punctCount(c), tokenCountWs(c),
      stopwordCount(c, stopwords))

  /** Word n-gram shingles over normalized text; short docs yield the
    * whole normalized text as a single shingle.
    *
    * Built as a zip of shifted slices (not `transform(sequence, i =>
    * element_at(w, i)…)`): a lambda that closes over `w` would
    * re-evaluate the split-of-normalized-text for every position —
    * ~O(len²) per document. zip_with evaluates each operand once. */
  def wordShingles(c: Column, n: Int = 3): Column =
    // ONE native pass (TextKernels.WordShinglesExpr): normalize +
    // tokenize + join in a primitive loop — the zip_with-of-slices
    // fold was n−1 CodegenFallback HOF nodes per row, feeding every
    // dedup/decontamination query. Hof form retained below for parity.
    org.apache.spark.sql.GraftBridge.column(
      graft.functions.WordShinglesExpr(
        org.apache.spark.sql.GraftBridge.expression(c), n))

  /** HOF parity baseline for [[wordShingles]] (TextKernelsSpec). */
  private[graft] def wordShinglesHof(c: Column, n: Int = 3): Column = {
    require(n >= 1 && n <= 16, s"shingle size must be in [1, 16], got $n")
    val norm = normalizeText(c)
    val w = split(norm, " ")
    val k = size(w) - (n - 1)
    // general n by folding shifted slices through zip_with — each slice
    // evaluates once, same O(len) shape as the original fixed-3 form
    val joined = (2 to n).foldLeft(slice(w, lit(1), k)) { (acc, i) =>
      zip_with(acc, slice(w, lit(i), k), (a, b) => concat_ws(" ", a, b))
    }
    when(k <= 0, array(norm)).otherwise(joined)
  }

  /** Word bigrams over a STAGED token array — zip of shifted slices,
    * same O(n) pattern as wordShingles. <2 tokens → empty array. */
  def wordBigramsStaged(toks: Column): Column =
    // native adjacent-pair loop (TextKernels.ArrayBigrams); Hof form
    // retained below for parity
    org.apache.spark.sql.GraftBridge.column(
      graft.functions.ArrayBigrams(
        org.apache.spark.sql.GraftBridge.expression(toks)))

  /** HOF parity baseline for [[wordBigramsStaged]]. */
  private[graft] def wordBigramsStagedHof(toks: Column): Column = {
    val k = size(toks) - 1
    when(k <= 0, array().cast("array<string>")).otherwise(
      zip_with(slice(toks, lit(1), k), slice(toks, lit(2), k),
               (a, b) => concat_ws(" ", a, b)))
  }

  /** Sentence segmentation: split on runs of terminal punctuation,
    * trim, drop empties — the RE2-portable rule (no lookbehind), so the
    * same split replays in any engine. Returns array<string>. Native
    * one-pass kernel (TextKernels.SentencesExpr); the split/trim/filter
    * HOF chain is retained below as the parity baseline. */
  def sentences(c: Column): Column =
    org.apache.spark.sql.GraftBridge.column(
      graft.functions.SentencesExpr(
        org.apache.spark.sql.GraftBridge.expression(c)))

  /** HOF parity baseline for [[sentences]] (TextKernelsSpec). */
  private[graft] def sentencesHof(c: Column): Column =
    filter(transform(split(c, "[.!?]+"), x => trim(x)),
      x => length(x) > 0)

  /** Per-sentence-normalized sentences — the fused
    * `transform(sentences(c), normalizeText)` of sentence-grain dedup
    * in ONE native pass. Elements may be "" (whitespace-only
    * sentence), matching the HOF composition. */
  def normSentences(c: Column): Column =
    org.apache.spark.sql.GraftBridge.column(
      graft.functions.NormSentencesExpr(
        org.apache.spark.sql.GraftBridge.expression(c)))

  /** HOF parity baseline for [[normSentences]]. */
  private[graft] def normSentencesHof(c: Column): Column =
    transform(sentencesHof(c), s => normalizeText(s))

  /** Non-empty tokens of normalized text — the
    * `filter(split(normalizeText(c), " "), length > 0)` tokenization
    * (model scoring, heavy hitters) in ONE native pass. */
  def normTokens(c: Column): Column =
    org.apache.spark.sql.GraftBridge.column(
      graft.functions.NormTokensExpr(
        org.apache.spark.sql.GraftBridge.expression(c)))

  /** HOF parity baseline for [[normTokens]]. */
  private[graft] def normTokensHof(c: Column): Column =
    filter(split(normalizeText(c), " "), t => length(t) > 0)

  /** C4/Gopher-style document heuristics — the standard web-corpus
    * cleaning rules as one pure projection (no shuffle): token shape
    * (count / mean length / alphabetic ratio / symbol ratio), line
    * shape (terminal-punctuation, bullet and ellipsis line ratios over
    * RAW lines — these rules predate whitespace normalization by
    * design), sentence count, and the C4 content flags (lorem ipsum,
    * curly brace, javascript). `keep` combines them with the published
    * thresholds: 50 ≤ words ≤ 100k, 3 ≤ mean word length ≤ 10,
    * alpha-word ratio ≥ 0.8, symbol ratio ≤ 0.1, bullet lines ≤ 0.9,
    * ellipsis lines ≤ 0.3, no lorem/curly.
    *
    * As of round 10 the token/line counters run in ONE native
    * whole-stage-codegen pass ([[graft.functions.C4Stats]]); the HOF
    * form is retained as [[c4SignalsHof]] for parity. `carry` columns
    * flow through unchanged, so a cleaning stage can `.filter(keep)`
    * inline instead of joining survivors back by id.
    */
  def c4Signals(df: DataFrame, idCol: String, textCol: String,
                carry: Seq[String] = Nil): DataFrame = {
    val raw = coalesce(col(textCol), lit(""))
    val carryCols = carry.filterNot(_ == idCol).map(col)
    // one native pass for the token/line counters (TextKernels.scala —
    // the interpreted-HOF form is retained below as c4SignalsHof, the
    // parity baseline TextKernelsSpec pins this against)
    val st = org.apache.spark.sql.GraftBridge.column(
      graft.functions.C4Stats(
        org.apache.spark.sql.GraftBridge.expression(raw)))
    val staged = df.select(Seq(col(idCol), raw.as("__raw"),
      st.as("__st")) ++ carryCols: _*)
    val nWords = col("__st.n_words")
    val nz = nWords =!= 0
    val nLines = col("__st.n_lines")
    def lineRatio(cnt: Column): Column =
      when(nLines === 0, lit(0.0))
        .otherwise(cnt.cast("double") / nLines)
    staged.select(Seq(col(idCol), nWords.as("n_words"),
        round(when(nz, col("__st.sum_len").cast("double") / nWords)
          .otherwise(lit(0.0)), 6).as("mean_word_len"),
        round(when(nz, col("__st.n_alpha").cast("double") / nWords)
          .otherwise(lit(0.0)), 6).as("alpha_ratio"),
        round(when(nz,
            regexp_count(col("__raw"), lit("#|…|\\.\\.\\."))
              .cast("double") / nWords).otherwise(lit(0.0)), 6)
          .as("symbol_ratio"),
        regexp_count(col("__raw"), lit("[.!?]")).as("sent_marks"),
        round(lineRatio(col("__st.n_term")), 6).as("term_line_ratio"),
        round(lineRatio(col("__st.n_bullet")), 6)
          .as("bullet_line_ratio"),
        round(lineRatio(col("__st.n_ell")), 6)
          .as("ellipsis_line_ratio"),
        lower(col("__raw")).contains("lorem ipsum").as("has_lorem"),
        col("__raw").contains("{").as("has_curly"),
        lower(col("__raw")).contains("javascript").as("has_js"))
        ++ carryCols: _*)
      .withColumn("keep",
        col("n_words").between(50, 100000) &&
        col("mean_word_len").between(3.0, 10.0) &&
        col("alpha_ratio") >= 0.8 && col("symbol_ratio") <= 0.1 &&
        col("bullet_line_ratio") <= 0.9 &&
        col("ellipsis_line_ratio") <= 0.3 &&
        !col("has_lorem") && !col("has_curly"))
  }

  /** The original higher-order-function form of [[c4Signals]] —
    * retained (test-only) as the parity baseline for the native
    * kernel; CodegenFallback lambdas, do not use in production. */
  private[graft] def c4SignalsHof(df: DataFrame, idCol: String,
                textCol: String, carry: Seq[String] = Nil): DataFrame = {
    val raw = coalesce(col(textCol), lit(""))
    val carryCols = carry.filterNot(_ == idCol).map(col)
    val staged = df.select(Seq(col(idCol), raw.as("__raw"),
        split(normalizeText(raw), " ").as("__toks"),
        filter(transform(split(raw, "\n"), l => trim(l)),
          l => length(l) > 0).as("__lines")) ++ carryCols: _*)
      .select(Seq(col(idCol), col("__raw"), col("__lines"),
        when(length(col("__raw")) === 0 ||
             size(col("__toks")) === 0, lit(0))
          .otherwise(when(col("__toks").getItem(0) === "" &&
                          size(col("__toks")) === 1, lit(0))
            .otherwise(size(col("__toks")))).as("n_words"),
        col("__toks")) ++ carryCols: _*)
    val nz = col("n_words") =!= 0
    val nLines = size(col("__lines"))
    def lineRatio(pred: Column => Column): Column =
      when(nLines === 0, lit(0.0))
        .otherwise(size(filter(col("__lines"), pred)).cast("double") /
          nLines)
    staged.select(Seq(col(idCol), col("n_words"),
        round(when(nz, aggregate(transform(col("__toks"),
              t => length(t).cast("long")), lit(0L), (a, x) => a + x)
            .cast("double") / col("n_words")).otherwise(lit(0.0)), 6)
          .as("mean_word_len"),
        round(when(nz, size(filter(col("__toks"),
              t => t.rlike("[a-z]"))).cast("double") / col("n_words"))
            .otherwise(lit(0.0)), 6)
          .as("alpha_ratio"),
        // symbols = '#', the Unicode ellipsis, AND ASCII '...' runs
        // (one per non-overlapping triple) \u2014 the published Gopher
        // symbol-to-word rule counts both ellipsis spellings;
        // ellipsis_line_ratio below already did
        round(when(nz,
            regexp_count(col("__raw"), lit("#|\u2026|\\.\\.\\."))
              .cast("double") / col("n_words")).otherwise(lit(0.0)), 6)
          .as("symbol_ratio"),
        regexp_count(col("__raw"), lit("[.!?]")).as("sent_marks"),
        round(lineRatio(l => l.rlike("[.!?\"]$")), 6)
          .as("term_line_ratio"),
        round(lineRatio(l => l.rlike("^[-*\u2022]")), 6)
          .as("bullet_line_ratio"),
        round(lineRatio(l => l.rlike("(\\.\\.\\.|\u2026)$")), 6)
          .as("ellipsis_line_ratio"),
        lower(col("__raw")).contains("lorem ipsum").as("has_lorem"),
        col("__raw").contains("{").as("has_curly"),
        lower(col("__raw")).contains("javascript").as("has_js"))
        ++ carryCols: _*)
      .withColumn("keep",
        col("n_words").between(50, 100000) &&
        col("mean_word_len").between(3.0, 10.0) &&
        col("alpha_ratio") >= 0.8 && col("symbol_ratio") <= 0.1 &&
        col("bullet_line_ratio") <= 0.9 &&
        col("ellipsis_line_ratio") <= 0.3 &&
        !col("has_lorem") && !col("has_curly"))
  }

  /** Corpus-level bigram collocation extraction by pointwise mutual
    * information: PMI(w1,w2) = ln(P(w1w2) / (P(w1)·P(w2))) with
    * probabilities from corpus counts, reported for bigrams seen at
    * least `minCount` times, top `topK` by (PMI, bigram) — the
    * classic collocation statistic over a token corpus.
    *
    * Scale shape: bigram/unigram shuffles carry (token-string, partial
    * count) with map-side combine — never doc ids or text; corpus
    * totals are two one-row aggregates cross-joined as literals-at-
    * runtime; the min-count filter shrinks the bigram side BEFORE the
    * two word-key joins against the unigram counts. The PMI products
    * run in double from the first multiplication (identical op order in
    * every engine ⇒ still exact parity; the all-int64 form would
    * overflow at web-corpus counts).
    */
  def collocations(df: DataFrame, idCol: String, textCol: String,
                   minCount: Long = 5L, topK: Int = 50): DataFrame = {
    val toks = df.select(
      split(normalizeText(col(textCol)), " ").as("__toks"))
    val uc = toks.select(explode(col("__toks")).as("tok"))
      .groupBy("tok").agg(count(lit(1)).as("c_w"))
    val bc = toks.select(explode(wordBigramsStaged(col("__toks"))).as("bg"))
      .groupBy("bg").agg(count(lit(1)).as("c_bg"))
    val nU = uc.agg(sum("c_w").as("n_u"))
    val nB = bc.agg(sum("c_bg").as("n_bg"))
    val joined = bc.filter(col("c_bg") >= minCount)
      .withColumn("__w1", element_at(split(col("bg"), " "), 1))
      .withColumn("__w2", element_at(split(col("bg"), " "), 2))
      .join(uc.select(col("tok").as("__w1"), col("c_w").as("c_w1")),
        Seq("__w1"))
      .join(uc.select(col("tok").as("__w2"), col("c_w").as("c_w2")),
        Seq("__w2"))
      .crossJoin(nU).crossJoin(nB)
    // denominator in double from the first product: the all-long form
    // overflows int64 at web scale (n_bg ~ 1e11 × two 1e9 counts)
    joined.select(col("bg"), col("c_bg"),
        round(log(col("c_bg").cast("double") * col("n_u") * col("n_u") /
          (col("n_bg").cast("double") * col("c_w1") * col("c_w2"))), 6)
          .as("pmi"))
      .orderBy(col("pmi").desc, col("bg"))
      .limit(topK)
  }

  /** Gopher-style repetition signals per document — the standard
    * training-data repetition filters over a token-stream corpus:
    *  - `dup_token_ratio`: fraction of token occurrences that repeat an
    *    earlier token (1 − distinct/total),
    *  - `dup_bigram_frac`: same at bigram grain,
    *  - `top_bigram_frac`: fraction of all bigram occurrences taken by
    *    the single most frequent bigram.
    *
    * Plan shape (round 10): a PURE PROJECTION — token and bigram
    * counters are one per-document hash-map pass in a native
    * expression ([[graft.functions.RepetitionStats]]); the former
    * explode + two-level aggregate (two shuffles) is retained as
    * [[repetitionSignalsHof]] for parity only. Docs with <2 tokens
    * get 0.0 bigram fractions. */
  def repetitionSignals(df: DataFrame, idCol: String,
                        textCol: String): DataFrame = {
    // the exploded (id, bigram) shuffle is gone: token AND bigram
    // counters are one per-document hash-map pass in a native
    // expression (TextKernels.scala) — pure projection, no shuffle
    val st = org.apache.spark.sql.GraftBridge.column(
      graft.functions.RepetitionStats(
        org.apache.spark.sql.GraftBridge.expression(
          normalizeText(col(textCol)))))
    df.select(col(idCol), st.as("__st"))
      .select(col(idCol), col("__st.n_tok").as("n_tok"),
        round(lit(1.0) -
          col("__st.n_distinct").cast("double") / col("__st.n_tok"), 6)
          .as("dup_token_ratio"),
        when(col("__st.total_bg") > 0,
          round(lit(1.0) - col("__st.distinct_bg").cast("double") /
            col("__st.total_bg"), 6))
          .otherwise(lit(0.0)).as("dup_bigram_frac"),
        when(col("__st.total_bg") > 0,
          round(col("__st.top_bg").cast("double") /
            col("__st.total_bg"), 6))
          .otherwise(lit(0.0)).as("top_bigram_frac"))
  }

  /** The original explode-and-shuffle form of [[repetitionSignals]] —
    * parity baseline for TextKernelsSpec. */
  private[graft] def repetitionSignalsHof(df: DataFrame, idCol: String,
                        textCol: String): DataFrame = {
    val base = df.select(col(idCol),
      split(normalizeText(col(textCol)), " ").as("toks"))
    val tokStats = base.select(col(idCol),
      size(col("toks")).as("n_tok"),
      size(array_distinct(col("toks"))).as("n_tok_distinct"))
    val bgStats = base
      .select(col(idCol), explode(wordBigramsStaged(col("toks"))).as("bg"))
      .groupBy(col(idCol), col("bg")).agg(count(lit(1)).as("cnt"))
      .groupBy(col(idCol)).agg(
        sum("cnt").as("total_bg"), max("cnt").as("top_bg"),
        count(lit(1)).as("distinct_bg"))
    tokStats.join(bgStats, Seq(idCol), "left_outer")
      .select(col(idCol), col("n_tok").cast("int").as("n_tok"),
        round(lit(1.0) -
          col("n_tok_distinct").cast("double") / col("n_tok"), 6)
          .as("dup_token_ratio"),
        round(coalesce(lit(1.0) -
          col("distinct_bg").cast("double") / col("total_bg"), lit(0.0)), 6)
          .as("dup_bigram_frac"),
        round(coalesce(
          col("top_bg").cast("double") / col("total_bg"), lit(0.0)), 6)
          .as("top_bigram_frac"))
  }

  /** Bigram-LM document scoring — the CCNet/perplexity-filter shape one
    * order up from the unigram probe: per-document mean negative
    * log-probability of its token bigrams under the corpus's own bigram
    * MLE, P(w2|w1) = c(w1 w2) / c(w1 ·) with c(w1 ·) the HISTORY count
    * (occurrences of w1 as a bigram head). Every observed bigram has
    * c ≥ 1, so scoring the training corpus itself needs no smoothing —
    * and no vocab-size constant that would have to match across
    * engines.
    *
    * Scale shape: the bigram and history tables are vocab-sized
    * aggregates of the same exploded stream the scoring join consumes —
    * map-side combine shrinks both shuffles to (term, partial count).
    * They re-enter as broadcasts at bench scale; at 100 TB the bigram
    * vocab outgrows a broadcast and the identical plan holds with
    * shuffle hash joins keyed on the bigram string (salting never
    * needed — Zipf skew sits in the COUNT tables, which are one row per
    * key by construction). Docs with < 2 tokens have no bigrams and are
    * absent from the output (callers left-join if they need every doc).
    *
    * Output: idCol, n_big, nll (= mean −ln P, rounded at 4 — the
    * avg-of-doubles engine-drift slack, see text_unigram_logprob). */
  def bigramLogprob(df: DataFrame, idCol: String,
                    textCol: String): DataFrame = {
    val bg = df.select(col(idCol),
      explode(wordBigramsStaged(
        split(normalizeText(coalesce(col(textCol), lit(""))), " ")))
        .as("bg"))
    val bgCnt = bg.groupBy("bg").agg(count(lit(1)).as("c12"))
    val histCnt = bg
      .groupBy(substring_index(col("bg"), " ", 1).as("__w1"))
      .agg(count(lit(1)).as("c1"))
    bg.join(broadcast(bgCnt), Seq("bg"))
      .withColumn("__w1", substring_index(col("bg"), " ", 1))
      .join(broadcast(histCnt), Seq("__w1"))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_big"),
        round(avg(-log(col("c12").cast("double") / col("c1"))), 4)
          .as("nll"))
  }

  /** Character-entropy profile per document — the cheap
    * gibberish/boilerplate signal (low entropy = repetitive junk, high
    * entropy ≈ random noise; natural text sits in a narrow band):
    * Shannon entropy in nats over the document's code-point frequency
    * distribution, H = ln n − (Σ c·ln c)/n.
    *
    * Characters are enumerated with `(?s).` (RE2-portable; one match
    * per CODE POINT in both Java regex and RE2, so astral-plane text
    * profiles identically in any engine — a UTF-16-unit split would
    * halve every emoji). Plan shape: explode → two-level aggregate;
    * map-side combine collapses the (id, char) stream to ≈ doc ×
    * alphabet rows before the only shuffle, and the per-doc reduce
    * carries counts, never text. Empty/null docs have no characters
    * and are absent from the output.
    *
    * Output: idCol, n_chars, n_unique, entropy (nats, rounded at 4 —
    * the Σ c·ln c term is a double sum, same engine-drift slack as
    * every avg-of-doubles column). */
  def charEntropyProfile(df: DataFrame, idCol: String,
                         textCol: String): DataFrame =
    df.select(col(idCol),
        explode(regexp_extract_all(coalesce(col(textCol), lit("")),
          lit("(?s)."), lit(0))).as("__ch"))
      .groupBy(col(idCol), col("__ch"))
      .agg(count(lit(1)).as("cnt"))
      .groupBy(col(idCol))
      .agg(sum("cnt").cast("long").as("n_chars"),
        count(lit(1)).as("n_unique"),
        round(
          log(sum("cnt").cast("double")) -
            sum(col("cnt").cast("double") * log(col("cnt").cast("double")))
              / sum("cnt").cast("double"), 4).as("entropy"))

  /** PII redaction for training corpora: emails → `<EMAIL>`,
    * IPv4 addresses → `<IP>`, simple phone forms → `<PHONE>`.
    * Plain `regexp_replace` chain (codegen'd, no UDF); patterns kept to
    * the RE2-compatible subset so any SQL engine replays them
    * identically. Email first — its pattern can contain digits/dots the
    * narrower patterns would otherwise split. */
  def redactPii(c: Column): Column = {
    val email = regexp_replace(c,
      "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}", "<EMAIL>")
    val ip = regexp_replace(email,
      "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b", "<IP>")
    regexp_replace(ip, "\\b\\d{3}-\\d{3}-\\d{4}\\b", "<PHONE>")
  }

  /** Exact-content fingerprint: md5 of normalized text. */
  def fingerprint(c: Column): Column = md5(normalizeText(c))

  /** Rolling-hash document fingerprint: min over shingle md5s (a 1-value
    * winnowing sketch — stable under small appends, unlike full-text
    * md5). Native one-pass kernel (TextKernels.MinShingleMd5); the
    * per-shingle md5 lambda is retained below as the parity baseline. */
  def rollingFingerprint(c: Column, n: Int = 3): Column =
    org.apache.spark.sql.GraftBridge.column(
      graft.functions.MinShingleMd5(
        org.apache.spark.sql.GraftBridge.expression(c), n))

  /** HOF parity baseline for [[rollingFingerprint]]. */
  private[graft] def rollingFingerprintHof(c: Column, n: Int = 3): Column =
    array_min(transform(wordShingles(c, n), s => md5(s)))

  // ---------- hashed-feature linear model inference ----------

  /** Integer feature weight for one token: a 24-bit md5 prefix mapped
    * into [-1000, 1000]. Engine-portable (md5 + mod, no
    * engine-specific hash) and the INT range keeps per-doc sums in
    * exact integer space — see [[linearScoreRaw]]. In production the
    * weights come from a trained artifact (a broadcast `{bucket →
    * weight}` table); this derivation stands in deterministically so
    * the inference plumbing is oracle-checkable without shipping a
    * model. */
  def tokenWeight(tok: Column): Column =
    conv(substring(md5(tok), 1, 6), 16, 10).cast("long") % 2001 - 1000

  /** Raw hashed-linear-model activation for a pre-split token array:
    * Σ tokenWeight(tok), folded in exact LONG space — cross-engine
    * float summation order can never flip a comparison, the lesson
    * behind every avg-of-doubles oracle bug. This is the model-based
    * quality-filter shape (fastText/classifier corpus scoring): one
    * pure projection over the scan, no shuffle, no UDF. */
  def linearScoreRaw(toks: Column): Column =
    // native fold (TextKernels.LinearScore) — the aggregate form ran
    // an interpreted md5+conv+mod lambda per token; Hof retained for
    // parity
    org.apache.spark.sql.GraftBridge.column(
      graft.functions.LinearScore(
        org.apache.spark.sql.GraftBridge.expression(toks)))

  /** HOF parity baseline for [[linearScoreRaw]]. */
  private[graft] def linearScoreRawHof(toks: Column): Column =
    aggregate(toks, lit(0L), (acc, t) => acc + tokenWeight(t))

  /** Logistic link mapping a raw activation to a (0, 1) quality
    * score. `scale` is the model's temperature (weight-unit
    * normalizer for the synthetic [-1000,1000] weights). */
  def logistic(raw: Column, scale: Double): Column =
    lit(1.0) / (lit(1.0) + exp(-(raw.cast("double") / lit(scale))))

  /** Corpus-unigram-LM negative log-likelihood per key group — the
    * CCNet/perplexity-filter core shared by `text_unigram_logprob`
    * and `ccnet_perplexity_buckets` (one body so a change to token
    * filtering or smoothing can't silently diverge the two probes).
    * The frequency table is vocab-sized and BROADCAST; the
    * corpus-sized token stream never shuffles for the join — one
    * keyCols aggregation after it.
    *
    * Notes carried with the body:
    *  - `sum()` over an empty vocab yields one NULL row — guarded;
    *    total=0 leaves the (empty) output frame empty either way.
    *  - avg of per-token double logs is summation-order-sensitive in
    *    principle; accepted because round(...,4) gives ~5e-5 of slack
    *    vs ~1e-13 of cross-engine drift (a flip needs the true value
    *    within 1e-13 of a rounding boundary) — the general
    *    avg-of-doubles ban targets round(...,6)+ output columns.
    *
    * Output: keyCols..., n_tok, nll. */
  def unigramNll(df: DataFrame, textCol: String,
                 keyCols: Seq[String]): DataFrame = {
    val toks = df.select(keyCols.map(col) :+
      explode(split(normalizeText(col(textCol)), " ")).as("tok"): _*)
    val uni = toks.groupBy("tok").agg(count(lit(1)).as("cnt"))
    val totRow = uni.agg(sum(col("cnt"))).first()
    val total = if (totRow.isNullAt(0)) 0L else totRow.getLong(0)
    toks.join(broadcast(uni), Seq("tok"))
      .groupBy(keyCols.map(col): _*)
      .agg(count(lit(1)).as("n_tok"),
        round(avg(-log(col("cnt").cast("double") /
          lit(total.toDouble))), 4).as("nll"))
  }

  /** Stop words for the Gopher "contains common English words" rule
    * (Rae et al. 2021, A1.1 — their exact list). */
  private val GopherStops =
    Seq("the", "be", "to", "of", "and", "that", "have", "with")

  /** The Gopher document-quality rule battery (Rae et al. 2021,
    * Appendix A1.1) — the published filter set between C4's heuristics
    * and model-based scoring. Every rule is a pure Column expression
    * over one whitespace tokenization of the RAW text (no normalize
    * pass: symbol ratios and casing are part of what the rules
    * measure) — one map-side projection, no shuffle, no Scala UDF, so
    * it scales embarrassingly at 100 TB. As of round 10 the per-word
    * counters run in ONE native whole-stage-codegen expression
    * ([[graft.functions.GopherWordStats]], the PqEncode pattern) —
    * the former filter/transform/aggregate/array_intersect HOF pieces
    * were CodegenFallback interpreted lambdas and are retained only as
    * the [[gopherRulesHof]] parity baseline.
    *
    * Rules (each emitted as its own flag so downstream mixes can
    * re-weight rather than hard-drop):
    *   r_word_count    50 ≤ words ≤ 100 000
    *   r_mean_word_len 3 ≤ mean word length ≤ 10
    *   r_symbol_ratio  (# + …-as-"...") / words ≤ 0.1
    *   r_alpha_words   ≥ 80 % of words contain a letter
    *   r_stop_words    ≥ 2 distinct words from the Gopher stop list
    *   pass            conjunction of the five
    *
    * (The two line-shape rules — bullet-start and ellipsis-end line
    * fractions — need a line corpus; they live with the line ops, not
    * here.) Ratios are ROUNDED at 6 from integer counts — a count
    * ratio, not an avg-of-doubles, so cross-engine exact. */
  def gopherRules(df: DataFrame, idCol: String,
                  textCol: String): DataFrame = {
    val txt = coalesce(col(textCol), lit(""))
    // per-word counters in one native pass (TextKernels.scala); the
    // symbol counts stay as codegen'd regexp length-diffs over the raw
    // text, exactly as before
    val st = org.apache.spark.sql.GraftBridge.column(
      graft.functions.GopherWordStats(
        org.apache.spark.sql.GraftBridge.expression(txt), GopherStops))
    val staged = df.select(col(idCol), txt.as("__raw"), st.as("__st"))
    val nW = col("__st.n_words")
    val rawC = col("__raw")
    val nHash = length(rawC) - length(regexp_replace(rawC, "#", ""))
    val nEll = ((length(rawC) -
      length(regexp_replace(rawC, "\\.\\.\\.", ""))) / 3)
      .cast("long")
    staged.select(col(idCol), nW.as("n_words"),
        when(nW > 0, round(col("__st.n_chars").cast("double") / nW, 6))
          .otherwise(lit(0d)).as("mean_word_len"),
        when(nW > 0, round((nHash + nEll).cast("double") / nW, 6))
          .otherwise(lit(0d)).as("symbol_ratio"),
        when(nW > 0, round(col("__st.n_alpha").cast("double") / nW, 6))
          .otherwise(lit(0d)).as("alpha_frac"),
        col("__st.n_stop").as("n_stop"))
      .withColumn("r_word_count",
        col("n_words") >= 50 && col("n_words") <= 100000L)
      .withColumn("r_mean_word_len",
        col("mean_word_len") >= 3d && col("mean_word_len") <= 10d)
      .withColumn("r_symbol_ratio", col("symbol_ratio") <= 0.1)
      .withColumn("r_alpha_words", col("alpha_frac") >= 0.8)
      .withColumn("r_stop_words", col("n_stop") >= 2L)
      .withColumn("pass",
        col("r_word_count") && col("r_mean_word_len") &&
        col("r_symbol_ratio") && col("r_alpha_words") &&
        col("r_stop_words"))
  }

  /** Filter provenance — the audit trail a curation team reads before
    * moving a threshold: one (id, reason) row per FAILED
    * [[gopherRules]] rule. The reasons are the production decision
    * itself (derived from the battery's own flags, never re-derived),
    * so the audit cannot drift from the filter. Documents passing
    * every rule emit nothing.
    *
    * Scale shape: the battery's map-side projection plus a
    * rules-sized (5×) codegen explode + filter — no HOF lambdas, no
    * shuffle; linear in documents with a constant fan-out. */
  def dropReasons(df: DataFrame, idCol: String,
                  textCol: String): DataFrame = {
    val rules = Seq("r_word_count", "r_mean_word_len",
      "r_symbol_ratio", "r_alpha_words", "r_stop_words")
    gopherRules(df, idCol, textCol)
      .select(col(idCol), explode(array(rules.map(n =>
        struct(lit(n).as("reason"), col(n).as("ok"))): _*)).as("__p"))
      .filter(!col("__p.ok"))
      .select(col(idCol), col("__p.reason").as("reason"))
  }

  /** The original HOF form of [[gopherRules]] — parity baseline for
    * TextKernelsSpec; CodegenFallback, test-only. */
  private[graft] def gopherRulesHof(df: DataFrame, idCol: String,
                  textCol: String): DataFrame = {
    val txt = coalesce(col(textCol), lit(""))
    val ws = filter(split(txt, "\\s+"), w => w =!= "")
    val nW = size(ws)
    val nChars = aggregate(ws, lit(0L), (acc, w) => acc + length(w))
    val nHash = length(txt) - length(regexp_replace(txt, "#", ""))
    val nEll = ((length(txt) -
      length(regexp_replace(txt, "\\.\\.\\.", ""))) / 3)
      .cast("long")
    val nAlpha = size(filter(ws, w => w.rlike("[A-Za-z]")))
    val nStop = size(array_intersect(
      array_distinct(transform(ws, lower _)),
      array(GopherStops.map(lit): _*)))
    df.select(col(idCol), nW.cast("long").as("n_words"),
        when(nW > 0, round(nChars.cast("double") / nW, 6))
          .otherwise(lit(0d)).as("mean_word_len"),
        when(nW > 0, round((nHash + nEll).cast("double") / nW, 6))
          .otherwise(lit(0d)).as("symbol_ratio"),
        when(nW > 0, round(nAlpha.cast("double") / nW, 6))
          .otherwise(lit(0d)).as("alpha_frac"),
        nStop.cast("long").as("n_stop"))
      .withColumn("r_word_count",
        col("n_words") >= 50 && col("n_words") <= 100000L)
      .withColumn("r_mean_word_len",
        col("mean_word_len") >= 3d && col("mean_word_len") <= 10d)
      .withColumn("r_symbol_ratio", col("symbol_ratio") <= 0.1)
      .withColumn("r_alpha_words", col("alpha_frac") >= 0.8)
      .withColumn("r_stop_words", col("n_stop") >= 2L)
      .withColumn("pass",
        col("r_word_count") && col("r_mean_word_len") &&
        col("r_symbol_ratio") && col("r_alpha_words") &&
        col("r_stop_words"))
  }

  /** The Gopher LINE-shape rules (Rae et al. 2021, A1.1) —
    * [[gopherRules]]' companion over a line-structured corpus (that
    * battery's scaladoc defers these here):
    *   bullet_frac    fraction of lines starting with a bullet
    *                  ('-', '*', '•')            — rule ≤ 0.90
    *   ellipsis_frac  fraction of lines ending in '...' or '…'
    *                                              — rule ≤ 0.30
    *   dup_line_frac  fraction of lines whose content occurs more
    *                  than once in the doc (every copy counts — the
    *                  duplicated content IS the signal)  — ≤ 0.30
    *   dup_char_frac  fraction of line characters inside such
    *                  duplicated lines                    — ≤ 0.20
    *
    * Scale shape (round 10): a PURE PROJECTION — the per-doc
    * duplicate-line counters are one hash-map pass inside a native
    * expression ([[graft.functions.GopherLineStats]]); the former
    * explode → (id, line) → (id) two-shuffle form is retained as
    * [[gopherLineRulesHof]] for parity only. Per-doc state is bounded
    * by document size, the same bound every token-array op carries.
    * Ratios are integer-count divisions rounded at 6 — cross-engine
    * exact. Empty/null docs
    * surface with zero lines and all-true flags (nothing to object
    * to), matching the empty-frame behavior of the line-dedup ops. */
  def gopherLineRules(df: DataFrame, idCol: String,
                      textCol: String): DataFrame = {
    // the per-(id, line) shuffle is gone: the duplicate-line counters
    // are a per-document hash map inside ONE native expression
    // (TextKernels.scala) — a pure projection, bounded by document
    // size exactly like the token-array ops
    val st = org.apache.spark.sql.GraftBridge.column(
      graft.functions.GopherLineStats(
        org.apache.spark.sql.GraftBridge.expression(
          coalesce(col(textCol), lit("")))))
    df.select(col(idCol), st.as("__st"))
      .select(col(idCol), col("__st.n_lines").as("n_lines"),
        when(col("__st.n_lines") > 0,
          round(col("__st.n_bullet").cast("double") /
            col("__st.n_lines"), 6))
          .otherwise(lit(0d)).as("bullet_frac"),
        when(col("__st.n_lines") > 0,
          round(col("__st.n_ell").cast("double") /
            col("__st.n_lines"), 6))
          .otherwise(lit(0d)).as("ellipsis_frac"),
        when(col("__st.n_lines") > 0,
          round(col("__st.n_dup").cast("double") /
            col("__st.n_lines"), 6))
          .otherwise(lit(0d)).as("dup_line_frac"),
        when(col("__st.n_chars") > 0,
          round(col("__st.n_dup_chars").cast("double") /
            col("__st.n_chars"), 6))
          .otherwise(lit(0d)).as("dup_char_frac"))
      .withColumn("r_bullet", col("bullet_frac") <= 0.9)
      .withColumn("r_ellipsis", col("ellipsis_frac") <= 0.3)
      .withColumn("r_dup_lines", col("dup_line_frac") <= 0.3)
      .withColumn("r_dup_chars", col("dup_char_frac") <= 0.2)
      .withColumn("pass",
        col("r_bullet") && col("r_ellipsis") && col("r_dup_lines") &&
        col("r_dup_chars"))
  }

  /** The original explode + two-level-aggregate form of
    * [[gopherLineRules]] — parity baseline for TextKernelsSpec. */
  private[graft] def gopherLineRulesHof(df: DataFrame, idCol: String,
                      textCol: String): DataFrame = {
    val lines = filter(split(coalesce(col(textCol), lit("")), "\n"),
      l => l =!= "")
    val perLine = df
      .select(col(idCol), explode_outer(lines).as("line"))
      .groupBy(col(idCol), col("line"))
      .agg(count(lit(1)).as("c"))
      .select(col(idCol), col("c"),
        coalesce(length(col("line")), lit(0)).cast("long").as("len"),
        when(col("line").rlike("^\\s*[-*\u2022]"), 1L).otherwise(0L)
          .as("bullet"),
        when(col("line").rlike("(\\.\\.\\.|\u2026)\\s*$"), 1L)
          .otherwise(0L).as("ell"))
    perLine.groupBy(col(idCol))
      .agg(
        coalesce(sum(when(col("len") > 0, col("c"))), lit(0L))
          .as("n_lines"),
        coalesce(sum(when(col("c") > 1 && col("len") > 0, col("c"))),
          lit(0L)).as("n_dup"),
        coalesce(sum(col("c") * col("len")), lit(0L)).as("n_chars"),
        coalesce(sum(when(col("c") > 1, col("c") * col("len"))),
          lit(0L)).as("n_dup_chars"),
        coalesce(sum(col("bullet") * col("c")), lit(0L)).as("n_bullet"),
        coalesce(sum(col("ell") * col("c")), lit(0L)).as("n_ell"))
      .select(col(idCol), col("n_lines"),
        when(col("n_lines") > 0,
          round(col("n_bullet").cast("double") / col("n_lines"), 6))
          .otherwise(lit(0d)).as("bullet_frac"),
        when(col("n_lines") > 0,
          round(col("n_ell").cast("double") / col("n_lines"), 6))
          .otherwise(lit(0d)).as("ellipsis_frac"),
        when(col("n_lines") > 0,
          round(col("n_dup").cast("double") / col("n_lines"), 6))
          .otherwise(lit(0d)).as("dup_line_frac"),
        when(col("n_chars") > 0,
          round(col("n_dup_chars").cast("double") / col("n_chars"), 6))
          .otherwise(lit(0d)).as("dup_char_frac"))
      .withColumn("r_bullet", col("bullet_frac") <= 0.9)
      .withColumn("r_ellipsis", col("ellipsis_frac") <= 0.3)
      .withColumn("r_dup_lines", col("dup_line_frac") <= 0.3)
      .withColumn("r_dup_chars", col("dup_char_frac") <= 0.2)
      .withColumn("pass",
        col("r_bullet") && col("r_ellipsis") && col("r_dup_lines") &&
        col("r_dup_chars"))
  }

  /** DSIR-style importance weighting (Xie et al. 2023, "Data Selection
    * for Language Models via Importance Resampling"): per-document mean
    * log-ratio of a TARGET-domain unigram LM over the RAW-corpus
    * unigram LM. Rows matching `targetPred` define the target sample;
    * both LMs are Laplace (+1) smoothed over the JOINT vocabulary, so
    * tokens absent from the target stay finite instead of -∞.
    *
    * Scale shape: both LMs are vocab-sized aggregates of the same
    * exploded token stream the scoring join consumes (map-side combine
    * shrinks each shuffle to (token, partial count)); the joint vocab
    * re-enters as ONE broadcast, so the corpus-sized stream never
    * shuffles for the join — one (id) aggregation after it. At 100 TB
    * the vocab outgrows a broadcast and the identical plan holds with a
    * shuffle hash join on the token (Zipf skew lives in the count
    * table, one row per key by construction — bigramLogprob note).
    *
    * The `selected` flag here is the deterministic weight>0 heuristic
    * (doc more target-like than corpus-average), computed on the
    * ROUNDED weight so the boolean is engine-portable; the paper's
    * actual resampling step is [[dsirSelect]].
    *
    * Output: idCol, n_tok, avg_ln_ratio (mean ln(p_t/p_r), rounded at
    * 4 — the avg-of-doubles engine-drift slack), selected. */
  def dsirImportance(df: DataFrame, idCol: String, textCol: String,
                     targetPred: Column): DataFrame = {
    val toks = df.select(col(idCol), targetPred.as("__tgt"),
      explode(split(normalizeText(col(textCol)), " ")).as("tok"))
    val raw = toks.groupBy("tok").agg(count(lit(1)).as("rc"))
    val tgt = toks.filter(col("__tgt"))
      .groupBy("tok").agg(count(lit(1)).as("tc"))
    val vocab = raw.join(tgt, Seq("tok"), "left")
      .select(col("tok"), col("rc"),
        coalesce(col("tc"), lit(0L)).as("tc"))
    // three vocab-level scalars (V, token totals) — a bounded driver
    // fetch of one row (the unigram_logprob convention)
    val tot = vocab.agg(count(lit(1)), sum(col("rc")), sum(col("tc")))
      .first()
    val (v, totR, totT) =
      if (tot.isNullAt(1)) (0L, 0L, 0L)
      else (tot.getLong(0), tot.getLong(1), tot.getLong(2))
    toks.join(broadcast(vocab), Seq("tok"))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_tok"),
        round(avg(
          log((col("tc") + lit(1L)).cast("double") /
            lit((totT + v).toDouble)) -
          log((col("rc") + lit(1L)).cast("double") /
            lit((totR + v).toDouble))), 4).as("avg_ln_ratio"))
      .withColumn("selected", col("avg_ln_ratio") > 0d)
  }

  /** DSIR selection proper (Xie et al. 2023 §2.3): importance
    * RESAMPLING realized as gumbel-top-k — taking the top k documents
    * by `ln w_i + g_i` with g_i ~ Gumbel(0,1) i.i.d. draws a weighted
    * sample without replacement with P ∝ w_i (the Gumbel-max trick).
    * The document log-weight is the SUM of per-token log ratios =
    * n_tok · avg_ln_ratio ([[dsirImportance]]'s rounded mean times an
    * exact integer, so the product carries no fresh cross-engine
    * drift). The noise is SEEDED and engine-portable — no engine RNG:
    * u = (int of the first 8 md5 hex digits of "id:seed" + 0.5) / 2³²
    * ∈ (0,1) strictly, g = -ln(-ln u). The ranking key rounds at 4
    * with the id tiebreak so the top-k boundary is engine-stable (the
    * ccnet ordering convention), and the rank is the two-phase
    * [[graft.ops.Relational.globalRowNumber]] — a global top-k flag
    * with no single-partition window at 100 TB. The deterministic
    * weight>0 flag stays as a secondary column.
    *
    * Output: idCol, n_tok, avg_ln_ratio, gumbel_key, dsir_selected
    * (row is in the resampled top k), det_selected. */
  def dsirSelect(df: DataFrame, idCol: String, textCol: String,
                 targetPred: Column, k: Int,
                 seed: String = "graft"): DataFrame = {
    val imp = dsirImportance(df, idCol, textCol, targetPred)
    val u = (conv(substring(md5(concat(col(idCol).cast("string"),
        lit(":" + seed))), 1, 8), 16, 10).cast("long")
        .cast("double") + lit(0.5)) / lit(4294967296.0)
    val keyed = imp.withColumn("gumbel_key",
      round(col("avg_ln_ratio") * col("n_tok") - log(-log(u)), 4))
    graft.ops.Relational.globalRowNumber(keyed,
        Seq(col("gumbel_key").desc, col(idCol)), "__rk")
      .select(col(idCol), col("n_tok"), col("avg_ln_ratio"),
        col("gumbel_key"), (col("__rk") <= k).as("dsir_selected"),
        col("selected").as("det_selected"))
  }

  /** BM25 top-k retrieval against a bounded query-term table — the
    * retrieval-based data-selection primitive (score every pretraining
    * document against a target task's seed queries and keep the most
    * relevant; the targeted-crawl / DCLM-retrieval shape). Okapi BM25
    * with Lucene's always-positive idf:
    *   idf(t)  = ln(1 + (N − df(t) + 0.5) / (df(t) + 0.5))
    *   s(d,t)  = idf(t) · tf · (k1+1) / (tf + k1·(1 − b + b·dl/avgdl))
    * dl is the normalized-split token count (the text_tfidf
    * convention, including its empty-doc-→-1 edge, so both stages
    * share one tokenizer); df counts documents containing the term.
    *
    * Exactness: a per-(query, doc) BM25 score is a SUM of per-term
    * doubles — summation-order-sensitive across engines — so each
    * per-term contribution is rounded to integer MICROS first and the
    * aggregation is an order-free Long sum (the
    * embedding_label_purity discipline); ranking and ties read the
    * micros, the output score divides back once.
    *
    * Scale shape: query terms broadcast (queries are config-sized);
    * tf is one explode + hash agg restricted map-side to query-vocab
    * terms; df is a query-vocab-sized agg broadcast back; candidates
    * are only the docs sharing ≥ 1 term. The per-query ranking window
    * follows the bruteForceTopK contract (few queries; each query's
    * candidate set is the posting-list union) — which is exactly why
    * `maxDfFrac` exists: ONE stopword in the seed terms ("the") unions
    * a near-full posting list into that query's window, ~N candidates
    * through one rank partition. Terms with df > maxDfFrac·N are
    * dropped from scoring entirely (both the guard comparison and the
    * drop are engine-exact: one IEEE product against an integer df) —
    * the Lucene common-term discipline; such terms carry ~zero idf
    * signal anyway. maxDfFrac = 1.0 disables the guard.
    *
    * Output: query_id, doc_id, rank, score (round 6) — top `k` docs
    * per query by (score micros desc, doc_id). */
  def bm25TopK(docs: DataFrame, idCol: String, textCol: String,
               queryTerms: DataFrame, k: Int,
               k1: Double = 1.2, b: Double = 0.75,
               maxDfFrac: Double = 0.5,
               maxQueries: Long = 10000L): DataFrame = {
    require(maxDfFrac > 0.0 && maxDfFrac <= 1.0,
      s"maxDfFrac must be in (0, 1]: $maxDfFrac")
    require(maxQueries >= 1, s"maxQueries must be >= 1: $maxQueries")
    val toks = docs.select(col(idCol).as("doc_id"),
      split(normalizeText(col(textCol)), " ").as("ws"))
    val dl = graft.core.Tables.staged(
      toks.select(col("doc_id"),
        size(col("ws")).cast("long").as("dl")), "bm25_dl")
    val stats = dl.agg(count(lit(1)), sum(col("dl"))).first()
    val n = stats.getLong(0)
    require(n > 0, "bm25TopK: empty corpus")
    val avgdl = stats.getLong(1).toDouble / n.toDouble
    val qt = queryTerms.select(
      col(queryTerms.columns(0)).as("query_id"),
      col(queryTerms.columns(1)).as("term"))
    // the few-queries contract enforced by CODE (r13 watch item): the
    // query-term table broadcasts and each query owns a rank window
    // whose candidate set is its posting-list union — a corpus-sized
    // "query table" would silently plan a broadcast of the corpus plus
    // N corpus-sized windows. The count is one job over the
    // config-sized side, paid before any corpus work.
    val nq = qt.select("query_id").distinct().count()
    require(nq <= maxQueries,
      s"bm25TopK: $nq distinct queries exceed maxQueries=$maxQueries " +
        "— the query side broadcasts and owns per-query rank windows; " +
        "batch a large query load or raise maxQueries deliberately")
    val vocab = qt.select("term").distinct()
    val tf = graft.core.Tables.staged(
      toks.select(col("doc_id"), explode(col("ws")).as("term"))
        .join(broadcast(vocab), Seq("term"))
        .groupBy("doc_id", "term").agg(count(lit(1)).as("tf")),
      "bm25_tf")
    val dfreq = tf.groupBy("term").agg(count(lit(1)).as("df"))
      .filter(col("df").cast("double") <= lit(maxDfFrac) * lit(n.toDouble))
    // expression mirrors the oracle's parse tree exactly (left-assoc
    // products, the same +0.5 placement) so every double matches
    val idf = log(lit(1.0) + (lit(n.toDouble) - col("df") + lit(0.5)) /
      (col("df") + lit(0.5)))
    val denom = col("tf") + lit(k1) *
      (lit(1.0) - lit(b) + lit(b) * col("dl") / lit(avgdl))
    val micros = round(idf * col("tf") * lit(k1 + 1.0) / denom *
      lit(1000000.0)).cast("long")
    val scored = tf
      .join(broadcast(qt), Seq("term"))
      .join(broadcast(dfreq), Seq("term"))
      .join(dl, Seq("doc_id"))
      .select(col("query_id"), col("doc_id"), micros.as("micros"))
      .groupBy("query_id", "doc_id")
      .agg(sum(col("micros")).as("su"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("query_id").orderBy(col("su").desc, col("doc_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("doc_id"), col("rank"),
        round(col("su") / lit(1000000.0), 6).as("score"))
  }
}
