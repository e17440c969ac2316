package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.ws_tokens
import graft.norm.Normalizers

/** Text-analysis operators for a training-data pipeline: language ID,
  * quality scoring, token counting, document fingerprinting. All pure
  * built-in Column compositions (codegen'd, whole-stage), deliberately
  * SQL-mirrorable so each has a DuckDB oracle in SparkEntry.oracleSql.
  *
  * The reference has no text-analysis surface (its closest analog is
  * the semantic column typer, /root/reference/src/column_analyzer.py:33-119);
  * these are the scale-path additions required of the new engine.
  */
object TextAnalysis {

  /** Fixed per-language marker (stopword) profiles. Deterministic,
    * config-pinned — NOT trained. Order of `langs` is the tie-break
    * priority for classification.
    */
  val langs: Seq[String] = Seq("en", "de", "fr", "es", "zh")

  val markers: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "a", "of", "and", "to", "in", "is", "it", "that", "for", "on", "with"),
    "de" -> Seq("der", "die", "das", "und", "ist", "nicht", "mit", "ein", "zu", "den", "von", "sich"),
    "fr" -> Seq("le", "la", "les", "et", "est", "une", "des", "du", "que", "pas", "pour", "dans"),
    "es" -> Seq("el", "los", "las", "y", "es", "un", "una", "por", "con", "para", "su", "lo"),
    "zh" -> Seq("的", "是", "了", "在", "和", "有", "我", "他", "这", "中", "大", "上")
  )

  /** Marker-hit count for one language over a token array. */
  def markerHits(tokens: Column, lang: String): Column =
    size(filter(tokens, t => t.isInCollection(markers(lang))))

  /** n-gram-heuristic language ID: argmax of marker hits, ties broken
    * by `langs` order, zero hits -> "und". Mirrors to SQL as a CASE
    * chain over list_filter counts.
    */
  def langId(text: Column): Column = {
    val toks = ws_tokens(Normalizers.normalizeString(text))
    val hits = langs.map(l => l -> markerHits(toks, l))
    val best = greatest(hits.map(_._2): _*)
    hits.foldRight(lit("und")) { case ((l, h), acc) =>
      when(best > 0 && h === best, lit(l)).otherwise(acc)
    }
    // foldRight + `when` chain = first lang in `langs` order hitting the
    // max wins (strict priority), matching the SQL CASE mirror.
  }

  /** Whitespace token count (empty text -> 0). */
  def wsTokenCount(text: Column): Column = size(ws_tokens(text))

  /** BPE-ish pre-tokenizer count: runs of word chars, or single
    * non-word non-space chars (the shape GPT-2-style pre-tokenizers
    * split on). ASCII word class keeps Java-regex and RE2 (DuckDB)
    * semantics identical.
    */
  val BpePattern = "[A-Za-z0-9_]+|[^A-Za-z0-9_\\s]"
  def bpeTokenCount(text: Column): Column =
    size(regexp_extract_all(text, lit(BpePattern), lit(0)))

  /** Type-token ratio over whitespace tokens (0 for empty). */
  def typeTokenRatio(text: Column): Column = {
    val toks = ws_tokens(Normalizers.normalizeString(text))
    when(size(toks) === 0, 0.0)
      .otherwise(size(array_distinct(toks)).cast("double") / size(toks).cast("double"))
  }

  /** Stopword (any-language marker) ratio over whitespace tokens. */
  def stopwordRatio(text: Column): Column = {
    val all = markers.values.flatten.toSeq.distinct
    val toks = ws_tokens(Normalizers.normalizeString(text))
    when(size(toks) === 0, 0.0)
      .otherwise(size(filter(toks, t => t.isInCollection(all))).cast("double") /
        size(toks).cast("double"))
  }

  /** Punctuation-character ratio over non-space characters. */
  def punctRatio(text: Column): Column = {
    val nonSpace = length(regexp_replace(text, "\\s", ""))
    val punct = length(regexp_replace(text, "[^\\p{Punct}]", ""))
    when(nonSpace === 0, 0.0).otherwise(punct.cast("double") / nonSpace.cast("double"))
  }

  /** Mean whitespace-token length in characters (0 for empty). */
  def meanTokenLen(text: Column): Column = {
    val toks = ws_tokens(Normalizers.normalizeString(text))
    when(size(toks) === 0, 0.0)
      .otherwise(aggregate(toks, lit(0L), (acc, t) => acc + length(t).cast("long"))
        .cast("double") / size(toks).cast("double"))
  }

  /** Composite quality score in [0,1] — a deterministic, documented
    * heuristic (length band + lexical diversity + low punctuation), the
    * shape a pretraining quality filter takes. Formula is arithmetic
    * only so the oracle recomputes it exactly.
    *
    *   q = 0.4*min(nTokens/100, 1) + 0.3*ttr + 0.3*(1 - min(punct*4, 1))
    */
  def qualityScore(text: Column): Column = {
    val n = wsTokenCount(Normalizers.normalizeString(text)).cast("double")
    val lenBand = least(n / lit(100.0), lit(1.0))
    val diversity = typeTokenRatio(text)
    val punctPenalty = lit(1.0) - least(punctRatio(text) * 4.0, lit(1.0))
    lenBand * 0.4 + diversity * 0.3 + punctPenalty * 0.3
  }

  // ---------------------------------------------------- repetition
  // Within-document repetition signals (the Gopher quality rules §A1.1:
  // duplicate-line fraction, duplicate-n-gram fraction — pages failing
  // them are lists, tag clouds, and templated boilerplate). Pure Column
  // algebra over split arrays — codegen'd, no UDF, and arithmetic the
  // DuckDB oracle recomputes exactly (`text_repetition`).

  /** Fraction of non-blank lines that are repeats of an earlier line
    * in the SAME document: 1 - distinct/total (0 for no lines). Lines
    * are exact `\n` segments, blank-after-trim excluded — the same
    * line contract as [[graft.dedup.LineDedup]].
    */
  def dupLineFraction(text: Column): Column = {
    val lines = filter(split(text, "\n", -1), l => trim(l) =!= "")
    when(size(lines) === 0, 0.0)
      .otherwise(lit(1.0) -
        size(array_distinct(lines)).cast("double") / size(lines).cast("double"))
  }

  /** Fraction of word n-gram occurrences that are repeats within the
    * document: 1 - distinct/total over whitespace-token n-grams of the
    * normalized text (0 when fewer than n tokens). n = 2 catches stuck
    * phrase loops; Gopher uses up to n = 4 with the same shape.
    */
  def dupNgramFraction(text: Column, n: Int): Column = {
    require(n >= 1, s"n must be >= 1, got $n")
    val toks = ws_tokens(Normalizers.normalizeString(text))
    val grams = transform(sequence(lit(0), size(toks) - n),
      i => array_join(slice(toks, i + 1, lit(n)), " "))
    when(size(toks) < n, 0.0)
      .otherwise(lit(1.0) -
        size(array_distinct(grams)).cast("double") / size(grams).cast("double"))
  }

  // ---------------------------------------------------- C4 heuristics
  // The C4 cleaning rules (Raffel et al. 2020, "Exploring the Limits of
  // Transfer Learning...", §2.2) — the standard first-pass heuristic
  // filter a web-crawl training pipeline runs before dedup. Line level:
  // keep only lines that end in a terminal punctuation mark, have at
  // least `minLineWords` words, and do not mention "javascript". Page
  // level: drop pages containing "lorem ipsum" or "{" anywhere in the
  // RAW text, and pages whose CLEANED text has fewer than
  // `minSentences` sentences (sentence count = terminal-mark count — a
  // deterministic stand-in for C4's sentence splitter, identical in
  // both engines). Pure Column algebra over split arrays — codegen'd,
  // no UDF, regexes in the shared Java-regex/RE2 subset so the DuckDB
  // oracle (`text_c4_filter`) applies the IDENTICAL rules.

  /** Line-level C4 keep predicate over one (already `\n`-free) line. */
  def c4LineKeep(line: Column, minLineWords: Int = 5): Column = {
    val t = trim(line)
    t.rlike("[.!?\"]$") &&
      size(split(t, "\\s+")) >= minLineWords &&
      !contains(lower(t), lit("javascript"))
  }

  /** The C4-cleaned text: surviving lines rejoined with `\n`. */
  def c4CleanText(text: Column, minLineWords: Int = 5): Column =
    array_join(
      filter(split(text, "\n", -1), l => c4LineKeep(l, minLineWords)), "\n")

  /** Page-level C4 keep predicate: lorem-ipsum / brace checks on the
    * raw page, sentence floor on the cleaned text.
    */
  def c4PageKeep(rawText: Column, cleaned: Column,
      minSentences: Int = 3): Column =
    !contains(lower(rawText), lit("lorem ipsum")) &&
      !contains(rawText, lit("{")) &&
      size(regexp_extract_all(cleaned, lit("[.!?]"), lit(0))) >= minSentences

  /** Apply the full C4 pass to a corpus: `textCol` is replaced by its
    * cleaned text and failing pages are dropped; every other column
    * rides through. One codegen'd projection + one filter — no
    * shuffle, no UDF; at 100 TB this is a pure map stage that fuses
    * into the scan.
    */
  def c4Filter(df: DataFrame, textCol: String, minLineWords: Int = 5,
      minSentences: Int = 3): DataFrame = {
    val cleaned = c4CleanText(col(textCol), minLineWords)
    df.where(c4PageKeep(col(textCol), cleaned, minSentences))
      .withColumn(textCol, cleaned)
  }

  /** Shannon entropy (bits per character) over the document's
    * characters — the cheap stand-in for an LM-perplexity quality
    * signal: near-zero for stuck-key/repeated-char junk, ~4.1 for
    * English prose, ~6+ for random base64-ish noise; pipelines band
    * it from both sides. Newlines excluded (`[^\n]` — the one char
    * class Java regex and RE2 treat identically for this purpose).
    *
    * Cross-engine determinism: entropy is a float SUM, and float
    * addition is order-sensitive, so the fold runs over the SORTED
    * integer count array (ascending) — both engines then add the
    * identical term sequence; `0.0 - sum` (not negate) keeps the
    * all-same-char doc at +0.0 on both sides.
    *
    * Cost: the per-distinct-char count refilters the char array —
    * O(distinct·n) per doc. Fine for alphabetic text (distinct ≤
    * ~100); for high-alphabet (CJK) pages distinct grows with n, so
    * `maxChars` (default 8192) bounds the window the signal is
    * computed over — the standard practice for per-doc signals, and
    * 8k chars saturate the entropy estimate anyway. Map-only, fuses
    * into the scan.
    */
  def charEntropy(text: Column, maxChars: Int = 8192): Column = {
    val g = regexp_extract_all(substring(text, 1, maxChars), lit("[^\n]"), lit(0))
    val n = size(g)
    val counts = sort_array(transform(array_distinct(g),
      c => size(filter(g, x => x === c))))
    when(n === 0, 0.0).otherwise(
      lit(0.0) - aggregate(counts, lit(0.0), (acc, c) => {
        val p = c.cast("double") / n.cast("double")
        acc + p * log2(p)
      }))
  }

  // ---------------------------------------------------- Gopher doc rules
  // The document-level Gopher quality rules (Rae et al. 2021, "Scaling
  // Language Models: ...", §A1.1) — the second standard heuristic pass
  // (after C4's line rules) a pretraining pipeline applies before
  // dedup: word-count band, mean-word-length band, symbol-to-word
  // ratio, bullet-/ellipsis-line fractions, alphabetic-word fraction,
  // and a required-stopword floor. ASCII-bounded compat: the symbol
  // set is '#' and the ASCII ellipsis "..." plus U+2026, bullets are
  // '•', '-', '*' — regexes stay in the shared Java-regex/RE2 subset
  // so the DuckDB oracle (`text_gopher`) applies IDENTICAL rules.
  // Everything is codegen'd Column algebra over split arrays; applied
  // as a filter it is a pure map stage that fuses into the scan.

  /** The Gopher required-stopword list (§A1.1: a page must contain at
    * least two of these to pass the "stop word" rule).
    */
  val gopherStops: Seq[String] =
    Seq("the", "be", "to", "of", "and", "that", "have", "with")

  /** Occurrences of `symbolPattern` per word (0 for empty docs).
    * Gopher thresholds the hash symbol and the ellipsis SEPARATELY
    * ("symbol-to-word ratio greater than 0.1 for either the hash
    * symbol or ellipsis"), so [[gopherKeep]] evaluates this twice —
    * [[hashWordRatio]] and [[ellipsisWordRatio]]. Counts are
    * non-overlapping regex matches, identical in Java and RE2.
    */
  def symbolToWordRatio(text: Column, symbolPattern: String): Column = {
    val n = wsTokenCount(Normalizers.normalizeString(text))
    val symbols = size(regexp_extract_all(text, lit(symbolPattern), lit(0)))
    when(n === 0, 0.0).otherwise(symbols.cast("double") / n.cast("double"))
  }

  /** '#' occurrences per word. */
  def hashWordRatio(text: Column): Column = symbolToWordRatio(text, "#")

  /** Ellipsis ("..." or U+2026) occurrences per word. */
  def ellipsisWordRatio(text: Column): Column =
    symbolToWordRatio(text, "\\.\\.\\.|…")

  /** Non-blank `\n` lines of a doc (same line contract as
    * [[dupLineFraction]] / [[graft.dedup.LineDedup]]).
    */
  private def nonBlankLines(text: Column): Column =
    filter(split(text, "\n", -1), l => trim(l) =!= "")

  /** Fraction of non-blank lines that START with a bullet marker
    * ('•', '-', '*' followed by whitespace-or-end). 0 for no lines.
    */
  def bulletLineFraction(text: Column): Column = {
    val lines = nonBlankLines(text)
    val hits = size(filter(lines, l => trim(l).rlike("^[•*-](\\s|$)")))
    when(size(lines) === 0, 0.0)
      .otherwise(hits.cast("double") / size(lines).cast("double"))
  }

  /** Fraction of non-blank lines that END with an ellipsis ("..." or
    * U+2026). 0 for no lines.
    */
  def ellipsisLineFraction(text: Column): Column = {
    val lines = nonBlankLines(text)
    val hits = size(filter(lines, l => trim(l).rlike("(\\.\\.\\.|…)$")))
    when(size(lines) === 0, 0.0)
      .otherwise(hits.cast("double") / size(lines).cast("double"))
  }

  /** Fraction of whitespace tokens containing at least one ASCII
    * alphabetic character (Gopher: >= 0.8 required). 0 for empty.
    */
  def alphaWordFraction(text: Column): Column = {
    val toks = ws_tokens(Normalizers.normalizeString(text))
    when(size(toks) === 0, 0.0)
      .otherwise(size(filter(toks, t => t.rlike("[a-z]"))).cast("double") /
        size(toks).cast("double"))
  }

  /** Number of DISTINCT [[gopherStops]] present as whole tokens of the
    * normalized text (Gopher: >= 2 required).
    */
  def gopherStopHits(text: Column): Column = {
    val toks = ws_tokens(Normalizers.normalizeString(text))
    gopherStops.map(s => when(array_contains(toks, s), 1).otherwise(0))
      .reduce(_ + _)
  }

  /** The full Gopher §A1.1 document keep predicate. Bounds are the
    * published defaults with the published directionality: the paper
    * DROPS on "greater than" / "more than" / "less than", so a doc
    * sitting exactly ON a bound is KEPT (`<=` / `>=` here); the hash
    * and ellipsis symbol ratios are thresholded SEPARATELY (a page at
    * 0.06 hash + 0.06 ellipsis passes — summing them would wrongly
    * drop it). `minWords` is a parameter because the 50-word floor is
    * corpus-dependent (Gopher tuned it for full web pages).
    */
  def gopherKeep(text: Column, minWords: Int = 50, maxWords: Int = 100000,
      minMeanWordLen: Double = 3.0, maxMeanWordLen: Double = 10.0,
      maxSymbolRatio: Double = 0.1, maxBulletFrac: Double = 0.9,
      maxEllipsisFrac: Double = 0.3, minAlphaFrac: Double = 0.8,
      minStopHits: Int = 2): Column = {
    val n = wsTokenCount(Normalizers.normalizeString(text))
    val mean = meanTokenLen(text)
    n.geq(minWords) && n.leq(maxWords) &&
      mean.geq(minMeanWordLen) && mean.leq(maxMeanWordLen) &&
      hashWordRatio(text).leq(maxSymbolRatio) &&
      ellipsisWordRatio(text).leq(maxSymbolRatio) &&
      bulletLineFraction(text).leq(maxBulletFrac) &&
      ellipsisLineFraction(text).leq(maxEllipsisFrac) &&
      alphaWordFraction(text).geq(minAlphaFrac) &&
      gopherStopHits(text).geq(minStopHits)
  }

  /** Drop documents failing [[gopherKeep]]; all columns ride through.
    * One codegen'd filter — no shuffle, no UDF.
    */
  def gopherFilter(df: DataFrame, textCol: String, minWords: Int = 50): DataFrame =
    df.where(gopherKeep(col(textCol), minWords = minWords))
}
