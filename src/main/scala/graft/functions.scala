package graft

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.functions._
import graft.sim._

/** User-facing Column API for the engine's scalar functions.
  *
  * Everything that CAN be a built-in composition IS one (codegen'd,
  * pushdown-friendly); only the kernels Spark genuinely lacks
  * (Jaro-Winkler, token ratios, date similarity, MinHash, SimHash,
  * winnowing) are custom Catalyst expressions (graft.sim).
  */
object functions {

  private def ex(c: Column) = GraftColumnBridge.expression(c)
  private def col2(e: org.apache.spark.sql.catalyst.expressions.Expression): Column =
    GraftColumnBridge.column(e)

  // ----------------------------------------------------- similarity (0-1)

  /** Levenshtein similarity: 1 - dist/max(len); both-empty -> 1.0,
    * one-empty -> 0.0 (reference algorithms.py:8-15). Pure built-in
    * composition: Spark's `levenshtein` is code-point based like the
    * reference's.
    */
  def levenshtein_sim(a: Column, b: Column): Column =
    when(length(a) === 0 && length(b) === 0, 1.0)
      .when(length(a) === 0 || length(b) === 0, 0.0)
      .otherwise(lit(1.0) - levenshtein(a, b).cast("double") /
        greatest(length(a), length(b)).cast("double"))

  /** Jaro-Winkler similarity (algorithms.py:18-25). */
  def jaro_winkler_sim(a: Column, b: Column): Column = col2(JaroWinklerSim(ex(a), ex(b)))

  /** rapidfuzz token_set_ratio, 0-1 (algorithms.py:28-35). */
  def token_set_ratio(a: Column, b: Column): Column = col2(TokenSetRatioSim(ex(a), ex(b)))

  /** rapidfuzz token_sort_ratio, 0-1 (algorithms.py:38-45). */
  def token_sort_ratio(a: Column, b: Column): Column = col2(TokenSortRatioSim(ex(a), ex(b)))

  /** Numeric ratio similarity: 1 - |a-b|/max(|a|,|b|,1); equal -> 1;
    * non-parsable -> 0 (algorithms.py:48-62). Accepts string or numeric
    * columns.
    */
  def numeric_sim(a: Column, b: Column): Column = {
    val x = try_cast_double(a)
    val y = try_cast_double(b)
    when(x.isNull || y.isNull, 0.0)
      .when(x === y, 1.0)
      .otherwise(lit(1.0) - abs(x - y) / greatest(abs(x), abs(y), lit(1.0)))
  }

  private def try_cast_double(c: Column): Column = try_cast(trim(c.cast("string")), "double")
  private def try_cast(c: Column, t: String): Column = c.try_cast(t)

  /** Multi-format date similarity (algorithms.py:211-291). */
  def date_sim(a: Column, b: Column): Column =
    col2(DateSim(ex(a.cast("string")), ex(b.cast("string"))))

  // ------------------------------------------------------- tokens/shingles

  /** Whitespace tokens of a (pre-normalized) string; empty string ->
    * empty array, not [""].
    */
  def ws_tokens(c: Column): Column =
    filter(split(c, "\\s+"), t => length(t) > 0)

  /** Word k-shingles: space-joined sliding windows over ws_tokens.
    * Documents shorter than k words produce one shingle (the whole
    * text) so short docs still dedup exactly.
    */
  def word_shingles(c: Column, k: Int): Column = {
    val toks = ws_tokens(c)
    val n = size(toks)
    when(n === 0, array().cast("array<string>"))
      .when(n <= k, array(array_join(toks, " ")))
      .otherwise(transform(sequence(lit(0), n - k),
        i => array_join(slice(toks, i + 1, lit(k)), " ")))
  }

  /** Character k-shingles over the raw string (for short/CJK text where
    * word tokenization is meaningless).
    */
  def char_shingles(c: Column, k: Int): Column = {
    val n = length(c)
    when(n === 0, array().cast("array<string>"))
      .when(n <= k, array(c))
      .otherwise(transform(sequence(lit(1), n - (k - 1)), i => substring(c, i, lit(k))))
  }

  // --------------------------------------------------------- sketches

  /** MinHash signature (array<long>, length numHashes) over a shingle
    * array; null for empty input. Hash family pinned by seed.
    */
  def minhash_signature(shingles: Column, numHashes: Int, seed: Long): Column =
    col2(MinHashSignature(ex(shingles), numHashes, seed))

  /** 64-bit SimHash over a token array. */
  def simhash64(tokens: Column, seed: Long): Column = col2(SimHash64(ex(tokens), seed))

  // Fused one-pass kernels over pre-normalized (single-spaced) text —
  // byte-identical to the compositions above, zero per-shingle
  // allocation. These are what the dedup pipeline's hot path uses.

  /** = minhash_signature(word_shingles(text, k), numHashes, seed). */
  def minhash_words(text: Column, k: Int, numHashes: Int, seed: Long): Column =
    col2(MinHashWords(ex(text), k, numHashes, seed))

  /** = array_distinct(transform(word_shingles(text, k), xxhash64)) as a
    * set (sorted).
    */
  def shingle_hashes(text: Column, k: Int, seed: Long = 42L): Column =
    col2(ShingleHashes(ex(text), k, seed))

  /** = simhash64(ws_tokens(text), seed). */
  def simhash_words(text: Column, seed: Long): Column = col2(SimHashWords(ex(text), seed))

  /** = minhash_signature(char_shingles(text, k), numHashes, seed) —
    * the fused CJK/short-text path.
    */
  def minhash_chars(text: Column, k: Int, numHashes: Int, seed: Long): Column =
    col2(MinHashChars(ex(text), k, numHashes, seed))

  /** = array_distinct(transform(char_shingles(text, k), xxhash64)) as
    * a set (sorted).
    */
  def shingle_hashes_chars(text: Column, k: Int, seed: Long = 42L): Column =
    col2(ShingleHashesChars(ex(text), k, seed))

  /** Hamming distance between two 64-bit SimHashes (built-in bit_count). */
  def hamming64(a: Column, b: Column): Column = bit_count(a.bitwiseXOR(b))

  /** Winnowing document fingerprint (array<long>). */
  def winnow_fingerprint(c: Column, k: Int = 9, window: Int = 4): Column =
    col2(WinnowFingerprint(ex(c), k, window))

  /** Estimated Jaccard from two equal-length MinHash signatures:
    * fraction of agreeing slots. Fused kernel (graft.sim.SigAgree) —
    * value-identical to the `aggregate(zip_with(...))` composition it
    * replaced (FusedKernelsSpec), without the per-pair numHashes-element
    * array allocation that rode every verified candidate.
    */
  def minhash_jaccard(sigA: Column, sigB: Column): Column =
    col2(SigAgree(ex(sigA), ex(sigB)))

  /** Exact Jaccard over two (deduplicated) arrays. */
  def array_jaccard(a: Column, b: Column): Column = {
    val inter = size(array_intersect(a, b)).cast("double")
    val uni = size(a) + size(b) - size(array_intersect(a, b))
    when(uni === 0, 1.0).otherwise(inter / uni.cast("double"))
  }

  /** Longest common substring length in code points (suffix-automaton,
    * O(|a|+|b|) per pair) — exact verifier for the shared-span pass.
    */
  def longest_common_substring(a: Column, b: Column): Column =
    col2(LongestCommonSubstring(ex(a), ex(b)))

  // ------------------------------------------------------- registration

  /** Register the custom expressions for SQL use
    * (`SELECT jaro_winkler_sim(a, b) ...`).
    */
  def registerAll(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    import org.apache.spark.sql.catalyst.expressions.Expression
    def r(name: String, f: Seq[Expression] => Expression): Unit =
      reg.createOrReplaceTempFunction(name, f, "built-in")
    r("jaro_winkler_sim", es => JaroWinklerSim(es(0), es(1)))
    r("token_set_ratio", es => TokenSetRatioSim(es(0), es(1)))
    r("token_sort_ratio", es => TokenSortRatioSim(es(0), es(1)))
    r("date_sim", es => DateSim(es(0), es(1)))
  }
}
