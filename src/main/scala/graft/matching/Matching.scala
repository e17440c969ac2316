package graft.matching

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft._
import graft.norm.Normalizers

/** Column-pair config: compare source1.`col1` to source2.`col2` as
  * semantic type `colType` with weight `weight`
  * (reference column map, /root/reference/src/column_analyzer.py:132-190).
  */
final case class MatchColumn(col1: String, col2: String, colType: String, weight: Double)

/** Matching-mode options (reference config schema,
  * /root/reference/src/config_validator.py:14-173).
  */
final case class MatchOptions(
    threshold: Double = 0.75,
    undecidedRange: Double = 0.05,
    blockingStrategies: Seq[String] = Seq("first_char", "three_gram", "last_three"),
    returnAllMatches: Boolean = false,
    /** small enough source1 -> broadcast it instead of shuffle join */
    broadcastProbe: Boolean = false,
    /** drop blocking keys whose source2 block exceeds this (0 = off) —
      * the reference's max_block_size / skip_high_cardinality
      * (matcher.py:643-649), as an explicit recall-losing skew guard
      */
    maxBlockSize: Int = 0,
    /** cap candidates per source1 row (0 = off) — the reference's
      * max_candidates (matcher.py:785-792). Deterministic: lowest id2
      * first (the reference truncates in array order; documented
      * divergence, SURVEY §2.5)
      */
    maxCandidates: Int = 0)

/** Two-source fuzzy matching: blocking-key candidate join -> per-column
  * similarity -> weighted mean -> best-match window / return-all ->
  * accept/undecided/reject classification. The Spark re-expression of
  * /root/reference/src/matcher.py (candidate probe :723-792, scoring
  * :1200-1296, best-match :1270-1274, classification :1478-1488).
  *
  * Scale shape: both sides explode their blocking keys and meet in one
  * shuffle hash join on the key; dropDuplicates collapses multi-key
  * hits; scoring is a post-join projection (whole-stage codegen);
  * best-match is one window. No driver materialization anywhere.
  */
object Matching {

  /** Similarity expression by semantic type (reference ALGORITHM_MAP,
    * column_analyzer.py:23-30).
    */
  def simFor(colType: String, a: Column, b: Column): Column = colType match {
    case "string_name" => graft.functions.jaro_winkler_sim(a, b)
    case "numeric" => graft.functions.numeric_sim(a, b)
    case "date" => graft.functions.date_sim(a, b)
    case "email" | "phone" => graft.functions.token_set_ratio(a, b)
    case "levenshtein" => graft.functions.levenshtein_sim(a, b) // explicit algo override
    case _ => graft.functions.levenshtein_sim(a, b) // string_general
  }

  /** Null/empty predicate: either side empty after normalization ->
    * score 0.0 (matcher.py:1233-1237).
    */
  def columnScore(colType: String, a: Column, b: Column): Column =
    when(length(a) === 0 || length(b) === 0, 0.0).otherwise(simFor(colType, a, b))

  /** Weighted mean over mapped columns: sum(score_i*w_i)/sum(w_i)
    * (matcher.py:1239-1255). Row-wise expression, not an aggregate.
    */
  def overallScore(scores: Seq[(Column, Double)]): Column = {
    val total = scores.map(_._2).sum
    scores.map { case (s, w) => s * w }.reduce(_ + _) / lit(total)
  }

  /** accept / reject / undecided by threshold +- undecidedRange
    * (matcher.py:1478-1488).
    */
  def classify(score: Column, threshold: Double, undecided: Double): Column =
    when(score >= threshold + undecided, "accept")
      .when(score <= threshold - undecided, "reject")
      .otherwise("undecided")

  // ----------------------------------------------------------- blocking

  /** Reference-compat blocking keys over a normalized value
    * (matcher.py:683-721): first-char class, leading 2/3-gram, last
    * 3-gram, first/last word prefixes. Empty/"nan" values produce no
    * keys (validity filter, matcher.py:623-626).
    */
  def blockingKeys(c: Column, strategies: Seq[String]): Column = {
    val v = Normalizers.normalizeString(c)
    val keys: Seq[Column] = strategies.flatMap {
      case "first_char" =>
        // non-alphanumeric first char -> '#' class (matcher.py:688-692)
        Seq(concat(lit("first:"),
          when(substring(v, 1, 1).rlike("[a-z0-9]"), substring(v, 1, 1)).otherwise(lit("#"))))
      case "two_gram" => Seq(concat(lit("2gram:"), substring(v, 1, 2)))
      case "three_gram" => Seq(concat(lit("3gram:"), substring(v, 1, 3)))
      case "last_three" => Seq(concat(lit("last3:"), substring(v, -3, 3)))
      case "word_prefix" =>
        // try_element_at: ANSI mode (Spark 4 default) errors on
        // out-of-range element_at
        val words = graft.functions.ws_tokens(v)
        Seq(concat(lit("word1:"), substring(try_element_at(words, lit(1)), 1, 3)),
          concat(lit("wordN:"), substring(try_element_at(words, lit(-1)), 1, 2)))
      case other => throw new IllegalArgumentException(s"unknown blocking strategy: $other")
    }
    val arr = array(keys: _*)
    when(length(v) === 0 || v === "nan", array().cast("array<string>"))
      .otherwise(array_distinct(arr))
  }

  /** Candidate pairs via exploded blocking keys from every mapped
    * column: one shuffle equi-join on the key, dedup on id pair. The
    * distributed form of the reference's blocking index + probe union
    * (matcher.py:607-650, 750-792).
    */
  def candidates(s1: DataFrame, s2: DataFrame, id1: String, id2: String,
      mapping: Seq[MatchColumn], opts: MatchOptions): DataFrame = {
    def keyed(df: DataFrame, id: String, side: Int): DataFrame = {
      val cols = mapping.map(m => if (side == 1) m.col1 else m.col2).distinct
      val allKeys = array_distinct(flatten(array(cols.map(c =>
        blockingKeys(col(c), opts.blockingStrategies)): _*)))
      df.select(col(id), explode(allKeys).as("_bk"))
    }
    val left = keyed(s1, id1, 1)
    val right1 = keyed(s2, id2, 2)
    val right0 =
      if (opts.maxBlockSize > 0) {
        // skew guard: drop keys with oversized source2 blocks (reference
        // max_block_size); broadcast the hot-key list — it is tiny
        val hot = right1.groupBy($"_bk").count()
          .where($"count" > opts.maxBlockSize).select($"_bk")
        right1.join(broadcast(hot), Seq("_bk"), "left_anti")
      } else right1
    val right = if (opts.broadcastProbe) broadcast(right0) else right0
    val pairs = left.join(right, "_bk")
      .select(col(id1), col(id2))
      .dropDuplicates(id1, id2)
    if (opts.maxCandidates > 0) {
      val w = Window.partitionBy(col(id1)).orderBy(col(id2).asc)
      pairs.withColumn("_cn", row_number().over(w))
        .where($"_cn" <= opts.maxCandidates).drop("_cn")
    } else pairs
  }

  /** Score candidate pairs: join both sides back, project per-column
    * scores (`score_<col1>`) + `overall_score`.
    */
  def score(cands: DataFrame, s1: DataFrame, s2: DataFrame, id1: String, id2: String,
      mapping: Seq[MatchColumn]): DataFrame = {
    val n1 = s1.select(col(id1) +: mapping.map(m =>
      Normalizers.byType(col(m.col1), m.colType).as(s"_n1_${m.col1}")): _*)
    val n2 = s2.select(col(id2) +: mapping.map(m =>
      Normalizers.byType(col(m.col2), m.colType).as(s"_n2_${m.col2}")): _*)
    val joined = cands.join(n1, id1).join(n2, id2)
    val scoreCols: Seq[(String, Column, Double)] = mapping.map { m =>
      // scoring lowercases normalized values once more, as the reference
      // compares lowercase forms (matcher.py:1200-1241); explicit string
      // cast since ANSI mode won't implicitly cast numerics for lower()
      val a = lower(col(s"_n1_${m.col1}").cast("string"))
      val b = lower(col(s"_n2_${m.col2}").cast("string"))
      (s"score_${m.col1}", columnScore(m.colType, a, b), m.weight)
    }
    joined
      .select(col(id1) +: col(id2) +: scoreCols.map { case (n, c, _) => c.as(n) }: _*)
      .withColumn("overall_score",
        overallScore(scoreCols.map { case (n, _, w) => (col(n), w) }))
  }

  /** Full matching-mode run. Output per the reference contract
    * (matcher.py:1450-1476): id pair, per-column scores, overall_score,
    * match_result. Best-match keeps the top candidate per source1 row
    * (ties -> lowest id2; documented determinism fix over the
    * reference's iteration-order tie, matcher.py:1270-1274).
    */
  def matchTables(s1: DataFrame, s2: DataFrame, id1: String, id2: String,
      mapping: Seq[MatchColumn], opts: MatchOptions = MatchOptions()): DataFrame = {
    val cands = candidates(s1, s2, id1, id2, mapping, opts)
    val scored = score(cands, s1, s2, id1, id2, mapping)
    val classified = scored.withColumn("match_result",
      classify($"overall_score", opts.threshold, opts.undecidedRange))
    if (opts.returnAllMatches)
      classified.where($"overall_score" >= opts.threshold - opts.undecidedRange)
    else {
      // best candidate is emitted unconditionally (classification labels
      // it; the reference applies no threshold filter in best-match
      // mode, matcher.py:1286-1295)
      val w = Window.partitionBy(col(id1)).orderBy($"overall_score".desc, col(id2).asc)
      classified.withColumn("_rn", row_number().over(w))
        .where($"_rn" === 1)
        .drop("_rn")
    }
  }

  /** One query field: master column, literal query value, semantic
    * type, weight.
    */
  final case class SearchField(col: String, value: String, colType: String, weight: Double)

  /** Search mode: one query record against a master table
    * (matcher.py:1490-1661). Spark-first shape: the query is a literal,
    * so no join at all — blocking becomes a key-overlap FILTER on the
    * scan (the literal key set prunes rows before any scoring), then a
    * scoring projection and a TakeOrderedAndProject (orderBy+limit
    * fuses; no full sort).
    */
  def search(master: DataFrame, idCol: String, fields: Seq[SearchField],
      threshold: Double, maxResults: Int,
      blockingStrategies: Seq[String] = Seq("first_char", "three_gram", "last_three")): DataFrame = {
    // query-side blocking keys, computed on the driver from literals
    val spark = master.sparkSession
    val qKeys: Seq[String] = {
      import spark.implicits._
      val one = Seq(0).toDF("i")
      val arr = array_distinct(flatten(array(fields.map(f =>
        blockingKeys(lit(f.value), blockingStrategies)): _*)))
      one.select(arr).head().getSeq[String](0)
    }
    val masterKeys = array_distinct(flatten(array(fields.map(f =>
      blockingKeys(col(f.col), blockingStrategies)): _*)))
    val blocked = master.where(arrays_overlap(masterKeys, typedLit(qKeys)))
    val scoreCols: Seq[(String, Column, Double)] = fields.map { f =>
      val a = lower(Normalizers.byType(col(f.col), f.colType).cast("string"))
      val b = lower(Normalizers.byType(lit(f.value), f.colType).cast("string"))
      (s"score_${f.col}", columnScore(f.colType, a, b), f.weight)
    }
    blocked
      .select(col(idCol) +: scoreCols.map { case (n, c, _) => c.as(n) }: _*)
      .withColumn("overall_score",
        overallScore(scoreCols.map { case (n, _, w) => (col(n), w) }))
      .where($"overall_score" >= threshold)
      .orderBy($"overall_score".desc, col(idCol).asc)
      .limit(maxResults)
  }
}
