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
  * /root/reference/src/config_validator.py:14-173; defaults
  * matcher.py:382-400).
  */
final case class MatchOptions(
    threshold: Double = 0.75,
    undecidedRange: Double = 0.05,
    blockingStrategies: Seq[String] = Seq("first_char", "three_gram", "last_three"),
    returnAllMatches: Boolean = false,
    /** small enough source1 -> broadcast it instead of shuffle join */
    broadcastProbe: Boolean = false,
    /** drop/trim blocking keys whose source2 block exceeds this (0 =
      * off) — the reference's max_block_size (matcher.py:643-649)
      */
    maxBlockSize: Int = 0,
    /** with maxBlockSize: true (reference default) skips oversized keys
      * entirely; false trims each block to its lowest maxBlockSize ids
      * (deterministic variant of the reference's insertion-order trim)
      */
    skipHighCardinality: Boolean = true,
    /** cap candidates per source1 row (0 = off) — the reference's
      * max_candidates (matcher.py:785-792)
      */
    maxCandidates: Int = 0,
    /** how to enforce maxCandidates: "truncate" keeps the lowest-id
      * candidates (deterministic variant of the reference's array-order
      * cut); "fallback" first tries only the highest-priority key
      * group's candidates (3gram > last3 > word1 > wordN > 2gram >
      * first — matcher.py:794-855) and truncates only if even that
      * group overflows
      */
    candidateTrimStrategy: String = "truncate",
    /** probe rows whose blocking keys match nothing fall back to
      * scanning ALL of source2 when it has at most this many rows
      * (reference matcher.py:739-743); 0 disables. Costs one count()
      * of source2 per job when enabled.
      */
    cartesianFallbackLimit: Int = 10000,
    /** best-match mode: rows with an identical-normalized-value
      * candidate take it directly (lowest id2) and skip candidate
      * scoring — the Spark form of the reference's perfect-match
      * cutoff (matcher.py:1243-1261, early_termination default true).
      * The reference breaks at the FIRST candidate scoring >= 0.99 in
      * arbitrary index order; this variant is deterministic and only
      * short-circuits exact score-1.0 ties, so rows without an
      * identical twin still get their true best match.
      */
    earlyTermination: Boolean = true,
    /** source2 rows per blocking key above which the key is salted:
      * a hot key (e.g. `first:j` over a name column) otherwise lands
      * its entire |L|x|R| candidate explosion on ONE join task. Salting
      * splits the probe side of hot keys into `saltBuckets` sub-keys
      * and replicates the hot source2 rows across them — identical
      * pair set, fan-out distributed. 0 disables. Pure distribution
      * fix; no reference analogue needed (single-process there).
      * Default targets keys whose single-task fan-out is genuinely
      * pathological (65k rows x a similar probe side ~ 4e9 pairs on
      * one task); below that the per-key work fits a task and the
      * extra count/broadcast/replication costs more than it saves
      * (measured: 10k x 10k fixture runs 1.5x slower salted at
      * threshold 1024).
      */
    saltThreshold: Int = 65536,
    /** salt fan-out for hot blocking keys (<=1 disables salting) */
    saltBuckets: Int = 16) {
  require(candidateTrimStrategy == "truncate" || candidateTrimStrategy == "fallback",
    s"unknown candidateTrimStrategy $candidateTrimStrategy")
}

/** Two-source fuzzy matching: blocking-key candidate join -> per-column
  * similarity -> weighted mean -> best-match window / return-all ->
  * accept/undecided/reject classification. The Spark re-expression of
  * /root/reference/src/matcher.py (candidate probe :723-792, scoring
  * :1200-1296, best-match :1270-1274, classification :1478-1488).
  *
  * Scale shape: both sides explode their blocking keys and meet in one
  * shuffle hash join on the key; candidate pairs are id-only until the
  * scoring projection joins values back; scoring is whole-stage
  * codegen; best-match is one window. No driver materialization
  * anywhere except the (bounded) source2 row count that gates the
  * reference's cartesian fallback.
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

  /** Candidate-trim priority of a key group (matcher.py:794-800);
    * fallback/default keys rank below every ladder group.
    */
  private val GroupPriority: Map[String, Int] =
    Map("3gram" -> 0, "last3" -> 1, "word1" -> 2, "wordN" -> 3, "2gram" -> 4, "first" -> 5)

  /** Reference-compat blocking keys over a normalized value
    * (matcher.py:686-721): first-char class, leading 2/3-gram, last
    * 3-gram, first/last word prefixes — each with the reference's
    * length guards, tagged `tag:group:value` so keys from different
    * column pairs never collide (the reference prefixes keys with the
    * source2 column name). A non-empty value whose strategies all fail
    * their guards gets the `fallback:` first-char key (matcher.py:
    * 719-721); empty/"nan" values produce no keys (validity filter,
    * matcher.py:623-626).
    */
  def blockingKeys(c: Column, strategies: Seq[String], tag: String = ""): Column = {
    val v = Normalizers.normalizeString(c)
    val pre = if (tag.isEmpty) "" else tag + ":"
    def key(grp: String, value: Column): Column = concat(lit(s"$pre$grp:"), value)
    val keys: Seq[Column] = strategies.flatMap {
      case "first_char" =>
        // non-alphanumeric first char -> '#' class (matcher.py:694-697)
        Seq(key("first",
          when(substring(v, 1, 1).rlike("[a-z0-9]"), substring(v, 1, 1)).otherwise(lit("#"))))
      case "two_gram" =>
        Seq(when(length(v) >= 2, key("2gram", substring(v, 1, 2))))
      case "three_gram" =>
        Seq(when(length(v) >= 3, key("3gram", substring(v, 1, 3))))
      case "last_three" =>
        Seq(when(length(v) >= 3, key("last3", substring(v, -3, 3))))
      case "word_prefix" =>
        // first word's 2- AND 3-prefix (matcher.py:707-712).
        // try_element_at: ANSI mode (Spark 4 default) errors on
        // out-of-range element_at
        val w1 = try_element_at(graft.functions.ws_tokens(v), lit(1))
        Seq(when(length(w1) >= 2, key("word1", substring(w1, 1, 2))),
          when(length(w1) >= 3, key("word1", substring(w1, 1, 3))))
      case "word_suffix" =>
        val words = graft.functions.ws_tokens(v)
        val wN = try_element_at(words, lit(-1))
        Seq(when(size(words) > 1 && length(wN) >= 2, key("wordN", substring(wN, 1, 2))))
      case other => throw new IllegalArgumentException(s"unknown blocking strategy: $other")
    }
    // guards emit null for failed strategies; fallback when none survive
    val arr = filter(array(keys: _*), k => k.isNotNull)
    val withFallback = when(size(arr) === 0, array(key("fallback", substring(v, 1, 1))))
      .otherwise(arr)
    when(length(v) === 0 || v === "nan", array().cast("array<string>"))
      .otherwise(array_distinct(withFallback))
  }

  /** Candidate pairs via exploded blocking keys from every mapped
    * column: one shuffle equi-join on the key, dedup on id pair. The
    * distributed form of the reference's blocking index + probe union
    * (matcher.py:607-650, 750-792), including its max_block_size skew
    * guard, max_candidates cap (with the `fallback` priority ladder),
    * and zero-key cartesian fallback.
    */
  def candidates(s1: DataFrame, s2: DataFrame, id1: String, id2: String,
      mapping: Seq[MatchColumn], opts: MatchOptions): DataFrame = {
    def keyed(df: DataFrame, id: String, side: Int): DataFrame = {
      // one key set per mapping, tagged by the source2 column name
      // (reference tags every key with col2, matcher.py:683-692)
      val perMapping = mapping.map { m =>
        val c = if (side == 1) m.col1 else m.col2
        blockingKeys(col(c), opts.blockingStrategies, m.col2)
      }
      val allKeys = array_distinct(flatten(array(perMapping: _*)))
      df.select(col(id), explode(allKeys).as("_bk"))
    }
    val left = keyed(s1, id1, 1)
    val right1 = keyed(s2, id2, 2)
    // one bounded count() of source2, shared by the salting gate and
    // the cartesian fallback (metadata-cheap on parquet); computed only
    // when one of those features needs it
    lazy val rows2: Long = s2.count()
    val saltingConfigured =
      !opts.broadcastProbe && opts.saltBuckets > 1 && opts.saltThreshold > 0
    val fallbackConfigured = opts.cartesianFallbackLimit > 0
    lazy val rightCounts = right1.groupBy($"_bk").count()
    val right0 =
      if (opts.maxBlockSize > 0) {
        val hotKeys = broadcast(rightCounts
          .where($"count" > opts.maxBlockSize).select($"_bk"))
        if (opts.skipHighCardinality)
          right1.join(hotKeys, Seq("_bk"), "left_anti")
        else {
          val w = Window.partitionBy($"_bk").orderBy(col(id2).asc)
          val trimmed = right1.join(hotKeys, Seq("_bk"), "left_semi")
            .withColumn("_rn", row_number().over(w))
            .where($"_rn" <= opts.maxBlockSize).drop("_rn")
          right1.join(hotKeys, Seq("_bk"), "left_anti").unionByName(trimmed)
        }
      } else right1

    // group priority rides the join for the trim ladder; min over the
    // pair's keys = the best group that produced the pair
    // keys are `tag:grp:value`; the grp segment is always index 2
    // (values may contain ':' themselves, so never index from the end).
    // Only computed when a candidate cap needs the ladder (r6): with
    // maxCandidates off, the split/element_at over every joined row and
    // the min(_p) aggregate were pure waste — the column was dropped
    // right after the pair dedup.
    val needPrio = opts.maxCandidates > 0
    val prio = coalesce(try_element_at(typedLit(GroupPriority),
      element_at(split($"_bk", ":"), 2)), lit(6)).as("_p")
    // hot keys: one (tiny, parallel) count of the exploded key table
    // decides; the list is driver-small by construction (a key is hot
    // only past saltThreshold rows). No hot keys -> the plain join,
    // zero added plan nodes. Two plan-time economies (r2 ADVICE): the
    // detection job is skipped entirely when source2 has fewer rows
    // than the threshold (no key CAN be hot — a row emits each distinct
    // key once, so block size <= |s2|), and counts come from right0
    // (post max_block_size guard) so keys the guard already removed or
    // trimmed are never salted.
    val hotKeys: Array[String] =
      if (saltingConfigured && rows2 > opts.saltThreshold)
        right0.groupBy($"_bk").count()
          .where($"count" > opts.saltThreshold).select($"_bk")
          .collect().map(_.getString(0))
      else Array.empty
    val joined =
      if (hotKeys.nonEmpty) {
        // split probe rows of hot keys across saltBuckets sub-keys and
        // replicate the matching source2 rows into every sub-key —
        // the exact same (id1, id2) pair set, but a mega-key's join
        // fan-out now lands on saltBuckets tasks instead of one.
        // Few hot keys -> inline isin; many -> broadcast marker join
        // (isin over thousands of literals bloats the codegen'd plan)
        val spark = s2.sparkSession
        def marked(df: DataFrame): DataFrame =
          if (hotKeys.length <= 256) df.withColumn("_hot", $"_bk".isin(hotKeys.toSeq: _*))
          else df.join(
            broadcast(spark.createDataset(hotKeys.toSeq)(
              org.apache.spark.sql.Encoders.STRING).toDF("_bk")
              .withColumn("_m", lit(true))),
            Seq("_bk"), "left").withColumn("_hot", coalesce($"_m", lit(false))).drop("_m")
        val leftS = marked(left).select(col(id1), $"_bk",
          when($"_hot", pmod(xxhash64(col(id1)), lit(opts.saltBuckets)).cast("int"))
            .otherwise(0).as("_salt"))
        val rightS = marked(right0).select(col(id2), $"_bk", explode(
          when($"_hot", sequence(lit(0), lit(opts.saltBuckets - 1)))
            .otherwise(array(lit(0)))).as("_salt"))
        val out = leftS.join(rightS, Seq("_bk", "_salt"))
        if (needPrio) out.select(col(id1), col(id2), prio)
        else out.select(col(id1), col(id2))
      } else {
        val right = if (opts.broadcastProbe) broadcast(right0) else right0
        val out = left.join(right, "_bk")
        if (needPrio) out.select(col(id1), col(id2), prio)
        else out.select(col(id1), col(id2))
      }
    val pairs0 =
      if (needPrio) joined.groupBy(col(id1), col(id2)).agg(min($"_p").as("_p"))
      else joined.dropDuplicates(id1, id2)
    // With the zero-key fallback ACTIVE (source2 under the limit), the
    // pair table feeds TWO plan branches — the capped output and the
    // unmatched-probe anti-join. Left lazy, the whole candidate join
    // subtree was computed twice per action (r6 measured: the scored
    // 10k x 10k bench job carried a full duplicate of the blocking-join
    // + pair-dedup chain inside the anti-join branch). Persist it while
    // the fallback needs it; blocks free after the first action.
    val fallbackActive = fallbackConfigured && rows2 <= opts.cartesianFallbackLimit
    val pairs =
      if (fallbackActive) pairs0.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      else pairs0

    val capped =
      if (opts.maxCandidates > 0) {
        val wAll = Window.partitionBy(col(id1))
        val wOrd = Window.partitionBy(col(id1)).orderBy(col(id2).asc)
        val x = pairs
          .withColumn("_total", count(lit(1)).over(wAll))
          .withColumn("_pmin", min($"_p").over(wAll))
        val x2 = x.withColumn("_bestn",
          sum(when($"_p" === $"_pmin", 1L).otherwise(0L)).over(wAll))
          .withColumn("_rn", row_number().over(wOrd))
        // under the cap: keep all. Over it with the fallback ladder: the
        // reference keeps exactly the highest-priority group present if
        // it fits (matcher.py:836-855 — supersets at lower cutoffs can
        // only be larger, so the first non-empty cutoff decides); a
        // fallback-only row (_pmin > 5) never qualifies. Otherwise:
        // deterministic lowest-id truncation.
        val useLadder = opts.candidateTrimStrategy == "fallback"
        x2.where(
          ($"_total" <= opts.maxCandidates) ||
          (lit(useLadder) && $"_pmin" <= 5 && $"_bestn" <= opts.maxCandidates &&
            $"_p" === $"_pmin") ||
          (!(lit(useLadder) && $"_pmin" <= 5 && $"_bestn" <= opts.maxCandidates) &&
            $"_rn" <= opts.maxCandidates))
          .select(col(id1), col(id2))
      } else pairs.select(col(id1), col(id2))

    // zero-key cartesian fallback (matcher.py:739-743): probe rows with
    // no surviving candidates scan all of source2 when it is small.
    // Deliberately sized OUT at scale (one bounded count() decides,
    // shared with the salting gate above).
    if (fallbackActive) {
      val unmatched = s1.select(col(id1))
        .join(pairs.select(col(id1)), Seq(id1), "left_anti")
      val out = capped.unionByName(unmatched.crossJoin(s2.select(col(id2))))
      graft.CacheHygiene.releaseAfterAction(out, () => { pairs.unpersist(blocking = false); () })
    } else capped
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

  /** Best-match perfect shortcut: pairs whose EVERY mapped column
    * normalizes to the same non-empty lowercase value. Joined on a
    * 128-bit hash of the tuple so long values never ride the shuffle
    * as key bytes (same shape as exact dedup).
    */
  private def perfectPairs(s1: DataFrame, s2: DataFrame, id1: String, id2: String,
      mapping: Seq[MatchColumn]): DataFrame = {
    def keyed(df: DataFrame, id: String, side: Int): DataFrame = {
      val vals = mapping.zipWithIndex.map { case (m, i) =>
        val c = if (side == 1) m.col1 else m.col2
        lower(Normalizers.byType(col(c), m.colType).cast("string")).as(s"_k_$i")
      }
      val nonEmpty = mapping.indices.map(i => length(col(s"_k_$i")) > 0).reduce(_ && _)
      df.select(col(id) +: vals: _*)
        .where(nonEmpty)
        .select(col(id),
          xxhash64(mapping.indices.map(i => col(s"_k_$i")): _*).as("_h1"),
          xxhash64(mapping.indices.map(i => col(s"_k_$i")) :+ lit(1): _*).as("_h2"))
    }
    keyed(s1, id1, 1).join(keyed(s2, id2, 2), Seq("_h1", "_h2"))
      .groupBy(col(id1)).agg(min(col(id2)).as(id2))
  }

  /** Diagnostic surface of the early-termination shortcut: the exact
    * pair table [[matchTables]] resolves WITHOUT candidate generation
    * when `earlyTermination` is on (one row per s1 id whose every
    * mapped column normalizes equal to some s2 row). Lets a benchmark
    * or operator verify the shortcut's coverage on a workload instead
    * of assuming it — `count() == |s1|` means the scored path saw an
    * empty probe side.
    */
  def perfectMatchPairs(s1: DataFrame, s2: DataFrame, id1: String, id2: String,
      mapping: Seq[MatchColumn]): DataFrame =
    perfectPairs(s1, s2, id1, id2, mapping)

  /** Full matching-mode run. Output per the reference contract
    * (matcher.py:1450-1476): id pair, per-column scores, overall_score,
    * match_result. Best-match keeps the top candidate per source1 row
    * (ties -> lowest id2; documented determinism fix over the
    * reference's iteration-order tie, matcher.py:1270-1274).
    */
  def matchTables(s1: DataFrame, s2: DataFrame, id1: String, id2: String,
      mapping: Seq[MatchColumn], opts: MatchOptions = MatchOptions()): DataFrame = {
    val shortcut = opts.earlyTermination && !opts.returnAllMatches
    val perfect =
      if (shortcut) perfectPairs(s1, s2, id1, id2, mapping)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      else null
    val probe = if (shortcut) s1.join(perfect.select(col(id1)), Seq(id1), "left_anti") else s1

    val cands = candidates(probe, s2, id1, id2, mapping, opts)
    val scored = score(cands, probe, s2, id1, id2, mapping)
    val classified = scored.withColumn("match_result",
      classify($"overall_score", opts.threshold, opts.undecidedRange))
    val base =
      if (opts.returnAllMatches)
        classified.where($"overall_score" >= opts.threshold - opts.undecidedRange)
      else {
        // best candidate is emitted unconditionally (classification labels
        // it; the reference applies no threshold filter in best-match
        // mode, matcher.py:1286-1295). Top-1 per probe row as a
        // PARTIAL-AGGREGATING min_by instead of a row_number window
        // (r6, guide §2.3): the same total order — highest
        // overall_score, ties to lowest id2 — expressed as the min of
        // (-overall_score, id2), so map-side combine collapses each
        // partition to one candidate row per probe id BEFORE the
        // shuffle and nothing ever sorts the full scored table (the
        // window form paid a full local sort under its group-limit).
        val cols = classified.columns
        classified.groupBy(col(id1))
          .agg(min_by(struct(cols.map(col): _*),
            struct(negate($"overall_score"), col(id2))).as("_best"))
          .select(cols.map(n => col("_best").getField(n).as(n)): _*)
      }
    if (shortcut) {
      val perfectScored = perfect.select(
        col(id1) +: col(id2) +:
          mapping.map(m => lit(1.0).as(s"score_${m.col1}")) :+
          lit(1.0).as("overall_score") :+
          classify(lit(1.0), opts.threshold, opts.undecidedRange).as("match_result"): _*)
      // `perfect` feeds two plan branches (the anti-join probe and the
      // perfect-scored union); the persist is released once the first
      // action on the result completes — safe because the persist's
      // lineage is intact, so a later re-action just recomputes it
      graft.CacheHygiene.releaseAfterAction(
        base.unionByName(perfectScored), () => { perfect.unpersist(blocking = false); () })
    } else base
  }

  /** Match-result distribution (accept/undecided/reject counts) — the
    * summary the reference CLI prints after a run (main.py:284-285).
    */
  def matchDistribution(matches: DataFrame): DataFrame =
    matches.groupBy($"match_result").agg(count(lit(1)).as("n"))

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
        blockingKeys(lit(f.value), blockingStrategies, f.col)): _*)))
      one.select(arr).head().getSeq[String](0)
    }
    val masterKeys = array_distinct(flatten(array(fields.map(f =>
      blockingKeys(col(f.col), blockingStrategies, f.col)): _*)))
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
