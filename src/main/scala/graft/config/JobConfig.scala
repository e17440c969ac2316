package graft.config

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import com.fasterxml.jackson.databind.node.{ArrayNode, ObjectNode, TextNode}
import scala.jdk.CollectionConverters._

/** JSON job config with the reference's shape and error semantics
  * (/root/reference/src/config_validator.py): modes matching /
  * clustering / search, source specs (path string or table object),
  * match_config / cluster_config, `${VAR[:default]}` environment
  * interpolation, and mode-dependency checks with the same messages.
  * Parsed with Jackson (ships with Spark) into case classes.
  */
final case class SourceSpec(
    path: Option[String] = None,
    table: Option[String] = None,
    host: Option[String] = None,
    user: Option[String] = None,
    password: Option[String] = None,
    database: Option[String] = None,
    /** explicit JDBC url (any engine); host/database build a mysql url
      * when absent (data_loader.py:183-188)
      */
    url: Option[String] = None,
    driver: Option[String] = None,
    /** Spark-side parity for the reference's chunked MySQL read
      * (data_loader.py:193-197): split the scan into numPartitions
      * range predicates on partitionColumn; bounds are auto-derived
      * with one min/max query when not given.
      */
    partitionColumn: Option[String] = None,
    numPartitions: Option[Int] = None,
    lowerBound: Option[Long] = None,
    upperBound: Option[Long] = None) {
  def isJdbc: Boolean = table.isDefined
  def jdbcUrl: Option[String] =
    url.orElse(host.map(h => s"jdbc:mysql://$h/${database.getOrElse("")}"))
}

final case class ColumnMapping(source1: String, source2: Option[String], weight: Double,
    colType: Option[String])

final case class MatchSettings(
    columns: Seq[ColumnMapping] = Nil,
    threshold: Double = 0.75,
    undecidedRange: Double = 0.05,
    returnAllMatches: Boolean = false,
    blockingStrategies: Seq[String] = Seq("first_char", "three_gram", "last_three"),
    /** matcher knobs, same keys + defaults as the reference
      * (matcher.py:390-400): max_block_size / skip_high_cardinality /
      * max_candidates / candidate_trim_strategy / early_termination
      */
    maxBlockSize: Int = 0,
    skipHighCardinality: Boolean = true,
    maxCandidates: Int = 0,
    candidateTrimStrategy: String = "truncate",
    earlyTermination: Boolean = true)

final case class ClusterSettings(
    columns: Seq[ColumnMapping] = Nil,
    threshold: Double = 0.75,
    generateSummary: Boolean = false,
    blockingStrategies: Seq[String] = Seq("first_char", "three_gram", "last_three"),
    /** clusterer knobs (clusterer.py:180-187) */
    useBlocking: Boolean = true,
    maxBlockSize: Int = 0,
    skipHighCardinality: Boolean = true,
    /** scale knobs with no reference analogue (single-process there):
      * candidate_mode "pairs" (exact within-bucket pairs) or "star"
      * (connectivity-preserving hub edges — the 100 TB path);
      * max_band_bucket caps LSH band-bucket size directly (falls back
      * to max_block_size when absent, preserving the reference's
      * skip_high_cardinality mapping)
      */
    candidateMode: String = "pairs",
    maxBandBucket: Option[Int] = None,
    /** also emit the canonical-survivor projection (the deduplicated
      * corpus itself — longest concatenated text per cluster) next to
      * the cluster table, as `<output>_canonical`. Training-data
      * surface, no reference analogue.
      */
    canonical: Boolean = false,
    /** remove corpus-wide boilerplate lines (LineDedup) from the
      * cluster text BEFORE near-dup clustering — the standard crawl
      * pipeline order (shared nav/footer lines otherwise make
      * unrelated pages near-dups). `line_dedup: true` enables it;
      * `line_dedup_max_df` sets the occurrence threshold (default 1).
      * Training-data surface, no reference analogue.
      */
    lineDedup: Boolean = false,
    lineDedupMaxDf: Int = 1,
    /** run the C4 §2.2 heuristic quality filter over the cluster text
      * FIRST (before line_dedup and clustering): drop unterminated /
      * short / javascript lines, and lorem-ipsum / brace /
      * under-`c4_min_sentences` pages entirely. Training-data surface,
      * no reference analogue.
      */
    c4Filter: Boolean = false,
    c4MinLineWords: Int = 5,
    c4MinSentences: Int = 3,
    /** run the Gopher §A1.1 document-level quality rules after the C4
      * line rules (word-count band, mean-word-length band,
      * symbol-to-word ratio, bullet/ellipsis line fractions,
      * alpha-word fraction, required-stopword floor).
      * `gopher_min_words` sets the word floor (Gopher's published 50
      * assumes full web pages). Training-data surface, no reference
      * analogue.
      */
    gopherFilter: Boolean = false,
    gopherMinWords: Int = 50,
    /** decontaminate-mode method: "minhash" (whole-document near-dup
      * vs the eval set, the default) or "ngram" (GPT-3-style exact
      * word n-gram collision — catches a short eval snippet EMBEDDED
      * in a long page). ngram knobs: decon_ngram_n (gram width,
      * default 13), decon_min_shared (distinct shared grams to flag a
      * doc, default 1), decon_max_gram_df (corpus-df cap dropping
      * boilerplate grams, 0 = off). Training-data surface, no
      * reference analogue.
      */
    deconMethod: String = "minhash",
    deconNgramN: Int = 13,
    deconMinShared: Long = 1L,
    deconMaxGramDf: Int = 0)

final case class JobConfig(
    mode: String,
    source1: Option[SourceSpec],
    source2: Option[SourceSpec],
    output: SourceSpec,
    matchConfig: MatchSettings = MatchSettings(),
    clusterConfig: ClusterSettings = ClusterSettings())

object JobConfig {

  private val mapper = new ObjectMapper()

  /** Parse + validate a config JSON string. Mirrors
    * config_validator.py:176-239 (mode checks verbatim) and :282-314
    * (env interpolation).
    */
  def parse(json: String, env: Map[String, String] = sys.env): JobConfig = {
    val root =
      try mapper.readTree(json)
      catch {
        case e: Exception =>
          throw new IllegalArgumentException(s"Invalid JSON in configuration file: ${e.getMessage}")
      }
    val resolved = resolveEnv(root, env)
    val mode = textOr(resolved, "mode", "matching")
    if (!Set("matching", "clustering", "search", "decontaminate").contains(mode))
      throw new IllegalArgumentException(s"Configuration validation error at 'mode': " +
        s"'$mode' is not one of ['matching', 'clustering', 'search', 'decontaminate']")

    // mode dependency checks — messages per config_validator.py:208-224
    val has1 = resolved.has("source1")
    val has2 = resolved.has("source2")
    mode match {
      case "clustering" =>
        if (has2) throw new IllegalArgumentException(
          "clustering mode does not require source2. Remove source2 from config.")
        if (!has1) throw new IllegalArgumentException(
          "clustering mode requires source1. Add source1 to config.")
      case "search" =>
        if (!has2) throw new IllegalArgumentException(
          "search mode requires source2 (master dataset). Add source2 to config.")
        if (has1) throw new IllegalArgumentException(
          "search mode does not require source1. Remove source1 from config or set mode to 'matching'.")
      case "decontaminate" =>
        // training-data surface (no reference analogue): source1 = the
        // corpus to clean, source2 = the reference/eval set to clean
        // AGAINST
        if (!has1) throw new IllegalArgumentException(
          "decontaminate mode requires source1 (corpus). Add source1 to config.")
        if (!has2) throw new IllegalArgumentException(
          "decontaminate mode requires source2 (reference/eval set). Add source2 to config.")
      case _ =>
        if (!has1) throw new IllegalArgumentException(
          "matching mode requires source1. Add source1 to config.")
        if (!has2) throw new IllegalArgumentException(
          "matching mode requires source2. Add source2 to config or set mode to 'clustering' or 'search'.")
    }
    if (!resolved.has("output"))
      throw new IllegalArgumentException("Configuration validation error at 'output': required")

    // reference-style top-level mysql_credentials
    // (config_validator.py:71-77; --setup writes this shape): a STRING
    // source is then a MySQL table unless it looks like a file — same
    // heuristic as data_loader._is_mysql_table (data_loader.py:54-66)
    val creds = Option(resolved.get("mysql_credentials"))
    JobConfig(
      mode = mode,
      source1 = if (has1) Some(sourceSpec(resolved.get("source1"), creds)) else None,
      source2 = if (has2) Some(sourceSpec(resolved.get("source2"), creds)) else None,
      output = sourceSpec(resolved.get("output"), None),
      matchConfig = matchSettings(resolved.get("match_config")),
      clusterConfig = clusterSettings(resolved.get("cluster_config")))
  }

  def parseFile(path: String): JobConfig = {
    val p = java.nio.file.Paths.get(path)
    if (!java.nio.file.Files.exists(p))
      throw new java.io.FileNotFoundException(s"Configuration file not found: $path")
    parse(java.nio.file.Files.readString(p))
  }

  // ------------------------------------------------------------ pieces

  private def isFileLike(s: String): Boolean =
    // any URI scheme (s3://, hdfs://, gs://, abfs://, file:/...) or
    // path separator marks a path — a SQL table name can contain
    // neither, so this can't misroute a real table, while a remote or
    // extensionless dataset path (which Files.exists can never see —
    // it checks the DRIVER'S local fs) is never misread as a table
    s.contains("://") || s.startsWith("file:") || s.contains("/") ||
      s.endsWith(".csv") || s.endsWith(".parquet") || s.endsWith(".json") ||
      java.nio.file.Files.exists(java.nio.file.Paths.get(s))

  private def sourceSpec(n: JsonNode, creds: Option[JsonNode] = None): SourceSpec =
    if (n.isTextual) {
      val s = n.asText()
      creds match {
        case Some(c) if !isFileLike(s) =>
          SourceSpec(table = Some(s),
            host = opt(c, "host"), user = opt(c, "user"),
            password = opt(c, "password"), database = opt(c, "database"))
        case _ => SourceSpec(path = Some(s))
      }
    } else {
      if (!n.has("table"))
        throw new IllegalArgumentException(
          "Configuration validation error at 'source': 'table' is a required property")
      SourceSpec(
        table = Some(n.get("table").asText()),
        host = opt(n, "host"), user = opt(n, "user"),
        password = opt(n, "password"), database = opt(n, "database"),
        url = opt(n, "url"), driver = opt(n, "driver"),
        partitionColumn = opt(n, "partition_column"),
        numPartitions = if (n.has("num_partitions")) Some(n.get("num_partitions").asInt) else None,
        lowerBound = if (n.has("lower_bound")) Some(n.get("lower_bound").asLong) else None,
        upperBound = if (n.has("upper_bound")) Some(n.get("upper_bound").asLong) else None)
    }

  private def matchSettings(n: JsonNode): MatchSettings = {
    if (n == null) return MatchSettings()
    MatchSettings(
      columns = columns(n, requireSource2 = true),
      threshold = boundedNumber(n, "threshold", 0.75),
      undecidedRange = boundedNumber(n, "undecided_range", 0.05),
      returnAllMatches = if (n.has("return_all_matches")) n.get("return_all_matches").asBoolean
        else false,
      blockingStrategies = strategies(n),
      maxBlockSize = intOr(n, "max_block_size", 0),
      skipHighCardinality = boolOr(n, "skip_high_cardinality", true),
      maxCandidates = intOr(n, "max_candidates", 0),
      candidateTrimStrategy = textOr(n, "candidate_trim_strategy", "truncate"),
      earlyTermination = boolOr(n, "early_termination", true))
  }

  private def clusterSettings(n: JsonNode): ClusterSettings = {
    if (n == null) return ClusterSettings()
    ClusterSettings(
      columns = columns(n, requireSource2 = false),
      threshold = boundedNumber(n, "threshold", 0.75),
      generateSummary = if (n.has("generate_summary")) n.get("generate_summary").asBoolean
        else false,
      blockingStrategies = strategies(n),
      useBlocking = boolOr(n, "use_blocking", true),
      maxBlockSize = intOr(n, "max_block_size", 0),
      skipHighCardinality = boolOr(n, "skip_high_cardinality", true),
      candidateMode = {
        val m = textOr(n, "candidate_mode", "pairs")
        if (m != "pairs" && m != "star")
          throw new IllegalArgumentException(
            s"Configuration validation error at 'candidate_mode': " +
              s"'$m' is not one of ['pairs', 'star']")
        m
      },
      maxBandBucket = if (n.has("max_band_bucket")) Some(n.get("max_band_bucket").asInt)
        else None,
      canonical = boolOr(n, "canonical", false),
      lineDedup = boolOr(n, "line_dedup", false),
      lineDedupMaxDf = intOr(n, "line_dedup_max_df", 1),
      c4Filter = boolOr(n, "c4_filter", false),
      c4MinLineWords = intOr(n, "c4_min_line_words", 5),
      c4MinSentences = intOr(n, "c4_min_sentences", 3),
      gopherFilter = boolOr(n, "gopher_filter", false),
      gopherMinWords = intOr(n, "gopher_min_words", 50),
      deconMethod = {
        val m = textOr(n, "decon_method", "minhash")
        if (m != "minhash" && m != "ngram")
          throw new IllegalArgumentException(
            s"Configuration validation error at 'decon_method': " +
              s"'$m' is not one of ['minhash', 'ngram']")
        m
      },
      deconNgramN = intOr(n, "decon_ngram_n", 13),
      deconMinShared = intOr(n, "decon_min_shared", 1).toLong,
      deconMaxGramDf = intOr(n, "decon_max_gram_df", 0))
  }

  private def intOr(n: JsonNode, f: String, default: Int): Int =
    if (n.has(f)) n.get(f).asInt else default

  private def boolOr(n: JsonNode, f: String, default: Boolean): Boolean =
    if (n.has(f)) n.get(f).asBoolean else default

  private def columns(n: JsonNode, requireSource2: Boolean): Seq[ColumnMapping] = {
    val arr = n.get("columns")
    if (arr == null) return Nil
    arr.asInstanceOf[ArrayNode].elements().asScala.map { c =>
      if (!c.has("source1"))
        throw new IllegalArgumentException(
          "Configuration validation error at 'columns': 'source1' is a required property")
      if (requireSource2 && !c.has("source2"))
        throw new IllegalArgumentException(
          "Configuration validation error at 'columns': 'source2' is a required property")
      val w = if (c.has("weight")) c.get("weight").asDouble else 1.0
      if (w < 0) throw new IllegalArgumentException(
        "Configuration validation error at 'columns.weight': must be >= 0")
      ColumnMapping(c.get("source1").asText(),
        if (c.has("source2")) Some(c.get("source2").asText()) else None,
        w, opt(c, "type"))
    }.toSeq
  }

  private def strategies(n: JsonNode): Seq[String] =
    if (n.has("blocking_strategies"))
      n.get("blocking_strategies").elements().asScala.map(_.asText()).toSeq
    else Seq("first_char", "three_gram", "last_three")

  private def boundedNumber(n: JsonNode, field: String, default: Double): Double = {
    if (!n.has(field)) return default
    val v = n.get(field).asDouble
    if (v < 0 || v > 1)
      throw new IllegalArgumentException(
        s"Configuration validation error at '$field': must be between 0 and 1")
    v
  }

  private def opt(n: JsonNode, f: String): Option[String] =
    if (n.has(f)) Some(n.get(f).asText()) else None

  private def textOr(n: JsonNode, f: String, default: String): String =
    if (n.has(f)) n.get(f).asText() else default

  // --------------------------------------------------- env interpolation

  private val envPattern = java.util.regex.Pattern.compile("\\$\\{([^}:]+)(?::([^}]*))?\\}")

  /** `${VAR}` / `${VAR:default}` resolution over every string node
    * (config_validator.py:282-314; same error text for missing vars).
    */
  private[config] def resolveEnv(node: JsonNode, env: Map[String, String]): JsonNode = node match {
    case o: ObjectNode =>
      val out = mapper.createObjectNode()
      o.fields().asScala.foreach { e => out.set[JsonNode](e.getKey, resolveEnv(e.getValue, env)); () }
      out
    case a: ArrayNode =>
      val out = mapper.createArrayNode()
      a.elements().asScala.foreach { e => out.add(resolveEnv(e, env)); () }
      out
    case t: TextNode =>
      val m = envPattern.matcher(t.asText())
      val sb = new StringBuilder
      var last = 0
      var found = false
      while (m.find()) {
        found = true
        sb.append(t.asText().substring(last, m.start()))
        val name = m.group(1)
        val default = Option(m.group(2))
        env.get(name).orElse(default) match {
          case Some(v) => sb.append(v)
          case None => throw new IllegalArgumentException(
            s"Environment variable '$name' not found and no default value provided. " +
              "Set it in your .env file or environment.")
        }
        last = m.end()
      }
      if (!found) t
      else { sb.append(t.asText().substring(last)); new TextNode(sb.toString) }
    case other => other
  }
}
