package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.dedup.{DedupConfig, WebDedup}
import graft.io.{Sources, Warehouse}

/** spark-submit entry point for the flagship staged pipeline — the
  * surface the north rule names ("run via spark-submit on a
  * multi-executor cluster"):
  *
  *   spark-submit --class graft.PipelineMain graft.jar \
  *     --input pages.parquet --warehouse /wh \
  *     [--c4-filter [--c4-min-line-words 5] [--c4-min-sentences 3]] \
  *     [--gopher-filter [--gopher-min-words 50]] \
  *     [--line-dedup [--line-dedup-max-df 1]] \
  *     [--threshold 0.8] [--candidate-mode star] [--max-band-bucket 1000] \
  *     [--simhash-radius 2] [--span-min-span 64] \
  *     [--batch newpages.parquet --gen 1 [--frontier]] \
  *     [--output clusters.parquet] [--summary] [--canonical]
  *
  * The quality flags run the standard crawl-curation order BEFORE the
  * dedup stages — C4 line/page heuristics first, then the document-
  * level Gopher rules, then corpus-wide boilerplate line dedup — the
  * same composition (and defaults) as the JSON-config surface
  * (`JobConfig` c4_filter/gopher_filter/line_dedup). The composed pass
  * is itself a committed, resumable warehouse stage.
  *
  * Without --batch: full `WebDedup.run` (resumable — rerunning after a
  * kill rebuilds only uncommitted stages). With --batch: incremental
  * `WebDedup.addBatch` of generation --gen on top of the committed
  * base. Cluster sizing (N vs 4N executors) is spark-submit's
  * --num-executors; nothing here depends on the master.
  */
object PipelineMain {

  def main(args: Array[String]): Unit = {
    val opts = parse(args.toList)
    val builder = SparkSession.builder()
      .appName("graft-pipeline")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
    // Under spark-submit (spark.master set), shuffle parallelism is the
    // cluster's business: honor --conf spark.sql.shuffle.partitions /
    // AQE defaults rather than overriding them here. The local fallback
    // pins partitions to its thread count.
    val spark = (if (sys.props.contains("spark.master")) builder
      else {
        val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
        builder.master(s"local[$cpus]").config("spark.sql.shuffle.partitions", cpus)
      }).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    try run(spark, opts, System.out)
    finally spark.stop()
  }

  /** The optional quality passes, composed in the standard crawl-
    * curation order (c4 -> gopher -> line dedup) over the extracted
    * text, committed as one resumable warehouse stage (`quality` /
    * `quality_g$gen`) keyed by knobs + input snapshot. Output follows
    * the extraction contract WebDedup's stage 1 produces —
    * (page_id, url, text) — so the dedup pipeline consumes it as a
    * pages table whose text is already extracted (its own stage 1
    * normalization is idempotent on it). All three passes are pure
    * map/filter stages except line dedup's hash-rows aggregation (see
    * each operator's scale notes); none reads the driver.
    */
  private def applyQuality(wh: Warehouse, pages: DataFrame,
      opts: Map[String, String], stage: String): DataFrame = {
    val wantC4 = opts.contains("c4-filter")
    val wantGopher = opts.contains("gopher-filter")
    val wantLines = opts.contains("line-dedup")
    if (!wantC4 && !wantGopher && !wantLines) return pages
    val c4LineWords = opts.getOrElse("c4-min-line-words", "5").toInt
    val c4Sentences = opts.getOrElse("c4-min-sentences", "3").toInt
    val gopherWords = opts.getOrElse("gopher-min-words", "50").toInt
    val lineMaxDf = opts.getOrElse("line-dedup-max-df", "1").toLong
    val fp = s"q_c4$wantC4.$c4LineWords.${c4Sentences}_go$wantGopher.$gopherWords" +
      s"_ld$wantLines.${lineMaxDf}_in" + WebDedup.inputSnapshot(pages)
    wh.getOrCreate(stage, fp) {
      // quality judges the text AS-CRAWLED: normalize_string collapses
      // '\n' runs, which would degenerate the line-level rules (C4 line
      // heuristics, boilerplate line dedup) to one line per document.
      // The dedup pipeline's own stage 1 normalizes downstream.
      val withText =
        if (pages.columns.contains("text")) pages
        else pages.withColumn("text", graft.extract.HtmlExtract.extractText($"html"))
      val base = withText.select($"page_id".cast("long").as("page_id"), $"url", $"text")
      val c4d = if (!wantC4) base
        else graft.text.TextAnalysis.c4Filter(base, "text", c4LineWords, c4Sentences)
      val god = if (!wantGopher) c4d
        else graft.text.TextAnalysis.gopherFilter(c4d, "text", minWords = gopherWords)
      if (!wantLines) god
      else {
        val deduped = graft.dedup.LineDedup.dedupLines(god, "page_id", "text", lineMaxDf)
        god.drop("text").join(deduped, Seq("page_id"))
      }
    }
  }

  private[graft] def run(spark: SparkSession, opts: Map[String, String],
      out: java.io.PrintStream): Unit = {
    // verify mode follows the library default (signature estimate — the
    // web-scale path; DedupConfig.exactVerify docs); --exact-verify
    // opts into shipping shingle-hash sets through the verify join for
    // reference-exact Jaccard (the WebDedupSpec recall-pinning config)
    val cfg = DedupConfig(
      threshold = opts.get("threshold").map(_.toDouble).getOrElse(0.8),
      exactVerify = opts.contains("exact-verify"),
      candidateMode = opts.getOrElse("candidate-mode", "pairs"),
      maxBandBucket = opts.get("max-band-bucket").map(_.toInt).getOrElse(0),
      simhashRadius = opts.get("simhash-radius").map(_.toInt).getOrElse(-1),
      spanMinSpan = opts.get("span-min-span").map(_.toInt).getOrElse(0))
    val wh = new Warehouse(opts("warehouse"), spark)
    val clusters = opts.get("batch") match {
      case Some(batchPath) =>
        val gen = opts.getOrElse("gen", "1").toInt
        val batch0 = Sources.read(spark, graft.config.SourceSpec(path = Some(batchPath)))
        // --frontier: drop batch pages whose canonical url the base
        // generation already holds, BEFORE signing/probing them — the
        // crawl-frontier pass. Seen set = the committed base cluster
        // table's urls; the bloom artifact commits alongside it (keyed
        // to the base snapshot, so a regrown base rebuilds the bloom)
        // and each snapshot then pays one map-only probe + an exact
        // confirm of bloom-positives only (Frontier scaladoc). The
        // FILTERED batch itself is a committed stage too: addBatch
        // consumes its dataframe several times (content snapshot,
        // extraction stage), and a committed table turns those into
        // cheap parquet re-scans instead of re-running the probe +
        // confirm joins per consumer — and makes the frontier pass
        // resumable like every other stage.
        val batch =
          if (!opts.contains("frontier")) batch0
          else {
            val baseClustersN = if (gen <= 1) "clusters" else s"clusters_g${gen - 1}"
            val baseId = wh.snapshotOf(baseClustersN).getOrElse(sys.error(
              s"--frontier needs the base generation committed under ${wh.root}"))
            val base = wh.read(baseClustersN)
            val frFp = "fr_" + WebDedup.inputSnapshot(batch0) + "_base" + baseId
            // The bloom broadcast lives exactly as long as the build:
            // getOrCreate MATERIALIZES the filtered batch (parquet
            // commit), after which the handle is released (broadcast
            // destroyed + deserialized-cache entry dropped) so a
            // session cycling many generations doesn't accumulate
            // filter copies. On resume the block never runs and no
            // broadcast is created at all.
            var bloomRef: graft.web.Frontier.BloomRef = null
            val filtered =
              try wh.getOrCreate(s"frontier_batch_g$gen", frFp,
                  parent = Some(baseClustersN)) {
                val bloom = graft.web.Frontier.committedUrlBloom(wh, base, "url",
                  expectedItems = math.max(base.count(), 1000L),
                  fingerprint = "urls_" + baseId)
                bloomRef = graft.web.Frontier.broadcastBloom(spark, bloom)
                graft.web.Frontier.newUrlsBloom(batch0, base, "url", bloomRef)
              }
              finally if (bloomRef != null) bloomRef.release()
            filtered
          }
        // quality passes AFTER the frontier (url-level pruning is a
        // map-only probe; no point paying text extraction + filters
        // for pages the frontier drops) and BEFORE the merge
        WebDedup.addBatch(applyQuality(wh, batch, opts, s"quality_g$gen"),
          wh, cfg, gen = gen)
      case None =>
        val pages = Sources.read(spark, graft.config.SourceSpec(path = Some(opts("input"))))
        WebDedup.run(applyQuality(wh, pages, opts, "quality"),
          wh, cfg, canonical = opts.contains("canonical"))
    }
    opts.get("output").foreach { p =>
      Sources.write(clusters, graft.config.SourceSpec(path = Some(p)))
      // --canonical's deliverable is the deduplicated corpus itself;
      // export it next to the cluster table (r3 ADVICE: the flag's
      // output was committed to the warehouse but never surfaced)
      if (opts.contains("canonical") && !opts.contains("batch"))
        Sources.write(wh.read("canonical"),
          graft.config.SourceSpec(path = Some(p.stripSuffix("/") + "_canonical")))
    }
    if (opts.contains("summary"))
      Sources.clusterSummary(clusters).show(100, truncate = false)
    val n = clusters.count()
    val canonicalNote =
      if (opts.contains("canonical") && !opts.contains("batch"))
        s"; canonical corpus at ${wh.root}/canonical"
      else ""
    out.println(s"pipeline done: $n pages, " +
      s"${wh.buildCount} stages built (rest resumed from ${wh.root})$canonicalNote")
  }

  private val flags = Set("summary", "exact-verify", "canonical", "frontier",
    "c4-filter", "gopher-filter", "line-dedup")

  private def parse(args: List[String]): Map[String, String] = {
    def loop(rest: List[String], acc: Map[String, String]): Map[String, String] = rest match {
      case Nil => acc
      case k :: t if k.startsWith("--") && flags(k.stripPrefix("--")) =>
        loop(t, acc + (k.stripPrefix("--") -> "true"))
      case k :: v :: t if k.startsWith("--") => loop(t, acc + (k.stripPrefix("--") -> v))
      case other :: _ => throw new IllegalArgumentException(s"unexpected argument: $other")
    }
    val m = loop(args, Map.empty)
    require(m.contains("warehouse") && (m.contains("input") || m.contains("batch")),
      "usage: graft.PipelineMain --input pages.parquet --warehouse /wh " +
        "[--batch new.parquet --gen 1 [--frontier]] [--threshold T] " +
        "[--c4-filter [--c4-min-line-words N] [--c4-min-sentences N]] " +
        "[--gopher-filter [--gopher-min-words N]] " +
        "[--line-dedup [--line-dedup-max-df N]] " +
        "[--candidate-mode pairs|star] " +
        "[--max-band-bucket N] [--simhash-radius R] [--span-min-span N] " +
        "[--output PATH] [--summary] [--exact-verify] [--canonical]")
    m
  }
}
