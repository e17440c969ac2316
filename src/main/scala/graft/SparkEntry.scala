package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.dedup.{Dedup, DedupConfig}
import graft.emb.Embeddings
import graft.matching.{MatchColumn, MatchOptions, Matching}
import graft.mm.Multimodal
import graft.norm.Normalizers
import graft.text.TextAnalysis

/** Driver contract: one `queries` entry per implemented operator
  * (SURVEY.md §2 + the training-data additions), each with a DuckDB
  * oracle where the semantics are SQL-expressible. Dedup/similarity
  * pipelines whose outputs ARE SQL-expressible (exact dedup, n-gram
  * jaccard, planted-ground-truth LSH/SimHash/ANN fixtures) get full
  * oracles; sketch internals (MinHash signatures, winnowing) are
  * covered by ScalaTest goldens + rows-only checks.
  *
  * Duplicates are planted deterministically INSIDE each query (both
  * the Spark side and the SQL oracle derive the same expansion from
  * the same parquet), since the driver corpus has near-dup pairs but
  * no exact dups.
  */
object SparkEntry {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    s.read.parquet(s"$dir/$name.parquet")

  /** Flagship: near-duplicate clustering over the synthesized
    * Common-Crawl-style page table (BASELINE.json north rule) at
    * sf0.001 — extract text from html, MinHash/LSH, connected
    * components, cluster sizes.
    */
  def entry(spark: SparkSession): DataFrame = {
    val docs = t(spark, "/root/testdata/sf0.001", "documents")
    val pages = fixtures.WebPages.fromDocuments(docs)
    val extracted = graft.extract.HtmlExtract.extractDF(pages)
    Dedup.nearDupClusters(extracted, "page_id", "text",
        DedupConfig(exactVerify = true))
      .select($"page_id", $"url", $"cluster_id", $"cluster_size")
  }

  // ------------------------------------------------------------------
  // shared oracle-SQL fragments (DuckDB dialect)
  // ------------------------------------------------------------------

  /** Normalized token arrays per doc, mirroring the engine's
    * collapse-then-trim order (Normalizers.normalizeString): DuckDB's
    * trim strips only spaces, so collapsing '\s+' first makes edge
    * tabs/newlines normalize identically on both sides.
    */
  private val toksCte =
    """t AS (SELECT doc_id AS id, string_split(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' ') AS ts FROM documents)"""

  /** Distinct word k-shingle jaccard pair machinery (k inlined). */
  private def jaccardCtes(k: Int): String = {
    val km1 = k - 1
    s"""$toksCte,
       |g AS (SELECT id, unnest(list_distinct(list_transform(range(1, len(ts)-$k+2), i -> array_to_string(ts[i:i+$km1], ' ')))) AS gr FROM t),
       |sz AS (SELECT id, count(*) AS n FROM g GROUP BY 1),
       |inter AS (SELECT a.id AS i, b.id AS j, count(*) AS c FROM g a JOIN g b ON a.gr = b.gr AND a.id < b.id GROUP BY 1, 2),
       |pj AS (SELECT i, j, c*1.0/(sa.n + sb.n - c) AS jac FROM inter JOIN sz sa ON i = sa.id JOIN sz sb ON j = sb.id)""".stripMargin
  }

  /** Ids of docs in any 5-shingle near-dup pair at 0.8 (the corpus's
    * planted pairs) — used to exclude contaminated docs from fixtures
    * whose oracle can't predict cross-contamination.
    */
  private val dupIdsCtes =
    jaccardCtes(5) + ",\ndup AS (SELECT i AS id FROM pj WHERE jac >= 0.8 UNION SELECT j FROM pj WHERE jac >= 0.8)"

  private val langCounts: String = TextAnalysis.langs.map { l =>
    val list = TextAnalysis.markers(l).map(m => s"'$m'").mkString(", ")
    s"len(list_filter(ts, x -> x IN ($list))) AS c_$l"
  }.mkString(",\n  ")

  private val stopList: String =
    TextAnalysis.markers.values.flatten.toSeq.distinct.map(m => s"'$m'").mkString(", ")

  // Spark-side helper: docs minus members of any corpus near-dup pair
  private def cleanDocs(d: DataFrame): DataFrame = {
    val dupIds = Dedup.ngramJaccardPairs(d, "doc_id", "text", 5, 0.8)
      .select(explode(array($"id1", $"id2")).as("doc_id")).distinct()
    d.join(dupIds, Seq("doc_id"), "left_anti")
  }

  // ------------------------------------------------------------------
  // queries
  // ------------------------------------------------------------------

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // ---------------------------------------------------------- dedup

    "dedup_exact" -> { (s, dir) =>
      val d = t(s, dir, "documents")
      val expanded = d.select($"doc_id", $"text")
        .unionAll(d.where($"doc_id" % 2 === 0)
          .select(($"doc_id" + 100000).as("doc_id"), $"text"))
        .unionAll(d.where($"doc_id" % 6 === 0)
          .select(($"doc_id" + 200000).as("doc_id"), $"text"))
        .withColumn("_t", Normalizers.normalizeString($"text"))
      Dedup.exactClusters(expanded, "doc_id", "_t")
        .select($"doc_id".cast("long").as("doc_id"), $"cluster_id", $"cluster_size")
    },

    "dedup_exact_summary" -> { (s, dir) =>
      val d = t(s, dir, "documents")
      val expanded = d.select($"doc_id", $"text")
        .unionAll(d.where($"doc_id" % 2 === 0)
          .select(($"doc_id" + 100000).as("doc_id"), $"text"))
        .unionAll(d.where($"doc_id" % 6 === 0)
          .select(($"doc_id" + 200000).as("doc_id"), $"text"))
        .withColumn("_t", Normalizers.normalizeString($"text"))
      Dedup.exactClusters(expanded, "doc_id", "_t")
        .select($"cluster_id", $"cluster_size").distinct()
        .groupBy($"cluster_size").agg(count(lit(1)).as("n_clusters"))
    },

    "dedup_minhash_pairs" -> { (s, dir) =>
      val cfg = DedupConfig(exactVerify = true)
      val sigs = Dedup.signatures(t(s, dir, "documents"), "doc_id", "text", cfg)
      Dedup.verifyPairs(Dedup.lshCandidates(sigs, cfg), sigs, cfg)
        .select($"id1", $"id2", round($"sim", 6).as("jaccard"))
    },

    "dedup_minhash_clusters" -> { (s, dir) =>
      Dedup.nearDupClusters(t(s, dir, "documents"), "doc_id", "text",
          DedupConfig(exactVerify = true))
        .select($"doc_id".cast("long").as("doc_id"), $"cluster_id", $"cluster_size")
    },

    "dedup_incremental" -> { (s, dir) =>
      // incremental maintenance: cluster the even half, then merge the
      // odd half as a crawl batch WITHOUT recomputing even-even pairs —
      // the oracle is the full-corpus recursive-CTE clustering, so the
      // gate proves incremental == full recompute
      val cfg = DedupConfig(exactVerify = true)
      val docs = t(s, dir, "documents").select($"doc_id", $"text")
      val base = Dedup.clusterState(docs.where($"doc_id" % 2 === 0), "doc_id", "text", cfg)
      val merged = Dedup.addBatch(base, docs.where($"doc_id" % 2 =!= 0), "doc_id", "text", cfg)
      // eager checkpoint so the chain's persisted signatures can be
      // freed before the frame is handed to the (lazy) consumer
      val out = Dedup.stateClusters(merged)
        .select($"id".as("doc_id"), $"cluster_id", $"cluster_size")
        .localCheckpoint(true)
      base.release(); merged.release()
      out
    },

    "dedup_decontaminate" -> { (s, dir) =>
      // benchmark decontamination: the reference set is every 5th doc
      // with one appended token (jaccard ~ S/(S+5): above threshold for
      // all but the shortest docs — exact verify on both engines makes
      // any outcome comparable); output = the surviving corpus ids
      val d = t(s, dir, "documents").select($"doc_id", $"text")
      val ref = d.where($"doc_id" % 5 === 0)
        .select(($"doc_id" + 1000000).as("ref_id"),
          concat($"text", lit(" evaltag")).as("text"))
      Dedup.decontaminate(d, "doc_id", "text", ref, "ref_id", "text",
          DedupConfig(exactVerify = true))
        .select($"doc_id".cast("long").as("doc_id"))
    },

    "decon_ngram" -> { (s, dir) =>
      // GPT-3-style exact n-gram decontamination report: the eval set
      // is a 12-word snippet lifted from every doc_id%7==3 doc (words
      // 3..14 of the normalized text), so each eval doc shares its
      // interior 6-grams with its source page (and with any page whose
      // text repeats those runs) while whole-document jaccard stays far
      // below any dedup threshold — the embedded-contamination case
      // exact n-gram collision exists for
      val d = t(s, dir, "documents").select($"doc_id", $"text")
      val toks = split(Normalizers.normalizeString($"text"), " ")
      val ref = d.where($"doc_id" % 7 === 3)
        .select(($"doc_id" + 500000).as("ref_id"),
          array_join(slice(toks, 3, 12), " ").as("text"))
      Dedup.ngramContamination(d, "doc_id", "text", ref, "ref_id", "text", n = 6)
    },

    "dedup_canonical" -> { (s, dir) =>
      // the deduplicated-corpus projection: one survivor per near-dup
      // cluster, longest text wins, ties to the lowest doc_id
      val clustered = Dedup.nearDupClusters(t(s, dir, "documents"), "doc_id", "text",
          DedupConfig(exactVerify = true))
      Dedup.canonicalDocs(clustered, "doc_id", length($"text"))
        .select($"doc_id".cast("long").as("doc_id"), $"cluster_id", $"cluster_size",
          length($"text").cast("long").as("text_len"))
    },

    "dedup_url" -> { (s, dir) =>
      // URL-level exact dedup: a messy raw variant (tracking params,
      // WWW host label, default port, trailing slash, fragment) and its
      // clean form cluster together under normalize_url
      val d = t(s, dir, "documents").select($"doc_id")
      val canon = concat(lit("http://site"), ($"doc_id" % 7).cast("string"),
        lit(".com/p/"), $"doc_id".cast("string"))
      val messy = concat(lit("HTTP://WWW.Site"), ($"doc_id" % 7).cast("string"),
        lit(".COM:80/p/"), $"doc_id".cast("string"), lit("/?utm_campaign=x#top"))
      val pages = d.select(($"doc_id" * 2).as("page_id"), canon.as("url"))
        .unionAll(d.select(($"doc_id" * 2 + 1).as("page_id"), messy.as("url")))
      Dedup.exactClusters(pages.withColumn("_u", Normalizers.normalizeUrl($"url")),
          "page_id", "_u")
        .select($"page_id".cast("long").as("page_id"), $"cluster_id", $"cluster_size")
    },

    "web_new_urls" -> { (s, dir) =>
      // crawl-frontier filter: the base corpus holds every canonical
      // url; the batch carries, per doc, a MESSY variant of the seen
      // url (normalize-identical -> dropped) and a genuinely new path
      // (kept). Survivors = exactly the new rows.
      val d = t(s, dir, "documents").select($"doc_id")
      val canon = concat(lit("http://site"), ($"doc_id" % 7).cast("string"),
        lit(".com/p/"), $"doc_id".cast("string"))
      val messy = concat(lit("HTTP://WWW.Site"), ($"doc_id" % 7).cast("string"),
        lit(".COM:80/p/"), $"doc_id".cast("string"), lit("/?utm_campaign=x#top"))
      val fresh = concat(lit("http://site"), ($"doc_id" % 7).cast("string"),
        lit(".com/new/"), $"doc_id".cast("string"))
      val base = d.select($"doc_id".as("page_id"), canon.as("url"))
      val batch = d.select(($"doc_id" * 2).as("page_id"), messy.as("url"))
        .unionAll(d.select(($"doc_id" * 2 + 1).as("page_id"), fresh.as("url")))
      Dedup.newUrls(batch, base, "url")
        .select($"page_id".cast("long").as("page_id"), $"url")
    },

    "web_new_urls_bloom" -> { (s, dir) =>
      // the bloom-pruned scale path of the frontier filter — EXACT
      // semantics (bloom prunes, anti-join decides), so the oracle is
      // the same closed-form as web_new_urls; same fixture
      val d = t(s, dir, "documents").select($"doc_id")
      val canon = concat(lit("http://site"), ($"doc_id" % 7).cast("string"),
        lit(".com/p/"), $"doc_id".cast("string"))
      val messy = concat(lit("HTTP://WWW.Site"), ($"doc_id" % 7).cast("string"),
        lit(".COM:80/p/"), $"doc_id".cast("string"), lit("/?utm_campaign=x#top"))
      val fresh = concat(lit("http://site"), ($"doc_id" % 7).cast("string"),
        lit(".com/new/"), $"doc_id".cast("string"))
      val base = d.select($"doc_id".as("page_id"), canon.as("url"))
      val batch = d.select(($"doc_id" * 2).as("page_id"), messy.as("url"))
        .unionAll(d.select(($"doc_id" * 2 + 1).as("page_id"), fresh.as("url")))
      val bloom = graft.web.Frontier.urlBloom(base, "url", expectedItems = 10000)
      graft.web.Frontier.newUrlsBloom(batch, base, "url", bloom)
        .select($"page_id".cast("long").as("page_id"), $"url")
    },

    "web_mix_report" -> { (s, dir) =>
      // corpus mixture report per (source, lang) — docs/tokens/chars
      // and each measure's corpus share, straight off the documents
      // table's real source and lang columns
      graft.web.DomainStats.mixReport(
        t(s, dir, "documents"), "text", Seq("source", "lang"))
    },

    "dedup_threshold_sweep" -> { (s, dir) =>
      Dedup.thresholdSweep(t(s, dir, "documents"), "doc_id", "text", n = 5)
    },

    "dedup_containment" -> { (s, dir) =>
      // embedded-snippet detection: docs +300000 are the first 12 words
      // of each %9 doc — containment 1.0 (every snippet shingle is in
      // the parent) while whole-doc jaccard dilutes to ~8/|parent|;
      // the oracle recomputes containment relationally over the same
      // expansion, so natural corpus pairs >= 0.9 are covered too
      val d = t(s, dir, "documents")
      val snippet = d.where($"doc_id" % 9 === 0)
        .select(($"doc_id" + 300000).as("doc_id"),
          array_join(slice(split($"text", " "), 1, 12), " ").as("text"))
      Dedup.containmentPairs(
          d.select($"doc_id", $"text").unionAll(snippet),
          "doc_id", "text", n = 5, threshold = 0.9)
        .select($"id1", $"id2")
    },

    "web_domain_report" -> { (s, dir) =>
      // per-domain dup-rate report: each doc contributes a canonical
      // and a messy variant of the same URL (normalize-identical, so
      // they share a cluster); hosts partition by doc_id % 7 -> every
      // domain has dup_fraction exactly 0.5 and a closed-form page
      // count + mean text length
      val d = t(s, dir, "documents")
      val canon = concat(lit("http://site"), ($"doc_id" % 7).cast("string"),
        lit(".com/p/"), $"doc_id".cast("string"))
      val messy = concat(lit("HTTP://WWW.Site"), ($"doc_id" % 7).cast("string"),
        lit(".COM:80/p/"), $"doc_id".cast("string"), lit("/?utm_campaign=x#top"))
      val pages = d.select(($"doc_id" * 2).as("page_id"), canon.as("url"), $"text")
        .unionAll(d.select(($"doc_id" * 2 + 1).as("page_id"), messy.as("url"), $"text"))
      val clustered = Dedup.exactClusters(
        pages.withColumn("_u", Normalizers.normalizeUrl($"url")), "page_id", "_u")
      graft.web.DomainStats.report(clustered)
    },

    "web_sample_temperature" -> { (s, dir) =>
      // temperature sampling of a head-heavy corpus: domains sized
      // 4:2:1:1 (doc_id % 8 buckets), tau = 0.5 flattens the head —
      // the two tail domains keep rate 1, the mid sqrt(1/2), the head
      // sqrt(tail/head). The accept test is the cross-engine hash
      // residue (Sampling.hashResidue), so the oracle reproduces the
      // exact surviving row set, not just its size.
      val d = t(s, dir, "documents")
      val k = when($"doc_id" % 8 < 4, 0).when($"doc_id" % 8 < 6, 1)
        .when($"doc_id" % 8 < 7, 2).otherwise(3)
      val pages = d.select($"doc_id".as("page_id"),
        concat(lit("site"), k.cast("string"), lit(".com")).as("domain"))
      val counts = pages.groupBy($"domain").agg(count(lit(1)).as("pages"))
      val rates = graft.web.Sampling.temperatureRates(counts, tau = 0.5)
      graft.web.Sampling.sampleByRates(pages, "page_id", "domain", rates)
    },

    "web_split_clusters" -> { (s, dir) =>
      // leakage-free 20% held-out split of the exact-dup-expanded
      // corpus: the split unit is the CLUSTER (hash residue of
      // cluster_id), so a doc and its planted copies always land on
      // the same side — eval never sees a near-copy of a training doc
      val d = t(s, dir, "documents")
      val expanded = d.select($"doc_id", $"text")
        .unionAll(d.where($"doc_id" % 2 === 0)
          .select(($"doc_id" + 100000).as("doc_id"), $"text"))
        .unionAll(d.where($"doc_id" % 6 === 0)
          .select(($"doc_id" + 200000).as("doc_id"), $"text"))
        .withColumn("_t", Normalizers.normalizeString($"text"))
      val clustered = Dedup.exactClusters(expanded, "doc_id", "_t")
      graft.web.Sampling.splitByCluster(clustered, "cluster_id", heldOutFrac = 0.2)
        .select($"doc_id".cast("long").as("doc_id"), $"cluster_id", $"split")
    },

    "dedup_lines" -> { (s, dir) =>
      // corpus-level line dedup (the C4/CCNet boilerplate pass): every
      // doc gets a shared NAV line and a footer shared by its mod-7
      // class; body lines are the corpus texts (near-dups, never exact)
      // — the NAV survives only in the lowest doc, each FOOTER k only
      // in its class's lowest doc, bodies everywhere
      val d = t(s, dir, "documents")
      val multi = d.select($"doc_id",
        concat(lit("NAV BOILERPLATE\n"), $"text",
          lit("\nFOOTER "), ($"doc_id" % 7).cast("string")).as("text"))
      graft.dedup.LineDedup.dedupLines(multi, "doc_id", "text")
    },

    "dedup_simhash" -> { (s, dir) =>
      // reversed-token copies: same token multiset => identical SimHash
      // (hamming 0) while the text differs; corpus near-dup members are
      // excluded because their hamming at radius 0 is data-dependent
      val clean = cleanDocs(t(s, dir, "documents"))
      val rev = clean.where($"doc_id" % 3 === 0)
        .select(($"doc_id" + 100000).as("doc_id"),
          array_join(reverse(graft.functions.ws_tokens(
            Normalizers.normalizeString($"text"))), " ").as("text"))
      val expanded = clean.select($"doc_id", $"text").unionAll(rev)
      Dedup.simhashClusters(expanded, "doc_id", "text", radius = 0)
        .select($"doc_id".cast("long").as("doc_id"), $"cluster_id", $"cluster_size")
    },

    "dedup_ngram_jaccard" -> { (s, dir) =>
      Dedup.ngramJaccardPairs(t(s, dir, "documents"), "doc_id", "text", 3, 0.5)
        .select($"id1", $"id2", round($"jaccard", 6).as("jaccard"))
    },

    "dedup_ngram_capped" -> { (s, dir) =>
      // stop-gram guard on: grams in >3 docs leave candidate generation
      // (615 hot grams at sf0.01) but the jaccard stays exact via the
      // hot-set correction; only boilerplate-only pairs drop
      Dedup.ngramJaccardPairs(t(s, dir, "documents"), "doc_id", "text", 3, 0.5,
          maxGramDf = 3)
        .select($"id1", $"id2", round($"jaccard", 6).as("jaccard"))
    },

    "dedup_shared_span" -> { (s, dir) =>
      val clean = cleanDocs(t(s, dir, "documents"))
      val normLen = length(Normalizers.normalizeString($"text"))
      val planted = clean.where($"doc_id" % 7 === 0 && normLen >= 160)
        .select(($"doc_id" + 100000).as("doc_id"),
          concat(lit("copy pad xx "), $"text", lit(" yy pad copy")).as("text"))
      val expanded = clean.select($"doc_id", $"text").unionAll(planted)
      Dedup.sharedSpanPairs(expanded, "doc_id", "text",
          k = 24, window = 8, minShared = 2, minSpan = 150)
        .where($"id1" < 100000 && $"id2" >= 100000)
        .select($"id1", $"id2")
    },

    "dedup_embedding" -> { (s, dir) =>
      val e = t(s, dir, "embeddings")
      val expanded = e.select($"vec_id", $"embedding")
        .unionAll(e.where($"vec_id" % 20 === 0)
          .select(($"vec_id" + 100000).as("vec_id"), $"embedding"))
      Embeddings.cosineDupPairs(expanded, "vec_id", "embedding", 0.99)
        .select($"id1", $"id2")
    },

    // --------------------------------------------------- similarity search

    "ann_topk" -> { (s, dir) =>
      val e = t(s, dir, "embeddings")
      val q = e.where($"vec_id" % 10 === 0)
      Embeddings.bruteForceTopK(e, q, "vec_id", "embedding", 5)
        .select($"query_id", $"neighbor_id", $"rank".cast("long").as("rk"))
    },

    "ann_lsh_top1" -> { (s, dir) =>
      val e = t(s, dir, "embeddings")
      val q = e.where($"vec_id" % 20 === 0)
        .select(($"vec_id" + 100000).as("vec_id"), $"embedding")
      Embeddings.lshTopK(e, q, "vec_id", "embedding", k = 1)
        .select($"query_id", $"neighbor_id")
    },

    "ann_ivf_top1" -> { (s, dir) =>
      // IVF tier through the PERSISTED index path: build once into a
      // warehouse (centroids + cid-partitioned cells), then probe.
      // Planted-duplicate truth: the query IS a corpus vector, so its
      // nearest centroid equals its twin's assigned cell and nprobe=1
      // already covers it (exact-cosine verify finds the twin).
      val e = t(s, dir, "embeddings")
      val q = e.where($"vec_id" % 20 === 0)
        .select(($"vec_id" + 100000).as("vec_id"), $"embedding")
      val wh = new graft.io.Warehouse(
        java.nio.file.Files.createTempDirectory("ivf").toString, s)
      graft.emb.IvfIndex.build(wh, e, "vec_id", "embedding",
        nlist = 16, iters = 3)
      graft.emb.IvfIndex.probe(wh, q, "vec_id", "embedding", k = 1, nprobe = 4)
        .select($"query_id", $"neighbor_id")
    },

    "decon_embedding" -> { (s, dir) =>
      // semantic decontamination: the reference set is 25 exact copies
      // of corpus embeddings (%20), so at threshold 0.99 exactly those
      // corpus docs are contaminated; the oracle recomputes the SAME
      // semantics by brute-force cosine (NOT plant bookkeeping), so
      // the LSH candidate recall and the threshold filter are both
      // cross-checked
      val e = t(s, dir, "embeddings")
      val ref = e.where($"vec_id" % 20 === 0)
        .select(($"vec_id" + 100000).as("vec_id"), $"embedding")
      Embeddings.embeddingDecontaminate(e, "vec_id", "embedding",
          ref, "vec_id", "embedding", 0.99)
        .select($"vec_id")
    },

    // ------------------------------------------------------ text analysis

    "text_stats" -> { (s, dir) =>
      val d = t(s, dir, "documents")
      val norm = Normalizers.normalizeString($"text")
      d.select($"doc_id",
        TextAnalysis.wsTokenCount(norm).cast("long").as("n_ws"),
        TextAnalysis.bpeTokenCount($"text").cast("long").as("n_bpe"),
        round(TextAnalysis.typeTokenRatio($"text"), 6).as("ttr"),
        round(TextAnalysis.stopwordRatio($"text"), 6).as("stop_ratio"),
        round(TextAnalysis.meanTokenLen($"text"), 6).as("mean_tok_len"),
        round(TextAnalysis.punctRatio($"text"), 6).as("punct_ratio"),
        round(TextAnalysis.qualityScore($"text"), 6).as("quality"))
    },

    "text_langid" -> { (s, dir) =>
      t(s, dir, "documents")
        .select($"doc_id", TextAnalysis.langId($"text").as("lang_pred"))
    },

    "text_repetition" -> { (s, dir) =>
      // within-document repetition signals (Gopher quality rules):
      // dup-line fraction over a constructed 3-line doc (body twice +
      // unique footer -> exactly 1/3), dup-bigram fraction over the
      // real corpus text
      val d = t(s, dir, "documents")
      val tripled = concat($"text", lit("\n"), $"text",
        lit("\nunique footer "), $"doc_id".cast("string"))
      d.select($"doc_id",
        round(TextAnalysis.dupLineFraction(tripled), 6).as("dup_line_frac"),
        round(TextAnalysis.dupNgramFraction($"text", 2), 6).as("dup_bigram_frac"))
    },

    "text_c4_filter" -> { (s, dir) =>
      // C4 §2.2 heuristic cleaning over a constructed multi-line page
      // (the corpus text has no newlines/punctuation): three punctuated
      // sentence lines — the third only when doc_id%3!=1, starving
      // those pages below the 3-sentence floor — plus a too-short
      // line, an unterminated line, a javascript line, and page-killer
      // lines ("{" markup when %5==0, lorem ipsum when %7==0)
      val d = t(s, dir, "documents")
      val toks = split($"text", " ")
      def sent(start: Int, len: Int, mark: String) =
        concat(array_join(slice(toks, start, len), " "), lit(mark))
      val page = concat_ws("\n",
        sent(1, 6, "."), sent(5, 6, "!"),
        lit("too short."),
        array_join(slice(toks, 2, 5), " "),
        lit("please enable javascript to continue viewing."),
        when($"doc_id" % 3 =!= 1, sent(3, 5, "?")),
        when($"doc_id" % 5 === 0, lit("broken { markup")),
        when($"doc_id" % 7 === 0, lit("see the classic Lorem Ipsum passage.")))
      TextAnalysis.c4Filter(d.select($"doc_id", page.as("text")), "text")
    },

    "text_entropy" -> { (s, dir) =>
      // char-entropy quality signal over the real corpus text plus a
      // degenerate stuck-key page (entropy exactly 0) and a two-char
      // alternation (exactly 1 bit)
      val d = t(s, dir, "documents")
      val probe = when($"doc_id" % 3 === 0, lit("aaaaaaaaaa"))
        .when($"doc_id" % 3 === 1, lit("ababababab"))
        .otherwise($"text")
      d.select($"doc_id",
        round(TextAnalysis.charEntropy($"text"), 6).as("ent_text"),
        round(TextAnalysis.charEntropy(probe), 6).as("ent_probe"))
    },

    "text_gopher" -> { (s, dir) =>
      // Gopher §A1.1 document rules over a constructed multi-line page
      // exercising every rule: bullet lines (%4), an ellipsis line
      // (%5), symbol tokens (%6), non-alphabetic words (%3), a
      // stopword-rich line (%2). Emits every signal plus the composite
      // keep flag so the oracle cross-checks each rule, not just the
      // conjunction.
      val d = t(s, dir, "documents")
      val toks = split($"text", " ")
      def words(start: Int, len: Int) = array_join(slice(toks, start, len), " ")
      val page = concat_ws("\n",
        words(1, 12),
        when($"doc_id" % 4 === 0, concat(lit("• "), words(2, 4))),
        when($"doc_id" % 4 === 0, lit("- a bullet item")),
        when($"doc_id" % 5 === 0, concat(words(3, 5), lit("..."))),
        when($"doc_id" % 6 === 0, lit("# # # # # #")),
        when($"doc_id" % 3 === 0, lit("111 222 333 444")),
        when($"doc_id" % 2 === 0,
          lit("the study went on with that to be of use and have more")),
        words(6, 10))
      d.select($"doc_id",
        TextAnalysis.wsTokenCount(Normalizers.normalizeString(page))
          .cast("long").as("n_words"),
        round(TextAnalysis.meanTokenLen(page), 6).as("mean_word_len"),
        round(TextAnalysis.hashWordRatio(page), 6).as("hash_ratio"),
        round(TextAnalysis.ellipsisWordRatio(page), 6).as("ellipsis_sym_ratio"),
        round(TextAnalysis.bulletLineFraction(page), 6).as("bullet_frac"),
        round(TextAnalysis.ellipsisLineFraction(page), 6).as("ellipsis_frac"),
        round(TextAnalysis.alphaWordFraction(page), 6).as("alpha_frac"),
        TextAnalysis.gopherStopHits(page).cast("long").as("stop_hits"),
        TextAnalysis.gopherKeep(page, minWords = 20).as("keep"))
    },

    // ---------------------------------------------------------- matching

    "match_best" -> { (s, dir) =>
      val c = t(s, dir, "customer")
      val s1 = c.select($"c_custkey".cast("long").as("k1"),
        $"c_name".as("name1"), $"c_acctbal".as("bal1"))
      val s2 = c.select($"c_custkey".cast("long").as("k2"),
        concat(substring($"c_name", 1, 2), substring($"c_name", 4, 100)).as("name2"),
        $"c_acctbal".as("bal2"))
      val mapping = Seq(MatchColumn("name1", "name2", "levenshtein", 0.7),
        MatchColumn("bal1", "bal2", "numeric", 0.3))
      Matching.matchTables(s1, s2, "k1", "k2", mapping,
          MatchOptions(threshold = 0.75, undecidedRange = 0.05))
        .select($"k1", $"k2",
          round($"score_name1", 6).as("score_name"),
          round($"score_bal1", 6).as("score_bal"),
          round($"overall_score", 6).as("overall_score"),
          $"match_result")
    },

    "match_return_all" -> { (s, dir) =>
      val c = t(s, dir, "customer")
      val s1 = c.select($"c_custkey".cast("long").as("k1"),
        $"c_name".as("name1"), $"c_acctbal".as("bal1"))
      val s2 = c.select($"c_custkey".cast("long").as("k2"),
        concat(substring($"c_name", 1, 2), substring($"c_name", 4, 100)).as("name2"),
        $"c_acctbal".as("bal2"))
      val mapping = Seq(MatchColumn("name1", "name2", "levenshtein", 0.7),
        MatchColumn("bal1", "bal2", "numeric", 0.3))
      Matching.matchTables(s1, s2, "k1", "k2", mapping,
          MatchOptions(threshold = 0.93, undecidedRange = 0.02, returnAllMatches = true))
        .select($"k1", $"k2",
          round($"score_name1", 6).as("score_name"),
          round($"score_bal1", 6).as("score_bal"),
          round($"overall_score", 6).as("overall_score"),
          $"match_result")
    },

    "match_zero_key" -> { (s, dir) =>
      // probe names are reversed: every blocking key (group-tagged) is
      // disjoint from the master side, so matches ONLY surface through
      // the reference's zero-key cartesian fallback (matcher.py:739-743)
      val c = t(s, dir, "customer")
      val s1 = c.where($"c_custkey" % 50 === 0)
        .select($"c_custkey".cast("long").as("k1"),
          reverse($"c_name").as("name1"))
      val s2 = c.select($"c_custkey".cast("long").as("k2"), $"c_name".as("name2"))
      val mapping = Seq(MatchColumn("name1", "name2", "levenshtein", 1.0))
      Matching.matchTables(s1, s2, "k1", "k2", mapping,
          MatchOptions(threshold = 0.5, undecidedRange = 0.05))
        .select($"k1", $"k2", round($"overall_score", 6).as("overall_score"))
    },

    "match_distribution" -> { (s, dir) =>
      // accept/undecided/reject counts over the best-match output — the
      // summary surface the reference CLI prints (main.py:284-285)
      val c = t(s, dir, "customer")
      val s1 = c.select($"c_custkey".cast("long").as("k1"),
        $"c_name".as("name1"), $"c_acctbal".as("bal1"))
      val s2 = c.select($"c_custkey".cast("long").as("k2"),
        concat(substring($"c_name", 1, 2), substring($"c_name", 4, 100)).as("name2"),
        $"c_acctbal".as("bal2"))
      val mapping = Seq(MatchColumn("name1", "name2", "levenshtein", 0.7),
        MatchColumn("bal1", "bal2", "numeric", 0.3))
      Matching.matchDistribution(
        Matching.matchTables(s1, s2, "k1", "k2", mapping,
          MatchOptions(threshold = 0.75, undecidedRange = 0.05)))
    },

    "match_capped" -> { (s, dir) =>
      // candidate cap with the `fallback` priority ladder
      // (matcher.py:785-855): 4-digit zero-padded keys make every
      // first_char block the whole table (cap always trips) while the
      // highest-priority surviving group (3gram = same leading decade)
      // stays under the cap, so the ladder keeps exactly that group
      val c = t(s, dir, "customer")
      val side = c.select($"c_custkey".cast("long").as("k"),
        lpad($"c_custkey".cast("string"), 4, "0").as("n"))
      val mapping = Seq(MatchColumn("n", "n", "levenshtein", 1.0))
      Matching.candidates(
          side.withColumnRenamed("k", "k1"), side.withColumnRenamed("k", "k2"),
          "k1", "k2", mapping,
          MatchOptions(blockingStrategies = Seq("three_gram", "last_three", "first_char"),
            maxCandidates = 100, candidateTrimStrategy = "fallback",
            cartesianFallbackLimit = 0))
        .select($"k1", $"k2")
    },

    "search_topk" -> { (s, dir) =>
      Matching.search(t(s, dir, "customer"), "c_custkey",
          Seq(Matching.SearchField("c_name", "Customer#000000777", "levenshtein", 1.0)),
          threshold = 0.8, maxResults = 10)
        .select($"c_custkey".cast("long").as("c_custkey"),
          round($"overall_score", 6).as("overall_score"))
    },

    // --------------------------------------------------- scalar kernels

    "sim_kernels" -> { (s, dir) =>
      val c = t(s, dir, "customer")
      val name2 = concat(substring($"c_name", 1, 2), substring($"c_name", 4, 100))
      val d1 = lit("2020-03-15")
      val d2 = concat(lit("2020-0"), ($"c_custkey" % 9 + 1).cast("string"),
        lit("-2"), ($"c_custkey" % 8).cast("string"))
      c.select($"c_custkey".cast("long").as("c_custkey"),
        round(graft.functions.levenshtein_sim(lower($"c_name"), lower(name2)), 6).as("lev"),
        round(graft.functions.jaro_winkler_sim(lower($"c_name"), lower(name2)), 6).as("jw"),
        round(graft.functions.numeric_sim($"c_acctbal", $"c_acctbal" * 2), 6).as("num"),
        round(graft.functions.date_sim(d1, d2), 6).as("dsim"))
    },

    // ------------------------------------------------------- normalizers

    "norm_compat" -> { (s, dir) =>
      val c = t(s, dir, "customer")
      val k = $"c_custkey"
      val rawName = when(k % 3 === 0, "Dr Bob Smith Jr")
        .when(k % 3 === 1, "Mrs Peggy Taylor")
        .otherwise("bill gates iii")
      c.select(k.cast("long").as("c_custkey"),
        Normalizers.normalizePhone(concat(lit("1"), lpad(k.cast("string"), 10, "0")))
          .as("norm_phone"),
        Normalizers.normalizeEmail(concat(lit("  User"), k, lit("@Example.COM  ")))
          .as("norm_email"),
        Normalizers.normalizeAddress(concat(k, lit(" Main St Apt 5, Springfield")))
          .as("norm_addr"),
        Normalizers.normalizeName(rawName).as("norm_name"))
    },

    "norm_url" -> { (s, dir) =>
      // deterministic messy-URL fixture exercising every normalize_url
      // rule: host/scheme case, www label, scheme-default ports,
      // tracking-param removal, param sorting, trailing slash, fragment
      val d = t(s, dir, "documents").select($"doc_id")
      val raw = concat(
        when($"doc_id" % 3 === 0, lit("HTTP://WWW.Example")).otherwise(lit("https://News.Site")),
        ($"doc_id" % 7).cast("string"), lit(".COM"),
        when($"doc_id" % 3 === 0, lit(":80"))
          .when($"doc_id" % 3 === 1, lit(":443")).otherwise(lit("")),
        lit("/Articles/"), $"doc_id".cast("string"),
        when($"doc_id" % 2 === 0, lit("/")).otherwise(lit("")),
        lit("?z=9&utm_source=feed&a="), ($"doc_id" % 5).cast("string"),
        lit("&fbclid=XYZ#Section-2"))
      d.select($"doc_id", raw.as("url_raw"), Normalizers.normalizeUrl(raw).as("url_norm"))
    },

    "norm_redact" -> { (s, dir) =>
      // PII redaction over planted entities (the corpus text has none):
      // an email, an IPv4 and a phone, all derived from doc_id so both
      // engines construct the identical input
      val d = t(s, dir, "documents")
      val planted = concat($"text",
        lit(" contact user"), $"doc_id".cast("string"), lit("@example.com"),
        lit(" from 10."), ($"doc_id" % 256).cast("string"),
        lit(".0."), ($"doc_id" % 100).cast("string"),
        lit(" call +1 (555) 0"), lpad(($"doc_id" % 1000).cast("string"), 3, "0"),
        lit("-"), lpad(($"doc_id" % 10000).cast("string"), 4, "0"))
      d.select($"doc_id", graft.norm.Redact.redactPii(planted).as("text_redacted"))
    },

    // -------------------------------------------------------- multimodal

    "mm_decode" -> { (s, dir) =>
      val assets = Multimodal.asAssets(t(s, dir, "documents"), "doc_id", "text")
      val meta = Multimodal.fakeDecodeMeta($"asset_id", $"payload")
      assets.select($"asset_id", meta.as("m"))
        .select($"asset_id",
          $"m.n_bytes".as("n_bytes"),
          $"m.width".cast("long").as("width"),
          $"m.height".cast("long").as("height"),
          $"m.channels".cast("long").as("channels"),
          $"m.n_frames".cast("long").as("n_frames"),
          Multimodal.resizeDims($"m", 32).getField("width").cast("long").as("rw"),
          Multimodal.resizeDims($"m", 32).getField("height").cast("long").as("rh"),
          size(Multimodal.frameSampleIdx($"m", 3)).cast("long").as("n_sampled"))
    },

    // ------------------------------------------- relational compat (TPC-H)

    "q_lineitem_agg" -> { (s, dir) =>
      // rounding-proof money contract: cast the raw DOUBLE to
      // decimal(18,2) FIRST (both engines round the ~1e-13 binary
      // representation error identically at 2 decimals), then scale by
      // 100 exactly in decimal — no round() over a double product,
      // whose half-even/half-up drift diverged between engines in r1
      t(s, dir, "lineitem")
        .groupBy($"l_returnflag", $"l_linestatus")
        .agg(
          sum($"l_quantity".cast("long")).as("sum_qty"),
          count(lit(1)).as("n_rows"),
          sum(($"l_extendedprice".cast("decimal(18,2)") * 100).cast("long")).as("price_cents"),
          sum(($"l_discount".cast("decimal(18,2)") * 100).cast("long")).as("disc_pct_sum"))
    },

    "q_orders_best" -> { (s, dir) =>
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy($"o_custkey").orderBy($"o_totalprice".desc, $"o_orderkey".asc)
      t(s, dir, "orders")
        .withColumn("rn", row_number().over(w))
        .where($"rn" === 1)
        .select($"o_custkey", $"o_orderkey", $"o_totalprice")
    },

    "q_topk_join" -> { (s, dir) =>
      val o = t(s, dir, "orders")
      val c = t(s, dir, "customer")
      o.join(broadcast(c), $"o_custkey" === $"c_custkey")
        .select($"o_orderkey", $"c_name", $"o_totalprice")
        .orderBy($"o_totalprice".desc, $"o_orderkey".asc)
        .limit(10)
    },

    "q_events_stats" -> { (s, dir) =>
      t(s, dir, "events")
        .groupBy($"user_id", $"event_type")
        .agg(count(lit(1)).as("n"),
          countDistinct($"event_id").as("n_events"),
          max($"value").as("max_value"),
          unix_timestamp(min($"ts")).as("first_ts"))
    },

    "cluster_dense_ids" -> { (s, dir) =>
      // reference-compat dense renumbering of cluster ids (SURVEY §2.4;
      // clusterer.py:778-784) — dense_rank over the min-member key
      val d = t(s, dir, "documents")
      val expanded = d.select($"doc_id", $"text")
        .unionAll(d.where($"doc_id" % 2 === 0)
          .select(($"doc_id" + 100000).as("doc_id"), $"text"))
        .withColumn("_t", Normalizers.normalizeString($"text"))
      val clusters = Dedup.exactClusters(expanded, "doc_id", "_t")
      // scale-safe dense renumber: range-partitioned numbering over the
      // distinct cluster-id table — no global un-partitioned window
      val mapping = graft.dedup.ConnectedComponents.denseIds(clusters.select($"cluster_id"))
      clusters.join(mapping, "cluster_id")
        .select($"doc_id".cast("long").as("doc_id"), $"dense_id".cast("long").as("dense_id"))
    },

    "cluster_summary_report" -> { (s, dir) =>
      val d = t(s, dir, "documents")
      val expanded = d.select($"doc_id", $"text")
        .unionAll(d.where($"doc_id" % 2 === 0)
          .select(($"doc_id" + 100000).as("doc_id"), $"text"))
        .withColumn("_t", Normalizers.normalizeString($"text"))
      graft.io.Sources.clusterSummary(Dedup.exactClusters(expanded, "doc_id", "_t"))
    },

    "match_auto" -> { (s, dir) =>
      // auto-analyzed mapping: same-named columns pair up; types detect
      // as string_name (JW) and numeric (ratio) — column_analyzer.py path
      val c = t(s, dir, "customer")
      val s1 = c.select($"c_custkey".cast("long").as("k1"), $"c_name", $"c_acctbal")
      val s2 = c.select($"c_custkey".cast("long").as("k2"),
        concat(substring($"c_name", 1, 2), substring($"c_name", 4, 100)).as("c_name"),
        ($"c_acctbal" * 2).as("c_acctbal"))
      val mapping = graft.analyze.ColumnAnalyzer.analyzeColumns(
        s1.drop("k1"), s2.drop("k2"))
      Matching.matchTables(s1, s2, "k1", "k2", mapping,
          MatchOptions(threshold = 0.9, undecidedRange = 0.02))
        .select($"k1", $"k2", round($"overall_score", 6).as("overall_score"), $"match_result")
    },

    "ann_lsh_recall" -> { (s, dir) =>
      // recall@10 of the LSH index vs the exact baseline — the quality
      // metric an ANN index ships with. Fully oracled: the seeded
      // hyperplanes are part of the index config (data, like the
      // MinHash family), so the oracle SQL inlines them as DOUBLE[]
      // literals and DuckDB recomputes the ENTIRE pipeline —
      // signatures, band values, Hamming-1 multi-probe, candidate
      // join, exact-cosine top-10, overlap with brute-force top-10.
      val e = t(s, dir, "embeddings")
      val q = e.where($"vec_id" % 10 === 0)
      val bf = Embeddings.bruteForceTopK(e, q, "vec_id", "embedding", 10)
        .select($"query_id", $"neighbor_id")
      val lsh = Embeddings.lshTopK(e, q, "vec_id", "embedding", 10)
        .select($"query_id".as("q2"), $"neighbor_id".as("n2"))
      val hits = bf.join(lsh, $"query_id" === $"q2" && $"neighbor_id" === $"n2", "left_semi")
      bf.agg(count(lit(1)).as("exact_pairs"))
        .crossJoin(hits.agg(count(lit(1)).as("found_pairs")))
        .select(lit(10).as("k"), $"exact_pairs", $"found_pairs",
          round($"found_pairs".cast("double") / $"exact_pairs", 4).as("recall_at_k"))
    },

    "dedup_simhash_pairs_r3" -> { (s, dir) =>
      // radius-3 pigeonhole recall on planted hamming-0 pairs (reversed
      // token order = same multiset = same SimHash): every planted pair
      // must survive the 4-block join at r=3. Data-dependent pairs
      // between corpus docs are filtered out of the contract (their
      // hamming is not SQL-predictable); the full r>0 semantics are
      // pinned against a brute-force all-pairs oracle in DedupSpec.
      val clean = cleanDocs(t(s, dir, "documents"))
      val rev = clean.where($"doc_id" % 4 === 0)
        .select(($"doc_id" + 100000).as("doc_id"),
          array_join(reverse(graft.functions.ws_tokens(
            Normalizers.normalizeString($"text"))), " ").as("text"))
      val expanded = clean.select($"doc_id", $"text").unionAll(rev)
      val sigs = Dedup.signatures(expanded, "doc_id", "text")
      Dedup.simhashPairs(sigs, radius = 3)
        .where($"id2" === $"id1" + 100000)
        .select($"id1", $"id2", $"hamming")
    },

    "sim_token_ratios" -> { (s, dir) =>
      // planted 3-case fixture with hand-derived rapidfuzz goldens
      // (indel ratio = 2*LCS/(|a|+|b|)):
      //  k%3=0: permuted same token set -> tsort=tset=1.0
      //  k%3=1: "a b" vs "b c" -> tsort: LCS("a b","b c")=1 -> 2/6;
      //         tset: sect="b", sectAB="b a", sectBA="b c",
      //         max(indel("b a","b c")=4/6, indel("b","b a")=2/4) = 2/3
      //  k%3=2: one side empty -> 0.0
      val c = t(s, dir, "customer")
      val k = $"c_custkey"
      val a = when(k % 3 === 0, "alpha beta gamma").when(k % 3 === 1, "a b").otherwise("")
      val b = when(k % 3 === 0, "gamma alpha beta").when(k % 3 === 1, "b c").otherwise("x")
      c.select(k.cast("long").as("c_custkey"),
        round(graft.functions.token_set_ratio(lower(a), lower(b)), 6).as("tset"),
        round(graft.functions.token_sort_ratio(lower(a), lower(b)), 6).as("tsort"))
    },

    // ----------------------------------- rows-only checks (no SQL oracle)

    "dedup_band_stats" -> { (s, dir) =>
      Dedup.bandBucketStats(Dedup.signatures(t(s, dir, "documents"), "doc_id", "text"))
    },

    "doc_fingerprints" -> { (s, dir) =>
      t(s, dir, "documents").select($"doc_id",
        size(graft.functions.winnow_fingerprint(
          Normalizers.normalizeString($"text"), 24, 8)).as("n_fingerprints"))
    },

    // --------------------------- oracled variants of the two above:
    // the default-config surfaces stay rows-only (their hash families
    // are not DuckDB-expressible), but each kernel gets a full
    // cross-engine oracle in a regime where the output is
    // engine-independent.

    "doc_fingerprints_w1" -> { (s, dir) =>
      // window=1 winnowing degenerates to the DISTINCT k-gram hash
      // set (every 1-wide window selects its own gram), so the count
      // is engine-independent: DuckDB recounts distinct 24-char
      // substrings of the same normalized text. Pins the kernel's
      // code-point gram walk, rolling-hash dedup and the n<k / n==0
      // degenerate branches cross-engine; window SELECTION stays
      // pinned by the oracled dedup_shared_span and the SIGMOD'03
      // goldens in SimKernelsSpec.
      t(s, dir, "documents").select($"doc_id",
        size(graft.functions.winnow_fingerprint(
          Normalizers.normalizeString($"text"), 24, 1)).as("n_grams"))
    },

    "dedup_band_stats_planted" -> { (s, dir) =>
      // fixture: 40 groups of BYTE-IDENTICAL texts with group-disjoint
      // token vocabularies ("g<g>t<j>" tokens — equality of two tokens
      // forces equal group digits), so every band bucket IS a group
      // (disjoint shingle sets share a bucket only through a 64-bit
      // band-hash collision) and the whole stats surface — buckets,
      // largest bucket, candidate pairs, per band — is engine-
      // independent arithmetic over the group sizes.
      val g = ($"doc_id" % 40).cast("string")
      val text = concat_ws(" ", (0 until 12).map(j =>
        concat(lit("g"), g, lit(s"t$j"))): _*)
      val fixture = t(s, dir, "documents").select($"doc_id", text.as("text"))
      Dedup.bandBucketStats(Dedup.signatures(fixture, "doc_id", "text"))
    }
  )

  // ------------------------------------------------------------------
  // oracles (DuckDB SQL over the same parquet tables)
  // ------------------------------------------------------------------

  private val exactExpansion =
    """x AS (
      |  SELECT doc_id, trim(regexp_replace(lower(text), '\s+', ' ', 'g')) AS t FROM documents
      |  UNION ALL SELECT doc_id+100000, trim(regexp_replace(lower(text), '\s+', ' ', 'g')) FROM documents WHERE doc_id%2=0
      |  UNION ALL SELECT doc_id+200000, trim(regexp_replace(lower(text), '\s+', ' ', 'g')) FROM documents WHERE doc_id%6=0
      |)""".stripMargin

  /** The LSH-recall oracle recomputes the WHOLE ANN pipeline in
    * DuckDB: the seeded hyperplanes are index CONFIG (deterministic
    * given (dim, bits, seed), like the MinHash family), so they inline
    * as DOUBLE[] literals and DuckDB independently derives signatures
    * (bit i = dot >= 0), band values, the Hamming-1 multi-probe
    * variants of each query band, the candidate join, the exact-cosine
    * top-10 and its overlap with the brute-force top-10. Only the
    * SIGNS of dot products and the top-10 ORDERING must agree across
    * engines — both robust to float fold-order (signs of Gaussian
    * dots are never within 1e-12 of zero; ordering robustness is the
    * same property the green `ann_topk` oracle already rests on).
    */
  private lazy val lshRecallOracle: String = {
    val bits = 18; val bands = 6; val width = bits / bands
    val planes = Embeddings.hyperplanes(64, bits, 42L)
    def planeLit(p: Array[Double]) = p.mkString("[", ",", "]::DOUBLE[]")
    val bandCols = (0 until bands).map { b =>
      val terms = (0 until width).map { j =>
        val i = b * width + j
        s"(CASE WHEN list_dot_product(embedding, ${planeLit(planes(i))}) >= 0" +
          s" THEN ${1L << j} ELSE 0 END)"
      }.mkString(" + ")
      s"$terms AS bv$b"
    }.mkString(",\n  ")
    val ceUnion = (0 until bands)
      .map(b => s"SELECT vec_id, $b AS band, bv$b AS bv FROM sig")
      .mkString("\n  UNION ALL ")
    s"""WITH sig AS (
       |  SELECT vec_id,
       |  $bandCols
       |  FROM embeddings
       |), ce AS (
       |  $ceUnion
       |), qe AS (
       |  SELECT ce.vec_id, ce.band, xor(ce.bv, f.flip) AS bv
       |  FROM ce, (VALUES (0), (1), (2), (4)) f(flip) WHERE ce.vec_id % 10 = 0
       |), cand AS (
       |  SELECT DISTINCT qe.vec_id AS query_id, ce.vec_id AS neighbor_id
       |  FROM qe JOIN ce ON qe.band = ce.band AND qe.bv = ce.bv
       |  WHERE qe.vec_id <> ce.vec_id
       |), lsh AS (
       |  SELECT query_id, neighbor_id FROM (
       |    SELECT cand.query_id, cand.neighbor_id,
       |      row_number() OVER (PARTITION BY cand.query_id
       |        ORDER BY list_cosine_similarity(q.embedding, c.embedding) DESC,
       |                 cand.neighbor_id) AS rk
       |    FROM cand JOIN embeddings q ON q.vec_id = cand.query_id
       |              JOIN embeddings c ON c.vec_id = cand.neighbor_id)
       |  WHERE rk <= 10
       |), brute AS (
       |  SELECT query_id, neighbor_id FROM (
       |    SELECT q.vec_id AS query_id, e.vec_id AS neighbor_id,
       |      row_number() OVER (PARTITION BY q.vec_id
       |        ORDER BY list_cosine_similarity(q.embedding, e.embedding) DESC,
       |                 e.vec_id) AS rk
       |    FROM embeddings q, embeddings e
       |    WHERE q.vec_id % 10 = 0 AND e.vec_id <> q.vec_id)
       |  WHERE rk <= 10
       |), hits AS (
       |  SELECT b.query_id, b.neighbor_id FROM brute b
       |  WHERE EXISTS (SELECT 1 FROM lsh l
       |    WHERE l.query_id = b.query_id AND l.neighbor_id = b.neighbor_id)
       |)
       |SELECT CAST(10 AS INTEGER) AS k,
       |  (SELECT count(*) FROM brute) AS exact_pairs,
       |  (SELECT count(*) FROM hits) AS found_pairs,
       |  round(CAST((SELECT count(*) FROM hits) AS DOUBLE)
       |        / (SELECT count(*) FROM brute), 4) AS recall_at_k""".stripMargin
  }

  private val matchScores =
    """s1 AS (SELECT c_custkey AS k1, lower(c_name) AS n1, c_acctbal AS b1 FROM customer),
      |s2 AS (SELECT c_custkey AS k2, lower(substr(c_name,1,2) || substr(c_name,4)) AS n2, c_acctbal AS b2 FROM customer),
      |sc AS (SELECT k1, k2,
      |  1.0 - levenshtein(n1, n2)*1.0/greatest(length(n1), length(n2)) AS s_name,
      |  CASE WHEN b1 = b2 THEN 1.0 ELSE 1.0 - abs(b1-b2)/greatest(abs(b1), abs(b2), 1.0) END AS s_bal
      |  FROM s1, s2),
      |ov AS (SELECT k1, k2, s_name, s_bal, (s_name*0.7 + s_bal*0.3)/(0.7+0.3) AS o FROM sc)""".stripMargin

  def oracleSql: Map[String, String] = Map(

    "dedup_exact" ->
      s"""WITH $exactExpansion
         |SELECT doc_id, min(doc_id) OVER (PARTITION BY t) AS cluster_id,
         |       count(*) OVER (PARTITION BY t) AS cluster_size
         |FROM x""".stripMargin,

    "dedup_exact_summary" ->
      s"""WITH $exactExpansion,
         |c AS (SELECT min(doc_id) AS cid, count(*) AS cluster_size FROM x GROUP BY t)
         |SELECT cluster_size, count(*) AS n_clusters FROM c GROUP BY 1""".stripMargin,

    "dedup_minhash_pairs" ->
      s"""WITH ${jaccardCtes(5)}
         |SELECT i AS id1, j AS id2, round(jac, 6) AS jaccard FROM pj WHERE jac >= 0.8""".stripMargin,

    "dedup_minhash_clusters" ->
      s"""WITH RECURSIVE ${jaccardCtes(5)},
         |pairs AS (SELECT i, j FROM pj WHERE jac >= 0.8),
         |edges AS (SELECT i AS a, j AS b FROM pairs UNION SELECT j, i FROM pairs),
         |reach AS (
         |  SELECT doc_id AS id, doc_id AS r FROM documents
         |  UNION
         |  SELECT e.b AS id, reach.r FROM reach JOIN edges e ON e.a = reach.id
         |)
         |SELECT id AS doc_id, min(r) AS cluster_id, count(*) AS cluster_size FROM reach GROUP BY id""".stripMargin,

    // incremental == full recompute: the oracle clusters the WHOLE
    // corpus in one pass, the Spark side does base-then-addBatch
    "dedup_incremental" ->
      s"""WITH RECURSIVE ${jaccardCtes(5)},
         |pairs AS (SELECT i, j FROM pj WHERE jac >= 0.8),
         |edges AS (SELECT i AS a, j AS b FROM pairs UNION SELECT j, i FROM pairs),
         |reach AS (
         |  SELECT doc_id AS id, doc_id AS r FROM documents
         |  UNION
         |  SELECT e.b AS id, reach.r FROM reach JOIN edges e ON e.a = reach.id
         |)
         |SELECT id AS doc_id, min(r) AS cluster_id, count(*) AS cluster_size FROM reach GROUP BY id""".stripMargin,

    // exact cross-corpus 5-shingle jaccard against the perturbed
    // reference set; survivors = docs with no reference match >= 0.8
    "dedup_decontaminate" ->
      """WITH t AS (SELECT doc_id AS id, string_split(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' ') AS ts FROM documents),
        |r AS (SELECT doc_id AS rid, string_split(trim(regexp_replace(lower(text || ' evaltag'), '\s+', ' ', 'g')), ' ') AS ts FROM documents WHERE doc_id%5=0),
        |g AS (SELECT id, unnest(list_distinct(list_transform(range(1, len(ts)-5+2), i -> array_to_string(ts[i:i+4], ' ')))) AS gr FROM t),
        |gr_ AS (SELECT rid, unnest(list_distinct(list_transform(range(1, len(ts)-5+2), i -> array_to_string(ts[i:i+4], ' ')))) AS gr FROM r),
        |sz AS (SELECT id, count(*) AS n FROM g GROUP BY 1),
        |szr AS (SELECT rid, count(*) AS n FROM gr_ GROUP BY 1),
        |inter AS (SELECT g.id, gr_.rid, count(*) AS c FROM g JOIN gr_ ON g.gr = gr_.gr GROUP BY 1, 2),
        |bad AS (SELECT DISTINCT inter.id AS id FROM inter
        |        JOIN sz ON sz.id = inter.id JOIN szr ON szr.rid = inter.rid
        |        WHERE c*1.0/(sz.n + szr.n - c) >= 0.8)
        |SELECT doc_id FROM documents WHERE doc_id NOT IN (SELECT id FROM bad)""".stripMargin,

    // exact word-6-gram collision counts against the snippet eval set;
    // the CASE mirrors word_shingles' short-doc fallback (a doc of <= n
    // words contributes its whole text as one shingle)
    "decon_ngram" ->
      """WITH t AS (SELECT doc_id AS id, string_split(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' ') AS ts FROM documents),
        |r AS (SELECT id + 500000 AS rid, ts[3:14] AS ts FROM t WHERE id % 7 = 3),
        |g AS (SELECT id, unnest(list_distinct(CASE WHEN len(ts) <= 6 THEN [array_to_string(ts, ' ')]
        |        ELSE list_transform(range(1, len(ts)-6+2), i -> array_to_string(ts[i:i+5], ' ')) END)) AS gr FROM t),
        |gr_ AS (SELECT rid, unnest(list_distinct(CASE WHEN len(ts) <= 6 THEN [array_to_string(ts, ' ')]
        |        ELSE list_transform(range(1, len(ts)-6+2), i -> array_to_string(ts[i:i+5], ' ')) END)) AS gr FROM r)
        |SELECT g.id AS doc_id, gr_.rid AS ref_id, count(*) AS shared_ngrams
        |FROM g JOIN gr_ ON g.gr = gr_.gr GROUP BY 1, 2""".stripMargin,

    // deduplicated-corpus projection: same recursive-CTE clustering,
    // survivor = longest text, ties to lowest doc_id
    "dedup_canonical" ->
      s"""WITH RECURSIVE ${jaccardCtes(5)},
         |pairs AS (SELECT i, j FROM pj WHERE jac >= 0.8),
         |edges AS (SELECT i AS a, j AS b FROM pairs UNION SELECT j, i FROM pairs),
         |reach AS (
         |  SELECT doc_id AS id, doc_id AS r FROM documents
         |  UNION
         |  SELECT e.b AS id, reach.r FROM reach JOIN edges e ON e.a = reach.id
         |),
         |cl AS (SELECT id AS doc_id, min(r) AS cluster_id, count(*) AS cluster_size FROM reach GROUP BY id)
         |SELECT cl.doc_id, cl.cluster_id, cl.cluster_size,
         |       CAST(length(d.text) AS BIGINT) AS text_len
         |FROM cl JOIN documents d ON d.doc_id = cl.doc_id
         |QUALIFY row_number() OVER (PARTITION BY cl.cluster_id ORDER BY length(d.text) DESC, cl.doc_id) = 1""".stripMargin,

    // closed-form expected output: each page's messy and clean URL
    // variants normalize to one key, so clusters are exactly the
    // (2*doc_id, 2*doc_id+1) pairs
    "dedup_url" ->
      """SELECT doc_id*2 AS page_id, doc_id*2 AS cluster_id, CAST(2 AS BIGINT) AS cluster_size FROM documents
        |UNION ALL
        |SELECT doc_id*2+1, doc_id*2, CAST(2 AS BIGINT) FROM documents""".stripMargin,

    "dedup_simhash" ->
      s"""WITH $dupIdsCtes,
         |base AS (SELECT doc_id FROM documents WHERE doc_id NOT IN (SELECT id FROM dup))
         |SELECT doc_id, doc_id AS cluster_id,
         |       CAST(CASE WHEN doc_id%3=0 THEN 2 ELSE 1 END AS BIGINT) AS cluster_size FROM base
         |UNION ALL
         |SELECT doc_id+100000, doc_id, CAST(2 AS BIGINT) FROM base WHERE doc_id%3=0""".stripMargin,

    "dedup_ngram_jaccard" ->
      s"""WITH ${jaccardCtes(3)}
         |SELECT i AS id1, j AS id2, round(jac, 6) AS jaccard FROM pj WHERE jac >= 0.5""".stripMargin,

    // DF-cap semantics in SQL: exact jaccard over ALL grams, pair kept
    // only when it shares >= 1 cold (df <= 3) gram
    "dedup_ngram_capped" ->
      s"""WITH $toksCte,
         |g AS (SELECT id, unnest(list_distinct(list_transform(range(1, len(ts)-3+2), i -> array_to_string(ts[i:i+2], ' ')))) AS gr FROM t),
         |sz AS (SELECT id, count(*) AS n FROM g GROUP BY 1),
         |gdf AS (SELECT gr, count(*) AS dfc FROM g GROUP BY 1),
         |inter AS (SELECT a.id AS i, b.id AS j, count(*) AS c,
         |                 sum(CASE WHEN gdf.dfc <= 3 THEN 1 ELSE 0 END) AS cold
         |          FROM g a JOIN g b ON a.gr = b.gr AND a.id < b.id
         |          JOIN gdf ON gdf.gr = a.gr GROUP BY 1, 2),
         |pj AS (SELECT i, j, c*1.0/(sa.n + sb.n - c) AS jac, cold
         |       FROM inter JOIN sz sa ON i = sa.id JOIN sz sb ON j = sb.id)
         |SELECT i AS id1, j AS id2, round(jac, 6) AS jaccard
         |FROM pj WHERE jac >= 0.5 AND cold >= 1""".stripMargin,

    "dedup_shared_span" ->
      s"""WITH $dupIdsCtes,
         |base AS (SELECT doc_id, length(trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))) AS nl
         |         FROM documents WHERE doc_id NOT IN (SELECT id FROM dup))
         |SELECT doc_id AS id1, doc_id+100000 AS id2 FROM base WHERE doc_id%7=0 AND nl >= 160""".stripMargin,

    "dedup_embedding" ->
      "SELECT vec_id AS id1, CAST(vec_id+100000 AS BIGINT) AS id2 FROM embeddings WHERE vec_id%20=0",

    "ann_topk" ->
      """WITH q AS (SELECT vec_id AS qid, embedding AS qv FROM embeddings WHERE vec_id%10=0),
        |s AS (SELECT q.qid AS query_id, e.vec_id AS neighbor_id,
        |             list_cosine_similarity(q.qv, e.embedding) AS sim
        |      FROM q, embeddings e WHERE e.vec_id <> q.qid),
        |r AS (SELECT query_id, neighbor_id,
        |             row_number() OVER (PARTITION BY query_id ORDER BY sim DESC, neighbor_id) AS rk FROM s)
        |SELECT query_id, neighbor_id, rk FROM r WHERE rk <= 5""".stripMargin,

    "ann_lsh_top1" ->
      "SELECT CAST(vec_id+100000 AS BIGINT) AS query_id, vec_id AS neighbor_id FROM embeddings WHERE vec_id%20=0",

    "ann_lsh_recall" -> lshRecallOracle,

    "ann_ivf_top1" ->
      "SELECT CAST(vec_id+100000 AS BIGINT) AS query_id, vec_id AS neighbor_id FROM embeddings WHERE vec_id%20=0",

    // true brute-force recompute: survivors = corpus rows with NO
    // reference embedding at cosine >= 0.99 (the reference set is the
    // %20 rows themselves, so the boundary cases are exact-1.0 twins)
    "decon_embedding" ->
      """SELECT e.vec_id FROM embeddings e
        |WHERE NOT EXISTS (
        |  SELECT 1 FROM embeddings r
        |  WHERE r.vec_id % 20 = 0
        |    AND list_cosine_similarity(e.embedding, r.embedding) >= 0.99)""".stripMargin,

    "text_stats" ->
      s"""WITH $toksCte,
         |c AS (SELECT t.id AS doc_id, ts, d.text FROM t JOIN documents d ON t.id = d.doc_id)
         |SELECT doc_id,
         |  len(ts) AS n_ws,
         |  len(regexp_extract_all(text, '[A-Za-z0-9_]+|[^A-Za-z0-9_\\s]')) AS n_bpe,
         |  round(len(list_distinct(ts))*1.0/len(ts), 6) AS ttr,
         |  round(len(list_filter(ts, x -> x IN ($stopList)))*1.0/len(ts), 6) AS stop_ratio,
         |  round(list_sum(list_transform(ts, x -> length(x)))*1.0/len(ts), 6) AS mean_tok_len,
         |  round(CASE WHEN length(regexp_replace(text, '\\s', '', 'g')) = 0 THEN 0.0
         |        ELSE length(regexp_replace(text, '[^[:punct:]]', '', 'g'))*1.0/length(regexp_replace(text, '\\s', '', 'g')) END, 6) AS punct_ratio,
         |  round(least(len(ts)/100.0, 1.0)*0.4
         |      + (len(list_distinct(ts))*1.0/len(ts))*0.3
         |      + (1.0 - least((CASE WHEN length(regexp_replace(text, '\\s', '', 'g')) = 0 THEN 0.0
         |                      ELSE length(regexp_replace(text, '[^[:punct:]]', '', 'g'))*1.0/length(regexp_replace(text, '\\s', '', 'g')) END)*4.0, 1.0))*0.3, 6) AS quality
         |FROM c""".stripMargin,

    "text_langid" ->
      s"""WITH $toksCte,
         |c AS (SELECT id AS doc_id,
         |  $langCounts
         |FROM t)
         |SELECT doc_id,
         |  CASE WHEN greatest(c_en, c_de, c_fr, c_es, c_zh) = 0 THEN 'und'
         |       WHEN c_en = greatest(c_en, c_de, c_fr, c_es, c_zh) THEN 'en'
         |       WHEN c_de = greatest(c_en, c_de, c_fr, c_es, c_zh) THEN 'de'
         |       WHEN c_fr = greatest(c_en, c_de, c_fr, c_es, c_zh) THEN 'fr'
         |       WHEN c_es = greatest(c_en, c_de, c_fr, c_es, c_zh) THEN 'es'
         |       ELSE 'zh' END AS lang_pred
         |FROM c""".stripMargin,

    "text_repetition" ->
      s"""WITH $toksCte,
         |s AS (SELECT doc_id, text || chr(10) || text || chr(10) || 'unique footer ' || doc_id AS tripled
         |      FROM documents),
         |ln AS (SELECT doc_id, list_filter(string_split(tripled, chr(10)), l -> trim(l) <> '') AS lines FROM s)
         |SELECT ln.doc_id,
         |  round(CASE WHEN len(lines) = 0 THEN 0.0
         |        ELSE 1.0 - len(list_distinct(lines))*1.0/len(lines) END, 6) AS dup_line_frac,
         |  round(CASE WHEN len(ts) < 2 THEN 0.0
         |        ELSE 1.0 - len(list_distinct(list_transform(range(1, len(ts)), i -> ts[i] || ' ' || ts[i+1])))*1.0/(len(ts)-1) END, 6) AS dup_bigram_frac
         |FROM ln JOIN t ON t.id = ln.doc_id""".stripMargin,

    // the IDENTICAL C4 rules: same page construction, same line keep
    // predicate (terminal punct + >=5 words + no "javascript"), same
    // page predicates (no lorem ipsum / "{" on raw, >=3 terminal marks
    // on cleaned)
    "text_c4_filter" ->
      """WITH s AS (SELECT doc_id, string_split(text, ' ') AS ts FROM documents),
        |pg AS (SELECT doc_id, concat_ws(chr(10),
        |    array_to_string(ts[1:6], ' ') || '.',
        |    array_to_string(ts[5:10], ' ') || '!',
        |    'too short.',
        |    array_to_string(ts[2:6], ' '),
        |    'please enable javascript to continue viewing.',
        |    CASE WHEN doc_id % 3 <> 1 THEN array_to_string(ts[3:7], ' ') || '?' END,
        |    CASE WHEN doc_id % 5 = 0 THEN 'broken { markup' END,
        |    CASE WHEN doc_id % 7 = 0 THEN 'see the classic Lorem Ipsum passage.' END) AS page
        |  FROM s),
        |cl AS (SELECT doc_id, page,
        |    array_to_string(list_filter(string_split(page, chr(10)),
        |      l -> regexp_matches(trim(l), '[.!?"]$')
        |       AND len(string_split_regex(trim(l), '\s+')) >= 5
        |       AND NOT contains(lower(trim(l)), 'javascript')), chr(10)) AS text
        |  FROM pg)
        |SELECT doc_id, text FROM cl
        |WHERE NOT contains(lower(page), 'lorem ipsum') AND NOT contains(page, '{')
        |  AND len(regexp_extract_all(text, '[.!?]')) >= 3""".stripMargin,

    // identical fold: sorted integer counts, left fold, 0.0 - sum
    "text_entropy" ->
      """WITH src AS (SELECT doc_id,
        |    text,
        |    CASE WHEN doc_id % 3 = 0 THEN 'aaaaaaaaaa'
        |         WHEN doc_id % 3 = 1 THEN 'ababababab'
        |         ELSE text END AS probe
        |  FROM documents),
        |g AS (SELECT doc_id,
        |    regexp_extract_all(substr(text, 1, 8192), '[^' || chr(10) || ']') AS gt,
        |    regexp_extract_all(substr(probe, 1, 8192), '[^' || chr(10) || ']') AS gp
        |  FROM src),
        |c AS (SELECT doc_id, gt, gp,
        |    list_sort(list_transform(list_distinct(gt), c -> len(list_filter(gt, x -> x = c)))) AS ct,
        |    list_sort(list_transform(list_distinct(gp), c -> len(list_filter(gp, x -> x = c)))) AS cp
        |  FROM g)
        |SELECT doc_id,
        |  round(CASE WHEN len(gt) = 0 THEN 0.0
        |    ELSE 0.0 - list_reduce(list_prepend(0.0, list_transform(ct,
        |      c -> (c*1.0/len(gt)) * log2(c*1.0/len(gt)))), (a, b) -> a + b) END, 6) AS ent_text,
        |  round(CASE WHEN len(gp) = 0 THEN 0.0
        |    ELSE 0.0 - list_reduce(list_prepend(0.0, list_transform(cp,
        |      c -> (c*1.0/len(gp)) * log2(c*1.0/len(gp)))), (a, b) -> a + b) END, 6) AS ent_probe
        |FROM c""".stripMargin,

    // the IDENTICAL Gopher §A1.1 rules: same page construction, same
    // tokenization (normalize-then-split), same per-rule bounds; keep
    // is recomputed from the UNROUNDED signals exactly as the engine
    // evaluates it
    "text_gopher" ->
      """WITH s AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
        |pg AS (SELECT doc_id, concat_ws(chr(10),
        |    array_to_string(w[1:12], ' '),
        |    CASE WHEN doc_id % 4 = 0 THEN '• ' || array_to_string(w[2:5], ' ') END,
        |    CASE WHEN doc_id % 4 = 0 THEN '- a bullet item' END,
        |    CASE WHEN doc_id % 5 = 0 THEN array_to_string(w[3:7], ' ') || '...' END,
        |    CASE WHEN doc_id % 6 = 0 THEN '# # # # # #' END,
        |    CASE WHEN doc_id % 3 = 0 THEN '111 222 333 444' END,
        |    CASE WHEN doc_id % 2 = 0 THEN 'the study went on with that to be of use and have more' END,
        |    array_to_string(w[6:15], ' ')) AS page
        |  FROM s),
        |tok AS (SELECT doc_id, page,
        |    string_split(trim(regexp_replace(lower(page), '\s+', ' ', 'g')), ' ') AS ts,
        |    list_filter(string_split(page, chr(10)), l -> trim(l) <> '') AS lines
        |  FROM pg),
        |sig AS (SELECT doc_id,
        |    len(ts) AS n_words,
        |    list_sum(list_transform(ts, x -> length(x)))*1.0/len(ts) AS mean_raw,
        |    len(regexp_extract_all(page, '#'))*1.0/len(ts) AS hash_raw,
        |    len(regexp_extract_all(page, '\.\.\.|…'))*1.0/len(ts) AS esym_raw,
        |    len(list_filter(lines, l -> regexp_matches(trim(l), '^[•*-](\s|$)')))*1.0/len(lines) AS bullet_raw,
        |    len(list_filter(lines, l -> regexp_matches(trim(l), '(\.\.\.|…)$')))*1.0/len(lines) AS ellipsis_raw,
        |    len(list_filter(ts, x -> regexp_matches(x, '[a-z]')))*1.0/len(ts) AS alpha_raw,
        |    CAST(CASE WHEN list_contains(ts,'the') THEN 1 ELSE 0 END
        |       + CASE WHEN list_contains(ts,'be') THEN 1 ELSE 0 END
        |       + CASE WHEN list_contains(ts,'to') THEN 1 ELSE 0 END
        |       + CASE WHEN list_contains(ts,'of') THEN 1 ELSE 0 END
        |       + CASE WHEN list_contains(ts,'and') THEN 1 ELSE 0 END
        |       + CASE WHEN list_contains(ts,'that') THEN 1 ELSE 0 END
        |       + CASE WHEN list_contains(ts,'have') THEN 1 ELSE 0 END
        |       + CASE WHEN list_contains(ts,'with') THEN 1 ELSE 0 END AS BIGINT) AS stop_hits
        |  FROM tok)
        |SELECT doc_id, n_words,
        |  round(mean_raw, 6) AS mean_word_len,
        |  round(hash_raw, 6) AS hash_ratio,
        |  round(esym_raw, 6) AS ellipsis_sym_ratio,
        |  round(bullet_raw, 6) AS bullet_frac,
        |  round(ellipsis_raw, 6) AS ellipsis_frac,
        |  round(alpha_raw, 6) AS alpha_frac,
        |  stop_hits,
        |  (n_words >= 20 AND n_words <= 100000
        |   AND mean_raw >= 3.0 AND mean_raw <= 10.0
        |   AND hash_raw <= 0.1 AND esym_raw <= 0.1
        |   AND bullet_raw <= 0.9 AND ellipsis_raw <= 0.3
        |   AND alpha_raw >= 0.8 AND stop_hits >= 2) AS keep
        |FROM sig""".stripMargin,

    // closed-form: the messy batch rows canonicalize to seen base urls
    // and drop; only the /new/ rows survive
    "web_new_urls" ->
      """SELECT doc_id*2+1 AS page_id,
        |       'http://site' || (doc_id % 7) || '.com/new/' || doc_id AS url
        |FROM documents""".stripMargin,

    // same closed form: exact semantics through the bloom-pruned path
    "web_new_urls_bloom" ->
      """SELECT doc_id*2+1 AS page_id,
        |       'http://site' || (doc_id % 7) || '.com/new/' || doc_id AS url
        |FROM documents""".stripMargin,

    // containment = c / least(|A|, |B|) over the same distinct
    // 5-shingle machinery, with the snippet expansion inlined
    "dedup_containment" ->
      """WITH x AS (
        |  SELECT doc_id, trim(regexp_replace(lower(text), '\s+', ' ', 'g')) AS t FROM documents
        |  UNION ALL
        |  SELECT doc_id+300000,
        |         trim(regexp_replace(lower(array_to_string((string_split(text, ' '))[1:12], ' ')), '\s+', ' ', 'g'))
        |  FROM documents WHERE doc_id % 9 = 0),
        |tk AS (SELECT doc_id AS id, string_split(t, ' ') AS ts FROM x),
        |g AS (SELECT id, unnest(list_distinct(list_transform(range(1, len(ts)-5+2), i -> array_to_string(ts[i:i+4], ' ')))) AS gr FROM tk),
        |sz AS (SELECT id, count(*) AS n FROM g GROUP BY 1),
        |inter AS (SELECT a.id AS i, b.id AS j, count(*) AS c
        |          FROM g a JOIN g b ON a.gr = b.gr AND a.id < b.id GROUP BY 1, 2)
        |SELECT i AS id1, j AS id2
        |FROM inter JOIN sz sa ON i = sa.id JOIN sz sb ON j = sb.id
        |WHERE c*1.0/least(sa.n, sb.n) >= 0.9""".stripMargin,

    "web_mix_report" ->
      s"""WITH $toksCte,
         |pg AS (SELECT d.source, d.lang, len(t.ts) AS toks, length(d.text) AS chars
         |       FROM documents d JOIN t ON t.id = d.doc_id),
         |a AS (SELECT source, lang, count(*) AS docs,
         |        CAST(sum(toks) AS BIGINT) AS tokens, CAST(sum(chars) AS BIGINT) AS chars
         |      FROM pg GROUP BY 1, 2)
         |SELECT source, lang, docs, tokens, chars,
         |  round(docs*1.0/(SELECT sum(docs) FROM a), 6) AS doc_share,
         |  round(tokens*1.0/(SELECT sum(tokens) FROM a), 6) AS token_share,
         |  round(chars*1.0/(SELECT sum(chars) FROM a), 6) AS char_share
         |FROM a""".stripMargin,

    // same one-pass semantics recomputed relationally: pairs at the
    // floor threshold fan out to every threshold they pass; pairs =
    // sum(per-id contributions)/2, docs = ids in >= 1 passing pair
    "dedup_threshold_sweep" ->
      s"""WITH ${jaccardCtes(5)},
         |th AS (SELECT unnest([0.5, 0.6, 0.7, 0.8, 0.9]) AS threshold),
         |e AS (SELECT th.threshold, unnest([pj.i, pj.j]) AS id
         |      FROM th JOIN pj ON pj.jac >= th.threshold),
         |gcnt AS (SELECT threshold, id, count(*) AS cnt FROM e GROUP BY 1, 2),
         |a AS (SELECT threshold, CAST(count(*) AS BIGINT) AS docs,
         |        CAST(sum(cnt)/2 AS BIGINT) AS pairs
         |      FROM gcnt GROUP BY 1)
         |SELECT th.threshold, coalesce(a.pairs, 0) AS pairs, coalesce(a.docs, 0) AS docs
         |FROM th LEFT JOIN a USING (threshold)""".stripMargin,

    "web_domain_report" ->
      """WITH base AS (SELECT doc_id % 7 AS k, length(text) AS tl FROM documents)
        |SELECT 'site' || k || '.com' AS domain,
        |  2*count(*) AS pages,
        |  count(*) AS clusters,
        |  round(1.0 - count(*)*1.0/(2*count(*)), 6) AS dup_fraction,
        |  round(avg(tl), 6) AS mean_text_len
        |FROM base GROUP BY 1""".stripMargin,

    "web_sample_temperature" ->
      """WITH pages AS (
        |  SELECT doc_id AS page_id,
        |    CASE WHEN doc_id % 8 < 4 THEN 0 WHEN doc_id % 8 < 6 THEN 1
        |         WHEN doc_id % 8 < 7 THEN 2 ELSE 3 END AS k
        |  FROM documents),
        |cnt AS (SELECT k, count(*) AS pages FROM pages GROUP BY 1),
        |rates AS (SELECT k,
        |    pow(pages, -0.5) / (SELECT max(pow(pages, -0.5)) FROM cnt) AS rate
        |  FROM cnt)
        |SELECT p.page_id, 'site' || p.k || '.com' AS domain
        |FROM pages p JOIN rates r USING (k)
        |WHERE (p.page_id % 1000003) * 2654435761 % 1000003 < r.rate * 1000003""".stripMargin,

    "web_split_clusters" ->
      s"""WITH $exactExpansion,
         |c AS (SELECT doc_id, min(doc_id) OVER (PARTITION BY t) AS cluster_id FROM x)
         |SELECT doc_id, cluster_id,
         |  CASE WHEN (cluster_id % 1000003) * 2654435761 % 1000003 < 0.2 * 1000003
         |       THEN 'held_out' ELSE 'train' END AS split
         |FROM c""".stripMargin,

    "dedup_lines" ->
      """WITH src AS (
        |  SELECT doc_id, concat('NAV BOILERPLATE', chr(10), text, chr(10), 'FOOTER ', doc_id % 7) AS text
        |  FROM documents),
        |ls AS (SELECT doc_id AS id, string_split(text, chr(10)) AS arr FROM src),
        |l AS (SELECT id, i - 1 AS pos, arr[i] AS line
        |      FROM ls, LATERAL unnest(range(1, len(arr) + 1)) AS r(i)),
        |d AS (SELECT line, min(struct_pack(id := id, pos := pos)) AS first
        |      FROM l WHERE trim(line) <> '' GROUP BY 1 HAVING count(*) > 1),
        |k AS (SELECT l.id, l.pos, l.line
        |      FROM l LEFT JOIN d USING (line)
        |      WHERE trim(l.line) = '' OR d.line IS NULL OR (l.id = d.first.id AND l.pos = d.first.pos))
        |SELECT s.doc_id, coalesce(string_agg(k.line, chr(10) ORDER BY k.pos), '') AS text
        |FROM src s LEFT JOIN k ON k.id = s.doc_id
        |GROUP BY 1""".stripMargin,

    "norm_redact" ->
      s"""SELECT doc_id,
         |  regexp_replace(regexp_replace(regexp_replace(
         |    text || ' contact user' || doc_id || '@example.com from 10.' || (doc_id % 256)
         |      || '.0.' || (doc_id % 100) || ' call +1 (555) 0'
         |      || lpad(CAST(doc_id % 1000 AS VARCHAR), 3, '0') || '-'
         |      || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0'),
         |    '${graft.norm.Redact.EmailRe}', '<EMAIL>', 'g'),
         |    '${graft.norm.Redact.Ipv4Re}', '<IP>', 'g'),
         |    '${graft.norm.Redact.PhoneRe}', '<PHONE>', 'g') AS text_redacted
         |FROM documents""".stripMargin,

    "match_best" ->
      s"""WITH $matchScores,
         |best AS (SELECT *, row_number() OVER (PARTITION BY k1 ORDER BY o DESC, k2) AS rn FROM ov)
         |SELECT k1, k2, round(s_name, 6) AS score_name, round(s_bal, 6) AS score_bal,
         |       round(o, 6) AS overall_score,
         |       CASE WHEN o >= 0.75+0.05 THEN 'accept' WHEN o <= 0.75-0.05 THEN 'reject'
         |            ELSE 'undecided' END AS match_result
         |FROM best WHERE rn = 1""".stripMargin,

    "match_return_all" ->
      s"""WITH $matchScores
         |SELECT k1, k2, round(s_name, 6) AS score_name, round(s_bal, 6) AS score_bal,
         |       round(o, 6) AS overall_score,
         |       CASE WHEN o >= 0.93+0.02 THEN 'accept' WHEN o <= 0.93-0.02 THEN 'reject'
         |            ELSE 'undecided' END AS match_result
         |FROM ov WHERE o >= 0.93-0.02""".stripMargin,

    "search_topk" ->
      """WITH sc AS (SELECT c_custkey,
        |  (1.0 - levenshtein(lower(c_name), lower('Customer#000000777'))*1.0
        |       / greatest(length(c_name), length('Customer#000000777')))*1.0/1.0 AS o
        |  FROM customer),
        |r AS (SELECT c_custkey, o, row_number() OVER (ORDER BY o DESC, c_custkey) AS rn
        |      FROM sc WHERE o >= 0.8)
        |SELECT c_custkey, round(o, 6) AS overall_score FROM r WHERE rn <= 10""".stripMargin,

    "sim_kernels" ->
      """WITH p AS (SELECT c_custkey,
        |  lower(c_name) AS n1, lower(substr(c_name,1,2) || substr(c_name,4)) AS n2,
        |  c_acctbal AS v1, c_acctbal*2 AS v2,
        |  1 + c_custkey%9 AS mo, 20 + c_custkey%8 AS dy FROM customer)
        |SELECT c_custkey,
        |  round(1.0 - levenshtein(n1, n2)*1.0/greatest(length(n1), length(n2)), 6) AS lev,
        |  round(jaro_winkler_similarity(n1, n2), 6) AS jw,
        |  round(CASE WHEN v1 = v2 THEN 1.0 ELSE 1.0 - abs(v1-v2)/greatest(abs(v1), abs(v2), 1.0) END, 6) AS num,
        |  round(CASE WHEN mo = 3 AND dy = 15 THEN 1.0
        |        ELSE 1.0/(1.0 + abs(datediff('day', DATE '2020-03-15', make_date(2020, mo, dy)))/365.0) END, 6) AS dsim
        |FROM p""".stripMargin,

    "norm_compat" ->
      """SELECT c_custkey,
        |  lpad(CAST(c_custkey AS VARCHAR), 10, '0') AS norm_phone,
        |  'user' || c_custkey || '@example.com' AS norm_email,
        |  c_custkey || ' main street apartment 5 springfield' AS norm_addr,
        |  CASE WHEN c_custkey%3 = 0 THEN 'Robert Smith'
        |       WHEN c_custkey%3 = 1 THEN 'Margaret Taylor'
        |       ELSE 'William Gates' END AS norm_name
        |FROM customer""".stripMargin,

    // closed-form expected output of every normalize_url rule on the
    // deterministic messy fixture (raw string built identically here
    // and in the query)
    "norm_url" ->
      """SELECT doc_id,
        |  CASE WHEN doc_id%3=0 THEN 'HTTP://WWW.Example' ELSE 'https://News.Site' END
        |    || (doc_id%7) || '.COM'
        |    || CASE WHEN doc_id%3=0 THEN ':80' WHEN doc_id%3=1 THEN ':443' ELSE '' END
        |    || '/Articles/' || doc_id || CASE WHEN doc_id%2=0 THEN '/' ELSE '' END
        |    || '?z=9&utm_source=feed&a=' || (doc_id%5) || '&fbclid=XYZ#Section-2' AS url_raw,
        |  CASE WHEN doc_id%3=0 THEN 'http://example' ELSE 'https://news.site' END
        |    || (doc_id%7) || '.com/Articles/' || doc_id
        |    || '?a=' || (doc_id%5) || '&z=9' AS url_norm
        |FROM documents""".stripMargin,

    "mm_decode" ->
      """WITH a AS (SELECT doc_id AS asset_id, CAST(octet_length(encode(text)) AS BIGINT) AS n
        |           FROM documents),
        |m AS (SELECT asset_id, n AS n_bytes,
        |  16 + n%64 AS width, 16 + (n*7)%64 AS height,
        |  1 + n%3 AS channels, 1 + n%30 AS n_frames FROM a)
        |SELECT asset_id, n_bytes, width, height, channels, n_frames,
        |  CAST(floor(width * least(32.0/greatest(width*1.0, height*1.0), 1.0)) AS BIGINT) AS rw,
        |  CAST(floor(height * least(32.0/greatest(width*1.0, height*1.0), 1.0)) AS BIGINT) AS rh,
        |  CAST((n_frames-1)//3 + 1 AS BIGINT) AS n_sampled
        |FROM m""".stripMargin,

    // outer CAST AS BIGINT on every sum: DuckDB sum(BIGINT) returns
    // HUGEINT, which pandas coerces to float64 ('2562577.0'), while
    // Spark emits int64 ('2562577') — identical values, different
    // stringification, failed hash (root-caused in round 2's VERDICT)
    "q_lineitem_agg" ->
      """SELECT l_returnflag, l_linestatus,
        |  CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty,
        |  count(*) AS n_rows,
        |  CAST(sum(CAST(CAST(l_extendedprice AS DECIMAL(18,2))*100 AS BIGINT)) AS BIGINT) AS price_cents,
        |  CAST(sum(CAST(CAST(l_discount AS DECIMAL(18,2))*100 AS BIGINT)) AS BIGINT) AS disc_pct_sum
        |FROM lineitem GROUP BY 1, 2""".stripMargin,

    "q_orders_best" ->
      """SELECT o_custkey, o_orderkey, o_totalprice FROM (
        |  SELECT o_custkey, o_orderkey, o_totalprice,
        |         row_number() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS rn
        |  FROM orders) WHERE rn = 1""".stripMargin,

    "q_topk_join" ->
      """SELECT o_orderkey, c_name, o_totalprice
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |ORDER BY o_totalprice DESC, o_orderkey LIMIT 10""".stripMargin,

    "cluster_dense_ids" ->
      """WITH x AS (
        |  SELECT doc_id, trim(regexp_replace(lower(text), '\s+', ' ', 'g')) AS t FROM documents
        |  UNION ALL SELECT doc_id+100000, trim(regexp_replace(lower(text), '\s+', ' ', 'g')) FROM documents WHERE doc_id%2=0
        |),
        |c AS (SELECT doc_id, min(doc_id) OVER (PARTITION BY t) AS cid FROM x)
        |SELECT doc_id, CAST(dense_rank() OVER (ORDER BY cid) - 1 AS BIGINT) AS dense_id FROM c""".stripMargin,

    "cluster_summary_report" ->
      """WITH x AS (
        |  SELECT doc_id, trim(regexp_replace(lower(text), '\s+', ' ', 'g')) AS t FROM documents
        |  UNION ALL SELECT doc_id+100000, trim(regexp_replace(lower(text), '\s+', ' ', 'g')) FROM documents WHERE doc_id%2=0
        |),
        |c AS (SELECT min(doc_id) AS cluster_id, count(*) AS cluster_size FROM x GROUP BY t),
        |tot AS (
        |  SELECT 'totals' AS section, 'clusters' AS key, CAST(count(*) AS VARCHAR) AS value FROM c
        |  UNION ALL SELECT 'totals', 'rows', CAST(sum(cluster_size) AS VARCHAR) FROM c
        |  UNION ALL SELECT 'totals', 'singletons', CAST(count(*) FILTER (cluster_size = 1) AS VARCHAR) FROM c
        |  UNION ALL SELECT 'totals', 'multi', CAST(count(*) FILTER (cluster_size > 1) AS VARCHAR) FROM c),
        |hist AS (SELECT 'hist' AS section, CAST(cluster_size AS VARCHAR) AS key,
        |         CAST(count(*) AS VARCHAR) AS value FROM c GROUP BY cluster_size),
        |top AS (SELECT 'top10' AS section, CAST(cluster_id AS VARCHAR) AS key,
        |        CAST(cluster_size AS VARCHAR) AS value
        |        FROM c ORDER BY cluster_size DESC, cluster_id LIMIT 10)
        |SELECT * FROM tot UNION ALL SELECT * FROM hist UNION ALL SELECT * FROM top""".stripMargin,

    "match_auto" ->
      """WITH s1 AS (SELECT c_custkey AS k1, lower(c_name) AS n1, c_acctbal AS b1 FROM customer),
        |s2 AS (SELECT c_custkey AS k2, lower(substr(c_name,1,2) || substr(c_name,4)) AS n2,
        |       c_acctbal*2 AS b2 FROM customer),
        |sc AS (SELECT k1, k2, jaro_winkler_similarity(n1, n2) AS sj,
        |  CASE WHEN b1 = b2 THEN 1.0 ELSE 1.0 - abs(b1-b2)/greatest(abs(b1), abs(b2), 1.0) END AS sn
        |  FROM s1, s2),
        |ov AS (SELECT k1, k2, (sj*1.0 + sn*1.0)/(1.0+1.0) AS o FROM sc),
        |best AS (SELECT *, row_number() OVER (PARTITION BY k1 ORDER BY o DESC, k2) AS rn FROM ov)
        |SELECT k1, k2, round(o, 6) AS overall_score,
        |       CASE WHEN o >= 0.9+0.02 THEN 'accept' WHEN o <= 0.9-0.02 THEN 'reject'
        |            ELSE 'undecided' END AS match_result
        |FROM best WHERE rn = 1""".stripMargin,

    "q_events_stats" ->
      """SELECT user_id, event_type, count(*) AS n,
        |  count(DISTINCT event_id) AS n_events,
        |  max(value) AS max_value,
        |  CAST(floor(epoch(min(ts))) AS BIGINT) AS first_ts
        |FROM events GROUP BY 1, 2""".stripMargin,

    // zero-key cartesian fallback: reversed probe names share no blocking
    // key with the master side, so best-match output == best over the
    // full cross product (matcher.py:739-743 semantics)
    "match_zero_key" ->
      """WITH s1 AS (SELECT c_custkey AS k1, lower(reverse(c_name)) AS n1
        |            FROM customer WHERE c_custkey%50=0),
        |s2 AS (SELECT c_custkey AS k2, lower(c_name) AS n2 FROM customer),
        |sc AS (SELECT k1, k2,
        |  1.0 - levenshtein(n1, n2)*1.0/greatest(length(n1), length(n2)) AS o FROM s1, s2),
        |best AS (SELECT k1, k2, o, row_number() OVER (PARTITION BY k1 ORDER BY o DESC, k2) AS rn FROM sc)
        |SELECT k1, k2, round(o, 6) AS overall_score FROM best WHERE rn = 1""".stripMargin,

    "match_distribution" ->
      s"""WITH $matchScores,
         |best AS (SELECT *, row_number() OVER (PARTITION BY k1 ORDER BY o DESC, k2) AS rn FROM ov),
         |cls AS (SELECT CASE WHEN o >= 0.75+0.05 THEN 'accept' WHEN o <= 0.75-0.05 THEN 'reject'
         |               ELSE 'undecided' END AS match_result FROM best WHERE rn = 1)
         |SELECT match_result, count(*) AS n FROM cls GROUP BY 1""".stripMargin,

    // fallback ladder: every first_char block overflows the cap while the
    // highest-priority surviving group (shared leading 3-gram of the
    // zero-padded key) always fits, so exactly the same-3gram pairs stay
    "match_capped" ->
      """WITH s AS (SELECT c_custkey AS k, lpad(CAST(c_custkey AS VARCHAR), 4, '0') AS n
        |           FROM customer)
        |SELECT a.k AS k1, b.k AS k2
        |FROM s a JOIN s b ON substr(a.n, 1, 3) = substr(b.n, 1, 3)""".stripMargin,

    // planted hamming-0 pairs (reversed token order = same multiset =
    // identical SimHash) must all survive the radius-3 pigeonhole join
    "dedup_simhash_pairs_r3" ->
      s"""WITH $dupIdsCtes,
         |base AS (SELECT doc_id FROM documents WHERE doc_id NOT IN (SELECT id FROM dup))
         |SELECT CAST(doc_id AS BIGINT) AS id1, CAST(doc_id+100000 AS BIGINT) AS id2,
         |       CAST(0 AS INT) AS hamming
         |FROM base WHERE doc_id%4=0""".stripMargin,

    // hand-derived rapidfuzz goldens for the 3-case planted fixture
    // (see the query comment for the LCS arithmetic)
    "sim_token_ratios" ->
      """SELECT c_custkey,
        |  CAST(CASE WHEN c_custkey%3=0 THEN 1.0
        |       WHEN c_custkey%3=1 THEN round(2.0/3.0, 6) ELSE 0.0 END AS DOUBLE) AS tset,
        |  CAST(CASE WHEN c_custkey%3=0 THEN 1.0
        |       WHEN c_custkey%3=1 THEN round(1.0/3.0, 6) ELSE 0.0 END AS DOUBLE) AS tsort
        |FROM customer""".stripMargin,

    // window=1 winnowing = the distinct 24-gram hash set, so DuckDB
    // recounts distinct 24-char substrings of the same normalized
    // text; n<k falls back to one whole-text hash, n=0 to none
    "doc_fingerprints_w1" ->
      """WITH n AS (SELECT doc_id, trim(regexp_replace(lower(text), '\s+', ' ', 'g')) AS t
        |           FROM documents)
        |SELECT doc_id,
        |  CAST(CASE WHEN length(t) = 0 THEN 0
        |            WHEN length(t) < 24 THEN 1
        |            ELSE len(list_distinct(list_transform(range(1, length(t)-24+2),
        |                                                  i -> substr(t, i, 24))))
        |       END AS INT) AS n_grams
        |FROM n""".stripMargin,

    // byte-identical group fixture: bucket structure == group structure
    // in every band, so the stats are arithmetic over the group sizes
    // (candidate_pairs is DOUBLE because Spark's `/` is float division)
    "dedup_band_stats_planted" ->
      """WITH grp AS (SELECT doc_id % 40 AS g, count(*) AS n FROM documents GROUP BY 1),
        |agg AS (SELECT CAST(count(*) AS BIGINT) AS buckets,
        |               CAST(max(n) AS BIGINT) AS largest_bucket,
        |               CAST(sum(n*(n-1)/2.0) AS DOUBLE) AS candidate_pairs
        |        FROM grp)
        |SELECT CAST(r.range AS INT) AS band, buckets, largest_bucket, candidate_pairs
        |FROM agg, range(0, 32) r""".stripMargin
  )
}
