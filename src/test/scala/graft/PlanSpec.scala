package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.dedup.{Dedup, DedupConfig}

/** Physical-plan audits: the properties the 100 TB design depends on
  * must be visible in `.explain` — column pruning to the scan,
  * predicate pushdown, broadcast for small dims, partial (map-side)
  * aggregation, and whole-stage codegen over the custom expressions.
  */
class PlanSpec extends AnyFunSuite {
  private val spark = SparkTestBase.spark

  private def plan(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.executedPlan.toString

  private def docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")

  test("dedup signature scan prunes to (doc_id, text)") {
    val sigs = Dedup.signatures(docs, "doc_id", "text", DedupConfig())
    val scan = sigs.queryExecution.executedPlan.collectLeaves().map(_.toString).mkString
    assert(scan.contains("ReadSchema"))
    assert(!scan.contains("lang") && !scan.contains("n_chars") && !scan.contains("source"),
      s"scan must not read unused columns:\n$scan")
  }

  test("filter on scan column is pushed to parquet") {
    val q = docs.where(col("doc_id") > 100).select(col("doc_id"))
    val leaves = q.queryExecution.executedPlan.collectLeaves().map(_.toString).mkString
    assert(leaves.contains("PushedFilters") && leaves.contains("GreaterThan"),
      s"expected pushed filter in:\n$leaves")
  }

  test("q_topk_join broadcasts the dimension side") {
    val df = SparkEntry.queries("q_topk_join")(spark, "/root/testdata/sf0.001")
    assert(plan(df).contains("BroadcastHashJoin"))
  }

  test("temperature sampling broadcasts the rates side; the corpus never shuffles") {
    // sampleByRates' join side is one row per domain — at any realistic
    // domain count AQE/size estimation must broadcast it so the corpus
    // rides no exchange at all (the accept filter is a codegen'd long
    // expression on top of the scan)
    val corpus = docs.select(col("doc_id"),
      concat(lit("site"), (col("doc_id") % 7).cast("string")).as("domain"))
    val rates = graft.web.Sampling.temperatureRates(
      corpus.groupBy(col("domain")).agg(count(lit(1)).as("pages")), tau = 0.5)
    val sampled = graft.web.Sampling.sampleByRates(corpus, "doc_id", "domain", rates)
    val p = sampled.queryExecution.executedPlan.toString
    assert(p.contains("BroadcastHashJoin"), p)
    // the only exchanges feed the tiny rates aggregation, never the
    // corpus scan: a corpus-side exchange would precede the join probe
    val probeSide = sampled.queryExecution.optimizedPlan.toString
    assert(!probeSide.contains("Repartition"), probeSide)
  }

  test("embedding decontamination: corpus side joins by broadcast only (no corpus exchange before verify)") {
    val e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val ref = e.where(col("vec_id") % 20 === 0)
      .select((col("vec_id") + 100000).as("vec_id"), col("embedding"))
    val pairs = graft.emb.Embeddings.embeddingContamination(
      e, "vec_id", "embedding", ref, "vec_id", "embedding", 0.99)
    val p = plan(pairs)
    // both reference joins (band entries, vectors) broadcast
    assert("BroadcastHashJoin".r.findAllIn(p).size >= 2, p)
    // the ONLY exchanges in the plan serve the final pair dedup (and
    // the broadcast builds); the corpus scan -> band explode -> verify
    // path itself is exchange-free. HashAggregate-based distinct =
    // partial + final around one shuffle.
    assert("Exchange hashpartitioning".r.findAllIn(p).size <= 1, p)
  }

  test("bloom frontier probe stays inside whole-stage codegen") {
    val bloom = graft.web.Frontier.urlBloom(
      docs.select(concat(lit("http://h/"), col("doc_id")).as("url")), "url", 1000)
    val probed = docs.select(concat(lit("http://h/"), col("doc_id")).as("url"))
      .where(graft.web.Frontier.mightContain(col("url"), bloom))
    val p = plan(probed)
    assert(p.contains("*(1)") || p.contains("WholeStageCodegen"), p)
    assert(!p.contains("Eval (fallback)"), p)
  }

  test("exact-collapse aggregates map-side (partial before shuffle)") {
    val g = docs.groupBy(col("text")).agg(min(col("doc_id")))
    val p = plan(g)
    // two HashAggregates around the exchange = partial + final
    assert("HashAggregate".r.findAllIn(p).size >= 2, p)
  }

  test("custom similarity expressions stay inside whole-stage codegen") {
    val df = docs.select(graft.functions.jaro_winkler_sim(col("text"), col("text")).as("s"))
      .where(col("s") > 0.5)
    val p = plan(df)
    // "*(n)" prefixes mark whole-stage-codegen'd operators in toString
    assert(p.contains("*(1) Project") || p.contains("WholeStageCodegen"), p)
    // the kernel call compiles into generated code, not an eval fallback:
    // the expression must appear under a codegen'd project, and the plan
    // must not contain a fallback marker for it
    assert(!p.contains("Eval (fallback)"), p)
  }

  test("vec_dot scorer stays inside whole-stage codegen (no eval fallback)") {
    val e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val df = graft.emb.Embeddings.bruteForceTopK(
      e, e.where(col("vec_id") % 10 === 0), "vec_id", "embedding", 3)
    df.collect() // materialize so AQE's toString shows the FINAL plan
    val p = plan(df)
    assert(p.contains("vec_dot"), p)
    assert(p.contains("WholeStageCodegen") || p.contains("*("), p)
    assert(!p.contains("Eval (fallback)"), p)
  }

  test("search probe plans as scan-filter-TakeOrdered (no join, no global sort)") {
    val master = docs.select(col("doc_id"), col("text"))
    val hits = graft.matching.Matching.search(master, "doc_id",
      Seq(graft.matching.Matching.SearchField("text", "spark join table", "levenshtein", 1.0)),
      threshold = 0.0, maxResults = 5)
    val p = plan(hits)
    assert(p.contains("TakeOrderedAndProject"), p)
    assert(!p.contains("SortMergeJoin") && !p.contains("BroadcastHashJoin"), p)
  }

  test("near-dup pipeline never groups on raw text or builds collect_list arrays") {
    // the round-1 scale-killers: groupBy(full text) ships the corpus as
    // shuffle-key bytes; collect_list(id) builds one giant row per hot
    // boilerplate group. The exact collapse must group on the content
    // hash and rejoin members by id.
    val df = Dedup.nearDupClusters(docs, "doc_id", "text", DedupConfig())
    val p = df.queryExecution.optimizedPlan.toString
    assert(!p.contains("collect_list"), s"collect_list in plan:\n${p.take(2000)}")
    val aggKeys = df.queryExecution.optimizedPlan.collect {
      case a: org.apache.spark.sql.catalyst.plans.logical.Aggregate =>
        a.groupingExpressions.map(_.dataType)
    }.flatten
    assert(!aggKeys.contains(org.apache.spark.sql.types.StringType),
      "no aggregate may group on a raw string key in the dedup pipeline")
  }

  test("persisted IVF probe prunes cell partitions (dynamic partition pruning)") {
    // the at-rest cells table is partitioned by cid; the probe joins on
    // cid with a broadcast query side, so the scan must carry a dynamic
    // pruning partition filter — only the nprobe cells' partitions are
    // read, the ARCHITECTURE.md claim in code
    val e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val q = e.where(col("vec_id") % 50 === 0)
      .select((col("vec_id") + 100000).as("vec_id"), col("embedding"))
    val wh = new graft.io.Warehouse(
      java.nio.file.Files.createTempDirectory("ivf").toString, spark)
    graft.emb.IvfIndex.build(wh, e, "vec_id", "embedding", nlist = 8, iters = 1)
    val probe = graft.emb.IvfIndex.probe(wh, q, "vec_id", "embedding", k = 1, nprobe = 2)
    probe.collect() // materialize so AQE's toString shows the final plan
    val p = plan(probe).toLowerCase
    assert(p.contains("dynamicpruning"),
      s"expected a dynamic partition pruning filter on the cells scan:\n${plan(probe)}")
  }

  test("dense-id renumber has no un-partitioned window") {
    val clusters = Dedup.exactClusters(docs.select(col("doc_id"),
      col("text")), "doc_id", "text")
    val mapping = graft.dedup.ConnectedComponents.denseIds(clusters.select(col("cluster_id")))
    // AQE wraps the physical plan, so inspect the printed tree: a
    // WindowExec line carries [functions], [partitionSpec], [orderSpec]
    // — the partition spec must name the range-partition id column
    val windowLines = mapping.queryExecution.executedPlan.toString
      .linesIterator.filter(_.contains("Window [")).toSeq
    assert(windowLines.nonEmpty, "expected the partitioned numbering window")
    assert(windowLines.forall(_.contains("[_p")),
      s"dense-id window must be partitioned (a global window serializes on one task):\n${windowLines.mkString("\n")}")
    // and it renumbers correctly: dense ranks 0..n-1 in cluster_id order
    val got = mapping.orderBy(col("cluster_id")).collect().map(_.getLong(1)).toSeq
    assert(got == got.indices.map(_.toLong))
  }

  test("line dedup never ships text through a wide shuffle") {
    // dedupLines' wide exchanges (the line-hash aggregation and dup
    // join) must carry only (id, pos, hash) — 32 bytes/line; the text
    // crosses at most the final per-document id join. A string column
    // inside a RepartitionOperation/Aggregate-feeding exchange means
    // the corpus rides the shuffle as line bytes — the scale killer
    // this operator's shape exists to avoid.
    val dd = graft.dedup.LineDedup.dedupLines(docs, "doc_id", "text")
    val p = dd.queryExecution.optimizedPlan
    val aggInputs = p.collect {
      case a: org.apache.spark.sql.catalyst.plans.logical.Aggregate =>
        a.groupingExpressions.map(_.dataType) ++
          a.child.output.map(_.dataType)
    }.flatten
    assert(!aggInputs.contains(org.apache.spark.sql.types.StringType),
      "the line-hash aggregations must not consume any string column")
    assert(!p.toString.contains("collect_list"),
      "reassembly must be a positional filter expression, not a collect_list re-group")
  }

  test("ensureParallel probes the split count without running a job") {
    import java.util.concurrent.atomic.AtomicInteger
    val jobs = new AtomicInteger(0)
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(j: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
        jobs.incrementAndGet(); ()
      }
    }
    spark.sparkContext.addSparkListener(listener)
    try {
      // file-rooted narrow plan: the probe must read the scan's split
      // count from the non-adaptive plan — zero jobs (df.rdd under AQE
      // resolves the adaptive final plan: ~2 s of driver work per call
      // and, for some plans, stage-materialization jobs)
      val narrow = docs.select(col("doc_id"), length(col("text")).as("n"))
      val before = jobs.get
      val probed = Dedup.ensureParallel(narrow)
      Thread.sleep(300) // listener events are async; drain before asserting
      assert(jobs.get == before,
        s"split-count probe must not run Spark jobs (ran ${jobs.get - before})")
      // sf0.001 documents is one small file -> below defaultParallelism
      // -> the guard must widen it to a full task wave
      assert(probed.rdd.getNumPartitions >= spark.sparkContext.defaultParallelism)
      // an input already at/above target passes through un-repartitioned
      val wide = docs.repartition(spark.sparkContext.defaultParallelism * 2)
      assert(Dedup.ensureParallel(wide) eq wide,
        "ensureParallel must be identity when the input is already parallel")
    } finally spark.sparkContext.removeSparkListener(listener)
  }
}
