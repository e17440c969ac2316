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

  test("search probe plans as scan-filter-TakeOrdered (no join, no global sort)") {
    val master = docs.select(col("doc_id"), col("text"))
    val hits = graft.matching.Matching.search(master, "doc_id",
      Seq(graft.matching.Matching.SearchField("text", "spark join table", "levenshtein", 1.0)),
      threshold = 0.0, maxResults = 5)
    val p = plan(hits)
    assert(p.contains("TakeOrderedAndProject"), p)
    assert(!p.contains("SortMergeJoin") && !p.contains("BroadcastHashJoin"), p)
  }
}
