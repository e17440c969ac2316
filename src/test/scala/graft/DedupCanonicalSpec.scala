package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.dedup.{Dedup, DedupConfig}

/** canonicalDocs / dedupedCorpus: the deduplicated-corpus projection.
  * Survivor policy = max(prefer), ties to min id; plan must be a
  * single partial-aggregatable min_by (no window, no per-cluster sort).
  */
class DedupCanonicalSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  import spark.implicits.{StringToColumn => _, _}

  test("canonicalDocs picks max-prefer survivor, ties to lowest id") {
    val clustered = Seq(
      // cluster 1: lengths 4,6,6 -> max len 6, tie between 2 and 3 -> 2
      (1L, "aaaa", 1L), (2L, "bbbbbb", 1L), (3L, "cccccc", 1L),
      // singleton
      (10L, "x", 10L),
      // cluster 20: equal lengths -> lowest id 20
      (20L, "pp", 20L), (21L, "qq", 20L)
    ).toDF("doc_id", "text", "cluster_id")
    val out = Dedup.canonicalDocs(clustered, "doc_id", length($"text"))
    assert(out.columns.toSeq == Seq("doc_id", "text", "cluster_id"))
    val got = out.select($"cluster_id", $"doc_id", $"text").as[(Long, Long, String)]
      .collect().sortBy(_._1)
    assert(got.toSeq == Seq((1L, 2L, "bbbbbb"), (10L, 10L, "x"), (20L, 20L, "pp")))
  }

  test("canonicalDocs honors a custom prefer column (earliest-ts policy)") {
    val clustered = Seq(
      (1L, 500L, 1L), (2L, 100L, 1L), (3L, 300L, 1L)
    ).toDF("doc_id", "ts", "cluster_id")
    // earliest ts wins: prefer = -ts
    val out = Dedup.canonicalDocs(clustered, "doc_id", -$"ts")
    assert(out.select($"doc_id").as[Long].collect().toSeq == Seq(2L))
  }

  test("canonicalDocs: a null prefer value never beats a real one") {
    // r3 ADVICE: null sorts FIRST in the nulls-first struct comparison,
    // so a null-text row (prefer = length(null) = null) used to win.
    val clustered = Seq(
      (1L, null.asInstanceOf[String], 1L), (2L, "real", 1L),
      // all-null cluster: falls back to lowest id
      (10L, null.asInstanceOf[String], 10L), (11L, null.asInstanceOf[String], 10L)
    ).toDF("doc_id", "text", "cluster_id")
    val out = Dedup.canonicalDocs(clustered, "doc_id", length($"text"))
      .select($"cluster_id", $"doc_id").as[(Long, Long)].collect().toSet
    assert(out == Set((1L, 2L), (10L, 10L)))
  }

  test("canonicalDocs plan: partial aggregation, no window") {
    val clustered = Seq((1L, "a", 1L)).toDF("doc_id", "text", "cluster_id")
    val plan = Dedup.canonicalDocs(clustered, "doc_id", length($"text"))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), s"window in canonical plan:\n$plan")
    assert(plan.contains("min_by"), s"expected min_by aggregate:\n$plan")
    // map-side combine before the shuffle: a partial min_by must appear
    assert(plan.contains("partial_min_by"), s"expected partial aggregation:\n$plan")
  }

  test("dedupedCorpus returns one longest-text survivor per near-dup cluster") {
    val base = (0 until 6).map(g =>
      (0 until 20).map(w => s"tok${g}_$w").mkString(" "))
    // per group: the original + a near-dup with one extra token (longer,
    // so the replica must be the survivor under the default policy)
    val docs = base.zipWithIndex.flatMap { case (t, g) =>
      Seq((g.toLong, t), (g + 100L, t + " extra")) }
      .toDF("doc_id", "text")
    val out = Dedup.dedupedCorpus(docs, "doc_id", "text",
      DedupConfig(exactVerify = true))
    val survivors = out.select($"doc_id").as[Long].collect().sorted
    assert(survivors.toSeq == (0 until 6).map(_ + 100L),
      s"expected the longer replicas to survive, got ${survivors.toSeq}")
    // carried columns: every input column plus cluster_id/cluster_size
    assert(out.columns.toSet == Set("doc_id", "text", "cluster_id", "cluster_size"))
    assert(out.select($"cluster_size").as[Long].collect().forall(_ == 2L))
  }
}
