package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.dedup.Dedup

/** Corpus mixture report and dedup threshold sweep — the two report
  * tables a training-data recipe is tuned against.
  */
class ReportsSpec extends AnyFunSuite {
  private val spark = SparkTestBase.spark
  import spark.implicits.{StringToColumn => _, _}

  test("mixReport: closed-form docs/tokens/chars and shares per (source, lang)") {
    val df = Seq(
      ("web", "en", "one two three"),   // 3 toks, 13 chars
      ("web", "en", "four five"),       // 2 toks, 9 chars
      ("web", "de", "sechs"),           // 1 tok, 5 chars
      ("books", "en", "seven eight nine ten") // 4 toks, 20 chars
    ).toDF("source", "lang", "text")
    val got = graft.web.DomainStats.mixReport(df, "text", Seq("source", "lang"))
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getDouble(5), r.getDouble(6)))
      .toMap
    assert(got(("web", "en")) == ((2L, 5L, 22L, 0.5, 0.5)))
    assert(got(("web", "de")) == ((1L, 1L, 5L, 0.25, 0.1)))
    assert(got(("books", "en")) == ((1L, 4L, 20L, 0.25, 0.4)))
    // shares sum to 1
    val shares = graft.web.DomainStats.mixReport(df, "text", Seq("source"))
      .agg(org.apache.spark.sql.functions.sum($"token_share")).head().getDouble(0)
    assert(math.abs(shares - 1.0) < 1e-9)
  }

  test("containmentPairs: embedded snippet at containment 1.0 that jaccard misses") {
    // parent 20 words -> 18 distinct 3-shingles; snippet = first 8
    // words -> 6 shingles, ALL in the parent: containment 6/6 = 1.0,
    // jaccard 6/18 = 0.33
    val words = (1 to 20).map(i => s"w$i")
    val docs = Seq(
      1L -> words.mkString(" "),
      2L -> words.take(8).mkString(" "),
      3L -> "completely unrelated other text here now"
    ).toDF("doc_id", "text")
    val cont = Dedup.containmentPairs(docs, "doc_id", "text", n = 3, threshold = 0.9)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(cont.map(t => (t._1, t._2)).toSet == Set((1L, 2L)))
    assert(cont.head._3 == 1.0)
    // whole-doc jaccard dilutes the same pair below any usable threshold
    val jac = Dedup.ngramJaccardPairs(docs, "doc_id", "text", n = 3, threshold = 0.9)
    assert(jac.count() == 0)
  }

  test("thresholdSweep: one fixture pair per band, zero-filled tail") {
    // 3-shingle jaccard ladder: pair (1,2) at 10/11 (>= all bands up to
    // 0.9), pair (3,4) at 6/10 (0.5, 0.6 only), docs 5/6 unpaired
    val docs = Seq(
      1L -> "a b c d e f g h i j k l",
      2L -> "a b c d e f g h i j k l m",
      3L -> "p q r s t u v w",          // 6 shingles
      4L -> "p q r s t u v w x x2 x3 x4", // shares all 6, has 10
      5L -> "one lone doc of its own kind",
      6L -> "another fully distinct document entirely"
    ).toDF("doc_id", "text")
    val got = Dedup.thresholdSweep(docs, "doc_id", "text", n = 3,
        thresholds = Seq(0.5, 0.6, 0.7, 0.9, 0.99))
      .collect().map(r => r.getDouble(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(got(0.5) == ((2L, 4L)))
    assert(got(0.6) == ((2L, 4L)))   // 6/10 = 0.6 passes at the boundary
    assert(got(0.7) == ((1L, 2L)))
    assert(got(0.9) == ((1L, 2L)))   // 10/11 = 0.909
    assert(got(0.99) == ((0L, 0L)))  // zero-filled
  }
}
