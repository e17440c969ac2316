package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.dedup.LineDedup

/** Corpus-level line dedup: first-occurrence survival, blank-line
  * exemption, the maxDf threshold, order-preserving reassembly, and
  * the lineStats report.
  */
class LineDedupSpec extends AnyFunSuite {
  private val spark = SparkTestBase.spark
  import spark.implicits._

  private val nav = "HOME | ABOUT | CONTACT"
  private val cookie = "we use cookies"
  private def corpus = Seq(
    (3L, s"$nav\nunique body three\n$cookie"),
    (1L, s"$nav\nunique body one\n\n$cookie"),
    (2L, s"$nav\nunique body two\n$cookie\n$cookie"),
    (9L, s"$nav")
  ).toDF("doc_id", "text")

  private def result(maxDf: Long = 1L, dropBlank: Boolean = false): Map[Long, String] =
    LineDedup.dedupLines(corpus, "doc_id", "text", maxDf, dropBlank)
      .as[(Long, String)].collect().toMap

  test("repeated lines survive only at their first occurrence (min doc, then min pos)") {
    val got = result()
    // nav and cookie first occur in doc 1 (lowest id wins, not input order)
    assert(got(1L) == s"$nav\nunique body one\n\n$cookie")
    assert(got(2L) == "unique body two")
    assert(got(3L) == "unique body three")
    assert(got(9L) == "") // fully-boilerplate doc keeps its row, empty text
    assert(got.size == 4)
  }

  test("within-document repeats count toward the threshold and dedup") {
    // cookie occurs twice in doc 2 alone: with maxDf=1 only the global
    // first (doc 1) survives — doc 2 loses both copies
    assert(!result()(2L).contains(cookie))
  }

  test("maxDf exempts lines at or under the threshold") {
    // nav occurs 4x, cookie 4x (docs 1,2x2,3): maxDf=4 keeps everything
    val got = result(maxDf = 4L)
    assert(got(2L) == s"$nav\nunique body two\n$cookie\n$cookie")
  }

  test("blank lines are exempt structure, or dropped with dropBlank") {
    assert(result()(1L).contains("\n\n"))
    assert(!result(dropBlank = true)(1L).contains("\n\n"))
  }

  test("lineStats reports occurrences, doc freq and first occurrence") {
    val stats = LineDedup.lineStats(corpus, "doc_id", "text")
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getInt(4)))).toMap
    assert(stats(nav) == ((4L, 4L, 1L, 0)))
    assert(stats(cookie) == ((4L, 3L, 1L, 3))) // pos 3: after the blank line
    assert(stats("unique body two") == ((1L, 1L, 2L, 1)))
    assert(!stats.contains("")) // blanks excluded
  }
}
