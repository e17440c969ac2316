package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions.col
import graft.text.TextAnalysis

/** Gopher §A1.1 document-level quality rules (Rae et al. 2021):
  * word-count band, mean-word-length band, symbol-to-word ratio,
  * bullet/ellipsis line fractions, alphabetic-word fraction, required
  * stopwords. Each rule is flipped by exactly one fixture; signal
  * values are pinned closed-form on a hand-counted page.
  */
class GopherFilterSpec extends AnyFunSuite {
  private val spark = SparkTestBase.spark
  import spark.implicits.{StringToColumn => _, _}

  // passes every rule at minWords = 10: 19 words, mean len 65/19,
  // 7 distinct stopwords, all-alpha, no symbols/bullets/ellipses
  private val good =
    "the quick brown fox jumps over the lazy dog and that was it to be of note with zeal"

  private def keptIds(rows: Seq[(Long, String)], minWords: Int = 10): Set[Long] =
    TextAnalysis.gopherFilter(rows.toDF("id", "text"), "text", minWords = minWords)
      .select($"id").as[Long].collect().toSet

  test("each rule kills exactly its fixture") {
    val rows = Seq(
      1L -> good,
      2L -> "the words go with here.",                   // 5 words < floor 10
      3L -> Seq.fill(12)("to of be ba").mkString(" "),   // mean len 2.0 < 3
      4L -> (good + " # # #"),                           // symbols 3/22 > 0.1 (alpha 19/22 still >= 0.8)
      5L -> (Seq.fill(10)("• " + good).mkString("\n")),  // bullet frac 1.0 > 0.9
      6L -> (Seq.fill(3)(good + "...").mkString("\n")),  // ellipsis frac 1.0 > 0.3 (symbols 3/57 ok)
      7L -> (good + " " + Seq.fill(6)("12345").mkString(" ")), // alpha frac 19/25 < 0.8
      8L -> "zebra quokka wombat ibis lemur gecko owl puma lynx orca newt koala", // no stopwords
      // hash 2/28 and ellipsis 2/28 — each under 0.1, so Gopher KEEPS
      // it; a summed symbol ratio (4/28 > 0.1) would wrongly drop it
      9L -> (good + " # extra# word... and... tail of line stays here")
    )
    assert(keptIds(rows) == Set(1L, 9L))
  }

  test("signals are the hand-counted values") {
    // 4 non-blank lines; 13 ws tokens; 1 '#'; 2 '...'; 1 bullet line;
    // 1 ellipsis-terminated line; 11/13 alpha tokens; stopword hits =
    // {the} = 1; token lengths sum 54
    val text = "the cat sat... on # mat\n• first bullet\nplain line\nanother plain..."
    val row = Seq((1L, text)).toDF("id", "text").select(
      TextAnalysis.wsTokenCount(graft.norm.Normalizers.normalizeString(col("text"))).as("n"),
      TextAnalysis.hashWordRatio(col("text")).as("hash"),
      TextAnalysis.ellipsisWordRatio(col("text")).as("esym"),
      TextAnalysis.bulletLineFraction(col("text")).as("bul"),
      TextAnalysis.ellipsisLineFraction(col("text")).as("ell"),
      TextAnalysis.alphaWordFraction(col("text")).as("alpha"),
      TextAnalysis.gopherStopHits(col("text")).as("stops"),
      TextAnalysis.meanTokenLen(col("text")).as("mean")
    ).as[(Int, Double, Double, Double, Double, Double, Int, Double)].head()
    assert(row._1 == 13)
    assert(math.abs(row._2 - 1.0 / 13) < 1e-12)
    assert(math.abs(row._3 - 2.0 / 13) < 1e-12)
    assert(math.abs(row._4 - 0.25) < 1e-12)
    assert(math.abs(row._5 - 0.25) < 1e-12)
    assert(math.abs(row._6 - 11.0 / 13) < 1e-12)
    assert(row._7 == 1)
    assert(math.abs(row._8 - 54.0 / 13) < 1e-12)
  }

  test("empty and whitespace-only docs: every signal 0, dropped") {
    val rows = Seq(1L -> "", 2L -> "   \n  \n")
    assert(keptIds(rows, minWords = 0) == Set.empty[Long])
    val sig = rows.toDF("id", "text").select(
      TextAnalysis.hashWordRatio(col("text")).as("sym"),
      TextAnalysis.bulletLineFraction(col("text")).as("bul"),
      TextAnalysis.ellipsisLineFraction(col("text")).as("ell"),
      TextAnalysis.alphaWordFraction(col("text")).as("alpha")
    ).as[(Double, Double, Double, Double)].collect()
    assert(sig.forall(t => t._1 == 0.0 && t._2 == 0.0 && t._3 == 0.0 && t._4 == 0.0))
    // dropped because the stopword floor (and word floor at defaults)
    // can never pass on an empty token set — not via a null signal
  }

  test("unicode ellipsis and bullet markers count; other columns ride through") {
    val text = "• item one\n* item two\n- item three\nreal sentence…"
    val df = Seq((1L, text, "extra")).toDF("id", "text", "meta")
    val got = df.select(
      TextAnalysis.bulletLineFraction(col("text")).as("b"),
      TextAnalysis.ellipsisLineFraction(col("text")).as("e"),
      TextAnalysis.ellipsisWordRatio(col("text")).as("s")
    ).as[(Double, Double, Double)].head()
    assert(got._1 == 0.75)       // 3 of 4 lines bullet-led
    assert(got._2 == 0.25)       // U+2026-terminated line
    assert(math.abs(got._3 - 1.0 / 11) < 1e-12) // 1 unicode ellipsis / 11 tokens
    assert(TextAnalysis.gopherFilter(df, "text").columns.toSeq ==
      Seq("id", "text", "meta"))
  }

  test("charEntropy: closed-form values, +0.0 sign, newline exclusion") {
    val rows = Seq(
      (1L, "aaaaaaaa"),      // one symbol -> exactly 0.0 (and +0.0, not -0.0)
      (2L, "abababab"),      // two equiprobable symbols -> exactly 1 bit
      (3L, "aabb\naabb"),    // newline excluded -> still 1 bit
      (4L, ""),              // empty -> 0
      (5L, "abcd")           // four equiprobable -> 2 bits
    ).toDF("id", "text")
    val got = rows.select(col("id"),
        TextAnalysis.charEntropy(col("text")).as("e"))
      .as[(Long, Double)].collect().toMap
    assert(got(1L) == 0.0 && (1.0 / got(1L)) > 0, "must be +0.0")
    assert(got(2L) == 1.0)
    assert(got(3L) == 1.0)
    assert(got(4L) == 0.0)
    assert(got(5L) == 2.0)
  }

  test("hyphenated words do not count as bullets") {
    // '-word' has no whitespace after the marker; only a bare '-' leads
    val text = "-lead hyphen stays\n- real bullet"
    val got = Seq((1L, text)).toDF("id", "text")
      .select(TextAnalysis.bulletLineFraction(col("text")).as("b"))
      .as[Double].head()
    assert(got == 0.5)
  }
}
