package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions.col
import graft.text.TextAnalysis

/** C4 §2.2 heuristic cleaning (Raffel et al. 2020): line-level
  * terminal-punctuation / min-words / javascript rules, page-level
  * lorem-ipsum / brace / sentence-floor rules.
  */
class C4FilterSpec extends AnyFunSuite {
  private val spark = SparkTestBase.spark
  import spark.implicits.{StringToColumn => _, _}

  private val goodPage = Seq(
    "This sentence has enough words and ends properly.",
    "short one.",                                // < 5 words
    "no terminal punctuation on this long line", // unterminated
    "Please enable JavaScript to view this content.", // javascript
    "Another fine sentence with plenty of words here!",
    "  A third good sentence, with leading spaces kept?  " // trims, keeps
  ).mkString("\n")

  private val cleanedGood = Seq(
    "This sentence has enough words and ends properly.",
    "Another fine sentence with plenty of words here!",
    "  A third good sentence, with leading spaces kept?  "
  ).mkString("\n")

  test("line rules: terminal punct + min words + javascript") {
    val got = Seq((1L, goodPage)).toDF("id", "text")
      .select(TextAnalysis.c4CleanText(col("text")).as("c"))
      .as[String].head()
    assert(got == cleanedGood)
  }

  test("quote counts as terminal punctuation but not as a sentence mark") {
    val page = Seq(
      "He said the words and then left the room.\"",
      "Filler sentence number two with enough words.",
      "Filler sentence number three with enough words.").mkString("\n")
    val df = Seq((1L, page)).toDF("id", "text")
    // the quote line survives the LINE filter...
    val cleaned = df.select(TextAnalysis.c4CleanText(col("text")).as("c"))
      .as[String].head()
    assert(cleaned.startsWith("He said"))
    // ...and the page survives: 3 sentence marks ('.' inside the quoted
    // line plus two fillers)
    assert(TextAnalysisFixtures.kept(df) == Set(1L))
  }

  test("page rules: lorem ipsum, brace, sentence floor") {
    val base = Seq(
      "First good sentence with plenty of words here.",
      "Second good sentence with plenty of words too!",
      "Third good sentence rounding out the page nicely?").mkString("\n")
    val df = Seq(
      (1L, base),
      (2L, base + "\nclassic Lorem Ipsum filler text"),       // killed: lorem
      (3L, base + "\nfunction f() { return 1; }"),            // killed: brace
      (4L, base.split("\n").take(2).mkString("\n"))           // killed: 2 sentences
    ).toDF("id", "text")
    assert(TextAnalysisFixtures.kept(df) == Set(1L))
    // the survivor's text is unchanged (every line passes)
    val out = TextAnalysis.c4Filter(df, "text")
    assert(out.where($"id" === 1L).select("text").as[String].head() == base)
  }

  test("other columns ride through; thresholds are tunable") {
    val df = Seq((7L, "ok page.", "meta")).toDF("id", "text", "extra")
    // minLineWords=2, minSentences=1 admit the tiny page
    val out = TextAnalysis.c4Filter(df, "text", minLineWords = 2, minSentences = 1)
    assert(out.columns.toSeq == Seq("id", "text", "extra"))
    assert(out.as[(Long, String, String)].collect().toSeq ==
      Seq((7L, "ok page.", "meta")))
    // at the defaults the 2-word single-sentence page dies
    assert(TextAnalysis.c4Filter(df, "text").count() == 0)
  }
}

private object TextAnalysisFixtures {
  def kept(df: org.apache.spark.sql.DataFrame): Set[Long] = {
    val spark = SparkTestBase.spark
    import spark.implicits.{StringToColumn => _, _}
    TextAnalysis.c4Filter(df, "text").select($"id").as[Long].collect().toSet
  }
}
