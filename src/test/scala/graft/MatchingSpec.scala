package graft

import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite
import graft.matching.{MatchColumn, MatchOptions, Matching}

/** Matching-mode behavior mirrored from the reference suite
  * (/root/reference/tests/test_integration.py and
  * tests/test_comprehensive.py scenarios): the 5-column weighted
  * fixture, nickname equivalence, address abbreviation, classification
  * bands, and search ranking.
  */
class MatchingSpec extends AnyFunSuite {
  private val spark = SparkTestBase.spark
  import spark.implicits._

  // fixture mirror of tests/fixtures/test_data*.csv + test_config.json:
  // columns renamed across sources, weights .3/.3/.2/.1/.1, th .75 u .05
  private val s1 = Seq(
    (1L, "Robert Johnson", "robert.j@email.com", "555-123-4567", "123 Main St", "1985-03-15"),
    (2L, "Jennifer Smith", "jsmith@email.com", "555-987-6543", "456 Oak Avenue", "1990-07-22"),
    (3L, "Michael Brown", "mbrown@email.com", "555-456-7890", "789 Pine Rd", "1978-11-30"),
    (4L, "Lisa Davis", "ldavis@email.com", "555-222-3333", "321 Elm Street", "1982-05-10"),
    (5L, "David Wilson", "dwilson@email.com", "555-444-5555", "654 Maple Dr", "1995-09-18")
  ).toDF("id1", "name", "email", "phone", "address", "dob")

  private val s2 = Seq(
    (11L, "Bob Johnson", "robert.j@email.com", "(555) 123-4567", "123 Main Street", "1985-03-15"),
    (12L, "Jenny Smith", "JSMITH@EMAIL.COM", "5559876543", "456 Oak Ave", "1990-07-22"),
    (13L, "Mike Brown", "mbrown@email.com", "555.456.7890", "789 Pine Road", "1978-11-30"),
    (14L, "Elizabeth Davis", "ldavis@email.com", "555-222-3333", "321 Elm St", "1982-05-10"),
    (15L, "Unrelated Person", "nobody@nowhere.org", "999-000-1111", "1 Far Away Blvd", "2001-01-01")
  ).toDF("id2", "full_name", "email_address", "phone_number", "street_address", "date_of_birth")

  private val mapping = Seq(
    MatchColumn("name", "full_name", "string_name", 0.3),
    MatchColumn("email", "email_address", "email", 0.3),
    MatchColumn("phone", "phone_number", "phone", 0.2),
    MatchColumn("address", "street_address", "string_general", 0.1),
    MatchColumn("dob", "date_of_birth", "date", 0.1))

  private lazy val best = Matching.matchTables(s1, s2, "id1", "id2", mapping,
    MatchOptions(threshold = 0.75, undecidedRange = 0.05)).collect()
      .map(r => r.getAs[Long]("id1") ->
        (r.getAs[Long]("id2"), r.getAs[Double]("overall_score"), r.getAs[String]("match_result")))
      .toMap

  test("nickname + phone-format + address variants match their counterpart (accept)") {
    // Bob/Robert via nickname expansion (test_integration.py:62-75 wants
    // just > 0.5; normalization makes these near-exact)
    for (i <- 1L to 4L) {
      val (id2, score, result) = best(i)
      assert(id2 == i + 10, s"row $i best-matched $id2")
      assert(score > 0.9, s"row $i score $score")
      assert(result == "accept")
    }
  }

  test("unrelated rows do not accept") {
    // row 5's best available candidate is the unrelated record
    val (_, score, result) = best(5L)
    assert(score < 0.7)
    assert(result == "reject")
  }

  test("St/Street normalization scores high on the general-string kernel") {
    // mirrors test_integration.py:77-90 (expects > 0.6)
    val df = Seq(("123 Main St", "123 Main Street")).toDF("a", "b")
    val sim = df.select(graft.functions.levenshtein_sim(
      graft.norm.Normalizers.normalizeAddress(col("a")),
      graft.norm.Normalizers.normalizeAddress(col("b")))).head().getDouble(0)
    assert(sim == 1.0)
  }

  test("return-all keeps every candidate above threshold - undecided") {
    val all = Matching.matchTables(s1, s2, "id1", "id2", mapping,
      MatchOptions(threshold = 0.75, undecidedRange = 0.05, returnAllMatches = true)).collect()
    assert(all.forall(_.getAs[Double]("overall_score") >= 0.70))
    assert(all.map(r => (r.getAs[Long]("id1"), r.getAs[Long]("id2"))).toSet.contains((1L, 11L)))
  }

  test("classification bands: accept/undecided/reject") {
    import org.apache.spark.sql.functions.col
    val df = Seq(0.95, 0.78, 0.50).toDF("s")
      .select(Matching.classify(col("s"), 0.75, 0.05).as("c"))
    assert(df.collect().map(_.getString(0)).toSeq == Seq("accept", "undecided", "reject"))
  }

  test("search: exact hit ranks first, ordering deterministic") {
    val master = (0 until 50).map(i => (i.toLong, f"Customer#$i%09d")).toDF("id", "name")
    val hits = Matching.search(master, "id",
      Seq(Matching.SearchField("name", "Customer#000000007", "levenshtein", 1.0)),
      threshold = 0.5, maxResults = 5).collect()
    assert(hits.head.getAs[Long]("id") == 7L)
    assert(hits.head.getAs[Double]("overall_score") == 1.0)
    assert(hits.length == 5)
    val scores = hits.map(_.getAs[Double]("overall_score")).toSeq
    assert(scores == scores.sorted.reverse)
  }

  test("blocking keys: validity filter and strategy shapes") {
    import org.apache.spark.sql.functions.col
    val df = Seq(("hello world"), (""), ("nan")).toDF("v")
      .select(Matching.blockingKeys(col("v"),
        Seq("first_char", "three_gram", "last_three", "word_prefix")).as("k"))
    val rows = df.collect().map(_.getSeq[String](0))
    assert(rows(0).toSet == Set("first:h", "3gram:hel", "last3:rld", "word1:hel", "wordN:wo"))
    assert(rows(1).isEmpty && rows(2).isEmpty)
  }
}
