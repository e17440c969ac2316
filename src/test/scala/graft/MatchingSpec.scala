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

  test("blocking keys: validity filter and strategy shapes (reference parity)") {
    import org.apache.spark.sql.functions.col
    val df = Seq(("hello world"), (""), ("nan")).toDF("v")
      .select(Matching.blockingKeys(col("v"),
        Seq("first_char", "three_gram", "last_three", "word_prefix", "word_suffix")).as("k"))
    val rows = df.collect().map(_.getSeq[String](0))
    // word_prefix emits the first word's 2- AND 3-prefix; word_suffix
    // the last word's 2-prefix only when >1 word (matcher.py:707-717)
    assert(rows(0).toSet ==
      Set("first:h", "3gram:hel", "last3:rld", "word1:he", "word1:hel", "wordN:wo"))
    assert(rows(1).isEmpty && rows(2).isEmpty)
  }

  test("blocking keys: length guards and fallback key (matcher.py:699-721)") {
    import org.apache.spark.sql.functions.col
    val df = Seq(("ab"), ("x"), ("one two")).toDF("v")
    // guards: no 3gram/last3 below length 3; no word_suffix for 1 word
    val guarded = df.select(Matching.blockingKeys(col("v"),
      Seq("three_gram", "last_three", "first_char")).as("k"))
      .collect().map(_.getSeq[String](0))
    assert(guarded(0).toSet == Set("first:a"))
    assert(guarded(1).toSet == Set("first:x"))
    assert(guarded(2).toSet == Set("3gram:one", "last3:two", "first:o"))
    // all strategies guard out -> fallback first-char key
    val fb = df.select(Matching.blockingKeys(col("v"), Seq("three_gram")).as("k"))
      .collect().map(_.getSeq[String](0))
    assert(fb(0).toSet == Set("fallback:a"))
    assert(fb(1).toSet == Set("fallback:x"))
    assert(fb(2).toSet == Set("3gram:one"))
    // tag prefixes every key
    val tagged = df.select(Matching.blockingKeys(col("v"),
      Seq("first_char"), "name").as("k")).collect().map(_.getSeq[String](0))
    assert(tagged(0).toSet == Set("name:first:a"))
  }

  test("zero-key cartesian fallback: disjoint-key probe still matched (matcher.py:739-743)") {
    // probe names share NO blocking key with the master side; the
    // reference scans all of source2 when it has <= 10k rows
    val s1 = Seq((1L, "zzqy"), (2L, "zzqz")).toDF("k1", "n1")
    val s2 = Seq((10L, "aaqy"), (11L, "aaqz"), (12L, "bbbb")).toDF("k2", "n2")
    val mapping = Seq(MatchColumn("n1", "n2", "levenshtein", 1.0))
    val out = Matching.matchTables(s1, s2, "k1", "k2", mapping,
      MatchOptions(threshold = 0.4, undecidedRange = 0.05))
      .select("k1", "k2").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // best by levenshtein: zzqy->aaqy (0.5), zzqz->aaqz (0.5)
    assert(out == Set((1L, 10L), (2L, 11L)))
    // with the fallback disabled the probes produce no rows at all
    val none = Matching.matchTables(s1, s2, "k1", "k2", mapping,
      MatchOptions(threshold = 0.4, cartesianFallbackLimit = 0))
    assert(none.count() == 0)
  }

  test("perfect-match shortcut: identical rows bypass scoring, others keep true best") {
    val s1 = Seq((1L, "alice brown", 10.0), (2L, "carol jones", 20.0)).toDF("k1", "n1", "b1")
    val s2 = Seq(
      (5L, "alice brown", 10.0),  // identical to row 1
      (6L, "alice browne", 10.0), // near
      (7L, "carol johns", 20.0)   // best for row 2 (no identical twin)
    ).toDF("k2", "n2", "b2")
    val mapping = Seq(MatchColumn("n1", "n2", "levenshtein", 0.7),
      MatchColumn("b1", "b2", "numeric", 0.3))
    val out = Matching.matchTables(s1, s2, "k1", "k2", mapping,
      MatchOptions(threshold = 0.8, undecidedRange = 0.05))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(r.fieldIndex("overall_score"))))
      .toMap
    assert(out(1L)._1 == 5L && out(1L)._2 == 1.0)
    assert(out(2L)._1 == 7L && out(2L)._2 < 1.0)
  }

  test("hot-key salting: identical candidate pair set, salted or not") {
    // every value starts with 'a' => `first:a` is one mega-key (60
    // rows a side); salting must only redistribute, never change pairs
    val s1 = (0L until 60L).map(i => (i, s"aa${i % 7}x")).toDF("k1", "n1")
    val s2 = (100L until 160L).map(i => (i, s"aa${i % 5}x")).toDF("k2", "n2")
    val mapping = Seq(MatchColumn("n1", "n2", "levenshtein", 1.0))
    def run(o: MatchOptions) = Matching.candidates(s1, s2, "k1", "k2", mapping, o)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val base = MatchOptions(blockingStrategies = Seq("first_char", "three_gram"),
      cartesianFallbackLimit = 0)
    val unsalted = run(base.copy(saltBuckets = 1))
    val salted = run(base.copy(saltThreshold = 3, saltBuckets = 4))
    assert(salted.nonEmpty && salted == unsalted)
  }

  test("candidate cap: fallback ladder keeps the best key group, truncate keeps lowest ids") {
    // probe "abc" shares 3gram with exactly one master row and
    // first_char with three more; cap of 2 must keep the 3gram hit
    // under the ladder (reference priority: 3gram before first)
    val s1 = Seq((1L, "abcq")).toDF("k1", "n1")
    val s2 = Seq((10L, "abcr"), (20L, "axxx"), (21L, "ayyy"), (22L, "azzz"))
      .toDF("k2", "n2")
    val mapping = Seq(MatchColumn("n1", "n2", "levenshtein", 1.0))
    def run(opts: MatchOptions) =
      Matching.candidates(s1, s2, "k1", "k2", mapping, opts)
        .collect().map(_.getLong(1)).toSet
    val base = MatchOptions(blockingStrategies = Seq("first_char", "three_gram"),
      cartesianFallbackLimit = 0, maxCandidates = 2)
    assert(run(base.copy(candidateTrimStrategy = "fallback")) == Set(10L))
    assert(run(base.copy(candidateTrimStrategy = "truncate")) == Set(10L, 20L))
    // no cap: all four first-char hits + the 3gram hit
    assert(run(base.copy(maxCandidates = 0)) == Set(10L, 20L, 21L, 22L))
  }
}
