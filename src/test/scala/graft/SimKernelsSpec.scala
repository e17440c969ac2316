package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.sim.{HashKernels, SimKernels, SubstringKernels}

/** Kernel goldens ported from the reference suite
  * (/root/reference/tests/test_comprehensive.py:26-98) plus property
  * checks (range, symmetry, identity).
  */
class SimKernelsSpec extends AnyFunSuite {

  /** seeded random-string property driver (no scalatestplus in the
    * offline cache; deterministic by construction) */
  private def forAllPairs(n: Int)(check: (String, String) => Unit): Unit = {
    val rnd = new scala.util.Random(42)
    def randStr(): String = {
      val len = rnd.nextInt(30)
      (0 until len).map { _ =>
        val r = rnd.nextInt(20)
        if (r == 0) ' ' else ('a' + rnd.nextInt(6)).toChar
      }.mkString
    }
    (0 until n).foreach { _ => check(randStr(), randStr()) }
  }


  // ---- levenshtein (test_comprehensive.py:29-43)
  test("levenshtein exact and empty") {
    assert(SimKernels.levenshteinSim("hello", "hello") == 1.0)
    assert(SimKernels.levenshteinSim("", "") == 1.0)
    assert(SimKernels.levenshteinSim("hello", "") == 0.0)
  }
  test("levenshtein similar strings") {
    val s = SimKernels.levenshteinSim("hello", "hallo")
    assert(s > 0.7 && s < 1.0)
    assert(s == 0.8) // 1 edit / max len 5
  }
  test("levenshtein different strings") {
    assert(SimKernels.levenshteinSim("hello", "world") < 0.5)
  }

  // ---- jaro-winkler (test_comprehensive.py:45-57)
  test("jaro-winkler names") {
    val s1 = SimKernels.jaroWinkler("Robert", "Bob")
    val s2 = SimKernels.jaroWinkler("Robert", "Robert")
    assert(s2 == 1.0 && s2 > s1)
  }
  test("jaro-winkler prefix bonus") {
    assert(SimKernels.jaroWinkler("John", "Johnny") > 0.5)
    assert(SimKernels.jaroWinkler("John", "Jonathan") > 0.5)
    // textbook value: MARTHA/MARHTA = 0.961
    assert(math.abs(SimKernels.jaroWinkler("martha", "marhta") - 0.9611111111111111) < 1e-9)
    assert(math.abs(SimKernels.jaro("dwayne", "duane") - 0.8222222222222223) < 1e-9)
    assert(math.abs(SimKernels.jaroWinkler("dixon", "dicksonx") - 0.8133333333333332) < 1e-9)
  }
  test("jaro-winkler empty semantics") {
    assert(SimKernels.jaroWinkler("", "") == 1.0)
    assert(SimKernels.jaroWinkler("a", "") == 0.0)
  }

  // ---- token ratios (test_comprehensive.py:59-67)
  test("token set ratio permutation") {
    assert(SimKernels.tokenSetRatio("John Smith", "Smith John") == 1.0)
  }
  test("token set ratio containment is 1.0") {
    assert(SimKernels.tokenSetRatio("fuzzy was a bear", "fuzzy fuzzy was a bear") == 1.0)
  }
  test("token sort ratio permutation") {
    assert(SimKernels.tokenSortRatio("apple banana cherry", "cherry banana apple") == 1.0)
  }
  test("token ratios disjoint") {
    assert(SimKernels.tokenSetRatio("aaa bbb", "ccc ddd") < 0.5)
  }

  // ---- numeric (test_comprehensive.py:69-82)
  test("numeric similarity") {
    assert(SimKernels.numericSim(100, 100) == 1.0)
    assert(SimKernels.numericSim(0, 0) == 1.0)
    assert(SimKernels.numericSim(100, 105) > 0.9)
    assert(SimKernels.numericSim(10, 1000) < 0.5)
    assert(SimKernels.numericSim(100, 105) == 1.0 - 5.0 / 105.0)
  }

  // ---- dates (test_comprehensive.py:84-98; algorithms.py:211-291)
  test("date similarity exact") {
    assert(SimKernels.dateSimilarity("2020-01-15", "2020-01-15") == 1.0)
  }
  test("date similarity same year") {
    val s = SimKernels.dateSimilarity("2020-01-15", "2020-06-15")
    assert(s > 0.5)
    assert(math.abs(s - 1.0 / (1.0 + 152.0 / 365.0)) < 1e-12)
  }
  test("date similarity different years") {
    val s = SimKernels.dateSimilarity("2020-01-15", "2010-01-15")
    assert(s < 0.5)
    val days = java.time.temporal.ChronoUnit.DAYS.between(
      java.time.LocalDate.of(2010, 1, 15), java.time.LocalDate.of(2020, 1, 15)).toDouble
    assert(math.abs(s - 1.0 / (1.0 + days / 365.0 + 10 * 0.5)) < 1e-12)
  }
  test("date cross-format equality") {
    assert(SimKernels.dateSimilarity("2020-01-15", "01/15/2020") == 1.0)
    assert(SimKernels.dateSimilarity("2020-01-15", "15 January 2020") == 1.0)
    assert(SimKernels.dateSimilarity("2020-01-15", "20200115") == 1.0)
  }
  test("date separator-stripped fallback") {
    // unparsable but digit-identical after separator strip -> 1.0
    assert(SimKernels.dateSimilarity("99-88-7777", "99/88/7777") == 1.0)
  }
  test("date empty -> 0") {
    assert(SimKernels.dateSimilarity("", "2020-01-01") == 0.0)
    assert(SimKernels.dateSimilarity(null, null) == 0.0)
  }

  // ---- properties
  test("similarities are in [0,1], symmetric, identity=1") {
    forAllPairs(300) { (a, b) =>
      for (f <- Seq[(String, String) => Double](
          SimKernels.levenshteinSim, SimKernels.jaroWinkler,
          SimKernels.tokenSetRatio, SimKernels.tokenSortRatio,
          SimKernels.indelSim)) {
        val s = f(a, b)
        assert(s >= 0.0 && s <= 1.0)
        assert(math.abs(s - f(b, a)) < 1e-12)
        assert(f(a, a) == 1.0)
      }
    }
  }

  test("longest common substring") {
    assert(SubstringKernels.longestCommonSubstring("abcdef", "zabcy") == 3)
    assert(SubstringKernels.longestCommonSubstring("", "abc") == 0)
    assert(SubstringKernels.longestCommonSubstring("same", "same") == 4)
    assert(SubstringKernels.longestCommonSubstring("xyz", "abc") == 0)
    forAllPairs(200) { (a, b) =>
      val got = SubstringKernels.longestCommonSubstring(a, b)
      val brute = (for {
        i <- 0 to a.length; j <- i to a.length
        sub = a.substring(i, j) if sub.nonEmpty && b.contains(sub)
      } yield sub.length).foldLeft(0)(math.max)
      assert(got == brute)
    }
  }

  test("minhash estimates jaccard within tolerance") {
    // two token sets with known jaccard ~ 0.5
    import org.apache.spark.sql.catalyst.util.GenericArrayData
    import org.apache.spark.unsafe.types.UTF8String
    def arr(ts: Seq[String]) = new GenericArrayData(ts.map(UTF8String.fromString).toArray[Any])
    val a = (0 until 200).map(i => s"tok$i")
    val b = (100 until 300).map(i => s"tok$i")   // |A∩B|=100, |A∪B|=300 -> J=1/3
    val sa = HashKernels.minhash(arr(a), 256, 42L)
    val sb = HashKernels.minhash(arr(b), 256, 42L)
    val est = sa.zip(sb).count { case (x, y) => x == y }.toDouble / 256
    assert(math.abs(est - 1.0 / 3.0) < 0.12) // ~4 sigma for 256 hashes
    // determinism
    val sa2 = HashKernels.minhash(arr(a), 256, 42L)
    assert(java.util.Arrays.equals(sa, sa2))
    // seed sensitivity
    val sa3 = HashKernels.minhash(arr(a), 256, 43L)
    assert(!java.util.Arrays.equals(sa, sa3))
  }

  test("simhash near-identical texts have small hamming distance") {
    import org.apache.spark.sql.catalyst.util.GenericArrayData
    import org.apache.spark.unsafe.types.UTF8String
    def arr(ts: Seq[String]) = new GenericArrayData(ts.map(UTF8String.fromString).toArray[Any])
    val base = (0 until 100).map(i => s"w$i")
    val near = base.updated(3, "CHANGED").updated(50, "ALSO")
    val far = (0 until 100).map(i => s"z$i")
    val h1 = HashKernels.simhash(arr(base), 7L)
    val h2 = HashKernels.simhash(arr(near), 7L)
    val h3 = HashKernels.simhash(arr(far), 7L)
    assert(java.lang.Long.bitCount(h1 ^ h2) < 12)
    assert(java.lang.Long.bitCount(h1 ^ h3) > 20)
  }
}

/** Fused one-pass text kernels must be byte-identical to the Column
  * compositions they replace (the dedup hot path depends on it).
  */
class FusedKernelsSpec extends org.scalatest.funsuite.AnyFunSuite {
  private val spark = SparkTestBase.spark
  import org.apache.spark.sql.functions._
  import graft.functions._
  import graft.norm.Normalizers

  private def docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    .select(col("doc_id"), Normalizers.normalizeString(col("text")).as("t"))

  test("minhash_words == minhash_signature(word_shingles)") {
    val k = 5; val n = 128; val seed = 42L
    val diff = docs.select(
      minhash_words(col("t"), k, n, seed).as("a"),
      minhash_signature(word_shingles(col("t"), k), n, seed).as("b"))
      .where(not(col("a") <=> col("b"))).count()
    assert(diff == 0)
  }

  test("simhash_words == simhash64(ws_tokens)") {
    val diff = docs.select(
      simhash_words(col("t"), 42L).as("a"),
      simhash64(ws_tokens(col("t")), 42L).as("b"))
      .where(not(col("a") <=> col("b"))).count()
    assert(diff == 0)
  }

  test("shingle_hashes == distinct xxhash64 of word_shingles (as set)") {
    val diff = docs.select(
      shingle_hashes(col("t"), 5).as("a"),
      array_sort(array_distinct(transform(word_shingles(col("t"), 5), s => xxhash64(s)))).as("b"))
      .where(not(col("a") <=> col("b"))).count()
    assert(diff == 0)
  }

  test("minhash_chars == minhash_signature(char_shingles), incl. multibyte") {
    import spark.implicits._
    val k = 5; val n = 64; val seed = 42L
    // corpus docs + CJK/emoji/mixed-width fixtures (the path's purpose:
    // short/CJK text where word tokenization is meaningless — the
    // code-point byte-scan must agree with Spark's substring offsets)
    val extra = Seq("深層学習のための大規模データ重複排除",
      "短い", "héllo wörld ünïcode", "日本語とenglishの混在テキスト", "ab",
      "😀😁😂 emoji text 🎉").toDF("t")
    val both = docs.select(col("t")).unionAll(extra)
    val diff = both.select(
      minhash_chars(col("t"), k, n, seed).as("a"),
      minhash_signature(char_shingles(col("t"), k), n, seed).as("b"))
      .where(not(col("a") <=> col("b"))).count()
    assert(diff == 0)
  }

  test("shingle_hashes_chars == distinct xxhash64 of char_shingles (as set)") {
    import spark.implicits._
    val extra = Seq("同じ文字列同じ文字列", "xyxyxyxyxy", "").toDF("t")
    val diff = docs.select(col("t")).unionAll(extra).select(
      shingle_hashes_chars(col("t"), 5).as("a"),
      array_sort(array_distinct(transform(char_shingles(col("t"), 5), s => xxhash64(s)))).as("b"))
      .where(not(col("a") <=> col("b"))).count()
    assert(diff == 0)
  }

  test("fused kernels: empty and short texts") {
    import spark.implicits._
    val df = Seq("", "one", "a b c").toDF("t")
    val rows = df.select(
      minhash_words(col("t"), 5, 8, 42L).as("m"),
      minhash_signature(word_shingles(col("t"), 5), 8, 42L).as("m2"),
      simhash_words(col("t"), 42L).as("s"),
      simhash64(ws_tokens(col("t")), 42L).as("s2")).collect()
    rows.foreach { r =>
      assert(r.isNullAt(0) == r.isNullAt(1))
      if (!r.isNullAt(0)) assert(r.getSeq[Long](0) == r.getSeq[Long](1))
      assert(r.getLong(2) == r.getLong(3))
    }
  }
}
