package graft.sim

import java.time.LocalDate
import java.time.format.{DateTimeFormatter, ResolverStyle}
import java.util.Locale

/** Pure JVM similarity kernels.
  *
  * Semantic contract ported from the reference's published algorithms
  * (rapidfuzz-backed wrappers at /root/reference/src/algorithms.py:8-291):
  *   - empty handling: both empty -> 1.0, exactly one empty -> 0.0
  *   - levenshtein:  1 - dist / max(len1, len2)
  *   - jaro-winkler: textbook Jaro + Winkler prefix boost (weight 0.1,
  *     prefix cap 4, boost threshold 0.7) — the algorithm rapidfuzz's
  *     `JaroWinkler.normalized_similarity` documents.
  *   - token_set / token_sort: FuzzyWuzzy-style ratios over the Indel
  *     (LCS-based) normalized similarity, as implemented by rapidfuzz.
  *   - date similarity: bounded-compat multi-format parse + component
  *     extraction + separator-stripped / levenshtein fallbacks
  *     (/root/reference/src/algorithms.py:65-291).
  *
  * All length arithmetic is over Unicode code points (Python `len`
  * semantics), not UTF-16 units.
  *
  * These functions are called from generated code (see SimExpressions),
  * so they must stay static-dispatch friendly: object methods only.
  */
object SimKernels {

  @inline private def cps(s: String): Array[Int] = s.codePoints().toArray

  // ---------------------------------------------------------------- indel

  /** Longest common subsequence length over code points. */
  private def lcsLen(a: Array[Int], b: Array[Int]): Int = {
    if (a.length == 0 || b.length == 0) return 0
    val (s, t) = if (a.length >= b.length) (a, b) else (b, a)
    val prev = new Array[Int](t.length + 1)
    val curr = new Array[Int](t.length + 1)
    var i = 0
    while (i < s.length) {
      var j = 0
      while (j < t.length) {
        curr(j + 1) =
          if (s(i) == t(j)) prev(j) + 1
          else math.max(prev(j + 1), curr(j))
        j += 1
      }
      System.arraycopy(curr, 0, prev, 0, t.length + 1)
      i += 1
    }
    prev(t.length)
  }

  /** Indel (insert/delete-only edit) normalized similarity:
    * 1 - dist/(len1+len2) with dist = len1+len2-2*LCS. rapidfuzz
    * `fuzz.ratio` semantics (scaled 0-1 here).
    */
  def indelSim(s1: String, s2: String): Double = {
    if (s1.isEmpty && s2.isEmpty) return 1.0
    val a = cps(s1); val b = cps(s2)
    val lensum = a.length + b.length
    if (lensum == 0) return 1.0
    val dist = lensum - 2 * lcsLen(a, b)
    1.0 - dist.toDouble / lensum
  }

  // ---------------------------------------------------- levenshtein (0-1)

  def levenshteinDistance(s1: String, s2: String): Int = {
    val a = cps(s1); val b = cps(s2)
    if (a.length == 0) return b.length
    if (b.length == 0) return a.length
    var prev = new Array[Int](b.length + 1)
    var curr = new Array[Int](b.length + 1)
    var j = 0
    while (j <= b.length) { prev(j) = j; j += 1 }
    var i = 0
    while (i < a.length) {
      curr(0) = i + 1
      var k = 0
      while (k < b.length) {
        val cost = if (a(i) == b(k)) 0 else 1
        curr(k + 1) = math.min(math.min(curr(k) + 1, prev(k + 1) + 1), prev(k) + cost)
        k += 1
      }
      val tmp = prev; prev = curr; curr = tmp
      i += 1
    }
    prev(b.length)
  }

  /** 1 - dist/max(len); both-empty -> 1.0, one-empty -> 0.0
    * (reference algorithms.py:8-15).
    */
  def levenshteinSim(s1: String, s2: String): Double = {
    if (s1.isEmpty && s2.isEmpty) return 1.0
    if (s1.isEmpty || s2.isEmpty) return 0.0
    val maxLen = math.max(s1.codePointCount(0, s1.length), s2.codePointCount(0, s2.length))
    1.0 - levenshteinDistance(s1, s2).toDouble / maxLen
  }

  // -------------------------------------------------------- jaro-winkler

  /** Textbook Jaro similarity over code points. */
  def jaro(s1: String, s2: String): Double = {
    if (s1.isEmpty && s2.isEmpty) return 1.0
    if (s1.isEmpty || s2.isEmpty) return 0.0
    val a = cps(s1); val b = cps(s2)
    if (java.util.Arrays.equals(a, b)) return 1.0
    val window = math.max(0, math.max(a.length, b.length) / 2 - 1)
    val aFlag = new Array[Boolean](a.length)
    val bFlag = new Array[Boolean](b.length)
    var m = 0
    var i = 0
    while (i < a.length) {
      val lo = math.max(0, i - window)
      val hi = math.min(b.length - 1, i + window)
      var j = lo
      var found = false
      while (j <= hi && !found) {
        if (!bFlag(j) && b(j) == a(i)) {
          aFlag(i) = true; bFlag(j) = true; m += 1; found = true
        }
        j += 1
      }
      i += 1
    }
    if (m == 0) return 0.0
    // transpositions: matched chars compared in order
    var t = 0
    var k = 0
    i = 0
    while (i < a.length) {
      if (aFlag(i)) {
        while (!bFlag(k)) k += 1
        if (a(i) != b(k)) t += 1
        k += 1
      }
      i += 1
    }
    val tr = t / 2
    (m.toDouble / a.length + m.toDouble / b.length + (m - tr).toDouble / m) / 3.0
  }

  /** Jaro-Winkler with prefix weight 0.1, prefix cap 4, boost threshold
    * 0.7; both-empty -> 1.0, one-empty -> 0.0 (algorithms.py:18-25).
    */
  def jaroWinkler(s1: String, s2: String): Double = {
    if (s1.isEmpty && s2.isEmpty) return 1.0
    if (s1.isEmpty || s2.isEmpty) return 0.0
    val j = jaro(s1, s2)
    if (j <= 0.7) return j
    val a = cps(s1); val b = cps(s2)
    var p = 0
    val cap = math.min(4, math.min(a.length, b.length))
    while (p < cap && a(p) == b(p)) p += 1
    j + p * 0.1 * (1.0 - j)
  }

  // ------------------------------------------------------- token ratios

  private def tokens(s: String): Array[String] =
    s.split("\\s+").filter(_.nonEmpty)

  /** rapidfuzz fuzz.token_sort_ratio semantics, 0-1 scale:
    * indel ratio of the space-joined sorted token lists
    * (algorithms.py:38-45 contract; both-empty -> 1, one-empty -> 0).
    */
  def tokenSortRatio(s1: String, s2: String): Double = {
    if (s1.isEmpty && s2.isEmpty) return 1.0
    if (s1.isEmpty || s2.isEmpty) return 0.0
    val j1 = tokens(s1).sorted.mkString(" ")
    val j2 = tokens(s2).sorted.mkString(" ")
    indelSim(j1, j2)
  }

  /** rapidfuzz fuzz.token_set_ratio semantics, 0-1 scale
    * (algorithms.py:28-35 contract): sorted distinct tokens; compare
    * {intersection, intersection+diffA, intersection+diffB} pairwise via
    * indel ratio and take the max; full containment -> 1.0.
    */
  def tokenSetRatio(s1: String, s2: String): Double = {
    if (s1.isEmpty && s2.isEmpty) return 1.0
    if (s1.isEmpty || s2.isEmpty) return 0.0
    val ta = tokens(s1).toSet
    val tb = tokens(s2).toSet
    if (ta.isEmpty || tb.isEmpty) return 0.0
    val inter = ta.intersect(tb)
    val diffAB = (ta -- tb).toArray.sorted
    val diffBA = (tb -- ta).toArray.sorted
    if (inter.nonEmpty && (diffAB.isEmpty || diffBA.isEmpty)) return 1.0
    val sect = inter.toArray.sorted.mkString(" ")
    val sectAB = (sect + " " + diffAB.mkString(" ")).trim
    val sectBA = (sect + " " + diffBA.mkString(" ")).trim
    math.max(indelSim(sectAB, sectBA),
      math.max(indelSim(sect, sectAB), indelSim(sect, sectBA)))
  }

  // ------------------------------------------------------------ numeric

  /** 1 - |a-b| / max(|a|,|b|,1); equal -> 1.0 (algorithms.py:48-62).
    * Non-parsable handling lives in the Column wrapper (try_cast).
    */
  def numericSim(a: Double, b: Double): Double = {
    if (a == b) return 1.0
    val maxVal = math.max(math.max(math.abs(a), math.abs(b)), 1.0)
    1.0 - math.abs(a - b) / maxVal
  }

  // --------------------------------------------------------------- dates

  private val explicitFormats: Array[DateTimeFormatter] = {
    // bounded-compat subset of the reference's dateutil+strptime ladder
    // (algorithms.py:74-108); uuuu = proleptic year, STRICT resolution.
    val patterns = Array(
      "uuuu-M-d", "M-d-uuuu", "d-M-uuuu",
      "uuuu/M/d", "M/d/uuuu", "d/M/uuuu",
      "uuuu.M.d", "M.d.uuuu", "d.M.uuuu",
      "uuuuMMdd",
      "MMMM d, uuuu", "d MMMM uuuu", "MMM d, uuuu", "d MMM uuuu",
      "d-MMM-uuuu", "uuuu-MMM-d", "MMM-d-uuuu",
      "d/MMM/uuuu", "uuuu/MMM/d", "MMM/d/uuuu",
      // timestamp-ish shapes dateutil accepts
      "uuuu-M-d'T'H:m:s", "uuuu-M-d H:m:s", "uuuu-M-d H:m",
      "M/d/uuuu H:m:s", "M/d/uuuu H:m"
    )
    patterns.map(p =>
      DateTimeFormatter.ofPattern(p, Locale.ENGLISH).withResolverStyle(ResolverStyle.STRICT))
  }

  /** Bounded-compat flexible date parse (algorithms.py:65-109). Returns
    * epoch day, or Long.MinValue when unparsable.
    */
  def parseDateFlexible(raw: String): Long = {
    if (raw == null) return Long.MinValue
    val s = raw.trim
    if (s.isEmpty) return Long.MinValue
    val low = s.toLowerCase(Locale.ROOT)
    if (low == "nan" || low == "none" || low == "null") return Long.MinValue
    var i = 0
    while (i < explicitFormats.length) {
      try {
        val ta = explicitFormats(i).parse(s)
        return LocalDate.from(ta).toEpochDay
      } catch { case _: Exception => }
      i += 1
    }
    Long.MinValue
  }

  private val compPat1 = java.util.regex.Pattern.compile("(\\d{4})[-/](\\d{1,2})[-/](\\d{1,2})")
  private val compPat2 = java.util.regex.Pattern.compile("(\\d{1,2})[-/](\\d{1,2})[-/](\\d{4})")
  private val compPat3 = java.util.regex.Pattern.compile("(\\d{4})(\\d{2})(\\d{2})")

  private def validDate(y: Int, m: Int, d: Int): Boolean =
    try { LocalDate.of(y, m, d); true } catch { case _: Exception => false }

  /** Component extraction (algorithms.py:112-171). Returns
    * Array(y, m, d) or null.
    */
  def extractDateComponents(raw: String): Array[Int] = {
    if (raw == null) return null
    val s = raw.trim
    if (s.isEmpty) return null
    val m1 = compPat1.matcher(s)
    if (m1.find()) {
      val y = m1.group(1).toInt; val mo = m1.group(2).toInt; val d = m1.group(3).toInt
      if (mo >= 1 && mo <= 12 && d >= 1 && d <= 31 && validDate(y, mo, d))
        return Array(y, mo, d)
    }
    val m2 = compPat2.matcher(s)
    if (m2.find()) {
      val v1 = m2.group(1).toInt; val v2 = m2.group(2).toInt; val y = m2.group(3).toInt
      if (v1 >= 1 && v1 <= 12 && v2 >= 1 && v2 <= 31 && validDate(y, v1, v2))
        return Array(y, v1, v2)
      if (v2 >= 1 && v2 <= 12 && v1 >= 1 && v1 <= 31 && validDate(y, v2, v1))
        return Array(y, v2, v1)
      if (v1 >= 1 && v1 <= 12) return Array(y, v1, v2)
    }
    val m3 = compPat3.matcher(s)
    if (m3.find()) {
      val y = m3.group(1).toInt; val mo = m3.group(2).toInt; val d = m3.group(3).toInt
      if (mo >= 1 && mo <= 12 && d >= 1 && d <= 31 && validDate(y, mo, d))
        return Array(y, mo, d)
    }
    null
  }

  /** Component comparison (algorithms.py:174-208). */
  def compareDateComponents(c1: Array[Int], c2: Array[Int]): Double = {
    if (c1 == null || c2 == null) return 0.0
    if (c1(0) == c2(0) && c1(1) == c2(1) && c1(2) == c2(2)) return 1.0
    val comp = (if (c1(0) == c2(0)) 0.5 else 0.0) +
      (if (c1(1) == c2(1)) 0.3 else 0.0) +
      (if (c1(2) == c2(2)) 0.2 else 0.0)
    if (validDate(c1(0), c1(1), c1(2)) && validDate(c2(0), c2(1), c2(2))) {
      val d1 = LocalDate.of(c1(0), c1(1), c1(2)).toEpochDay
      val d2 = LocalDate.of(c2(0), c2(1), c2(2)).toEpochDay
      val temporal = 1.0 / (1.0 + math.abs(d1 - d2) / 365.0)
      math.max(comp, temporal * 0.7)
    } else comp * 0.5
  }

  private val sepStrip = java.util.regex.Pattern.compile("[-/.\\s]")

  /** Full date similarity (algorithms.py:211-291). */
  def dateSimilarity(raw1: String, raw2: String): Double = {
    val s1 = if (raw1 == null) "" else raw1.trim
    val s2 = if (raw2 == null) "" else raw2.trim
    if (s1.isEmpty || s2.isEmpty) return 0.0
    val d1 = parseDateFlexible(s1)
    val d2 = parseDateFlexible(s2)
    if (d1 != Long.MinValue && d2 != Long.MinValue) {
      if (d1 == d2) return 1.0
      val daysDiff = math.abs(d1 - d2)
      val y1 = LocalDate.ofEpochDay(d1).getYear
      val y2 = LocalDate.ofEpochDay(d2).getYear
      if (y1 == y2) return 1.0 / (1.0 + daysDiff / 365.0)
      return 1.0 / (1.0 + daysDiff / 365.0 + math.abs(y1 - y2) * 0.5)
    }
    val c1 = extractDateComponents(s1)
    val c2 = extractDateComponents(s2)
    if (c1 != null && c2 != null) return compareDateComponents(c1, c2)
    if (d1 != Long.MinValue && c2 != null) {
      val ld = LocalDate.ofEpochDay(d1)
      return compareDateComponents(Array(ld.getYear, ld.getMonthValue, ld.getDayOfMonth), c2)
    }
    if (d2 != Long.MinValue && c1 != null) {
      val ld = LocalDate.ofEpochDay(d2)
      return compareDateComponents(c1, Array(ld.getYear, ld.getMonthValue, ld.getDayOfMonth))
    }
    val n1 = sepStrip.matcher(s1).replaceAll("")
    val n2 = sepStrip.matcher(s2).replaceAll("")
    if (n1 == n2) return 1.0
    levenshteinSim(n1, n2) * 0.5
  }
}
