package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.sim.{HashKernels, SimKernels}
import org.apache.spark.unsafe.types.UTF8String

/** Property tests over the pure kernels (SURVEY §5 test plan item 4):
  * bounds, symmetry, identity, MinHash estimator accuracy, winnowing
  * guarantee. Seeded hand-rolled generators (the scalatest/scalacheck
  * bridge artifact isn't in the offline cache), pure JVM — no session.
  */
class PropertySpec extends AnyFunSuite {

  private def rng = new scala.util.Random(42)

  private def word(r: scala.util.Random): String =
    Array.fill(4)(('a' + r.nextInt(26)).toChar).mkString

  private def text(r: scala.util.Random, maxWords: Int = 30): String =
    Seq.fill(r.nextInt(maxWords + 1))(word(r)).mkString(" ")

  private val sims: Seq[(String, (String, String) => Double)] = Seq(
    "levenshtein" -> SimKernels.levenshteinSim,
    "jaroWinkler" -> SimKernels.jaroWinkler,
    "tokenSet" -> SimKernels.tokenSetRatio,
    "tokenSort" -> SimKernels.tokenSortRatio,
    "indel" -> SimKernels.indelSim)

  test("similarities are bounded, symmetric, and 1 at identity") {
    val r = rng
    for (_ <- 0 until 300) {
      val a = text(r); val b = text(r)
      sims.foreach { case (name, f) =>
        val s = f(a, b)
        assert(s >= 0.0 && s <= 1.0, s"$name('$a','$b') = $s out of range")
        assert(math.abs(s - f(b, a)) < 1e-12, s"$name not symmetric on ('$a','$b')")
        assert(f(a, a) == 1.0, s"$name('$a','$a') != 1")
      }
    }
  }

  test("date similarity bounded, symmetric, 1 at identity") {
    val r = rng
    def d() = f"${1990 + r.nextInt(41)}%04d-${1 + r.nextInt(12)}%02d-${1 + r.nextInt(28)}%02d"
    for (_ <- 0 until 300) {
      val a = d(); val b = d()
      val s = SimKernels.dateSimilarity(a, b)
      assert(s >= 0.0 && s <= 1.0)
      assert(math.abs(s - SimKernels.dateSimilarity(b, a)) < 1e-12)
      assert(SimKernels.dateSimilarity(a, a) == 1.0)
    }
  }

  test("MinHash signature agreement estimates true shingle jaccard (5 sigma)") {
    val r = rng
    val k = 5
    def shingleSet(t: String): Set[String] = {
      val toks = t.split(" ").toSeq
      if (toks.length <= k) Set(toks.mkString(" ")) else toks.sliding(k).map(_.mkString(" ")).toSet
    }
    for (_ <- 0 until 100) {
      val base = Seq.fill(40)(word(r))
      val ta = (base ++ Seq.fill(r.nextInt(13))(word(r))).mkString(" ")
      val tb = (base ++ Seq.fill(r.nextInt(13))(word(r))).mkString(" ")
      val (sa, sb) = (shingleSet(ta), shingleSet(tb))
      val jac = sa.intersect(sb).size.toDouble / sa.union(sb).size
      val ga = HashKernels.minhashWords(UTF8String.fromString(ta), k, 256, 42L)
      val gb = HashKernels.minhashWords(UTF8String.fromString(tb), k, 256, 42L)
      val est = ga.zip(gb).count { case (x, y) => x == y } / 256.0
      assert(math.abs(est - jac) < 0.16, s"est $est vs jaccard $jac") // 5*sigma at 256 hashes
    }
  }

  test("simhash: identical bags collide; near-dups closer than unrelated") {
    val r = rng
    def h(s: String) = HashKernels.simhashWords(UTF8String.fromString(s), 42L)
    def d(x: Long, y: Long) = java.lang.Long.bitCount(x ^ y)
    for (_ <- 0 until 100) {
      val base = Seq.fill(40)(word(r))
      val other = Seq.fill(40)(word(r))
      val a = base.mkString(" ")
      val shuffled = r.shuffle(base).mkString(" ")
      val nearDup = (base.take(38) ++ other.take(2)).mkString(" ")
      val far = other.mkString(" ")
      assert(d(h(a), h(shuffled)) == 0, "simhash must be order-invariant")
      assert(d(h(a), h(nearDup)) <= d(h(a), h(far)) + 8)
    }
  }

  test("winnowing guarantee: shared substring of length >= k+w-1 shares a fingerprint") {
    val r = rng
    for (_ <- 0 until 100) {
      val shared = Seq.fill(12)(word(r)).mkString(" ") // 59 chars > 24+8-1
      val a = s"${Seq.fill(8)(word(r)).mkString(" ")} $shared"
      val b = s"$shared ${Seq.fill(8)(word(r)).mkString(" ")}"
      val fa = HashKernels.winnowFingerprint(UTF8String.fromString(a), 24, 8).toSet
      val fb = HashKernels.winnowFingerprint(UTF8String.fromString(b), 24, 8).toSet
      assert(fa.intersect(fb).nonEmpty, s"no shared fingerprint for '$shared'")
    }
  }

  test("longest common substring: bounds and embedded-span exactness") {
    val r = rng
    for (_ <- 0 until 100) {
      val span = Seq.fill(6)(word(r)).mkString(" ")
      val a = s"${word(r)} $span ${word(r)}"
      val b = s"${word(r)}${word(r)} $span ${word(r)}"
      val lcs = graft.sim.SubstringKernels.longestCommonSubstring(a, b)
      assert(lcs >= span.length + 2) // span plus surrounding spaces
      assert(lcs <= math.min(a.length, b.length))
    }
  }
}
