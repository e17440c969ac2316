package graft.sim

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Longest-common-substring kernels for the shared-span dedup pass.
  *
  * Candidate pairs come from the winnowing-fingerprint join (the
  * distributed equivalent of the reference survey's "suffix-array
  * substring pass" — a per-partition suffix array cannot see
  * cross-partition pairs, whereas winnowed k-gram hashes shuffle-join
  * globally); candidates are then verified EXACTLY here with a
  * suffix-automaton LCS in O(|a|+|b|) per pair.
  */
object SubstringKernels {

  /** Length (in code points) of the longest common substring of a and b,
    * via a suffix automaton built over the shorter string.
    */
  def longestCommonSubstring(s1: String, s2: String): Int = {
    val a0 = s1.codePoints().toArray
    val b0 = s2.codePoints().toArray
    if (a0.length == 0 || b0.length == 0) return 0
    val (a, b) = if (a0.length <= b0.length) (a0, b0) else (b0, a0)

    // suffix automaton over `a`
    val maxN = 2 * a.length + 4
    val len = new Array[Int](maxN)
    val link = new Array[Int](maxN)
    val trans = new Array[java.util.HashMap[Integer, Integer]](maxN)
    var last = 0
    var size = 1
    len(0) = 0; link(0) = -1; trans(0) = new java.util.HashMap[Integer, Integer]()
    var i = 0
    while (i < a.length) {
      val c = a(i)
      val cur = size; size += 1
      len(cur) = len(last) + 1
      trans(cur) = new java.util.HashMap[Integer, Integer]()
      var p = last
      while (p != -1 && !trans(p).containsKey(c)) {
        trans(p).put(c, cur); p = link(p)
      }
      if (p == -1) link(cur) = 0
      else {
        val q = trans(p).get(c)
        if (len(p) + 1 == len(q)) link(cur) = q
        else {
          val clone = size; size += 1
          len(clone) = len(p) + 1
          link(clone) = link(q)
          trans(clone) = new java.util.HashMap[Integer, Integer](trans(q))
          while (p != -1 && trans(p).containsKey(c) && trans(p).get(c) == q) {
            trans(p).put(c, clone); p = link(p)
          }
          link(q) = clone
          link(cur) = clone
        }
      }
      last = cur
      i += 1
    }

    // walk `b` through the automaton
    var v = 0
    var l = 0
    var best = 0
    i = 0
    while (i < b.length) {
      val c = b(i)
      while (v != 0 && !trans(v).containsKey(c)) {
        v = link(v); l = len(v)
      }
      if (trans(v).containsKey(c)) { v = trans(v).get(c); l += 1 }
      if (l > best) best = l
      i += 1
    }
    best
  }
}

/** Column expression: longest common substring length (code points). */
case class LongestCommonSubstring(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = IntegerType
  override def nullIntolerant: Boolean = true
  override protected def nullSafeEval(l: Any, r: Any): Any =
    SubstringKernels.longestCommonSubstring(
      l.asInstanceOf[UTF8String].toString, r.asInstanceOf[UTF8String].toString)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.sim.SubstringKernels.longestCommonSubstring($a.toString(), $b.toString());")
  override def prettyName: String = "longest_common_substring"
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}
