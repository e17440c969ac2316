package graft.sim

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Custom Catalyst expressions for the kernels Spark lacks. Each stays
  * inside whole-stage codegen by emitting a single static call into
  * graft.sim.{SimKernels,HashKernels} (the same pattern Spark's own
  * `Levenshtein`/`XxHash64` use). Null semantics: null-intolerant —
  * any null input -> null output; empty-string semantics live in the
  * kernels (both-empty -> 1.0 etc., /root/reference/src/algorithms.py).
  */
trait SimBinaryStringDouble extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true
  /** fully-qualified static kernel, e.g. "graft.sim.SimKernels.jaroWinkler" */
  def kernel: String
  def compute(a: String, b: String): Double
  override protected def nullSafeEval(l: Any, r: Any): Any =
    compute(l.asInstanceOf[UTF8String].toString, r.asInstanceOf[UTF8String].toString)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = $kernel($a.toString(), $b.toString());")
}

case class JaroWinklerSim(left: Expression, right: Expression) extends SimBinaryStringDouble {
  override def kernel: String = "graft.sim.SimKernels.jaroWinkler"
  override def compute(a: String, b: String): Double = SimKernels.jaroWinkler(a, b)
  override def prettyName: String = "jaro_winkler_sim"
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

case class TokenSetRatioSim(left: Expression, right: Expression) extends SimBinaryStringDouble {
  override def kernel: String = "graft.sim.SimKernels.tokenSetRatio"
  override def compute(a: String, b: String): Double = SimKernels.tokenSetRatio(a, b)
  override def prettyName: String = "token_set_ratio"
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

case class TokenSortRatioSim(left: Expression, right: Expression) extends SimBinaryStringDouble {
  override def kernel: String = "graft.sim.SimKernels.tokenSortRatio"
  override def compute(a: String, b: String): Double = SimKernels.tokenSortRatio(a, b)
  override def prettyName: String = "token_sort_ratio"
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

case class DateSim(left: Expression, right: Expression) extends SimBinaryStringDouble {
  override def kernel: String = "graft.sim.SimKernels.dateSimilarity"
  override def compute(a: String, b: String): Double = SimKernels.dateSimilarity(a, b)
  override def prettyName: String = "date_sim"
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** MinHash signature over an array<string> of shingles; returns
  * array<long> of length numHashes, or null for an empty shingle set.
  * Hash family pinned by (numHashes, seed) — see HashKernels.minhash.
  */
case class MinHashSignature(child: Expression, numHashes: Int, seed: Long)
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true
  override def nullIntolerant: Boolean = true
  override protected def nullSafeEval(v: Any): Any = {
    val arr = HashKernels.minhash(v.asInstanceOf[ArrayData], numHashes, seed)
    if (arr == null) null else UnsafeArrayData.fromPrimitiveArray(arr)
  }
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val tmp = ctx.freshName("mh")
    nullSafeCodeGen(ctx, ev, a => s"""
      long[] $tmp = graft.sim.HashKernels.minhash($a, $numHashes, ${seed}L);
      if ($tmp == null) { ${ev.isNull} = true; } else {
        ${ev.value} = org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray($tmp);
      }""")
  }
  override def prettyName: String = "minhash_signature"
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** 64-bit SimHash over an array<string> of tokens. */
case class SimHash64(child: Expression, seed: Long)
    extends UnaryExpression {
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override protected def nullSafeEval(v: Any): Any =
    HashKernels.simhash(v.asInstanceOf[ArrayData], seed)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.sim.HashKernels.simhash($a, ${seed}L);")
  override def prettyName: String = "simhash64"
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** Fused one-pass MinHash over word k-shingles of (pre-normalized,
  * single-spaced) text — byte-identical results to
  * MinHashSignature(word_shingles(text, k)) with zero per-shingle
  * allocation (shingles are contiguous byte ranges of the text).
  */
case class MinHashWords(child: Expression, k: Int, numHashes: Int, seed: Long)
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true
  override def nullIntolerant: Boolean = true
  override protected def nullSafeEval(v: Any): Any = {
    val arr = HashKernels.minhashWords(v.asInstanceOf[UTF8String], k, numHashes, seed)
    if (arr == null) null else UnsafeArrayData.fromPrimitiveArray(arr)
  }
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val tmp = ctx.freshName("mhw")
    nullSafeCodeGen(ctx, ev, a => s"""
      long[] $tmp = graft.sim.HashKernels.minhashWords($a, $k, $numHashes, ${seed}L);
      if ($tmp == null) { ${ev.isNull} = true; } else {
        ${ev.value} = org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray($tmp);
      }""")
  }
  override def prettyName: String = "minhash_words"
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** Fused distinct word-shingle hashes (sorted array<long>). */
case class ShingleHashes(child: Expression, k: Int, seed: Long)
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override protected def nullSafeEval(v: Any): Any =
    UnsafeArrayData.fromPrimitiveArray(
      HashKernels.shingleHashesWords(v.asInstanceOf[UTF8String], k, seed))
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => s"""
      ${ev.value} = org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray(
        graft.sim.HashKernels.shingleHashesWords($a, $k, ${seed}L));""")
  override def prettyName: String = "shingle_hashes"
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** Fused one-pass MinHash over character k-shingles (code-point
  * windows) — the CJK/short-text analogue of [[MinHashWords]].
  * Byte-identical to MinHashSignature(char_shingles(text, k)) with
  * zero per-shingle allocation.
  */
case class MinHashChars(child: Expression, k: Int, numHashes: Int, seed: Long)
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true
  override def nullIntolerant: Boolean = true
  override protected def nullSafeEval(v: Any): Any = {
    val arr = HashKernels.minhashChars(v.asInstanceOf[UTF8String], k, numHashes, seed)
    if (arr == null) null else UnsafeArrayData.fromPrimitiveArray(arr)
  }
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val tmp = ctx.freshName("mhc")
    nullSafeCodeGen(ctx, ev, a => s"""
      long[] $tmp = graft.sim.HashKernels.minhashChars($a, $k, $numHashes, ${seed}L);
      if ($tmp == null) { ${ev.isNull} = true; } else {
        ${ev.value} = org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray($tmp);
      }""")
  }
  override def prettyName: String = "minhash_chars"
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** Fused distinct char-shingle hashes (sorted array<long>). */
case class ShingleHashesChars(child: Expression, k: Int, seed: Long)
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override protected def nullSafeEval(v: Any): Any =
    UnsafeArrayData.fromPrimitiveArray(
      HashKernels.shingleHashesChars(v.asInstanceOf[UTF8String], k, seed))
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => s"""
      ${ev.value} = org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray(
        graft.sim.HashKernels.shingleHashesChars($a, $k, ${seed}L));""")
  override def prettyName: String = "shingle_hashes_chars"
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** Fused SimHash over whitespace tokens of (pre-normalized) text. */
case class SimHashWords(child: Expression, seed: Long)
    extends UnaryExpression {
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override protected def nullSafeEval(v: Any): Any =
    HashKernels.simhashWords(v.asInstanceOf[UTF8String], seed)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.sim.HashKernels.simhashWords($a, ${seed}L);")
  override def prettyName: String = "simhash_words"
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** Winnowing fingerprint: array<long> of selected k-gram hashes. */
case class WinnowFingerprint(child: Expression, k: Int, window: Int)
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override protected def nullSafeEval(v: Any): Any =
    UnsafeArrayData.fromPrimitiveArray(
      HashKernels.winnowFingerprint(v.asInstanceOf[UTF8String], k, window))
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => s"""
      ${ev.value} = org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray(
        graft.sim.HashKernels.winnowFingerprint($a, $k, $window));""")
  override def prettyName: String = "winnow_fingerprint"
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** Dot product of two same-length float/double arrays, accumulated in
  * double, sequential order — the codegen'd replacement for
  * `aggregate(zip_with(a, b, _*_), 0.0, _+_)` (bit-identical values,
  * no per-pair array allocation). Null on null input, length mismatch,
  * or a null element (the zip_with composition's semantics).
  */
case class VecDot(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def nullIntolerant: Boolean = true
  private def isFloat: Boolean =
    left.dataType.asInstanceOf[ArrayType].elementType == FloatType
  private def kernel: String =
    if (isFloat) "graft.sim.VecKernels.dotF" else "graft.sim.VecKernels.dotD"
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(a, _), ArrayType(b, _))
          if a == b && (a == FloatType || a == DoubleType) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case _ => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"vec_dot needs two array<float> or two array<double>, got " +
          s"${left.dataType.simpleString} and ${right.dataType.simpleString}")
    }
  override protected def nullSafeEval(l: Any, r: Any): Any = {
    val v =
      if (isFloat) VecKernels.dotF(l.asInstanceOf[ArrayData], r.asInstanceOf[ArrayData])
      else VecKernels.dotD(l.asInstanceOf[ArrayData], r.asInstanceOf[ArrayData])
    if (v == null) null else v.doubleValue()
  }
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val tmp = ctx.freshName("vd")
    nullSafeCodeGen(ctx, ev, (a, b) => s"""
      java.lang.Double $tmp = $kernel($a, $b);
      if ($tmp == null) { ${ev.isNull} = true; }
      else { ${ev.value} = $tmp.doubleValue(); }""")
  }
  override def prettyName: String = "vec_dot"
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** MinHash signature agreement over two array<long> columns — the
  * verify-stage hot kernel (see VecKernels.sigAgree for the pinned
  * composition semantics). Codegen'd single static call; the zip_with +
  * aggregate composition it replaces allocated a numHashes-element
  * array per candidate pair.
  */
case class SigAgree(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = left.nullable || right.nullable
  override def nullIntolerant: Boolean = true
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(LongType, _), ArrayType(LongType, _)) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case _ => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"sig_agree needs two array<long>, got " +
          s"${left.dataType.simpleString} and ${right.dataType.simpleString}")
    }
  override protected def nullSafeEval(l: Any, r: Any): Any =
    VecKernels.sigAgree(l.asInstanceOf[ArrayData], r.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.sim.VecKernels.sigAgree($a, $b);")
  override def prettyName: String = "sig_agree"
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}
