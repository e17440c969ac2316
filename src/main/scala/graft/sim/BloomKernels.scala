package graft.sim

import java.io.ByteArrayInputStream

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.util.sketch.BloomFilter

/** `mightContain` probe over a serialized Spark [[BloomFilter]] — the
  * map-only membership test the crawl-frontier filter uses to skip the
  * exact seen-set join for definitely-new urls
  * ([[graft.web.Frontier]]).
  *
  * The filter bytes ride the expression (one copy per task via the
  * codegen reference table, NOT per row); deserialization is lazy and
  * happens once per task. Hashing contract: Spark's
  * `DataFrameStatFunctions.bloomFilter` puts strings as their UTF-8
  * bytes (`BloomFilterImpl.putString` == `putBinary(utf8)`), and
  * `UTF8String.getBytes` yields the same bytes, so probe == build by
  * construction. No false negatives, `fpp` false positives.
  */
case class BloomMightContain(child: Expression, bloomBytes: Array[Byte])
    extends UnaryExpression {
  override def dataType: DataType = BooleanType
  override def nullIntolerant: Boolean = true
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"bloom_might_contain needs a string child, got ${child.dataType}")

  @transient private lazy val bf: BloomFilter =
    BloomFilter.readFrom(new ByteArrayInputStream(bloomBytes))

  /** Public entry for generated code. */
  def mightContain(bytes: Array[Byte]): Boolean = bf.mightContainBinary(bytes)

  override protected def nullSafeEval(v: Any): Any =
    mightContain(v.asInstanceOf[UTF8String].getBytes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("graftBloom", this, classOf[BloomMightContain].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.mightContain($c.getBytes());")
  }

  override def prettyName: String = "bloom_might_contain"
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
