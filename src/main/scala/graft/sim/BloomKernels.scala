package graft.sim

import java.io.ByteArrayInputStream

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.util.sketch.BloomFilter

/** Per-executor cache of deserialized Bloom filters, keyed by the
  * broadcast id. A multi-GB frontier filter (1.2 GB per 10^9 urls at
  * 1% fpp) must deserialize ONCE per executor, not once per task —
  * expression instances are task-local, so their lazy fields alone
  * would re-run `readFrom` per task and transiently double the heap
  * per concurrent task. Entries live for the executor's lifetime
  * (the artifact pattern: one filter per base generation); `drop`
  * exists for long-lived sessions cycling many generations.
  */
object BloomCache {
  private val cache = new java.util.concurrent.ConcurrentHashMap[Long, BloomFilter]()
  def get(ref: Broadcast[Array[Byte]]): BloomFilter =
    cache.computeIfAbsent(ref.id,
      _ => BloomFilter.readFrom(new ByteArrayInputStream(ref.value)))
  def drop(ref: Broadcast[Array[Byte]]): Unit = { cache.remove(ref.id); () }
}

/** `mightContain` probe over a BROADCAST serialized Spark
  * [[BloomFilter]] — the map-only membership test the crawl-frontier
  * filter uses to skip the exact seen-set join for definitely-new
  * urls ([[graft.web.Frontier]]).
  *
  * The filter bytes ship once per executor (broadcast), deserialize
  * once per executor ([[BloomCache]]), and the expression carries only
  * the broadcast handle. Hashing contract: Spark's
  * `DataFrameStatFunctions.bloomFilter` puts strings as their UTF-8
  * bytes (`BloomFilterImpl.putString` == `putBinary(utf8)`), and
  * `UTF8String.getBytes` yields the same bytes, so probe == build by
  * construction. No false negatives, `fpp` false positives.
  */
case class BloomMightContain(child: Expression, bloomRef: Broadcast[Array[Byte]])
    extends UnaryExpression {
  override def dataType: DataType = BooleanType
  override def nullIntolerant: Boolean = true
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"bloom_might_contain needs a string child, got ${child.dataType}")

  @transient private lazy val bf: BloomFilter = BloomCache.get(bloomRef)

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
