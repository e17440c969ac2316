package graft.sim

import java.io.{ByteArrayOutputStream, DataOutputStream}
import java.nio.ByteBuffer
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Bounded top-k buffer for [[TopKSimAgg]]: keeps the k best
  * (sim, id) pairs under the ordering (sim DESC, id ASC) — exactly the
  * `row_number() over (order by sim desc, id asc) <= k` selection, with
  * `java.lang.Double.compare` semantics so -0.0/0.0/NaN order exactly
  * like Spark's double sort. Array-backed binary heap with the WORST
  * kept element at the root, so a full buffer rejects a non-improving
  * row with one comparison.
  */
final class TopKBuffer(val k: Int) {
  val sims = new Array[Double](k)
  val ids = new Array[Long](k)
  var size = 0

  /** a strictly worse than b under (sim desc, id asc)? */
  @inline private def worse(sa: Double, ia: Long, sb: Double, ib: Long): Boolean = {
    val c = java.lang.Double.compare(sa, sb)
    c < 0 || (c == 0 && ia > ib)
  }

  private def siftUp(i0: Int): Unit = {
    var i = i0
    while (i > 0) {
      val p = (i - 1) >> 1
      if (worse(sims(i), ids(i), sims(p), ids(p))) {
        val ts = sims(i); val ti = ids(i)
        sims(i) = sims(p); ids(i) = ids(p)
        sims(p) = ts; ids(p) = ti
        i = p
      } else return
    }
  }

  private def siftDown(): Unit = {
    var i = 0
    while (true) {
      val l = 2 * i + 1
      val r = l + 1
      var w = i
      if (l < size && worse(sims(l), ids(l), sims(w), ids(w))) w = l
      if (r < size && worse(sims(r), ids(r), sims(w), ids(w))) w = r
      if (w == i) return
      val ts = sims(i); val ti = ids(i)
      sims(i) = sims(w); ids(i) = ids(w)
      sims(w) = ts; ids(w) = ti
      i = w
    }
  }

  def insert(sim: Double, id: Long): Unit =
    if (size < k) {
      sims(size) = sim; ids(size) = id
      size += 1
      siftUp(size - 1)
    } else if (worse(sims(0), ids(0), sim, id)) {
      sims(0) = sim; ids(0) = id
      siftDown()
    }

  /** kept entries ordered best-first: (sim desc, id asc) */
  def sorted: Array[(Double, Long)] = {
    val out = new Array[(Double, Long)](size)
    var i = 0
    while (i < size) { out(i) = (sims(i), ids(i)); i += 1 }
    scala.util.Sorting.stableSort(out, (a: (Double, Long), b: (Double, Long)) => {
      val c = java.lang.Double.compare(b._1, a._1) // sim desc
      c < 0 || (c == 0 && a._2 < b._2)             // id asc
    })
    out
  }
}

/** Partial-aggregating exact top-k: per group, the k best (id, sim)
  * rows under (sim DESC, id ASC), returned as an
  * array<struct<id:long, sim:double>> in rank order. Drop-in exact
  * replacement for the `row_number() over (partition by g order by
  * sim desc, id asc) <= k` window (guide §2.3 "aggregate before you
  * shuffle"): each map partition reduces to at most k entries per
  * group BEFORE the exchange and nothing ever sorts the full scored
  * table — the window form paid a full local sort below its group
  * limit (measured: 5.5 s of the 8.9 s brute-force ANN row at the
  * 256k-vector bench corpus). Null sims or ids never arise from the
  * scorers (cosine is null-guarded); defensively, null inputs are
  * skipped like a window's filtered row would be.
  */
case class TopKSimAgg(
    idExpr: Expression,
    simExpr: Expression,
    k: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[TopKBuffer]
  with org.apache.spark.sql.catalyst.trees.BinaryLike[Expression] {

  require(k >= 1, s"top-k needs k >= 1, got $k")
  override def left: Expression = idExpr
  override def right: Expression = simExpr

  override def dataType: DataType = ArrayType(
    StructType(Seq(StructField("id", LongType, nullable = false),
      StructField("sim", DoubleType, nullable = false))), containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "topk_sim"

  override def createAggregationBuffer(): TopKBuffer = new TopKBuffer(k)

  override def update(buf: TopKBuffer, input: InternalRow): TopKBuffer = {
    val id = idExpr.eval(input)
    if (id != null) {
      val sim = simExpr.eval(input)
      if (sim != null)
        buf.insert(sim.asInstanceOf[Double], id.asInstanceOf[Long])
    }
    buf
  }

  override def merge(buf: TopKBuffer, other: TopKBuffer): TopKBuffer = {
    var i = 0
    while (i < other.size) { buf.insert(other.sims(i), other.ids(i)); i += 1 }
    buf
  }

  override def eval(buf: TopKBuffer): Any = {
    val s = buf.sorted
    new GenericArrayData(s.map { case (sim, id) =>
      InternalRow(id, sim)
    }.toIndexedSeq)
  }

  override def serialize(buf: TopKBuffer): Array[Byte] = {
    val bos = new ByteArrayOutputStream(8 + buf.size * 16)
    val out = new DataOutputStream(bos)
    out.writeInt(buf.k)
    out.writeInt(buf.size)
    var i = 0
    while (i < buf.size) {
      out.writeDouble(buf.sims(i)); out.writeLong(buf.ids(i)); i += 1
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): TopKBuffer = {
    val in = ByteBuffer.wrap(bytes)
    val kk = in.getInt
    val n = in.getInt
    val buf = new TopKBuffer(kk)
    var i = 0
    while (i < n) {
      val s = in.getDouble
      val id = in.getLong
      buf.insert(s, id)
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKSimAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKSimAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(l: Expression, r: Expression): TopKSimAgg =
    copy(idExpr = l, simExpr = r)
}
