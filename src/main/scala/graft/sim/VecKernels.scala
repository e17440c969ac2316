package graft.sim

import org.apache.spark.sql.catalyst.util.ArrayData

/** Embedding-vector kernels: tight no-allocation loops called from the
  * codegen'd VecDot expression. Semantics are pinned to the Column
  * composition they replace (`aggregate(zip_with(a, b, _ * _), 0.0,
  * _ + _)` with per-element double casts): sequential left-to-right
  * double accumulation — bit-identical results — and null on length
  * mismatch or any null element (zip_with pads/propagates null, which
  * nulls the whole sum).
  */
object VecKernels {

  def dotF(a: ArrayData, b: ArrayData): java.lang.Double = {
    val n = a.numElements()
    if (b.numElements() != n) return null
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      acc += a.getFloat(i).toDouble * b.getFloat(i).toDouble
      i += 1
    }
    java.lang.Double.valueOf(acc)
  }

  def dotD(a: ArrayData, b: ArrayData): java.lang.Double = {
    val n = a.numElements()
    if (b.numElements() != n) return null
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      acc += a.getDouble(i) * b.getDouble(i)
      i += 1
    }
    java.lang.Double.valueOf(acc)
  }

  /** MinHash signature agreement: fraction of slots where two long
    * arrays hold the same non-null value, divided by the LEFT array's
    * size. Semantics pinned to the Column composition it replaces
    * (`aggregate(zip_with(a, b, (x,y) => when(x===y,1).otherwise(0)),
    * 0, _+_) / size(a)`, asserted in FusedKernelsSpec): zip_with pads
    * the shorter array with nulls and `when` sends a null comparison to
    * the 0 branch, so mismatched lengths and null slots count as
    * disagreement — never null; an empty left array divides 0 by 0 to
    * NaN exactly like the composition.
    */
  def sigAgree(a: ArrayData, b: ArrayData): Double = {
    val na = a.numElements()
    val nb = b.numElements()
    val n = if (na < nb) na else nb
    var agree = 0
    var i = 0
    while (i < n) {
      if (!a.isNullAt(i) && !b.isNullAt(i) && a.getLong(i) == b.getLong(i)) agree += 1
      i += 1
    }
    agree.toDouble / na.toDouble
  }
}
