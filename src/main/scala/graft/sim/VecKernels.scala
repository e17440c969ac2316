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
}
