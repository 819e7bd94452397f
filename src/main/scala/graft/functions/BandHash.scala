package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Native LSH band hashing: one bucket id per contiguous `rowsPerBand` slice
  * of a signature, seeded by the band index.
  *
  * Equivalent in role to `transform(sequence(0, nBands-1),
  * b -> xxhash64(slice(sig, b*r+1, r), b))` but a single pass with zero
  * per-band array allocation (the HOF form materializes nBands slice copies
  * per row). Bucket values are engine-internal (only grouped on, never
  * compared to an oracle), so the mix function just needs avalanche —
  * this is the murmur3 fmix64 finalizer chained across the band's values.
  */
object BandHashImpl {

  @inline private def fmix64(x0: Long): Long = {
    var x = x0
    x ^= x >>> 33; x *= 0xff51afd7ed558ccdL
    x ^= x >>> 33; x *= 0xc4ceb9fe1a85ec53L
    x ^= x >>> 33
    x
  }

  def hashes(sig: ArrayData, nBands: Int, rowsPerBand: Int): ArrayData = {
    val out = new Array[Long](nBands)
    var b = 0
    while (b < nBands) {
      var h = fmix64(b.toLong + 0x9e3779b97f4a7c15L)
      var j = b * rowsPerBand
      val end = j + rowsPerBand
      while (j < end) {
        h = fmix64(h ^ sig.getLong(j))
        j += 1
      }
      out(b) = h
      b += 1
    }
    new GenericArrayData(out)
  }
}

/** `band_hashes(array<bigint>, nBands, rowsPerBand)` -> `array<bigint>`. */
case class BandHash(child: Expression, nBands: Int, rowsPerBand: Int)
    extends UnaryExpression {
  require(nBands > 0 && rowsPerBand > 0, "band_hashes: bands and rows must be positive")
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "band_hashes"

  override def nullSafeEval(input: Any): Any =
    BandHashImpl.hashes(input.asInstanceOf[ArrayData], nBands, rowsPerBand)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.BandHashImpl.hashes($c, $nBands, $rowsPerBand)")

  override protected def withNewChildInternal(newChild: Expression): BandHash =
    copy(child = newChild)
}

object BandHash {
  def bandHashes(sig: Column, nBands: Int, rowsPerBand: Int): Column =
    Bridge.column(BandHash(Bridge.expression(sig), nBands, rowsPerBand))
}
