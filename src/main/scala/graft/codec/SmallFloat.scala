package graft.codec

/**
 * Float-like byte encodings for positive integers that preserve ordering,
 * used to quantize per-document field lengths into one norm byte.
 *
 * Semantics match Lucene's norm-byte contract (reference:
 * lucene/core/src/java/org/apache/lucene/util/SmallFloat.java:101-169):
 * values below a small threshold are stored exactly; larger values keep 4
 * significant bits (3 stored + 1 implicit) plus a shift, so decode is the
 * largest representable value <= the original magnitude class. BM25 score
 * identity with the reference requires bit-exact agreement here.
 */
object SmallFloat {

  /** Encode a positive long keeping 4 significant bits; order-preserving. */
  def longToInt4(i: Long): Int = {
    require(i >= 0, s"Only supports positive values, got $i")
    val numBits = 64 - java.lang.Long.numberOfLeadingZeros(i)
    if (numBits < 4) i.toInt
    else {
      val shift = numBits - 4
      // top 4 bits with the leading (implicit) bit cleared, plus the shift
      (((i >>> shift).toInt) & 0x07) | ((shift + 1) << 3)
    }
  }

  /** Inverse of [[longToInt4]]. */
  def int4ToLong(i: Int): Long = {
    val bits = (i & 0x07).toLong
    val shift = (i >>> 3) - 1
    if (shift == -1) bits else (bits | 0x08L) << shift
  }

  private val MaxInt4 = longToInt4(Int.MaxValue)
  private val NumFreeValues = 255 - MaxInt4

  /** Encode a positive int to one byte: small values exact, larger 4-bit-mantissa. */
  def intToByte4(i: Int): Byte = {
    require(i >= 0, s"Only supports positive values, got $i")
    if (i < NumFreeValues) i.toByte
    else (NumFreeValues + longToInt4((i - NumFreeValues).toLong)).toByte
  }

  /** Inverse of [[intToByte4]] (decode is lossy-quantized for large values). */
  def byte4ToInt(b: Byte): Int = {
    val i = java.lang.Byte.toUnsignedInt(b)
    if (i < NumFreeValues) i
    else (NumFreeValues + int4ToLong(i - NumFreeValues)).toInt
  }
}
