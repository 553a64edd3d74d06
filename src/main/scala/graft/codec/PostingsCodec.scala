package graft.codec

import scala.collection.mutable.ArrayBuffer

/**
 * Block postings codec: docID delta-gaps + frame-of-reference bit packing,
 * one self-contained block per <=128 docs, with per-block competitive
 * (freq, norm) impact pairs for block-max pruning.
 *
 * Capability match (not a port) of the reference's block postings format:
 * lucene/core/src/java/org/apache/lucene/codecs/lucene50/
 * Lucene50PostingsFormat.java:44-260 (128-doc FOR blocks, d-gaps),
 * Lucene50SkipWriter.java:120-153 + CompetitiveImpactAccumulator.java:66-84
 * (per-block competitive impacts, dominance rule: a pair survives iff no
 * other pair has >= freq with <= norm).
 *
 * Differences by design (Spark-first): every block is independently
 * decodable (gaps are relative to the block's own minDoc, carried as a
 * column), so blocks are plain rows in a postings DataFrame — shuffle-safe,
 * splittable, and prunable via Parquet min/max column stats on
 * (term, minDoc, maxDoc). Skip lists are unnecessary: columnar stats + the
 * impacts column replace them.
 */
object PostingsCodec {
  val BlockSize = 128

  /** Bits needed to represent v (v >= 0); 0 for v == 0. */
  def bitsRequired(v: Long): Int = 64 - java.lang.Long.numberOfLeadingZeros(v)

  /** Pack values' low `width` bits big-endian into a byte array. width in [0,64]. */
  def packBits(values: Array[Long], width: Int): Array[Byte] = {
    if (width == 0) return Array.emptyByteArray
    val nBits = values.length * width
    val out = new Array[Byte]((nBits + 7) / 8)
    var bitPos = 0
    var i = 0
    while (i < values.length) {
      val v = values(i)
      var b = width - 1
      while (b >= 0) {
        if (((v >>> b) & 1L) != 0L) out(bitPos >> 3) = (out(bitPos >> 3) | (0x80 >> (bitPos & 7))).toByte
        bitPos += 1
        b -= 1
      }
      i += 1
    }
    out
  }

  /** Inverse of [[packBits]]. */
  def unpackBits(bytes: Array[Byte], n: Int, width: Int): Array[Long] = {
    val out = new Array[Long](n)
    if (width == 0) return out
    var bitPos = 0
    var i = 0
    while (i < n) {
      var v = 0L
      var b = 0
      while (b < width) {
        v = (v << 1) | ((bytes(bitPos >> 3) >> (7 - (bitPos & 7))) & 1L)
        bitPos += 1
        b += 1
      }
      out(i) = v
      i += 1
    }
    out
  }

  /** One packed block row. `docGaps` are deltas: docs(0)=minDoc, docs(i)=docs(i-1)+gap(i). */
  final case class Block(
      term: String,
      minDoc: Long,
      maxDoc: Long,
      n: Int,
      sumTf: Long,
      wDocs: Byte,
      wFreqs: Byte,
      docGaps: Array[Byte],
      freqs: Array[Byte],
      norms: Array[Byte],
      impactFreqs: Array[Int],
      impactNorms: Array[Byte])

  /**
   * Competitive impacts under the dominance rule: keep (freq, norm) iff no
   * other pair has freq' >= freq && unsigned(norm') <= unsigned(norm).
   * Returned sorted by freq asc (norm asc), like an upper-convex frontier.
   */
  def competitiveImpacts(freqs: Array[Int], norms: Array[Byte]): (Array[Int], Array[Byte]) = {
    // norm bytes compare unsigned: smaller decoded length => smaller unsigned byte
    val best = scala.collection.mutable.TreeMap.empty[Int, Int] // freq -> min unsigned norm
    var i = 0
    while (i < freqs.length) {
      val f = freqs(i)
      val u = norms(i) & 0xFF
      best.get(f) match {
        case Some(prev) if prev <= u => // dominated
        case _ => best.update(f, u)
      }
      i += 1
    }
    // frontier: as freq increases, keep only strictly decreasing norms? No —
    // a pair is dominated if some pair has >=freq and <=norm. Scan freqs
    // descending, keep pair iff its norm is strictly below the min seen.
    val fs = new ArrayBuffer[Int]()
    val ns = new ArrayBuffer[Byte]()
    var minNorm = Int.MaxValue
    best.toSeq.reverseIterator.foreach { case (f, u) =>
      if (u < minNorm) { fs += f; ns += u.toByte; minNorm = u }
    }
    (fs.reverseIterator.toArray, ns.reverseIterator.toArray)
  }

  /** Encode one term's postings (sorted by docId asc) into <=128-doc blocks. */
  def encodeTerm(term: String, docs: Array[Long], freqs: Array[Int], norms: Array[Byte]): Seq[Block] = {
    require(docs.length == freqs.length && docs.length == norms.length)
    val out = new ArrayBuffer[Block]()
    var s = 0
    while (s < docs.length) {
      val e = math.min(s + BlockSize, docs.length)
      out += encodeBlock(term, docs, freqs, norms, s, e)
      s = e
    }
    out.toSeq
  }

  def encodeBlock(term: String, docs: Array[Long], freqs: Array[Int], norms: Array[Byte],
                  from: Int, until: Int): Block = {
    val n = until - from
    val minDoc = docs(from)
    val maxDoc = docs(until - 1)
    val gaps = new Array[Long](n - 1)
    var i = 1
    var maxGap = 0L
    var sumTf = 0L
    while (i < n) {
      val g = docs(from + i) - docs(from + i - 1)
      gaps(i - 1) = g
      if (g > maxGap) maxGap = g
      i += 1
    }
    val fs = new Array[Long](n)
    var maxF = 0L
    i = 0
    while (i < n) {
      fs(i) = freqs(from + i).toLong
      sumTf += fs(i)
      if (fs(i) > maxF) maxF = fs(i)
      i += 1
    }
    val wD = bitsRequired(maxGap)
    val wF = bitsRequired(maxF)
    val blockNorms = java.util.Arrays.copyOfRange(norms, from, until)
    val blockFreqInts = java.util.Arrays.copyOfRange(freqs, from, until)
    val (impF, impN) = competitiveImpacts(blockFreqInts, blockNorms)
    Block(term, minDoc, maxDoc, n, sumTf, wD.toByte, wF.toByte,
      packBits(gaps, wD), packBits(fs, wF), blockNorms, impF, impN)
  }

  /** Decode a block into parallel (docIds, freqs, norms). */
  def decodeBlock(minDoc: Long, n: Int, wDocs: Int, wFreqs: Int,
                  docGaps: Array[Byte], freqs: Array[Byte]): (Array[Long], Array[Int]) = {
    val gaps = unpackBits(docGaps, n - 1, wDocs)
    val docs = new Array[Long](n)
    docs(0) = minDoc
    var i = 1
    while (i < n) { docs(i) = docs(i - 1) + gaps(i - 1); i += 1 }
    val fs = unpackBits(freqs, n, wFreqs)
    val fi = new Array[Int](n)
    i = 0
    while (i < n) { fi(i) = fs(i).toInt; i += 1 }
    (docs, fi)
  }
}
