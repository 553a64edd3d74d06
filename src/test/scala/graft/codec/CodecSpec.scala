package graft.codec

import org.scalatest.funsuite.AnyFunSuite
import scala.util.Random

class SmallFloatSpec extends AnyFunSuite {
  test("small values are exact (below the free-value threshold)") {
    (0 until 24).foreach(i => assert(SmallFloat.byte4ToInt(SmallFloat.intToByte4(i)) === i))
  }
  test("decode is order-preserving over all 256 bytes") {
    var prev = -1
    (0 until 256).foreach { i =>
      val v = SmallFloat.byte4ToInt(i.toByte)
      assert(v > prev, s"byte $i not monotone")
      prev = v
    }
  }
  test("encode/decode idempotent: decode(encode(decode(b))) == decode(b)") {
    (0 until 256).foreach { i =>
      val v = SmallFloat.byte4ToInt(i.toByte)
      assert(SmallFloat.byte4ToInt(SmallFloat.intToByte4(v)) === v)
    }
  }
  test("encode never exceeds the value (quantization rounds down), random") {
    val rnd = new Random(42)
    (0 until 5000).foreach { _ =>
      val i = rnd.nextInt(Int.MaxValue)
      assert(SmallFloat.byte4ToInt(SmallFloat.intToByte4(i)) <= i)
    }
  }
  test("encode is monotone non-decreasing, random pairs") {
    val rnd = new Random(7)
    (0 until 5000).foreach { _ =>
      val a = rnd.nextInt(1 << 24); val b = rnd.nextInt(1 << 24)
      val (lo, hi) = if (a <= b) (a, b) else (b, a)
      assert((SmallFloat.intToByte4(lo) & 0xFF) <= (SmallFloat.intToByte4(hi) & 0xFF))
    }
  }
}

class PackBitsSpec extends AnyFunSuite {
  test("pack/unpack round trip at every width") {
    (0 to 64).foreach { w =>
      val max = if (w == 0) 0L else if (w == 64) Long.MaxValue else (1L << w) - 1
      val vals = Array(0L, max, max / 2, 1L.min(max), max / 3)
      val packed = PostingsCodec.packBits(vals, w)
      assert(PostingsCodec.unpackBits(packed, vals.length, w).toSeq === vals.toSeq)
    }
  }
  test("random round trips at random widths and lengths") {
    val rnd = new Random(42)
    (0 until 300).foreach { _ =>
      val w = 1 + rnd.nextInt(63)
      val n = 1 + rnd.nextInt(300)
      val mask = (1L << w) - 1
      val vals = Array.fill(n)(rnd.nextLong() & mask)
      val out = PostingsCodec.unpackBits(PostingsCodec.packBits(vals, w), n, w)
      assert(out.toSeq === vals.toSeq)
    }
  }
}

class BlockCodecSpec extends AnyFunSuite {
  private def randomDocs(rnd: Random, n: Int): Array[Long] = {
    var cur = rnd.nextLong() & ((1L << 40) - 1)
    Array.fill(n) {
      val v = cur
      cur += (rnd.nextInt(3) match {
        case 0 => 1L + rnd.nextInt(10)
        case 1 => 1L + rnd.nextInt(100000)
        case _ => 1L + (rnd.nextLong() & ((1L << 35) - 1))
      })
      v
    }
  }

  test("encode/decode round trip over random posting lists (singleton, <128, >128 docs)") {
    val rnd = new Random(42)
    (Seq(1, 2, 127, 128, 129, 400) ++ Seq.fill(50)(1 + rnd.nextInt(500))).foreach { n =>
      val docs = randomDocs(rnd, n)
      val freqs = docs.indices.map(i => 1 + (i * 7) % 300).toArray
      val norms = docs.indices.map(i => ((i * 13) % 256).toByte).toArray
      val blocks = PostingsCodec.encodeTerm("t", docs, freqs, norms)
      assert(blocks.forall(_.n <= PostingsCodec.BlockSize))
      assert(blocks.map(_.n).sum === n)
      assert(blocks.map(_.sumTf).sum === freqs.map(_.toLong).sum)
      val decoded = blocks.flatMap { b =>
        val (ds, fs) = PostingsCodec.decodeBlock(b.minDoc, b.n, b.wDocs, b.wFreqs, b.docGaps, b.freqs)
        assert(ds.head === b.minDoc && ds.last === b.maxDoc)
        ds.zip(fs).zip(b.norms)
      }
      assert(decoded.map(_._1._1).toSeq === docs.toSeq)
      assert(decoded.map(_._1._2).toSeq === freqs.toSeq)
      assert(decoded.map(_._2).toSeq === norms.toSeq)
    }
  }

  test("competitive impacts: every posting dominated by a survivor; no survivor dominated") {
    val rnd = new Random(7)
    (0 until 200).foreach { _ =>
      val n = 1 + rnd.nextInt(150)
      val freqs = Array.fill(n)(1 + rnd.nextInt(50))
      val norms = Array.fill(n)(rnd.nextInt(256).toByte)
      val (fs, ns) = PostingsCodec.competitiveImpacts(freqs, norms)
      val pairs = fs.zip(ns.map(_ & 0xFF)).toSeq
      freqs.zip(norms.map(_ & 0xFF)).foreach { case (f, u) =>
        assert(pairs.exists { case (pf, pu) => pf >= f && pu <= u })
      }
      pairs.foreach { p =>
        assert(!pairs.exists(q => q != p && q._1 >= p._1 && q._2 <= p._2))
      }
    }
  }

  test("normQuantBuckets range rule == SmallFloat byte4 round-trip for every dl") {
    // the derived-oracle bucket table (TextOps.normQuantBuckets, embedded
    // in the ft_engine_topk/wand oracle SQL as VALUES) must quantize dl
    // exactly as the engine's norm byte round-trip does
    val buckets = graft.operators.TextOps.normQuantBuckets
    assert(buckets.size == 256)
    def lookup(dl: Long): Long =
      buckets.find(bkt => dl >= bkt._1 && dl <= bkt._2).get._3
    ((0 to 4096) ++ (4097 to 300000 by 13)).foreach { dl =>
      val q = SmallFloat.byte4ToInt(SmallFloat.intToByte4(dl)).toLong
      assert(q == lookup(dl.toLong), s"dl=$dl")
    }
  }
}
