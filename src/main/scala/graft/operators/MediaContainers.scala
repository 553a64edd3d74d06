package graft.operators

import java.nio.ByteBuffer

/**
 * Pure-JVM video CONTAINER metadata: ISO BMFF (MP4, ISO/IEC 14496-12) box
 * parsing and Matroska/WebM EBML parsing, so `n_frames` / `duration_s` /
 * `width` / `height` for video mimes come from the real file structure
 * while FRAME DECODE stays stubbed (no video codec ships with the JDK —
 * the container layout is a public spec and needs none).
 *
 * Reference capability: the reference indexes video assets only as opaque
 * stored fields; this closes the "video metadata is fake" gap flagged for
 * `Multimodal.decodeStub` without adding a codec dependency.
 *
 * Parsing is defensive: malformed/truncated structures throw
 * IllegalArgumentException (callers route to the stub), never read past
 * the payload, and cap recursion by box nesting depth.
 */
object MediaContainers {

  // ------------------------------------------------------------------ MP4

  private def u16(p: Array[Byte], off: Int): Int =
    ((p(off) & 0xFF) << 8) | (p(off + 1) & 0xFF)
  private def u32(p: Array[Byte], off: Int): Long =
    ((p(off) & 0xFFL) << 24) | ((p(off + 1) & 0xFFL) << 16) |
      ((p(off + 2) & 0xFFL) << 8) | (p(off + 3) & 0xFFL)
  private def u64(p: Array[Byte], off: Int): Long = (u32(p, off) << 32) | u32(p, off + 4)
  private def fourcc(p: Array[Byte], off: Int): String =
    new String(p, off, 4, java.nio.charset.StandardCharsets.US_ASCII)

  private final class Mp4State {
    var mvhdTimescale = 0L; var mvhdDuration = -1L
    var mdhdTimescale = 0L; var mdhdDuration = -1L
    // per-trak accumulation, committed when the trak's hdlr says 'vide'
    var trakHandler = ""; var trakW = 0; var trakH = 0; var trakFrames = 0
    var w = 0; var h = 0; var frames = 0; var haveVideo = false
  }

  /** Container boxes whose payload is a plain box sequence. */
  private val Mp4Containers = Set("moov", "trak", "mdia", "minf", "stbl")

  /** Parse MP4/ISO-BMFF metadata: (width, height, n_frames, duration_s).
    * Width/height from the first video track's stsd VisualSampleEntry
    * (coded size), frame count from its stsz sample_count, duration from
    * mvhd (fallback: the video track's mdhd). */
  def decodeMp4(payload: Array[Byte]): (Int, Int, Int, Double) = {
    require(payload.length >= 8, "truncated mp4")
    val st = new Mp4State
    walkMp4(payload, 0, payload.length, st, depth = 0)
    require(st.haveVideo, "mp4 has no video track")
    val (ts, dur) =
      if (st.mvhdDuration >= 0 && st.mvhdTimescale > 0) (st.mvhdTimescale, st.mvhdDuration)
      else (st.mdhdTimescale, st.mdhdDuration)
    require(ts > 0 && dur >= 0, "mp4 has no movie duration")
    (st.w, st.h, st.frames, dur.toDouble / ts)
  }

  private def walkMp4(p: Array[Byte], start: Int, end: Int, st: Mp4State, depth: Int): Unit = {
    require(depth <= 8, "mp4 box nesting too deep")
    var off = start
    while (off + 8 <= end) {
      val size32 = u32(p, off)
      val tpe = fourcc(p, off + 4)
      val (hdr, boxSize) =
        if (size32 == 1) { require(off + 16 <= end, "truncated largesize"); (16, u64(p, off + 8)) }
        else if (size32 == 0) (8, (end - off).toLong) // box extends to end
        else (8, size32)
      require(boxSize >= hdr && off + boxSize <= end, s"box '$tpe' overruns payload")
      val ps = off + hdr
      val pe = (off + boxSize).toInt
      tpe match {
        case "trak" =>
          st.trakHandler = ""; st.trakW = 0; st.trakH = 0; st.trakFrames = 0
          walkMp4(p, ps, pe, st, depth + 1)
          if (st.trakHandler == "vide" && !st.haveVideo) {
            st.haveVideo = true; st.w = st.trakW; st.h = st.trakH; st.frames = st.trakFrames
          }
        case t if Mp4Containers(t) => walkMp4(p, ps, pe, st, depth + 1)
        case "mvhd" =>
          val v = p(ps) & 0xFF
          if (v == 1) { st.mvhdTimescale = u32(p, ps + 20); st.mvhdDuration = u64(p, ps + 24) }
          else { st.mvhdTimescale = u32(p, ps + 12); st.mvhdDuration = u32(p, ps + 16) }
        case "mdhd" =>
          val v = p(ps) & 0xFF
          if (v == 1) { st.mdhdTimescale = u32(p, ps + 20); st.mdhdDuration = u64(p, ps + 24) }
          else { st.mdhdTimescale = u32(p, ps + 12); st.mdhdDuration = u32(p, ps + 16) }
        case "hdlr" =>
          if (ps + 12 <= pe) st.trakHandler = fourcc(p, ps + 8)
        case "stsd" =>
          // v/f(4) entry_count(4) then the first sample entry; width/height
          // sit after the 8-byte entry header + 8-byte SampleEntry +
          // 16-byte VisualSampleEntry pre_defined/reserved block
          val entry = ps + 8
          if (entry + 36 <= pe) { st.trakW = u16(p, entry + 32); st.trakH = u16(p, entry + 34) }
        case "stsz" =>
          if (ps + 12 <= pe) st.trakFrames = u32(p, ps + 8).toInt
        case _ => // skip leaf boxes we don't need (ftyp, mdat, dinf, ...)
      }
      off = pe
    }
  }

  /** Deterministic minimal-but-valid MP4 synthesis: one video track,
    * `frames` samples at `fps`, coded size w×h. The test/bench payload
    * generator for the real container-parse path. */
  def synthMp4(w: Int, h: Int, frames: Int, fps: Int = 25,
               timescale: Int = 1000): Array[Byte] = {
    def box(tpe: String, parts: Array[Byte]*): Array[Byte] = {
      val n = 8 + parts.map(_.length).sum
      val bb = ByteBuffer.allocate(n)
      bb.putInt(n).put(tpe.getBytes("ASCII")); parts.foreach(bb.put); bb.array()
    }
    def bytes(xs: Int*): Array[Byte] = xs.map(_.toByte).toArray
    def be32(v: Long): Array[Byte] = ByteBuffer.allocate(4).putInt(v.toInt).array()
    def be16(v: Int): Array[Byte] = ByteBuffer.allocate(2).putShort(v.toShort).array()
    val duration = frames.toLong * timescale / fps
    val identity = // 3x3 16.16/2.30 fixed-point identity transform
      be32(0x00010000L) ++ be32(0) ++ be32(0) ++ be32(0) ++ be32(0x00010000L) ++
        be32(0) ++ be32(0) ++ be32(0) ++ be32(0x40000000L)
    val ftyp = box("ftyp", "isom".getBytes("ASCII"), be32(0x200),
      "isomiso2mp41".getBytes("ASCII"))
    val mvhd = box("mvhd", be32(0), be32(0), be32(0), be32(timescale), be32(duration),
      be32(0x00010000L), be16(0x0100), be16(0), be32(0), be32(0), identity,
      new Array[Byte](24), be32(2))
    val tkhd = box("tkhd", bytes(0, 0, 0, 7), be32(0), be32(0), be32(1), be32(0),
      be32(duration), new Array[Byte](8), be16(0), be16(0), be16(0), be16(0),
      identity, be32(w.toLong << 16), be32(h.toLong << 16))
    val mdhd = box("mdhd", be32(0), be32(0), be32(0), be32(timescale), be32(duration),
      be16(0x55C4), be16(0))
    val hdlr = box("hdlr", be32(0), be32(0), "vide".getBytes("ASCII"),
      new Array[Byte](12), "VideoHandler".getBytes("ASCII") :+ 0.toByte)
    val stsd = box("stsd", be32(0), be32(1),
      box("avc1", new Array[Byte](6), be16(1), new Array[Byte](16), be16(w), be16(h),
        be32(0x00480000L), be32(0x00480000L), be32(0), be16(1), new Array[Byte](32),
        be16(0x18), be16(0xFFFF)))
    val stts = box("stts", be32(0), be32(1), be32(frames), be32(timescale.toLong / fps))
    val stsc = box("stsc", be32(0), be32(1), be32(1), be32(frames), be32(1))
    val stsz = box("stsz", be32(0), be32(1), be32(frames)) // constant 1-byte samples
    val stco = box("stco", be32(0), be32(1), be32(0))
    val stbl = box("stbl", stsd, stts, stsc, stsz, stco)
    val vmhd = box("vmhd", bytes(0, 0, 0, 1), be16(0), be16(0), be16(0), be16(0))
    val dinf = box("dinf", box("dref", be32(0), be32(1), box("url ", bytes(0, 0, 0, 1))))
    val minf = box("minf", vmhd, dinf, stbl)
    val mdia = box("mdia", mdhd, hdlr, minf)
    val trak = box("trak", tkhd, mdia)
    val moov = box("moov", mvhd, trak)
    val mdat = box("mdat", Array.tabulate[Byte](frames)(i => (i * 31).toByte))
    ftyp ++ moov ++ mdat
  }

  // ------------------------------------------------- Matroska / WebM (EBML)

  /** Read an EBML variable-length integer at `off`: (value, byteLength).
    * `keepMarker` keeps the length-marker bit (element IDs compare with it;
    * sizes strip it). */
  private def vint(p: Array[Byte], off: Int, keepMarker: Boolean): (Long, Int) = {
    require(off < p.length, "truncated vint")
    val first = p(off) & 0xFF
    require(first != 0, "invalid vint lead byte")
    val len = Integer.numberOfLeadingZeros(first) - 23 // 1..8
    require(off + len <= p.length, "truncated vint body")
    var v: Long = if (keepMarker) first else first & ((1 << (8 - len)) - 1)
    var i = 1
    while (i < len) { v = (v << 8) | (p(off + i) & 0xFF); i += 1 }
    (v, len)
  }

  private def ebmlUint(p: Array[Byte], off: Int, len: Int): Long = {
    var v = 0L; var i = 0
    while (i < len) { v = (v << 8) | (p(off + i) & 0xFF); i += 1 }
    v
  }

  private def ebmlFloat(p: Array[Byte], off: Int, len: Int): Double = len match {
    case 4 => java.lang.Float.intBitsToFloat(ebmlUint(p, off, 4).toInt).toDouble
    case 8 => java.lang.Double.longBitsToDouble(ebmlUint(p, off, 8))
    case 0 => 0.0
    case _ => throw new IllegalArgumentException(s"bad EBML float length $len")
  }

  // EBML element IDs (with marker bits, as they appear on the wire)
  private val IdSegment = 0x18538067L
  private val IdInfo = 0x1549A966L
  private val IdTimestampScale = 0x2AD7B1L
  private val IdDuration = 0x4489L
  private val IdTracks = 0x1654AE6BL
  private val IdTrackEntry = 0xAEL
  private val IdTrackType = 0x83L
  private val IdVideo = 0xE0L
  private val IdPixelWidth = 0xB0L
  private val IdPixelHeight = 0xBAL
  private val IdCluster = 0x1F43B675L
  private val IdSimpleBlock = 0xA3L
  private val IdBlockGroup = 0xA0L

  private final class MkvState {
    var scaleNs = 1000000L // TimestampScale default: 1 ms
    var durationTicks = -1.0
    var w = 0; var h = 0; var frames = 0; var haveVideo = false
    var inVideoTrack = false
  }

  /** Parse Matroska/WebM metadata: (width, height, n_frames, duration_s).
    * Width/height from the first video TrackEntry, duration from
    * Info.Duration × TimestampScale, frame count by counting SimpleBlock /
    * BlockGroup children of Clusters (Matroska keeps no sample table). */
  def decodeMkv(payload: Array[Byte]): (Int, Int, Int, Double) = {
    val st = new MkvState
    walkMkv(payload, 0, payload.length, st, depth = 0)
    require(st.haveVideo, "matroska has no video track")
    require(st.durationTicks >= 0, "matroska has no Duration")
    (st.w, st.h, st.frames, st.durationTicks * st.scaleNs / 1e9)
  }

  private def walkMkv(p: Array[Byte], start: Int, end: Int, st: MkvState, depth: Int): Unit = {
    require(depth <= 8, "EBML nesting too deep")
    var off = start
    while (off < end) {
      val (id, idLen) = vint(p, off, keepMarker = true)
      val (size, szLen) = vint(p, off + idLen, keepMarker = false)
      val ps = off + idLen + szLen
      val pe = ps + size.toInt
      require(size >= 0 && pe <= end, s"EBML element 0x${id.toHexString} overruns")
      id match {
        case IdSegment | IdInfo | IdTracks | IdCluster =>
          walkMkv(p, ps, pe, st, depth + 1)
        case IdTrackEntry =>
          st.inVideoTrack = false
          walkMkv(p, ps, pe, st, depth + 1)
        case IdTimestampScale => st.scaleNs = ebmlUint(p, ps, size.toInt)
        case IdDuration => st.durationTicks = ebmlFloat(p, ps, size.toInt)
        case IdTrackType => st.inVideoTrack = ebmlUint(p, ps, size.toInt) == 1L
        case IdVideo =>
          if (st.inVideoTrack && !st.haveVideo) {
            walkMkv(p, ps, pe, st, depth + 1)
            st.haveVideo = st.w > 0 && st.h > 0
          }
        case IdPixelWidth => st.w = ebmlUint(p, ps, size.toInt).toInt
        case IdPixelHeight => st.h = ebmlUint(p, ps, size.toInt).toInt
        case IdSimpleBlock | IdBlockGroup => st.frames += 1
        case _ => // skip (EBML header, SeekHead, Cues, codec fields, ...)
      }
      off = pe
    }
  }

  /** Deterministic minimal Matroska synthesis: one video track w×h,
    * `frames` SimpleBlocks in one Cluster, duration in milliseconds
    * (default TimestampScale). */
  def synthMkv(w: Int, h: Int, frames: Int, durationMs: Double): Array[Byte] = {
    def id(v: Long): Array[Byte] = { // IDs are written with their marker bits
      val n = (64 - java.lang.Long.numberOfLeadingZeros(v) + 7) / 8
      Array.tabulate[Byte](n)(i => ((v >> (8 * (n - 1 - i))) & 0xFF).toByte)
    }
    def sz(v: Long): Array[Byte] = { // sizes as 8-byte vints: 0x01 + 7 bytes
      val out = new Array[Byte](8); out(0) = 0x01
      var i = 1
      while (i < 8) { out(i) = ((v >> (8 * (7 - i))) & 0xFF).toByte; i += 1 }
      out
    }
    def el(eid: Long, body: Array[Byte]): Array[Byte] = id(eid) ++ sz(body.length) ++ body
    def uintBody(v: Long): Array[Byte] = {
      val n = math.max(1, (64 - java.lang.Long.numberOfLeadingZeros(v) + 7) / 8)
      Array.tabulate[Byte](n)(i => ((v >> (8 * (n - 1 - i))) & 0xFF).toByte)
    }
    val ebmlHeader = el(0x1A45DFA3L, el(0x4286L, uintBody(1)) ++ // EBMLVersion
      el(0x4282L, "matroska".getBytes("ASCII"))) // DocType
    val info = el(IdInfo, el(IdTimestampScale, uintBody(1000000L)) ++
      el(IdDuration, ByteBuffer.allocate(8).putDouble(durationMs).array()))
    val tracks = el(IdTracks, el(IdTrackEntry,
      el(0xD7L, uintBody(1)) ++ // TrackNumber
        el(IdTrackType, uintBody(1)) ++
        el(IdVideo, el(IdPixelWidth, uintBody(w)) ++ el(IdPixelHeight, uintBody(h)))))
    val blocks = (0 until frames).map { i =>
      // SimpleBlock: track vint 0x81, 16-bit relative timecode, flags, 1 data byte
      el(IdSimpleBlock, Array[Byte](0x81.toByte, ((i >> 8) & 0xFF).toByte,
        (i & 0xFF).toByte, 0x80.toByte, (i * 17).toByte))
    }.reduceOption(_ ++ _).getOrElse(Array.emptyByteArray)
    val cluster = el(IdCluster, el(0xE7L, uintBody(0)) ++ blocks) // Timestamp 0
    ebmlHeader ++ el(IdSegment, info ++ tracks ++ cluster)
  }
}
