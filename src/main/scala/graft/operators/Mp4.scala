package graft.operators

import java.nio.{ByteBuffer, ByteOrder}
import scala.collection.mutable.ArrayBuffer

/** Minimal ISO-BMFF (MP4, ISO/IEC 14496-12) container support: a box
  * walker that demuxes the sample table — `moov → trak → mdia → minf
  * → stbl`, reading `stsz` (sample sizes), `stsc` (sample-to-chunk
  * runs) and `stco`/`co64` (chunk offsets) — into absolute
  * (offset, size) ranges for every sample, plus a builder that emits
  * a structurally valid single-track file for tests and fixtures.
  *
  * This is a REAL demuxer at the container level: given any
  * spec-conforming MP4 it returns the access units (encoded frames)
  * without needing a pixel codec, which is exactly the step a
  * large-scale frame-sampling pipeline runs before handing bytes to
  * hardware decoders. Unknown boxes are skipped by size, so files
  * with the usual extra atoms (free, udta, meta, edts, …) demux fine.
  *
  * Reference contact: the multimodal surface is builder-brief scope
  * (no counterpart in /root/reference); the box layout follows the
  * published ISO base-media spec only.
  */
object Mp4 {

  /** One demuxed track: handler type ('vide'/'soun'/…) and the
    * absolute byte range of every sample in file order.
    */
  final case class Track(handler: String, samples: Seq[(Long, Int)])

  private def be32(b: Array[Byte], off: Int): Long =
    ((b(off) & 0xffL) << 24) | ((b(off + 1) & 0xffL) << 16) |
      ((b(off + 2) & 0xffL) << 8) | (b(off + 3) & 0xffL)

  private def be64(b: Array[Byte], off: Int): Long =
    (be32(b, off) << 32) | be32(b, off + 4)

  private def fourcc(b: Array[Byte], off: Int): String =
    new String(b, off, 4, "ISO-8859-1")

  /** Does the payload start with a plausible `ftyp` box? Cheap sniff
    * guarding the parser, same pattern as the image magic check.
    */
  def looksLikeMp4(p: Array[Byte]): Boolean =
    p.length >= 12 && fourcc(p, 4) == "ftyp" && {
      val sz = be32(p, 0)
      sz >= 8 && sz <= p.length
    }

  /** Iterate the child boxes of [start, end): (type, payloadStart,
    * payloadEnd). Handles 64-bit largesize boxes; stops cleanly on a
    * truncated or corrupt header instead of throwing.
    */
  private def boxes(b: Array[Byte], start: Long, end: Long): Iterator[(String, Long, Long)] =
    new Iterator[(String, Long, Long)] {
      private var pos = start
      private var nextBox: (String, Long, Long) = _
      private def advance(): Unit = {
        nextBox = null
        if (pos + 8 <= end) {
          val sz = be32(b, pos.toInt)
          val typ = fourcc(b, pos.toInt + 4)
          val (bodyStart, boxEnd) =
            if (sz == 1 && pos + 16 <= end) (pos + 16, pos + be64(b, pos.toInt + 8))
            else if (sz == 0) (pos + 8, end) // box extends to end of file
            else (pos + 8, pos + sz)
          if (boxEnd > pos + 8 - 1 && boxEnd <= end && bodyStart <= boxEnd) {
            nextBox = (typ, bodyStart, boxEnd)
            pos = boxEnd
          }
        }
      }
      advance()
      override def hasNext: Boolean = nextBox != null
      override def next(): (String, Long, Long) = {
        val r = nextBox; advance(); r
      }
    }

  private def findBox(b: Array[Byte], start: Long, end: Long, typ: String): Option[(Long, Long)] =
    boxes(b, start, end).collectFirst { case (t, s, e) if t == typ => (s, e) }

  /** Demux every track's sample table. Returns None when the payload
    * is not parseable MP4 (callers fall back to the deterministic
    * fake, keeping the partition-wise pipeline total).
    */
  def demux(payload: Array[Byte]): Option[Seq[Track]] = {
    if (!looksLikeMp4(payload)) return None
    try {
      val moov = findBox(payload, 0L, payload.length.toLong, "moov").getOrElse(return None)
      val tracks = boxes(payload, moov._1, moov._2).collect {
        case ("trak", ts, te) => demuxTrack(payload, ts, te)
      }.flatten.toSeq
      if (tracks.isEmpty) None else Some(tracks)
    } catch { case _: Exception => None }
  }

  private def demuxTrack(b: Array[Byte], ts: Long, te: Long): Option[Track] = {
    val mdia = findBox(b, ts, te, "mdia").getOrElse(return None)
    val handler = findBox(b, mdia._1, mdia._2, "hdlr") match {
      // hdlr body: version/flags(4) pre_defined(4) handler_type(4)
      case Some((hs, he)) if he - hs >= 12 => fourcc(b, hs.toInt + 8)
      case _ => "????"
    }
    val minf = findBox(b, mdia._1, mdia._2, "minf").getOrElse(return None)
    val stbl = findBox(b, minf._1, minf._2, "stbl").getOrElse(return None)

    // stsz: version/flags(4) sample_size(4) sample_count(4) [sizes]
    val stsz = findBox(b, stbl._1, stbl._2, "stsz").getOrElse(return None)
    val uniform = be32(b, stsz._1.toInt + 4)
    val nSamples = be32(b, stsz._1.toInt + 8).toInt
    // sanity-bound the allocation BEFORE it happens: a corrupt 32-bit
    // count near 2^31 would otherwise attempt a multi-GB array and an
    // OutOfMemoryError (an Error, not Exception) would escape demux's
    // fallback catch and kill the executor. No real file holds more
    // samples than payload bytes.
    if (nSamples < 0 || nSamples > b.length) return None
    val sizes: Array[Int] =
      if (uniform != 0) Array.fill(nSamples)(uniform.toInt)
      else Array.tabulate(nSamples)(i => be32(b, stsz._1.toInt + 12 + 4 * i).toInt)

    // stco/co64: version/flags(4) entry_count(4) [offsets]
    val (chunkOffsets, wide) = findBox(b, stbl._1, stbl._2, "stco") match {
      case Some((cs, _)) =>
        val n = be32(b, cs.toInt + 4).toInt
        (Array.tabulate(n)(i => be32(b, cs.toInt + 8 + 4 * i)), false)
      case None =>
        val co = findBox(b, stbl._1, stbl._2, "co64").getOrElse(return None)
        val n = be32(b, co._1.toInt + 4).toInt
        (Array.tabulate(n)(i => be64(b, co._1.toInt + 8 + 8 * i)), true)
    }

    // stsc: version/flags(4) entry_count(4) then
    // (first_chunk, samples_per_chunk, sample_desc_idx) runs — each
    // run applies from first_chunk until the next run's first_chunk.
    val stsc = findBox(b, stbl._1, stbl._2, "stsc").getOrElse(return None)
    val nRuns = be32(b, stsc._1.toInt + 4).toInt
    val runs = Array.tabulate(nRuns) { i =>
      val off = stsc._1.toInt + 8 + 12 * i
      (be32(b, off).toInt, be32(b, off + 4).toInt) // (first_chunk 1-based, samples/chunk)
    }

    // Walk chunks, assigning samples to absolute offsets.
    val out = new ArrayBuffer[(Long, Int)](nSamples)
    var sample = 0
    var run = 0
    var chunk = 1
    while (sample < nSamples && chunk <= chunkOffsets.length) {
      while (run + 1 < runs.length && chunk >= runs(run + 1)._1) run += 1
      val perChunk = runs(run)._2
      var off = chunkOffsets(chunk - 1)
      var i = 0
      while (i < perChunk && sample < nSamples) {
        out += ((off, sizes(sample)))
        off += sizes(sample)
        sample += 1
        i += 1
      }
      chunk += 1
    }
    if (sample < nSamples) None // sample table inconsistent with chunks
    // every sample range must land inside the payload: a moov-first
    // file truncated mid-mdat (the standard faststart layout) has a
    // self-consistent sample table whose offsets point past EOF, and
    // serving those ranges would crash or zero-pad downstream copies
    else if (out.exists { case (off, len) =>
      off < 0 || len < 0 || off + len > b.length
    }) None
    else Some(Track(handler, out.toSeq))
  }

  // ---------------------------------------------------------------
  // Builder: a structurally valid single-track file for fixtures.
  // ---------------------------------------------------------------

  private def box(typ: String, body: Array[Byte]*): Array[Byte] = {
    val len = 8 + body.map(_.length).sum
    val bb = ByteBuffer.allocate(len).order(ByteOrder.BIG_ENDIAN)
    bb.putInt(len).put(typ.getBytes("ISO-8859-1"))
    body.foreach(bb.put)
    bb.array()
  }

  private def u32(vs: Long*): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 * vs.length).order(ByteOrder.BIG_ENDIAN)
    vs.foreach(v => bb.putInt(v.toInt))
    bb.array()
  }

  /** Build a minimal valid single-track MP4: `ftyp` + `mdat` holding
    * the samples back-to-back + `moov` with the full stbl chain.
    * `handler` is the track handler_type (e.g. "vide").
    * `samplesPerChunk` splits the samples into that many per chunk
    * (0 = one chunk holds everything), emitting real multi-entry
    * stco offsets and the two-run stsc a ragged tail produces —
    * exercising the demuxer's run walk, not just the trivial layout.
    * Deterministic byte-for-byte, so fixtures built from it are
    * oracle-predictable.
    */
  def build(samples: Seq[Array[Byte]], handler: String = "vide",
      timescale: Int = 600, samplesPerChunk: Int = 0): Array[Byte] = {
    val ftyp = box("ftyp",
      "isom".getBytes("ISO-8859-1"), u32(512), "isomiso2".getBytes("ISO-8859-1"))
    val mdatBody = samples.toArray.flatten
    val mdat = box("mdat", mdatBody)
    val dataOffset = ftyp.length + 8 // first sample byte inside mdat

    val n = samples.length
    val dur = n.toLong * 100
    val mvhd = box("mvhd", u32(0, 0, 0, timescale, dur, 0x00010000, 0x01000000),
      u32(0, 0), u32(0x00010000, 0, 0, 0, 0x00010000, 0, 0, 0, 0x40000000),
      u32(0, 0, 0, 0, 0, 0, 2))
    val tkhd = box("tkhd", u32(7, 0, 0, 1, 0, dur), u32(0, 0, 0, 0),
      u32(0x00010000, 0, 0, 0, 0x00010000, 0, 0, 0, 0x40000000), u32(0, 0))
    val mdhd = box("mdhd", u32(0, 0, 0, timescale, dur), u32(0x55c40000))
    val hdlr = box("hdlr", u32(0, 0), handler.getBytes("ISO-8859-1"),
      u32(0, 0, 0), Array[Byte](0))
    val vmhd = box("vmhd", u32(1, 0, 0))
    val dinf = box("dinf", box("dref", u32(0, 1), box("url ", u32(1))))
    val stts = box("stts", u32(0, 1, n, 100))
    val perChunk = if (samplesPerChunk <= 0 || samplesPerChunk >= n) n else samplesPerChunk
    val chunkSizes = // samples per chunk, last one ragged
      if (n == 0) Seq(0)
      else Seq.fill(n / perChunk)(perChunk) ++
        (if (n % perChunk != 0) Seq(n % perChunk) else Nil)
    val stsc =
      if (n == 0 || n % perChunk == 0)
        box("stsc", u32(0, 1, 1, perChunk.max(1), 1))
      else // full-chunk run, then the ragged-tail run
        box("stsc", u32(0, 2, 1, perChunk, 1, (n / perChunk + 1).toLong, (n % perChunk).toLong, 1))
    val stsz = box("stsz", u32(0, 0, n), u32(samples.map(_.length.toLong): _*))
    val chunkOffs = chunkSizes.scanLeft((dataOffset.toLong, 0)) { case ((off, s0), c) =>
      (off + samples.slice(s0, s0 + c).map(_.length.toLong).sum, s0 + c)
    }.map(_._1).dropRight(1)
    val stco = box("stco", u32(0L +: chunkOffs.length.toLong +: chunkOffs: _*))
    val stsd = box("stsd", u32(0, 0)) // zero sample descriptions: metadata-only
    val stbl = box("stbl", stsd, stts, stsc, stsz, stco)
    val minf = box("minf", vmhd, dinf, stbl)
    val mdia = box("mdia", mdhd, hdlr, minf)
    val trak = box("trak", tkhd, mdia)
    val moov = box("moov", mvhd, trak)
    ftyp ++ mdat ++ moov
  }
}
