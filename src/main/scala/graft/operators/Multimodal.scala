package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.catalyst.encoders.{ExpressionEncoder, RowEncoder}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing: media payloads as opaque `binary`
  * columns with a typed metadata struct, processed partition-wise.
  *
  * Image decode and resize are REAL for the formats the JDK's
  * `javax.imageio` readers cover (PNG/JPEG/BMP/GIF/WBMP) —
  * [[decodeImage]] / [[resizeImage]]. Payloads no installed reader
  * recognizes (including the fixture's text stand-ins) fall back to
  * the clearly-marked deterministic fakes, and the `decoded` column
  * records which path ran. Audio decode is REAL for the containers
  * the JDK's `javax.sound.sampled` readers cover (WAV/AIFF/AU) —
  * [[decodeAudio]]. Frame sampling is REAL at the container level
  * for MP4 via [[Mp4.demux]] (stsz/stsc/stco sample-table walk);
  * decode-to-pixels stops there because no pixel codec ships in this
  * container, and non-media payloads fall back to deterministic
  * fakes with a provenance flag. The Spark-side contract — schema,
  * batch iteration, partition-local processing, metadata struct
  * shape — is identical on every path, so swapping in a JNI/FFI
  * codec changes only the function body.
  */
object Multimodal {

  /** Metadata struct carried beside every binary payload. */
  val MetaSchema: StructType = StructType(Seq(
    StructField("media_type", StringType, nullable = false),
    StructField("n_bytes", LongType, nullable = false),
    StructField("checksum", LongType, nullable = false)))

  /** Feature row produced by the decode/extract stage. `decoded`
    * gates the dimension columns: true = width/height/feature came
    * from a real `javax.imageio` decode; false = the deterministic
    * fallback stood in.
    */
  val FeatureSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType, nullable = false),
    StructField("media_type", StringType, nullable = false),
    StructField("n_bytes", LongType, nullable = false),
    StructField("width", IntegerType, nullable = false),
    StructField("height", IntegerType, nullable = false),
    StructField("decoded", BooleanType, nullable = false),
    StructField("feature", ArrayType(DoubleType, containsNull = false), nullable = false)))

  /** Attach a binary payload column + metadata struct to a table.
    * The fixture corpus has no real media, so the payload is the
    * UTF-8 encoding of the text column — a stand-in with the same
    * plumbing (binary type, per-row sizes, checksums).
    */
  def withPayload(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val payload = encode(col(textCol), "UTF-8")
    docs.select(
      col(idCol),
      payload.as("payload"),
      struct(
        lit("text/plain").as("media_type"),
        octet_length(payload).cast("long").as("n_bytes"),
        crc32(payload).as("checksum")).as("meta"))
  }

  /** Schema produced by the fixture payload builders: id + binary. */
  private val PayloadSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType, nullable = false),
    StructField("payload", BinaryType, nullable = false)))

  /** Wrap each document's text bytes in a real RIFF/WAVE container
    * (8-bit unsigned mono PCM, 1 sample per byte) — the deterministic
    * audio fixture for the oracle gate. Map-only.
    */
  def withWavPayload(docs: DataFrame, idCol: String, textCol: String,
      sampleRate: Int = 8000): DataFrame = {
    val encoder = ExpressionEncoder(PayloadSchema)
    docs.select(col(idCol).cast("long"), col(textCol))
      .mapPartitions { rows =>
        rows.map { r =>
          Row(r.getLong(0), buildWav(r.getString(1).getBytes("UTF-8"), sampleRate))
        }
      }(encoder)
  }

  /** Wrap each document's text bytes in a real single-track MP4:
    * consecutive `sampleBytes`-sized slices of the text become the
    * container's samples (the last one ragged) — the deterministic
    * video fixture for the oracle gate. Map-only.
    */
  def withMp4Payload(docs: DataFrame, idCol: String, textCol: String,
      sampleBytes: Int = 48): DataFrame = {
    require(sampleBytes > 0)
    val encoder = ExpressionEncoder(PayloadSchema)
    docs.select(col(idCol).cast("long"), col(textCol))
      .mapPartitions { rows =>
        rows.map { r =>
          val bytes = r.getString(1).getBytes("UTF-8")
          val samples = bytes.grouped(sampleBytes).toSeq
          Row(r.getLong(0), Mp4.build(samples))
        }
      }(encoder)
  }

  /** Canvas side for per-frame images in the MP4-of-images fixture:
    * 16×16 keeps a frame at 822 bytes (54-byte header + 768 pixels)
    * while leaving the 8×8 aHash a real 2× downsample.
    */
  val FrameCanvas = 16

  /** Wrap each document's text in a real single-track MP4 whose
    * samples are DECODABLE IMAGES: consecutive `sampleBytes`-sized
    * text slices each become a [[FrameCanvas]]² gray BMP (the same
    * stretch layout as [[withBmpPayload]], per slice), and those BMP
    * byte arrays are the container's access units. This is the
    * images-in-video fixture that lets [[framePhash]] exercise the
    * REAL decode-to-pixels path end-to-end (demux → `javax.imageio`-
    * class decode → luminance aHash) — the shape a production
    * pipeline has once a JNI codec hands back frames, with the JDK's
    * own decoders standing in as the codec. Map-only.
    */
  def withMp4ImagePayload(docs: DataFrame, idCol: String, textCol: String,
      sampleBytes: Int = 48): DataFrame = {
    require(sampleBytes > 0)
    val encoder = ExpressionEncoder(PayloadSchema)
    docs.select(col(idCol).cast("long"), col(textCol))
      .mapPartitions { rows =>
        rows.map { r =>
          val bytes = r.getString(1).getBytes("UTF-8")
          val samples = bytes.grouped(sampleBytes)
            .map(seg => buildBmp(seg, FrameCanvas)).toSeq
          Row(r.getLong(0), Mp4.build(samples))
        }
      }(encoder)
  }

  /** REAL image decode via `javax.imageio` (the JDK ships PNG, JPEG,
    * BMP, GIF and WBMP readers): width, height, and an 8-bin
    * luminance histogram as the feature vector. Returns None when no
    * installed reader recognizes the payload — the caller falls back
    * to [[fakeDecode]], so non-image bytes keep flowing through the
    * same partition-wise pipeline instead of failing the task.
    */
  /** Cheap magic-number sniff guarding the codec: ImageIO's reader
    * lookup costs orders of magnitude more than the whole fake path,
    * so a corpus of non-image payloads must reject in a few byte
    * compares (measured: t11 at sf1 went 31.4 s → 3 s with the sniff).
    * Covers the formats the JDK can actually decode.
    */
  private def looksLikeImage(p: Array[Byte]): Boolean =
    p.length >= 4 && (
      (p(0) == 0x89.toByte && p(1) == 'P'.toByte && p(2) == 'N'.toByte &&
        p(3) == 'G'.toByte) ||
      (p(0) == 0xff.toByte && p(1) == 0xd8.toByte) ||
      (p(0) == 'G'.toByte && p(1) == 'I'.toByte && p(2) == 'F'.toByte &&
        p(3) == '8'.toByte) ||
      (p(0) == 'B'.toByte && p(1) == 'M'.toByte))

  def decodeImage(payload: Array[Byte]): Option[(Int, Int, Array[Double])] =
    if (!looksLikeImage(payload)) None
    else try {
      val img = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(payload))
      if (img == null) None
      else {
        val w = img.getWidth
        val h = img.getHeight
        val hist = new Array[Double](8)
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            val rgb = img.getRGB(x, y)
            val lum = (((rgb >> 16) & 0xff) * 299 + ((rgb >> 8) & 0xff) * 587 +
              (rgb & 0xff) * 114) / 1000
            hist(lum >> 5) += 1.0
            x += 1
          }
          y += 1
        }
        Some((w, h, hist))
      }
    } catch { case _: Exception => None }

  /** REAL image resize: nearest-neighbor sample of the decoded pixels
    * onto a targetW×targetH canvas (deterministic across JVMs, unlike
    * the platform-dependent smooth scalers), re-encoded as PNG.
    * None when the payload is not a decodable image.
    */
  def resizeImage(payload: Array[Byte], targetW: Int, targetH: Int): Option[Array[Byte]] =
    if (!looksLikeImage(payload)) None
    else try {
      val img = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(payload))
      if (img == null) None
      else {
        val out = new java.awt.image.BufferedImage(targetW, targetH,
          java.awt.image.BufferedImage.TYPE_INT_RGB)
        var y = 0
        while (y < targetH) {
          var x = 0
          while (x < targetW) {
            out.setRGB(x, y,
              img.getRGB(x * img.getWidth / targetW, y * img.getHeight / targetH))
            x += 1
          }
          y += 1
        }
        val bos = new java.io.ByteArrayOutputStream()
        javax.imageio.ImageIO.write(out, "png", bos)
        Some(bos.toByteArray)
      }
    } catch { case _: Exception => None }

  /** FALLBACK decoder — stands in for an image/audio codec. Deterministic:
    * "dimensions" and an 8-dim "feature" vector derived from payload
    * bytes. Real implementation would call the codec here, one
    * partition at a time (mapPartitions = one codec init per task,
    * amortized over the batch — the same shape a Pandas-UDF/Arrow
    * batch pipeline has).
    */
  def fakeDecode(payload: Array[Byte]): (Int, Int, Array[Double]) = {
    // ??? <- real codec goes here; deterministic fake below.
    val w = 16 + (if (payload.isEmpty) 0 else (payload.head & 0x3f))
    val h = 16 + (if (payload.isEmpty) 0 else (payload.last & 0x3f))
    val feat = Array.tabulate(8) { i =>
      var acc = 0L
      var j = i
      while (j < payload.length) { acc += (payload(j) & 0xff).toLong; j += 8 }
      acc.toDouble
    }
    (w, h, feat)
  }

  /** Schema for the resize stage output. */
  val ResizedSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType, nullable = false),
    StructField("payload", BinaryType, nullable = false),
    StructField("width", IntegerType, nullable = false),
    StructField("height", IntegerType, nullable = false),
    StructField("n_bytes", LongType, nullable = false)))

  /** STUB resize — stands in for an image scaler. Deterministic: keeps
    * every k-th byte so the "resized" payload is a fixed fraction of
    * the input, sized to targetW×targetH. Real implementation calls
    * the codec's scaler here; the partition-wise batch shape (one
    * codec init per task) is the part that matters at scale.
    */
  def fakeResize(payload: Array[Byte], targetW: Int, targetH: Int): Array[Byte] = {
    // ??? <- real scaler goes here; deterministic fake below.
    val target = math.max(1, math.min(payload.length, targetW * targetH / 8))
    val step = (payload.length + target - 1) / math.max(1, target)
    payload.grouped(math.max(1, step)).map(_.head).toArray
  }

  /** Resize stage: map-only partition-wise transform emitting resized
    * payloads with their new dimensions ([[ResizedSchema]]).
    */
  def resize(withPayloads: DataFrame, idCol: String,
      targetW: Int, targetH: Int): DataFrame = {
    val encoder = ExpressionEncoder(ResizedSchema)
    val input = withPayloads.select(col(idCol).cast("long"), col("payload"))
    input.mapPartitions { rows =>
      rows.map { r =>
        val payload = r.getAs[Array[Byte]](1)
        val resized = resizeImage(payload, targetW, targetH)
          .getOrElse(fakeResize(payload, targetW, targetH))
        Row(r.getLong(0), resized, targetW, targetH, resized.length.toLong)
      }
    }(encoder)
  }

  /** Schema for sampled frames: one row per frame (one-to-many).
    * `demuxed` gates provenance: true = the frame is a real sample
    * (access unit) pulled out of an ISO-BMFF container by
    * [[Mp4.demux]]; false = the deterministic byte-chunker fallback.
    */
  val FrameSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType, nullable = false),
    StructField("frame_idx", IntegerType, nullable = false),
    StructField("frame", BinaryType, nullable = false),
    StructField("n_bytes", LongType, nullable = false),
    StructField("demuxed", BooleanType, nullable = false)))

  /** Frame sampler. REAL for MP4 payloads: [[Mp4.demux]] walks the
    * container's sample table (stsz/stsc/stco) and the sampler emits
    * every `everyNth` actual sample's bytes — the container-level
    * demux a frame pipeline runs before handing access units to a
    * hardware decoder (pixel codecs are not in this container, so
    * decode-to-pixels stops there). Non-MP4 payloads fall back to the
    * deterministic fixed-size chunker. Either way the Spark shape is
    * the contract: a partition-wise ONE-TO-MANY expansion (flatMap
    * inside mapPartitions), no driver involvement, no shuffle.
    */
  def sampleFrames(withPayloads: DataFrame, idCol: String,
      frameBytes: Int = 64, everyNth: Int = 2): DataFrame = {
    require(frameBytes > 0 && everyNth > 0)
    val encoder = ExpressionEncoder(FrameSchema)
    val input = withPayloads.select(col(idCol).cast("long"), col("payload"))
    input.mapPartitions { rows =>
      rows.flatMap { r =>
        val payload = r.getAs[Array[Byte]](1)
        Mp4.demux(payload) match {
          case Some(tracks) =>
            val track = tracks.find(_.handler == "vide").getOrElse(tracks.head)
            track.samples.zipWithIndex.iterator
              .filter { case (_, i) => i % everyNth == 0 }
              .map { case ((off, len), i) =>
                val frame = java.util.Arrays.copyOfRange(
                  payload, off.toInt, off.toInt + len)
                Row(r.getLong(0), i, frame, frame.length.toLong, true)
              }
          case None =>
            payload.grouped(frameBytes).zipWithIndex
              .filter { case (_, i) => i % everyNth == 0 }
              .map { case (frame, i) =>
                Row(r.getLong(0), i, frame, frame.length.toLong, false)
              }
        }
      }
    }(encoder)
  }

  // ---------------------------------------------------------------
  // Audio: REAL decode via javax.sound.sampled (the JDK ships
  // WAV/AIFF/AU readers).
  // ---------------------------------------------------------------

  /** Magic sniff for the containers the JDK can open: RIFF/WAVE,
    * FORM/AIFF, and .snd (AU). Same rationale as [[looksLikeImage]]:
    * reject non-audio in a few byte compares before consulting the
    * provider registry.
    */
  private def looksLikeAudio(p: Array[Byte]): Boolean =
    p.length >= 12 && (
      (p(0) == 'R' && p(1) == 'I' && p(2) == 'F' && p(3) == 'F' &&
        p(8) == 'W' && p(9) == 'A' && p(10) == 'V' && p(11) == 'E') ||
      (p(0) == 'F' && p(1) == 'O' && p(2) == 'R' && p(3) == 'M' &&
        p(8) == 'A' && p(9) == 'I' && p(10) == 'F') ||
      (p(0) == '.' && p(1) == 's' && p(2) == 'n' && p(3) == 'd'))

  /** Decoded audio facts: all-integer so gate hashes are exact. */
  final case class AudioInfo(sampleRate: Int, channels: Int, bits: Int,
      nFrames: Long, pcm: Array[Byte])

  /** Direct RIFF/WAVE chunk walk for canonical PCM files — the scale
    * path. `AudioSystem`'s provider registry probes every installed
    * reader per call (exception-driven), which measured 18.5 s for
    * 50k WAV docs at sf1 where this parser does the same decode in
    * well under a second; same lesson as the ImageIO magic-byte sniff.
    * Walks `fmt `/`data` chunks by size (skipping LIST/fact/etc.),
    * accepts only format tag 1 (integer PCM); anything else falls
    * through to the JDK reader below.
    */
  private def parseWavPcm(p: Array[Byte]): Option[AudioInfo] = {
    def le16(off: Int): Int = (p(off) & 0xff) | ((p(off + 1) & 0xff) << 8)
    def le32(off: Int): Long =
      (p(off) & 0xffL) | ((p(off + 1) & 0xffL) << 8) |
        ((p(off + 2) & 0xffL) << 16) | ((p(off + 3) & 0xffL) << 24)
    if (p.length < 12 || p(0) != 'R' || p(1) != 'I' || p(2) != 'F' ||
      p(3) != 'F' || p(8) != 'W' || p(9) != 'A' || p(10) != 'V' || p(11) != 'E')
      return None
    // chunk walk in LONG arithmetic: a 32-bit length near Int.MaxValue
    // must fail the bounds check, not overflow it and walk pos negative
    var pos = 12L
    var fmt: Option[(Int, Int, Int, Int)] = None // (tag, channels, rate, bits)
    var data: Option[(Int, Int)] = None // (offset, length)
    while (pos + 8 <= p.length && (fmt.isEmpty || data.isEmpty)) {
      val ip = pos.toInt
      val id = new String(p, ip, 4, "ISO-8859-1")
      val len = le32(ip + 4) // unsigned-ish: 0 .. 2^32-1 as Long
      if (pos + 8 + len > p.length) return None
      if (id == "fmt " && len >= 16)
        fmt = Some((le16(ip + 8), le16(ip + 10), le32(ip + 12).toInt, le16(ip + 22)))
      else if (id == "data")
        data = Some((ip + 8, len.toInt))
      pos += 8 + len + (len & 1) // chunks are word-aligned
    }
    for {
      (tag, channels, rate, bits) <- fmt
      (off, len) <- data
      if tag == 1 && channels > 0 && bits > 0
    } yield {
      val frameSize = math.max(1, channels * ((bits + 7) / 8))
      AudioInfo(rate, channels, bits, len.toLong / frameSize,
        java.util.Arrays.copyOfRange(p, off, off + len))
    }
  }

  /** REAL audio decode: canonical PCM WAV through the direct RIFF
    * walk above; everything else the JDK can open (AIFF, AU,
    * non-PCM WAV variants) through `AudioSystem.getAudioInputStream`.
    * The two paths are differentially tested against each other.
    * None when no reader recognizes the payload — callers fall back
    * to the deterministic fake, keeping the pipeline total.
    */
  def decodeAudio(payload: Array[Byte]): Option[AudioInfo] =
    if (!looksLikeAudio(payload)) None
    else (try parseWavPcm(payload) catch { case _: Exception => None }).orElse {
      try {
        val in = javax.sound.sampled.AudioSystem.getAudioInputStream(
          new java.io.BufferedInputStream(new java.io.ByteArrayInputStream(payload)))
        try {
          val fmt = in.getFormat
          val pcm = in.readAllBytes()
          val frameSize = math.max(1, fmt.getFrameSize)
          Some(AudioInfo(fmt.getSampleRate.toInt, fmt.getChannels,
            fmt.getSampleSizeInBits, pcm.length.toLong / frameSize, pcm))
        } finally in.close()
      } catch { case _: Exception => None }
    }

  /** Build a canonical RIFF/WAVE file around 8-bit unsigned mono PCM.
    * Deterministic byte-for-byte: fixtures built from text bytes are
    * oracle-predictable (1 sample per input byte).
    */
  def buildWav(samples: Array[Byte], sampleRate: Int = 8000): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(44 + samples.length)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes("ISO-8859-1")).putInt(36 + samples.length)
      .put("WAVE".getBytes("ISO-8859-1"))
    bb.put("fmt ".getBytes("ISO-8859-1")).putInt(16)
      .putShort(1) // PCM
      .putShort(1) // mono
      .putInt(sampleRate)
      .putInt(sampleRate) // byte rate = rate * 1 channel * 1 byte
      .putShort(1) // block align
      .putShort(8) // bits per sample
    bb.put("data".getBytes("ISO-8859-1")).putInt(samples.length).put(samples)
    bb.array()
  }

  /** Audio feature rows: integer metadata from the real decode plus
    * an exact integer energy (sum over samples of (s-128)^2 for 8-bit
    * unsigned PCM) — integer so the oracle hash cannot drift.
    */
  val AudioFeatureSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType, nullable = false),
    StructField("sample_rate", IntegerType, nullable = false),
    StructField("channels", IntegerType, nullable = false),
    StructField("bits", IntegerType, nullable = false),
    StructField("n_frames", LongType, nullable = false),
    StructField("duration_ms", LongType, nullable = false),
    StructField("energy", LongType, nullable = false),
    StructField("decoded", BooleanType, nullable = false)))

  /** Deterministic fallback for payloads no audio reader accepts:
    * pretends the raw bytes are 8-bit mono PCM at 8 kHz.
    */
  def fakeAudioDecode(payload: Array[Byte]): AudioInfo =
    AudioInfo(8000, 1, 8, payload.length.toLong, payload)

  private def pcm8Energy(pcm: Array[Byte]): Long = {
    var acc = 0L
    var i = 0
    while (i < pcm.length) {
      val d = (pcm(i) & 0xff) - 128
      acc += d.toLong * d
      i += 1
    }
    acc
  }

  /** Decode stage for audio payloads: map-only partition-wise, one
    * [[AudioFeatureSchema]] row per document.
    */
  def extractAudioFeatures(withPayloads: DataFrame, idCol: String): DataFrame = {
    val encoder = ExpressionEncoder(AudioFeatureSchema)
    val input = withPayloads.select(col(idCol).cast("long"), col("payload"))
    input.mapPartitions { rows =>
      rows.map { r =>
        val payload = r.getAs[Array[Byte]](1)
        val (info, real) = decodeAudio(payload) match {
          case Some(i) => (i, true)
          case None => (fakeAudioDecode(payload), false)
        }
        val durMs =
          if (info.sampleRate <= 0) 0L else info.nFrames * 1000L / info.sampleRate
        Row(r.getLong(0), info.sampleRate, info.channels, info.bits,
          info.nFrames, durMs, pcm8Energy(info.pcm), real)
      }
    }(encoder)
  }

  /** Number of energy bins in the audio content fingerprint. */
  val AudioFpBins = 64

  /** Schema for the audio-fingerprint stage. */
  val AudioFpSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType, nullable = false),
    StructField("afp", LongType, nullable = false),
    StructField("decoded", BooleanType, nullable = false)))

  /** 64-bit audio content fingerprint over 8-bit unsigned mono PCM:
    * the signal is STRETCHED over [[AudioFpBins]] equal time bins
    * (sample k lands in bin `k·64/n` — the same length normalization
    * [[withBmpPayload]] uses spatially, so two recordings of the
    * same content at different lengths line their bins up), each
    * bin accumulates the exact integer energy Σ(s−128)², and bit b
    * is set iff bin b's energy STRICTLY exceeds the global mean
    * (Σe/64, integer floor) — the band-energy-vs-mean regime of
    * classic audio fingerprinting, time-domain because the gate
    * demands integer-exact replay (an FFT would put floats in the
    * hash path). All-integer, so the DuckDB oracle replays the
    * exact 64-bit value from text characters.
    */
  private[graft] def energyFp64(pcm: Array[Byte]): Long = {
    val e = new Array[Long](AudioFpBins)
    val n = pcm.length
    var k = 0
    while (k < n) {
      val d = (pcm(k) & 0xff) - 128
      e((k.toLong * AudioFpBins / n).toInt) += d.toLong * d
      k += 1
    }
    var sum = 0L
    var i = 0
    while (i < AudioFpBins) { sum += e(i); i += 1 }
    val mean = sum / AudioFpBins
    var hash = 0L
    i = 0
    while (i < AudioFpBins) {
      if (e(i) > mean) hash |= (1L << i)
      i += 1
    }
    hash
  }

  /** Audio content fingerprint per payload: REAL decode (the RIFF
    * walk / `javax.sound.sampled`, [[decodeAudio]]) → binned-energy
    * 64-bit fingerprint ([[energyFp64]]). Payloads no reader
    * recognizes fingerprint their raw bytes as PCM with
    * `decoded = false` — flagged, still flowing. MAP-ONLY at any
    * scale; candidate pairs form only in the downstream Hamming
    * banding ([[Dedup.hammingNearDups]]), the audio sibling of
    * [[imagePhash]].
    */
  def audioFingerprint(withPayloads: DataFrame, idCol: String): DataFrame = {
    val encoder = ExpressionEncoder(AudioFpSchema)
    val input = withPayloads.select(col(idCol).cast("long"), col("payload"))
    input.mapPartitions { rows =>
      rows.map { r =>
        val payload = r.getAs[Array[Byte]](1)
        decodeAudio(payload) match {
          case Some(info) => Row(r.getLong(0), energyFp64(info.pcm), true)
          case None => Row(r.getLong(0), energyFp64(payload), false)
        }
      }
    }(encoder)
  }

  // ---------------------------------------------------------------
  // Perceptual hash (aHash) over decoded pixels.
  // ---------------------------------------------------------------

  /** Canvas side for the deterministic image fixture: 32×32 gray
    * pixels = the payload bytes stretched over 1024 cells, so both the
    * JDK decode and the DuckDB oracle index the same byte grid.
    */
  val PhashCanvas = 32

  /** Wrap each document's text bytes in a real 24-bit BMP (the JDK's
    * `javax.imageio` BMP reader decodes it): a [[PhashCanvas]]²
    * grayscale canvas where pixel (x, y) — y = 0 the TOP row — is
    * text byte `(y·W + x)·len / W²` (R = G = B = byte): the content
    * STRETCHED over the canvas by nearest-neighbor, the standard
    * pHash size-normalization. Zero-padding instead collapsed every
    * short doc onto a handful of identical hashes (2.5k distinct
    * over 50k docs at sf1 → a 132M-row hamming-0 pair blowup), and
    * cyclic fill had full entropy but was shift-sensitive — one
    * insertion rewrote every later sample, so near-dup docs stopped
    * pairing at all. Stretching keeps both properties: all 64 aHash
    * samples are informative at any length, and an edit moves each
    * sampled position by at most `c·Δlen/W²` — near-dups land a few
    * bits apart. Empty docs are all-zero. The deterministic image
    * fixture for the pHash oracle gate, the same role
    * [[withWavPayload]] plays for audio. Map-only.
    */
  def withBmpPayload(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val encoder = ExpressionEncoder(PayloadSchema)
    docs.select(col(idCol).cast("long"), col(textCol))
      .mapPartitions { rows =>
        rows.map { r =>
          Row(r.getLong(0), buildBmp(r.getString(1).getBytes("UTF-8")))
        }
      }(encoder)
  }

  /** Wrap each document's text in a REAL GIF — the SAME gray stretch
    * layout as [[withBmpPayload]] encoded by the JDK's own ImageIO GIF
    * writer (LZW + palette). A grayscale canvas has ≤ 256 distinct
    * colors, so GIF's palette encoding is pixel-LOSSLESS here: the
    * decoded luminance features equal the BMP fixture's bit-for-bit,
    * which is the round-trip assertion the spec locks. Exercises the
    * palette/LZW decode branch of `javax.imageio` that the
    * uncompressed-BMP and PNG fixtures never touch. Map-only.
    */
  def withGifPayload(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val encoder = ExpressionEncoder(PayloadSchema)
    docs.select(col(idCol).cast("long"), col(textCol))
      .mapPartitions { rows =>
        rows.map { r =>
          Row(r.getLong(0), buildGif(r.getString(1).getBytes("UTF-8")))
        }
      }(encoder)
  }

  /** GIF twin of [[buildBmp]]: identical pixel layout, encoded through
    * the JDK's GIF writer instead of a hand-rolled header.
    */
  private[operators] def buildGif(bytes: Array[Byte],
      w: Int = PhashCanvas): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(w, w,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < w) {
      var x = 0
      while (x < w) {
        val i = y * w + x
        val v =
          if (bytes.isEmpty) 0
          else bytes((i.toLong * bytes.length / (w * w)).toInt) & 0xff
        img.setRGB(x, y, (v << 16) | (v << 8) | v)
        x += 1
      }
      y += 1
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "gif", bos)
    bos.toByteArray
  }

  /** 24-bit bottom-up BMP with R=G=B=byte on a W×W canvas. The
    * default W = 32 ([[PhashCanvas]]) and the per-frame W = 16 both
    * keep every row a multiple of 4 bytes, so no pad bytes.
    */
  private[operators] def buildBmp(bytes: Array[Byte],
      w: Int = PhashCanvas): Array[Byte] = {
    require(w % 4 == 0, s"canvas $w would need BMP row padding")
    val rowBytes = w * 3
    val dataSize = rowBytes * w
    val buf = java.nio.ByteBuffer.allocate(54 + dataSize)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    buf.put('B'.toByte).put('M'.toByte).putInt(54 + dataSize)
      .putInt(0).putInt(54)
    buf.putInt(40).putInt(w).putInt(w).putShort(1).putShort(24)
      .putInt(0).putInt(dataSize).putInt(2835).putInt(2835)
      .putInt(0).putInt(0)
    var sy = w - 1 // BMP rows are stored bottom-up; logical y=0 is top
    while (sy >= 0) {
      var x = 0
      while (x < w) {
        val i = sy * w + x
        val v: Byte =
          if (bytes.isEmpty) 0
          else bytes((i.toLong * bytes.length / (w * w)).toInt)
        buf.put(v).put(v).put(v)
        x += 1
      }
      sy -= 1
    }
    buf.array()
  }

  /** Direct 24-bit uncompressed-BMP walk — the scale path for the
    * canonical gray fixture, same lesson as [[parseWavPcm]]: the
    * ImageIO provider registry plus per-pixel `getRGB` colormodel
    * conversion measured ~1 ms/image (4.8 s for 5k fixture BMPs at
    * sf0.1) where this parser reads the same pixels in microseconds.
    * Only plain BI_RGB 24-bit bottom-up files qualify; anything else
    * falls through to the JDK reader below.
    */
  private def parseBmp24Gray(p: Array[Byte]): Option[(Int, Int, Array[Int])] = try {
    def le16(o: Int): Int = (p(o) & 0xff) | ((p(o + 1) & 0xff) << 8)
    def le32(o: Int): Int = (p(o) & 0xff) | ((p(o + 1) & 0xff) << 8) |
      ((p(o + 2) & 0xff) << 16) | ((p(o + 3) & 0xff) << 24)
    if (p.length < 54 || p(0) != 'B' || p(1) != 'M') return None
    val dataOff = le32(10)
    val hdrSize = le32(14)
    val w = le32(18)
    val h = le32(22) // positive = bottom-up, the only layout we emit
    val bits = le16(28)
    val compression = le32(30)
    // dimension/offset sanity BEFORE any arithmetic: a hostile 'BM'
    // header with a negative/huge field must fall through to the JDK
    // reader (which rejects it), never crash the task — the fallback
    // contract is that garbage payloads keep flowing, flagged
    if (hdrSize < 40 || bits != 24 || compression != 0 ||
      w <= 0 || h <= 0 || w > (1 << 15) || h > (1 << 15) ||
      dataOff < 54 || dataOff > p.length)
      return None
    val rowBytes = (w * 3 + 3) / 4 * 4
    if (dataOff.toLong + rowBytes.toLong * h > p.length) return None
    val lum = new Array[Int](w * h)
    var sy = 0
    while (sy < h) {
      val src = dataOff + sy * rowBytes
      val dstRow = (h - 1 - sy) * w
      var x = 0
      while (x < w) {
        val b = p(src + 3 * x) & 0xff
        val g = p(src + 3 * x + 1) & 0xff
        val r = p(src + 3 * x + 2) & 0xff
        lum(dstRow + x) = (r * 299 + g * 587 + b * 114) / 1000
        x += 1
      }
      sy += 1
    }
    Some((w, h, lum))
  } catch { case _: Exception => None }

  /** Decode to a row-major (top-down) luminance grid: the direct BMP
    * walk for canonical 24-bit files, `javax.imageio` for everything
    * else (PNG/JPEG/GIF/WBMP — bulk `getRGB`, one registry probe).
    * Luminance = (299r + 587g + 114b) / 1000 — on a gray image this
    * recovers the byte exactly (299+587+114 = 1000), which is what
    * lets the DuckDB oracle replay pixels from text.
    */
  def decodeGrayPixels(payload: Array[Byte]): Option[(Int, Int, Array[Int])] =
    if (!looksLikeImage(payload)) None
    else parseBmp24Gray(payload).orElse(try {
      val img = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(payload))
      if (img == null) None
      else {
        val w = img.getWidth
        val h = img.getHeight
        val rgb = img.getRGB(0, 0, w, h, null, 0, w)
        val lum = new Array[Int](w * h)
        var i = 0
        while (i < lum.length) {
          val v = rgb(i)
          lum(i) = (((v >> 16) & 0xff) * 299 +
            ((v >> 8) & 0xff) * 587 + (v & 0xff) * 114) / 1000
          i += 1
        }
        Some((w, h, lum))
      }
    } catch { case _: Exception => None })

  /** Average-hash over a luminance grid: nearest-neighbor sample onto
    * an 8×8 grid (source pixel (x·w/8, y·h/8) — integer floor, the
    * deterministic downsample [[resizeImage]] also uses), integer mean
    * (floor; all inputs non-negative so both engines' division agree),
    * bit i = y·8+x set iff sample STRICTLY exceeds the mean. All
    * integer, so the oracle replays the exact 64-bit value.
    */
  private[graft] def aHash64(lum: Array[Int], w: Int, h: Int): Long = {
    val g = new Array[Int](64)
    var sum = 0L
    var i = 0
    while (i < 64) {
      g(i) = lum((i / 8) * h / 8 * w + (i % 8) * w / 8)
      sum += g(i)
      i += 1
    }
    val mean = sum / 64
    var hash = 0L
    i = 0
    while (i < 64) {
      if (g(i) > mean) hash |= (1L << i)
      i += 1
    }
    hash
  }

  /** Schema for the perceptual-hash stage. */
  val PhashSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType, nullable = false),
    StructField("phash", LongType, nullable = false),
    StructField("decoded", BooleanType, nullable = false)))

  /** Perceptual hash per image payload: decode → 8×8 aHash → 64-bit
    * fingerprint, [[PhashSchema]] rows. Payloads no reader recognizes
    * fall back to aHash over the raw bytes laid out on the same
    * [[PhashCanvas]]² grid (stretched) with `decoded = false` — the
    * non-image rows keep flowing, flagged. MAP-ONLY at any scale; the
    * downstream Hamming banding join
    * ([[Dedup.hammingNearDups]]) is where candidate pairs form.
    */
  def imagePhash(withPayloads: DataFrame, idCol: String): DataFrame = {
    val encoder = ExpressionEncoder(PhashSchema)
    val input = withPayloads.select(col(idCol).cast("long"), col("payload"))
    input.mapPartitions { rows =>
      rows.map { r =>
        val payload = r.getAs[Array[Byte]](1)
        decodeGrayPixels(payload) match {
          case Some((w, h, lum)) =>
            Row(r.getLong(0), aHash64(lum, w, h), true)
          case None =>
            val w = PhashCanvas
            val lum = new Array[Int](w * w)
            var i = 0
            while (i < lum.length) {
              lum(i) = if (payload.isEmpty) 0
                else payload((i.toLong * payload.length / lum.length).toInt) & 0xff
              i += 1
            }
            Row(r.getLong(0), aHash64(lum, w, w), false)
        }
      }
    }(encoder)
  }

  /** Schema for the per-frame fingerprint stage. `decoded` records
    * which path produced the hash: true = pixel luminance from a real
    * image decode of the access unit, false = the container-level
    * byte fallback.
    */
  val FramePhashSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType, nullable = false),
    StructField("frame_no", IntegerType, nullable = false),
    StructField("phash", LongType, nullable = false),
    StructField("decoded", BooleanType, nullable = false)))

  /** Per-frame 64-bit fingerprint over demuxed access units, PIXEL
    * level when the frame decodes: an access unit any installed image
    * reader accepts (the [[withMp4ImagePayload]] fixture's BMP
    * frames, or JPEG/PNG sample tracks in the wild) is decoded to
    * luminance by [[decodeGrayPixels]] and aHashed exactly like
    * [[imagePhash]] — so a RE-ENCODED duplicate frame (same pixels,
    * different bytes) still collides, which the byte path cannot see.
    * Frames no reader recognizes (opaque codec payloads — no such
    * pixel codec ships in this container) fall back to the
    * CONTAINER-level hash of the first 64 sample bytes on an 8×8
    * canvas, flagged `decoded = false` and still flowing. Map-only,
    * one pass over the frame relation produced by [[sampleFrames]].
    */
  def framePhash(frames: DataFrame, idCol: String, frameNoCol: String): DataFrame = {
    val encoder = ExpressionEncoder(FramePhashSchema)
    val input = frames.select(col(idCol).cast("long"),
      col(frameNoCol).cast("int"), col("frame"))
    input.mapPartitions { rows =>
      rows.map { r =>
        val bytes = r.getAs[Array[Byte]](2)
        decodeGrayPixels(bytes) match {
          case Some((w, h, lum)) =>
            Row(r.getLong(0), r.getInt(1), aHash64(lum, w, h), true)
          case None =>
            val lum = new Array[Int](64)
            var i = 0
            while (i < 64) {
              lum(i) = if (i < bytes.length) bytes(i) & 0xff else 0
              i += 1
            }
            Row(r.getLong(0), r.getInt(1), aHash64(lum, 8, 8), false)
        }
      }
    }(encoder)
  }

  /** Decode/feature-extract stage: partition-wise over the payload
    * column, emitting [[FeatureSchema]] rows. No shuffle — map-only,
    * embarrassingly parallel over the corpus.
    */
  def extractFeatures(withPayloads: DataFrame, idCol: String): DataFrame = {
    val spark = withPayloads.sparkSession
    val encoder = ExpressionEncoder(FeatureSchema)
    val input = withPayloads.select(
      col(idCol).cast("long"), col("payload"),
      col("meta.media_type"), col("meta.n_bytes"))
    input.mapPartitions { rows =>
      rows.map { r =>
        val id = r.getLong(0)
        val payload = r.getAs[Array[Byte]](1)
        decodeImage(payload) match {
          case Some((w, h, feat)) =>
            Row(id, r.getString(2), r.getLong(3), w, h, true, feat.toSeq)
          case None =>
            val (w, h, feat) = fakeDecode(payload)
            Row(id, r.getString(2), r.getLong(3), w, h, false, feat.toSeq)
        }
      }
    }(encoder)
  }
}
