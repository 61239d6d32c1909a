package graft.operators

import graft.functions.TextFunctions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: image/audio/video as opaque `binary`
  * columns with typed metadata, plus decode / feature-extract /
  * frame-sample operators.
  *
  * The Spark-side plumbing — binary schema, metadata projection,
  * deterministic batched transforms, partition-friendly shapes — is real
  * and oracle-checked. The actual media DECODE is a clearly marked STUB
  * (this container ships no image/audio codecs): [[decodeImageStub]]
  * derives plausible typed fields deterministically from the bytes, and is
  * the single splice point where a real decoder (a vectorized
  * Arrow/Pandas-UDF batch decode, or a JNI codec behind a native
  * `Expression`) would plug in without touching any caller.
  */
object Multimodal {

  /** Treat a string column as an opaque binary payload (the fixture stand-
    * in for image/audio bytes). */
  def asPayload(c: Column): Column = encode(c, "UTF-8")

  /** Typed metadata every modality carries regardless of codec. */
  def payloadMeta(payload: Column): Column =
    struct(
      length(payload).cast("long").as("n_bytes"),
      lower(hex(substring(payload, 1, 8))).as("header_hex")
    )

  /** STUB decode: width/height/channels derived deterministically from a
    * 32-bit md5 of the header bytes. A real implementation replaces ONLY
    * the body (e.g. `mapInArrow` over the binary column → actual pixel
    * dims); the schema and call sites stay fixed. */
  def decodeImageStub(payload: Column): Column = {
    val h = TextFunctions.md5Hash32(lower(hex(payload)))
    struct(
      (pmod(h, lit(1920L)) + 1L).cast("long").as("width"),
      (pmod(shiftright(h, 8), lit(1080L)) + 1L).cast("long").as("height"),
      lit(3L).as("channels")
    )
  }

  /** STUB feature extraction: an 8-dim pseudo-embedding from seeded md5
    * hashes of the payload, normalized to [0,1). Deterministic, portable,
    * and shaped exactly like a real encoder output (array<double>). */
  def featureStub(payload: Column): Column =
    transform(
      sequence(lit(0), lit(7)),
      i =>
        TextFunctions.md5Hash32(concat(i.cast("string"), lit(":"), lower(hex(payload))))
          .cast("double") / lit(4294967296.0)
    )

  /** Frame sampling for a "video" payload: every `stride`-th 16-byte block
    * as one frame (binary slices — the partition-local, codec-free shape
    * real frame extraction follows). Guarded for payloads shorter than one
    * block: Spark's `sequence(0, -1)` yields a DESCENDING [0, -1], not an
    * empty array. */
  def sampleFrames(payload: Column, stride: Int): Column = {
    val nFrames = (length(payload) / lit(16 * stride)).cast("int")
    when(nFrames <= 0, array().cast("array<binary>"))
      .otherwise(
        transform(
          sequence(lit(0), nFrames - 1),
          i => substring(payload, i * (16 * stride) + 1, lit(16))
        )
      )
  }

  /** Decoded image record: the fixed schema the batched decoder fills. */
  final case class DecodedImage(
      doc_id: Long, width: Int, height: Int, channels: Int, ok: Boolean)

  /** Partition-batched decode — the REAL plumbing a codec plugs into.
    * One decoder instance per partition (that's where a JNI codec or an
    * Arrow batch handle would be initialized once, not per row), rows
    * streamed through it, failures surfaced as `ok=false` rather than
    * task death. The default decoder is the deterministic stub; swap
    * `decode` for libjpeg/ffmpeg bindings and NOTHING else changes —
    * schema, partitioning, and batch shape are fixed here.
    *
    * This is the `mapPartitions` escape hatch used deliberately (SURVEY
    * §7.3: last resort) — decoding is genuinely imperative per-bytes work
    * no Catalyst expression expresses. */
  def decodeBatch(
      payloads: org.apache.spark.sql.Dataset[(Long, Array[Byte])],
      decode: Array[Byte] => Option[(Int, Int, Int)] = stubDecoder
  ): org.apache.spark.sql.Dataset[DecodedImage] = {
    import payloads.sparkSession.implicits._
    payloads.mapPartitions { it =>
      // per-partition init site (codec handles, arena buffers, ...)
      it.map { case (id, bytes) =>
        decode(bytes) match {
          case Some((w, h, c)) => DecodedImage(id, w, h, c, ok = true)
          case None => DecodedImage(id, 0, 0, 0, ok = false)
        }
      }
    }
  }

  /** Deterministic stand-in for a real image decoder: derives dims from
    * the byte content; rejects empty payloads (exercises the failure
    * path). */
  val stubDecoder: Array[Byte] => Option[(Int, Int, Int)] = { bytes =>
    if (bytes == null || bytes.isEmpty) None
    else {
      var h = 2166136261L
      bytes.foreach(b => h = (h ^ (b & 0xffL)) * 16777619L)
      val v = (h & 0x7fffffffL)
      Some(((v % 1920).toInt + 1, ((v >> 8) % 1080).toInt + 1, 3))
    }
  }

  /** REAL image decode using the JDK's own codecs (`javax.imageio`: PNG,
    * GIF, BMP, JPEG — no external libraries). Returns the actual pixel
    * dimensions and color-component count; `None` when no installed
    * reader recognises the bytes. Plugged into [[decodeBatch]] this
    * upgrades the multimodal path from "plumbing proven" to "decode
    * proven" for the formats the JDK ships. */
  val imageIoDecoder: Array[Byte] => Option[(Int, Int, Int)] = { bytes =>
    if (bytes == null || bytes.isEmpty) None
    else
      try {
        val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
        if (img == null) None
        else Some((img.getWidth, img.getHeight, img.getColorModel.getNumComponents))
      } catch { case _: Exception => None }
  }

  /** Default production decoder: real JDK decode first, deterministic
    * stub for payloads no reader recognises (e.g. the text-derived
    * fixture payloads), so a mixed-format corpus still decodes every
    * row. */
  val imageIoWithStubFallback: Array[Byte] => Option[(Int, Int, Int)] =
    bytes => imageIoDecoder(bytes).orElse(stubDecoder(bytes))

  /** Decoded audio record: the fixed schema the batched audio decoder
    * fills. */
  final case class DecodedAudio(
      doc_id: Long, sample_rate: Int, channels: Int, bits: Int,
      n_frames: Long, ok: Boolean)

  /** REAL audio decode using the JDK's own parsers
    * (`javax.sound.sampled`: WAV/AU/AIFF — no external libraries).
    * Returns (sampleRate, channels, bitsPerSample, frameCount); `None`
    * when no installed reader recognises the bytes. The audio analog of
    * [[imageIoDecoder]] — video remains the one genuinely stubbed
    * modality (the JDK ships no video codec). */
  val audioDecoder: Array[Byte] => Option[(Int, Int, Int, Long)] = { bytes =>
    if (bytes == null || bytes.isEmpty) None
    else
      try {
        val in = javax.sound.sampled.AudioSystem.getAudioInputStream(
          new java.io.ByteArrayInputStream(bytes))
        try {
          val f = in.getFormat
          // getFrameLength can be AudioSystem.NOT_SPECIFIED (-1) for
          // headers that omit it — incomplete metadata is a reject, not
          // an ok=true row carrying a -1 sentinel into duration math
          if (in.getFrameLength < 0) None
          else Some((f.getSampleRate.toInt, f.getChannels,
            f.getSampleSizeInBits, in.getFrameLength))
        } finally in.close()
      } catch { case _: Exception => None }
  }

  /** Partition-batched audio decode — same contract as [[decodeBatch]]:
    * per-partition decoder init, failures as `ok=false` rows, fixed
    * output schema. */
  def decodeAudioBatch(
      payloads: org.apache.spark.sql.Dataset[(Long, Array[Byte])],
      decode: Array[Byte] => Option[(Int, Int, Int, Long)] = audioDecoder
  ): org.apache.spark.sql.Dataset[DecodedAudio] = {
    import payloads.sparkSession.implicits._
    payloads.mapPartitions { it =>
      it.map { case (id, bytes) =>
        decode(bytes) match {
          case Some((sr, ch, bits, frames)) =>
            DecodedAudio(id, sr, ch, bits, frames, ok = true)
          case None => DecodedAudio(id, 0, 0, 0, 0L, ok = false)
        }
      }
    }
  }

  /** REAL perceptual dHash over decoded pixels — the classic 8×8
    * gradient hash: decode (JDK ImageIO), block-average downsample to a
    * 9×8 luma grid in pure integer arithmetic (no Graphics scaler — its
    * interpolation is platform-dependent; integer block means are
    * deterministic everywhere), then one bit per cell: is this cell
    * brighter than its right neighbour? Uniform brightness shifts
    * preserve every comparison, so the hash is invariant to them by
    * construction; resizes approximately preserve block means, so
    * resized copies land within a few bits — the property that makes
    * Hamming-banded dHash the standard image near-dup key. `None` for
    * undecodable bytes or images smaller than the 9×8 grid. */
  val imageDHash: Array[Byte] => Option[Long] = { bytes =>
    if (bytes == null || bytes.isEmpty) None
    else
      try {
        val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
        if (img == null) None
        else dHash64(img.getWidth, img.getHeight, (x, y) => {
          val rgb = img.getRGB(x, y)
          (299L * ((rgb >> 16) & 0xff) + 587L * ((rgb >> 8) & 0xff) +
            114L * (rgb & 0xff)) / 1000L
        })
      } catch { case _: Exception => None }
  }

  /** The 8×9 exact-integer block-mean downsample over any luma
    * accessor — dHash's first half, exposed on its own so the decoded
    * grid can be materialized as an oracle fixture (the gradient fold
    * downstream of it is plain relational math DuckDB recomputes).
    * Row-major `Array[Long]` of 72 cells (cell r·9+c), the exact layout
    * [[lumaGrid]]/[[phashHalf]] use for the text-payload fixture, so
    * the SAME downstream bit math serves both. `None` below the 9×8
    * grid. */
  private[graft] def blockMeans72(
      w: Int, h: Int, lumaAt: (Int, Int) => Long): Option[Array[Long]] = {
    if (w < 9 || h < 8) None
    else {
      val luma = new Array[Long](72)
      var r = 0
      while (r < 8) {
        var c = 0
        while (c < 9) {
          val (y0, y1) = (r * h / 8, (r + 1) * h / 8)
          val (x0, x1) = (c * w / 9, (c + 1) * w / 9)
          var s = 0L
          var y = y0
          while (y < y1) {
            var x = x0
            while (x < x1) { s += lumaAt(x, y); x += 1 }
            y += 1
          }
          luma(r * 9 + c) = s / ((y1 - y0).toLong * (x1 - x0))
          c += 1
        }
        r += 1
      }
      Some(luma)
    }
  }

  /** dHash's second half: the 64 gradient comparisons over a
    * [[blockMeans72]] grid — bit k = r·8+c set iff cell (r, c) is
    * brighter than (r, c+1). Pure integer comparisons, recomputable
    * bit-for-bit by the DuckDB oracle over the fixture grid. */
  private[graft] def gradientHash64(luma: Array[Long]): Long = {
    var hash = 0L
    var k = 0
    var r = 0
    while (r < 8) {
      var c = 0
      while (c < 8) {
        if (luma(r * 9 + c) > luma(r * 9 + c + 1)) hash |= (1L << k)
        k += 1; c += 1
      }
      r += 1
    }
    hash
  }

  /** The 8×9 block-mean gradient hash over any luma accessor — the one
    * dHash arithmetic shared by [[imageDHash]] (decoded RGB → luma) and
    * the Y4M video path (the Y plane IS luma). `None` below the 9×8
    * grid. Exact integer block means; bit j of row r set iff cell
    * (r, c) is brighter than (r, c+1). Composition of [[blockMeans72]]
    * and [[gradientHash64]] — the seam the video oracle fixture splits
    * at. */
  private[graft] def dHash64(w: Int, h: Int, lumaAt: (Int, Int) => Long): Option[Long] =
    blockMeans72(w, h, lumaAt).map(gradientHash64)

  /** REAL audio fingerprint over decoded PCM — the audio analog of
    * [[imageDHash]]: decode (javax.sound, 16-bit signed PCM), fold
    * channels to their per-frame sum, split the clip into 65 equal
    * segments, per-segment mean ABSOLUTE amplitude (energy) in exact
    * integer arithmetic, then one bit per adjacent segment pair: is
    * this segment louder than the next? Uniform GAIN changes preserve
    * every strict comparison (all energies scale together), so the
    * fingerprint is volume-invariant by construction — the property
    * that makes energy-delta hashing the audio near-dup key (the same
    * role brightness-invariance plays for dHash); re-encodes and mild
    * resampling approximately preserve segment energies, landing
    * within a few Hamming bits. `None` for undecodable bytes,
    * non-16-bit encodings, or clips shorter than 65 samples. The
    * resulting 64-bit key feeds the identical band-equijoin + exact
    * Hamming pipeline as the text/image families. Composition of
    * [[audioEnergies]] (the decode-side kernel) and [[energyHash64]]
    * (the relational fold the oracle recomputes over the fixture). */
  val audioFingerprint: Array[Byte] => Option[Long] = bytes =>
    audioEnergies(bytes).map(energyHash64)

  /** The energy-delta fold downstream of [[audioEnergies]]: bit k set
    * iff segment k is louder than segment k+1 — 64 integer comparisons
    * over the 65 energies, recomputable bit-for-bit by the DuckDB
    * oracle over the fixture table. */
  private[graft] def energyHash64(energy: Array[Long]): Long = {
    var hash = 0L
    var k = 0
    while (k < 64) {
      if (energy(k) > energy(k + 1)) hash |= (1L << k)
      k += 1
    }
    hash
  }

  /** The decode-side audio kernel: container parse (javax.sound) →
    * per-frame channel-sum amplitude → 65 exact-integer segment mean
    * energies. This is the part with no SQL counterpart; everything
    * after it ([[energyHash64]]) is oracle-recomputable, which is why
    * the `audio_fingerprint` query materializes THESE values as its
    * fixture. */
  val audioEnergies: Array[Byte] => Option[Array[Long]] = { bytes =>
    if (bytes == null || bytes.isEmpty) None
    else
      try {
        val in = javax.sound.sampled.AudioSystem.getAudioInputStream(
          new java.io.ByteArrayInputStream(bytes))
        try {
          val f = in.getFormat
          val pcmOk =
            f.getEncoding == javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED &&
              f.getSampleSizeInBits == 16
          if (!pcmOk || in.getFrameLength < 65) None
          else {
            val raw = in.readAllBytes()
            val ch = f.getChannels
            val be = f.isBigEndian
            val nFrames = raw.length / (2 * ch)
            // per-frame channel-sum amplitude, exact integers
            val amp = new Array[Long](nFrames)
            var i = 0
            while (i < nFrames) {
              var c = 0
              var s = 0L
              while (c < ch) {
                val o = (i * ch + c) * 2
                val v =
                  if (be) ((raw(o) << 8) | (raw(o + 1) & 0xff)).toShort
                  else ((raw(o + 1) << 8) | (raw(o) & 0xff)).toShort
                s += math.abs(v.toLong)
                c += 1
              }
              amp(i) = s
              i += 1
            }
            if (nFrames < 65) None
            else {
              val energy = new Array[Long](65)
              var k = 0
              while (k < 65) {
                val st = (k.toLong * nFrames / 65).toInt
                val en = ((k + 1).toLong * nFrames / 65).toInt
                var s = 0L
                var j = st
                while (j < en) { s += amp(j); j += 1 }
                energy(k) = s / (en - st)
                k += 1
              }
              Some(energy)
            }
          }
        } finally in.close()
      } catch { case _: Exception => None }
  }

  /** Parsed Y4M clip: dimensions, frame rate, colorspace, and the byte
    * offset of each frame's Y (luma) plane inside the payload. */
  final case class Y4mClip(
      width: Int, height: Int, fpsNum: Int, fpsDen: Int,
      colorspace: String, frameOffsets: IndexedSeq[Int])

  /** REAL video decode for the uncompressed YUV4MPEG2 (.y4m) container —
    * pure JVM, no codecs needed (the format ffmpeg and every codec
    * test-suite exchanges raw video in): parse the `YUV4MPEG2 W… H… F…
    * C…` header, then walk the `FRAME`-delimited raw planar frames.
    * Supported colorspaces: C420 family (Y plane + 2 quarter chroma),
    * C422, C444, Cmono — anything else, a malformed header, or a
    * TRUNCATED final frame rejects the clip (half a frame must not
    * silently pass as a shorter video). Returns the per-frame Y-plane
    * offsets: the Y plane IS the luma grid, so frame hashing needs no
    * color conversion at all. This closes the one remaining stubbed
    * modality (image and audio decode have been real since round 9). */
  val y4mDecoder: Array[Byte] => Option[Y4mClip] = { bytes =>
    try {
      val magic = "YUV4MPEG2"
      val nl0 = bytes.indexOf('\n'.toByte)
      if (bytes.length < magic.length || nl0 < 0 ||
          new String(bytes, 0, magic.length, "US-ASCII") != magic) None
      else {
        val header = new String(bytes, 0, nl0, "US-ASCII")
        val params = header.split(' ').drop(1)
        def num(tag: Char): Option[Int] =
          params.find(_.startsWith(tag.toString)).map(_.drop(1).toInt)
        val cs = params.find(_.startsWith("C")).map(_.drop(1)).getOrElse("420")
        (num('W'), num('H')) match {
          // 1 << 14 caps each dimension: keeps every frame-size product
          // (up to 3·w·h for C444) inside Int without overflow — a
          // hostile 'W65536 H65536' header would otherwise wrap the
          // frame size to 0 (tiny payload "decodes" with garbage
          // offsets) or negative (the frame walk stops advancing)
          case (Some(w), Some(h)) if w > 0 && h > 0 && w <= (1 << 14) && h <= (1 << 14) =>
            val fps = params.find(_.startsWith("F")).map(_.drop(1).split(':'))
              .collect { case Array(a, b) => (a.toInt, b.toInt) }
              .getOrElse((25, 1)) // Y4M leaves F optional; PAL default
            val frameBytes: Option[Int] = cs match {
              case c if c.startsWith("420") =>
                if (w % 2 == 0 && h % 2 == 0) Some(w * h * 3 / 2) else None
              case c if c.startsWith("422") =>
                if (w % 2 == 0) Some(w * h * 2) else None
              case c if c.startsWith("444") => Some(w * h * 3)
              case c if c.startsWith("mono") => Some(w * h)
              case _ => None
            }
            frameBytes.flatMap { fb =>
              val offsets = scala.collection.mutable.ArrayBuffer.empty[Int]
              var pos = nl0 + 1
              var bad = false
              while (!bad && pos < bytes.length) {
                // each frame: "FRAME"[ params]\n then fb raw bytes
                var nl = pos
                while (nl < bytes.length && bytes(nl) != '\n'.toByte) nl += 1
                val mark = new String(bytes, pos, math.min(5, nl - pos), "US-ASCII")
                if (nl >= bytes.length || mark != "FRAME" ||
                    nl.toLong + 1 + fb > bytes.length) bad = true
                else { offsets += nl + 1; pos = nl + 1 + fb }
              }
              if (bad || offsets.isEmpty) None
              else Some(Y4mClip(w, h, fps._1, fps._2, cs, offsets.toIndexedSeq))
            }
          case _ => None
        }
      }
    } catch { case _: Exception => None }
  }

  /** dHash of every `stride`-th frame of a Y4M clip — [[imageDHash]]'s
    * arithmetic applied straight to the Y plane (no color conversion:
    * Y IS luma). The per-keyframe 64-bit keys feed the identical
    * band-equijoin + exact-Hamming near-dup pipeline as the image and
    * audio families. */
  def y4mFrameHashes(bytes: Array[Byte], stride: Int): Option[Seq[(Int, Long)]] =
    try {
      y4mDecoder(bytes).map { clip =>
        clip.frameOffsets.zipWithIndex
          .collect { case (off, idx) if idx % stride == 0 =>
            dHash64(clip.width, clip.height,
              (x, y) => bytes(off + y * clip.width + x) & 0xffL)
              .map(h => idx -> h)
          }
          .flatten
      }.filter(_.nonEmpty)
    } catch {
      // the decoder validates frame bounds, but hashing must honor the
      // ok=false contract even if a payload slips past it — a corrupt
      // clip rejects, it never kills the task
      case _: Exception => None
    }

  /** [[blockMeans72]] of every `stride`-th frame of a Y4M clip — the
    * decode-side half of [[y4mFrameHashes]], exposed so the
    * `video_phash` query can materialize the decoded grids as its
    * oracle fixture (the gradient fold is then recomputed by both
    * engines over the read-back fixture). */
  def y4mFrameGrids(bytes: Array[Byte], stride: Int): Option[Seq[(Int, Array[Long])]] =
    try {
      y4mDecoder(bytes).map { clip =>
        clip.frameOffsets.zipWithIndex
          .collect { case (off, idx) if idx % stride == 0 =>
            blockMeans72(clip.width, clip.height,
              (x, y) => bytes(off + y * clip.width + x) & 0xffL)
              .map(g => idx -> g)
          }
          .flatten
      }.filter(_.nonEmpty)
    } catch { case _: Exception => None }

  /** Decoded video record: the fixed schema the batched video decoder
    * fills. */
  final case class DecodedVideo(
      doc_id: Long, width: Int, height: Int, fps_num: Int, fps_den: Int,
      n_frames: Int, ok: Boolean)

  /** Per-(doc, sampled frame) perceptual hash row. */
  final case class VideoFrameHash(doc_id: Long, frame_idx: Int, phash: Long, ok: Boolean)

  /** Partition-batched video metadata decode — [[decodeBatch]]'s
    * contract for the video modality. */
  def decodeVideoBatch(
      payloads: org.apache.spark.sql.Dataset[(Long, Array[Byte])],
      decode: Array[Byte] => Option[Y4mClip] = y4mDecoder
  ): org.apache.spark.sql.Dataset[DecodedVideo] = {
    import payloads.sparkSession.implicits._
    payloads.mapPartitions { it =>
      it.map { case (id, bytes) =>
        decode(bytes) match {
          case Some(c) => DecodedVideo(id, c.width, c.height,
            c.fpsNum, c.fpsDen, c.frameOffsets.size, ok = true)
          case None => DecodedVideo(id, 0, 0, 0, 0, 0, ok = false)
        }
      }
    }
  }

  /** Partition-batched per-keyframe video hashing — one
    * [[VideoFrameHash]] row per sampled frame; an undecodable payload
    * yields a single `ok=false` row so failures stay visible in the
    * output (the [[phashBatch]] contract, fanned out per frame). */
  def videoPhashBatch(
      payloads: org.apache.spark.sql.Dataset[(Long, Array[Byte])],
      stride: Int = 1
  ): org.apache.spark.sql.Dataset[VideoFrameHash] = {
    import payloads.sparkSession.implicits._
    payloads.mapPartitions { it =>
      it.flatMap { case (id, bytes) =>
        y4mFrameHashes(bytes, stride) match {
          case Some(hs) => hs.map { case (idx, h) => VideoFrameHash(id, idx, h, ok = true) }
          case None => Seq(VideoFrameHash(id, -1, 0L, ok = false))
        }
      }
    }
  }

  /** Per-(doc, sampled frame) decoded 8×9 luma grid row — the video
    * oracle fixture's schema (72 block means per keyframe; an
    * undecodable payload is one `ok=false` row with an empty grid). */
  final case class VideoFrameGrid(
      doc_id: Long, frame_idx: Int, grid: Seq[Long], ok: Boolean)

  /** Partition-batched per-keyframe grid decode — [[videoPhashBatch]]
    * stopped at the [[blockMeans72]] seam, for fixture materialization:
    * decode where the bytes live, ship only (doc_id, frame, 72 longs). */
  def videoGridBatch(
      payloads: org.apache.spark.sql.Dataset[(Long, Array[Byte])],
      stride: Int = 1
  ): org.apache.spark.sql.Dataset[VideoFrameGrid] = {
    import payloads.sparkSession.implicits._
    payloads.mapPartitions { it =>
      it.flatMap { case (id, bytes) =>
        y4mFrameGrids(bytes, stride) match {
          case Some(gs) =>
            gs.map { case (idx, g) => VideoFrameGrid(id, idx, g.toSeq, ok = true) }
          case None => Seq(VideoFrameGrid(id, -1, Seq.empty, ok = false))
        }
      }
    }
  }

  /** Per-doc decoded segment-energy row — the audio oracle fixture's
    * schema (65 exact-integer energies; undecodable → `ok=false`,
    * empty). */
  final case class AudioEnergyRow(doc_id: Long, energy: Seq[Long], ok: Boolean)

  /** Partition-batched audio energy decode — [[audioFpBatch]] stopped
    * at the [[audioEnergies]] seam, for fixture materialization. */
  def audioEnergyBatch(
      payloads: org.apache.spark.sql.Dataset[(Long, Array[Byte])]
  ): org.apache.spark.sql.Dataset[AudioEnergyRow] = {
    import payloads.sparkSession.implicits._
    payloads.mapPartitions { it =>
      it.map { case (id, bytes) =>
        audioEnergies(bytes) match {
          case Some(e) => AudioEnergyRow(id, e.toSeq, ok = true)
          case None => AudioEnergyRow(id, Seq.empty, ok = false)
        }
      }
    }
  }

  /** Per-doc audio fingerprint row. */
  final case class AudioHash(doc_id: Long, afp: Long, ok: Boolean)

  /** Partition-batched audio fingerprinting — [[phashBatch]]'s contract
    * for the audio modality: per-partition decoder, failures as
    * `ok=false` rows. */
  def audioFpBatch(
      payloads: org.apache.spark.sql.Dataset[(Long, Array[Byte])],
      fp: Array[Byte] => Option[Long] = audioFingerprint
  ): org.apache.spark.sql.Dataset[AudioHash] = {
    import payloads.sparkSession.implicits._
    payloads.mapPartitions { it =>
      it.map { case (id, bytes) =>
        fp(bytes) match {
          case Some(h) => AudioHash(id, h, ok = true)
          case None => AudioHash(id, 0L, ok = false)
        }
      }
    }
  }

  /** Per-doc perceptual hash row: the near-dup key for an image corpus. */
  final case class ImageHash(doc_id: Long, phash: Long, ok: Boolean)

  /** Partition-batched perceptual hashing — [[decodeBatch]]'s contract
    * (per-partition decoder init, failures as `ok=false`, fixed schema)
    * applied to [[imageDHash]]. Feed its output to the same 4×16 band
    * equijoin + exact-Hamming re-check the text near-dups use
    * (`simhash_neardup` / `phash_neardup` shape) — that composition IS
    * image near-dup at 100 TB: candidates come from band equality on a
    * compact key, never pixel-by-pixel comparison. */
  def phashBatch(
      payloads: org.apache.spark.sql.Dataset[(Long, Array[Byte])],
      hash: Array[Byte] => Option[Long] = imageDHash
  ): org.apache.spark.sql.Dataset[ImageHash] = {
    import payloads.sparkSession.implicits._
    payloads.mapPartitions { it =>
      it.map { case (id, bytes) =>
        hash(bytes) match {
          case Some(ph) => ImageHash(id, ph, ok = true)
          case None => ImageHash(id, 0L, ok = false)
        }
      }
    }
  }

  /** The 8×9 luma grid of the FIXTURE payload, in pure Catalyst — the
    * oracle-checkable twin of [[imageDHash]]'s downsample step. The
    * fixture's "image" is the document's UTF-8 payload and its text is
    * pure ASCII (verified in the multimodal_meta oracle), so character
    * code IS byte value: cell k of 72 (row-major 8 rows × 9 cols)
    * covers the character segment `[k·L div 72, (k+1)·L div 72)` and
    * its "luma" is the integer mean of the codes — the same
    * block-average arithmetic, with bytes standing in for pixels the
    * way [[decodeImageStub]] stands in for a codec. Exact BIGINT
    * arithmetic end to end (sums of ≤127-valued codes; one integer
    * division per cell), so both engines agree bit-for-bit. Payloads
    * shorter than 72 chars have an empty segment somewhere and are the
    * caller's to filter (the `< 3 tokens ⇒ no signature` contract of
    * the MinHash family).
    *
    * `brightness` adds a constant to every "pixel" — the stand-in for
    * a uniformly brightened re-encode of the same image. The per-cell
    * mean shifts by exactly that constant, so every gradient
    * comparison (hence the dHash) is PRESERVED — the invariance the
    * `phash_neardup` oracle plants and verifies.
    *
    * Backed by the native [[graft.expressions.LumaGrid]] kernel (one
    * code-point sweep in compiled Scala); the equivalent Catalyst HOF
    * form it replaced paid an interpreted lambda plus a per-character
    * substring allocation — measured ~4 s/query at sf0.1 against
    * sub-second for the kernel. */
  def lumaGrid(textCol: String, brightness: Int = 0): Column =
    org.apache.spark.sql.graft.ColumnBridge.column(
      graft.expressions.LumaGrid(
        org.apache.spark.sql.graft.ColumnBridge.expression(col(textCol)),
        brightness))

  /** One 32-bit half of the 64-bit dHash from a [[lumaGrid]] (rows
    * `rowOffset..rowOffset+3`): bit j set iff cell (r, c) is brighter
    * than cell (r, c+1), j = (r − rowOffset)·8 + c. Two positive
    * 32-bit halves sidestep the signed-BIGINT bit-63 hazard on both
    * engines, exactly like `simhash_neardup`'s `sh_lo`/`sh_hi`. */
  def phashHalf(grid: Column, rowOffset: Int): Column =
    (0 until 32).map { j =>
      val r = rowOffset + j / 8
      val c = j % 8
      when(element_at(grid, r * 9 + c + 1) > element_at(grid, r * 9 + c + 2),
        lit(1L << j)).otherwise(lit(0L))
    }.reduce(_ + _)

  /** The oracle-checked multimodal query: documents → payload + metadata +
    * stub decode + stub features. */
  def metaQuery(docs: DataFrame): DataFrame = {
    val withPayload = docs.withColumn("payload", asPayload(col("text")))
    withPayload.select(
      col("doc_id"),
      col("payload"),
      payloadMeta(col("payload")).as("meta"),
      decodeImageStub(col("payload")).as("img"),
      featureStub(col("payload")).as("features")
    ).select(
      col("doc_id"),
      col("meta.n_bytes").as("n_bytes"),
      col("meta.header_hex").as("header_hex"),
      col("img.width").as("width"),
      col("img.height").as("height"),
      element_at(col("features"), 1).as("f0"),
      element_at(col("features"), 8).as("f7")
    )
  }
}
