package graft.operators

import java.awt.image.BufferedImage
import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
import javax.imageio.ImageIO

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Decoded-image channel statistics row (top-level, public: Spark's encoder
  * codegen compiles accessor calls with janino, which cannot see private
  * nested classes — a private class here silently degrades every featurize
  * to interpreted mode). */
case class ImgStats(
    id: Long, decode_ok: Boolean, byte_len: Int,
    width: Option[Int], height: Option[Int],
    sum_r: Option[Long], sum_g: Option[Long], sum_b: Option[Long],
    sumsq_r: Option[Long], sumsq_g: Option[Long], sumsq_b: Option[Long])

/** Decoder-invariant JPEG metadata row for [[Multimodal.decodeMeta]]:
  * the fields every spec-compliant decoder agrees on (dimensions, band
  * count) — pixel VALUES are lossy-codec/decoder-version dependent and
  * deliberately absent. */
case class JpegMeta(
    id: Long, decode_ok: Boolean,
    width: Option[Int], height: Option[Int], n_channels: Option[Int])

/** Per-frame stats row for [[Multimodal.frameStats]]. */
case class FrameStats(
    id: Long, frame_idx: Int, decode_ok: Boolean,
    width: Option[Int], height: Option[Int],
    sum_r: Option[Long], sum_g: Option[Long], sum_b: Option[Long])

/** Decoded-waveform statistics row for [[Multimodal.audioFeaturize]]. */
case class AudioStats(
    id: Long, decode_ok: Boolean,
    n_samples: Option[Int], sample_rate: Option[Int],
    sum_s: Option[Long], sumsq_s: Option[Long], zero_cross: Option[Long])

/** Multimodal column plumbing (BASELINE.json north_star): media payloads are
  * opaque `binary` columns with a typed metadata struct; decode /
  * feature-extract / resize / frame-sample run as partition-local batch
  * transforms over a REAL codec — `javax.imageio` (JDK-only: PNG/JPEG
  * decode, pixel access, re-encode). No stubs: `featurize` decodes actual
  * image bytes and reports per-channel pixel statistics; `resize` decodes,
  * block-averages real pixels, and re-encodes; `frameStats` demuxes a frame
  * container and decodes every frame.
  *
  * What matters at 100 TB (and is pinned by spec + plan): payloads never
  * pass through a shuffle — decode/featurize runs `mapPartitions` at the
  * codec boundary (the one place imperative per-row work is the right tool),
  * and the binary column is pruned away the moment the narrow features are
  * extracted, so downstream wide ops move ids + stats, not pixels.
  *
  * Oracle strategy: [[ImageFixture]] generates pixels from documented
  * (id, x, y) integer arithmetic and encodes them as real PNGs. PNG is
  * lossless, so the decoded raster equals the generated one and DuckDB can
  * verify every decoded-pixel statistic by replaying the arithmetic —
  * while the Spark path exercises the genuine encode→decode round trip.
  * A broken decoder cannot pass the oracle.
  *
  * Video: two real container paths through ONE operator surface
  * (dispatch by magic in [[ImageCodec.unpackContainer]]): the trivial
  * length-prefixed GFRM container with lossless PNG frames (pixel sums
  * oracle-replayable), and genuine Motion-JPEG-in-AVI — a
  * standards-layout RIFF file [[ImageCodec.packAvi]] writes and
  * [[ImageCodec.unpackAvi]] walks, with real JDK JPEG codec frames
  * (decoder-invariant fields oracled, q142's lossy-codec contract).
  * The JDK ships no video codec; MJPEG/AVI needs only RIFF + JPEG, both
  * of which are here for real.
  */
object Multimodal {

  /** Metadata struct carried alongside every payload. */
  val mediaMetaType: StructType = StructType(Seq(
    StructField("kind", StringType),        // image | audio | video | text
    StructField("mime", StringType),
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("sample_rate", IntegerType),
    StructField("duration_ms", LongType)))

  /** Attach a payload+meta pair from a text column — the text-modality
    * stand-in (payload = UTF-8 bytes). */
  def attachPayload(df: DataFrame, textCol: String): DataFrame =
    df.withColumn("payload", encode(col(textCol), "UTF-8"))
      .withColumn("meta", struct(
        lit("text").as("kind"), lit("text/plain").as("mime"),
        lit(null).cast("int").as("width"), lit(null).cast("int").as("height"),
        lit(null).cast("int").as("sample_rate"),
        lit(null).cast("long").as("duration_ms")))

  /** Deterministic synthetic-image formulas — the cross-engine contract.
    * Every constant here is mirrored verbatim in the DuckDB oracle SQL
    * (SparkEntry.q34/q39/q102 oracles); change them together or not at all. */
  object ImageFixture {
    def width(id: Long): Int  = (8 + (id % 9)).toInt   // 8..16
    def height(id: Long): Int = (8 + (id % 7)).toInt   // 8..14
    def r(id: Long, f: Int, x: Int, y: Int): Int =
      ((id * 31 + f * 101L + x * 7 + y * 13) % 256).toInt
    def g(id: Long, f: Int, x: Int, y: Int): Int =
      ((id * 17 + f * 59L + x * 3 + y * 5) % 256).toInt
    def b(id: Long, f: Int, x: Int, y: Int): Int =
      ((id * 13 + f * 29L + x * 11 + y * 23) % 256).toInt

    def image(id: Long, frame: Int = 0): BufferedImage = {
      val (w, h) = (width(id), height(id))
      val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          img.setRGB(x, y,
            (r(id, frame, x, y) << 16) | (g(id, frame, x, y) << 8) | b(id, frame, x, y))
          x += 1
        }
        y += 1
      }
      img
    }

    def png(id: Long, frame: Int = 0): Array[Byte] =
      ImageCodec.encodePng(image(id, frame))

    /** The same synthetic raster as REAL JPEG bytes (JDK encoder). Pixel
      * values are lossy; dimensions and band count survive exactly —
      * which is why [[Multimodal.decodeMeta]] exposes only those. */
    def jpeg(id: Long, frame: Int = 0): Array[Byte] =
      ImageCodec.encodeJpeg(image(id, frame))

    def video(id: Long, nFrames: Int): Array[Byte] =
      ImageCodec.packFrames((0 until nFrames).map(f => png(id, f)))

    /** The same frame sequence as a REAL video file: Motion-JPEG in a
      * standards-layout AVI container (JDK JPEG encoder per frame,
      * [[ImageCodec.packAvi]] RIFF mux). 25 fps — 40 ms per frame, the
      * duration arithmetic the GFRM fixture already uses. */
    def avi(id: Long, nFrames: Int): Array[Byte] =
      ImageCodec.packAvi((0 until nFrames).map(f => jpeg(id, f)),
        width(id), height(id), fps = 25)
  }

  /** Real JDK codec: `javax.imageio` PNG/JPEG decode + PNG encode, exact
    * integer block-average resize on the decoded raster, and a trivial
    * length-prefixed multi-frame container (the JDK ships no video demuxer;
    * the frames inside are real PNGs). */
  object ImageCodec {
    // In-memory only: ImageIO's default disk cache would add a tmp-file per
    // decode on every executor thread.
    ImageIO.setUseCache(false)

    def encodePng(img: BufferedImage): Array[Byte] = {
      val baos = new ByteArrayOutputStream()
      ImageIO.write(img, "png", baos)
      baos.toByteArray
    }

    /** Real JDK JPEG encode (default quality). TYPE_INT_RGB rasters
      * write as baseline 3-channel JFIF. */
    def encodeJpeg(img: BufferedImage): Array[Byte] = {
      val baos = new ByteArrayOutputStream()
      ImageIO.write(img, "jpg", baos)
      baos.toByteArray
    }

    /** Decode any ImageIO-supported payload (PNG/JPEG/GIF/BMP); None when
      * the bytes are not a decodable image — callers fail soft (dead-letter
      * flag), never throw on corrupt payloads. */
    def decode(bytes: Array[Byte]): Option[BufferedImage] =
      try Option(ImageIO.read(new ByteArrayInputStream(bytes)))
      catch { case _: Exception => None }

    /** Per-channel integer pixel statistics over the decoded raster:
      * (width, height, sumR, sumG, sumB, sumSqR, sumSqG, sumSqB). Exact
      * longs — cross-engine comparable with no float drift. */
    def channelStats(img: BufferedImage): (Int, Int, Long, Long, Long, Long, Long, Long) = {
      val (w, h) = (img.getWidth, img.getHeight)
      var (sr, sg, sb, qr, qg, qb) = (0L, 0L, 0L, 0L, 0L, 0L)
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          val p = img.getRGB(x, y)
          val r = (p >> 16) & 0xff; val g = (p >> 8) & 0xff; val b = p & 0xff
          sr += r; sg += g; sb += b
          qr += r.toLong * r; qg += g.toLong * g; qb += b.toLong * b
          x += 1
        }
        y += 1
      }
      (w, h, sr, sg, sb, qr, qg, qb)
    }

    /** Exact k×k block-average downscale on real decoded pixels: output
      * pixel (ox,oy) = floor(mean of the k×k input block) per channel.
      * Integer arithmetic → bit-reproducible across engines (unlike
      * Graphics2D bilinear, whose rounding is implementation-defined). */
    def blockResize(img: BufferedImage, k: Int): BufferedImage = {
      require(k >= 1, s"resize factor must be >= 1, got $k")
      val ow = img.getWidth / k; val oh = img.getHeight / k
      require(ow > 0 && oh > 0,
        s"resize factor $k collapses ${img.getWidth}x${img.getHeight} to zero")
      val out = new BufferedImage(ow, oh, BufferedImage.TYPE_INT_RGB)
      var oy = 0
      while (oy < oh) {
        var ox = 0
        while (ox < ow) {
          var (sr, sg, sb) = (0, 0, 0)
          var dy = 0
          while (dy < k) {
            var dx = 0
            while (dx < k) {
              val p = img.getRGB(ox * k + dx, oy * k + dy)
              sr += (p >> 16) & 0xff; sg += (p >> 8) & 0xff; sb += p & 0xff
              dx += 1
            }
            dy += 1
          }
          val n = k * k
          out.setRGB(ox, oy, ((sr / n) << 16) | ((sg / n) << 8) | (sb / n))
          ox += 1
        }
        oy += 1
      }
      out
    }

    // --- frame container: "GFRM" + int32 count + (int32 len + bytes)* ---
    private val Magic = Array[Byte]('G', 'F', 'R', 'M')

    def packFrames(frames: Seq[Array[Byte]]): Array[Byte] = {
      val baos = new ByteArrayOutputStream()
      val out = new java.io.DataOutputStream(baos)
      out.write(Magic); out.writeInt(frames.size)
      frames.foreach { f => out.writeInt(f.length); out.write(f) }
      baos.toByteArray
    }

    def unpackFrames(payload: Array[Byte]): Seq[Array[Byte]] = {
      if (payload.length < 8 || payload(0) != 'G' || payload(1) != 'F' ||
          payload(2) != 'R' || payload(3) != 'M') return Seq.empty
      val in = new java.io.DataInputStream(new ByteArrayInputStream(payload, 4, payload.length - 4))
      try {
        // Fail-soft on corrupt containers: a valid-magic payload with a
        // garbage count or frame length must not throw (NegativeArraySize)
        // or allocate beyond the payload — every length is bounded by the
        // bytes actually remaining.
        val n = in.readInt()
        if (n < 0 || n > payload.length) return Seq.empty
        var remaining = payload.length - 8
        val frames = Seq.newBuilder[Array[Byte]]
        var i = 0
        while (i < n) {
          val len = in.readInt()
          remaining -= 4
          if (len < 0 || len > remaining) return Seq.empty
          val buf = new Array[Byte](len)
          in.readFully(buf)
          remaining -= len
          frames += buf
          i += 1
        }
        frames.result()
      } catch { case _: java.io.IOException | _: RuntimeException => Seq.empty }
    }

    // --- real video container: MJPEG-in-AVI (RIFF) mux/demux -------------
    // The JDK ships no video CONTAINER support, but its JPEG codec plus
    // this RIFF layer are everything Motion-JPEG needs — closing the gap
    // GFRM papered over with a synthetic layout. Little-endian, chunks
    // word-aligned, standards AVI structure (hdrl: avih + one vids/MJPG
    // stream; movi: one '00dc' chunk per JPEG frame; idx1), so any
    // external AVI demuxer reads what packAvi writes.

    /** Minimal standards-layout AVI muxer over already-encoded JPEG
      * frames (all frames one geometry — the MJPG contract). */
    def packAvi(frames: Seq[Array[Byte]], width: Int, height: Int,
                fps: Int = 25): Array[Byte] = {
      require(fps >= 1, s"fps must be >= 1: $fps")
      val bo = new ByteArrayOutputStream()
      def w32(v: Int): Unit = {
        bo.write(v & 0xFF); bo.write((v >>> 8) & 0xFF)
        bo.write((v >>> 16) & 0xFF); bo.write((v >>> 24) & 0xFF)
      }
      def w16(v: Int): Unit = { bo.write(v & 0xFF); bo.write((v >>> 8) & 0xFF) }
      def cc(s: String): Unit = bo.write(s.getBytes("US-ASCII"))
      val maxFrame = if (frames.isEmpty) 0 else frames.map(_.length).max
      def pad(n: Int) = n & 1
      val moviBody = frames.map(f => 8 + f.length + pad(f.length)).sum
      val moviSize = 4 + moviBody          // 'movi' + chunks
      val idx1Size = frames.size * 16
      val strlSize = 4 + (8 + 56) + (8 + 40) // 'strl' + strh + strf
      val hdrlSize = 4 + (8 + 56) + (8 + strlSize)
      val riffSize = 4 + (8 + hdrlSize) + (8 + moviSize) + (8 + idx1Size)
      cc("RIFF"); w32(riffSize); cc("AVI ")
      cc("LIST"); w32(hdrlSize); cc("hdrl")
      cc("avih"); w32(56)
      w32(1000000 / fps)                   // dwMicroSecPerFrame
      w32(maxFrame * fps); w32(0)
      w32(0x10)                            // AVIF_HASINDEX
      w32(frames.size); w32(0); w32(1)     // totalFrames, initial, streams
      w32(maxFrame); w32(width); w32(height)
      w32(0); w32(0); w32(0); w32(0)       // dwReserved[4]
      cc("LIST"); w32(strlSize); cc("strl")
      cc("strh"); w32(56)
      cc("vids"); cc("MJPG")
      w32(0); w16(0); w16(0); w32(0)       // flags, prio, lang, initFrames
      w32(1); w32(fps)                     // scale, rate
      w32(0); w32(frames.size)             // start, length (frames)
      w32(maxFrame); w32(-1); w32(0)       // sugBufSize, quality, sampleSize
      w16(0); w16(0); w16(width); w16(height) // rcFrame
      cc("strf"); w32(40)                  // BITMAPINFOHEADER
      w32(40); w32(width); w32(height)
      w16(1); w16(24); cc("MJPG")          // planes, bitCount, compression
      w32(width * height * 3)              // biSizeImage
      w32(0); w32(0); w32(0); w32(0)
      cc("LIST"); w32(moviSize); cc("movi")
      val offsets = frames.map { f =>
        val off = bo.size()                // offset of this chunk's fourcc
        cc("00dc"); w32(f.length); bo.write(f)
        if (pad(f.length) == 1) bo.write(0)
        off
      }
      cc("idx1"); w32(idx1Size)
      val moviStart = 12 + 8 + hdrlSize + 8 // offset of 'movi' fourcc
      frames.zip(offsets).foreach { case (f, off) =>
        cc("00dc"); w32(0x10)              // AVIIF_KEYFRAME
        w32(off - moviStart - 4)           // offset from after 'movi' tag...
        w32(f.length)
      }
      bo.toByteArray
    }

    /** AVI demuxer: walk the RIFF tree, collect '00dc'/'00db' frame
      * chunks from 'movi' (and nested 'rec ') lists. Fail-soft on any
      * malformed layout — truncated chunks, lying sizes and non-AVI RIFF
      * files yield the frames parsed so far / empty, never a throw. */
    def unpackAvi(payload: Array[Byte]): Seq[Array[Byte]] = {
      def r32(off: Int): Long =
        ((payload(off) & 0xFFL)) | ((payload(off + 1) & 0xFFL) << 8) |
          ((payload(off + 2) & 0xFFL) << 16) | ((payload(off + 3) & 0xFFL) << 24)
      def cc(off: Int): String = new String(payload, off, 4, "US-ASCII")
      if (payload.length < 12 || cc(0) != "RIFF" || cc(8) != "AVI ")
        return Seq.empty
      val frames = Seq.newBuilder[Array[Byte]]
      val fileEnd = math.min(payload.length.toLong, 8L + r32(4))
      def walk(from: Long, to: Long, inMovi: Boolean): Unit = {
        var off = from
        while (off + 8 <= to) {
          val id = cc(off.toInt)
          val sz = r32(off.toInt + 4)
          val dataStart = off + 8
          if (id == "LIST" && sz >= 4 && dataStart + 4 <= to) {
            // a truncated LIST still yields the sub-chunks that fit:
            // clamp the descent to the bytes actually present
            val lt = cc(dataStart.toInt)
            if (lt == "movi" || lt == "rec ")
              walk(dataStart + 4, math.min(dataStart + sz, to),
                inMovi = true)
            if (dataStart + sz > to) return // nothing after a short list
          } else if (dataStart + sz > to) {
            return // truncated data chunk: keep what we have
          } else if (inMovi && (id == "00dc" || id == "00db") && sz > 0) {
            frames += java.util.Arrays.copyOfRange(
              payload, dataStart.toInt, (dataStart + sz).toInt)
          }
          off = dataStart + sz + (sz & 1) // chunks are word-aligned
        }
      }
      try { walk(12, fileEnd, inMovi = false); frames.result() }
      catch { case _: RuntimeException => Seq.empty }
    }

    /** Container-agnostic demux — GFRM (length-prefixed) or AVI (RIFF)
      * by magic; anything else is empty (fail-soft). The frame operators
      * ([[Multimodal.frameSample]]/[[Multimodal.frameStats]]) go through
      * this, so both containers flow through ONE operator surface. */
    def unpackContainer(payload: Array[Byte]): Seq[Array[Byte]] =
      if (payload == null || payload.length < 4) Seq.empty
      else if (payload(0) == 'G' && payload(1) == 'F' &&
        payload(2) == 'R' && payload(3) == 'M') unpackFrames(payload)
      else if (payload(0) == 'R' && payload(1) == 'I' &&
        payload(2) == 'F' && payload(3) == 'F') unpackAvi(payload)
      else Seq.empty
  }

  /** Deterministic synthetic-audio formulas — the audio cross-engine
    * contract (mirrored in the q107/q108 oracle SQL): PCM16 mono samples
    * generated from (id, i) integer arithmetic. */
  object AudioFixture {
    val sampleRate = 8000
    def nSamples(id: Long): Int = (256 + (id % 128)).toInt   // 256..383
    /** Sample i in [-1001, 1001] — well inside 16-bit range so decode
      * round-trips exactly and decimation stays overflow-free. */
    def sample(id: Long, i: Int): Int =
      (((id * 31 + i.toLong * 17) % 2003) - 1001).toInt
    def samples(id: Long): Array[Int] =
      Array.tabulate(nSamples(id))(i => sample(id, i))
    def wav(id: Long): Array[Byte] = AudioCodec.encodeWav(samples(id), sampleRate)
  }

  /** Real JDK audio codec: `javax.sound.sampled` WAV (RIFF/PCM16LE mono)
    * decode + encode. Like the image tier, no stubs — `audioFeaturize`
    * parses actual WAV bytes through AudioSystem and reduces the decoded
    * samples to exact integer statistics. */
  object AudioCodec {
    /** PCM16LE mono WAV via the JDK's audio writer. */
    def encodeWav(samples: Array[Int], sampleRate: Int): Array[Byte] = {
      val bytes = new Array[Byte](samples.length * 2)
      var i = 0
      while (i < samples.length) {
        val s = samples(i)
        require(s >= Short.MinValue && s <= Short.MaxValue, s"sample out of PCM16 range: $s")
        bytes(2 * i) = (s & 0xff).toByte
        bytes(2 * i + 1) = ((s >> 8) & 0xff).toByte
        i += 1
      }
      val fmt = new javax.sound.sampled.AudioFormat(
        javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED,
        sampleRate.toFloat, 16, 1, 2, sampleRate.toFloat, false)
      val ais = new javax.sound.sampled.AudioInputStream(
        new ByteArrayInputStream(bytes), fmt, samples.length.toLong)
      val baos = new ByteArrayOutputStream()
      javax.sound.sampled.AudioSystem.write(ais,
        javax.sound.sampled.AudioFileFormat.Type.WAVE, baos)
      baos.toByteArray
    }

    /** Decode WAV bytes through the REAL AudioSystem parser: None when the
      * bytes are not a PCM16 mono WAV (fail-soft, like image decode). */
    def decode(bytes: Array[Byte]): Option[(Array[Int], Int)] =
      try {
        val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
          new ByteArrayInputStream(bytes))
        val fmt = ais.getFormat
        if (fmt.getSampleSizeInBits != 16 || fmt.getChannels != 1 ||
            fmt.isBigEndian) None
        else {
          val raw = ais.readAllBytes()
          val out = new Array[Int](raw.length / 2)
          var i = 0
          while (i < out.length) {
            out(i) = ((raw(2 * i + 1).toInt << 8) | (raw(2 * i) & 0xff)).toShort.toInt
            i += 1
          }
          Some((out, fmt.getSampleRate.toInt))
        }
      } catch { case _: Exception => None }

    /** Exact waveform statistics: (n, rate, sum, sumSq, zeroCrossings) —
      * all integer, cross-engine reproducible. */
    def waveformStats(samples: Array[Int], rate: Int): (Int, Int, Long, Long, Long) = {
      var (s, q, z) = (0L, 0L, 0L)
      var i = 0
      while (i < samples.length) {
        val v = samples(i)
        s += v; q += v.toLong * v
        if (i > 0 && ((samples(i - 1) < 0 && v >= 0) || (samples(i - 1) >= 0 && v < 0))) z += 1
        i += 1
      }
      (samples.length, rate, s, q, z)
    }

    /** Exact k-decimation on real decoded samples (every k-th sample,
      * starting at 0) — deterministic resample both engines can replay;
      * the declared rate scales with the kept samples. */
    def decimate(samples: Array[Int], k: Int): Array[Int] = {
      require(k >= 1, s"decimation factor must be >= 1: $k")
      Array.tabulate((samples.length + k - 1) / k)(i => samples(i * k))
    }
  }

  /** Attach a real WAV payload per row (the audio-modality fixture). */
  def attachAudioPayload(spark: SparkSession, df: DataFrame, idCol: String): DataFrame = {
    import spark.implicits._
    val ids: Dataset[Long] = df.select(col(idCol).cast("long")).as[Long]
    ids.mapPartitions { it =>
      it.map { id => (id, AudioFixture.wav(id)) }
    }.toDF(idCol, "payload")
      .withColumn("meta", struct(
        lit("audio").as("kind"), lit("audio/wav").as("mime"),
        lit(null).cast("int").as("width"), lit(null).cast("int").as("height"),
        lit(AudioFixture.sampleRate).as("sample_rate"),
        lit(null).cast("long").as("duration_ms")))
  }

  /** Partition-local audio featurization over REAL decode (AudioSystem):
    * exact integer waveform stats, fail-soft on undecodable payloads, the
    * binary column dies here — same contract as the image featurize. */
  def audioFeaturize(spark: SparkSession, df: DataFrame, idCol: String,
                     payloadCol: String = "payload"): DataFrame = {
    import spark.implicits._
    val pairs: Dataset[(Long, Array[Byte])] =
      df.select(col(idCol).cast("long"), col(payloadCol)).as[(Long, Array[Byte])]
    pairs.mapPartitions { it =>
      it.map { case (id, bytes) =>
        AudioCodec.decode(bytes) match {
          case Some((samples, rate)) =>
            val (n, r, s, q, z) = AudioCodec.waveformStats(samples, rate)
            AudioStats(id, decode_ok = true, Some(n), Some(r),
              Some(s), Some(q), Some(z))
          case None =>
            AudioStats(id, decode_ok = false, None, None, None, None, None)
        }
      }
    }.toDF().withColumnRenamed("id", idCol)
  }

  /** Resample (k-decimate): decode -> every k-th REAL sample -> WAV
    * re-encode at the scaled rate. Payload replaced; fail-soft. */
  def audioResample(spark: SparkSession, df: DataFrame, idCol: String,
                    factor: Int, payloadCol: String = "payload"): DataFrame = {
    import spark.implicits._
    val pairs: Dataset[(Long, Array[Byte])] =
      df.select(col(idCol).cast("long"), col(payloadCol)).as[(Long, Array[Byte])]
    pairs.mapPartitions { it =>
      it.map { case (id, bytes) =>
        AudioCodec.decode(bytes) match {
          case Some((samples, rate)) =>
            (id, AudioCodec.encodeWav(AudioCodec.decimate(samples, factor),
              math.max(rate / factor, 1)))
          case None => (id, bytes)
        }
      }
    }.toDF(idCol, payloadCol)
  }

  /** Attach a real PNG payload per row (the image-modality fixture):
    * partition-local generate+encode, meta carries the true dimensions. */
  def attachImagePayload(spark: SparkSession, df: DataFrame, idCol: String): DataFrame = {
    import spark.implicits._
    val ids: Dataset[Long] = df.select(col(idCol).cast("long")).as[Long]
    ids.mapPartitions { it =>
      it.map { id => (id, ImageFixture.png(id), ImageFixture.width(id), ImageFixture.height(id)) }
    }.toDF(idCol, "payload", "gen_width", "gen_height")
      .withColumn("meta", struct(
        lit("image").as("kind"), lit("image/png").as("mime"),
        col("gen_width").as("width"), col("gen_height").as("height"),
        lit(null).cast("int").as("sample_rate"),
        lit(null).cast("long").as("duration_ms")))
      .drop("gen_width", "gen_height")
  }

  /** Attach a REAL JPEG payload per row (the lossy-codec fixture): the
    * same deterministic raster as [[attachImagePayload]], through the JDK
    * JPEG encoder. */
  def attachJpegPayload(spark: SparkSession, df: DataFrame, idCol: String): DataFrame = {
    import spark.implicits._
    val ids: Dataset[Long] = df.select(col(idCol).cast("long")).as[Long]
    ids.mapPartitions { it =>
      it.map { id => (id, ImageFixture.jpeg(id)) }
    }.toDF(idCol, "payload")
      .withColumn("meta", struct(
        lit("image").as("kind"), lit("image/jpeg").as("mime"),
        lit(null).cast("int").as("width"), lit(null).cast("int").as("height"),
        lit(null).cast("int").as("sample_rate"),
        lit(null).cast("long").as("duration_ms")))
  }

  /** Partition-local REAL decode reduced to the DECODER-INVARIANT fields
    * only (decode_ok, width, height, band count) — the contract a lossy
    * codec supports cross-engine: JPEG pixel values vary by decoder
    * version, dimensions and channel count cannot. Fail-soft on corrupt
    * payloads (decode_ok = false, null fields) like [[featurize]]. */
  def decodeMeta(spark: SparkSession, df: DataFrame, idCol: String,
                 payloadCol: String = "payload"): DataFrame = {
    import spark.implicits._
    val pairs: Dataset[(Long, Array[Byte])] =
      df.select(col(idCol).cast("long"), col(payloadCol)).as[(Long, Array[Byte])]
    pairs.mapPartitions { it =>
      it.map { case (id, bytes) =>
        ImageCodec.decode(bytes) match {
          case Some(img) => JpegMeta(id, decode_ok = true,
            Some(img.getWidth), Some(img.getHeight),
            Some(img.getRaster.getNumBands))
          case None => JpegMeta(id, decode_ok = false, None, None, None)
        }
      }
    }.toDF().withColumnRenamed("id", idCol)
  }

  /** Attach a multi-frame payload per row (the video-modality fixture):
    * n real PNG frames in the GFRM container. */
  def attachVideoPayload(spark: SparkSession, df: DataFrame, idCol: String,
                         nFrames: Int): DataFrame = {
    import spark.implicits._
    val ids: Dataset[Long] = df.select(col(idCol).cast("long")).as[Long]
    ids.mapPartitions { it =>
      it.map { id => (id, ImageFixture.video(id, nFrames)) }
    }.toDF(idCol, "payload")
      .withColumn("meta", struct(
        lit("video").as("kind"), lit("video/x-graft-frames").as("mime"),
        lit(null).cast("int").as("width"), lit(null).cast("int").as("height"),
        lit(null).cast("int").as("sample_rate"),
        lit(nFrames.toLong * 40L).as("duration_ms")))
  }

  /** Attach a REAL video file per row: Motion-JPEG in a standards-layout
    * AVI (RIFF) container, 2 + id % 3 frames of real JDK-encoded JPEG.
    * Demuxes through the same [[frameSample]]/[[frameStats]] operators
    * as GFRM (container detection by magic). */
  def attachAviPayload(spark: SparkSession, df: DataFrame,
                       idCol: String): DataFrame = {
    import spark.implicits._
    val ids: Dataset[Long] = df.select(col(idCol).cast("long")).as[Long]
    ids.mapPartitions { it =>
      it.map { id => (id, ImageFixture.avi(id, (2 + id % 3).toInt)) }
    }.toDF(idCol, "payload")
      .withColumn("meta", struct(
        lit("video").as("kind"), lit("video/avi").as("mime"),
        lit(null).cast("int").as("width"), lit(null).cast("int").as("height"),
        lit(null).cast("int").as("sample_rate"),
        ((lit(2L) + col(idCol) % 3L) * 40L).cast("long").as("duration_ms")))
  }

  private def statsOf(id: Long, bytes: Array[Byte]): ImgStats =
    ImageCodec.decode(bytes) match {
      case Some(img) =>
        val (w, h, sr, sg, sb, qr, qg, qb) = ImageCodec.channelStats(img)
        ImgStats(id, decode_ok = true, bytes.length, Some(w), Some(h),
          Some(sr), Some(sg), Some(sb), Some(qr), Some(qg), Some(qb))
      case None =>
        ImgStats(id, decode_ok = false, bytes.length,
          None, None, None, None, None, None, None, None)
    }

  /** Partition-local featurization over REAL decode: each payload is decoded
    * with ImageIO and reduced to per-channel pixel statistics. Undecodable
    * payloads fail soft (`decode_ok = false`, null stats) — the dead-letter
    * pattern, so one corrupt object cannot kill a 100 TB scan. Output is
    * narrow (id + stats); the binary column dies here. */
  def featurize(spark: SparkSession, df: DataFrame, idCol: String,
                payloadCol: String = "payload"): DataFrame = {
    import spark.implicits._
    val pairs: Dataset[(Long, Array[Byte])] =
      df.select(col(idCol).cast("long"), col(payloadCol)).as[(Long, Array[Byte])]
    pairs.mapPartitions { it =>
      it.map { case (id, bytes) => statsOf(id, bytes) }
    }.toDF().withColumnRenamed("id", idCol)
  }

  /** Frame sampling: demux the GFRM container partition-locally into
    * (id, frame_idx, frame) rows — each frame a standalone real PNG —
    * WITHOUT the parent payload ever crossing a shuffle. */
  def frameSample(spark: SparkSession, df: DataFrame, idCol: String,
                  payloadCol: String = "payload"): DataFrame = {
    import spark.implicits._
    val pairs: Dataset[(Long, Array[Byte])] =
      df.select(col(idCol).cast("long"), col(payloadCol)).as[(Long, Array[Byte])]
    pairs.mapPartitions { it =>
      it.flatMap { case (id, bytes) =>
        ImageCodec.unpackContainer(bytes).zipWithIndex.map {
          case (frame, idx) => (id, idx, frame)
        }
      }
    }.toDF(idCol, "frame_idx", "frame")
  }

  /** Demux + per-frame real decode + stats in one partition-local pass —
    * the fused shape a production video pipeline uses (frames never
    * materialize outside the partition that owns the container). */
  def frameStats(spark: SparkSession, df: DataFrame, idCol: String,
                 payloadCol: String = "payload"): DataFrame = {
    import spark.implicits._
    val pairs: Dataset[(Long, Array[Byte])] =
      df.select(col(idCol).cast("long"), col(payloadCol)).as[(Long, Array[Byte])]
    pairs.mapPartitions { it =>
      it.flatMap { case (id, bytes) =>
        ImageCodec.unpackContainer(bytes).zipWithIndex.map { case (frame, idx) =>
          ImageCodec.decode(frame) match {
            case Some(img) =>
              val (w, h, sr, sg, sb, _, _, _) = ImageCodec.channelStats(img)
              FrameStats(id, idx, decode_ok = true, Some(w), Some(h),
                Some(sr), Some(sg), Some(sb))
            case None =>
              FrameStats(id, idx, decode_ok = false, None, None, None, None, None)
          }
        }
      }
    }.toDF().withColumnRenamed("id", idCol)
  }

  /** Resize: partition-local decode → exact k×k block-average on the real
    * raster → PNG re-encode. The payload column is REPLACED (old bytes are
    * never carried alongside) so the narrowest schema flows downstream.
    * Undecodable payloads pass through untouched (fail-soft). */
  def resize(spark: SparkSession, df: DataFrame, idCol: String, factor: Int,
             payloadCol: String = "payload"): DataFrame = {
    import spark.implicits._
    val pairs: Dataset[(Long, Array[Byte])] =
      df.select(col(idCol).cast("long"), col(payloadCol)).as[(Long, Array[Byte])]
    pairs.mapPartitions { it =>
      it.map { case (id, bytes) =>
        ImageCodec.decode(bytes) match {
          case Some(img) => (id, ImageCodec.encodePng(ImageCodec.blockResize(img, factor)))
          case None      => (id, bytes)
        }
      }
    }.toDF(idCol, payloadCol)
  }
}
