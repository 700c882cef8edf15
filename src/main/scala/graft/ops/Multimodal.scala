package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: image/audio/video payloads are opaque
  * `binary` columns with a typed metadata struct; decode / feature
  * extraction runs per-partition in batches.
  *
  * The IMAGE path runs a REAL codec: PNG encode/decode via
  * `javax.imageio` (public JDK API, headless-safe), with pixel-stat
  * features oracle-checked in q75. The text stand-in keeps the
  * deterministic `decodeStub` so its SQL oracle stays expressible.
  * Audio/video remain chunk-level plumbing ([[sampleFrames]]); a real
  * media codec would drop into the same `mapPartitions` boundary, which
  * amortizes codec/model init per partition (the Spark equivalent of
  * `mapInPandas` batch semantics).
  */
object Multimodal {

  // ImageIO's default stream cache backs every encode/decode call with a
  // TEMP FILE (FileCacheImageInput/OutputStream): at one PNG per row that
  // is a filesystem create+write+delete round-trip per image — switch the
  // whole JVM to memory-backed streams. Pure I/O plumbing; the codec and
  // the decoded pixels are identical. NOTE: setUseCache is JVM-GLOBAL
  // state set on class load — any cohabiting ImageIO user inherits
  // memory-backed streams (a behavior change only for callers decoding
  // images too large for heap), and on a multi-executor deployment it
  // applies exactly on the JVMs that run these kernels (each executor
  // loads this class before its first codec task). Deliberate: the
  // alternative — a per-call stream-cache toggle — does not exist in the
  // ImageIO API.
  javax.imageio.ImageIO.setUseCache(false)

  /** Shared conditional fan-out ([[graft.ops.Spread]]): row placement
    * doesn't affect any per-row codec result, and every caller re-sorts
    * its output.
    */
  private def spread(df: DataFrame): DataFrame = Spread(df)

  /** Band-0 pixels of a decoded image, row-major. Fast path reads the
    * raster's byte bank directly when the layout is single-byte-per-pixel
    * interleaved (what both the JDK PNG reader and TYPE_BYTE_GRAY
    * produce) — one array walk instead of w·h virtual getSample calls.
    * Any other geometry falls back to the public bulk sampler. The VALUES
    * are identical either way, so every oracle contract is untouched.
    */
  private[ops] def band0(img: java.awt.image.BufferedImage): Array[Int] = {
    val r = img.getRaster
    val (w, h) = (img.getWidth, img.getHeight)
    val out = new Array[Int](w * h)
    r.getSampleModel match {
      case sm: java.awt.image.ComponentSampleModel
          if sm.getPixelStride == 1 && sm.getBandOffsets()(0) == 0 &&
             sm.getNumBands == 1 &&
             r.getSampleModelTranslateX == 0 && r.getSampleModelTranslateY == 0 &&
             r.getDataBuffer.isInstanceOf[java.awt.image.DataBufferByte] &&
             r.getDataBuffer.getNumBanks == 1 && r.getDataBuffer.getOffset == 0 =>
        val data = r.getDataBuffer.asInstanceOf[java.awt.image.DataBufferByte].getData
        val stride = sm.getScanlineStride
        var y = 0
        var i = 0
        while (y < h) {
          val row = y * stride
          var x = 0
          while (x < w) { out(i) = data(row + x) & 0xff; i += 1; x += 1 }
          y += 1
        }
      case _ => r.getSamples(0, 0, w, h, 0, out)
    }
    out
  }

  /** Fresh TYPE_BYTE_GRAY image with pixels filled row-major by `pixel`
    * (values taken mod 256 as unsigned bytes). Fast path writes the byte
    * bank directly (TYPE_BYTE_GRAY is single-bank interleaved at stride
    * w by construction); the guard falls back to setSample should a JDK
    * ever lay it out differently. Identical pixel content either way.
    */
  private[ops] def grayImage(w: Int, h: Int)(pixel: Int => Int): java.awt.image.BufferedImage = {
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
    val r = img.getRaster
    r.getDataBuffer match {
      case db: java.awt.image.DataBufferByte
          if db.getNumBanks == 1 && db.getOffset == 0 &&
             r.getSampleModel.isInstanceOf[java.awt.image.ComponentSampleModel] &&
             r.getSampleModel.asInstanceOf[java.awt.image.ComponentSampleModel]
               .getScanlineStride == w &&
             r.getSampleModel.asInstanceOf[java.awt.image.ComponentSampleModel]
               .getPixelStride == 1 =>
        val data = db.getData
        var i = 0
        while (i < w * h) { data(i) = pixel(i).toByte; i += 1 }
      case _ =>
        var i = 0
        while (i < w * h) { r.setSample(i % w, i / w, 0, pixel(i) & 0xff); i += 1 }
    }
    img
  }

  /** A binary asset row: payload + minimal typed metadata. */
  case class Asset(asset_id: Long, modality: String, n_bytes: Long, payload: Array[Byte])

  /** Extracted features: fixed-width vector + passthrough metadata. */
  case class AssetFeatures(asset_id: Long, modality: String, n_bytes: Long,
                           feature: Array[Double])

  val FeatureDim = 8

  /** Wrap a text corpus as binary assets (the test stand-in for real
    * image/audio payloads): payload = UTF-8 bytes, modality tagged.
    */
  def toAssets(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(
      col(idCol).cast("long").as("asset_id"),
      lit("text").as("modality"),
      octet_length(encode(col(textCol), "UTF-8")).cast("long").as("n_bytes"),
      encode(col(textCol), "UTF-8").as("payload"))

  /** STUB decoder — deterministic fake in place of a real codec.
    * A real implementation would decode the payload (e.g. JPEG → pixels)
    * and run a feature extractor; init-once-per-partition happens in
    * [[extractFeatures]]'s mapPartitions.
    */
  private[ops] def decodeStub(payload: Array[Byte]): Array[Double] = {
    // integer accumulation first, single division at the end: the result
    // is independent of accumulation order (exact int sums), so the
    // correctness oracle can reproduce it with a SQL GROUP BY
    val acc = new Array[Long](FeatureDim)
    var i = 0
    while (i < payload.length) {
      acc(i % FeatureDim) += (payload(i) & 0xffL)
      i += 1
    }
    acc.map(_.toDouble / 255.0)
  }

  /** Batch feature extraction over the binary column, dispatched on the
    * modality tag: "image" payloads go through the REAL codec
    * ([[decodeImage]] → width/height/pixel-stats, padded to
    * [[FeatureDim]]); other modalities keep the deterministic byte
    * summary. Partition-level iteration keeps per-partition init (codec
    * instances, model weights) amortized, and the output stays a
    * distributed Dataset.
    */
  def extractFeatures(assets: DataFrame)(implicit spark: SparkSession): Dataset[AssetFeatures] = {
    import spark.implicits._
    assets.as[Asset].mapPartitions { it =>
      // codec/model init would happen here, once per partition
      it.map { a =>
        val feature = a.modality match {
          case "image" => decodeImage(a.payload) match {
            case Some(f) => Array[Double](f.width, f.height, f.pxMean, f.pxMin, f.pxMax)
              .padTo(FeatureDim, 0.0)
            case None => Array.fill(FeatureDim)(-1.0) // undecodable marker
          }
          case _ => decodeStub(a.payload)
        }
        AssetFeatures(a.asset_id, a.modality, a.n_bytes, feature)
      }
    }
  }

  // ---- real image codec (javax.imageio — public JDK, headless-safe) ----

  /** Pixel-level facts a real decode yields (band 0 = gray/red). */
  case class DecodedImage(width: Int, height: Int, pxMean: Double,
                          pxMin: Int, pxMax: Int)

  /** REAL image decode: bytes → BufferedImage via `javax.imageio`, then
    * exact pixel statistics over band 0 (integer accumulation, one
    * division — reproducible bit-for-bit by an integer SQL oracle).
    * Returns None for undecodable payloads (ImageIO yields null for
    * unrecognized formats) — callers route those to quarantine rather
    * than killing a 100 TB decode pass over one corrupt file.
    */
  def decodeImage(payload: Array[Byte]): Option[DecodedImage] = {
    val img =
      try Option(javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(payload)))
      catch { case _: java.io.IOException => None }
    img.map { bi =>
      val (w, h) = (bi.getWidth, bi.getHeight)
      val px = band0(bi)
      var (sum, mn, mx) = (0L, Int.MaxValue, Int.MinValue)
      var i = 0
      while (i < px.length) {
        val v = px(i)
        sum += v
        if (v < mn) mn = v
        if (v > mx) mx = v
        i += 1
      }
      DecodedImage(w, h, sum.toDouble / (w.toLong * h), mn, mx)
    }
  }

  /** Deterministic synthetic grayscale PNGs, one per input row:
    * pixel(i) = (id*31 + i) % 256 over a w×h raster, ENCODED through the
    * real PNG writer. PNG is lossless, so decoding recovers exactly
    * these values — which a SQL oracle can also compute analytically —
    * and the encode/decode round-trip exercises the production codec
    * path end-to-end. The per-row encoder runs inside mapPartitions like
    * any other codec.
    */
  def synthPngAssets(df: DataFrame, idCol: String, width: Int, height: Int)
                    (implicit spark: SparkSession): DataFrame = {
    import spark.implicits._
    require(width > 0 && height > 0)
    spread(df.select(col(idCol).cast("long").as("id"))).as[Long].mapPartitions { it =>
      it.map { id =>
        val img = grayImage(width, height)(i => ((id * 31 + i) % 256).toInt)
        val out = new java.io.ByteArrayOutputStream()
        javax.imageio.ImageIO.write(img, "png", out)
        (id, "image", out.size().toLong, out.toByteArray)
      }
    }.toDF("asset_id", "modality", "n_bytes", "payload")
  }

  /** Image features row for the pixel-stat oracle query. */
  case class ImageFeatures(asset_id: Long, width: Int, height: Int,
                           px_mean: Double, px_min: Int, px_max: Int)

  /** Decode every image asset and emit oracle-comparable pixel stats.
    * Undecodable payloads FAIL here — this entry point is the
    * correctness gate; the quarantine-style path is
    * [[extractFeatures]]'s -1 marker.
    */
  def imageFeatures(assets: DataFrame)(implicit spark: SparkSession): Dataset[ImageFeatures] = {
    import spark.implicits._
    assets.as[Asset].mapPartitions { it =>
      it.map { a =>
        val d = decodeImage(a.payload).getOrElse(throw new IllegalArgumentException(
          s"asset ${a.asset_id}: payload is not a decodable image"))
        // no rounding: the mean is an exact integer sum over w*h pixels,
        // and for the oracle query w*h is a power of two, so the division
        // is exact in binary on both engines
        ImageFeatures(a.asset_id, d.width, d.height, d.pxMean, d.pxMin, d.pxMax)
      }
    }
  }

  /** Decoded PCM audio summary — exact integer stats plus one rounded
    * sqrt, so a SQL oracle reproduces every field. */
  case class DecodedAudio(sampleRate: Int, nSamples: Int, rms: Double,
                          peak: Int, zeroCrossings: Long)

  /** REAL audio decode: bytes → PCM samples by walking the RIFF/WAVE
    * container (chunk-structured parse — `fmt ` validated as 16-bit
    * mono PCM, unknown chunks skipped, `data` located wherever it
    * sits), then exact sample statistics: peak = max |s|, zero
    * crossings over sign changes (s ≥ 0 is "positive"), and RMS as the
    * only float — an exact long sum of squares, one double division,
    * one correctly-rounded sqrt, rounded to 4 dp. Pure JVM — no codec
    * library — and None for malformed payloads so a corpus-scale pass
    * quarantines instead of dying.
    */
  def decodeWav(payload: Array[Byte]): Option[DecodedAudio] = {
    val b = java.nio.ByteBuffer.wrap(payload).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    def tag(): String = {
      val a = new Array[Byte](4); b.get(a); new String(a, "US-ASCII")
    }
    try {
      if (tag() != "RIFF") return None
      b.getInt // RIFF payload size; trust the buffer bounds instead
      if (tag() != "WAVE") return None
      var sampleRate = -1
      var ok = false
      while (!ok && b.remaining >= 8) {
        val id = tag(); val len = b.getInt
        if (id == "fmt ") {
          if (len < 16) return None
          val fmt = b.getShort; val ch = b.getShort
          sampleRate = b.getInt; b.getInt; b.getShort
          val bits = b.getShort
          if (fmt != 1 || ch != 1 || bits != 16) return None
          b.position(b.position() + (len - 16)) // ignore fmt extensions
        } else if (id == "data") {
          if (sampleRate <= 0 || len > b.remaining || len % 2 != 0) return None
          val n = len / 2
          if (n == 0) return None
          var (sumSq, peak, zc) = (0L, 0, 0L)
          var prevNonNeg = true
          var i = 0
          while (i < n) {
            val s = b.getShort.toInt
            sumSq += s.toLong * s
            val a = math.abs(s)
            if (a > peak) peak = a
            val nonNeg = s >= 0
            if (i > 0 && nonNeg != prevNonNeg) zc += 1
            prevNonNeg = nonNeg
            i += 1
          }
          val rms = math.rint(math.sqrt(sumSq.toDouble / n) * 1e4) / 1e4
          return Some(DecodedAudio(sampleRate, n, rms, peak, zc))
        } else {
          if (len > b.remaining) return None
          b.position(b.position() + len) // skip LIST/INFO/etc chunks
        }
      }
      None
    } catch { case _: java.nio.BufferUnderflowException => None }
  }

  /** Deterministic synthetic WAV clips, one per input row, ENCODED as a
    * real RIFF/WAVE container (44-byte canonical header + LE int16
    * PCM): sample(t) = (id·7919 + t·104729) mod 65536 − 32768 — which a
    * SQL oracle computes analytically, so the encode→decode round trip
    * exercises the production container path end-to-end exactly like
    * [[synthPngAssets]] does for images.
    */
  def synthWavAssets(df: DataFrame, idCol: String, sampleRate: Int,
                     nSamples: Int)(implicit spark: SparkSession): DataFrame = {
    import spark.implicits._
    require(sampleRate > 0 && nSamples > 0)
    spread(df.select(col(idCol).cast("long").as("id"))).as[Long].mapPartitions { it =>
      it.map { id =>
        val dataLen = nSamples * 2
        val b = java.nio.ByteBuffer.allocate(44 + dataLen)
          .order(java.nio.ByteOrder.LITTLE_ENDIAN)
        b.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataLen)
          .put("WAVE".getBytes("US-ASCII"))
        b.put("fmt ".getBytes("US-ASCII")).putInt(16)
          .putShort(1).putShort(1) // PCM, mono
          .putInt(sampleRate).putInt(sampleRate * 2).putShort(2).putShort(16)
        b.put("data".getBytes("US-ASCII")).putInt(dataLen)
        var t = 0
        while (t < nSamples) {
          b.putShort((((id * 7919L + t * 104729L) % 65536L) - 32768L).toShort)
          t += 1
        }
        (id, "audio", b.array().length.toLong, b.array())
      }
    }.toDF("asset_id", "modality", "n_bytes", "payload")
  }

  /** Audio features row for the analytic oracle query. */
  case class AudioFeatures(asset_id: Long, sample_rate: Int, n_samples: Int,
                           rms: Double, peak: Int, zero_crossings: Long)

  /** Decode every audio asset and emit oracle-comparable PCM stats.
    * Undecodable payloads FAIL here — the correctness gate, like
    * [[imageFeatures]]. */
  def audioFeatures(assets: DataFrame)(implicit spark: SparkSession): Dataset[AudioFeatures] = {
    import spark.implicits._
    assets.as[Asset].mapPartitions { it =>
      it.map { a =>
        val d = decodeWav(a.payload).getOrElse(throw new IllegalArgumentException(
          s"asset ${a.asset_id}: payload is not a decodable 16-bit mono PCM WAV"))
        AudioFeatures(a.asset_id, d.sampleRate, d.nSamples, d.rms, d.peak,
          d.zeroCrossings)
      }
    }
  }

  /** Decoded video summary: per-frame REAL image decodes folded into
    * first/last frame means and the average absolute inter-frame mean
    * delta (the cheap temporal-activity signal a sampling curator
    * thresholds on). */
  case class DecodedVideo(nFrames: Int, width: Int, height: Int,
                          meanFirst: Double, meanLast: Double,
                          avgAbsDelta: Double)

  /** Packed-frame video container ("GFV1": magic, frame count, then
    * length-prefixed REAL PNG frames — the Motion-JPEG idea with a
    * lossless codec). Decode walks the index and runs the actual
    * ImageIO decode per frame, so the video path exercises a genuine
    * codec end-to-end rather than a byte-slicing stub; any unparseable
    * frame quarantines the whole asset as None.
    *
    * Numeric note: per-frame means are exact dyadic rationals
    * (sum/(w·h) with w·h a power of two), their |deltas| likewise, and
    * those summands share one small denominator — so the delta sum is
    * EXACT in double regardless of association and the single closing
    * division is one correctly-rounded op the oracle replays.
    */
  def decodeVideo(payload: Array[Byte]): Option[DecodedVideo] = {
    val b = java.nio.ByteBuffer.wrap(payload).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    try {
      val magic = new Array[Byte](4); b.get(magic)
      if (new String(magic, "US-ASCII") != "GFV1") return None
      val n = b.getInt
      if (n <= 0) return None
      var (w, h) = (-1, -1)
      val means = new Array[Double](n)
      var f = 0
      while (f < n) {
        val len = b.getInt
        if (len <= 0 || len > b.remaining) return None
        val frame = new Array[Byte](len); b.get(frame)
        decodeImage(frame) match {
          case None => return None
          case Some(d) =>
            if (f == 0) { w = d.width; h = d.height }
            else if (d.width != w || d.height != h) return None
            means(f) = d.pxMean
        }
        f += 1
      }
      var deltaSum = 0.0
      var i = 1
      while (i < n) { deltaSum += math.abs(means(i) - means(i - 1)); i += 1 }
      Some(DecodedVideo(n, w, h, means(0), means(n - 1),
        if (n > 1) deltaSum / (n - 1) else 0.0))
    } catch { case _: java.nio.BufferUnderflowException => None }
  }

  /** Deterministic synthetic clips: frame f's pixel(i) =
    * (id·31 + f·17 + i) mod 256, each frame ENCODED through the real
    * PNG writer and packed into the GFV1 container. */
  def synthVideoAssets(df: DataFrame, idCol: String, width: Int, height: Int,
                       nFrames: Int)(implicit spark: SparkSession): DataFrame = {
    import spark.implicits._
    require(width > 0 && height > 0 && nFrames > 0)
    spread(df.select(col(idCol).cast("long").as("id"))).as[Long].mapPartitions { it =>
      it.map { id =>
        val frames = (0 until nFrames).map { f =>
          val img = grayImage(width, height)(i => ((id * 31 + f * 17 + i) % 256).toInt)
          val out = new java.io.ByteArrayOutputStream()
          javax.imageio.ImageIO.write(img, "png", out)
          out.toByteArray
        }
        val total = 8 + frames.map(4 + _.length).sum
        val b = java.nio.ByteBuffer.allocate(total)
          .order(java.nio.ByteOrder.LITTLE_ENDIAN)
        b.put("GFV1".getBytes("US-ASCII")).putInt(nFrames)
        frames.foreach { fr => b.putInt(fr.length); b.put(fr) }
        (id, "video", total.toLong, b.array())
      }
    }.toDF("asset_id", "modality", "n_bytes", "payload")
  }

  /** Video features row for the analytic oracle query. */
  case class VideoFeatures(asset_id: Long, n_frames: Int, width: Int,
                           height: Int, mean_first: Double, mean_last: Double,
                           avg_abs_delta: Double)

  /** Decode every video asset (all frames, real codec) and emit
    * oracle-comparable temporal stats. Undecodable payloads FAIL — the
    * correctness gate, like [[imageFeatures]]/[[audioFeatures]]. */
  def videoFeatures(assets: DataFrame)(implicit spark: SparkSession): Dataset[VideoFeatures] = {
    import spark.implicits._
    assets.as[Asset].mapPartitions { it =>
      it.map { a =>
        val d = decodeVideo(a.payload).getOrElse(throw new IllegalArgumentException(
          s"asset ${a.asset_id}: payload is not a decodable GFV1 clip"))
        VideoFeatures(a.asset_id, d.nFrames, d.width, d.height, d.meanFirst,
          d.meanLast, d.avgAbsDelta)
      }
    }
  }

  /** One fixed-size frame of a larger asset. */
  case class AssetFrame(asset_id: Long, modality: String, frame_idx: Int,
                        n_bytes: Long, payload: Array[Byte])

  /** Evenly-spaced frame sampling: cut the payload into `frameBytes`
    * chunks ("frames" — for video, a real impl seeks keyframes in the
    * codec; the chunk arithmetic and fan-out plumbing are identical) and
    * keep `n` evenly spaced ones. One row in, ≤ n rows out — the
    * explode-shaped fan-out stays partition-local, so a 100 TB corpus
    * sampling 8 frames per asset never shuffles payload bytes.
    */
  def sampleFrames(assets: DataFrame, frameBytes: Int, n: Int)
                  (implicit spark: SparkSession): Dataset[AssetFrame] = {
    import spark.implicits._
    require(frameBytes > 0 && n > 0)
    assets.as[Asset].flatMap { a =>
      val frames = math.max(1, (a.payload.length + frameBytes - 1) / frameBytes)
      val take = math.min(n, frames)
      (0 until take).map { k =>
        // evenly spaced frame indices over [0, frames)
        val idx = if (take == 1) 0 else (k.toLong * (frames - 1) / (take - 1)).toInt
        val from = idx * frameBytes
        val until = math.min(from + frameBytes, a.payload.length)
        AssetFrame(a.asset_id, a.modality, idx, (until - from).toLong,
          java.util.Arrays.copyOfRange(a.payload, from, until))
      }
    }
  }

  /** Modality-agnostic byte-stride downsampling to ≤ `targetBytes` —
    * the budget cap for opaque payloads whose codec is unknown. For
    * images the REAL pixel resize is [[resizeImages]]. Deterministic,
    * so tests can assert sizes and content.
    */
  def resize(assets: DataFrame, targetBytes: Int)
            (implicit spark: SparkSession): Dataset[Asset] = {
    import spark.implicits._
    require(targetBytes > 0)
    assets.as[Asset].mapPartitions { it =>
      it.map { a =>
        if (a.payload.length <= targetBytes) a
        else {
          val stride = (a.payload.length + targetBytes - 1) / targetBytes
          val out = Array.range(0, a.payload.length, stride).map(a.payload)
          a.copy(n_bytes = out.length.toLong, payload = out)
        }
      }
    }
  }

  /** REAL image resize: decode through the production PNG reader,
    * nearest-neighbor sample band 0 onto a `targetW`×`targetH` raster
    * (dst (x,y) ← src (⌊x·srcW/targetW⌋, ⌊y·srcH/targetH⌋) — integer
    * arithmetic, so a SQL oracle replays the pixel mapping exactly),
    * re-encode through the real PNG writer. Payload-in/payload-out like
    * every codec here: the whole transform runs inside mapPartitions,
    * nothing but (smaller) binary payloads moves, and downstream
    * [[imageFeatures]] decodes the product — proving the re-encoded
    * bytes are a valid PNG, not just a plausible buffer. Undecodable
    * inputs FAIL (correctness gate, same contract as imageFeatures);
    * grayscale band-0 only, matching [[decodeImage]]'s stat surface.
    */
  def resizeImages(assets: DataFrame, targetW: Int, targetH: Int)
                  (implicit spark: SparkSession): Dataset[Asset] = {
    import spark.implicits._
    require(targetW > 0 && targetH > 0)
    assets.as[Asset].mapPartitions { it =>
      it.map { a =>
        val src = Option(javax.imageio.ImageIO.read(
            new java.io.ByteArrayInputStream(a.payload)))
          .getOrElse(throw new IllegalArgumentException(
            s"asset ${a.asset_id}: payload is not a decodable image"))
        val (sw, sh) = (src.getWidth, src.getHeight)
        val px = band0(src)
        val dst = grayImage(targetW, targetH) { i =>
          val (x, y) = (i % targetW, i / targetW)
          px((y * sh / targetH) * sw + (x * sw / targetW))
        }
        val out = new java.io.ByteArrayOutputStream()
        javax.imageio.ImageIO.write(dst, "png", out)
        Asset(a.asset_id, a.modality, out.size().toLong, out.toByteArray)
      }
    }
  }

  /** Horizontal mirror through the real codec — the simplest of the
    * augmentation family (flip/crop/rotate) a vision training pipeline
    * applies at scale: decode, dst(x, y) ← src(w−1−x, y) in integer
    * index arithmetic, re-encode through the PNG writer. Runs inside
    * mapPartitions like every codec pass; undecodable inputs fail the
    * gate (quarantine lives in [[extractFeatures]]).
    */
  def flipImages(assets: DataFrame)(implicit spark: SparkSession): Dataset[Asset] = {
    import spark.implicits._
    assets.as[Asset].mapPartitions { it =>
      it.map { a =>
        val src = Option(javax.imageio.ImageIO.read(
            new java.io.ByteArrayInputStream(a.payload)))
          .getOrElse(throw new IllegalArgumentException(
            s"asset ${a.asset_id}: payload is not a decodable image"))
        // single-band only: silently flipping just band 0 of an RGB
        // image would discard two channels — fail loud instead
        require(src.getRaster.getNumBands == 1,
          s"asset ${a.asset_id}: flipImages handles single-band (grayscale) " +
            s"rasters; got ${src.getRaster.getNumBands} bands")
        val (w, h) = (src.getWidth, src.getHeight)
        val px = band0(src)
        val dst = grayImage(w, h)(i => px((i / w) * w + (w - 1 - i % w)))
        val out = new java.io.ByteArrayOutputStream()
        javax.imageio.ImageIO.write(dst, "png", out)
        Asset(a.asset_id, a.modality, out.size().toLong, out.toByteArray)
      }
    }
  }

  /** Half-raster stats: exact left/right pixel sums. Global stats
    * (mean/min/max) are mirror-invariant, so THESE are what let an
    * oracle actually prove a flip happened — the left sum of the
    * product must equal the analytic right sum of the source.
    */
  case class ImageHalfStats(asset_id: Long, width: Int, height: Int,
                            left_sum: Long, right_sum: Long)

  def imageHalfStats(assets: DataFrame)(implicit spark: SparkSession): Dataset[ImageHalfStats] = {
    import spark.implicits._
    assets.as[Asset].mapPartitions { it =>
      it.map { a =>
        val img = Option(javax.imageio.ImageIO.read(
            new java.io.ByteArrayInputStream(a.payload)))
          .getOrElse(throw new IllegalArgumentException(
            s"asset ${a.asset_id}: payload is not a decodable image"))
        require(img.getRaster.getNumBands == 1,
          s"asset ${a.asset_id}: imageHalfStats sums single-band rasters; " +
            s"got ${img.getRaster.getNumBands} bands")
        val (w, h) = (img.getWidth, img.getHeight)
        val px = band0(img)
        var (ls, rs) = (0L, 0L)
        var i = 0
        while (i < px.length) {
          if (i % w < w / 2) ls += px(i) else rs += px(i)
          i += 1
        }
        ImageHalfStats(a.asset_id, w, h, ls, rs)
      }
    }
  }
}
