package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing: image/audio/video as opaque `binary` columns
  * with typed metadata (beyond-reference surface, BASELINE.json north star).
  *
  * The image path is a REAL codec: `decodeImage` runs `javax.imageio`
  * (PNG/BMP/GIF ship with the JDK — no external dependency) inside the
  * same `mapPartitions` batch shape, and `extractFeatures` computes its
  * features from the decoded pixel raster. Payloads ImageIO cannot decode
  * (audio, video, opaque blobs) fall back to `byteFeatures`, the
  * deterministic raw-byte featurizer — a production deployment swaps that
  * fallback for a JNI/javacpp media decoder without touching any plan
  * shape.
  */
object Multimodal {

  // ImageIO's default stream cache is FILE-backed: every decode/encode of
  // an in-memory payload creates and deletes a temp file — at corpus scale
  // that is one filesystem round-trip PER IMAGE and dominated the m6 aHash
  // pass (tiny PNGs: the codec work is microseconds, the temp file is
  // hundreds). Memory-cached streams are the correct mode for byte-array
  // payloads — but `ImageIO.setUseCache(false)` flips that JVM-GLOBALLY as
  // a class-load side effect, silently switching every other ImageIO user
  // in the executor onto heap-backed streams (ADVICE r16). Instead every
  // path here wraps its byte array in an explicit
  // MemoryCacheImageInput/OutputStream — same speed, zero global state.

  /** Canonical media-asset schema: one row per asset. The binary payload is
    * last so column pruning can drop it when only metadata is queried. */
  val mediaSchema: StructType = StructType(Seq(
    StructField("asset_id", LongType, nullable = false),
    StructField("modality", StringType, nullable = false),  // image|audio|video
    StructField("mime", StringType, nullable = false),
    StructField("meta", StructType(Seq(
      StructField("width", IntegerType, nullable = true),
      StructField("height", IntegerType, nullable = true),
      StructField("duration_ms", LongType, nullable = true),
      StructField("sample_rate", IntegerType, nullable = true))), nullable = true),
    StructField("payload", BinaryType, nullable = true)))

  final case class MediaFeatures(
      asset_id: Long, modality: String, n_bytes: Long,
      checksum: Long, feature: Array[Double],
      width: Option[Int], height: Option[Int])

  /** Decoded-image geometry + integer-exact pixel features. `checksum` is
    * the 31-ary rolling hash over row-major 8-bit luminance; `sumV` /
    * `wsumV` are the plain and position-weighted gray sums (order-sensitive
    * via the weight, yet expressible in plain SQL — the oracle recomputes
    * them from the generating formula without decoding anything). */
  final case class ImageFeatures(width: Int, height: Int, checksum: Long,
                                 sumV: Long, wsumV: Long, hist: Array[Double])

  /** REAL image decode to a row-major 8-bit luminance raster via
    * `javax.imageio` (PNG/BMP/GIF — in the JDK). None when the payload is
    * not a decodable image; luminance is the ITU-R BT.601 integer
    * approximation ((299 R + 587 G + 114 B) / 1000) for color rasters,
    * the sample itself for grayscale. */
  /** Per-thread pinned PNG reader: `ImageIO.read` re-runs service-registry
    * format discovery and reader construction on EVERY call — at tiny-image
    * corpus scale that housekeeping costs more than the actual inflate.
    * Payloads carrying the PNG magic go through the pinned reader (reset
    * via setInput per image, the codec-context-per-partition pattern the
    * mapInPandas twin would use); everything else (BMP/GIF/corrupt) falls
    * back to the stock discovery path. */
  private val pngReader = new ThreadLocal[javax.imageio.ImageReader] {
    override def initialValue(): javax.imageio.ImageReader = {
      val it = javax.imageio.ImageIO.getImageReadersByFormatName("png")
      if (it.hasNext) it.next() else null
    }
  }
  private val PngMagic = Array[Byte](0x89.toByte, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a)
  private def isPng(p: Array[Byte]): Boolean =
    p.length >= 8 && java.util.Arrays.equals(p, 0, 8, PngMagic, 0, 8)

  def decodeGray(payload: Array[Byte]): Option[(Int, Int, Array[Int])] = {
    if (payload == null) return None
    val img =
      try {
        val pinned = if (isPng(payload)) pngReader.get() else null
        if (pinned != null) {
          val iis = new javax.imageio.stream.MemoryCacheImageInputStream(
            new java.io.ByteArrayInputStream(payload))
          try { pinned.setInput(iis, true, true); pinned.read(0) }
          finally iis.close()
        } else {
          // explicit memory-cached stream: ImageIO.read(InputStream) would
          // route through the JVM-global useCache temp-file default.
          // ImageIO.read(ImageInputStream) closes the stream itself on the
          // found-a-reader path, so the cleanup close must swallow the
          // already-closed IOException rather than mask a good decode.
          val iis = new javax.imageio.stream.MemoryCacheImageInputStream(
            new java.io.ByteArrayInputStream(payload))
          try javax.imageio.ImageIO.read(iis)
          finally { try iis.close() catch { case _: java.io.IOException => () } }
        }
      } catch { case _: java.io.IOException => null }
    if (img == null) return None
    val w = img.getWidth; val h = img.getHeight
    val gray = img.getColorModel.getNumComponents == 1
    val px = new Array[Int](w * h)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        px(y * w + x) =
          if (gray) img.getRaster.getSample(x, y, 0) & 0xff
          else {
            val rgb = img.getRGB(x, y)
            (299 * ((rgb >> 16) & 0xff) + 587 * ((rgb >> 8) & 0xff) +
              114 * (rgb & 0xff)) / 1000
          }
        x += 1
      }
      y += 1
    }
    Some((w, h, px))
  }

  /** [[decodeGray]] + the integer-exact pixel features of [[ImageFeatures]]. */
  def decodeImage(payload: Array[Byte]): Option[ImageFeatures] =
    decodeGray(payload).map { case (w, h, px) =>
      val hist = Array.fill(8)(0.0)
      var checksum = 0L; var sumV = 0L; var wsumV = 0L
      var i = 0
      while (i < px.length) {
        val v = px(i)
        checksum = (checksum * 31 + v) & 0x7fffffffffffffL
        sumV += v
        wsumV += v.toLong * i // i == x + w·y in row-major order
        hist(v >> 5) += 1.0
        i += 1
      }
      ImageFeatures(w, h, checksum, sumV, wsumV, hist.map(_ / (w.toLong * h)))
    }

  /** Raw-byte fallback featurizer for payloads without a JDK codec (audio,
    * video, opaque blobs): length, rolling checksum, 8 coarse byte-histogram
    * buckets. Deterministic; swap for a JNI/javacpp decoder in production. */
  def byteFeatures(payload: Array[Byte]): (Long, Array[Double]) = {
    if (payload == null) return (0L, Array.fill(8)(0.0))
    var checksum = 0L
    val hist = Array.fill(8)(0.0)
    var i = 0
    while (i < payload.length) {
      checksum = (checksum * 31 + (payload(i) & 0xff)) & 0x7fffffffffffffL
      hist((payload(i) & 0xff) >> 5) += 1.0
      i += 1
    }
    val total = math.max(1.0, payload.length.toDouble)
    (checksum, hist.map(_ / total))
  }

  /** Batched per-partition feature extraction — the Scala equivalent of the
    * `mapInPandas` batch UDF: one decoder instantiation per partition, rows
    * streamed through it. Image payloads decode for real (`decodeImage`);
    * everything else takes the `byteFeatures` fallback with null geometry. */
  def extractFeatures(media: DataFrame): Dataset[MediaFeatures] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select("asset_id", "modality", "payload")
      .as[(Long, String, Array[Byte])]
      .mapPartitions { rows =>
        // per-partition decoder setup would go here (codec contexts are
        // expensive; never per-row) — ImageIO is stateless, so nothing to pin
        rows.map { case (id, modality, payload) =>
          val nBytes = if (payload == null) 0L else payload.length.toLong
          decodeImage(payload) match {
            case Some(f) =>
              MediaFeatures(id, modality, nBytes, f.checksum, f.hist,
                Some(f.width), Some(f.height))
            case None =>
              val (checksum, feature) = byteFeatures(payload)
              MediaFeatures(id, modality, nBytes, checksum, feature, None, None)
          }
        }
      }
  }

  /** Encode one row-major 8-bit grayscale raster as PNG bytes (the
    * deterministic synthetic-image writer for specs and oracle queries —
    * PNG is lossless, so decode returns exactly these samples). */
  def encodeGrayPng(width: Int, height: Int, pixels: Array[Byte]): Array[Byte] = {
    require(pixels.length == width * height, "pixels must be width*height")
    val img = new java.awt.image.BufferedImage(width, height,
      java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
    img.getRaster.setDataElements(0, 0, width, height, pixels)
    val out = new java.io.ByteArrayOutputStream()
    // pinned per-thread writer, same rationale as the pinned reader: the
    // corpus builder encodes one PNG per row and ImageIO.write's per-call
    // writer discovery dwarfs the deflate of a tiny image
    val w = pngWriter.get()
    if (w != null) {
      val ios = new javax.imageio.stream.MemoryCacheImageOutputStream(out)
      try { w.setOutput(ios); w.write(img); ios.flush() }
      finally ios.close()
    } else {
      // same explicit memory-cached stream as the pinned path: the
      // OutputStream overload would consult the JVM-global useCache flag
      val ios = new javax.imageio.stream.MemoryCacheImageOutputStream(out)
      try { javax.imageio.ImageIO.write(img, "png", ios); ios.flush() }
      finally ios.close()
    }
    out.toByteArray
  }

  private val pngWriter = new ThreadLocal[javax.imageio.ImageWriter] {
    override def initialValue(): javax.imageio.ImageWriter = {
      val it = javax.imageio.ImageIO.getImageWritersByFormatName("png")
      if (it.hasNext) it.next() else null
    }
  }

  /** Deterministic synthetic PNG corpus keyed by an id column: asset i is a
    * ((i%5)+4) × ((i%3)+4) grayscale image with pixel (x, y) =
    * (7·i + 3·x + 5·y) mod 256 — a formula an oracle can aggregate in SQL
    * without any image codec. */
  def syntheticPngs(df: DataFrame, idCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long")).as[Long].mapPartitions { ids =>
      ids.map { id =>
        val w = (id % 5 + 4).toInt; val h = (id % 3 + 4).toInt
        val px = Array.tabulate(w * h) { i =>
          ((7 * id + 3 * (i % w) + 5 * (i / w)) % 256).toByte
        }
        (id, "image", "image/png", encodeGrayPng(w, h, px))
      }
    }.toDF("asset_id", "modality", "mime", "payload")
      .withColumn("meta", struct(
        lit(null).cast("int").as("width"), lit(null).cast("int").as("height"),
        lit(null).cast("long").as("duration_ms"),
        lit(null).cast("int").as("sample_rate")))
      .select("asset_id", "modality", "mime", "meta", "payload")
  }

  /** Decoded-pixel feature table over a media relation: geometry + the
    * integer-exact pixel aggregates of [[ImageFeatures]] — the
    * oracle-checkable face of the real decode path. */
  def imagePixelFeatures(media: DataFrame): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select("asset_id", "payload").as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        rows.flatMap { case (id, payload) =>
          decodeImage(payload).map(f =>
            (id, f.width, f.height, f.width.toLong * f.height, f.sumV, f.wsumV))
        }
      }.toDF("asset_id", "width", "height", "n_px", "sum_v", "wsum_v")
  }

  /** Nearest-neighbor image resize to a fixed `outW`×`outH` thumbnail —
    * the standardize-before-embed step every multimodal training pipeline
    * runs (CLIP-style fixed-resolution inputs). REAL decode
    * ([[decodeGray]]), then the GDAL/PIL floor convention
    * src = (dst · srcDim) div outDim — pure integer, so the resized
    * raster is bit-reproducible and the oracle can replay it from a
    * generating formula without any codec. Output: geometry + the
    * integer-exact plain and position-weighted luminance sums over the
    * RESIZED raster (the m2 discipline — order-insensitive, SQL-exact).
    * One narrow mapPartitions; payload pruned after decode; no shuffle. */
  def resizeNearestFeatures(media: DataFrame, outW: Int, outH: Int): DataFrame = {
    require(outW > 0 && outH > 0, "resize target must be positive")
    val spark = media.sparkSession
    import spark.implicits._
    media.select("asset_id", "payload").as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        rows.flatMap { case (id, payload) =>
          decodeGray(payload).map { case (w, h, px) =>
            var sumV = 0L; var wsumV = 0L
            var y = 0
            while (y < outH) {
              val sy = y * h / outH
              var x = 0
              while (x < outW) {
                val v = px(sy * w + x * w / outW).toLong
                sumV += v
                wsumV += v * (x + outW.toLong * y)
                x += 1
              }
              y += 1
            }
            (id, outW, outH, sumV, wsumV)
          }
        }
      }.toDF("asset_id", "out_w", "out_h", "sum_v", "wsum_v")
  }

  /** Perceptual average-hash (aHash) over REAL decoded images — the
    * near-dup fingerprint of an image dedup pipeline: decode
    * ([[decodeGray]]), nearest-neighbor resize to `size`×`size` (the
    * [[resizeNearestFeatures]] floor convention), then one bit per cell:
    * 1 iff cell luminance ≥ the thumbnail mean. The mean compare is pure
    * integer cross-multiplication (size²·v ≥ Σv — no float, no rounding
    * boundary), so the hash is bit-reproducible and an oracle can replay
    * it from a generating formula without any codec. The 64 bits split
    * into two 32-bit halves (`hash_hi` bits 32–63, `hash_lo` bits 0–31)
    * so they stay exact in signed 64-bit SQL integers on both engines.
    * Identical-hash grouping (or a simhash-style band join on the halves,
    * [[Dedup.simhashCandidates]]) then finds visual near-dups without a
    * pairwise pass. One narrow mapPartitions; no shuffle. */
  def averageHash(media: DataFrame, size: Int = 8): DataFrame = {
    require(size > 0 && size * size <= 64, "aHash needs size² ≤ 64 bits")
    val spark = media.sparkSession
    import spark.implicits._
    media.select("asset_id", "payload").as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        rows.flatMap { case (id, payload) =>
          decodeGray(payload).map { case (w, h, px) =>
            val n = size * size
            val cells = new Array[Long](n)
            var sum = 0L
            var y = 0
            while (y < size) {
              val sy = y * h / size
              var x = 0
              while (x < size) {
                val v = px(sy * w + x * w / size).toLong
                cells(y * size + x) = v
                sum += v
                x += 1
              }
              y += 1
            }
            var lo = 0L; var hi = 0L
            var i = 0
            while (i < n) {
              if (cells(i) * n >= sum) {
                if (i < 32) lo |= 1L << i else hi |= 1L << (i - 32)
              }
              i += 1
            }
            (id, hi, lo)
          }
        }
      }.toDF("asset_id", "hash_hi", "hash_lo")
  }

  /** Deterministic frame sampling plan for video assets: every `everyMs`
    * milliseconds, computed from metadata only (no decode) — emits
    * (asset_id, frame_idx, ts_ms) rows for downstream decode. */
  def sampleFramePlan(media: DataFrame, everyMs: Long): DataFrame =
    media
      .filter(col("modality") === "video" && col("meta.duration_ms").isNotNull)
      .select(col("asset_id"), col("meta.duration_ms").as("duration_ms"))
      .withColumn("ts_ms", explode(sequence(lit(0L), col("duration_ms") - 1, lit(everyMs))))
      .withColumn("frame_idx", (col("ts_ms") / everyMs).cast("long"))
      .select("asset_id", "frame_idx", "ts_ms")

  /** Deterministic synthetic PCM corpus keyed by an id column: asset i
    * carries (5 + i mod 5)·160 signed 16-bit little-endian samples with
    * sample j = ((31·i + 17·j) mod 4096) − 2048 — like [[syntheticPngs]],
    * a formula an oracle can aggregate in SQL without touching bytes,
    * while the Spark side must genuinely pack and re-parse the binary. */
  def syntheticPcm(df: DataFrame, idCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long")).as[Long].mapPartitions { ids =>
      ids.map { id =>
        val n = ((5 + id % 5) * 160).toInt
        val bytes = new Array[Byte](n * 2)
        var j = 0
        while (j < n) {
          val v = ((31 * id + 17 * j) % 4096 - 2048).toShort
          bytes(2 * j) = (v & 0xff).toByte
          bytes(2 * j + 1) = ((v >> 8) & 0xff).toByte
          j += 1
        }
        (id, "audio", "audio/pcm", bytes)
      }
    }.toDF("asset_id", "modality", "mime", "payload")
      .withColumn("meta", struct(
        lit(null).cast("int").as("width"), lit(null).cast("int").as("height"),
        (length(col("payload")) / 2 * 1000 / 16000).cast("long").as("duration_ms"),
        lit(16000).as("sample_rate")))
      .select("asset_id", "modality", "mime", "meta", "payload")
  }

  /** Frame-level audio features over raw 16-bit LE PCM payloads: the
    * energy/peak per fixed-length frame that silence trimming and
    * voice-activity gating run on. REAL byte parsing (ByteBuffer, one
    * decoder pass per partition batch) → integer-exact per-frame
    * aggregates; a trailing partial frame is dropped (standard hop
    * behavior). One narrow mapPartitions, no shuffle — frames explode
    * inside the task, and downstream aggregates see an ordinary table. */
  def audioFrameFeatures(media: DataFrame, frameLen: Int = 160): DataFrame = {
    require(frameLen > 0, "frameLen must be positive")
    val spark = media.sparkSession
    import spark.implicits._
    media.filter(col("modality") === "audio")
      .select("asset_id", "payload").as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        rows.flatMap { case (id, payload) =>
          if (payload == null) Iterator.empty
          else {
            val buf = java.nio.ByteBuffer.wrap(payload)
              .order(java.nio.ByteOrder.LITTLE_ENDIAN)
            val nFrames = payload.length / 2 / frameLen
            (0 until nFrames).iterator.map { f =>
              var sumAbs = 0L; var sumSq = 0L; var maxAbs = 0L
              var j = 0
              while (j < frameLen) {
                val v = buf.getShort((f * frameLen + j) * 2).toLong
                val a = math.abs(v)
                sumAbs += a; sumSq += v * v
                if (a > maxAbs) maxAbs = a
                j += 1
              }
              (id, f, sumAbs, sumSq, maxAbs)
            }
          }
        }
      }.toDF("asset_id", "frame_idx", "sum_abs", "sum_sq", "max_abs")
  }

  /** Frame-level DFT bin energies over raw 16-bit LE PCM — the spectral
    * feature a music/noise/bandwidth gate runs next to
    * [[audioFrameFeatures]]' time-domain energy (e.g. telephony-band vs
    * wideband detection before transcription). The correlation kernel is
    * an integer-quantized trig table (`floor(cos·10³ + 0.5)` — the worst
    * case over this frame size's angle set sits 1.4e-3 from a rounding
    * boundary, ten orders above libm ulp disagreement), so the per-frame
    * multiply-accumulate is an order-independent EXACT integer fold that
    * replays on any engine — float DFT sums would be fold-order dependent
    * and unhashable. One narrow mapPartitions; payloads never shuffle.
    *
    * Overflow contract: `power = re² + im²` fits in a signed 64-bit iff
    * |re|, |im| ≤ 2³¹−1 (then re²+im² ≤ 2·(2³¹−1)² < 2⁶³). The
    * correlators can exceed that only when amplitude × frameLen is
    * extreme (a FULL-SCALE ±32768 square wave phase-locked to a bin at
    * frameLen 160 reaches |re| ≈ 3.3e9); each frame×bin is therefore
    * guarded and fails LOUDLY — never a silent Long wraparound into a
    * garbage energy (the r12 ADVICE medium). Callers with hot wideband
    * input shrink frameLen or pre-scale. */
  def dftBinEnergy(media: DataFrame, frameLen: Int = 160,
                   bins: Seq[Int] = Seq(1, 2, 4, 8)): DataFrame = {
    require(frameLen > 0 && bins.nonEmpty, "frameLen and bins must be non-empty")
    val spark = media.sparkSession
    import spark.implicits._
    val binsArr = bins.toArray
    val cosT = binsArr.map(k => Array.tabulate(frameLen)(j =>
      math.floor(math.cos(2.0 * math.Pi * k * j / frameLen) * 1000 + 0.5).toLong))
    val sinT = binsArr.map(k => Array.tabulate(frameLen)(j =>
      math.floor(math.sin(2.0 * math.Pi * k * j / frameLen) * 1000 + 0.5).toLong))
    media.filter(col("modality") === "audio")
      .select("asset_id", "payload").as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        rows.flatMap { case (id, payload) =>
          if (payload == null) Iterator.empty
          else {
            val buf = java.nio.ByteBuffer.wrap(payload)
              .order(java.nio.ByteOrder.LITTLE_ENDIAN)
            val nFrames = payload.length / 2 / frameLen
            for {
              f <- (0 until nFrames).iterator
              ki <- binsArr.indices.iterator
            } yield {
              var re = 0L; var im = 0L
              var j = 0
              while (j < frameLen) {
                val v = buf.getShort((f * frameLen + j) * 2).toLong
                re += v * cosT(ki)(j); im += v * sinT(ki)(j)
                j += 1
              }
              // |re|,|im| ≤ 2³¹−1 ⇔ re²+im² < 2⁶³: outside that, power
              // would wrap silently — fail loudly with the frame id
              if (math.abs(re) > Int.MaxValue || math.abs(im) > Int.MaxValue)
                throw new ArithmeticException(
                  s"dftBinEnergy: correlator overflow at asset $id frame $f " +
                    s"bin ${binsArr(ki)} (re=$re im=$im): amplitude x frameLen " +
                    "exceeds the 64-bit power bound; shrink frameLen or pre-scale")
              (id, f, binsArr(ki), re, im, re * re + im * im)
            }
          }
        }
      }.toDF("asset_id", "frame_idx", "bin", "re_milli", "im_milli", "power")
  }

  /** Voice-activity segmentation over [[audioFrameFeatures]] output — the
    * silence-trimming step an audio curation pipeline runs before
    * transcription: frames with energy ≥ `minEnergy` are voiced, and
    * consecutive voiced frames merge into segments (gaps-and-islands:
    * island id = frame_idx − per-asset voiced rank, one asset-keyed
    * window over one sort — per-asset state, embarrassingly parallel
    * across assets). Output one row per segment with its frame span and
    * total energy; integer thresholds keep it exact on any engine. */
  def vadSegments(frames: DataFrame, minEnergy: Long): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("asset_id").orderBy("frame_idx")
    frames
      .filter(col("sum_sq") >= minEnergy)
      .withColumn("__island", col("frame_idx") - row_number().over(w))
      .groupBy(col("asset_id"), col("__island"))
      .agg(min("frame_idx").as("start_frame"), max("frame_idx").as("end_frame"),
        count(lit(1)).as("n_frames"), sum("sum_sq").as("energy"))
      .drop("__island")
  }

  /** Build a media table from any (id, text) source — used by tests/bench to
    * exercise the plumbing with deterministic payloads. */
  def syntheticFromText(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(
      col(idCol).cast("long").as("asset_id"),
      lit("image").as("modality"),
      lit("application/octet-stream").as("mime"),
      struct(
        (length(col(textCol)) % 1024 + 1).cast("int").as("width"),
        (length(col(textCol)) % 768 + 1).cast("int").as("height"),
        lit(null).cast("long").as("duration_ms"),
        lit(null).cast("int").as("sample_rate")).as("meta"),
      encode(col(textCol), "UTF-8").as("payload"))
}
