package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal (image/audio/video) columns for the interleaved-document
  * pipeline: media as opaque `binary` + typed metadata, with
  * decode/feature/resize/frame-sample implemented as per-partition batch
  * transforms.
  *
  * The actual codec step is STUBBED — this container has no image/audio
  * libraries — behind [[MediaCodec]], which produces a deterministic fake
  * decode (seeded by content hash). Everything Spark-side is real and
  * load-bearing: schemas, batched per-partition execution (one codec
  * context per partition, not per row), partition sizing, and the
  * metadata/feature column contracts.
  */
object Multimodal {

  val mediaSchema: StructType = StructType(Seq(
    StructField("media_ref", StringType, nullable = false),
    StructField("mime", StringType, nullable = false),
    StructField("bytes", BinaryType, nullable = true),
    StructField("meta", StructType(Seq(
      StructField("width", IntegerType, nullable = true),
      StructField("height", IntegerType, nullable = true),
      StructField("duration_ms", LongType, nullable = true))), nullable = true)))

  /** The codec seam. A real deployment swaps this object for one backed
    * by javacv/ffmpeg; the interface is BATCH-oriented (decode n buffers
    * per call) so the Spark plumbing — one codec context per partition,
    * amortized over a batch — is identical with a real GPU/ffmpeg codec. */
  object MediaCodec {
    /** STUB decode: deterministic pseudo-pixels from the content hash.
      * Real impl: ??? (ImageIO / ffmpeg bindings; not in this container). */
    def decodeImage(bytes: Array[Byte], w: Int, h: Int): Array[Float] = {
      // deterministic fake: FNV over bytes seeds a tiny LCG "image"
      var hsh = -3750763034362895579L
      var i = 0
      while (i < bytes.length) { hsh ^= bytes(i); hsh *= 1099511628211L; i += 1 }
      val out = new Array[Float](w * h)
      var s = hsh
      i = 0
      while (i < out.length) {
        s = s * 6364136223846793005L + 1442695040888963407L
        out(i) = ((s >>> 40).toInt & 0xFF) / 255.0f
        i += 1
      }
      out
    }

    /** Batch decode — the shape a real codec wants (one context, n
      * buffers). STUB body delegates per-element; a real impl submits the
      * whole batch to the decoder/GPU at once. */
    def decodeImageBatch(batch: Seq[Array[Byte]], w: Int, h: Int): Seq[Array[Float]] =
      batch.map(b => decodeImage(if (b == null) Array.emptyByteArray else b, w, h))

    /** STUB decode of an audio payload to `n` mono PCM samples in [-1,1].
      * Real impl: ??? (ffmpeg / javax.sound; not in this container). */
    def decodePcm(bytesIn: Array[Byte], n: Int): Array[Float] = {
      val bytes = if (bytesIn == null) Array.emptyByteArray else bytesIn
      var hsh = -3750763034362895579L
      var i = 0
      while (i < bytes.length) { hsh ^= bytes(i); hsh *= 1099511628211L; i += 1 }
      val out = new Array[Float](n)
      var s = hsh
      i = 0
      while (i < out.length) {
        s = s * 6364136223846793005L + 1442695040888963407L
        // zero-mean-ish deterministic samples; every 7th run is "quiet"
        val v = (((s >>> 40).toInt & 0xFF) - 128) / 128.0f
        out(i) = if (((i / 400) % 7) == 0) v * 0.01f else v
        i += 1
      }
      out
    }

    /** STUB decode of one video frame at a byte+offset key: deterministic
      * pixels seeded by (content hash, frame offset) so adjacent frames of
      * the same video differ. Real impl: ??? (ffmpeg seek+decode). */
    def decodeFrame(bytes: Array[Byte], offsetMs: Long, w: Int, h: Int): Array[Float] = {
      val tag = java.nio.ByteBuffer.allocate(8).putLong(offsetMs).array()
      decodeImage((if (bytes == null) Array.emptyByteArray else bytes) ++ tag, w, h)
    }

    /** STUB frame sampling: `n` deterministic frame offsets. */
    def sampleFrameOffsets(durationMs: Long, n: Int): Array[Long] =
      if (durationMs <= 0 || n <= 0) Array.empty
      else (0 until n).map(i => durationMs * (2L * i + 1) / (2L * n)).toArray
  }

  // ---- real pixel math (operates on decoded arrays; nothing stubbed) ----

  /** Bilinear resize of a w0 x h0 row-major pixel array to w1 x h1. */
  def resizeBilinear(px: Array[Float], w0: Int, h0: Int,
                     w1: Int, h1: Int): Array[Float] = {
    require(px.length == w0 * h0, s"pixel buffer ${px.length} != $w0 x $h0")
    val out = new Array[Float](w1 * h1)
    var y = 0
    while (y < h1) {
      val sy = if (h1 == 1) 0.0 else y.toDouble * (h0 - 1) / (h1 - 1)
      val y0 = sy.toInt; val y1 = math.min(y0 + 1, h0 - 1); val fy = sy - y0
      var x = 0
      while (x < w1) {
        val sx = if (w1 == 1) 0.0 else x.toDouble * (w0 - 1) / (w1 - 1)
        val x0 = sx.toInt; val x1 = math.min(x0 + 1, w0 - 1); val fx = sx - x0
        val top = px(y0 * w0 + x0) * (1 - fx) + px(y0 * w0 + x1) * fx
        val bot = px(y1 * w0 + x0) * (1 - fx) + px(y1 * w0 + x1) * fx
        out(y * w1 + x) = (top * (1 - fy) + bot * fy).toFloat
        x += 1
      }
      y += 1
    }
    out
  }

  /** Average hash (aHash): resize to 8x8, set bit i when pixel i exceeds
    * the mean — the standard 64-bit perceptual image signature. Bit order
    * is row-major from bit 63 down. */
  def aHash64(px: Array[Float], w: Int, h: Int): Long = {
    val small = if (w == 8 && h == 8) px else resizeBilinear(px, w, h, 8, 8)
    var sum = 0.0
    var i = 0
    while (i < 64) { sum += small(i); i += 1 }
    val mean = sum / 64
    var bits = 0L
    i = 0
    while (i < 64) {
      if (small(i) > mean) bits |= (1L << (63 - i))
      i += 1
    }
    bits
  }

  /** Synthesize a deterministic media table (bytes = seeded garbage with
    * real plumbing shape) joined 1:1 with media_refs from docs' spans. */
  def mediaTable(docs: DataFrame): DataFrame =
    docs.select(explode(col("spans")).as("s"))
      .where(col("s.kind") === "media")
      .select(col("s.media_ref").as("media_ref"))
      .distinct()
      .withColumn("mime",
        element_at(array(lit("image/png"), lit("image/jpeg"), lit("audio/wav")),
          (pmod(xxhash64(col("media_ref")), lit(3)) + 1).cast("int")))
      .withColumn("bytes",
        // deterministic pseudo-bytes; length 64..319
        unhex(repeat(substring(hex(xxhash64(col("media_ref"))), 1, 8),
          (pmod(xxhash64(col("media_ref"), lit(7)), lit(64)) + 16).cast("int") * 2)))
      .withColumn("meta", struct(
        (pmod(xxhash64(col("media_ref"), lit(1)), lit(512)) + 32).cast("int").as("width"),
        (pmod(xxhash64(col("media_ref"), lit(2)), lit(512)) + 32).cast("int").as("height"),
        (pmod(xxhash64(col("media_ref"), lit(3)), lit(60000)) + 1000).as("duration_ms")))

  /** Feature extraction over media rows: batched per partition (one codec
    * context per partition, decode submitted `batchSize` buffers at a
    * time — the execution shape a real ffmpeg/GPU decoder needs), output
    * is a fixed-width feature vector + pixel stats. */
  def extractFeatures(media: DataFrame, targetW: Int = 8, targetH: Int = 8,
                      batchSize: Int = 64): DataFrame = {
    val outSchema = StructType(media.schema.fields ++ Seq(
      StructField("features", ArrayType(FloatType), nullable = false),
      StructField("mean_px", FloatType, nullable = false)))
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(outSchema)
    media.mapPartitions { rows =>
      // per-partition "codec context" — allocated once, fed whole batches
      val codec = MediaCodec
      rows.grouped(batchSize).flatMap { batch =>
        val decoded = codec.decodeImageBatch(
          batch.map(_.getAs[Array[Byte]]("bytes")), targetW, targetH)
        batch.iterator.zip(decoded.iterator).map { case (r, px) =>
          val mean = if (px.isEmpty) 0.0f else px.sum / px.length
          Row.fromSeq(r.toSeq ++ Seq(px, mean))
        }
      }
    }(enc)
  }

  /** 64-bit perceptual hashes (aHash over the decoded image): the image
    * analogue of the text SimHash — visually-identical re-encodes land on
    * the same or near-identical signature. Decode is batched per
    * partition; output carries only (media_ref, phash) so downstream
    * joins never shuffle pixels. */
  def perceptualHashes(media: DataFrame, decodeW: Int = 16, decodeH: Int = 16,
                       batchSize: Int = 64): DataFrame = {
    val outSchema = StructType(Seq(
      StructField("media_ref", StringType, nullable = false),
      StructField("phash", LongType, nullable = false)))
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(outSchema)
    val imgs = media.select(col("media_ref"), col("bytes"))
    imgs.mapPartitions { rows =>
      val codec = MediaCodec
      rows.grouped(batchSize).flatMap { batch =>
        val decoded = codec.decodeImageBatch(
          batch.map(_.getAs[Array[Byte]]("bytes")), decodeW, decodeH)
        batch.iterator.zip(decoded.iterator).map { case (r, px) =>
          Row(r.getString(0), aHash64(px, decodeW, decodeH))
        }
      }
    }(enc)
  }

  /** Near-duplicate media pairs by perceptual hash: signatures that agree
    * on at least one of four 16-bit chunks (pigeonhole: full recall for
    * Hamming ≤ 3) become candidates via a chunk equi-join — never
    * all-pairs — and are verified by exact Hamming ≤ `maxHamming`. The
    * shuffle carries (ref, 64-bit sig) only: the image-dedup twin of
    * Dedup.simHashPairs. */
  def mediaNearDupPairs(media: DataFrame, maxHamming: Int = 3,
                        decodeW: Int = 16, decodeH: Int = 16): DataFrame = {
    val sigs = perceptualHashes(media, decodeW, decodeH)
    val chunks = sigs.select(col("media_ref"), col("phash"),
      explode(array((0 until 4).map { c =>
        struct(lit(c).as("chunk"),
          shiftrightunsigned(col("phash"), c * 16).bitwiseAND(lit(0xFFFFL)).as("val"))
      }.toIndexedSeq: _*)).as("ck"))
    val a = chunks.select(col("ck"), col("media_ref").as("ref_a"), col("phash").as("sig_a"))
    val b = chunks.select(col("ck"), col("media_ref").as("ref_b"), col("phash").as("sig_b"))
    a.join(b, "ck")
      .where(col("ref_a") < col("ref_b"))
      .select(col("ref_a"), col("ref_b"),
        bit_count(col("sig_a").bitwiseXOR(col("sig_b"))).as("hamming"))
      .distinct()
      .where(col("hamming") <= maxHamming)
  }

  /** Audio energy windows: decode PCM (stub), then REAL framing math —
    * `frameMs` windows every `hopMs`, RMS per window, silence flag. One
    * output row per window: (media_ref, win_idx, t_ms, rms, is_silence).
    * The training-pipeline primitive for silence trimming / voice-activity
    * segmentation. Decode is batched; window math is pure Scala. */
  def audioEnergyWindows(media: DataFrame, sampleRate: Int = 16000,
                         frameMs: Int = 25, hopMs: Int = 10,
                         silenceRms: Double = 0.05,
                         maxWindowsPerDoc: Int = 256): DataFrame = {
    val outSchema = StructType(Seq(
      StructField("media_ref", StringType, nullable = false),
      StructField("win_idx", IntegerType, nullable = false),
      StructField("t_ms", LongType, nullable = false),
      StructField("rms", FloatType, nullable = false),
      StructField("is_silence", BooleanType, nullable = false)))
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(outSchema)
    val audio = media.select(col("media_ref"), col("bytes"),
      col("meta.duration_ms").as("duration_ms"))
    val frameN = sampleRate * frameMs / 1000
    val hopN = sampleRate * hopMs / 1000
    audio.mapPartitions { rows =>
      val codec = MediaCodec
      rows.flatMap { r =>
        // meta.duration_ms is nullable in mediaSchema: rows without a
        // duration decode zero samples (no windows), matching the image
        // path's null-bytes handling below
        val dur = if (r.isNullAt(2)) 0L else r.getLong(2)
        val nSamples = (dur * sampleRate / 1000).toInt
          .min((maxWindowsPerDoc - 1) * hopN + frameN)
        val pcm = codec.decodePcm(r.getAs[Array[Byte]]("bytes"), math.max(nSamples, 0))
        val nWin = if (pcm.length < frameN) 0 else (pcm.length - frameN) / hopN + 1
        (0 until nWin).iterator.map { w =>
          var acc = 0.0
          var i = w * hopN
          val end = i + frameN
          while (i < end) { acc += pcm(i) * pcm(i); i += 1 }
          val rms = math.sqrt(acc / frameN)
          Row(r.getString(0), w, (w.toLong * hopMs), rms.toFloat, rms < silenceRms)
        }
      }
    }(enc)
  }

  /** Per-frame features for video rows: sample `framesPerDoc` offsets,
    * decode each frame (stub codec, batched), emit (media_ref, frame_off,
    * features). Feeds [[sceneChanges]] and any embedding stage. */
  def frameFeatures(media: DataFrame, framesPerDoc: Int = 4,
                    targetW: Int = 8, targetH: Int = 8,
                    batchSize: Int = 64): DataFrame = {
    val outSchema = StructType(Seq(
      StructField("media_ref", StringType, nullable = false),
      StructField("frame_off", LongType, nullable = false),
      StructField("features", ArrayType(FloatType), nullable = false)))
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(outSchema)
    val vids = media.select(col("media_ref"), col("bytes"),
      col("meta.duration_ms").as("duration_ms"))
    vids.mapPartitions { rows =>
      val codec = MediaCodec
      rows.grouped(math.max(batchSize / math.max(framesPerDoc, 1), 1)).flatMap { batch =>
        batch.iterator.flatMap { r =>
          val bytes = r.getAs[Array[Byte]]("bytes")
          codec.sampleFrameOffsets(r.getLong(2), framesPerDoc).iterator.map { off =>
            Row(r.getString(0), off, codec.decodeFrame(bytes, off, targetW, targetH))
          }
        }
      }
    }(enc)
  }

  /** Scene-change detection: mean-square distance between CONSECUTIVE
    * frame features of the same media row; rows above `threshold` mark a
    * cut. The per-media window is bounded by framesPerDoc, so the sort
    * inside each partition key is tiny — this survives any media count. */
  def sceneChanges(frameFeats: DataFrame, threshold: Double = 0.05): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("media_ref").orderBy("frame_off")
    val dist = udf { (a: Seq[Float], b: Seq[Float]) =>
      if (a == null || b == null || a.isEmpty || a.length != b.length) 0.0
      else {
        var acc = 0.0
        var i = 0
        while (i < a.length) { val d = a(i) - b(i); acc += d * d; i += 1 }
        acc / a.length
      }
    }
    frameFeats
      .withColumn("prev", lag(col("features"), 1).over(w))
      .withColumn("dist", dist(col("prev"), col("features")))
      .where(col("prev").isNotNull)
      .select(col("media_ref"), col("frame_off"), col("dist"),
        (col("dist") > threshold).as("is_cut"))
  }

  /** Frame sampling for video/audio rows: explodes n deterministic frame
    * offsets per media row (plumbing for a real frame decoder). */
  def sampleFrames(media: DataFrame, framesPerDoc: Int = 4): DataFrame = {
    val offsetsUdf = udf { (durationMs: Long) =>
      MediaCodec.sampleFrameOffsets(durationMs, framesPerDoc)
    }
    media
      .withColumn("frame_off", explode(offsetsUdf(col("meta.duration_ms"))))
      .withColumn("frame_id",
        concat(col("media_ref"), lit("#"), col("frame_off")))
  }
}
