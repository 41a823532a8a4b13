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
    * by javacv/ffmpeg; the interface is batch-oriented so the Spark
    * plumbing is identical. */
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

    /** STUB frame sampling: `n` deterministic frame offsets. */
    def sampleFrameOffsets(durationMs: Long, n: Int): Array[Long] =
      if (durationMs <= 0 || n <= 0) Array.empty
      else (0 until n).map(i => durationMs * (2L * i + 1) / (2L * n)).toArray
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
    * instance per partition — the structure a real decoder needs), output
    * is a fixed-width feature vector + pixel stats. */
  def extractFeatures(media: DataFrame, targetW: Int = 8, targetH: Int = 8): DataFrame = {
    val spark = media.sparkSession
    val outSchema = StructType(media.schema.fields ++ Seq(
      StructField("features", ArrayType(FloatType), nullable = false),
      StructField("mean_px", FloatType, nullable = false)))
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(outSchema)
    media.mapPartitions { rows =>
      // per-partition "codec context" — allocated once, reused per row
      val codec = MediaCodec
      rows.map { r =>
        val bytes = r.getAs[Array[Byte]]("bytes")
        val px = codec.decodeImage(if (bytes == null) Array.empty else bytes,
          targetW, targetH)
        val mean = if (px.isEmpty) 0.0f else px.sum / px.length
        Row.fromSeq(r.toSeq ++ Seq(px, mean))
      }
    }(enc)
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
