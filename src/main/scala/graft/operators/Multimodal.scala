package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing: image/audio/video as opaque `binary` columns
  * with typed metadata (beyond-reference surface, BASELINE.json north star).
  *
  * The Spark-side contract is real and tested — schema, batching,
  * partitioning, feature extraction shape — while the codec itself is a
  * clearly-marked deterministic STUB (`fakeDecode`): the container has no
  * image/audio libraries, and a production deployment swaps `fakeDecode`
  * for a JNI/javacpp decoder inside the same `mapPartitions` without
  * touching any plan shape.
  */
object Multimodal {

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
      checksum: Long, feature: Array[Double])

  /** STUB decode: deterministic features from raw bytes (length, rolling
    * checksum, 8 coarse byte-histogram buckets). Replace with a real codec
    * in production — signature and batch shape stay identical. */
  def fakeDecode(payload: Array[Byte]): (Long, Array[Double]) = {
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
    * streamed through it. */
  def extractFeatures(media: DataFrame): Dataset[MediaFeatures] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select("asset_id", "modality", "payload")
      .as[(Long, String, Array[Byte])]
      .mapPartitions { rows =>
        // per-partition decoder setup would go here (codec contexts are
        // expensive; never per-row)
        rows.map { case (id, modality, payload) =>
          val (checksum, feature) = fakeDecode(payload)
          MediaFeatures(id, modality,
            if (payload == null) 0L else payload.length.toLong, checksum, feature)
        }
      }
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
