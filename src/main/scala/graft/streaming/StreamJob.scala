package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** Structured Streaming surface (SURVEY §2.8): incremental ingestion of new
  * manifest entries / event batches through the SAME transforms the batch
  * engine runs. The reference has no streaming (§1.4); this is the
  * Spark-idiomatic extension the survey plans — per-tile transforms are
  * stateless per key, so they lift to streams unchanged.
  */
object StreamJob {

  /** Windowed event aggregation (streaming twin of st1): hourly counts +
    * sums per event type with a watermark bounding state. */
  def eventWindowAgg(events: DataFrame, watermark: String = "1 hour"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"), sum("value").as("sum_value"))

  /** Sessionization with explicit state (streaming twin of st2): gap-based
    * sessions via flatMapGroupsWithState-free session_window (Spark's
    * native session windows bound state by watermark + gap). */
  def eventSessions(events: DataFrame, gap: String = "30 minutes"): DataFrame =
    events
      .withWatermark("ts", "1 hour")
      .groupBy(session_window(col("ts"), gap), col("user_id"))
      .agg(count(lit(1)).as("n_events"))

  /** Streaming exact dedup (incremental twin of Dedup.exact): arriving
    * documents are digest-keyed and first-writer-wins within the watermark
    * horizon. `dropDuplicatesWithinWatermark` is the variant whose state
    * actually EVICTS at the watermark (plain dropDuplicates on a non-time
    * key grows state forever — the classic streaming-dedup footgun); state
    * holds digests, 32 bytes/doc, not documents — the right shape for
    * dedup-on-ingest at 100 TB. */
  def streamingDedup(docs: DataFrame, watermark: String = "1 hour"): DataFrame =
    docs
      .withColumn("digest", md5(col("text")))
      .withWatermark("ts", watermark)
      .dropDuplicatesWithinWatermark("digest")

  /** Incremental tile ingestion: stream new block parquet under `path`
    * through a per-batch function — the foreachBatch pattern for driving
    * LayerJob-style transforms incrementally (new manifest entries become
    * new tiles; existing tiles are skipped by the F3 anti-join inside the
    * batch function). */
  def incrementalBlocks(spark: SparkSession, path: String, schema: org.apache.spark.sql.types.StructType)
                       (perBatch: (DataFrame, Long) => Unit): StreamingQuery =
    spark.readStream
      .schema(schema)
      .parquet(path)
      .writeStream
      .trigger(Trigger.AvailableNow())
      .foreachBatch(perBatch)
      .start()
}
