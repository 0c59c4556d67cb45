package graft.streaming

import graft.SparkSpec
import graft.core.Tables
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** Structured Streaming surface: the same windowed aggregation the batch
  * engine runs (st1), driven incrementally with a watermark — proving the
  * per-tile/batch transforms carry over to streams (SURVEY §2.8). */
class StreamingSpec extends SparkSpec {

  test("streaming windowed agg over events == batch result") {
    val batch = Tables.events(spark, sf())
    // stage the events under an isolated dir so readStream sees one schema
    val dir = new java.io.File("target/tmp/stream_events").getAbsolutePath
    batch.write.mode("overwrite").parquet(dir)

    val stream = spark.readStream
      .schema(batch.schema)
      .parquet(dir)
      .withWatermark("ts", "1 hour")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"))

    val q = stream.writeStream
      .outputMode("complete")
      .format("memory")
      .queryName("st_events")
      .trigger(Trigger.AvailableNow())
      .start()
    q.processAllAvailable()
    q.stop()

    val streamed = spark.table("st_events")
      .select(col("window.start").as("hour"), col("event_type"), col("n"))
    val expected = batch
      .groupBy(date_trunc("hour", col("ts")).as("hour"), col("event_type"))
      .agg(count(lit(1)).as("n"))
    assert(streamed.count() > 0)
    assert(streamed.exceptAll(expected).isEmpty && expected.exceptAll(streamed).isEmpty)
  }
}
