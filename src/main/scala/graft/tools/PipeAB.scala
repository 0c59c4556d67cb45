package graft.tools

import graft.core.LayerSpec
import graft.operators.Raster
import graft.plans.LayerJob
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** TEMPORARY drift-bisect harness (VERDICT r16 #2): replicates the bench's
  * layer_pipeline_199mpx with the two exec actions timed separately. Not
  * part of the driver contract; removed once the drift is pinned. */
object PipeAB {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.optimizer.canChangeCachedPlanOutputPartitioning", "true")
      .config("spark.sql.adaptive.advisoryPartitionSizeInBytes", "8m")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val spec = LayerSpec(dataset = "bench", version = "v1", sourceType = "raster",
      pixelMeaning = "x", dataType = "uint16", calc = Some("A * 2 + 1"),
      grid = "90/9984", sourceUri = Some(Seq("mem")), noData = Some(Seq(0.0)))
    val catalog = {
      import spark.implicits._
      Seq(("mem://bench.tif", 1,
        graft.functions.GeoFunctions.write(
          graft.functions.GeoFunctions.envelope(-180, -90, 0, 90))))
        .toDF("uri", "band", "footprint")
    }
    val reader: LayerJob.BlockReader = b => Raster.synthesizeBand(b.drop("band"), band = 1)
    for (i <- 1 to 4) {
      val t0 = System.nanoTime()
      val r = LayerJob.run(spark, spec, catalog, reader,
        subset = Some(Seq("90N_180W", "90N_090W")))
      val t1 = System.nanoTime()
      r.blocks.agg(sum(size(col("band_1")))).collect()
      val t2 = System.nanoTime()
      r.tileStats.agg(sum(col("n") + col("stat_min") + col("stat_max"))).collect()
      val t3 = System.nanoTime()
      println(f"iter $i build ${(t1 - t0) / 1e9}%.3f blocks ${(t2 - t1) / 1e9}%.3f stats ${(t3 - t2) / 1e9}%.3f")
    }
    spark.stop()
  }
}
