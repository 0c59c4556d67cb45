package graft.sources

import graft.SparkSpec
import graft.core.LayerSpec
import graft.plans.LayerJob
import java.nio.file.{Files, Paths}
import org.apache.spark.sql.functions._

/** Warp reader: sources at a different resolution / partial coverage are
  * gathered onto the output grid; out-of-range pixels pad with nodata
  * (window_utils.py:119-127). */
class WarpReaderSpec extends SparkSpec {

  private val spec = LayerSpec(
    dataset = "d", version = "v1", sourceType = "raster", pixelMeaning = "x",
    dataType = "uint16", grid = "90/1008",
    sourceUri = Some(Seq("unused")), noData = Some(Seq(0.0)))
  private val grid = spec.gridDef

  private def dir(): String = {
    val d = Paths.get("target/tmp/warp")
    Files.createDirectories(d)
    d.toString
  }

  /** Source at 2× finer resolution than the target grid, covering only the
    * WEST HALF of tile 90N_180W; value = source column index (mod 30000). */
  private def writeFineSource(): String = {
    val path = s"${dir()}/fine.tif"
    val cols = 1008 // 1008 px at half the tile extent → 2x resolution
    val p = GeoTiff.Profile(
      width = cols, height = cols, bands = 1, dataType = "uint16",
      tileWidth = 336, tileHeight = 336, noData = Some(0.0), epsg = 4326,
      originX = -180.0, originY = 90.0, xres = 45.0 / cols, yres = 45.0 / cols)
    val w = new GeoTiff.Writer(path, p)
    for (tr <- 0 until 3; tc <- 0 until 3) {
      val px = Array.tabulate(336 * 336) { i =>
        val gx = tc * 336 + (i % 336)
        (gx % 30000 + 1).toDouble
      }
      w.writeTile(1, tr, tc, px)
    }
    w.close()
    path
  }

  test("nearest gather from a finer source + nodata pad outside coverage") {
    val src = writeFineSource()
    val catalog = GeoTiffSpark.harvestCatalog(spark, Seq(src))
      .selectExpr("uri", "band", "footprint")
    val reader = WarpReader.reader(grid.xres, grid.yres, grid.blockSize)
    val result = LayerJob.run(spark, spec, catalog, reader)
    val blocks = result.blocks.filter(col("tile_id") === "90N_180W").cache()
    assert(blocks.count() == 9)

    // top-left block: target pixel i maps to source column 2i+1 → value 2i+2
    val row0 = blocks.filter(col("block_row") === 0 && col("block_col") === 0)
      .select(col("band_1")).collect()(0).getSeq[Int](0)
    assert(row0(0) == 2, s"got ${row0(0)}")
    assert(row0(1) == 4)
    assert(row0(10) == 22)

    // eastern blocks (beyond 45° of coverage) are nodata-filled
    val east = blocks.filter(col("block_col") === 2)
      .select(explode(col("band_1")).as("v")).groupBy("v").count().collect()
    assert(east.length == 1 && east(0).getInt(0) == 0)
  }

  test("per-partition tile cache keeps re-decoding bounded (same values twice)") {
    val src = s"${dir()}/fine.tif"
    val catalog = GeoTiffSpark.harvestCatalog(spark, Seq(src))
      .selectExpr("uri", "band", "footprint")
    val reader = WarpReader.reader(grid.xres, grid.yres, grid.blockSize)
    val r1 = LayerJob.run(spark, spec, catalog, reader).blocks
      .agg(sum(expr("aggregate(band_1, 0L, (a, x) -> a + x)"))).collect()(0).getLong(0)
    val r2 = LayerJob.run(spark, spec, catalog, reader).blocks
      .agg(sum(expr("aggregate(band_1, 0L, (a, x) -> a + x)"))).collect()(0).getLong(0)
    assert(r1 == r2 && r1 > 0)
  }
}
