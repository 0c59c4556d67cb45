package graft.operators

import graft.core.grid.Grid
import graft.functions.GeoFunctions
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.locationtech.jts.geom.{Envelope, Geometry}

/** Rasterization as aggregation (operators A1/A2 + generator G1).
  *
  * The reference shells out to `gdal_rasterize` with two burn modes
  * (`gfw_pixetl/tiles/vector_src_tile.py:158-212`, enum
  * `models/enums.py:9-11`):
  *   - count: `-burn 1 -add`  → pixel value = COUNT of covering features
  *   - value: `-a field` after `ORDER BY field` → last write wins, i.e.
  *     pixel value = max/min of the field over covering features.
  *
  * Spark-first re-expression: explode each feature into the pixels it
  * covers (a generator UDF doing JTS point-in-polygon over the feature's
  * snapped envelope — the scanline), then ONE hash aggregate per
  * (tile, px, py). The write-order dependence of the reference becomes a
  * deterministic `max`/`min` — documented improvement (SURVEY §7.4.5).
  *
  * Scale: the explode emits one row per covered pixel per feature — for
  * vector layers this is the data volume the job fundamentally must touch
  * (same pixels gdal_rasterize burns), and it partitions by tile so the
  * aggregate shuffles pixel rows once, map-side combined.
  */
object Rasterize {

  /** Pixels of `grid`-resolution lattice covered by a WKB geometry, as
    * (px, py) global pixel indices. Pixel centers decide coverage (GDAL
    * default ALL_TOUCHED=FALSE). */
  def pixelCover(wkb: Array[Byte], originX: Double, originY: Double,
                 xres: Double, yres: Double): Seq[(Int, Int)] = {
    val g = GeoFunctions.read(wkb)
    val env = g.getEnvelopeInternal
    val pf = g.getFactory
    // snap envelope to the pixel lattice
    val px0 = math.floor((env.getMinX - originX) / xres).toInt
    val px1 = math.ceil((env.getMaxX - originX) / xres).toInt
    val py0 = math.floor((originY - env.getMaxY) / yres).toInt
    val py1 = math.ceil((originY - env.getMinY) / yres).toInt
    val prepared = org.locationtech.jts.geom.prep.PreparedGeometryFactory.prepare(g)
    val out = Seq.newBuilder[(Int, Int)]
    var py = py0
    while (py < py1) {
      val cy = originY - (py + 0.5) * yres
      var px = px0
      while (px < px1) {
        val cx = originX + (px + 0.5) * xres
        if (prepared.covers(pf.createPoint(new org.locationtech.jts.geom.Coordinate(cx, cy))))
          out += ((px, py))
        px += 1
      }
      py += 1
    }
    out.result()
  }

  /** Lazy scanline iterator over the pixels a geometry covers — NEVER
    * materializes the full cover (a continent-sized feature at a fine zoom
    * covers 10⁸+ pixels; an eager Seq OOMs the task, found the hard way).
    * `rowLo`/`rowHi` optionally restrict to a band of pixel rows (the
    * parallel-banding path of [[explodeToPixels]]). */
  def pixelCoverIterator(wkb: Array[Byte], originX: Double, originY: Double,
                         xres: Double, yres: Double,
                         rowLo: Int = Int.MinValue,
                         rowHi: Int = Int.MaxValue): Iterator[(Int, Int)] = {
    val g = GeoFunctions.read(wkb)
    val env = g.getEnvelopeInternal
    val pf = g.getFactory
    val px0 = math.floor((env.getMinX - originX) / xres).toInt
    val px1 = math.ceil((env.getMaxX - originX) / xres).toInt
    val py0 = math.max(math.floor((originY - env.getMaxY) / yres).toInt, rowLo)
    val py1 = math.min(math.ceil((originY - env.getMinY) / yres).toInt, rowHi)
    val prepared = org.locationtech.jts.geom.prep.PreparedGeometryFactory.prepare(g)
    for {
      py <- Iterator.range(py0, py1)
      cy = originY - (py + 0.5) * yres
      px <- Iterator.range(px0, px1)
      cx = originX + (px + 0.5) * xres
      if prepared.covers(pf.createPoint(new org.locationtech.jts.geom.Coordinate(cx, cy)))
    } yield (px, py)
  }

  /** features(geom: binary WKB, value: long) → pixels(px, py, value).
    * One generator row per covered pixel, streamed via a typed flatMap so
    * task memory stays constant regardless of feature size.
    *
    * Skew: a single feature's scanline is serial, so one tile-spanning
    * polygon at a fine grid would rasterize 10⁹ pixels in ONE task. Each
    * feature is first split into `rowBand`-row bands (cheap — envelope
    * math only), the bands round-robin across the cluster, and each task
    * scans only its band — the standard salt-the-generator shape. The
    * extra shuffle moves (wkb × nBands) geometry rows, which is noise next
    * to the pixel volume the burn must touch anyway. */
  def explodeToPixels(features: DataFrame, originX: Double, originY: Double,
                      xres: Double, yres: Double, rowBand: Int = 2048): DataFrame = {
    val spark = features.sparkSession
    import spark.implicits._
    features.select(col("geom"), col("value").cast("long").as("value"))
      .as[(Array[Byte], Long)]
      .flatMap { case (wkb, value) =>
        val env = GeoFunctions.read(wkb).getEnvelopeInternal
        val py0 = math.floor((originY - env.getMaxY) / yres).toInt
        val py1 = math.ceil((originY - env.getMinY) / yres).toInt
        Iterator.range(py0, math.max(py1, py0 + 1), rowBand)
          .map(b => (wkb, value, b, math.min(b + rowBand, py1)))
      }
      .repartition(graft.core.Partitions.sessionParallelism(spark))
      .flatMap { case (wkb, value, b0, b1) =>
        pixelCoverIterator(wkb, originX, originY, xres, yres, rowLo = b0, rowHi = b1)
          .map { case (px, py) => (px, py, value) }
      }
      .toDF("px", "py", "value")
  }

  /** Burn mode `count` (A1): pixel = number of covering features. */
  def rasterizeCount(pixels: DataFrame): DataFrame =
    pixels.groupBy("px", "py").agg(count(lit(1)).as("value"))

  /** Burn mode `value` (A2): deterministic replacement for ordered burn —
    * ORDER BY asc + last-write-wins ≡ max(field); desc ≡ min(field)
    * (`vector_src_tile.py:67-74,142-147`). */
  def rasterizeValue(pixels: DataFrame, ascending: Boolean): DataFrame =
    pixels.groupBy("px", "py").agg(
      (if (ascending) max(col("value")) else min(col("value"))).as("value"))
}
