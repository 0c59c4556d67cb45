package graft.sources

import graft.plans.LayerJob
import org.apache.spark.sql.functions._

/** Warping block reader (the WarpedVRT role of the reference,
  * `gfw_pixetl/tiles/raster_src_tile.py:188-210`): reads target-grid blocks
  * from source files whose grid does NOT match the output grid — different
  * origin and/or resolution, same CRS. Nearest-neighbor gather per target
  * pixel center (GDAL's default kernel); aggregate kernels compose with
  * `operators/Resample` when the ratio is an integer.
  *
  * Out-of-source-range target pixels become nodata — the reference's
  * empty-pad edge case (`tiles/utils/window_utils.py:119-127`).
  *
  * Scale: each task holds a small LRU of decoded source tiles, so a run of
  * adjacent target blocks re-reads nothing; source fetches are ranged
  * (tile-granular), matching the reference's windowed VSI reads.
  */
object WarpReader {

  /** A `LayerJob.BlockReader` gathering from arbitrary same-CRS sources.
    * Requires blockWork to carry the tile bounds (left/top) so target
    * blocks are geolocated. */
  def reader(targetXres: Double, targetYres: Double, blockSize: Int): LayerJob.BlockReader =
    blockWork => {
      val spark = blockWork.sparkSession
      import spark.implicits._
      blockWork
        .select(col("tile_id"), col("band"), col("file_band"),
          col("block_row"), col("block_col"),
          col("width"), col("height"), col("uri"), col("priority"),
          col("left"), col("top"))
        .as[(String, Int, Int, Int, Int, Int, Int, String, Int, Double, Double)]
        .mapPartitions { rows =>
          val open = scala.collection.mutable.Map.empty[String, GeoTiff.Tiff]
          // LRU of decoded source tiles: (uri, band, tr, tc) → pixels
          val cache = new java.util.LinkedHashMap[(String, Int, Int, Int), Array[Double]](
            64, 0.75f, true) {
            override def removeEldestEntry(
                e: java.util.Map.Entry[(String, Int, Int, Int), Array[Double]]): Boolean =
              size() > 48
          }
          rows.map { case (tileId, band, fileBand, br, bc, w, h, uri, priority, tileLeft, tileTop) =>
            val t = open.getOrElseUpdate(uri, GeoTiff.open(uri))
            val p = t.profile
            val nd = p.noData
            val out = new Array[Double](w * h)
            val valid = new Array[Boolean](w * h)
            // geo origin of this target block
            val bLeft = tileLeft + bc * blockSize * targetXres
            val bTop = tileTop - br * blockSize * targetYres
            var j = 0
            while (j < h) {
              val cy = bTop - (j + 0.5) * targetYres
              val sy = math.floor((p.originY - cy) / p.yres).toInt
              var i = 0
              while (i < w) {
                val cx = bLeft + (i + 0.5) * targetXres
                val sx = math.floor((cx - p.originX) / p.xres).toInt
                val idx = j * w + i
                if (sx >= 0 && sy >= 0 && sx < p.width && sy < p.height) {
                  val tr = sy / p.tileHeight; val tc = sx / p.tileWidth
                  val key = (uri, fileBand, tr, tc)
                  var tile = cache.get(key)
                  if (tile == null) {
                    tile = t.readTile(fileBand, tr, tc)
                    cache.put(key, tile)
                  }
                  val v = tile((sy % p.tileHeight) * p.tileWidth + (sx % p.tileWidth))
                  out(idx) = v
                  valid(idx) = nd.forall(_ != v)
                } else {
                  out(idx) = nd.getOrElse(0.0)
                  valid(idx) = false
                }
                i += 1
              }
              j += 1
            }
            (tileId, band, br, bc, w, h, uri, priority, out, valid)
          }
        }
        .toDF("tile_id", "band", "block_row", "block_col", "width", "height",
          "uri", "priority", "values", "valid")
    }
}
