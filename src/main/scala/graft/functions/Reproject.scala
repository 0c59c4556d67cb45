package graft.functions

import graft.core.grid.Bounds

/** CRS reprojection of bounds/points (operator P5) as closed-form math
  * (`gfw_pixetl/sources.py:137-168`, `utils/utils.py:164-184`): no proj
  * database needed. The grid CRSs (EPSG:4326 ↔ EPSG:3857) are first-class;
  * arbitrary source CRSs dispatch through the [[Projection]] registry
  * (WGS84 UTM zones via ellipsoidal Transverse Mercator), pivoting through
  * 4326. Out-of-range latitudes clamp to each projection's area of use
  * like the reference's inf/NaN clamp (`type_casting.py:28-33`).
  */
object Reproject {

  val earthRadius: Double = 6378137.0
  val webMercatorMax: Double = 20037508.342789244
  /** WebMercator's latitude of validity (wm_grid.py:113-117). */
  val maxLat: Double = 85.05112878

  def toWebMercator(lng: Double, lat: Double): (Double, Double) = {
    val clampedLat = math.max(-maxLat, math.min(maxLat, lat))
    val clampedLng = math.max(-180.0, math.min(180.0, lng))
    val x = clampedLng * webMercatorMax / 180.0
    val y = earthRadius * math.log(math.tan(math.Pi / 4 + math.toRadians(clampedLat) / 2))
    (x, math.max(-webMercatorMax, math.min(webMercatorMax, y)))
  }

  def toWgs84(x: Double, y: Double): (Double, Double) = {
    val lng = x / webMercatorMax * 180.0
    val lat = math.toDegrees(2 * math.atan(math.exp(y / earthRadius)) - math.Pi / 2)
    (lng, lat)
  }

  /** Transform bounds between CRSs, axis-separate like the reference's
    * exotic-projection path (`utils/utils.py:164-184`). Known pairs go
    * closed-form; anything else pivots through 4326 via the registry. */
  def bounds(b: Bounds, fromCrs: String, toCrs: String): Bounds =
    (normalize(fromCrs), normalize(toCrs)) match {
      case (f, t) if f == t => b
      case ("EPSG:4326", "EPSG:3857") =>
        val (l, bo) = toWebMercator(b.left, b.bottom)
        val (r, t) = toWebMercator(b.right, b.top)
        Bounds(l, bo, r, t)
      case ("EPSG:3857", "EPSG:4326") =>
        val (l, bo) = toWgs84(b.left, b.bottom)
        val (r, t) = toWgs84(b.right, b.top)
        Bounds(l, bo, r, t)
      case (f, t) =>
        val tf = pointTransform(f, t)
        val (l, bo) = tf(b.left, b.bottom)
        val (r, tp) = tf(b.right, b.top)
        Bounds(l, bo, r, tp)
    }

  /** Normalized (from, to) pair for dispatching transforms. */
  def normalizedPair(from: String, to: String): (String, String) =
    (normalize(from), normalize(to))

  /** Point transform for the warp gather (the per-target-pixel inverse
    * projection of rasterio's WarpedVRT, `tiles/raster_src_tile.py:188-210`).
    * Identity when CRSs agree; closed-form between the two grid CRSs;
    * anything the registry knows (UTM zones) pivots through 4326. */
  def pointTransform(from: String, to: String): (Double, Double) => (Double, Double) =
    normalizedPair(from, to) match {
      case (f, t) if f == t            => (x, y) => (x, y)
      case ("EPSG:3857", "EPSG:4326")  => toWgs84
      case ("EPSG:4326", "EPSG:3857")  => toWebMercator
      case (f, t) =>
        (Projection.forCrs(f), Projection.forCrs(t)) match {
          case (Some(pf), Some(pt)) => (x, y) => {
            val (lng, lat) = pf.inverse(x, y)
            pt.forward(lng, lat)
          }
          case _ => throw new IllegalArgumentException(s"Unsupported CRS pair $f → $t")
        }
    }

  import org.apache.spark.sql.Column
  import org.apache.spark.sql.functions._

  /** Column forms of the inverse WebMercator transform — the same math the
    * warp gather runs per pixel, kept as Catalyst expressions so oracle
    * queries (and any DataFrame-level warp) stay whole-stage-codegen'd. */
  def invMercatorLng(x: Column): Column = x / webMercatorMax * 180.0

  def invMercatorLat(y: Column): Column =
    degrees(atan(exp(y / earthRadius)) * 2 - math.Pi / 2)

  private def normalize(crs: String): String = crs.trim.toUpperCase match {
    case "EPSG:4326" | "WGS84" => "EPSG:4326"
    case "EPSG:3857" | "WEBMERCATOR" | "EPSG:900913" => "EPSG:3857"
    case other => other
  }
}
