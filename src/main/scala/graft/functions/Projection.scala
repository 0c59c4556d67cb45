package graft.functions

import graft.core.grid.Bounds

/** Closed-form projection registry (operator P5 beyond the grid CRSs).
  *
  * The reference hands arbitrary source CRSs to pyproj
  * (`gfw_pixetl/sources.py:137-168`); this engine ships the projections its
  * rasters actually arrive in, with no external proj database:
  *
  *  - EPSG:4326 (identity in degrees)
  *  - EPSG:3857 (spherical WebMercator, `Reproject`)
  *  - EPSG:32601–32660 / 32701–32760 (WGS84 UTM north/south) via the
  *    ellipsoidal Transverse Mercator series (Snyder, *Map Projections — A
  *    Working Manual*, USGS PP 1395, eqs. 8-9…8-25) — mm-accurate inside a
  *    zone, sub-meter several zones out.
  *
  * `forward` takes (lng, lat) degrees → projected (x, y); `inverse` the
  * reverse. Inputs clamp to the projection's area of use, the reference's
  * inf/NaN clamp (`utils/utils.py:164-184`, `type_casting.py:28-33`).
  */
trait Projection {
  def forward(lng: Double, lat: Double): (Double, Double)
  def inverse(x: Double, y: Double): (Double, Double)
  /** Area of use in 4326 degrees — inputs clamp to it. */
  def areaOfUse: Bounds
}

object Projection {

  /** Resolve a normalized CRS string ("EPSG:n"). */
  def forCrs(crs: String): Option[Projection] =
    crs.stripPrefix("EPSG:").toIntOption.flatMap(forEpsg)

  def forEpsg(epsg: Int): Option[Projection] = epsg match {
    case 4326 => Some(Wgs84)
    case 3857 => Some(WebMercator)
    case z if z >= 32601 && z <= 32660 => Some(TransverseMercator.utm(z - 32600, north = true))
    case z if z >= 32701 && z <= 32760 => Some(TransverseMercator.utm(z - 32700, north = false))
    case _ => None
  }

  case object Wgs84 extends Projection {
    def forward(lng: Double, lat: Double): (Double, Double) = (lng, lat)
    def inverse(x: Double, y: Double): (Double, Double) = (x, y)
    val areaOfUse: Bounds = Bounds(-180, -90, 180, 90)
  }

  case object WebMercator extends Projection {
    def forward(lng: Double, lat: Double): (Double, Double) = Reproject.toWebMercator(lng, lat)
    def inverse(x: Double, y: Double): (Double, Double) = Reproject.toWgs84(x, y)
    val areaOfUse: Bounds = Bounds(-180, -Reproject.maxLat, 180, Reproject.maxLat)
  }

  /** WGS84 ellipsoidal Transverse Mercator (Snyder PP 1395 §8). */
  final case class TransverseMercator(lon0Deg: Double, k0: Double,
                                      falseEasting: Double, falseNorthing: Double,
                                      areaOfUse: Bounds) extends Projection {
    private val a = 6378137.0
    private val f = 1.0 / 298.257223563
    private val e2 = f * (2 - f)
    private val e4 = e2 * e2
    private val e6 = e4 * e2
    private val ep2 = e2 / (1 - e2)
    private val lon0 = math.toRadians(lon0Deg)

    // meridional arc M(φ), Snyder eq. 3-21
    private def arc(phi: Double): Double =
      a * ((1 - e2 / 4 - 3 * e4 / 64 - 5 * e6 / 256) * phi
        - (3 * e2 / 8 + 3 * e4 / 32 + 45 * e6 / 1024) * math.sin(2 * phi)
        + (15 * e4 / 256 + 45 * e6 / 1024) * math.sin(4 * phi)
        - (35 * e6 / 3072) * math.sin(6 * phi))

    def forward(lngDeg: Double, latDeg: Double): (Double, Double) = {
      // clamp only the polar singularity (tan φ → ∞), NOT the official
      // zone band: north-zone rasters legitimately dip below the equator
      val lat = math.max(-84.0, math.min(84.0, latDeg))
      val phi = math.toRadians(lat)
      val lam = math.toRadians(lngDeg)
      val sinP = math.sin(phi); val cosP = math.cos(phi); val tanP = math.tan(phi)
      val n = a / math.sqrt(1 - e2 * sinP * sinP)
      val t = tanP * tanP
      val c = ep2 * cosP * cosP
      val bigA = cosP * {
        // wrap Δλ to (-π, π] so zone-adjacent longitudes stay continuous
        var d = lam - lon0
        while (d > math.Pi) d -= 2 * math.Pi
        while (d < -math.Pi) d += 2 * math.Pi
        d
      }
      val x = falseEasting + k0 * n * (bigA
        + (1 - t + c) * math.pow(bigA, 3) / 6
        + (5 - 18 * t + t * t + 72 * c - 58 * ep2) * math.pow(bigA, 5) / 120)
      val y = falseNorthing + k0 * (arc(phi)
        + n * tanP * (bigA * bigA / 2
          + (5 - t + 9 * c + 4 * c * c) * math.pow(bigA, 4) / 24
          + (61 - 58 * t + t * t + 600 * c - 330 * ep2) * math.pow(bigA, 6) / 720))
      (x, y)
    }

    def inverse(x: Double, y: Double): (Double, Double) = {
      val m = (y - falseNorthing) / k0
      val mu = m / (a * (1 - e2 / 4 - 3 * e4 / 64 - 5 * e6 / 256))
      val e1 = (1 - math.sqrt(1 - e2)) / (1 + math.sqrt(1 - e2))
      val phi1 = (mu
        + (3 * e1 / 2 - 27 * math.pow(e1, 3) / 32) * math.sin(2 * mu)
        + (21 * e1 * e1 / 16 - 55 * math.pow(e1, 4) / 32) * math.sin(4 * mu)
        + (151 * math.pow(e1, 3) / 96) * math.sin(6 * mu)
        + (1097 * math.pow(e1, 4) / 512) * math.sin(8 * mu))
      val sinP = math.sin(phi1); val cosP = math.cos(phi1); val tanP = math.tan(phi1)
      val c1 = ep2 * cosP * cosP
      val t1 = tanP * tanP
      val n1 = a / math.sqrt(1 - e2 * sinP * sinP)
      val r1 = a * (1 - e2) / math.pow(1 - e2 * sinP * sinP, 1.5)
      val d = (x - falseEasting) / (n1 * k0)
      val phi = phi1 - (n1 * tanP / r1) * (d * d / 2
        - (5 + 3 * t1 + 10 * c1 - 4 * c1 * c1 - 9 * ep2) * math.pow(d, 4) / 24
        + (61 + 90 * t1 + 298 * c1 + 45 * t1 * t1 - 252 * ep2 - 3 * c1 * c1)
          * math.pow(d, 6) / 720)
      val lam = lon0 + (d - (1 + 2 * t1 + c1) * math.pow(d, 3) / 6
        + (5 - 2 * c1 + 28 * t1 - 3 * c1 * c1 + 8 * ep2 + 24 * t1 * t1)
          * math.pow(d, 5) / 120) / cosP
      (math.toDegrees(lam), math.toDegrees(phi))
    }
  }

  object TransverseMercator {
    /** UTM zone 1–60: central meridian -183 + 6·zone, k0 0.9996, FE 500 km,
      * FN 0 (north) / 10 000 km (south); area of use is the UTM lat band. */
    def utm(zone: Int, north: Boolean): TransverseMercator = {
      require(zone >= 1 && zone <= 60, s"UTM zone $zone")
      val lon0 = -183.0 + 6.0 * zone
      TransverseMercator(lon0, 0.9996, 500000.0, if (north) 0.0 else 10000000.0,
        if (north) Bounds(lon0 - 3, 0, lon0 + 3, 84) else Bounds(lon0 - 3, -80, lon0 + 3, 0))
    }
  }
}
