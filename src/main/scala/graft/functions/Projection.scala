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
  *  - a well-known-CRS parameter table (ellipsoid + family + published
  *    EPSG parameters) for the national grids rasters actually arrive in:
  *    OSGB 27700 (Airy TM + Helmert datum shift), NZTM 2193, LAEA Europe
  *    3035, and the ETRS89/NAD83/GDA UTM zone ranges — so an
  *    unlisted-but-well-known code transforms instead of rejecting, and
  *    only truly unknown codes fail loudly.
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

  /** Resolve a normalized CRS string: "EPSG:n", a classic `+proj=…`
    * parameter string ([[Proj4]] — the arbitrary-CRS leg), plus the
    * non-EPSG authorities real rasters arrive in (MODIS sinusoidal has no
    * EPSG code — it circulates as SR-ORG:6974 / "MODIS"). */
  def forCrs(crs: String): Option[Projection] =
    if (crs.trim.startsWith("+")) Proj4.parse(crs)
    else crs.trim.toUpperCase match {
      case "SR-ORG:6974" | "MODIS" | "SINUSOIDAL" => Some(Sinusoidal.Modis)
      case "ESRI:54008" => Some(Sinusoidal.World)
      case c => c.stripPrefix("EPSG:").toIntOption.flatMap(forEpsg)
    }

  private val grs80InvF = 298.257222101

  def forEpsg(epsg: Int): Option[Projection] = epsg match {
    case 4326 => Some(Wgs84)
    case 3857 => Some(WebMercator)
    case 5070 => Some(AlbersEqualArea.conus)
    case 3577 => Some(AlbersEqualArea.australia)
    case 3031 => Some(PolarStereographic.antarctic)
    case 3413 => Some(PolarStereographic.nsidcArctic)
    case 3976 => Some(PolarStereographic.nsidcAntarctic)
    case 2154 => Some(LambertConformalConic.lambert93)
    case 3347 => Some(LambertConformalConic.canada)
    case z if z >= 32601 && z <= 32660 => Some(TransverseMercator.utm(z - 32600, north = true))
    case z if z >= 32701 && z <= 32760 => Some(TransverseMercator.utm(z - 32700, north = false))
    // ---- well-known-CRS parameter table (P5 fallback): national grids
    // resolved from published EPSG parameters (ellipsoid + family + origin),
    // so an unlisted-but-well-known code transforms instead of rejecting.
    // Truly unknown codes still fail loudly at the Reproject layer.
    case 27700 => Some(DatumShifted( // OSGB36 / British National Grid
      TransverseMercator(6377563.396, 299.3249646, // Airy 1830
        49.0, -2.0, 0.9996012717, 400000.0, -100000.0, Bounds(-9, 49, 2, 61)),
      6377563.396, 299.3249646,
      // WGS84→OSGB36: the published OSTN-free Helmert set (≈3.5 m)
      Helmert(-446.448, 125.157, -542.060, -0.1502, -0.2470, -0.8421, 20.4894)))
    case 2193 => Some(TransverseMercator( // NZGD2000 / NZTM2000 (GRS80)
      6378137.0, grs80InvF, 0.0, 173.0, 0.9996, 1600000.0, 10000000.0,
      Bounds(166.0, -47.4, 178.7, -34.0)))
    case 3035 => Some(LambertAzimuthalEqualArea( // ETRS89-extended / LAEA Europe
      6378137.0, grs80InvF, 52.0, 10.0, 4321000.0, 3210000.0,
      Bounds(-16.1, 32.88, 40.18, 84.73)))
    case z if z >= 25828 && z <= 25838 => // ETRS89 / UTM 28N–38N (GRS80)
      Some(TransverseMercator.utm(z - 25800, north = true, 6378137.0, grs80InvF))
    case z if z >= 26901 && z <= 26923 => // NAD83 / UTM 1N–23N (GRS80)
      Some(TransverseMercator.utm(z - 26900, north = true, 6378137.0, grs80InvF))
    case z if z >= 28348 && z <= 28358 => // GDA94 / MGA 48–58 (GRS80, south)
      Some(TransverseMercator.utm(z - 28300, north = false, 6378137.0, grs80InvF))
    case z if z >= 7846 && z <= 7859 => // GDA2020 / MGA 46–59 (GRS80, south)
      Some(TransverseMercator.utm(z - 7800, north = false, 6378137.0, grs80InvF))
    case 4088 => Some(Equirectangular.WorldSphere) // World Equidistant Cylindrical (Sphere)
    // Plate Carrée as classic PROJ.4 resolved it: spherical on the WGS84
    // semi-major (the modern ellipsoidal variant is EPSG:4087, PROJ ≥ 6)
    case 32662 => Some(Equirectangular.PlateCarree)
    // modern geographic datums coincident with WGS84 at the sub-meter
    // working accuracy of this registry (NAD83, ETRS89, GDA94, NZGD2000,
    // GDA2020 geographic axes)
    case 4269 | 4258 | 4283 | 4167 | 7844 => Some(Wgs84)
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

  /** Ellipsoidal Transverse Mercator (Snyder PP 1395 §8), parameterized
    * over the ellipsoid and latitude of origin — the one TM covers UTM
    * (WGS84/GRS80, φ0 = 0), OSGB (Airy 1830, φ0 = 49) and the other
    * national grids in the well-known-CRS table. */
  final case class TransverseMercator(a: Double, invF: Double,
                                      lat0Deg: Double, lon0Deg: Double, k0: Double,
                                      falseEasting: Double, falseNorthing: Double,
                                      areaOfUse: Bounds) extends Projection {
    private val f = 1.0 / invF
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

    // M(φ0): grids with a non-equatorial origin (OSGB) measure northings
    // from it — y = FN + k0·(M(φ) − M(φ0)), Snyder eq. 8-9
    private val m0 = arc(math.toRadians(lat0Deg))

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
      val y = falseNorthing + k0 * (arc(phi) - m0
        + n * tanP * (bigA * bigA / 2
          + (5 - t + 9 * c + 4 * c * c) * math.pow(bigA, 4) / 24
          + (61 - 58 * t + t * t + 600 * c - 330 * ep2) * math.pow(bigA, 6) / 720))
      (x, y)
    }

    def inverse(x: Double, y: Double): (Double, Double) = {
      val m = m0 + (y - falseNorthing) / k0
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
    def utm(zone: Int, north: Boolean): TransverseMercator =
      utm(zone, north, 6378137.0, 298.257223563)

    /** UTM on an explicit ellipsoid — GRS80 for the NAD83 / ETRS89 /
      * GDA94 / GDA2020 zone families in the well-known-CRS table. */
    def utm(zone: Int, north: Boolean, a: Double, invF: Double): TransverseMercator = {
      require(zone >= 1 && zone <= 60, s"UTM zone $zone")
      val lon0 = -183.0 + 6.0 * zone
      TransverseMercator(a, invF, 0.0, lon0, 0.9996, 500000.0,
        if (north) 0.0 else 10000000.0,
        if (north) Bounds(lon0 - 3, 0, lon0 + 3, 84) else Bounds(lon0 - 3, -80, lon0 + 3, 0))
    }
  }

  /** Ellipsoidal Albers Equal-Area Conic (Snyder PP 1395 §14,
    * eqs. 14-1…14-21 forward, 14-19…14-21 + 3-16 inverse) — the family
    * continental-mosaic rasters arrive in (NAD83 CONUS, GDA94 Australia).
    * Equal-area is the load-bearing property: zonal sums over reprojected
    * pixels stay area-true. `invF` selects the ellipsoid (GRS80 for both
    * registered instances; NAD83/GDA94 ≈ WGS84 at sub-meter, the standard
    * working assumption without a datum-shift grid). */
  final case class AlbersEqualArea(a: Double, invF: Double,
                                   lat0Deg: Double, lon0Deg: Double,
                                   sp1Deg: Double, sp2Deg: Double,
                                   falseEasting: Double, falseNorthing: Double,
                                   areaOfUse: Bounds) extends Projection {
    private val f = 1.0 / invF
    private val e2 = f * (2 - f)
    private val e = math.sqrt(e2)
    private val lon0 = math.toRadians(lon0Deg)

    /** Snyder eq. 3-12: q(φ), the equal-area auxiliary. */
    private def q(phi: Double): Double = {
      val s = math.sin(phi)
      (1 - e2) * (s / (1 - e2 * s * s)
        - (1 / (2 * e)) * math.log((1 - e * s) / (1 + e * s)))
    }
    /** Snyder eq. 14-15: m(φ) = cos φ / √(1 − e² sin² φ). */
    private def m(phi: Double): Double = {
      val s = math.sin(phi)
      math.cos(phi) / math.sqrt(1 - e2 * s * s)
    }

    private val m1 = m(math.toRadians(sp1Deg))
    private val m2 = m(math.toRadians(sp2Deg))
    private val q1 = q(math.toRadians(sp1Deg))
    private val q2 = q(math.toRadians(sp2Deg))
    private val n =
      if (math.abs(sp1Deg - sp2Deg) < 1e-12) math.sin(math.toRadians(sp1Deg))
      else (m1 * m1 - m2 * m2) / (q2 - q1) // eq. 14-14
    private val bigC = m1 * m1 + n * q1 // eq. 14-13
    private val rho0 = a * math.sqrt(bigC - n * q(math.toRadians(lat0Deg))) / n
    private val qPole = q(math.Pi / 2)

    private def rho(qv: Double): Double =
      a * math.sqrt(math.max(0.0, bigC - n * qv)) / n // eq. 14-12

    def forward(lngDeg: Double, latDeg: Double): (Double, Double) = {
      val lat = math.max(-90.0, math.min(90.0, latDeg)) // inf/NaN clamp
      val phi = math.toRadians(lat)
      var dLam = math.toRadians(lngDeg) - lon0
      while (dLam > math.Pi) dLam -= 2 * math.Pi
      while (dLam < -math.Pi) dLam += 2 * math.Pi
      val theta = n * dLam // eq. 14-4
      val r = rho(q(phi))
      (falseEasting + r * math.sin(theta),
        falseNorthing + rho0 - r * math.cos(theta))
    }

    def inverse(x: Double, y: Double): (Double, Double) = {
      val xp = x - falseEasting
      val yp = rho0 - (y - falseNorthing)
      // for n < 0 (southern-parallel cones) ρ and the sector flip sign
      val sign = if (n >= 0) 1.0 else -1.0
      val r = sign * math.hypot(xp, yp)
      val theta = math.atan2(sign * xp, sign * yp)
      val qv = (bigC - r * r * n * n / (a * a)) / n // eq. 14-19
      val lam = lon0 + theta / n // eq. 14-9
      if (math.abs(math.abs(qv) - math.abs(qPole)) < 1e-12)
        return (math.toDegrees(lam), math.signum(qv) * 90.0)
      // eq. 3-16: iterate φ from the equal-area auxiliary
      var phi = math.asin(math.max(-1.0, math.min(1.0, qv / 2)))
      var i = 0
      while (i < 15) {
        val s = math.sin(phi)
        val c = math.cos(phi)
        val e2s = 1 - e2 * s * s
        val delta = (e2s * e2s / (2 * c)) * (qv / (1 - e2) - s / e2s
          + (1 / (2 * e)) * math.log((1 - e * s) / (1 + e * s)))
        phi += delta
        if (math.abs(delta) < 1e-14) i = 15 else i += 1
      }
      (math.toDegrees(lam), math.toDegrees(phi))
    }
  }

  object AlbersEqualArea {
    private val grs80InvF = 298.257222101
    /** EPSG:5070 — NAD83 / Conus Albers: φ0 23, λ0 −96, parallels 29.5 and
      * 45.5, FE/FN 0, GRS80. */
    def conus: AlbersEqualArea =
      AlbersEqualArea(6378137.0, grs80InvF, 23.0, -96.0, 29.5, 45.5, 0.0, 0.0,
        Bounds(-125.0, 24.0, -66.0, 50.0))
    /** EPSG:3577 — GDA94 / Australian Albers: φ0 0, λ0 132, parallels −18
      * and −36, FE/FN 0, GRS80. */
    def australia: AlbersEqualArea =
      AlbersEqualArea(6378137.0, grs80InvF, 0.0, 132.0, -18.0, -36.0, 0.0, 0.0,
        Bounds(112.0, -44.0, 154.0, -9.0))
  }

  /** Shared conformal machinery (Snyder PP 1395 §3): the isometric
    * auxiliary t(φ) both conformal conic/azimuthal families project
    * through, and the closed series recovering φ from the conformal
    * latitude χ (eq. 3-5) — no per-point iteration on the inverse. */
  private[functions] trait ConformalMath {
    def a: Double
    def invF: Double
    protected lazy val e2: Double = { val f = 1.0 / invF; f * (2 - f) }
    protected lazy val e: Double = math.sqrt(e2)

    /** Snyder eq. 15-9 / 21-33: t(φ) = tan(π/4 − φ/2) · [(1+e sinφ)/(1−e sinφ)]^(e/2). */
    protected def tConf(phi: Double): Double = {
      val s = math.sin(phi)
      math.tan(math.Pi / 4 - phi / 2) /
        math.pow((1 - e * s) / (1 + e * s), e / 2)
    }

    /** Snyder eq. 14-15: m(φ) = cos φ / √(1 − e² sin² φ). */
    protected def mAux(phi: Double): Double = {
      val s = math.sin(phi)
      math.cos(phi) / math.sqrt(1 - e2 * s * s)
    }

    /** Snyder eq. 3-5: φ from the conformal latitude χ. */
    protected def phiFromChi(chi: Double): Double = {
      val e4 = e2 * e2; val e6 = e4 * e2; val e8 = e6 * e2
      chi +
        (e2 / 2 + 5 * e4 / 24 + e6 / 12 + 13 * e8 / 360) * math.sin(2 * chi) +
        (7 * e4 / 48 + 29 * e6 / 240 + 811 * e8 / 11520) * math.sin(4 * chi) +
        (7 * e6 / 120 + 81 * e8 / 1120) * math.sin(6 * chi) +
        (4279 * e8 / 161280) * math.sin(8 * chi)
    }
  }

  /** Ellipsoidal Polar Stereographic, variant B (standard parallel form;
    * Snyder PP 1395 §21, eqs. 21-33…21-41; EPSG method 9829) — the polar
    * science grids: EPSG:3031/3976 (Antarctic), EPSG:3413 (NSIDC Arctic
    * sea-ice). Conformal; scale true along `latTsDeg`. The south aspect is
    * the north-aspect math on the mirrored latitude with the y axis
    * flipped. Pole singularity: the pole itself maps to (FE, FN) and the
    * inverse of that point returns λ0. */
  final case class PolarStereographic(a: Double, invF: Double,
                                      latTsDeg: Double, lon0Deg: Double,
                                      falseEasting: Double, falseNorthing: Double,
                                      areaOfUse: Bounds) extends Projection with ConformalMath {
    require(latTsDeg != 0.0, "polar stereographic needs a polar standard parallel")
    private val south = latTsDeg < 0
    private val sgn = if (south) -1.0 else 1.0
    private val lon0 = math.toRadians(lon0Deg)
    private val tF = tConf(math.toRadians(math.abs(latTsDeg)))
    private val mF = mAux(math.toRadians(math.abs(latTsDeg)))

    def forward(lngDeg: Double, latDeg: Double): (Double, Double) = {
      val lat = math.max(-90.0, math.min(90.0, latDeg)) // inf/NaN clamp
      val phi = sgn * math.toRadians(lat) // mirror for the south aspect
      var dLam = math.toRadians(lngDeg) - lon0
      while (dLam > math.Pi) dLam -= 2 * math.Pi
      while (dLam < -math.Pi) dLam += 2 * math.Pi
      val rho = a * mF * tConf(phi) / tF // eq. 21-34
      (falseEasting + rho * math.sin(dLam),
        falseNorthing - sgn * rho * math.cos(dLam))
    }

    def inverse(x: Double, y: Double): (Double, Double) = {
      val xp = x - falseEasting
      val yp = y - falseNorthing
      val rho = math.hypot(xp, yp)
      if (rho < 1e-9) return (lon0Deg, sgn * 90.0)
      val tP = rho * tF / (a * mF) // eq. 21-39
      val chi = math.Pi / 2 - 2 * math.atan(tP) // eq. 7-13
      val phi = phiFromChi(chi)
      val lam = lon0 + math.atan2(xp, -sgn * yp)
      (math.toDegrees(lam), sgn * math.toDegrees(phi))
    }
  }

  object PolarStereographic {
    /** EPSG:3031 — WGS84 / Antarctic Polar Stereographic: lat_ts −71, λ0 0. */
    def antarctic: PolarStereographic =
      PolarStereographic(6378137.0, 298.257223563, -71.0, 0.0, 0.0, 0.0,
        Bounds(-180, -90, 180, -60))
    /** EPSG:3413 — WGS84 / NSIDC Sea Ice Polar Stereographic North:
      * lat_ts 70, λ0 −45. */
    def nsidcArctic: PolarStereographic =
      PolarStereographic(6378137.0, 298.257223563, 70.0, -45.0, 0.0, 0.0,
        Bounds(-180, 60, 180, 90))
    /** EPSG:3976 — WGS84 / NSIDC Sea Ice Polar Stereographic South:
      * lat_ts −70, λ0 0. */
    def nsidcAntarctic: PolarStereographic =
      PolarStereographic(6378137.0, 298.257223563, -70.0, 0.0, 0.0, 0.0,
        Bounds(-180, -90, 180, -60))
  }

  /** Ellipsoidal Lambert Conformal Conic, 2SP (Snyder PP 1395 §15,
    * eqs. 15-1…15-11; EPSG method 9802) — the national-grid family
    * (Lambert-93 France, Statistics Canada LCC, US state planes).
    * Conformal; scale true along both standard parallels. Southern cones
    * (n < 0) flip ρ and the polar sector through the sign factors on the
    * inverse. */
  final case class LambertConformalConic(a: Double, invF: Double,
                                         lat0Deg: Double, lon0Deg: Double,
                                         sp1Deg: Double, sp2Deg: Double,
                                         falseEasting: Double, falseNorthing: Double,
                                         areaOfUse: Bounds) extends Projection with ConformalMath {
    private val lon0 = math.toRadians(lon0Deg)
    private val t1 = tConf(math.toRadians(sp1Deg))
    private val t2 = tConf(math.toRadians(sp2Deg))
    private val m1 = mAux(math.toRadians(sp1Deg))
    private val m2 = mAux(math.toRadians(sp2Deg))
    private val n =
      if (math.abs(sp1Deg - sp2Deg) < 1e-12) math.sin(math.toRadians(sp1Deg))
      else (math.log(m1) - math.log(m2)) / (math.log(t1) - math.log(t2)) // eq. 15-8
    private val bigF = m1 / (n * math.pow(t1, n)) // eq. 15-10
    private val rho0 = a * bigF * math.pow(tConf(math.toRadians(lat0Deg)), n)

    private def rho(phi: Double): Double = {
      val t = tConf(phi)
      // the pole on the cone's side has t → 0: ρ → 0 (15-7 continuous limit)
      if (t <= 0) 0.0 else a * bigF * math.pow(t, n)
    }

    def forward(lngDeg: Double, latDeg: Double): (Double, Double) = {
      val lat = math.max(-90.0, math.min(90.0, latDeg)) // inf/NaN clamp
      val phi = math.toRadians(lat)
      var dLam = math.toRadians(lngDeg) - lon0
      while (dLam > math.Pi) dLam -= 2 * math.Pi
      while (dLam < -math.Pi) dLam += 2 * math.Pi
      val theta = n * dLam // eq. 14-4
      val r = rho(phi)
      (falseEasting + r * math.sin(theta),
        falseNorthing + rho0 - r * math.cos(theta))
    }

    def inverse(x: Double, y: Double): (Double, Double) = {
      val xp = x - falseEasting
      val yp = rho0 - (y - falseNorthing)
      val sign = if (n >= 0) 1.0 else -1.0
      val r = sign * math.hypot(xp, yp)
      if (math.abs(r) < 1e-9) // apex: the pole on the cone's side
        return (lon0Deg, math.signum(n) * 90.0)
      val theta = math.atan2(sign * xp, sign * yp)
      val tP = math.pow(r / (a * bigF), 1 / n) // eq. 15-11
      val chi = math.Pi / 2 - 2 * math.atan(tP)
      (math.toDegrees(lon0 + theta / n), math.toDegrees(phiFromChi(chi)))
    }
  }

  object LambertConformalConic {
    private val grs80InvF = 298.257222101
    /** EPSG:2154 — RGF93 / Lambert-93: φ0 46.5, λ0 3, parallels 49 / 44,
      * FE 700 000, FN 6 600 000, GRS80. */
    def lambert93: LambertConformalConic =
      LambertConformalConic(6378137.0, grs80InvF, 46.5, 3.0, 49.0, 44.0,
        700000.0, 6600000.0, Bounds(-9.86, 41.15, 10.38, 51.56))
    /** EPSG:3347 — NAD83 / Statistics Canada Lambert: φ0 63.390675,
      * λ0 −91.866667, parallels 49 / 77, FE 6 200 000, FN 3 000 000. */
    def canada: LambertConformalConic =
      LambertConformalConic(6378137.0, grs80InvF, 63.390675, -91.8666666666667,
        49.0, 77.0, 6200000.0, 3000000.0, Bounds(-141.0, 40.0, -52.6, 86.5))
  }

  /** Spherical sinusoidal (Snyder PP 1395 §30, eqs. 30-1/30-2): the MODIS
    * land-product grid. x = R·Δλ·cos φ, y = R·φ; equal-area, pole lines
    * collapse to points. `r` is the sphere radius — 6 371 007.181 m for the
    * MODIS authalic sphere (its 10° tile is the published
    * 1 111 950.5196666666 m). */
  final case class Sinusoidal(r: Double, lon0Deg: Double,
                              areaOfUse: Bounds) extends Projection {
    private val lon0 = math.toRadians(lon0Deg)

    def forward(lngDeg: Double, latDeg: Double): (Double, Double) = {
      val lat = math.max(-90.0, math.min(90.0, latDeg)) // inf/NaN clamp
      val phi = math.toRadians(lat)
      var dLam = math.toRadians(lngDeg) - lon0
      while (dLam > math.Pi) dLam -= 2 * math.Pi
      while (dLam < -math.Pi) dLam += 2 * math.Pi
      (r * dLam * math.cos(phi), r * phi)
    }

    def inverse(x: Double, y: Double): (Double, Double) = {
      val phi = math.max(-math.Pi / 2, math.min(math.Pi / 2, y / r))
      val c = math.cos(phi)
      // at the pole every x collapses to the point: λ is indeterminate — λ0
      val lam = if (c < 1e-12) lon0 else lon0 + x / (r * c)
      (math.toDegrees(lam), math.toDegrees(phi))
    }
  }

  object Sinusoidal {
    /** MODIS sinusoidal (SR-ORG:6974): authalic sphere R = 6 371 007.181 m. */
    def Modis: Sinusoidal = Sinusoidal(6371007.181, 0.0, Bounds(-180, -90, 180, 90))
    /** ESRI:54008 World Sinusoidal (WGS84 semi-major as sphere). */
    def World: Sinusoidal = Sinusoidal(6378137.0, 0.0, Bounds(-180, -90, 180, 90))
  }

  /** Spherical equidistant cylindrical / equirectangular (Snyder PP 1395
    * §12, eqs. 12-1..12-6): x = R·Δλ·cos φ₁ + x₀, y = R·(φ − φ₀) + y₀ —
    * the plate-carrée family. Classic PROJ.4 `+proj=eqc` computes exactly
    * this spherical form on the semi-major regardless of `+ellps` (the
    * ellipsoidal meridional-arc variant arrived in PROJ ≥ 6), so this is
    * the faithful target for the proj strings that circulate
    * (EPSG:32662-style exports; reference resolves them via pyproj,
    * `gfw_pixetl/sources.py:137-168`). */
  final case class Equirectangular(r: Double, latTsDeg: Double, lat0Deg: Double,
                                   lon0Deg: Double, x0: Double, y0: Double,
                                   areaOfUse: Bounds) extends Projection {
    // a standard parallel AT the pole degenerates the cylinder (cos φ₁ = 0
    // ⇒ inverse divides by zero): fail at construction, not with Infinity
    // mid-query (ADVICE r11)
    require(math.abs(latTsDeg) < 90.0,
      s"equirectangular lat_ts must satisfy |lat_ts| < 90, got $latTsDeg")
    private val lon0 = math.toRadians(lon0Deg)
    private val phi0 = math.toRadians(lat0Deg)
    private val cosTs = math.cos(math.toRadians(latTsDeg))

    def forward(lngDeg: Double, latDeg: Double): (Double, Double) = {
      val lat = math.max(-90.0, math.min(90.0, latDeg)) // inf/NaN clamp
      var dLam = math.toRadians(lngDeg) - lon0
      while (dLam > math.Pi) dLam -= 2 * math.Pi
      while (dLam < -math.Pi) dLam += 2 * math.Pi
      (r * dLam * cosTs + x0, r * (math.toRadians(lat) - phi0) + y0)
    }

    def inverse(x: Double, y: Double): (Double, Double) = {
      val phi = math.max(-math.Pi / 2, math.min(math.Pi / 2, (y - y0) / r + phi0))
      val lam = lon0 + (x - x0) / (r * cosTs)
      (math.toDegrees(lam), math.toDegrees(phi))
    }
  }

  object Equirectangular {
    /** EPSG:4088 World Equidistant Cylindrical (Sphere): R = 6 371 007 m. */
    def WorldSphere: Equirectangular =
      Equirectangular(6371007.0, 0, 0, 0, 0, 0, Bounds(-180, -90, 180, 90))
    /** EPSG:32662 WGS 84 / Plate Carrée as classic PROJ.4 resolved it:
      * spherical formulas on the WGS84 semi-major. */
    def PlateCarree: Equirectangular =
      Equirectangular(6378137.0, 0, 0, 0, 0, 0, Bounds(-180, -90, 180, 90))
  }

  /** Spherical orthographic (Snyder PP 1395 §20, eqs. 20-3..20-17): the
    * view-from-infinity hemisphere. Forward: x = R·cos φ·sin Δλ,
    * y = R·(cos φ₁·sin φ − sin φ₁·cos φ·cos Δλ); points on the far
    * hemisphere (cos c < 0) clamp to the horizon rim (ρ = R) so boundary
    * sampling stays monotone instead of folding back — the rim is exactly
    * where the projection's own limit lies. Classic PROJ.4 `+proj=ortho`
    * is this spherical form (ellipsoidal arrived in PROJ ≥ 7). */
  final case class Orthographic(r: Double, lat0Deg: Double, lon0Deg: Double,
                                x0: Double, y0: Double,
                                areaOfUse: Bounds) extends Projection {
    private val lon0 = math.toRadians(lon0Deg)
    private val phi1 = math.toRadians(lat0Deg)
    private val sinP1 = math.sin(phi1)
    private val cosP1 = math.cos(phi1)

    def forward(lngDeg: Double, latDeg: Double): (Double, Double) = {
      val lat = math.max(-90.0, math.min(90.0, latDeg))
      val phi = math.toRadians(lat)
      var dLam = math.toRadians(lngDeg) - lon0
      while (dLam > math.Pi) dLam -= 2 * math.Pi
      while (dLam < -math.Pi) dLam += 2 * math.Pi
      val (sinP, cosP) = (math.sin(phi), math.cos(phi))
      val cosC = sinP1 * sinP + cosP1 * cosP * math.cos(dLam) // 20-5
      val x = r * cosP * math.sin(dLam)                        // 20-3
      val y = r * (cosP1 * sinP - sinP1 * cosP * math.cos(dLam)) // 20-4
      if (cosC >= 0) (x + x0, y + y0)
      else { // far hemisphere: clamp onto the horizon circle
        val rho = math.hypot(x, y)
        if (rho < 1e-12) (x0 + r, y0) // antipode: any rim point; fix +x
        else (x0 + x * r / rho, y0 + y * r / rho)
      }
    }

    def inverse(xIn: Double, yIn: Double): (Double, Double) = {
      val (x, y) = (xIn - x0, yIn - y0)
      val rhoRaw = math.hypot(x, y)
      if (rhoRaw < 1e-12) return (math.toDegrees(lon0), math.toDegrees(phi1))
      val clamp = math.min(rhoRaw, r) / rhoRaw // outside the rim → rim
      val (xc, yc, rho) = (x * clamp, y * clamp, math.min(rhoRaw, r))
      val c = math.asin(math.min(1.0, rho / r))                // 20-13
      val (sinC, cosC) = (math.sin(c), math.cos(c))
      // rim rounding can push the argument a ulp outside [-1,1] ⇒ NaN:
      // clamp like `c` above (ADVICE r11)
      val phi = math.asin(math.max(-1.0, math.min(1.0,
        cosC * sinP1 + yc * sinC * cosP1 / rho)))              // 20-14
      val lam = lon0 + math.atan2(xc * sinC,                   // 20-15
        rho * cosP1 * cosC - yc * sinP1 * sinC)
      (math.toDegrees(lam), math.toDegrees(phi))
    }
  }

  /** 7-parameter Helmert datum transform (EPSG method 9606, position-vector
    * rotation convention) through geocentric cartesian coordinates —
    * the public closed form pyproj applies when a CRS carries `towgs84`
    * parameters. `dx/dy/dz` metres, rotations arc-seconds, `ppm` scale.
    * Accuracy is whatever the published parameter set claims (≈3–5 m for
    * the classic OSGB36 set) — the right working tool absent a
    * distortion-grid file, and loudly better than ignoring a 100 m datum
    * gap. The inverse negates the (small) parameters, standard practice
    * at this accuracy class. */
  final case class Helmert(dx: Double, dy: Double, dz: Double,
                           rxAs: Double, ryAs: Double, rzAs: Double, ppm: Double) {
    private val s = 1.0 + ppm * 1e-6
    private val rx = math.toRadians(rxAs / 3600.0)
    private val ry = math.toRadians(ryAs / 3600.0)
    private val rz = math.toRadians(rzAs / 3600.0)
    def apply(x: Double, y: Double, z: Double): (Double, Double, Double) =
      (dx + s * (x - rz * y + ry * z),
        dy + s * (rz * x + y - rx * z),
        dz + s * (-ry * x + rx * y + z))
    def negated: Helmert = Helmert(-dx, -dy, -dz, -rxAs, -ryAs, -rzAs, -ppm)
  }

  /** Geodetic ↔ geocentric conversions on an ellipsoid (the standard
    * closed forward; iterative latitude recovery on the return, converging
    * in ~4 rounds at double precision). Heights pinned to the ellipsoid
    * (h = 0): raster bounds carry no height. */
  private final class Geocentric(a: Double, invF: Double) {
    private val f = 1.0 / invF
    private val e2 = f * (2 - f)
    def toXyz(lngDeg: Double, latDeg: Double): (Double, Double, Double) = {
      val phi = math.toRadians(latDeg); val lam = math.toRadians(lngDeg)
      val sinP = math.sin(phi)
      val n = a / math.sqrt(1 - e2 * sinP * sinP)
      (n * math.cos(phi) * math.cos(lam),
        n * math.cos(phi) * math.sin(lam),
        n * (1 - e2) * sinP)
    }
    def toLngLat(x: Double, y: Double, z: Double): (Double, Double) = {
      val p = math.hypot(x, y)
      var phi = math.atan2(z, p * (1 - e2))
      var i = 0
      while (i < 10) {
        val sinP = math.sin(phi)
        val n = a / math.sqrt(1 - e2 * sinP * sinP)
        val next = math.atan2(z + e2 * n * sinP, p)
        if (math.abs(next - phi) < 1e-13) i = 10 else i += 1
        phi = next
      }
      (math.toDegrees(math.atan2(y, x)), math.toDegrees(phi))
    }
  }

  /** A projection on a non-WGS84 datum: WGS84 lat/lng shifts onto the
    * local datum through [[Helmert]] before the projection math runs on
    * the local ellipsoid (and back on the inverse) — so `forward` keeps
    * the registry-wide contract that inputs are WGS84 degrees. */
  final case class DatumShifted(base: Projection, localA: Double,
                                localInvF: Double, wgs84ToLocal: Helmert)
      extends Projection {
    private val wgs = new Geocentric(6378137.0, 298.257223563)
    private val local = new Geocentric(localA, localInvF)
    private val toWgs = wgs84ToLocal.negated
    def forward(lng: Double, lat: Double): (Double, Double) = {
      val (x, y, z) = wgs.toXyz(lng, lat)
      val (lx, ly, lz) = wgs84ToLocal(x, y, z)
      val (llng, llat) = local.toLngLat(lx, ly, lz)
      base.forward(llng, llat)
    }
    def inverse(x: Double, y: Double): (Double, Double) = {
      val (llng, llat) = base.inverse(x, y)
      val (lx, ly, lz) = local.toXyz(llng, llat)
      val (wx, wy, wz) = toWgs(lx, ly, lz)
      wgs.toLngLat(wx, wy, wz)
    }
    def areaOfUse: Bounds = base.areaOfUse
  }

  /** Ellipsoidal Lambert Azimuthal Equal-Area, oblique aspect (Snyder PP
    * 1395 §24, eqs. 24-2…24-8 forward, 24-16…24-19 + 3-16 inverse; EPSG
    * method 9820) — the pan-European statistical grid EPSG:3035. Equal
    * area like Albers (zonal sums stay true) but azimuthal, so one
    * projection covers the whole continent without cone seams. */
  final case class LambertAzimuthalEqualArea(a: Double, invF: Double,
                                             lat0Deg: Double, lon0Deg: Double,
                                             falseEasting: Double, falseNorthing: Double,
                                             areaOfUse: Bounds) extends Projection {
    private val f = 1.0 / invF
    private val e2 = f * (2 - f)
    private val e = math.sqrt(e2)
    private val lon0 = math.toRadians(lon0Deg)

    private def q(phi: Double): Double = { // Snyder eq. 3-12
      val s = math.sin(phi)
      (1 - e2) * (s / (1 - e2 * s * s)
        - (1 / (2 * e)) * math.log((1 - e * s) / (1 + e * s)))
    }
    private val qp = q(math.Pi / 2)
    private def beta(phi: Double): Double =
      math.asin(math.max(-1.0, math.min(1.0, q(phi) / qp))) // eq. 3-11
    private val beta1 = beta(math.toRadians(lat0Deg))
    private val rq = a * math.sqrt(qp / 2) // eq. 3-13
    private val m1 = {
      val s = math.sin(math.toRadians(lat0Deg))
      math.cos(math.toRadians(lat0Deg)) / math.sqrt(1 - e2 * s * s)
    }
    private val d = a * m1 / (rq * math.cos(beta1)) // eq. 24-20
    private val sinB1 = math.sin(beta1); private val cosB1 = math.cos(beta1)

    def forward(lngDeg: Double, latDeg: Double): (Double, Double) = {
      val lat = math.max(-90.0, math.min(90.0, latDeg)) // inf/NaN clamp
      val b = beta(math.toRadians(lat))
      var dLam = math.toRadians(lngDeg) - lon0
      while (dLam > math.Pi) dLam -= 2 * math.Pi
      while (dLam < -math.Pi) dLam += 2 * math.Pi
      val sinB = math.sin(b); val cosB = math.cos(b)
      // eq. 24-19: B = Rq·√(2/(1 + sinβ1 sinβ + cosβ1 cosβ cosΔλ))
      val denom = 1 + sinB1 * sinB + cosB1 * cosB * math.cos(dLam)
      // antipode of the center: the boundary circle, x/y indeterminate — clamp
      if (denom < 1e-12) return (falseEasting, falseNorthing + rq * 2 / d)
      val bb = rq * math.sqrt(2 / denom)
      (falseEasting + bb * d * cosB * math.sin(dLam),
        falseNorthing + (bb / d) * (cosB1 * sinB - sinB1 * cosB * math.cos(dLam)))
    }

    def inverse(x: Double, y: Double): (Double, Double) = {
      val xp = (x - falseEasting) / d
      val yp = (y - falseNorthing) * d
      val rho = math.hypot(xp, yp)
      if (rho < 1e-9) return (lon0Deg, lat0Deg)
      val ce = 2 * math.asin(math.max(-1.0, math.min(1.0, rho / (2 * rq)))) // eq. 24-16
      val sinCe = math.sin(ce); val cosCe = math.cos(ce)
      val qv = qp * (cosCe * sinB1 + yp * sinCe * cosB1 / rho) // eq. 24-17
      val lam = lon0 + math.atan2(xp * sinCe,
        rho * cosB1 * cosCe - yp * sinB1 * sinCe) // eq. 24-18
      // eq. 3-16: iterate φ from the equal-area auxiliary (Albers discipline)
      var phi = math.asin(math.max(-1.0, math.min(1.0, qv / 2)))
      var i = 0
      while (i < 15) {
        val s = math.sin(phi); val c = math.cos(phi)
        if (math.abs(c) < 1e-12) { i = 15 }
        else {
          val e2s = 1 - e2 * s * s
          val delta = (e2s * e2s / (2 * c)) * (qv / (1 - e2) - s / e2s
            + (1 / (2 * e)) * math.log((1 - e * s) / (1 + e * s)))
          phi += delta
          if (math.abs(delta) < 1e-14) i = 15 else i += 1
        }
      }
      (math.toDegrees(lam), math.toDegrees(phi))
    }
  }
}
