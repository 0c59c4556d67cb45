package graft.functions

import graft.core.grid.Bounds
import graft.functions.Projection._

/** PROJ.4 string parser — the arbitrary-CRS leg of operator P5.
  *
  * The reference resolves any CRS through pyproj (`gfw_pixetl/sources.py:
  * 137-168`), which accepts both EPSG codes and classic `+proj=` parameter
  * strings. The EPSG registry here covers the codes rasters actually arrive
  * in; this parser covers the long tail: a raster whose CRS is only known as
  * a proj string (GDAL's `srs.ExportToProj4()`, the form GeoTIFF sidecars
  * and VRTs circulate) now transforms instead of rejecting, for every
  * projection family the registry implements:
  *
  *   longlat, merc (spherical), utm, tmerc, aea, lcc (2SP), stere (polar
  *   aspect), laea, sinu, eqc (spherical plate-carrée), ortho (spherical)
  *
  * Ellipsoids resolve from `+ellps`/`+datum` or explicit `+a`/`+b`/`+rf`;
  * a non-zero `+towgs84` (3- or 7-parameter) wraps the projection in the
  * registry's [[Projection.DatumShifted]] Helmert machinery — proj's
  * towgs84 is the local→WGS84 direction, so the registry's WGS84→local
  * shift is its negation. Unsupported families (oblique stere, general
  * ellipsoidal merc, k≠1 LCC-1SP) still fail loudly — a wrong transform is
  * worse than no transform.
  */
object Proj4 {

  private final case class Params(m: Map[String, String], flags: Set[String]) {
    def d(key: String, default: Double): Double =
      m.get(key).map(_.toDouble).getOrElse(default)
    def opt(key: String): Option[String] = m.get(key)
    def has(key: String): Boolean = flags.contains(key) || m.contains(key)
  }

  /** (semi-major a, inverse flattening; invF = ∞ encodes a sphere). */
  private val ellipsoids: Map[String, (Double, Double)] = Map(
    "wgs84"  -> (6378137.0, 298.257223563),
    "grs80"  -> (6378137.0, 298.257222101),
    "airy"   -> (6377563.396, 299.3249646),
    "intl"   -> (6378388.0, 297.0),
    "clrk66" -> (6378206.4, 294.9786982),
    "clrk80" -> (6378249.145, 293.465),
    "bessel" -> (6377397.155, 299.1528128),
    "krass"  -> (6378245.0, 298.3),
    "sphere" -> (6370997.0, Double.PositiveInfinity))

  /** `+datum=` shorthand: ellipsoid + (optionally) a published towgs84 set. */
  private val datums: Map[String, (String, Option[Helmert])] = Map(
    "wgs84"  -> ("wgs84", None),
    "nad83"  -> ("grs80", None), // coincident at this registry's accuracy
    // classic published OSGB36 set (local→WGS84): 446.448,-125.157,542.06,…
    "osgb36" -> ("airy", Some(Helmert(446.448, -125.157, 542.060,
      0.1502, 0.2470, 0.8421, -20.4894))),
    // Pulkovo 1942 / Potsdam shorthands circulate with 3-param sets
    "potsdam" -> ("bessel", Some(Helmert(598.1, 73.7, 418.2, 0.202, 0.045, -2.455, 6.7))))

  /** Parse a `+proj=…` string; None only when the string is not proj4 at
    * all (callers then try the other authorities). A recognized `+proj`
    * with unsupported parameters throws — loud, never silently wrong. */
  def parse(proj: String): Option[Projection] = {
    val s = proj.trim.toLowerCase
    if (!s.contains("+proj=")) return None
    val tokens = s.split("\\s+").filter(_.startsWith("+")).map(_.stripPrefix("+"))
    val kv = tokens.collect { case t if t.contains("=") =>
      val Array(k, v) = t.split("=", 2); k -> v }.toMap
    val flags = tokens.filterNot(_.contains("=")).toSet
    val p = Params(kv, flags)
    Some(build(p))
  }

  private def build(p: Params): Projection = {
    val family = p.opt("proj").getOrElse(fail("missing +proj"))

    // ellipsoid: explicit a/b or a/rf wins; then +ellps; then +datum; then WGS84
    val datum = p.opt("datum").map(d =>
      datums.getOrElse(d, fail(s"unknown +datum=$d")))
    val (a, invF): (Double, Double) = p.opt("a") match {
      case Some(av) =>
        val aa = av.toDouble
        p.opt("rf") match {
          case Some(rf) => (aa, rf.toDouble)
          case None => p.opt("b") match {
            case Some(bv) =>
              val bb = bv.toDouble
              (aa, if (bb == aa) Double.PositiveInfinity else aa / (aa - bb))
            case None => (aa, Double.PositiveInfinity) // a alone: sphere
          }
        }
      case None => p.opt("r") match {
        case Some(rv) => (rv.toDouble, Double.PositiveInfinity)
        case None =>
          val name = p.opt("ellps").orElse(datum.map(_._1)).getOrElse("wgs84")
          ellipsoids.getOrElse(name, fail(s"unknown +ellps=$name"))
      }
    }
    val sphere = invF.isInfinite
    // TM/conic series need a finite invF; treat a sphere as the limit via a
    // huge-but-finite flattening only where the family tolerates it (none do
    // here except sinu/merc, which take the radius directly)
    def needEllipsoid(): Unit =
      if (sphere) fail(s"+proj=$family needs an ellipsoid (+ellps or +a/+rf)")

    // towgs84: proj's local→WGS84 Helmert; zero sets are identity
    val towgs84: Option[Helmert] = p.opt("towgs84").map { v =>
      val ps = v.split(",").map(_.trim.toDouble)
      ps.length match {
        case 3 => Helmert(ps(0), ps(1), ps(2), 0, 0, 0, 0)
        case 7 => Helmert(ps(0), ps(1), ps(2), ps(3), ps(4), ps(5), ps(6))
        case n => fail(s"towgs84 expects 3 or 7 params, got $n")
      }
    }.filterNot(h => h.dx == 0 && h.dy == 0 && h.dz == 0 &&
      h.rxAs == 0 && h.ryAs == 0 && h.rzAs == 0 && h.ppm == 0)
      .orElse(datum.flatMap(_._2))

    val lat0 = p.d("lat_0", 0.0)
    val lon0 = p.d("lon_0", 0.0)
    val x0 = p.d("x_0", 0.0)
    val y0 = p.d("y_0", 0.0)
    val k0 = p.d("k", p.d("k_0", 1.0))

    val base: Projection = family match {
      case "longlat" | "latlong" => Wgs84
      case "merc" =>
        // the spherical (Web-Mercator) form — the one that circulates
        // (EPSG:3857 exports as +proj=merc +a=6378137 +b=6378137)
        if (!sphere && invF < 1e9) fail("general ellipsoidal merc unsupported; use the spherical form")
        if (math.abs(a - 6378137.0) > 1e-6 || k0 != 1.0 || lon0 != 0.0 || x0 != 0.0 || y0 != 0.0)
          fail("only the standard spherical web-mercator parameterization is supported")
        WebMercator
      case "utm" =>
        needEllipsoid()
        val zone = p.opt("zone").map(_.toInt).getOrElse(fail("utm needs +zone"))
        TransverseMercator.utm(zone, north = !p.has("south"), a, invF)
      case "tmerc" =>
        needEllipsoid()
        TransverseMercator(a, invF, lat0, lon0, k0, x0, y0,
          Bounds(wrapLon(lon0 - 9), -84, wrapLon(lon0 + 9), 84))
      case "aea" =>
        needEllipsoid()
        val sp1 = p.d("lat_1", lat0)
        val sp2 = p.d("lat_2", sp1)
        AlbersEqualArea(a, invF, lat0, lon0, sp1, sp2, x0, y0, world)
      case "lcc" =>
        needEllipsoid()
        val sp1 = p.d("lat_1", lat0)
        val sp2 = p.d("lat_2", sp1)
        // 1SP (lat_1 == lat_2 == lat_0) with k≠1 rescales the cone — not
        // expressible in the registry's 2SP form
        if (k0 != 1.0) fail("lcc with +k_0 != 1 unsupported (2SP form only)")
        LambertConformalConic(a, invF, lat0, lon0, sp1, sp2, x0, y0, world)
      case "stere" =>
        needEllipsoid()
        if (math.abs(math.abs(lat0) - 90.0) > 1e-9)
          fail("only polar-aspect stere (lat_0 = ±90) is supported")
        val latTs = p.d("lat_ts", lat0) // defaults to the pole itself
        PolarStereographic(a, invF, if (lat0 < 0) -math.abs(latTs) else math.abs(latTs),
          lon0, x0, y0,
          if (lat0 < 0) Bounds(-180, -90, 180, -50) else Bounds(-180, 50, 180, 90))
      case "laea" =>
        needEllipsoid()
        LambertAzimuthalEqualArea(a, invF, lat0, lon0, x0, y0, world)
      case "sinu" =>
        Sinusoidal(a, lon0, world) // spherical by construction; +R or +a is the radius
      case "eqc" =>
        // classic PROJ.4 eqc is SPHERICAL on the semi-major regardless of
        // +ellps (Snyder §12; ellipsoidal eqc arrived in PROJ ≥ 6) — the
        // plate-carrée family EPSG:32662-style strings circulate in
        Equirectangular(a, p.d("lat_ts", 0.0), lat0, lon0, x0, y0, world)
      case "ortho" =>
        // classic PROJ.4 ortho is the spherical Snyder §20 form
        Orthographic(a, lat0, lon0, x0, y0, world)
      case other => fail(s"unsupported +proj=$other")
    }

    towgs84 match {
      case Some(h) if base ne Wgs84 =>
        DatumShifted(base, a, invF, h.negated) // registry wants WGS84→local
      case Some(h) =>
        // geographic CRS on a shifted datum: identity projection on the
        // local ellipsoid, Helmert in front
        DatumShifted(LocalGeographic(Bounds(-180, -90, 180, 90)), a, invF, h.negated)
      case None => base
    }
  }

  /** Identity "projection" in local-datum degrees (the longlat +towgs84
    * case): DatumShifted supplies the Helmert, this supplies nothing. */
  private final case class LocalGeographic(areaOfUse: Bounds) extends Projection {
    def forward(lng: Double, lat: Double): (Double, Double) = (lng, lat)
    def inverse(x: Double, y: Double): (Double, Double) = (x, y)
  }

  private val world = Bounds(-180, -90, 180, 90)
  private def wrapLon(l: Double): Double =
    if (l > 180) l - 360 else if (l < -180) l + 360 else l
  private def fail(msg: String): Nothing =
    throw new IllegalArgumentException(s"proj4: $msg")
}
