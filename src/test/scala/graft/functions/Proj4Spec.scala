package graft.functions

import org.scalatest.funsuite.AnyFunSuite

/** Proj4 string parsing (P5 arbitrary-CRS leg): every family must agree
  * with the EPSG registry instance it parameterizes, and unsupported
  * parameterizations must fail loudly rather than transform wrongly. */
class Proj4Spec extends AnyFunSuite {

  private def agree(p1: Projection, p2: Projection,
                    pts: Seq[(Double, Double)], tolM: Double = 1e-3): Unit =
    pts.foreach { case (lng, lat) =>
      val (x1, y1) = p1.forward(lng, lat)
      val (x2, y2) = p2.forward(lng, lat)
      assert(math.abs(x1 - x2) < tolM && math.abs(y1 - y2) < tolM,
        s"($lng,$lat): ($x1,$y1) vs ($x2,$y2)")
      val (l1, t1) = p1.inverse(x1, y1)
      assert(math.abs(l1 - lng) < 1e-6 && math.abs(t1 - lat) < 1e-6,
        s"round trip ($lng,$lat) → ($l1,$t1)")
    }

  test("tmerc + airy + towgs84 == EPSG:27700 (OSGB with Helmert datum shift)") {
    val s = "+proj=tmerc +lat_0=49 +lon_0=-2 +k=0.9996012717 +x_0=400000 " +
      "+y_0=-100000 +ellps=airy " +
      "+towgs84=446.448,-125.157,542.060,0.1502,0.2470,0.8421,-20.4894 +units=m +no_defs"
    agree(Proj4.parse(s).get, Projection.forEpsg(27700).get,
      Seq((-2.0, 52.0), (-5.2, 50.1), (1.3, 52.6), (-3.0, 58.6)))
  }

  test("+proj=utm +zone=33 == EPSG:32633; +south == EPSG:32733") {
    agree(Proj4.parse("+proj=utm +zone=33 +datum=WGS84 +units=m +no_defs").get,
      Projection.forEpsg(32633).get, Seq((15.0, 52.0), (12.5, 41.9)))
    agree(Proj4.parse("+proj=utm +zone=33 +south +datum=WGS84").get,
      Projection.forEpsg(32733).get, Seq((15.0, -25.0)))
  }

  test("+proj=utm +ellps=GRS80 == the ETRS89 zone (EPSG:25832)") {
    agree(Proj4.parse("+proj=utm +zone=32 +ellps=GRS80 +units=m +no_defs").get,
      Projection.forEpsg(25832).get, Seq((9.0, 51.0), (7.5, 48.0)))
  }

  test("+proj=aea CONUS parameters == EPSG:5070") {
    val s = "+proj=aea +lat_0=23 +lon_0=-96 +lat_1=29.5 +lat_2=45.5 " +
      "+x_0=0 +y_0=0 +ellps=GRS80 +units=m +no_defs"
    agree(Proj4.parse(s).get, Projection.forEpsg(5070).get,
      Seq((-96.0, 23.0), (-122.4, 37.8), (-74.0, 40.7)))
  }

  test("+proj=lcc Lambert-93 parameters == EPSG:2154") {
    val s = "+proj=lcc +lat_0=46.5 +lon_0=3 +lat_1=49 +lat_2=44 " +
      "+x_0=700000 +y_0=6600000 +ellps=GRS80 +units=m +no_defs"
    agree(Proj4.parse(s).get, Projection.forEpsg(2154).get,
      Seq((3.0, 46.5), (2.35, 48.86), (5.37, 43.3)))
  }

  test("+proj=stere polar aspect == EPSG:3031 / EPSG:3413") {
    agree(Proj4.parse("+proj=stere +lat_0=-90 +lat_ts=-71 +lon_0=0 " +
      "+x_0=0 +y_0=0 +datum=WGS84").get,
      Projection.forEpsg(3031).get, Seq((0.0, -71.0), (110.0, -66.0)))
    agree(Proj4.parse("+proj=stere +lat_0=90 +lat_ts=70 +lon_0=-45 " +
      "+x_0=0 +y_0=0 +datum=WGS84").get,
      Projection.forEpsg(3413).get, Seq((-45.0, 70.0), (10.0, 78.0)))
  }

  test("+proj=laea Europe parameters == EPSG:3035") {
    val s = "+proj=laea +lat_0=52 +lon_0=10 +x_0=4321000 +y_0=3210000 " +
      "+ellps=GRS80 +units=m +no_defs"
    agree(Proj4.parse(s).get, Projection.forEpsg(3035).get,
      Seq((10.0, 52.0), (-3.7, 40.4), (24.9, 60.2)))
  }

  test("+proj=sinu on the MODIS authalic sphere == SR-ORG:6974") {
    agree(Proj4.parse("+proj=sinu +R=6371007.181 +nadgrids=@null +wktext").get,
      Projection.forCrs("MODIS").get, Seq((0.0, 0.0), (100.0, 45.0), (-60.0, -10.0)))
  }

  test("+proj=eqc spherical plate-carrée: Snyder §12 closed form + EPSG twins") {
    // R=1, lat_ts=30, lon_0=0: (45°, 30°) → x = (π/4)·cos 30°, y = π/6
    val p = Proj4.parse("+proj=eqc +lat_ts=30 +lat_0=0 +lon_0=0 +R=1").get
    val (x, y) = p.forward(45.0, 30.0)
    assert(math.abs(x - math.Pi / 4 * math.cos(math.toRadians(30))) < 1e-12)
    assert(math.abs(y - math.Pi / 6) < 1e-12)
    val (lng, lat) = p.inverse(x, y)
    assert(math.abs(lng - 45.0) < 1e-9 && math.abs(lat - 30.0) < 1e-9)
    // EPSG:4088 (sphere R=6371007) and 32662 (classic-proj4 spherical on
    // the WGS84 semi-major) agree with their proj-string twins
    agree(Proj4.parse("+proj=eqc +lat_ts=0 +lat_0=0 +lon_0=0 +x_0=0 +y_0=0 +R=6371007").get,
      Projection.forEpsg(4088).get, Seq((15.0, 52.0), (-122.4, 37.8)))
    agree(Proj4.parse("+proj=eqc +lat_ts=0 +lat_0=0 +lon_0=0 +a=6378137").get,
      Projection.forEpsg(32662).get, Seq((15.0, 52.0), (-74.0, -40.7)))
    // lat_ts at the pole degenerates the cylinder: must fail at
    // CONSTRUCTION (loud), never divide by cos 90° = 0 mid-inverse
    intercept[IllegalArgumentException] {
      Projection.Equirectangular(1.0, 90.0, 0, 0, 0, 0,
        graft.core.grid.Bounds(-180, -90, 180, 90))
    }
    intercept[IllegalArgumentException] {
      Projection.Equirectangular(1.0, -90.0, 0, 0, 0, 0,
        graft.core.grid.Bounds(-180, -90, 180, 90))
    }
  }

  test("+proj=ortho: Snyder §20 worked example + rim clamping") {
    // Snyder PP 1395 p. 311: R=1, φ1=40°, λ0=−100°, (φ=30°, λ=−110°)
    // → x = −0.1503837, y = −0.1651911
    val p = Proj4.parse("+proj=ortho +lat_0=40 +lon_0=-100 +R=1").get
    val (x, y) = p.forward(-110.0, 30.0)
    assert(math.abs(x - -0.1503837) < 1e-7, s"x=$x")
    assert(math.abs(y - -0.1651911) < 1e-7, s"y=$y")
    val (lng, lat) = p.inverse(x, y)
    assert(math.abs(lng - -110.0) < 1e-6 && math.abs(lat - 30.0) < 1e-6)
    // far hemisphere clamps onto the horizon circle (ρ = R), never folds
    val (fx, fy) = p.forward(70.0, -35.0) // antipodal-ish point
    assert(math.abs(math.hypot(fx, fy) - 1.0) < 1e-9)
    // center round-trips exactly
    val (cx, cy) = p.forward(-100.0, 40.0)
    assert(math.abs(cx) < 1e-12 && math.abs(cy) < 1e-12)
    val (clng, clat) = p.inverse(0, 0)
    assert(math.abs(clng - -100.0) < 1e-9 && math.abs(clat - 40.0) < 1e-9)
    // rim robustness: inverse along (and a ulp outside) the horizon circle
    // must clamp the asin argument, never yield NaN latitude
    for (deg <- 0 until 360 by 7; eps <- Seq(0.0, 1e-16, -1e-16)) {
      val a = math.toRadians(deg)
      val (lng2, lat2) = p.inverse(math.cos(a) * (1.0 + eps), math.sin(a) * (1.0 + eps))
      assert(!lng2.isNaN && !lat2.isNaN, s"NaN at rim angle $deg eps $eps")
      assert(lat2 >= -90.0 - 1e-9 && lat2 <= 90.0 + 1e-9)
    }
  }

  test("+proj=longlat is the identity; +proj=merc spherical is WebMercator") {
    val ll = Proj4.parse("+proj=longlat +datum=WGS84 +no_defs").get
    assert(ll.forward(12.5, 41.9) == ((12.5, 41.9)))
    agree(Proj4.parse("+proj=merc +a=6378137 +b=6378137 +lat_ts=0 +lon_0=0 " +
      "+x_0=0 +y_0=0 +k=1 +units=m +no_defs").get,
      Projection.forEpsg(3857).get, Seq((10.0, 52.0), (-120.0, -33.0)))
  }

  test("longlat +towgs84 applies the datum shift to geographic coordinates") {
    // OSGB36 geographic: the shift moves points ~100 m (≈ 1e-3 deg)
    val osgb = Proj4.parse("+proj=longlat +ellps=airy " +
      "+towgs84=446.448,-125.157,542.060,0.1502,0.2470,0.8421,-20.4894").get
    val (lng, lat) = osgb.forward(-2.0, 52.0)
    val d = math.hypot(lng + 2.0, lat - 52.0)
    assert(d > 2e-4 && d < 3e-3, s"shift magnitude $d deg")
    // the negated-parameter Helmert inverse is approximate by design
    // (standard at this accuracy class): round trip lands within ~5 mm
    val (l2, t2) = osgb.inverse(lng, lat)
    assert(math.abs(l2 + 2.0) < 1e-6 && math.abs(t2 - 52.0) < 1e-6)
  }

  test("unsupported parameterizations fail loudly; non-proj strings pass through") {
    assert(Proj4.parse("EPSG:4326").isEmpty)
    intercept[IllegalArgumentException](Proj4.parse("+proj=omerc +lat_0=4").get)
    intercept[IllegalArgumentException](
      Proj4.parse("+proj=stere +lat_0=52 +lon_0=10 +ellps=WGS84").get) // oblique
    intercept[IllegalArgumentException](
      Proj4.parse("+proj=merc +ellps=WGS84").get) // true ellipsoidal merc
    intercept[IllegalArgumentException](Proj4.parse("+proj=utm +ellps=WGS84").get) // no zone
  }

  test("Reproject dispatches proj4 strings end to end") {
    val tf = Reproject.pointTransform(
      "+proj=utm +zone=31 +datum=WGS84 +units=m +no_defs", "EPSG:4326")
    val reg = Projection.forEpsg(32631).get
    val (x, y) = reg.forward(3.0, 48.5)
    val (lng, lat) = tf(x, y)
    assert(math.abs(lng - 3.0) < 1e-7 && math.abs(lat - 48.5) < 1e-7)
  }
}
