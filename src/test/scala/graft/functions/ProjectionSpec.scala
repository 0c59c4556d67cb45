package graft.functions

import graft.core.grid.Bounds
import org.scalatest.funsuite.AnyFunSuite

/** P5 beyond the grid CRSs: UTM (ellipsoidal Transverse Mercator) against
  * published EPSG test values, plus the 4326-pivot dispatch in Reproject. */
class ProjectionSpec extends AnyFunSuite {

  test("UTM zone 31N: known anchor points") {
    val p = Projection.forEpsg(32631).get
    // central meridian (3°E) on the equator → exactly (FE, 0)
    val (x0, y0) = p.forward(3.0, 0.0)
    assert(math.abs(x0 - 500000.0) < 1e-6 && math.abs(y0) < 1e-6)
    // the classic zone-edge value: (0°E, 0°N) in zone 31 → E 166021.443, N 0
    val (x1, y1) = p.forward(0.0, 0.0)
    assert(math.abs(x1 - 166021.443) < 0.01, s"got $x1")
    assert(math.abs(y1) < 1e-6)
  }

  test("UTM forward/inverse round-trips to sub-millimeter in degrees") {
    for (epsg <- Seq(32631, 32610, 32733); (lng0, lat0) <- Seq((0.5, 0.5), (-2.9, 2.9))) {
      val p = Projection.forEpsg(epsg).get
      val zoneLon0 = p.asInstanceOf[Projection.TransverseMercator].lon0Deg
      val (lng, lat) = (zoneLon0 + lng0, if (epsg > 32700) -40.0 + lat0 else 40.0 + lat0)
      val (x, y) = p.forward(lng, lat)
      val (lng2, lat2) = p.inverse(x, y)
      assert(math.abs(lng2 - lng) < 1e-8 && math.abs(lat2 - lat) < 1e-8,
        s"epsg $epsg round trip ($lng,$lat) → ($lng2,$lat2)")
    }
  }

  test("UTM round-trip sweep: whole zone band at half-degree steps") {
    val p = Projection.forEpsg(32631).get
    var worst = 0.0
    for (dl <- BigDecimal(-3.0) to 3.0 by 0.5; lat <- BigDecimal(-80.0) to 84.0 by 0.5) {
      val (lng0, lat0) = (3.0 + dl.toDouble, lat.toDouble)
      val (x, y) = p.forward(lng0, lat0)
      val (lng1, lat1) = p.inverse(x, y)
      worst = math.max(worst,
        math.max(math.abs(lng1 - lng0), math.abs(lat1 - lat0)))
    }
    assert(worst < 1e-7, s"worst round-trip error $worst deg") // < 1 cm
  }

  test("UTM southern hemisphere carries the 10,000 km false northing") {
    val p = Projection.forEpsg(32733).get // zone 33S (15°E)
    val (_, y) = p.forward(15.0, -0.0001)
    assert(y < 10000000.0 && y > 9999980.0)
    val (_, yDeep) = p.forward(15.0, -40.0)
    assert(yDeep < 6000000.0 && yDeep > 5000000.0)
  }

  test("Reproject dispatches arbitrary registry pairs through the 4326 pivot") {
    // UTM 31N → WebMercator of the same point
    val tf = Reproject.pointTransform("EPSG:32631", "EPSG:3857")
    val p31 = Projection.forEpsg(32631).get
    val (x, y) = p31.forward(4.0, 45.0)
    val (mx, my) = tf(x, y)
    val (emx, emy) = Reproject.toWebMercator(4.0, 45.0)
    assert(math.abs(mx - emx) < 0.001 && math.abs(my - emy) < 0.001)
    // and bounds transform works UTM → 4326
    val b = Reproject.bounds(Bounds(x - 1000, y - 1000, x + 1000, y + 1000),
      "EPSG:32631", "EPSG:4326")
    assert(b.left < 4.0 && 4.0 < b.right && b.bottom < 45.0 && 45.0 < b.top)
  }

  test("unknown CRS pairs still fail loudly") {
    intercept[IllegalArgumentException] {
      // HD72 / EOV (Hotine oblique Mercator) — family not shipped
      Reproject.pointTransform("EPSG:23700", "EPSG:4326")
    }
  }

  // ---- Albers equal-area (EPSG:5070 CONUS, EPSG:3577 Australia) ----------

  /** Planar shoelace area of the projected boundary of a lat/lng cell,
    * densified to `steps` points per edge. */
  private def projectedCellArea(p: Projection, lng0: Double, lat0: Double,
                                lng1: Double, lat1: Double, steps: Int = 64): Double = {
    val pts = Seq.newBuilder[(Double, Double)]
    for (i <- 0 until steps) pts += p.forward(lng0 + (lng1 - lng0) * i / steps, lat0)
    for (i <- 0 until steps) pts += p.forward(lng1, lat0 + (lat1 - lat0) * i / steps)
    for (i <- 0 until steps) pts += p.forward(lng1 - (lng1 - lng0) * i / steps, lat1)
    for (i <- 0 until steps) pts += p.forward(lng0, lat1 - (lat1 - lat0) * i / steps)
    val b = pts.result()
    math.abs(b.indices.map { i =>
      val (x0, y0) = b(i); val (x1, y1) = b((i + 1) % b.size)
      x0 * y1 - x1 * y0
    }.sum / 2)
  }

  /** Ellipsoidal lat/lng cell area via the equal-area auxiliary q (Snyder
    * eq. 3-12): A = a²·Δλ·(q(φ₂) − q(φ₁))/2 — computed here independently
    * of the Projection internals. */
  private def ellipsoidCellArea(lng0: Double, lat0: Double,
                                lng1: Double, lat1: Double): Double = {
    val a = 6378137.0; val f = 1.0 / 298.257222101
    val e2 = f * (2 - f); val e = math.sqrt(e2)
    def q(latDeg: Double): Double = {
      val s = math.sin(math.toRadians(latDeg))
      (1 - e2) * (s / (1 - e2 * s * s)
        - (1 / (2 * e)) * math.log((1 - e * s) / (1 + e * s)))
    }
    a * a * math.toRadians(lng1 - lng0) * (q(lat1) - q(lat0)) / 2
  }

  test("Albers CONUS: projection origin maps to (0, 0)") {
    val p = Projection.forEpsg(5070).get
    val (x, y) = p.forward(-96.0, 23.0)
    assert(math.abs(x) < 1e-6 && math.abs(y) < 1e-6, s"origin → ($x, $y)")
  }

  test("Albers CONUS: scale is true along both standard parallels only") {
    val p = Projection.forEpsg(5070).get
    val a = 6378137.0; val f = 1.0 / 298.257222101; val e2 = f * (2 - f)
    // k along a parallel by numerical differentiation of forward vs the
    // ellipsoidal parallel radius N·cos φ — no Projection internals used
    def kParallel(lat: Double): Double = {
      val d = 1e-6
      val (x0, y0) = p.forward(-100.0, lat)
      val (x1, y1) = p.forward(-100.0 + d, lat)
      val s = math.sin(math.toRadians(lat))
      val parallelRadius = (a / math.sqrt(1 - e2 * s * s)) * math.cos(math.toRadians(lat))
      math.hypot(x1 - x0, y1 - y0) / (parallelRadius * math.toRadians(d))
    }
    assert(math.abs(kParallel(29.5) - 1.0) < 1e-7, s"k(29.5)=${kParallel(29.5)}")
    assert(math.abs(kParallel(45.5) - 1.0) < 1e-7, s"k(45.5)=${kParallel(45.5)}")
    assert(kParallel(37.0) < 1.0 - 1e-4, "between the parallels the cone dips below scale")
    assert(kParallel(25.0) > 1.0 + 1e-4 && kParallel(49.0) > 1.0 + 1e-4,
      "outside the parallels scale exceeds 1")
  }

  test("Albers CONUS: equal-area invariant on 1° cells") {
    val p = Projection.forEpsg(5070).get
    for ((lng, lat) <- Seq((-120.0, 35.0), (-96.0, 29.0), (-75.0, 44.0))) {
      val proj = projectedCellArea(p, lng, lat, lng + 1, lat + 1)
      val ell = ellipsoidCellArea(lng, lat, lng + 1, lat + 1)
      assert(math.abs(proj / ell - 1) < 1e-6,
        s"cell at ($lng,$lat): projected $proj vs ellipsoid $ell")
    }
  }

  test("Albers round-trips over both areas of use") {
    val conus = Projection.forEpsg(5070).get
    var worst = 0.0
    for (lng <- BigDecimal(-124.0) to -67.0 by 1.5; lat <- BigDecimal(25.0) to 49.0 by 1.0) {
      val (x, y) = conus.forward(lng.toDouble, lat.toDouble)
      val (l2, p2) = conus.inverse(x, y)
      worst = math.max(worst, math.max(math.abs(l2 - lng.toDouble), math.abs(p2 - lat.toDouble)))
    }
    assert(worst < 1e-9, s"CONUS worst round-trip $worst deg")
    // southern-parallel cone (n < 0): the inverse sign handling
    val aus = Projection.forEpsg(3577).get
    for ((lng, lat) <- Seq((132.0, -25.0), (115.0, -33.0), (150.0, -12.0), (145.0, -42.0))) {
      val (x, y) = aus.forward(lng, lat)
      val (l2, p2) = aus.inverse(x, y)
      assert(math.abs(l2 - lng) < 1e-9 && math.abs(p2 - lat) < 1e-9,
        s"3577 round trip ($lng,$lat) → ($l2,$p2)")
    }
    // orientation: east of λ0 → x > 0, south of φ0 → y < 0
    val (xe, _) = aus.forward(140.0, -25.0)
    val (x0, ys) = aus.forward(132.0, -25.0)
    assert(xe > 0 && math.abs(x0) < 1e-6 && ys < 0)
  }

  // ---- Polar stereographic / Lambert conformal conic ---------------------

  /** Numeric local scale along a parallel: projected length of a tiny arc
    * over its ellipsoidal length a·m(φ)·Δλ. */
  private def parallelScale(p: Projection, lngDeg: Double, latDeg: Double): Double = {
    val a = 6378137.0; val f = 1.0 / 298.257223563
    val e2 = f * (2 - f)
    val dDeg = 1e-6
    val (x0, y0) = p.forward(lngDeg, latDeg)
    val (x1, y1) = p.forward(lngDeg + dDeg, latDeg)
    val s = math.sin(math.toRadians(latDeg))
    val trueLen = a * math.cos(math.toRadians(latDeg)) /
      math.sqrt(1 - e2 * s * s) * math.toRadians(dDeg)
    math.hypot(x1 - x0, y1 - y0) / trueLen
  }

  test("polar stereographic variant B reproduces the EPSG worked example") {
    // IOGP Guidance Note 7-2, method 9829: WGS84, lat_ts −71, λ0 70°E,
    // FE = FN = 6 000 000 → (120°E, 75°S) = (7 255 380.79 E, 7 053 389.56 N)
    val p = Projection.PolarStereographic(6378137.0, 298.257223563,
      -71.0, 70.0, 6000000.0, 6000000.0, Bounds(-180, -90, 180, -60))
    val (x, y) = p.forward(120.0, -75.0)
    assert(math.abs(x - 7255380.79) < 0.05, s"E = $x")
    assert(math.abs(y - 7053389.56) < 0.05, s"N = $y")
    val (l2, p2) = p.inverse(7255380.79, 7053389.56)
    assert(math.abs(l2 - 120.0) < 1e-6 && math.abs(p2 + 75.0) < 1e-6)
  }

  test("polar stereographic: pole at origin, true scale on lat_ts, conformal") {
    for (epsg <- Seq(3031, 3413, 3976)) {
      val p = Projection.forEpsg(epsg).get
      val ps = p.asInstanceOf[Projection.PolarStereographic]
      val polarLat = if (ps.latTsDeg < 0) -90.0 else 90.0
      val (xp, yp) = p.forward(77.0, polarLat) // any λ: the pole is a point
      assert(math.abs(xp) < 1e-6 && math.abs(yp) < 1e-6, s"$epsg pole → ($xp,$yp)")
      // scale exactly 1 on the standard parallel, >1 equatorward of it
      val k0 = parallelScale(p, 30.0, ps.latTsDeg)
      assert(math.abs(k0 - 1) < 1e-7, s"$epsg k(lat_ts) = $k0")
      val equatorward = if (ps.latTsDeg < 0) ps.latTsDeg + 8 else ps.latTsDeg - 8
      assert(parallelScale(p, 30.0, equatorward) > 1.0)
      val poleward = if (ps.latTsDeg < 0) ps.latTsDeg - 8 else ps.latTsDeg + 8
      assert(parallelScale(p, 30.0, poleward) < 1.0)
    }
  }

  test("polar stereographic round-trips over both polar caps") {
    // ±180° name the same meridian: compare longitudes modulo 360
    def lngDiff(a: Double, b: Double): Double = {
      val d = math.abs(a - b) % 360.0
      math.min(d, 360.0 - d)
    }
    val south = Projection.forEpsg(3031).get
    val north = Projection.forEpsg(3413).get
    var worst = 0.0
    for (lng <- BigDecimal(-180.0) to 175.0 by 17.5; lat <- BigDecimal(-89.0) to -61.0 by 3.5) {
      val (x, y) = south.forward(lng.toDouble, lat.toDouble)
      val (l2, p2) = south.inverse(x, y)
      worst = math.max(worst, math.max(lngDiff(l2, lng.toDouble), math.abs(p2 - lat.toDouble)))
    }
    for (lng <- BigDecimal(-180.0) to 175.0 by 17.5; lat <- BigDecimal(61.0) to 89.0 by 3.5) {
      val (x, y) = north.forward(lng.toDouble, lat.toDouble)
      val (l2, p2) = north.inverse(x, y)
      worst = math.max(worst, math.max(lngDiff(l2, lng.toDouble), math.abs(p2 - lat.toDouble)))
    }
    assert(worst < 1e-8, s"polar worst round-trip $worst deg")
    // the exact pole inverts to λ0
    assert(south.inverse(0.0, 0.0) == ((0.0, -90.0)))
  }

  test("LCC 2SP reproduces the Snyder worked example (Clarke 1866)") {
    // Snyder PP 1395 appendix, §15: Clarke 1866 (a 6378206.4, 1/f
    // 294.9786982), parallels 33/45, origin (23, −96) → point (35°N, 75°W)
    // projects to x = 1 894 410.9 m, y = 1 564 649.5 m
    val p = Projection.LambertConformalConic(6378206.4, 294.9786982,
      23.0, -96.0, 33.0, 45.0, 0.0, 0.0, Bounds(-125, 20, -60, 55))
    val (x, y) = p.forward(-75.0, 35.0)
    assert(math.abs(x - 1894410.9) < 0.5, s"x = $x")
    assert(math.abs(y - 1564649.5) < 0.5, s"y = $y")
    val (l2, p2) = p.inverse(x, y)
    assert(math.abs(l2 + 75.0) < 1e-8 && math.abs(p2 - 35.0) < 1e-8)
  }

  test("LCC: origin at (FE, FN), true scale on both parallels, shrink between") {
    for (epsg <- Seq(2154, 3347)) {
      val p = Projection.forEpsg(epsg).get
      val lcc = p.asInstanceOf[Projection.LambertConformalConic]
      val (x0, y0) = p.forward(lcc.lon0Deg, lcc.lat0Deg)
      assert(math.abs(x0 - lcc.falseEasting) < 1e-6 &&
        math.abs(y0 - lcc.falseNorthing) < 1e-6, s"$epsg origin → ($x0,$y0)")
      val k1 = parallelScale(p, lcc.lon0Deg, lcc.sp1Deg)
      val k2 = parallelScale(p, lcc.lon0Deg, lcc.sp2Deg)
      assert(math.abs(k1 - 1) < 1e-7 && math.abs(k2 - 1) < 1e-7, s"$epsg k=($k1,$k2)")
      val mid = (lcc.sp1Deg + lcc.sp2Deg) / 2
      assert(parallelScale(p, lcc.lon0Deg, mid) < 1.0)
    }
  }

  test("LCC round-trips over both areas of use") {
    var worst = 0.0
    for (epsg <- Seq(2154, 3347)) {
      val p = Projection.forEpsg(epsg).get
      val b = p.areaOfUse
      for (i <- 0 to 8; j <- 0 to 8) {
        val lng = b.left + (b.right - b.left) * i / 8
        val lat = b.bottom + (b.top - b.bottom) * j / 8
        val (x, y) = p.forward(lng, lat)
        val (l2, p2) = p.inverse(x, y)
        worst = math.max(worst, math.max(math.abs(l2 - lng), math.abs(p2 - lat)))
      }
    }
    assert(worst < 1e-8, s"LCC worst round-trip $worst deg")
  }

  // ---- Sinusoidal (MODIS grid) -------------------------------------------

  test("MODIS sinusoidal reproduces the published grid constants") {
    val p = Projection.forCrs("SR-ORG:6974").get
    // the canonical 10° MODIS tile is 1 111 950.5196666666 m
    val (tile, _) = p.forward(10.0, 0.0)
    assert(math.abs(tile - 1111950.5196666666) < 1e-3, s"tile width $tile")
    // v-tile boundary at 40°N: y = 10 007 554.677 − 5 · tile = 4 447 802.0787
    val (_, y40) = p.forward(0.0, 40.0)
    assert(math.abs(y40 - 4447802.0787) < 1e-3, s"y(40°) = $y40")
    // global west edge: x(−180°, 0°) = −20 015 109.354
    val (xw, _) = p.forward(-180.0, 0.0)
    assert(math.abs(xw - -20015109.354) < 1e-2, s"x(-180,0) = $xw")
  }

  test("sinusoidal is equal-area and round-trips") {
    val p = Projection.forCrs("MODIS").get
    val r = 6371007.181
    for ((lng, lat) <- Seq((10.0, 0.0), (-70.0, 45.0), (140.0, -30.0), (0.0, 75.0))) {
      val proj = projectedCellArea(p, lng, lat, lng + 1, lat + 1)
      val sphere = r * r * math.toRadians(1.0) *
        (math.sin(math.toRadians(lat + 1)) - math.sin(math.toRadians(lat)))
      assert(math.abs(proj / sphere - 1) < 1e-6, s"cell ($lng,$lat): $proj vs $sphere")
      val (x, y) = p.forward(lng, lat)
      val (l2, p2) = p.inverse(x, y)
      assert(math.abs(l2 - lng) < 1e-9 && math.abs(p2 - lat) < 1e-9)
    }
  }

  // ---- Well-known-CRS fallback table (P5): OSGB, NZTM, LAEA, UTM datums --

  test("OSGB Airy TM reproduces the OS worked example (projection layer)") {
    // "A guide to coordinate systems in Great Britain" (Ordnance Survey),
    // annex worked example: OSGB36 φ 52°39'27.2531"N, λ 1°43'4.5177"E →
    // E 651409.903, N 313177.270
    val tm = Projection.TransverseMercator(6377563.396, 299.3249646,
      49.0, -2.0, 0.9996012717, 400000.0, -100000.0, Bounds(-9, 49, 2, 61))
    val lat = 52 + 39.0 / 60 + 27.2531 / 3600
    val lng = 1 + 43.0 / 60 + 4.5177 / 3600
    val (e, n) = tm.forward(lng, lat)
    assert(math.abs(e - 651409.903) < 0.005, s"E = $e")
    assert(math.abs(n - 313177.270) < 0.005, s"N = $n")
    val (l2, p2) = tm.inverse(651409.903, 313177.270)
    assert(math.abs(l2 - lng) < 1e-7 && math.abs(p2 - lat) < 1e-7)
  }

  test("EPSG:27700 applies the OSGB36 Helmert datum shift from WGS84") {
    val p = Projection.forEpsg(27700).get
    // the same OS-guide station in ETRS89 (≈WGS84): 52°39'28.8282"N,
    // 1°42'57.8663"E; the classic single-Helmert set is quoted at ≈3.5 m
    val lat = 52 + 39.0 / 60 + 28.8282 / 3600
    val lng = 1 + 42.0 / 60 + 57.8663 / 3600
    val (e, n) = p.forward(lng, lat)
    assert(math.hypot(e - 651409.903, n - 313177.270) < 6.0,
      s"shifted grid = ($e, $n)")
    // WITHOUT the shift the error is the full ~100 m datum gap — the
    // Helmert leg is load-bearing, not decorative
    val bare = Projection.TransverseMercator(6377563.396, 299.3249646,
      49.0, -2.0, 0.9996012717, 400000.0, -100000.0, Bounds(-9, 49, 2, 61))
    val (e0, n0) = bare.forward(lng, lat)
    assert(math.hypot(e0 - 651409.903, n0 - 313177.270) > 50.0)
    // round-trip through the datum shift and back
    val (l2, p2) = p.inverse(e, n)
    assert(math.abs(l2 - lng) < 1e-6 && math.abs(p2 - lat) < 1e-6)
  }

  test("NZTM2000 and the UTM datum families resolve and round-trip") {
    val nz = Projection.forEpsg(2193).get
    val (x0, y0) = nz.forward(173.0, 0.0) // grid origin
    assert(math.abs(x0 - 1600000.0) < 1e-6 && math.abs(y0 - 10000000.0) < 1e-6)
    // NZTM spans ±7° of longitude — the Snyder series truncates at the
    // centimeter level out at the grid edge, so the edge tolerance is
    // 1e-6 deg (≈10 cm), not the in-zone 1e-8
    for ((lng, lat) <- Seq((174.7772, -41.2889), (172.6362, -43.5321), (168.0, -46.5))) {
      val (x, y) = nz.forward(lng, lat); val (l2, p2) = nz.inverse(x, y)
      assert(math.abs(l2 - lng) < 1e-6 && math.abs(p2 - lat) < 1e-6,
        s"NZTM round trip ($lng,$lat)")
    }
    // ETRS89/NAD83/GDA UTM: GRS80 vs WGS84 differs by 0.1 mm in b — the
    // zone grids must agree with the WGS84 zones at the centimeter level
    val etrs = Projection.forEpsg(25832).get
    val wgs = Projection.forEpsg(32632).get
    val (xe, ye) = etrs.forward(10.0, 50.0)
    val (xw, yw) = wgs.forward(10.0, 50.0)
    assert(math.hypot(xe - xw, ye - yw) < 0.01)
    assert(Projection.forEpsg(26910).isDefined) // NAD83 / UTM 10N
    val mga = Projection.forEpsg(28355).get // GDA94 / MGA 55
    val (xs, ys) = mga.forward(147.0, -37.0)
    assert(ys < 10000000.0 && xs > 0) // southern false northing carried
    assert(Projection.forEpsg(7855).isDefined) // GDA2020 / MGA 55
    // geographic datums coincident with WGS84 at working accuracy
    assert(Projection.forEpsg(4269).contains(Projection.Wgs84))
    assert(Projection.forEpsg(4258).contains(Projection.Wgs84))
  }

  test("LAEA Europe (EPSG:3035): center anchor, equal-area, round-trip") {
    val p = Projection.forEpsg(3035).get
    val (x0, y0) = p.forward(10.0, 52.0) // projection center → (FE, FN)
    assert(math.abs(x0 - 4321000.0) < 1e-6 && math.abs(y0 - 3210000.0) < 1e-6)
    for ((lng, lat) <- Seq((-8.0, 37.0), (25.0, 60.0), (10.0, 45.0), (35.0, 35.0))) {
      val proj = projectedCellArea(p, lng, lat, lng + 1, lat + 1)
      val ell = ellipsoidCellArea(lng, lat, lng + 1, lat + 1)
      assert(math.abs(proj / ell - 1) < 1e-6,
        s"cell at ($lng,$lat): projected $proj vs ellipsoid $ell")
      val (x, y) = p.forward(lng, lat)
      val (l2, p2) = p.inverse(x, y)
      assert(math.abs(l2 - lng) < 1e-9 && math.abs(p2 - lat) < 1e-9,
        s"3035 round trip ($lng,$lat) → ($l2,$p2)")
    }
  }

  test("CRS string resolution covers the non-EPSG authorities") {
    assert(Projection.forCrs("EPSG:5070").isDefined)
    assert(Projection.forCrs("EPSG:3577").isDefined)
    assert(Projection.forCrs("ESRI:54008").isDefined)
    assert(Projection.forCrs("modis").isDefined)
    assert(Projection.forCrs("sr-org:6974").isDefined)
    assert(Projection.forCrs("EPSG:99999").isEmpty)
  }
}
