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
      Reproject.pointTransform("EPSG:2154", "EPSG:4326") // Lambert-93 not shipped
    }
  }
}
