package graft.operators

import graft.SparkSpec
import graft.functions.GeoFunctions
import org.apache.spark.sql.functions._

/** Vector rasterization — ports tests/test_vector_src_tile.py (burn count /
  * burn value semantics) against hand-computed pixel covers. */
class RasterizeSpec extends SparkSpec {
  import spark.implicits._

  test("pixelCover: unit square on a 1° lattice covers exactly its pixels") {
    val wkb = GeoFunctions.write(GeoFunctions.envelope(10, 20, 13, 22))
    val cover = Rasterize.pixelCover(wkb, originX = 0, originY = 90, xres = 1, yres = 1)
    // 3° × 2° → 6 pixels; px from 10..12, py from 90-22=68..69
    assert(cover.size == 6)
    assert(cover.toSet == (for (px <- 10 to 12; py <- 68 to 69) yield (px, py)).toSet)
  }

  test("pixel centers decide coverage (ALL_TOUCHED=FALSE default)") {
    // half-pixel sliver: covers no pixel center in its row
    val wkb = GeoFunctions.write(GeoFunctions.envelope(0, 0, 0.4, 1))
    val cover = Rasterize.pixelCover(wkb, 0, 90, 1, 1)
    assert(cover.isEmpty)
  }

  test("burn count: overlap adds (vector_src_tile.py:164-167, A1)") {
    val f1 = GeoFunctions.write(GeoFunctions.envelope(0, 88, 2, 90)) // py 0..1, px 0..1
    val f2 = GeoFunctions.write(GeoFunctions.envelope(1, 88, 3, 90)) // px 1..2
    val features = Seq((f1, 5L), (f2, 7L)).toDF("geom", "value")
    val px = Rasterize.explodeToPixels(features, 0, 90, 1, 1)
    val counted = Rasterize.rasterizeCount(px).collect()
      .map(r => (r.getInt(0), r.getInt(1)) -> r.getLong(2)).toMap
    assert(counted((0, 0)) == 1 && counted((1, 0)) == 2 && counted((2, 1)) == 1)
  }

  test("burn value: ordered burn ≡ max/min (A2, deterministic)") {
    val f1 = GeoFunctions.write(GeoFunctions.envelope(0, 88, 2, 90))
    val f2 = GeoFunctions.write(GeoFunctions.envelope(1, 88, 3, 90))
    val features = Seq((f1, 5L), (f2, 7L)).toDF("geom", "value")
    val px = Rasterize.explodeToPixels(features, 0, 90, 1, 1)
    val asc = Rasterize.rasterizeValue(px, ascending = true).collect()
      .map(r => (r.getInt(0), r.getInt(1)) -> r.getLong(2)).toMap
    assert(asc((0, 0)) == 5 && asc((1, 0)) == 7) // overlap → larger wins
    val desc = Rasterize.rasterizeValue(px, ascending = false).collect()
      .map(r => (r.getInt(0), r.getInt(1)) -> r.getLong(2)).toMap
    assert(desc((1, 0)) == 5) // desc order → smaller wins last
  }

  test("polygon with hole covers only the ring area") {
    val g = GeoFunctions.readWkt(
      "POLYGON ((0 80, 10 80, 10 90, 0 90, 0 80), (3 83, 7 83, 7 87, 3 87, 3 83))")
    val cover = Rasterize.pixelCover(GeoFunctions.write(g), 0, 90, 1, 1)
    assert(cover.size == 100 - 16)
  }

  test("row-banded explode burns identically to one scanline (skew split)") {
    import spark.implicits._
    val g = GeoFunctions.write(GeoFunctions.envelope(-170, 10, -150, 30))
    val f = Seq((g, 1L)).toDF("geom", "value")
    def burn(band: Int) =
      Rasterize.explodeToPixels(f, -180, 90, 0.25, 0.25, rowBand = band)
        .orderBy("px", "py").collect().toSeq
    // 80 pixel rows → 12 bands of 7 vs one band; same pixel set either way
    val banded = burn(7)
    assert(banded == burn(1 << 20))
    assert(banded.size == 80 * 80)
  }
}
