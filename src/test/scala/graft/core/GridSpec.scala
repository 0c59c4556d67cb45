package graft.core

import graft.SparkSpec
import graft.core.grid._

/** Grid math — ports the shape of tests/test_grids.py (tile-id round trips,
  * seed counts, block sizing). */
class GridSpec extends SparkSpec {

  test("10/40000 world grid has 648 tiles (reference tests/test_pipe.py:30-37)") {
    val g = LatLngGrid(10, 40000)
    assert(g.numTiles == 648)
    assert(g.blockSize == 400)
    assert(g.xres == 10.0 / 40000)
  }

  test("1/4000 grid: 64800 tiles, block 400") {
    val g = LatLngGrid(1, 4000)
    assert(g.numTiles == 64800L)
    assert(g.blockSize == 400)
  }

  test("tile id naming matches reference format (lat_lng_grid.py:77-91)") {
    val g = LatLngGrid(10, 40000)
    assert(g.tileId(0) == "90N_180W")
    assert(g.tileId(647) == "80S_170E")
    assert(g.pointTileId(0.5, 0.5) == "10N_000E")
    assert(g.pointTileId(-179.9, 89.9) == "90N_180W")
    assert(g.pointTileId(9.9, -0.1) == "00N_000E")
  }

  test("reference test vectors verbatim (tests/test_grids.py:10-127)") {
    // block sizing across the registry
    assert(LatLngGrid(3, 33600).blockSize == 480)
    assert(LatLngGrid(8, 32000).blockSize == 400)
    assert(LatLngGrid(90, 27008).blockSize == 128)
    assert(LatLngGrid(90, 9984).blockSize == 416)
    // 10° grid point → tile id
    val g10 = LatLngGrid(10, 40000)
    assert(g10.pointTileId(0, 0) == "00N_000E")
    assert(g10.pointTileId(1, 1) == "10N_000E")
    assert(g10.pointTileId(-1, -1) == "00N_010W")
    assert(g10.pointTileId(90, 90) == "90N_090E")
    // 8° grid: edges do NOT intersect the equator/central meridian (offsets)
    val g8 = LatLngGrid(8, 32000)
    assert(g8.pointTileId(0, 0) == "04N_004W")
    assert(g8.pointTileId(1, 1) == "04N_004W")
    assert(g8.pointTileId(-1, -1) == "04N_004W")
    assert(g8.pointTileId(-5, 5) == "12N_012W")
    assert(g8.pointTileId(5, -5) == "04S_004E")
    // WM tile counts: zoom_1 → 1, zoom_10 → 16, zoom_14 → 4096
    assert(WebMercatorGrid(1).numTiles == 1)
    assert(WebMercatorGrid(10).numTiles == 16)
    assert(WebMercatorGrid(14).numTiles == 4096)
    intercept[IllegalArgumentException](GridFactory("zoom_30"))
  }

  test("zoom-22 seed is 268M tiles and plans without driver materialization") {
    val g = WebMercatorGrid(22)
    assert(g.numTiles == 268435456L)
    // the seed is spark.range + column math: limiting stays lazy — no
    // 268M-row collect anywhere (the scale premise of SURVEY §2/S1)
    assert(g.tilesDF(spark).limit(3).count() == 3)
    assert(g.tileId(g.numTiles - 1) == "16383R_16383C")
  }

  test("tileBounds round-trips tile ids") {
    val g = LatLngGrid(10, 40000)
    for (i <- Seq(0L, 35L, 36L, 323L, 647L)) {
      val id = g.tileId(i)
      val b = g.tileBounds(id)
      assert(b.width == 10 && b.height == 10)
      // top-left corner maps back to the same tile
      assert(g.pointTileId(b.left + 0.001, b.top - 0.001) == id)
    }
  }

  test("snap coordinates to pixel lattice, top-left bias (grid.py:71-97)") {
    val g = LatLngGrid(10, 40000)
    val (top, left) = g.snap(0.50001, 10.10001)
    assert(top >= 0.50001 && top - 0.50001 <= g.yres)
    assert(left <= 10.10001 && 10.10001 - left <= g.xres)
  }

  test("WebMercator grids: tile counts and ids (wm_grid.py:14-51)") {
    assert(WebMercatorGrid(0).numTiles == 1)
    assert(WebMercatorGrid(8).numTiles == 1)
    assert(WebMercatorGrid(12).numTiles == 256)
    assert(WebMercatorGrid(12).tileId(0) == "000R_000C")
    assert(WebMercatorGrid(12).tileId(255) == "015R_015C")
    assert(WebMercatorGrid(12).blockSize == 256)
    assert(WebMercatorGrid(12).cols == 65536 / 16 * 16) // ≤ 65536 px per tile
  }

  test("WM tileBounds covers the world exactly") {
    val g = WebMercatorGrid(12)
    val first = g.tileBounds("000R_000C")
    val last = g.tileBounds("015R_015C")
    assert(math.abs(first.left + g.extent) < 1e-6)
    assert(math.abs(first.top - g.extent) < 1e-6)
    assert(math.abs(last.right - g.extent) < 1e-6)
    assert(math.abs(last.bottom + g.extent) < 1e-6)
  }

  test("tilesDF agrees with driver-side tile math, distributed") {
    val g = LatLngGrid(10, 40000)
    val rows = g.tilesDF(spark).collect()
    assert(rows.length == 648)
    val byIdx = rows.map(r => r.getLong(0) -> r).toMap
    for (i <- Seq(0L, 100L, 647L)) {
      val r = byIdx(i)
      assert(r.getString(1) == g.tileId(i))
      val b = g.tileBounds(g.tileId(i))
      assert(r.getDouble(2) == b.left && r.getDouble(3) == b.bottom &&
        r.getDouble(4) == b.right && r.getDouble(5) == b.top)
    }
  }

  test("grid factory resolves the reference registry (grid_factory.py:15-27)") {
    assert(GridFactory("10/40000").isInstanceOf[LatLngGrid])
    assert(GridFactory("zoom_14").isInstanceOf[WebMercatorGrid])
    intercept[IllegalArgumentException](GridFactory("nope"))
  }

  test("bounds intersection/union algebra") {
    val a = Bounds(0, 0, 10, 10)
    val b = Bounds(5, 5, 15, 15)
    assert(a.intersects(b))
    assert(a.intersection(b).contains(Bounds(5, 5, 10, 10)))
    assert(a.union(b) == Bounds(0, 0, 15, 15))
    // touching is not interior-intersecting (raster_src_tile.py:155-161)
    assert(!a.intersects(Bounds(10, 0, 20, 10)))
  }
}
