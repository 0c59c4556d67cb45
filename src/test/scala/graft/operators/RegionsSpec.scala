package graft.operators

import graft.SparkSpec

class RegionsSpec extends SparkSpec {
  import spark.implicits._

  private def id(px: Long, py: Long) = px * 1048576L + py

  test("label: 4-connectivity splits diagonal touches, merges across rows") {
    // value layout (x right, y down):      1 1 2
    //                                      2 1 2
    //                                      1 2 2
    val cells = Seq(
      (0L, 0L, 1L), (1L, 0L, 1L), (2L, 0L, 2L),
      (0L, 1L, 2L), (1L, 1L, 1L), (2L, 1L, 2L),
      (0L, 2L, 1L), (1L, 2L, 2L), (2L, 2L, 2L)
    ).toDF("px", "py", "v")
    val got = Regions.label(cells).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(3)).toMap
    // region A: the L of 1s at (0,0),(1,0),(1,1) — min id = id(0,0)
    assert(got((0L, 0L)) == id(0, 0))
    assert(got((1L, 0L)) == id(0, 0))
    assert(got((1L, 1L)) == id(0, 0))
    // (0,2) is value 1 but only DIAGONALLY adjacent to (1,1): own region
    assert(got((0L, 2L)) == id(0, 2))
    // the 2s: (2,0),(2,1),(2,2),(1,2) connect; (0,1) is isolated
    assert(got((2L, 0L)) == id(1, 2).min(id(2, 0)))
    assert(got((1L, 2L)) == got((2L, 2L)) && got((2L, 1L)) == got((2L, 0L)))
    assert(got((0L, 1L)) == id(0, 1))
  }

  test("label: uniform raster collapses to one region, empty edges tolerated") {
    val uniform = (0L to 2L).flatMap(x => (0L to 2L).map(y => (x, y, 7L)))
      .toDF("px", "py", "v")
    val labels = Regions.label(uniform).select("region_id").distinct().collect()
    assert(labels.map(_.getLong(0)).toSeq == Seq(id(0, 0)))
    // checkerboard: no equal neighbors at all -> every pixel its own region
    val checker = (0L to 2L).flatMap(x => (0L to 2L).map(y => (x, y, (x + y) % 2)))
      .toDF("px", "py", "v")
    assert(Regions.label(checker).select("region_id").distinct().count() == 9)
  }

  test("regionSizes census matches the labeling") {
    val cells = Seq(
      (0L, 0L, 1L), (1L, 0L, 1L), (2L, 0L, 5L),
      (0L, 1L, 1L), (1L, 1L, 5L), (2L, 1L, 5L)
    ).toDF("px", "py", "v")
    val sizes = Regions.regionSizes(cells).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(sizes == Map(
      (1L, id(0, 0)) -> 3L,          // the 1-block
      (5L, id(1, 1)) -> 3L))         // 5s connect via (2,1): (1,1),(2,1),(2,0)
  }
}
