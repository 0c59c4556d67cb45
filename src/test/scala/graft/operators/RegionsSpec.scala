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

  test("pixelId guard: py at 2^20 raises loudly instead of aliasing labels") {
    // (0, 2^20) would alias with (1, 0) under the 2^20 packing — the guard
    // must raise, not mislabel
    val cells = Seq((0L, 0L, 1L), (0L, 1048576L, 1L)).toDF("px", "py", "v")
    val ex = intercept[Exception] { Regions.label(cells).collect() }
    def messages(t: Throwable): String =
      if (t == null) "" else t.getMessage + " | " + messages(t.getCause)
    assert(messages(ex).contains("row-packing bound"))
    // negative coordinates are equally out of contract
    val neg = Seq((-1L, 0L, 1L), (0L, 0L, 1L)).toDF("px", "py", "v")
    val ex2 = intercept[Exception] { Regions.label(neg).collect() }
    assert(messages(ex2).contains("row-packing bound"))
  }

  test("sieveAbsorb: small region takes the largest neighbor's value") {
    // layout (x right, y down):   1 1 1 2
    //                             1 1 1 2
    //                             3 2 2 2
    // region of 1s: 6 px; region of 2s: 5 px; the single 3 absorbs into
    // the 1s (largest neighbor), NOT the 2s
    val cells = Seq(
      (0L, 0L, 1L), (1L, 0L, 1L), (2L, 0L, 1L), (3L, 0L, 2L),
      (0L, 1L, 1L), (1L, 1L, 1L), (2L, 1L, 1L), (3L, 1L, 2L),
      (0L, 2L, 3L), (1L, 2L, 2L), (2L, 2L, 2L), (3L, 2L, 2L)
    ).toDF("px", "py", "v")
    val got = Regions.sieveAbsorb(cells, minPx = 2).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(got((0L, 2L)) == 1L)
    // every other pixel keeps its value
    assert(got((3L, 0L)) == 2L && got((0L, 0L)) == 1L && got((2L, 2L)) == 2L)
  }

  test("sieveAbsorb: equal-size neighbors tie to the smaller region id; " +
    "isolated small region keeps its value") {
    // layout:  1 3 2    — 1-region and 2-region both size 3; the 3 absorbs
    //          1 3 2      into the 1s (smaller region id = id(0,0))
    //          1 3 2      wait: the 3s are 3 px too — use minPx=4
    val cells = Seq(
      (0L, 0L, 1L), (1L, 0L, 3L), (2L, 0L, 2L),
      (0L, 1L, 1L), (1L, 1L, 3L), (2L, 1L, 2L),
      (0L, 2L, 1L), (1L, 2L, 3L), (2L, 2L, 2L)
    ).toDF("px", "py", "v")
    val got = Regions.sieveAbsorb(cells, minPx = 4).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    // all three columns are sub-threshold; each absorbs from its largest
    // neighbor's ORIGINAL value (one pass, original labels). The 3s have
    // two equal-size neighbors — tie goes to the smaller region id (the 1s)
    assert(got((1L, 0L)) == 1L && got((1L, 1L)) == 1L && got((1L, 2L)) == 1L)
    assert(got((0L, 0L)) == 3L) // 1s' only neighbor is the 3-region
    assert(got((2L, 0L)) == 3L) // 2s' only neighbor is the 3-region
    // an isolated region with no neighbors keeps its value
    val lone = Seq((10L, 10L, 9L)).toDF("px", "py", "v")
    val kept = Regions.sieveAbsorb(lone, minPx = 2).collect()
    assert(kept.length == 1 && kept.head.getLong(2) == 9L)
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
