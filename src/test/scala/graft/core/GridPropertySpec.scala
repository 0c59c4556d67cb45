package graft.core

import graft.core.grid.{LatLngGrid, WebMercatorGrid}
import org.scalatest.funsuite.AnyFunSuite

/** Property-style grid/type laws over seeded random samples (the upgrade of
  * the reference's hand-case tests promised in SURVEY §5; plain scalacheck
  * Gens replaced with a seeded sampler to stay inside the dependency set). */
class GridPropertySpec extends AnyFunSuite {

  private val grids = Seq(LatLngGrid(10, 40000), LatLngGrid(1, 4000), LatLngGrid(90, 1008))
  private def samples(n: Int)(f: (Double, Double) => Unit): Unit = {
    val rnd = new scala.util.Random(42)
    (1 to n).foreach { _ =>
      f(rnd.between(-179.999, 179.999), rnd.between(-89.999, 89.999))
    }
  }

  test("every point maps to a tile whose bounds contain it (500 samples)") {
    samples(500) { (x, y) =>
      grids.foreach { g =>
        val id = g.pointTileId(x, y)
        val b = g.tileBounds(id)
        assert(x >= b.left && x <= b.right, s"$id $b x=$x")
        assert(y >= b.bottom && y <= b.top, s"$id $b y=$y")
      }
    }
  }

  test("tileId is a bijection over the index range") {
    grids.foreach { g =>
      val ids = (0L until g.numTiles).map(g.tileId)
      assert(ids.distinct.length == ids.length)
      // spot-check round trips (full scan for small grids)
      val check = if (g.numTiles < 1000) ids else ids.take(100) ++ ids.takeRight(100)
      check.foreach { id =>
        val b = g.tileBounds(id)
        assert(g.pointTileId(b.left + 1e-9, b.top - 1e-9) == id)
      }
    }
  }

  test("snap never moves a point more than one pixel, top-left biased") {
    val g = LatLngGrid(1, 4000)
    samples(300) { (x, y) =>
      val (top, left) = g.snap(y, x)
      assert(top >= y && top - y <= g.yres + 1e-9)
      assert(left <= x && x - left <= g.xres + 1e-9)
    }
  }

  test("WebMercator tile bounds tile the plane without gaps") {
    val g = WebMercatorGrid(12)
    val rnd = new scala.util.Random(7)
    (1 to 200).foreach { _ =>
      val r = rnd.nextInt(g.tilesPerSide - 1)
      val c = rnd.nextInt(g.tilesPerSide - 1)
      val a = g.tileBounds(f"${r}%03dR_${c}%03dC")
      val right = g.tileBounds(f"${r}%03dR_${c + 1}%03dC")
      val below = g.tileBounds(f"${r + 1}%03dR_${c}%03dC")
      assert(math.abs(a.right - right.left) < 1e-6)
      assert(math.abs(a.bottom - below.top) < 1e-6)
    }
  }

  test("reproject round trip is identity within tolerance") {
    import graft.functions.Reproject
    val rnd = new scala.util.Random(13)
    (1 to 300).foreach { _ =>
      val x = rnd.between(-179.999, 179.999)
      val y = rnd.between(-85.0, 85.0)
      val (mx, my) = Reproject.toWebMercator(x, y)
      val (bx, by) = Reproject.toWgs84(mx, my)
      assert(math.abs(bx - x) < 1e-9 && math.abs(by - y) < 1e-9)
    }
  }

  test("pixel type ranges are consistent with widen-compute storage") {
    PixelType.names.foreach { n =>
      val t = PixelType.of(n)
      val (lo, hi) = t.range
      assert(lo < hi)
      if (!t.isFloat) {
        val sparkMax = t.sparkType match {
          case org.apache.spark.sql.types.ByteType => Byte.MaxValue.toDouble
          case org.apache.spark.sql.types.ShortType => Short.MaxValue.toDouble
          case org.apache.spark.sql.types.IntegerType => Int.MaxValue.toDouble
          case org.apache.spark.sql.types.LongType => Long.MaxValue.toDouble
          case _ => Double.MaxValue
        }
        assert(hi <= sparkMax, s"$n storage range exceeds compute type")
      }
    }
  }

  test("calc parser round-trips random arithmetic expressions") {
    import graft.functions.Calc
    val rnd = new scala.util.Random(99)
    val ops = Seq("+", "-", "*", "/")
    def randExpr(depth: Int): String =
      if (depth == 0) (if (rnd.nextBoolean()) "A" else (rnd.nextInt(9) + 1).toString)
      else s"(${randExpr(depth - 1)} ${ops(rnd.nextInt(ops.length))} ${randExpr(depth - 1)})"
    (1 to 100).foreach { _ =>
      val e = randExpr(3)
      val ast = Calc.parse(e) // must not throw; structure is exercised via compile
      assert(ast != null)
    }
  }
}
