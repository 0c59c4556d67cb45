package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Focal halo-exchange vs a brute-force oracle over the assembled grid. */
class FocalSpec extends SparkSpec {
  import spark.implicits._

  private val bw = 4; private val bh = 3
  private val nx = 3; private val ny = 2 // 3×2 block lattice → 12×6 raster

  /** Deterministic grid: value = f(gx, gy); every 5th cell invalid. */
  private def value(gx: Int, gy: Int): Double = ((gx * 31 + gy * 17) % 23).toDouble
  private def isValid(gx: Int, gy: Int): Boolean = (gx + gy * 12) % 5 != 0

  private def blocks(): DataFrame = {
    val rows = for { by <- 0 until ny; bx <- 0 until nx } yield {
      val cells = for { y <- 0 until bh; x <- 0 until bw } yield {
        val gx = bx * bw + x; val gy = by * bh + y
        (if (isValid(gx, gy)) value(gx, gy) else -999.0, isValid(gx, gy))
      }
      (bx, by, bw, bh, cells.map(c => java.lang.Double.valueOf(c._1)), cells.map(_._2))
    }
    rows.toDF("block_x", "block_y", "width", "height", "values", "valid")
  }

  /** Brute-force focal over the 12×6 grid (window clipped at raster edge). */
  private def oracle(kernel: String, r: Int): Map[(Int, Int), Option[Double]] = {
    val W = nx * bw; val H = ny * bh
    (for { gy <- 0 until H; gx <- 0 until W } yield {
      val neigh = for {
        wy <- math.max(0, gy - r) to math.min(H - 1, gy + r)
        wx <- math.max(0, gx - r) to math.min(W - 1, gx + r)
        if isValid(wx, wy)
      } yield value(wx, wy)
      val v =
        if (neigh.isEmpty) None
        else Some(kernel match {
          case "mean"  => neigh.sum / neigh.size
          case "sum"   => neigh.sum
          case "min"   => neigh.min
          case "max"   => neigh.max
          case "count" => neigh.size.toDouble
        })
      (gx, gy) -> v
    }).toMap
  }

  private def collectFocal(df: DataFrame): Map[(Int, Int), Option[Double]] =
    df.select($"block_x", $"block_y", posexplode($"values"))
      .join(df.select($"block_x", $"block_y", posexplode($"valid").as(Seq("pos", "ok"))),
        Seq("block_x", "block_y", "pos"))
      .collect()
      .map { row =>
        val bx = row.getInt(0); val by = row.getInt(1); val pos = row.getInt(2)
        val gx = bx * bw + pos % bw; val gy = by * bh + pos / bw
        val v = if (row.getBoolean(4)) Some(row.getDouble(3)) else None
        (gx, gy) -> v
      }.toMap

  for (kernel <- Seq("mean", "sum", "min", "max", "count")) {
    test(s"focal $kernel matches the brute-force oracle across block seams") {
      val got = collectFocal(Focal.focal(blocks(), kernel, radius = 1))
      val want = oracle(kernel, 1)
      assert(got.size == nx * bw * ny * bh)
      for ((k, exp) <- want) {
        (got(k), exp) match {
          case (Some(g), Some(e)) => assert(math.abs(g - e) < 1e-9, s"cell $k")
          case (None, None)       =>
          case other              => fail(s"cell $k: $other")
        }
      }
    }
  }

  test("radius-2 window reaches across two block columns") {
    val got = collectFocal(Focal.focal(blocks(), "count", radius = 2))
    val want = oracle("count", 2)
    for ((k, exp) <- want) assert(got(k) == exp, s"cell $k")
  }

  test("output lattice matches input lattice (off-edge halos dropped)") {
    val out = Focal.focalMean(blocks())
    assert(out.count() == nx.toLong * ny)
    assert(out.select("block_x", "block_y").as[(Int, Int)].collect().toSet ==
      (for { bx <- 0 until nx; by <- 0 until ny } yield (bx, by)).toSet)
  }

  test("all-invalid neighborhood yields an invalid cell") {
    // single 1-cell-valid block lattice: a lone block whose only valid cell
    // is (0,0) → cells beyond the radius from it have no valid neighbor
    val one = Seq((0, 0, 4, 4,
      Seq.tabulate(16)(i => java.lang.Double.valueOf(i.toDouble)),
      Seq.tabulate(16)(_ == 0)))
      .toDF("block_x", "block_y", "width", "height", "values", "valid")
    val got = collectFocal(Focal.focalMean(one, radius = 1))
    assert(got((0, 0)) == Some(0.0)) // its own value, renormalized
    assert(got((3, 3)).isEmpty)      // far corner: no valid pixel in window
    assert(got((1, 1)) == Some(0.0)) // diagonal still inside the window
  }

  test("unknown kernel rejected") {
    intercept[IllegalArgumentException](Focal.focal(blocks(), "median"))
  }

  /** Brute-force weighted convolution over the assembled grid. */
  private def convOracle(weights: Seq[Seq[Double]], renorm: Boolean): Map[(Int, Int), Option[Double]] = {
    val r = weights.length / 2
    val W = nx * bw; val H = ny * bh
    (for { gy <- 0 until H; gx <- 0 until W } yield {
      var num = 0.0; var mass = 0.0; var n = 0
      for (wy <- 0 to 2 * r; wx <- 0 to 2 * r) {
        val sx = gx + wx - r; val sy = gy + wy - r
        if (sx >= 0 && sx < W && sy >= 0 && sy < H && isValid(sx, sy)) {
          n += 1
          num += weights(wy)(wx) * value(sx, sy)
          mass += weights(wy)(wx)
        }
      }
      val v =
        if (n == 0) None
        else if (!renorm) Some(num)
        else if (mass == 0.0) None
        else Some(num / mass)
      (gx, gy) -> v
    }).toMap
  }

  test("binomial blur kernel matches brute force with nodata renormalization") {
    val blur = Seq(Seq(1.0, 2.0, 1.0), Seq(2.0, 4.0, 2.0), Seq(1.0, 2.0, 1.0))
      .map(_.map(_ / 16))
    val got = collectFocal(Focal.convolve(blocks(), blur))
    val want = convOracle(blur, renorm = true)
    for ((k, exp) <- want) (got(k), exp) match {
      case (Some(g), Some(e)) => assert(math.abs(g - e) < 1e-9, s"cell $k")
      case (None, None)       =>
      case other              => fail(s"cell $k: $other")
    }
  }

  test("zero-sum gradient kernel (Sobel-x, unnormalized) matches brute force") {
    val sobel = Seq(Seq(-1.0, 0.0, 1.0), Seq(-2.0, 0.0, 2.0), Seq(-1.0, 0.0, 1.0))
    val got = collectFocal(Focal.convolve(blocks(), sobel, renormalize = false))
    val want = convOracle(sobel, renorm = false)
    for ((k, exp) <- want) (got(k), exp) match {
      case (Some(g), Some(e)) => assert(math.abs(g - e) < 1e-9, s"cell $k")
      case (None, None)       =>
      case other              => fail(s"cell $k: $other")
    }
  }

  test("horn slope: constant grid is flat, uniform ramp has the analytic angle, edges nodata") {
    // 12×6 ramp z = 3x: dz/dx = 3 → slope = atan(3) everywhere interior
    val ramp = (for { by <- 0 until ny; bx <- 0 until nx } yield {
      val cells = for { y <- 0 until bh; x <- 0 until bw }
        yield java.lang.Double.valueOf(3.0 * (bx * bw + x))
      (bx, by, bw, bh, cells, Seq.fill(bw * bh)(true))
    }).toDF("block_x", "block_y", "width", "height", "values", "valid")
    val got = collectFocal(Focal.slope(ramp, cellSize = 1.0))
    val want = math.atan(3.0) * 180 / math.Pi
    for (gy <- 1 until ny * bh - 1; gx <- 1 until nx * bw - 1)
      assert(math.abs(got((gx, gy)).get - want) < 1e-9, s"cell ($gx,$gy)")
    // raster edge cells lack the full window → nodata
    assert(got((0, 0)).isEmpty && got((nx * bw - 1, ny * bh - 1)).isEmpty)
    // flat grid → slope 0
    val flat = ramp.withColumn("values",
      transform(col("values"), _ => lit(7.0)))
    val g2 = collectFocal(Focal.slope(flat, cellSize = 1.0))
    assert(g2((2, 2)) == Some(0.0))
  }

  test("tile-block bridge: focal mean flows across TILE seams and round-trips tile keys") {
    import graft.core.grid.LatLngGrid
    val grid = LatLngGrid(90, 144) // 4×2 world tiles, 1 block per tile
    val two = grid.tilesDF(spark).filter(col("tile_idx") < 2) // horizontally adjacent
    val blocks = Raster.synthesizeBand(Raster.tilesToBlocks(two, grid), band = 1,
      nodataEvery = 7)
    val lattice = Focal.fromTileBlocks(blocks, grid)

    // brute-force oracle over the collected 288×144 global raster
    val in = lattice.select($"block_x", $"block_y", $"values", $"valid").collect()
      .flatMap { r =>
        val bx = r.getLong(0); val by = r.getLong(1)
        val vs = r.getSeq[Double](2); val ok = r.getSeq[Boolean](3)
        vs.indices.map { i =>
          (bx * 144 + i % 144, by * 144 + i / 144) -> (vs(i), ok(i))
        }
      }.toMap
    def expect(gx: Long, gy: Long): Option[Double] = {
      val n = for {
        dy <- -1 to 1; dx <- -1 to 1
        c <- in.get((gx + dx, gy + dy)) if c._2
      } yield c._1
      if (n.isEmpty) None else Some(n.sum / n.size)
    }

    val out = Focal.focalMean(lattice, radius = 1)
    val got = out.select($"block_x", $"block_y", $"values", $"valid").collect()
      .flatMap { r =>
        val bx = r.getLong(0); val by = r.getLong(1)
        val vs = r.getSeq[java.lang.Double](2); val ok = r.getSeq[Boolean](3)
        vs.indices.map { i =>
          (bx * 144 + i % 144, by * 144 + i / 144) ->
            (if (ok(i)) Some(vs(i).doubleValue) else None)
        }
      }.toMap
    assert(got.size == 2 * 144 * 144)
    // the seam column between the two tiles must average across both
    val seam = (143L, 50L); val overSeam = (144L, 50L)
    for (k <- Seq(seam, overSeam, (0L, 0L), (287L, 143L))) {
      (got(k), expect(k._1, k._2)) match {
        case (Some(g), Some(e)) => assert(math.abs(g - e) < 1e-9, s"cell $k")
        case (None, None)       =>
        case other              => fail(s"cell $k: $other")
      }
    }
    // spot-check 500 deterministic cells across the full raster
    for (s <- 0 until 500) {
      val k = ((s * 7919L) % 288, (s * 104729L) % 144)
      (got(k), expect(k._1, k._2)) match {
        case (Some(g), Some(e)) => assert(math.abs(g - e) < 1e-9, s"cell $k")
        case (None, None)       =>
        case other              => fail(s"cell $k: $other")
      }
    }

    // round-trip: back to tile keys for the sink
    val back = Focal.toTileBlocks(out, grid)
    val keys = back.select("tile_id", "block_row", "block_col")
      .as[(String, Int, Int)].collect().toSet
    assert(keys == Set(("90N_180W", 0, 0), ("90N_090W", 0, 0)))
  }

  test("aspect: downslope bearing from north; flat cells are nodata") {
    def ramp(f: (Int, Int) => Double) = (for { by <- 0 until ny; bx <- 0 until nx } yield {
      val cells = for { y <- 0 until bh; x <- 0 until bw }
        yield java.lang.Double.valueOf(f(bx * bw + x, by * bh + y))
      (bx, by, bw, bh, cells, Seq.fill(bw * bh)(true))
    }).toDF("block_x", "block_y", "width", "height", "values", "valid")
    // z = x rises eastward → downslope west (270°); z = y rises southward → downslope north (0°)
    val east = collectFocal(Focal.aspect(ramp((x, _) => x.toDouble), 1.0))
    assert(math.abs(east((3, 3)).get - 270.0) < 1e-9)
    val south = collectFocal(Focal.aspect(ramp((_, y) => y.toDouble), 1.0))
    assert(math.abs(south((3, 3)).get - 0.0) < 1e-9)
    val flat = collectFocal(Focal.aspect(ramp((_, _) => 5.0), 1.0))
    assert(flat((3, 3)).isEmpty) // zero gradient → nodata
    assert(east((0, 0)).isEmpty) // incomplete window → nodata
  }

  test("hillshade: sun-facing gentle slope brighter than flat, away-facing darker") {
    def ramp(f: (Int, Int) => Double) = (for { by <- 0 until ny; bx <- 0 until nx } yield {
      val cells = for { y <- 0 until bh; x <- 0 until bw }
        yield java.lang.Double.valueOf(f(bx * bw + x, by * bh + y))
      (bx, by, bw, bh, cells, Seq.fill(bw * bh)(true))
    }).toDF("block_x", "block_y", "width", "height", "values", "valid")
    val flat = collectFocal(Focal.hillshade(ramp((_, _) => 5.0), 1.0))((3, 3)).get
    assert(math.abs(flat - 255.0 * math.sin(math.toRadians(45))) < 1e-9)
    // z = 0.5x: downslope west (270°), sun NW (315°) → cos 45° > 0 → brighter
    val toSun = collectFocal(Focal.hillshade(ramp((x, _) => 0.5 * x), 1.0))((3, 3)).get
    // z = −0.5x: downslope east (90°), 225° off the sun → darker
    val offSun = collectFocal(Focal.hillshade(ramp((x, _) => -0.5 * x), 1.0))((3, 3)).get
    assert(toSun > flat && offSun < flat, s"$offSun < $flat < $toSun expected")
  }

  test("non-square or even kernels rejected") {
    intercept[IllegalArgumentException](
      Focal.convolve(blocks(), Seq(Seq(1.0, 1.0), Seq(1.0, 1.0))))
    intercept[IllegalArgumentException](
      Focal.convolve(blocks(), Seq(Seq(1.0, 1.0, 1.0), Seq(1.0, 1.0), Seq(1.0, 1.0, 1.0))))
  }

  test("mixed block sizes fail loudly instead of mis-assembling halos") {
    // two horizontally adjacent blocks with different widths: their halo
    // strips meet in one gather group, where the runtime guard must raise
    val mixed = Seq(
      (0L, 0L, 4, 3, Seq.fill(12)(java.lang.Double.valueOf(1.0)), Seq.fill(12)(true)),
      (1L, 0L, 8, 3, Seq.fill(24)(java.lang.Double.valueOf(2.0)), Seq.fill(24)(true))
    ).toDF("block_x", "block_y", "width", "height", "values", "valid")
    val e = intercept[Exception](Focal.focalMean(mixed, radius = 1).collect())
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => Option(x.getMessage).toSeq ++ messages(x.getCause))
    assert(messages(e).exists(_.contains("non-uniform block sizes")),
      s"expected the uniform-size guard to fire, got: $e")
  }
}
