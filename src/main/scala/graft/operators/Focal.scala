package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Focal (neighborhood) raster statistics over the block plane — the one
  * raster primitive whose distribution is genuinely non-trivial: a 3×3
  * focal mean needs pixels OWNED BY NEIGHBORING BLOCKS, so blocks cannot be
  * processed independently the way every per-pixel op (P1/P2) can.
  *
  * The reference has no focal ops (gfw_pixetl is strictly per-pixel +
  * warp, `tiles/utils/transform.py:15-68`), but any raster engine claiming
  * its surface grows one immediately (slope/hillshade/smoothing are all
  * focal). This is the beyond-parity raster analog of the LLM-pipeline
  * operators.
  *
  * Spark-first design — HALO EXCHANGE, not replication:
  *
  *   1. Every block emits its full payload to itself, plus eight edge
  *      STRIPS of thickness `radius` addressed to its lattice neighbors.
  *      Shuffle volume is `1 + (2r(w+h)+4r²)/(w·h)` × the raster — at
  *      512-px blocks and r=1 that is 1.008×, against 9× for whole-block
  *      replication.
  *   2. One `groupBy` over the destination block key gathers a block's
  *      center + up to 8 halos. Each strip cell is pre-addressed to its
  *      index in the receiver's padded `(w+2r)×(h+2r)` window, so assembly
  *      is `map_from_entries` + one `transform` — and the convolution
  *      unrolls the (2r+1)² window offsets into a plan-time expression
  *      tree over the padded arrays. No UDF anywhere: the whole operator
  *      stays inside whole-stage codegen.
  *
  * Lattice edges have no emitting neighbor, so their halo cells stay
  * absent and the kernel renormalizes over the pixels that exist — the
  * standard GIS focal-statistics convention (a cell's output is valid iff
  * its window contains ≥1 valid pixel, nodata centers included).
  *
  * Input schema (a uniform block lattice; one band per call):
  *   (block_x, block_y, width: int, height: int, values: array<double>,
  *    valid: array<boolean>)   — row-major, y growing downward.
  * All blocks must share width/height — a runtime guard in the gather
  * raises on any lattice cell where mixed sizes meet.
  */
object Focal {

  /** Supported kernels: statistics over the valid pixels of the (2r+1)²
    * window centered on each cell. */
  val kernels: Set[String] = Set("mean", "sum", "min", "max", "count")

  def focalMean(blocks: DataFrame, radius: Int = 1): DataFrame =
    focal(blocks, "mean", radius)

  /** The halo-exchange focal operator. Returns the same lattice with
    * `values`/`valid` replaced by the kernel output. */
  def focal(blocks: DataFrame, kernel: String, radius: Int = 1): DataFrame = {
    require(kernels.contains(kernel), s"unknown focal kernel: $kernel")
    convolveWith(blocks, radius) { cells =>
      val n = cells.map(_._2).reduce(_ + _)
      val value = kernel match {
        case "mean"  => cells.map(c => coalesce(c._1, lit(0.0))).reduce(_ + _) / n
        case "sum"   => cells.map(c => coalesce(c._1, lit(0.0))).reduce(_ + _)
        case "min"   => least(cells.map(_._1): _*)
        case "max"   => greatest(cells.map(_._1): _*)
        case "count" => n.cast("double")
      }
      (value, n)
    }
  }

  /** Weighted-kernel convolution over the same halo exchange — blur /
    * sharpen / gradient filters. `weights` is the (2r+1)×(2r+1) kernel,
    * row-major, top-left first (radius inferred from its size).
    *
    * `renormalize = true` (smoothing kernels): a cell's output divides by
    * the weight mass of its VALID window cells, the GIS convention that
    * keeps blur kernels unbiased at nodata holes and raster edges.
    * `renormalize = false` (derivative kernels like Sobel, whose weights
    * sum to 0): invalid cells contribute 0 and the raw weighted sum is
    * returned — renormalizing a zero-sum kernel would be meaningless. */
  def convolve(blocks: DataFrame, weights: Seq[Seq[Double]],
               renormalize: Boolean = true): DataFrame = {
    val side = weights.length
    require(side % 2 == 1 && side >= 3 && weights.forall(_.length == side),
      s"kernel must be square with odd side >= 3, got ${weights.map(_.length)}")
    convolveWith(blocks, side / 2) { cells =>
      val num = cells.map { case (v, _, wx, wy) =>
        val wt = weights(wy)(wx)
        if (wt == 0.0) lit(0.0) else coalesce(v * wt, lit(0.0))
      }.reduce(_ + _)
      val n = cells.map(_._2).reduce(_ + _)
      if (!renormalize) (num, n)
      else {
        val mass = cells.map { case (v, _, wx, wy) =>
          val wt = weights(wy)(wx)
          if (wt == 0.0) lit(0.0) else when(v.isNotNull, lit(wt)).otherwise(lit(0.0))
        }.reduce(_ + _)
        (when(mass =!= 0.0, num / mass), n)
      }
    }
  }

  /** Horn (1981) slope — the terrain op every raster engine grows next.
    * dz/dx and dz/dy are the two Sobel-weighted gradients over the same
    * halo-exchanged 3×3 window, computed in ONE pass from the same cell
    * expressions (no second exchange, no lattice self-join);
    * slope = atan(√((dz/dx)² + (dz/dy)²)) in degrees. GDAL-default edge
    * semantics: a cell needs its FULL window (n = 9) or it is nodata —
    * a one-sided gradient at a raster edge is a lie, not a value. */
  def slope(blocks: DataFrame, cellSize: Double): DataFrame = {
    require(cellSize > 0, "cellSize must be positive")
    convolveWith(blocks, 1) { cells =>
      val (gx, gy, n) = gradients(cells, cellSize)
      (when(n === 9, atan(sqrt(pow(gx, 2) + pow(gy, 2))) * (180.0 / math.Pi)), n)
    }
  }

  /** Aspect: compass bearing of the DOWNSLOPE direction in degrees from
    * north, clockwise, [0, 360). Coordinates are (x east, row-index y
    * south), so downslope = −∇z has east component −gx and north component
    * +gy, giving bearing atan2(−gx, gy). Flat cells (zero gradient) and
    * incomplete windows are nodata. */
  def aspect(blocks: DataFrame, cellSize: Double): DataFrame = {
    require(cellSize > 0, "cellSize must be positive")
    convolveWith(blocks, 1) { cells =>
      val (gx, gy, n) = gradients(cells, cellSize)
      val bearing = pmod(atan2(-gx, gy) * (180.0 / math.Pi), lit(360.0))
      (when(n === 9 && (gx =!= 0.0 || gy =!= 0.0), bearing), n)
    }
  }

  /** Hillshade: illumination of the surface by a sun at (azimuthDeg from
    * north clockwise, altitudeDeg above horizon), in [0, 255].
    * cang = n̂·ŝ with surface normal (−gx, −gy, 1)/√(1+|g|²) and the sun's
    * trig folded to PLAN-TIME Scala constants (the oracle inlines the same
    * literals, so only sqrt and division run cross-engine):
    * shade = 255·max(0, (sin α + (gy·cos φ − gx·sin φ)·cos α) / √(1+|g|²)).
    * Full-window cells only, like [[slope]]. */
  def hillshade(blocks: DataFrame, cellSize: Double,
                azimuthDeg: Double = 315, altitudeDeg: Double = 45): DataFrame = {
    require(cellSize > 0, "cellSize must be positive")
    val az = math.toRadians(azimuthDeg); val alt = math.toRadians(altitudeDeg)
    convolveWith(blocks, 1) { cells =>
      val (gx, gy, n) = gradients(cells, cellSize)
      val cang = (lit(math.sin(alt)) + (gy * math.cos(az) - gx * math.sin(az)) * math.cos(alt)) /
        sqrt(gx * gx + gy * gy + 1)
      (when(n === 9, greatest(lit(0.0), cang) * 255.0), n)
    }
  }

  /** Zevenbergen & Thorne (1987) general curvature — the second-derivative
    * terrain measure (convexity > 0, concavity < 0, in 1/(100·cellSize)
    * units, the ArcGIS/GRASS convention): curv = −100·(z_W + z_E + z_N +
    * z_S − 4·z_C)/L². Only the 4-connected cross enters, so over
    * integer-valued elevations the result is an EXACT rational with a
    * power-of-ten denominator — bit-identical cross-engine, no epsilon
    * needed. Full windows only (n = 9), like [[slope]]. */
  def curvature(blocks: DataFrame, cellSize: Double): DataFrame = {
    require(cellSize > 0, "cellSize must be positive")
    convolveWith(blocks, 1) { cells =>
      val n = cells.map(_._2).reduce(_ + _)
      def z(wx: Int, wy: Int): Column =
        cells.collectFirst { case (v, _, `wx`, `wy`) => v }.get
      val cross = z(0, 1) + z(2, 1) + z(1, 0) + z(1, 2) - z(1, 1) * 4
      (when(n === 9, cross * (-100.0 / (cellSize * cellSize))), n)
    }
  }

  /** The gdaldem index family in ONE window pass (one halo exchange, one
    * struct-valued lattice — never three exchanges for three indices):
    *   - tpi:  topographic position index, z_C − mean(8 neighbors)
    *           (dyadic /8 ⇒ exact over integer elevations);
    *   - tri:  Riley et al. terrain ruggedness, √Σ(z_i − z_C)² (the sum is
    *           an exact integer; only sqrt runs cross-engine);
    *   - rough: roughness, max − min of the full 3×3 window (exact).
    * Full windows only (n = 9). Output `values` is array<struct<tpi, tri,
    * rough>> on the same lattice keys. */
  def terrainIndices(blocks: DataFrame): DataFrame =
    convolveWith(blocks, 1) { cells =>
      val n = cells.map(_._2).reduce(_ + _)
      val center = cells.collectFirst { case (v, _, 1, 1) => v }.get
      val nbrs = cells.collect { case (v, _, wx, wy) if (wx, wy) != ((1, 1)) => v }
      val tpi = center - nbrs.reduce(_ + _) / 8.0
      val tri = sqrt(nbrs.map(v => (v - center) * (v - center)).reduce(_ + _))
      val rough = greatest(cells.map(_._1): _*) - least(cells.map(_._1): _*)
      (when(n === 9,
        struct(tpi.as("tpi"), tri.as("tri"), rough.as("rough"))), n)
    }

  /** D8 flow direction — the hydrology primitive (flow accumulation,
    * watershed delineation all start here): each cell drains to the
    * steepest-descent neighbor, encoded in ESRI powers of two (E=1 SE=2
    * S=4 SW=8 W=16 NW=32 N=64 NE=128; 0 = sink/flat). Steepness is
    * drop/distance with distance √2 on diagonals — compared EXACTLY as
    * drop²·(2 if cardinal else 1) over positive drops (cross-multiplied
    * squares, no sqrt, no float division), so over integer elevations the
    * argmax is bit-replayable. Ties pin to the SMALLEST code (semantics
    * the oracle replays; GDAL leaves tie order unspecified). The argmax is
    * a plan-time `greatest` over eight (key, −code) structs — no window,
    * no second pass. Full windows only (n = 9). */
  def flowDirD8(blocks: DataFrame): DataFrame = {
    val code = Map((1, 0) -> 1, (1, 1) -> 2, (0, 1) -> 4, (-1, 1) -> 8,
      (-1, 0) -> 16, (-1, -1) -> 32, (0, -1) -> 64, (1, -1) -> 128)
    convolveWith(blocks, 1) { cells =>
      val n = cells.map(_._2).reduce(_ + _)
      val z0 = cells.collectFirst { case (v, _, 1, 1) => v }.get
      val entries = cells.collect { case (v, _, wx, wy) if (wx, wy) != ((1, 1)) =>
        val (dx, dy) = (wx - 1, wy - 1)
        val cardinal = dx == 0 || dy == 0
        val drop = z0 - v
        val key = when(drop > 0, drop * drop * (if (cardinal) 2 else 1))
          .otherwise(lit(-1.0))
        struct(key.as("k"), lit(-code((dx, dy))).cast("double").as("nc"))
      }
      val best = greatest(entries: _*)
      (when(n === 9, when(best("k") > 0, -best("nc")).otherwise(lit(0.0))), n)
    }
  }

  /** Majority (focal mode) filter — the categorical-raster smoother
    * (gdal_sieve's sliding-window sibling): each cell takes the most
    * frequent value of its full 3×3 window, ties to the SMALLEST value
    * (pinned, oracle-replayable; GDAL leaves tie order unspecified). The
    * per-window frequency argmax is a plan-time-unrolled 9×9 equality
    * fold + struct `greatest` — all inside whole-stage codegen, no
    * map-typed state, no second pass. Full windows only (n = 9). */
  def majorityFilter(blocks: DataFrame): DataFrame =
    convolveWith(blocks, 1) { cells =>
      val n = cells.map(_._2).reduce(_ + _)
      val entries = cells.map { case (v, _, _, _) =>
        val cnt = cells.map { case (u, _, _, _) =>
          when(u === v, 1).otherwise(0) }.reduce(_ + _)
        struct(cnt.cast("double").as("c"), (-v).as("nv"))
      }
      val best = greatest(entries: _*)
      (when(n === 9, -best("nv")), n)
    }

  /** Horn gradients (dz/dx, dz/dy) and the window validity count, shared by
    * the terrain kernels. weight(dx, dy): gx = dx·(2−|dy|),
    * gy = dy·(2−|dx|), both over 8·cellSize. */
  private def gradients(cells: Seq[(Column, Column, Int, Int)],
                        cellSize: Double): (Column, Column, Column) = {
    val n = cells.map(_._2).reduce(_ + _)
    def grad(w: (Int, Int) => Int) = cells.map { case (v, _, wx, wy) =>
      val k = w(wx - 1, wy - 1)
      if (k == 0) lit(0.0) else coalesce(v * k, lit(0.0))
    }.reduce(_ + _) / (8 * cellSize)
    (grad((dx, dy) => dx * (2 - math.abs(dy))),
      grad((dx, dy) => dy * (2 - math.abs(dx))), n)
  }

  /** Bridge from the LayerJob block plane (tile_id-keyed, tile-local
    * block_row/block_col) onto the global focal lattice: a focal op on a
    * materialized layer is `fromTileBlocks → focal/convolve/slope →
    * toTileBlocks`, and the kernel flows seamlessly across TILE boundaries
    * too — tiles are just groups of lattice blocks. The grid-seed join is
    * control-plane (broadcast); one band per call. */
  def fromTileBlocks(blocks: DataFrame, grid: graft.core.grid.Grid): DataFrame = {
    val bpt = grid.cols / grid.blockSize
    val seed = grid.tilesDF(blocks.sparkSession).select("tile_idx", "tile_id")
    // blocks that came straight off a grid seed may still carry tile_idx
    // `div` (SQL integer division), not `/` + cast: the index math is
    // logically integral, and FP division would round instead of truncate
    // once indices exceed 2^53.
    blocks.drop("tile_idx").join(broadcast(seed), "tile_id")
      .withColumn("block_x",
        (col("tile_idx") % grid.tileCols) * bpt + col("block_col"))
      .withColumn("block_y",
        expr(s"CAST(tile_idx div ${grid.tileCols} AS BIGINT)") * bpt + col("block_row"))
      .drop("tile_idx", "tile_id", "block_row", "block_col")
  }

  /** Inverse bridge: re-key a focal lattice back to (tile_id, block_row,
    * block_col) for the GeoTIFF sink. */
  def toTileBlocks(lattice: DataFrame, grid: graft.core.grid.Grid): DataFrame = {
    val bpt = grid.cols / grid.blockSize
    val seed = grid.tilesDF(lattice.sparkSession).select("tile_idx", "tile_id")
    lattice
      .withColumn("block_col", (col("block_x") % bpt).cast("int"))
      .withColumn("block_row", (col("block_y") % bpt).cast("int"))
      .withColumn("tile_idx",
        expr(s"CAST(block_y div $bpt AS BIGINT)") * grid.tileCols +
          expr(s"CAST(block_x div $bpt AS BIGINT)"))
      .join(broadcast(seed), "tile_idx")
      .drop("tile_idx", "block_x", "block_y")
  }

  /** Shared scatter → gather → compiled-window skeleton. `mk` receives one
    * ((maybe-valid value, valid-as-int, wx, wy)) per window cell and
    * returns (value, validity count n); output cells are valid iff n > 0
    * and the value is not null.
    *
    * Evaluation (round 18): every O(area) stage is COMPILED —
    *   1. validity pre-fuses into nulls (one [[graft.functions.BlockEval]]
    *      pass: invalid pixels null out, so the dataflow carries ONE
    *      nullable plane instead of a (values, valid) pair);
    *   2. the scatter ships the center plane untouched plus 8
    *      O(perimeter) pre-addressed strips (interpreted HOF is fine at
    *      perimeter size);
    *   3. the padded window assembles through the primitive
    *      [[graft.functions.AssembleFocalPlane]] (interior row copies +
    *      strip scatter) — the interpreted `map_from_entries` +
    *      per-element `transform` rebuild this replaces paid HOF dispatch
    *      over every PADDED cell of every block, the r17-#1 pattern on
    *      ten operators at once;
    *   4. the (2r+1)² window kernel runs through ONE compiled BlockEval
    *      projection per block (the padded plane rides as a per-block
    *      array slot; each output pixel's taps are codegen'd element_at
    *      reads) — the former two chained `transform`s evaluated the
    *      whole window tree interpreted per pixel, ~100-200 ns/element ×
    *      (2r+1)² × pixels;
    *   5. output validity is one [[graft.functions.NotNullMask]] pass
    *      (the kernel's `when(n > 0, value)` is null exactly where the
    *      old (v, ok) struct was invalid — same relation, fewer bytes).
    * Semantics are bit-identical: the SAME resolved Catalyst tree
    * evaluates through the compiled projection (oracles r6–r15 pin it). */
  private def convolveWith(blocks: DataFrame, radius: Int)(
      mk: Seq[(Column, Column, Int, Int)] => (Column, Column)): DataFrame = {
    import graft.functions.{BlockEval, BlockKernels}
    import org.apache.spark.sql.types.{ArrayType, BooleanType, DoubleType, LongType}
    require(radius >= 1, "radius must be >= 1")
    val r = radius
    val w = col("width"); val h = col("height")
    val pw = w + 2 * r // padded width (needed by both scatter and gather)

    // --- 0. fuse validity into nulls (compiled, one pass) -----------------
    // `valid` rides as a per-block ARRAY SLOT (not a zip input) so a null
    // mask ARRAY degrades to an all-invalid plane — the exact behavior of
    // the old element_at(cok, …) + coalesce(…, false) gather — while a
    // null VALUES array still nulls the whole plane (block drops, as
    // before).
    val masked = blocks.withColumn("values",
      BlockEval.zip(Seq(col("values") -> DoubleType),
        scalars = Seq(col("valid").cast(ArrayType(BooleanType)) ->
          ArrayType(BooleanType))) {
        case Seq(v, okArr, idx) =>
          when(element_at(okArr, (idx + 1).cast("int")), v)
      })

    // --- 1. scatter: center payload + 8 halo strips -----------------------
    // A fragment's offset (dx, dy) ∈ {-1,0,1}² is receiver-relative: the
    // receiver at (X, Y) sees the fragment of neighbor (X+dx, Y+dy) beside
    // the matching edge of its padded window. The emitter at (bx, by)
    // therefore addresses the fragment for offset (dx, dy) to block
    // (bx - dx, by - dy), shipping only the strip adjacent to that
    // receiver, with every cell already rebased to its PADDED-WINDOW index.
    def stripCols(dx: Int): (Column, Column, Column) = dx match {
      //        (first col, last col, padded-x of first col)
      case -1 => (w - r, w - 1, lit(0))       // receiver right of me → my right cols
      case 1  => (lit(0), lit(r - 1), pw - r) // receiver left of me  → my left cols
      case _  => (lit(0), w - 1, lit(r))
    }
    def stripRows(dy: Int): (Column, Column, Column) = dy match {
      case -1 => (h - r, h - 1, lit(0))            // receiver below → my bottom rows
      case 1  => (lit(0), lit(r - 1), h + lit(r))  // receiver above → my top rows
      case _  => (lit(0), h - 1, lit(r))
    }
    // The CENTER fragment ships its masked plane untouched — its placement
    // in the padded window is fixed, so per-cell addressing would only
    // multiply its shuffle bytes, and the center is ~99% of the exchanged
    // volume at 512-px blocks. Only the 8 strips (O(perimeter)) carry
    // (padded-index, value) entries; validity is already fused into nulls.
    val offsets = for { dy <- -1 to 1; dx <- -1 to 1 if (dx, dy) != ((0, 0)) } yield (dx, dy)
    val noCells = array().cast("array<struct<at:int,v:double>>")
    val fragments = struct(
      col("block_x").as("to_x"), col("block_y").as("to_y"),
      col("values").as("cv"), noCells.as("entries")) +:
      offsets.map { case (dx, dy) =>
        val (c0, c1, ox) = stripCols(dx)
        val (r0, r1, oy) = stripRows(dy)
        // element_at over a materialized input array is O(1) per cell (the
        // O(pixels²) trap is indexing arrays COMPUTED inside the lambda).
        val entries = flatten(transform(sequence(r0, r1), row =>
          transform(sequence(c0, c1), c => struct(
            ((oy + row - r0) * pw + ox + c - c0).cast("int").as("at"),
            element_at(col("values"), (row * w + c + 1).cast("int")).as("v")))))
        struct(
          (col("block_x") - dx).as("to_x"), (col("block_y") - dy).as("to_y"),
          lit(null).cast("array<double>").as("cv"), entries.as("entries"))
      }
    val scattered = masked
      .select(col("width"), col("height"), explode(array(fragments: _*)).as("f"))
      .select(col("f.to_x").as("block_x"), col("f.to_y").as("block_y"),
        col("width"), col("height"), col("f.cv").as("cv"),
        col("f.entries").as("entries"))

    // --- 2. gather: assemble the padded window ----------------------------
    // Strip entries tile the padded ring disjointly (each halo cell comes
    // from the one neighbor that owns it); interior cells copy from the
    // center plane. Blocks off the lattice edge receive halos but no
    // center — dropped.
    // Key on block coords ONLY and validate width/height agreement inside
    // the group: a mixed-size lattice previously split a cell's fragments
    // across separate (w, h) groups and mis-assembled halos silently — now
    // any group whose fragments disagree on block size raises. The guard is
    // woven into the `width` value itself so the optimizer cannot prune it.
    val gathered = scattered
      .groupBy("block_x", "block_y")
      .agg(min(col("width")).as("__minw"), max(col("width")).as("width"),
        min(col("height")).as("__minh"), max(col("height")).as("height"),
        first(col("cv"), ignoreNulls = true).as("cv"),
        flatten(collect_list(col("entries"))).as("entries"))
      .withColumn("width",
        when(col("__minw") === col("width") && col("__minh") === col("height"),
          col("width"))
          .otherwise(raise_error(format_string(
            "graft focal: non-uniform block sizes meet at lattice cell (%s, %s): " +
              "width %s..%s, height %s..%s — focal ops require one block size",
            col("block_x"), col("block_y"), col("__minw"), col("width"),
            col("__minh"), col("height"))))
          .cast("int"))
      .drop("__minw", "__minh")
      .filter(col("cv").isNotNull)
      .withColumn("plane", graft.functions.BlockKernels.assembleFocalPlane(
        col("cv"), col("entries"), col("width"), col("height"), r))

    // --- 3. convolve: ONE compiled window pass per block -------------------
    // The padded plane rides as a per-block array slot; each output pixel's
    // (2r+1)² taps are element_at reads compiled into the projection.
    // Window-cell addressing: center i sits at padded (i%w + r, i÷w + r);
    // cell (wx, wy) ∈ [0, 2r]² is offset (wx−r, wy−r) from it, so its
    // padded index is (i÷w + wy)·pw + i%w + wx — the r's cancel.
    val win = for { wy <- 0 to 2 * r; wx <- 0 to 2 * r } yield (wx, wy)
    val convolved = gathered
      .withColumn("values",
        BlockEval.zip(Nil,
          scalars = Seq(
            col("plane") -> ArrayType(DoubleType, containsNull = true),
            col("width").cast("long") -> LongType),
          length = Some(w * h)) { case Seq(pv, wS, idx) =>
          val pwS = wS + 2 * r
          val cells = win.map { case (wx, wy) =>
            val at = ((idx % wS + wx) + (floor(idx / wS) + wy) * pwS + 1).cast("int")
            val v = element_at(pv, at)
            (v, when(v.isNotNull, 1).otherwise(0), wx, wy)
          }
          val (value, n) = mk(cells)
          when(n > 0, value)
        })
      .withColumn("valid", BlockKernels.notNullMask(col("values")))

    convolved.select(col("block_x"), col("block_y"), col("width"),
      col("height"), col("values"), col("valid"))
  }
}
