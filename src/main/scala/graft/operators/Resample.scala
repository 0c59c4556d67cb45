package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Resampling kernels (SURVEY §2.9) — re-expression of the reference's
  * rasterio/GDAL kernel enum (`gfw_pixetl/resampling.py:9-25`, applied via
  * WarpedVRT at `tiles/raster_src_tile.py:200-208`).
  *
  * Key insight: GDAL's non-nearest kernels ARE aggregations — each target
  * pixel aggregates the k×k source pixels it covers. Here a block downsample
  * by integer factor k runs as ONE Catalyst expression call per block
  * ([[graft.functions.BlockDownsample]], a JIT'd primitive loop over the
  * packed pixel array), so cost is O(out_pixels · k²) — the optimum — at
  * compiled-loop speed. (The earlier higher-order-function form had the
  * same asymptotics but ran interpreted: Spark HOFs have no codegen, and
  * per-element `Expression.eval` dispatch capped it near 5-10 M px/s/core.)
  *
  * Masked (null) source pixels are excluded from window aggregates like
  * GDAL's nodata handling; a window with no valid pixel yields null.
  */
object Resample {

  val methods: Seq[String] =
    Seq("nearest", "average", "sum", "min", "max", "mode", "med", "q1", "q3",
      "bilinear", "cubic", "cubic_spline", "lanczos", "rms")

  /** Overview pyramid over a (px, py, value) pixel relation: `levels`
    * factor-2 SUM reductions, each level computed from the PREVIOUS level —
    * the overview-build pattern (GDAL's gdaladdo, tile-server pyramids):
    * total work is O(N · Σ 4⁻ᵏ) < 4N/3, not O(N · levels) from raw. Output
    * is the union of all levels tagged with `level` (0 = the input).
    * Each level persists because it feeds BOTH the output union and the
    * next reduction — without the pin the union's branches would re-derive
    * every level from the base. SUM is the exactly-reaggregable kernel
    * (avg needs sum+count partials; min/max work verbatim). Pixel coords
    * must be non-negative (grid coords are by construction): `div`
    * truncates toward zero, so negative coords would split cells
    * differently than a floor division. */
  def pyramidSum(base: DataFrame, levels: Int): DataFrame = {
    require(levels >= 0, "levels must be >= 0")
    val lvls = Iterator.iterate(base.select(col("px"), col("py"), col("value"))) { prev =>
      prev.groupBy(expr("px div 2").as("px"), expr("py div 2").as("py"))
        .agg(sum("value").as("value"))
    }.take(levels + 1).zipWithIndex.map { case (df, i) =>
      graft.core.Caching.shared(df)
        .select(lit(i).as("level"), col("px"), col("py"), col("value"))
    }.toSeq
    lvls.reduce(_.unionAll(_))
  }

  /** Downsample one block band by integer factor k. `values` is the packed
    * row-major (w×h) pixel array with nulls for masked pixels; returns the
    * (w/k × h/k) packed array. `noData` additionally masks pixels equal to
    * the nodata value (fused — callers used to run that masking as a
    * separate pass over every base pixel).
    *
    * Evaluation is one [[graft.functions.BlockDownsample]] call per block —
    * a JIT'd primitive loop, ~100× the throughput of the higher-order-
    * function form this replaced (Spark HOFs have no codegen; stack samples
    * of the 2.62-Gpx soak showed the per-element interpreted `eval` as the
    * entire cost of a pyramid build). Semantics are bit-identical: same
    * window enumeration order, same IEEE accumulation order, same null /
    * tie / quantile rules. */
  def downsample(values: Column, width: Int, height: Int, k: Int,
                 method: String, noData: Option[Double] = None): Column = {
    require(width % k == 0 && height % k == 0, s"block $width x $height not divisible by $k")
    // Interpolating kernels (bilinear/cubic/cubic_spline/lanczos) run TRUE
    // phase-correct taps (shared with the warp path via ResampleTaps) — no
    // longer the box-average alias of rounds ≤15. At k=2 bilinear is still
    // exactly the 2×2 box average (four equal 0.25 taps); at k≥3 the
    // kernels differ. Taps beyond the block edge drop out and renormalize
    // (the block is its own raster); for GDAL-identical cross-block
    // convolution use [[downsampleSeamExact]], which pads each block with
    // a real neighbor halo and runs these SAME taps with `pad` set.
    // Reference enum: gfw_pixetl/resampling.py:9-25.
    if (!methods.contains(method))
      throw new IllegalArgumentException(s"Unknown resampling method: $method")
    graft.functions.BlockKernels.downsampleColumn(values, width, height, k, method, noData)
  }

  /** Seam-exact interpolating decimation (VERDICT r16 #5): [[downsample]]
    * with a REAL halo, so pixels within kernel radius of a block boundary
    * convolve across the boundary exactly like GDAL's whole-raster
    * `gdaladdo -r cubic` (`gfw_pixetl/resampling.py:9-25` exposes the
    * enum) instead of the block-local drop-and-renormalize contract.
    *
    * `blocks` is a lattice of fixed w×h packed row-major arrays keyed
    * (xCol, yCol) within each `keyCols` group (each group — a tile — is
    * its own raster, the reference's per-tile gdaladdo scope); null
    * elements are masked, and every `bandCols` plane rides ONE exchange
    * (strip entries carry all bands' values per cell). Each block's plane
    * is padded with a radius(method)-pixel ring gathered from its 8
    * lattice neighbors — the Focal scatter/gather shape: the center
    * arrays ride the exchange untouched while only the O(perimeter)
    * strips carry per-cell addressed entries, so the one keyed shuffle
    * moves ~the pixel plane once regardless of kernel. Ring cells with no
    * emitting neighbor (the raster edge) stay null and fall under the
    * same drop-and-renormalize rule as masked pixels — seam-exact
    * interior, GDAL-identical edges. The padded planes then run the SAME
    * [[graft.functions.BlockDownsample]] taps with `pad` set, output
    * (w/k)×(h/k) per block under the original band names.
    *
    * The halo radius is the kernel's, NOT k·kernel: decimation output
    * pixel centers sit mid-window, so taps protrude at most
    * radius − (k − tapBase − 1) ≤ radius pixels past the block edge at
    * any factor. bilinear taps never leave the k-window (its decimation
    * is seam-exact without a halo); cubic/cubic_spline need 2, lanczos 3. */
  def downsampleSeamExact(blocks: DataFrame, w: Int, h: Int, k: Int,
      method: String, noData: Option[Double] = None,
      keyCols: Seq[String] = Nil,
      xCol: String = "block_x", yCol: String = "block_y",
      bandCols: Seq[String] = Seq("values")): DataFrame = {
    val p = graft.functions.ResampleTaps.radius.getOrElse(method,
      throw new IllegalArgumentException(
        s"$method is not an interpolating kernel (${graft.functions.ResampleTaps.radius.keys.mkString("/")})"))
    require(w % k == 0 && h % k == 0, s"block $w x $h not divisible by $k")
    require(w >= p && h >= p, s"halo $p exceeds block $w x $h")
    require(bandCols.nonEmpty, "bandCols must be non-empty")
    val pw = w + 2 * p
    // scatter: center planes + 8 receiver-addressed halo strips (the
    // emitter at (bx, by) ships the strip for receiver-relative offset
    // (dx, dy) to block (bx − dx, by − dy), cells rebased to the
    // receiver's padded-plane index). ONE exchange regardless of band
    // count: each strip entry carries every band's value at that cell.
    // Neighbors exist only within the same keyCols group — each tile (or
    // whatever the key denotes) is its own raster, the reference's
    // per-tile gdaladdo scope.
    def stripCols(dx: Int): (Int, Int, Int) = dx match {
      case -1 => (w - p, w - 1, 0)      // receiver right of me → my right cols
      case 1  => (0, p - 1, pw - p)     // receiver left of me  → my left cols
      case _  => (0, w - 1, p)
    }
    def stripRows(dy: Int): (Int, Int, Int) = dy match {
      case -1 => (h - p, h - 1, 0)      // receiver below → my bottom rows
      case 1  => (0, p - 1, h + p)      // receiver above → my top rows
      case _  => (0, h - 1, p)
    }
    val noCells = array().cast("array<struct<at:int,v:array<double>>>")
    val noCenter = bandCols.map(b => lit(null).cast("array<double>").as(s"__cv_$b"))
    val offsets = for { dy <- -1 to 1; dx <- -1 to 1 if (dx, dy) != ((0, 0)) } yield (dx, dy)
    val fragments = struct(
      (col(xCol).as("to_x") +: col(yCol).as("to_y") +: lit(true).as("__is_center") +:
        bandCols.map(b => col(b).cast("array<double>").as(s"__cv_$b"))) :+
        noCells.as("entries"): _*) +:
      offsets.map { case (dx, dy) =>
        val (c0, c1, ox) = stripCols(dx)
        val (r0, r1, oy) = stripRows(dy)
        val entries = flatten(transform(sequence(lit(r0), lit(r1)), row =>
          transform(sequence(lit(c0), lit(c1)), c => struct(
            ((row - r0 + oy) * pw + c - c0 + ox).cast("int").as("at"),
            array(bandCols.map(b => element_at(col(b).cast("array<double>"),
              (row * w + c + 1).cast("int"))): _*).as("v")))))
        struct(
          ((col(xCol) - dx).as("to_x") +: (col(yCol) - dy).as("to_y") +:
            lit(false).as("__is_center") +: noCenter) :+ entries.as("entries"): _*)
      }
    val scattered = blocks
      .select(keyCols.map(col) :+ explode(array(fragments: _*)).as("f"): _*)
      .select(keyCols.map(col) ++
        Seq(col("f.to_x").as(xCol), col("f.to_y").as(yCol),
          col("f.__is_center").as("__is_center")) ++
        bandCols.map(b => col(s"f.__cv_$b").as(s"__cv_$b")) :+
        col("f.entries").as("entries"): _*)
    // gather: strips tile the ring disjointly (each halo cell has exactly
    // one owning neighbor) so map_from_entries never sees a duplicate key;
    // off-lattice receivers (halos with no center) are dropped
    val isInterior = (i: Column) =>
      i % pw >= p && i % pw < w + p && i / pw >= p && i / pw < h + p
    val centerIdx = (i: Column) =>
      ((i / pw).cast("int") - p) * w + (i % pw) - p + 1 // 1-based element_at
    // an explicit center marker (not "first band non-null": a block whose
    // first band is a legitimately-missing null plane must still gather)
    val centerAggs = (max(col("__is_center")).as("__is_center") +:
      bandCols.map(b =>
        first(when(col("__is_center"), col(s"__cv_$b")), ignoreNulls = true)
          .as(s"__cv_$b"))) :+
      flatten(collect_list(col("entries"))).as("entries")
    val padded = scattered
      .groupBy(keyCols.map(col) ++ Seq(col(xCol), col(yCol)): _*)
      .agg(centerAggs.head, centerAggs.tail: _*)
      .filter(col("__is_center"))
      .withColumn("__cells", map_from_entries(transform(col("entries"),
        e => struct(e("at"), e("v")))))
    val withPlanes = bandCols.zipWithIndex.foldLeft(padded) { case (df, (b, bi)) =>
      df.withColumn(s"__pv_$b", transform(sequence(lit(0), lit(pw * (h + 2 * p) - 1)),
        i => when(isInterior(i),
            element_at(col(s"__cv_$b"), centerIdx(i).cast("int")))
          .otherwise(element_at(
            element_at(col("__cells"), i.cast("int")), bi + 1))))
    }
    withPlanes.select(keyCols.map(col) ++ Seq(col(xCol), col(yCol)) ++
      bandCols.map(b => graft.functions.BlockKernels.downsampleColumn(
        col(s"__pv_$b"), w, h, k, method, noData, pad = p).as(b)): _*)
  }

  /** Merge 2×2 neighbouring HALF-size blocks into full-size blocks of the
    * overview's own block grid — the step between [[downsample]] (per
    * block, map-side, 4× data reduction, NO shuffle) and a tiled sink
    * that wants constant block size at every pyramid level. This is where
    * the one keyed exchange of an overview build happens, and it moves
    * only the already-reduced data: at 100 TB the shuffle is 1/4 of the
    * base scan, and deeper levels shrink geometrically.
    *
    * `halfBlocks` carries `keyCols`, `block_row`, `block_col` and
    * `bandCols` packed arrays of (blockSize/2)² pixels (the output shape
    * of a factor-2 [[downsample]] at base block coordinates). Output rows
    * are parent blocks (`block_row/2`, `block_col/2`) with assembled
    * blockSize² arrays; quarters missing at the image edge fill with
    * null (the masked-pixel convention — the sink's nodata pad applies
    * downstream). The gather is first-of-quarter aggregates (codegen'd,
    * map-side combined) + one per-block [[graft.functions
    * .AssembleQuarters]] primitive copy. */
  def regroup2x(halfBlocks: DataFrame, blockSize: Int,
                bandCols: Seq[String], keyCols: Seq[String]): DataFrame = {
    require(blockSize % 2 == 0, s"blockSize $blockSize must be even")
    def q(b: String, r: Int, c: Int) = s"__${b}_q$r$c"
    val tagged = halfBlocks
      .withColumn("__qr", pmod(col("block_row"), lit(2)))
      .withColumn("__qc", pmod(col("block_col"), lit(2)))
    val quadAggs = for (b <- bandCols; r <- 0 to 1; c <- 0 to 1) yield
      first(when(col("__qr") === r && col("__qc") === c, col(b)),
        ignoreNulls = true).as(q(b, r, c))
    val grouped = tagged
      .groupBy((keyCols.map(col) :+
        (col("block_row") / 2).cast("int").as("block_row") :+
        (col("block_col") / 2).cast("int").as("block_col")): _*)
      .agg(quadAggs.head, quadAggs.tail: _*)
    val assembled = bandCols.map { b =>
      // a missing (null) quarter fills its quadrant with nulls = masked;
      // primitive per-quadrant row copies (see AssembleQuarters) replace
      // the interpreted per-element transform + 4-way CaseWhen
      graft.functions.BlockKernels.assembleQuarters(
        col(q(b, 0, 0)), col(q(b, 0, 1)), col(q(b, 1, 0)), col(q(b, 1, 1)),
        blockSize).as(b)
    }
    grouped.select((keyCols.map(col) :+ col("block_row") :+ col("block_col"))
      ++ assembled: _*)
  }
}
